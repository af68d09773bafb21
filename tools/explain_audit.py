"""Physical-plan audit: verify that the plans Catalyst produces are the
plans we want at scale — filters pushed into the parquet scan, column
pruning effective, dimension joins broadcast, no accidental cartesian.

Prints a PASS/WARN line per check plus the offending plan snippet.
Run: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphlab_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"{'PASS' if ok else 'WARN'}  {name}" + (f" — {detail}" if detail and not ok else ""))
    return ok


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit", shuffle_partitions=8)
    from graphlab_spark.plans.relational import REGISTRY
    import graphlab_spark.plans.training_queries  # noqa: F401

    ok_all = True

    # 1. filter pushdown reaches the scan (a01)
    p = plan_of(REGISTRY["a01_filter_eq"].fn(spark, sf_dir))
    ok_all &= check(
        "a01 predicate pushed to parquet scan",
        "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]" in p
        or "EqualTo(c_mktsegment,BUILDING)" in p,
        p[:600],
    )

    # 2. column pruning: q1 scan reads only needed columns
    p = plan_of(REGISTRY["tpch_q1_pricing_summary"].fn(spark, sf_dir))
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l]
    pruned = read_schema and "l_partkey" not in read_schema[0] and "l_orderkey" not in read_schema[0]
    ok_all &= check("q1 column pruning (no l_partkey/l_orderkey in ReadSchema)", bool(pruned),
                    read_schema[0] if read_schema else "no ReadSchema found")

    # 3. broadcast joins on dims (q3, q5, a25)
    for name in ["tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume", "a25_joined_load"]:
        p = plan_of(REGISTRY[name].fn(spark, sf_dir))
        ok_all &= check(f"{name} uses BroadcastHashJoin", "BroadcastHashJoin" in p)
        ok_all &= check(f"{name} no CartesianProduct", "CartesianProduct" not in p)

    # 4. q1 partial aggregation (map-side combine before shuffle)
    p = plan_of(REGISTRY["tpch_q1_pricing_summary"].fn(spark, sf_dir))
    ok_all &= check("q1 partial_ aggregate before exchange", "partial_" in p.lower() or "HashAggregate" in p)

    # 5. whole-stage codegen in the EXECUTED plan (pre-execution AQE plans
    # hide codegen annotations behind isFinalPlan=false)
    q1df = REGISTRY["tpch_q1_pricing_summary"].fn(spark, sf_dir)
    q1df.collect()
    executed = q1df._jdf.queryExecution().executedPlan().toString()
    # Spark 4 renders codegen'd operators with a "*(N)" stage prefix
    ok_all &= check(
        "q1 whole-stage codegen (executed plan)",
        "WholeStageCodegen" in executed or "*(1)" in executed,
    )

    # 6. dedup slim path: no html column in the winners aggregate scan
    from graphlab_spark.operators.extract import dedup_pages
    from graphlab_spark.sources import corpus
    pages = corpus.generate_pages(spark, 100)
    p = plan_of(dedup_pages(pages))
    ok_all &= check("dedup winners side joins via broadcast", "BroadcastHashJoin" in p, p[:800])

    # 7. lineitem filter + projection scan for a05
    p = plan_of(REGISTRY["a05_conjunction"].fn(spark, sf_dir))
    ok_all &= check(
        "a05 multi-predicate pushdown",
        "EqualTo(l_returnflag,R)" in p and "GreaterThan(l_quantity,25" in p,
        p[:600],
    )

    print("\nAUDIT", "PASS" if ok_all else "HAS WARNINGS")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
