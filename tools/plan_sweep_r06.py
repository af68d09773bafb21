"""r6 plan sweep: capture every registry entry's physical plan and
flag smells (BatchEvalPython = row-at-a-time Python, CartesianProduct,
scans with no pruned ReadSchema, high Exchange counts).

Usage: python tools/plan_sweep_r06.py [sf_dir] > /tmp/plan_sweep.txt
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphlab_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-sweep", shuffle_partitions=8)
    from graphlab_spark.plans import event_queries  # noqa: F401
    from graphlab_spark.plans import training_queries  # noqa: F401
    from graphlab_spark.plans.relational import REGISTRY

    rows = []
    for name, entry in REGISTRY.items():
        try:
            p = plan_of(entry.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            rows.append((name, -1, f"PLAN-ERROR {type(e).__name__}: {e}"))
            continue
        n_ex = (
            p.count("Exchange")
            - p.count("BroadcastExchange")
            - p.count("ReusedExchange")
        )
        smells = []
        if "BatchEvalPython" in p:
            smells.append("BatchEvalPython(pickled-row UDF)")
        if "CartesianProduct" in p:
            smells.append("CartesianProduct")
        if p.count("ArrowEvalPython") > 3:
            smells.append(f"ArrowEvalPython x{p.count('ArrowEvalPython')}")
        if n_ex > 6:
            smells.append(f"shuffle Exchange x{n_ex}")
        rows.append((name, n_ex, "; ".join(smells) or "ok"))
    for name, n_ex, verdict in rows:
        print(f"{name:35s} ex={n_ex:2d}  {verdict}")


if __name__ == "__main__":
    main()
