"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction slice (extract → triples →
top predicates) over the deterministic synthetic page corpus, after
loading the sf0.001 testdata tables (schema smoke).

``queries()`` / ``oracle_sql()`` — the operator surface from SURVEY.md §2
plus the training-data operators (dedup / similarity / text analysis /
multimodal / events / curation). Implementations live in
``graphlab_spark.plans.{relational,event_queries,training_queries}``;
this module re-exports the shared registry.

Registry ORDER is a contract: the driver's CORRECTNESS harness records
only the first 50 entries, so rows-only entries (probabilistic LSH
candidate generation, float PageRank) and redundantly-pinned oracled
entries are registered LAST (``reorder_registry_last`` — see
COVERAGE.md "Driver CORRECTNESS cap"); everything past the cap is gated
by tools/check_oracles.py + tests/test_orphan_oracles.py instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphlab_spark.plans import event_queries  # noqa: E402,F401  (fills REGISTRY)
from graphlab_spark.plans import relational  # noqa: E402,F401
from graphlab_spark.plans import training_queries  # noqa: E402,F401
from graphlab_spark.plans.relational import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: triple extraction over the synthetic corpus → predicate
    histogram. Also scans the sf0.001 testdata to exercise the loaders."""
    from graphlab_spark.operators.extract import extract_stage
    from graphlab_spark.operators.triples import triples_stage
    from graphlab_spark.sources import corpus
    from graphlab_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    n_docs = load_table(spark, "documents", sf_dir).count()  # smoke the loaders
    pages = corpus.generate_pages(spark, 300)
    docs = extract_stage(pages)
    triples = triples_stage(docs)
    return (
        triples.groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("testdata_docs", F.lit(n_docs))
        .orderBy(F.col("n").desc(), F.col("pred").asc())
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: entry_.fn for name, entry_ in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.sql for name, e in REGISTRY.items() if e.sql is not None}
