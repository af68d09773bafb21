"""Crawl-snapshot delta: classify each url across two crawl snapshots
as added / removed / changed / unchanged.

Every recurring web-scale ingest (Common-Crawl monthly dumps are the
canonical case) re-crawls mostly-unchanged pages; re-running extraction
and triple extraction over the full 10^12-doc snapshot is the single
biggest avoidable cost in the pipeline. The delta is the driver for
incremental runs: feed ``changed_or_added`` into the pipeline and the
manifest layer (plans/pipeline.py) re-fingerprints only those buckets.

Scale shape: content is hashed MAP-SIDE before the join, so the one
shuffle carries ``(url, 32-hex)`` rows — O(urls × ~50 B), never page
bodies — and the classifier is a single hash full-outer join on url.
No window, no sort, no driver sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUSES = ("added", "removed", "changed", "unchanged")


def crawl_delta(
    old: DataFrame, new: DataFrame, key: str = "url", content: str = "text"
) -> DataFrame:
    """Per-``key`` status between two snapshots → ``(key, status)``.

    ``added``: key only in ``new``; ``removed``: only in ``old``;
    ``changed``/``unchanged``: in both, by md5(content) equality. NULL
    content hashes to NULL; two NULLs compare unchanged (the null-safe
    ``<=>``), NULL-vs-text compares changed.
    """
    # presence is tracked by side-specific marker columns, not the hash
    # (a NULL content in one side would otherwise read as absent)
    o = old.select(
        F.col(key), F.md5(F.col(content)).alias("_old_md5"), F.lit(1).alias("_in_old")
    )
    n = new.select(
        F.col(key), F.md5(F.col(content)).alias("_new_md5"), F.lit(1).alias("_in_new")
    )
    joined = o.join(n, key, "full_outer")
    return joined.select(
        key,
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_old_md5").eqNullSafe(F.col("_new_md5")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def changed_or_added(
    old: DataFrame, new: DataFrame, key: str = "url", content: str = "text"
) -> DataFrame:
    """The incremental work-list: ``new`` restricted to keys whose
    status is added or changed — the only pages the next pipeline run
    must re-extract. Semi-join shaped (the delta frame never widens
    ``new``); unchanged and removed pages never reach the extractor."""
    delta = crawl_delta(old, new, key, content).filter(
        F.col("status").isin("added", "changed")
    )
    return new.join(delta.select(key), key, "left_semi")
