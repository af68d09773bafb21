"""Streaming exact dedup: drop already-seen documents as they arrive.

A crawl is a stream; content dedup cannot wait for "the whole corpus".
Two complementary shapes, matching the module split in rollup.py:

- :func:`dedup_stream_plan` — the state-store plan:
  ``dropDuplicatesWithinWatermark`` on the content fingerprint. Right
  when duplicate arrivals are CLOSE IN TIME (re-crawl storms, mirror
  bursts): state expires with the watermark, so executor memory is
  bounded by the dedup horizon, not the corpus. Use with append sinks.

- :func:`start_dedup` — the unbounded-history shape: foreachBatch
  against a PERSISTED seen-fingerprint key table. Each batch
  (1) picks one deterministic keeper per fingerprint within the batch,
  (2) left-anti-joins the key table (the state is a TABLE bucketable by
  fingerprint at 100 TB — never executor memory; the anti-join is the
  same plan as operators/dedup.exact_dedup's winners join),
  (3) appends survivors to ``docs`` and their fingerprints to ``keys``
  in ONE staged :class:`~graphlab_spark.streaming.exactly_once.BatchCommitter`
  commit — a crash at any point replays to exactly-once, and the two
  tables can never diverge (a key without its doc would silently drop
  that document forever; a doc without its key would re-admit its next
  duplicate).

First-seen wins across batches (arrival order is the stream's truth);
within a batch the keeper is the minimum (url, warc_ts) row — the same
deterministic-keeper discipline as exact_dedup's min-doc_id rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphlab_spark.streaming.exactly_once import BatchCommitter

DOCS_TABLE = "docs"
KEYS_TABLE = "keys"


def content_fingerprint() -> Column:
    """Whitespace-normalized lowercase md5 of the text column — the
    exact-dedup key (mirrors operators/dedup's fingerprint rule)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))


def dedup_stream_plan(
    pages_stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Bounded-lateness streaming dedup: one surviving row per
    fingerprint among arrivals within the watermark horizon; state
    expires after it. Append-mode-compatible."""
    return (
        pages_stream.withColumn("_fp", content_fingerprint())
        # crawl timestamps are NTZ; the state-store watermark requires an
        # instant, so watermark on a cast helper and drop it after
        .withColumn("_evt", F.col(ts_col).cast("timestamp"))
        .withWatermark("_evt", watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp", "_evt")
    )


def start_dedup(
    spark: SparkSession,
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """pages stream → foreachBatch(first-seen exact dedup vs the
    persisted key table). Returns the StreamingQuery; the live tables
    are ``{out_dir}/docs`` (surviving rows, schema = input schema +
    ``fingerprint``) and ``{out_dir}/keys`` (fingerprint)."""
    committer = BatchCommitter(spark, checkpoint_dir, out_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if committer.already_applied(batch_id):
            return
        committer.guard_first_batch(batch_id, [DOCS_TABLE, KEYS_TABLE])
        committer.guard_layout(batch_id, [KEYS_TABLE], [DOCS_TABLE])
        if batch_df.isEmpty():
            return
        w = Window.partitionBy("fingerprint").orderBy("url", "warc_ts")
        batch_keep = (
            batch_df.withColumn("fingerprint", content_fingerprint())
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        def _live(name: str) -> DataFrame | None:
            path = f"{out_dir}/{name}"
            if committer.fs.exists(path):
                return spark.read.parquet(path)
            return None

        def _docs() -> DataFrame:
            keys = _live(KEYS_TABLE)
            new = (
                batch_keep.join(keys, "fingerprint", "left_anti")
                if keys is not None
                else batch_keep
            )
            docs = _live(DOCS_TABLE)
            return docs.unionByName(new) if docs is not None else new

        def _keys() -> DataFrame:
            keys = _live(KEYS_TABLE)
            new = batch_keep.select("fingerprint")
            if keys is not None:
                new = new.join(keys, "fingerprint", "left_anti")
                return keys.unionByName(new)
            return new

        committer.run(batch_id, {DOCS_TABLE: _docs, KEYS_TABLE: _keys})

    return (
        pages_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
