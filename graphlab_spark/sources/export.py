"""Training-data export sink: token-budgeted JSONL shards.

The last step of a curation pipeline: write the selected documents as
line-delimited JSON shards whose per-shard token mass is bounded by the
training chunk budget — the layout a data-loader streams directly.

Spark-first shape: shard assignment reuses ``sampling.pack_shards``
(per-bucket window cumsum — parallel windows, never a global sort);
the write partitions by (bucket, chunk_id), one file per shard via a
repartition on the same keys, rows sorted by doc_id within the shard so
output is byte-deterministic. At 100 TB this is an embarrassingly
parallel write: shards are independent, and a failed task rewrites only
its own shard file (parquet/JSON task commit protocol).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlab_spark.operators.sampling import pack_shards


def export_training_shards(
    docs: DataFrame,
    out_dir: str,
    budget_tokens: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``{out_dir}``/bucket=*/chunk_id=*/part-*.json shards; each
    line is ``{"doc_id": ..., "n_tokens": ..., "text": ...}`` plus any
    ``extra_cols`` from ``docs`` (e.g. a pre-tokenized ``token_ids``
    array from ``bpe_ids_col`` — then shards are consumable without a
    tokenizer at load time, with ``count_col`` its exact size so the
    budget is on true subword counts). Returns the shard manifest frame
    (bucket, chunk_id, n_docs, n_tokens) — vocabulary-small, the thing
    a training job's sampler reads first."""
    extra = list(extra_cols or [])
    pack_kw = {"count_col": count_col} if count_col else {}
    assigned = pack_shards(
        docs, budget_tokens=budget_tokens, id_col=id_col, **pack_kw
    ).join(docs.select(id_col, text_col, *extra), id_col)
    (
        assigned.repartition("bucket", "chunk_id")
        .sortWithinPartitions(id_col)
        .select(id_col, "bucket", "chunk_id", "n_tokens", text_col, *extra)
        .write.mode("overwrite")
        .partitionBy("bucket", "chunk_id")
        .json(out_dir)
    )
    return (
        assigned.groupBy("bucket", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
