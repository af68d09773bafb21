"""Document chunking: split each doc into fixed-size overlapping token
windows — the precursor to embedding/indexing and context-window
packing in a training/RAG pipeline (every chunk carries its doc key and
ordinal so downstream joins stay doc-local).

Plan: pure per-row JVM array algebra (``sequence`` of chunk starts →
``transform`` + ``slice``/``array_join`` → ``explode``) — zero Python,
zero shuffle; at 100 TB it's a narrow map over the documents scan and
the output inherits the input partitioning (doc-contiguous chunks, the
layout embedding jobs want).

Reference semantics: the reference chunks paper abstracts client-side
before embedding (fixed window + overlap); here it's a first-class
relational operator with an exact SQL mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, chunk_id, chunk_text, n_tokens): token windows of up to
    ``size`` tokens starting every ``stride`` tokens (overlap =
    size - stride). The final window may be short; windows are emitted
    while their start lies inside the doc, so every token lands in at
    least one chunk. chunk_id = start // stride (dense per doc,
    0-based). Tokenization = single-space split, the t20 contract.
    """
    if not (0 < stride <= size):
        raise ValueError("need 0 < stride <= size")
    # Hoist the token array (and its size) into a projection: referencing
    # split(text) inside the transform lambda re-splits the text once per
    # chunk window — the O(tokens²) anti-pattern documented at shingled().
    toks = F.col("_toks")
    n = F.col("_n")
    chunks = F.transform(
        F.sequence(F.lit(0), n - 1, F.lit(stride)),
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.array_join(F.slice(toks, s + 1, size), " ").alias("chunk_text"),
            F.least(F.lit(size), n - s).cast("long").alias("n_tokens"),
        ),
    )
    return (
        docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
        .withColumn("_n", F.size(toks))
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_id", "c.chunk_text", "c.n_tokens")
    )


def chunk_sql(
    size: int = 64, stride: int = 48, src: str = "documents"
) -> str:
    """DuckDB mirror: same starts grid, same 1-based inclusive slice."""
    return (
        f"WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM {src}), "
        f"st AS (SELECT doc_id, t, UNNEST(generate_series(0, len(t) - 1, {stride})) AS s "
        f" FROM toks) "
        f"SELECT doc_id, CAST(s / {stride} AS BIGINT) AS chunk_id, "
        f"array_to_string(t[s + 1:s + {size}], ' ') AS chunk_text, "
        f"CAST(LEAST({size}, len(t) - s) AS BIGINT) AS n_tokens FROM st"
    )
