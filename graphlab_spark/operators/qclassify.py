"""Learned quality classifier applied at corpus scale.

Real curation pipelines (CCNet, fastText wiki-vs-crawl, Llama/GPT data
recipes) train a small linear text classifier OFFLINE and score every
document of the crawl with it; the at-scale half is pure data movement.
This module is that half, Spark-first:

- the frozen model (``fixtures/qc_weights.parquet``, built by
  ``fixtures/freeze_qc.py``) is a hashed-bag-of-words logistic scorer
  with INTEGER-QUANTIZED weights, so a doc's score is exact integer
  arithmetic — ``score_q = bias_q · n_tokens + Σ_tokens w_q[bucket]``
  — and hashes identically in any engine (the oracle runs the same
  arithmetic in DuckDB);
- tokenization + hashing are pure JVM column expressions (``lower`` +
  ``regexp_extract_all`` + ``explode`` + md5-prefix bucket) inside
  whole-stage codegen — zero Python on the per-token path;
- the weight table is ≤ 4096 rows → ``broadcast()`` join; the only
  shuffle is the doc_id groupBy, partial-aggregated map-side, so it
  carries one (doc, n, Σw) row per doc per task — never token rows.

At 100 TB nothing changes: weights stay driver-small, per-token work is
scan-local, and the doc-level aggregate is the same single shuffle.

Reference parity: the reference has no learned scorer (its filters are
rule-based); this is a beyond-reference curation operator complementing
functions.textstats (Gopher rules) and functions.lm (perplexity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QC_WEIGHTS_FIXTURE = "fixtures/qc_weights.parquet"
N_BUCKETS = 4096

# engine-portable token bucket: int(md5(word)[:12], 16) % B
# (Spark conv(substring(md5,1,12),16,10) ≡ DuckDB CAST('0x'||... AS BIGINT))
_PRETOKEN_JAVA = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def classifier_scores(
    spark: SparkSession,
    docs: DataFrame,
    weights_path: str = QC_WEIGHTS_FIXTURE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, score_q, keep) for every row of ``docs`` —
    ``keep = score_q > 0`` under the frozen quantized model. Zero-token
    docs score ``bias_q · 0 = 0`` → dropped (no evidence ⇒ not kept)."""
    from graphlab_spark.operators.scratch import spread

    docs = spread(docs)  # per-doc tokenize/hash/score is pre-exchange (r6)
    w = spark.read.parquet(weights_path)
    bias_q = int(w.filter(F.col("bucket") == -1).head()["w_q"])  # 1 tiny row
    weights = w.filter(F.col("bucket") >= 0)

    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(_PRETOKEN_JAVA), F.lit(0)
            )
        ).alias("word"),
    ).select(
        id_col,
        F.pmod(
            F.conv(F.substring(F.md5(F.col("word")), 1, 12), 16, 10).cast("long"),
            F.lit(N_BUCKETS),
        ).alias("bucket"),
    )
    summed = (
        toks.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("w_q"), F.lit(0))).alias("_sw"),
        )
    )
    return (
        docs.select(id_col)
        .join(summed, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("int").alias("n_tokens"),
            (
                F.lit(bias_q) * F.coalesce(F.col("n_tokens"), F.lit(0))
                + F.coalesce(F.col("_sw"), F.lit(0))
            )
            .cast("long")
            .alias("score_q"),
        )
        .withColumn("keep", F.col("score_q") > 0)
    )


def classifier_filter(
    spark: SparkSession,
    docs: DataFrame,
    weights_path: str = QC_WEIGHTS_FIXTURE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` rows the frozen classifier keeps — the curation-funnel
    form (same shape as textstats.gopher-rule and lm-perplexity gates)."""
    kept = classifier_scores(spark, docs, weights_path, id_col, text_col).filter(
        F.col("keep")
    )
    return docs.join(kept.select(id_col), id_col, "left_semi")
