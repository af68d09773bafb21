"""DSIR: Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") — score
every raw document by how target-like it is, using hashed n-gram bag
models:

    w(doc) = log p_target(doc) − log p_raw(doc)
           = Σ_{gram g ∈ doc} [ ln p_t(h(g)) − ln p_r(h(g)) ]

where h hashes word unigrams+bigrams into B buckets and each
distribution is add-1-smoothed bucket frequencies. Top-weight docs (or
Gumbel-perturbed resampling over the weights) select the pretraining
subset; this is the published alternative to a learned classifier
(operators/qclassify.py) that needs NO labels — just a target corpus
slice.

Scale shape: both bucket-count tables are partial-aggregated groupBys
over exploded grams that collapse to ≤ B rows and broadcast back; the
only data-sized shuffle is the per-doc weight sum (one partial-agg
groupBy on the doc key). Everything is JVM column algebra — the token
array is HOISTED into its own projection (never split(...) inside a
lambda), grams are a zip_with over the hoisted array, the hash is the
portable md5 shift/mask shared with operators/sketch.py so the DuckDB
oracle replays it exactly; only the final ln/sum is float (ROUND 6
absorbs ulp noise — the t18 LM-perplexity precedent).

Reference parity: the reference ranks keyword relevance with
weight/is_primary fields (`backend/app/services/research_keyword.py`
merge semantics keep the higher weight); DSIR is the corpus-level
scoring that produces such weights at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1024


def _gram_bucket(gram: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Portable 48-bit md5 bucket (the operators/sketch.py formula)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("g|"), gram)), 1, 12), 16, 10
        ).cast("long"),
        F.lit(n_buckets),
    )


def gram_buckets_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, bucket) — one row per word unigram AND bigram occurrence.
    Tokenization = lowercase whitespace split (the t25 contract);
    bigrams via zip_with over the hoisted token array."""
    toks = F.col("_toks")
    # both zip_with inputs sliced to length n-1: zip_with pads the
    # SHORTER side with nulls, which would emit a trailing NULL gram
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select(
            F.col(id_col),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_toks"),
        )
        .select(
            F.col(id_col),
            F.explode(F.concat(toks, bigrams)).alias("_gram"),
        )
        .select(F.col(id_col), _gram_bucket(F.col("_gram"), n_buckets).alias("bucket"))
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """→ (id, dsir_weight): log-likelihood ratio of each doc under the
    target-slice vs whole-corpus hashed-gram models. ``target_pred`` is
    a boolean Column over ``docs`` selecting the target slice (e.g.
    ``F.col("source").isin(...)``)."""
    grams = gram_buckets_frame(docs, id_col, text_col, n_buckets)
    target_ids = docs.filter(target_pred).select(id_col)
    tgrams = grams.join(F.broadcast(target_ids), id_col, "left_semi")
    t_counts = tgrams.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    r_counts = grams.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    t_total = t_counts.agg(F.sum("ct").alias("nt"))  # 1-row, broadcast back
    r_total = r_counts.agg(F.sum("cr").alias("nr"))
    # δ(bucket) = ln p_t − ln p_r with add-1 smoothing over B buckets
    delta = (
        r_counts.join(t_counts, "bucket", "left")
        .fillna(0, ["ct"])
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(r_total))
        .select(
            "bucket",
            (
                F.log((F.col("ct") + 1) / (F.col("nt") + n_buckets))
                - F.log((F.col("cr") + 1) / (F.col("nr") + n_buckets))
            ).alias("delta"),
        )
    )
    return (
        grams.join(F.broadcast(delta), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum("delta"), 6).alias("dsir_weight"))
    )


def dsir_select(
    docs: DataFrame,
    target_pred: Column,
    n_keep: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Top-``n_keep`` docs by DSIR weight (deterministic id tie-break) —
    the selection step. A global top-k, not a sort: at 10^12 docs use
    the weight as a quality stream and threshold instead (the paper's
    resampling variant perturbs weights with Gumbel noise first)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("dsir_weight").desc(), F.col(id_col).asc())
    return (
        dsir_weights(docs, target_pred, id_col, text_col, n_buckets)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_keep)
        .select(id_col, "dsir_weight")
    )


def dsir_resample(
    docs: DataFrame,
    target_pred: Column,
    n_keep: int,
    temperature: float = 1.0,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """The paper's actual selection step — GUMBEL-TOP-K resampling:
    sampling n_keep docs ∝ exp(w/temperature) without replacement
    equals taking the top-k of w/temperature + Gumbel noise. The noise
    is hash-derived (md5 of seed|id → uniform in (0,1) → −ln(−ln u)),
    so the draw is DETERMINISTIC and replayable in any engine — no RNG
    state, no driver coordination, fully shuffle-free until the same
    top-k window dsir_select pays."""
    two48 = float(1 << 48)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / (two48 + 2.0)  # strictly inside (0, 1)
    gumbel = -F.log(-F.log(u))
    from pyspark.sql import Window

    weights = dsir_weights(docs, target_pred, id_col, text_col, n_buckets)
    keyed = weights.withColumn(
        "_key", F.col("dsir_weight") / temperature + gumbel
    )
    w = Window.orderBy(F.col("_key").desc(), F.col(id_col).asc())
    return (
        keyed.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_keep)
        .select(id_col, "dsir_weight")
    )
