"""Training-data curation operators: deterministic stratified sampling
and token-budget shard packing over the ``documents`` table.

Both are standard stages of an LLM pre-training data pipeline (data
mixing across languages/sources; packing documents into fixed-token
training chunks). Both are pure DataFrame algebra, engine-portable, and
designed for the 100-TB layout:

- sampling is a stateless per-row filter on an md5-derived key — no
  shuffle at all, fully pushed into the scan stage, reproducible across
  engines and runs (no ``rand()``);
- packing windows are partitioned by a hash bucket, so the cumulative
  sums run as ~n_buckets independent sorted windows — NEVER one global
  window (a single-partition sort is the classic 100-TB killer for
  naive cumsum packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphlab_spark.functions.textstats import token_count_col

# 4 hex digits = 65536 strata of the md5 key space. Lowercase fixed-width
# hex compares lexically == numerically, which is what makes the same
# threshold literal work in Spark AND DuckDB (both emit lowercase hex).
_HEX_SPACE = 16**4


def rate_to_hex_threshold(rate: float) -> str:
    """Sampling rate in [0,1] → 4-hex-digit threshold string such that
    P[substr(md5(key),1,4) < threshold] == round(rate * 65536) / 65536."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    n = round(rate * _HEX_SPACE)
    if n >= _HEX_SPACE:
        # 'g' sorts after every hex digit in ASCII → keep-all sentinel
        # that stays a plain string comparison on both engines
        return "g"
    return format(n, "04x")


def sample_key_col(id_col: str = "doc_id", salt: str = "s42") -> Column:
    """Deterministic per-row sample key: first 4 hex chars of
    md5(id || ':' || salt). Identical expression exists in ANSI SQL
    (see training_queries.t05) — md5 is bit-identical across engines."""
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 4
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "s42",
) -> DataFrame:
    """Keep each row of stratum s with probability ``rates[s]`` (strata
    absent from ``rates`` are dropped) — deterministically: the decision
    depends only on (id, salt), so reruns, retries, and other engines
    reproduce the exact same sample (no ``rand()``; a nondeterministic
    sample breaks retry-safety the same way nondeterministic salting
    does — see operators/skew.py).

    Scale: a scan-stage filter; no shuffle, no state. Changing the mix
    (data-mixture reweighting between training runs) only changes
    literal thresholds, and lowering a rate yields a SUBSET of the
    higher-rate sample (nested samples — useful for ablations).
    """
    key = sample_key_col(id_col, salt)
    thresh = F.lit(None).cast("string")
    for stratum, rate in rates.items():
        thresh = F.when(
            F.col(stratum_col) == stratum, F.lit(rate_to_hex_threshold(rate))
        ).otherwise(thresh)
    return docs.filter(key < thresh)


def pack_shards(
    docs: DataFrame,
    budget_tokens: int = 4096,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    count_col: str | None = None,
    shuffle_salt: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training chunks.

    Greedy contiguous packing per hash bucket: docs are ordered by id
    within ``bucket = id % n_buckets``; a doc belongs to chunk
    ``floor(cumulative_tokens_before_it / budget)``. A doc straddling a
    boundary is assigned to the chunk where it starts (standard greedy
    semantics: every chunk's token sum is < budget + its last doc).

    ``shuffle_salt``: when set, docs are packed in DETERMINISTIC
    PSEUDO-RANDOM order — md5(id || salt) — instead of id order, so a
    chunk mixes documents from across the corpus (training-order
    shuffling: consecutive id ranges are typically one crawl segment /
    domain, and a model fed unmixed chunks sees correlated batches).
    Same salt → identical packing on every run and engine.

    ``count_col``: name of a precomputed per-doc token-count column to
    budget on (e.g. exact BPE subword counts from
    ``functions.bpe.bpe_count_col``); default derives whitespace counts
    from ``text`` (the JVM fast path).

    Scale: ``n_buckets`` independent window sorts (set n_buckets ≈
    cluster cores at 100 TB) — cumsum never runs as one global window.
    Output chunk ids are (bucket, chunk_id) pairs, deterministic.
    """
    order = (
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(shuffle_salt)))
        if shuffle_salt is not None
        else F.col(id_col)
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tokens = (
        F.col(count_col).cast("long") if count_col is not None else token_count_col()
    )
    return (
        docs.select(
            F.col(id_col),
            (F.col(id_col) % n_buckets).alias("bucket"),
            n_tokens.alias("n_tokens"),
        )
        .withColumn(
            "chunk_id",
            F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget_tokens),
        )
        .select(id_col, "bucket", "chunk_id", "n_tokens")
    )


def domain_quota(
    docs: DataFrame,
    per_domain: int,
    domain_col: str = "source",
    quality_col=None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain retention cap for data mixing: keep the top
    ``per_domain`` docs of each domain, ranked by quality (desc) with a
    deterministic ``id_col`` tie-break → (doc_id, domain, quality, rank).

    Web corpora are Zipf over domains — without a cap the head domains
    dominate the mixture. Plan shape: ONE window partitioned by domain
    (parallel per-domain sorts, never a global sort — same posture as
    ``pack_shards``); a skewed mega-domain is bounded by the cap itself
    and AQE's skew splitting on the window shuffle.

    ``quality_col``: any Column; defaults to
    ``functions.textstats.quality_score_col()``.
    """
    from graphlab_spark.functions.textstats import quality_score_col

    q = quality_score_col() if quality_col is None else quality_col
    w = Window.partitionBy(domain_col).orderBy(
        F.col("_quality").desc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("_quality", q.cast("double"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_domain)
        .select(
            id_col,
            F.col(domain_col).alias("domain"),
            F.round("_quality", 4).alias("quality"),
            "rank",
        )
    )


def temperature_mixture(
    docs: DataFrame,
    alpha: float = 0.5,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled domain mixture weights (the multilingual-BERT /
    Pile / DoReMi reweighting rule): per domain d with token mass w_d,
    the mixture weight is p_d = w_d^alpha / sum_e(w_e^alpha).
    alpha=1 reproduces the raw corpus mix; alpha=0 is uniform over
    domains; 0<alpha<1 upsamples the tail. → (domain, n_docs, n_tokens,
    raw_share, mix_weight, boost) where boost = mix_weight / raw_share
    is the per-domain sampling factor to feed stratified_sample /
    domain_quota when drawing the training mixture.

    Plan: ONE partial-aggregated groupBy(domain) shuffle over the
    corpus; the unpartitioned normalization window then runs on the
    AGGREGATED frame, whose row count is the number of domains — a
    single tiny task by design, never a corpus-sized global window.
    """
    ag = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    powc = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    raw = F.col("n_tokens") / F.sum("n_tokens").over(w)
    mix = powc / F.sum(powc).over(w)
    return ag.select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round(raw, 6).alias("raw_share"),
        F.round(mix, 6).alias("mix_weight"),
        F.round(mix / raw, 6).alias("boost"),
    )


def mixture_sample(
    docs: DataFrame,
    base_rate: float,
    alpha: float = 0.5,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "s42",
) -> DataFrame:
    """APPLY a temperature mixture: sample each domain at
    ``min(1, base_rate · boost_d)`` where boost_d comes from
    ``temperature_mixture`` — the step that turns mixture WEIGHTS into
    an actual training subsample (upsampling the tail toward the
    temperature-scaled mix while capping at keep-everything).

    Deterministic like ``stratified_sample`` (same md5 key, no
    ``rand()``), but the per-domain threshold is computed IN THE PLAN
    (floor(rate·65536 + 0.5) → 4-hex-digit string; 'g' = keep-all
    sentinel) from the ROUND-6 boost — rounding first is what makes the
    thresholds bit-equal across engines (the t23 oracle contract).

    Scale: one pass computes the domain boosts (t23's partial-agg
    shuffle on a domains-sized frame); the thresholds frame is O(domains)
    and broadcast, so the sampling itself stays a scan-stage filter —
    no corpus shuffle.
    """
    mix = temperature_mixture(
        docs, alpha=alpha, domain_col=domain_col, text_col=text_col
    )
    n = F.floor(
        F.least(F.lit(1.0), F.lit(base_rate) * F.col("boost")) * _HEX_SPACE
        + F.lit(0.5)
    ).cast("long")
    thr = F.when(n >= _HEX_SPACE, F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(n), 4, "0"))
    )
    thrs = mix.select(F.col("domain").alias("_dom"), thr.alias("_thr"))
    key = sample_key_col(id_col, salt)
    return (
        docs.join(F.broadcast(thrs), F.col(domain_col) == F.col("_dom"))
        .filter(key < F.col("_thr"))
        .select(id_col, F.col(domain_col).alias("domain"))
    )
