"""Bigram language-model perplexity scoring (CCNet-style quality filter).

CCNet (Wenzek et al., LREC 2020) ranks Common-Crawl documents by the
perplexity of a KenLM n-gram model and keeps the low-perplexity head —
the single most load-bearing quality filter in public web-curation
pipelines. The container ships no KenLM, so this module implements the
same mechanism with a word-BIGRAM model under add-alpha smoothing whose
counts are trained OFFLINE (``fixtures/freeze_lm.py``, deterministic,
seeded corpus) and committed as parquet — the exact pattern used for the
BPE merges fixture (functions/bpe.py).

Reference parity: the reference scores/caches per-document relevance
weights for ranking (`backend/app/services/research_keyword.py:68-137`
keyword weights); this is the corpus-quality analog over the north
rule's page table.

Scale shape (100 TB): the LM is vocabulary-sized (tens of thousands of
rows) and is BROADCAST to every executor; bigram construction is a pure
JVM higher-order ``transform`` over the token array (zero Python, zero
shuffle); scoring is two broadcast left joins plus ONE partial-
aggregated groupBy(doc_id) — the only shuffle, and it carries one
float per bigram, not the text.

Smoothing: p(w2|w1) = (c(w1,w2) + a) / (c(w1) + a·V) with a = 0.5 and
V = distinct-unigram count + 1 (the +1 is the OOV type). Unseen
contexts degrade to 1/V as they should. All inputs to the division are
integers-plus-0.5 (exact doubles), so Spark and DuckDB compute
bit-identical ratios; ln/exp differ at ≤1 ulp, absorbed by ROUND(.., 6)
after the per-doc average (the d06 cosine precedent).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UNIGRAMS_FIXTURE = "fixtures/lm_unigrams.parquet"
BIGRAMS_FIXTURE = "fixtures/lm_bigrams.parquet"
ALPHA = 0.5


def tokenize(text: str) -> list[str]:
    """Offline twin of the column expression: lowercase, trim,
    whitespace-split (t01's token rule plus lowering)."""
    return text.strip().lower().split()


def train_bigram_counts(
    texts: Iterable[str],
) -> tuple[Counter, Counter]:
    """Count unigrams and bigrams over ``texts`` — offline trainer used
    by fixtures/freeze_lm.py. Deterministic: plain counting."""
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = tokenize(t)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    return uni, bi


def perplexity_frame(
    docs: DataFrame,
    unigrams_path: str = UNIGRAMS_FIXTURE,
    bigrams_path: str = BIGRAMS_FIXTURE,
    alpha: float = ALPHA,
) -> DataFrame:
    """Score every document (≥ 2 tokens) against the frozen bigram LM →
    (doc_id, n_bigrams, avg_logprob, ppl), rounded to 6 decimals.
    Lower ppl = more natural text; filter with :func:`ppl_filter`."""
    spark = docs.sparkSession
    uni = spark.read.parquet(unigrams_path)
    bi = spark.read.parquet(bigrams_path)
    # V is a fixture property (tiny file): distinct unigrams + 1 OOV type
    n_vocab = uni.count() + 1

    # tokenize + bigram explode + broadcast lookups all run BEFORE any
    # exchange — spread an under-parallel scan across the cores (r6;
    # no-op at scale). A doc's bigrams stay within one partition, so
    # the per-doc logprob summation order is unchanged.
    from graphlab_spark.operators.scratch import spread

    docs = spread(docs)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    pairs = F.expr(
        "transform(slice(_toks, 1, size(_toks) - 1), "
        "(w, i) -> struct(w AS w1, _toks[i + 1] AS w2))"
    )
    exploded = (
        docs.select("doc_id", toks.alias("_toks"))
        .filter(F.size("_toks") >= 2)
        .select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    scored = (
        exploded.join(F.broadcast(bi), ["w1", "w2"], "left")
        .withColumnRenamed("c", "cb")
        .join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("cu"))),
            "w1",
            "left",
        )
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(alpha) * F.lit(n_vocab))
            ).alias("lp"),
        )
    )
    avg = F.sum("lp") / F.count(F.lit(1))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 6).alias("ppl"),
    )


def ppl_filter(
    docs: DataFrame,
    max_ppl: float,
    unigrams_path: str = UNIGRAMS_FIXTURE,
    bigrams_path: str = BIGRAMS_FIXTURE,
) -> DataFrame:
    """Keep documents whose LM perplexity is ≤ ``max_ppl`` (CCNet's
    head/middle cut). Docs with < 2 tokens have no LM evidence and are
    dropped. Returns ``docs``'s columns unchanged."""
    keep = perplexity_frame(docs, unigrams_path, bigrams_path).filter(
        F.col("ppl") <= max_ppl
    )
    return docs.join(keep.select("doc_id"), "doc_id")
