"""BM25 ranked retrieval over the documents table.

Reference parity: the reference seeds and ranks crawl targets with
keyword weights (``backend/README.md:37,96``); C14 covers the
alias-weight sum. BM25 is the standard upgrade a real corpus-curation
stack uses for keyword-driven document ranking (Robertson/Sparck-Jones
probabilistic weighting) — selecting seed documents, mining domain
subsets, and scoring relevance for targeted crawls.

Spark-first shape, built for 10^12 docs:
- Per-doc term frequencies and doc length are pure JVM higher-order
  array expressions over one whitespace tokenization — ZERO shuffle and
  zero Python in the per-doc path.
- Corpus statistics (N, avgdl, per-term document frequency) come from
  ONE map-side-partial global aggregate producing a single row —
  shuffle volume is one row per upstream partition, independent of
  corpus size. That row is broadcast back (1-row cross join → Spark
  plans BroadcastNestedLoopJoin, no exchange of the big side).
- Scoring is again per-row JVM arithmetic. Total cost: two scans of the
  corpus (stats + score) and no data-sized shuffle anywhere. The query
  term list is a small literal (tens of terms), so the tf column fan-out
  stays bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tf(term: str) -> Column:
    return F.size(F.filter("_toks", lambda x: x == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing at least one query term:
    (id_col, bm25) with bm25 = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 −
    b + b·dl/avgdl)), idf_t = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
    (the Lucene-style non-negative idf). Tokenization is lowercased
    whitespace splitting — the corpus contract shared with
    functions.textstats.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = docs.select(
        F.col(id_col), toks.alias("_toks")
    ).select(
        id_col,
        F.size("_toks").alias("_dl"),
        *[_tf(t).alias(f"_tf{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    idf = [
        F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        )
        for i in range(len(terms))
    ]
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
    )
    parts = [
        F.when(
            F.col(f"_tf{i}") > 0,
            idf[i] * F.col(f"_tf{i}") * F.lit(k1 + 1.0) / (F.col(f"_tf{i}") + norm),
        ).otherwise(F.lit(0.0))
        for i in range(len(terms))
    ]
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    tf_cols = [F.col(f"_tf{i}") for i in range(len(terms))]
    any_hit = (F.greatest(*tf_cols) if len(tf_cols) > 1 else tf_cols[0]) > 0
    return scored.filter(any_hit).select(
        id_col, F.round(score, 6).alias("bm25")
    )


def inverted_index(
    docs: DataFrame,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sharded inverted index → ``(shard, term, df, postings)`` with
    ``postings`` the '|'-joined doc-id list sorted numerically — the
    retrieval-serving twin of graph_query.adjacency_lists (one shard =
    one query worker's slice; df is the BM25 document frequency, so
    this table also feeds scoring without a second corpus pass).

    Scale shape: JVM tokenize (lower + regexp_extract_all + explode)
    → per-doc DISTINCT (terms count once per doc) → ONE
    partial-aggregated groupBy(term); shard = md5-12-hex bucket of the
    term, engine-portable. Posting lists are canonical (sorted), so
    the table is byte-stable across runs and partitionings. Hub terms
    (stopwords) make long rows — cap or stopword-filter upstream via
    the caller's docs projection when serving latency matters."""
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)),
                    F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+"),
                    F.lit(0),
                )
            ).alias("term"),
        )
        .distinct()
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.col(id_col))),
                    lambda x: x.cast("string"),
                ),
                "|",
            ).alias("postings"),
        )
        .select(
            F.pmod(
                F.conv(F.substring(F.md5(F.col("term")), 1, 12), 16, 10).cast("long"),
                F.lit(n_shards),
            )
            .cast("int")
            .alias("shard"),
            "term",
            F.col("df").cast("int").alias("df"),
            "postings",
        )
    )
