"""TransE KG-embedding scoring and link-prediction ranking.

The completion/validation half of KG construction: a frozen TransE
model (Bordes et al. 2013 — facts as translations, score(h, r, t) =
−‖E_h + R_r − E_t‖₁) trained offline on the golden triples
(``fixtures/freeze_transe.py``, the LM/BPE/qc fixture discipline) is
applied AT SCALE here — scoring candidate triples and ranking every
entity as a tail candidate. The model is INTEGER-QUANTIZED (q =
round(v·1000)), so distances are exact BIGINT sums and the DuckDB
oracle gates ranking hash-for-hash; ties break to the lexically
smaller entity id, making ranks total and deterministic.

Scale shape:
- ``transe_distance``: entity embeddings at 10^11 entities are a
  TABLE (|V|·d), never a broadcast — two hash joins on the entity key
  (head, tail) + ONE broadcast of the predicate table (predicates are
  vocabulary-sized). The distance itself is a JVM ``zip_with`` +
  ``aggregate`` — no Python, no shuffle beyond the joins.
- ``transe_tail_ranks``: the EVAL set is small (that is what an eval
  set is) — it broadcasts, the full entity table streams past it ONCE,
  and the rank is a partial-aggregated count of strictly-better
  candidates per test triple: shuffle carries |test| count rows per
  partition, never the |test|×|V| score matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENT_FIXTURE = "fixtures/transe_ent.parquet"
REL_FIXTURE = "fixtures/transe_rel.parquet"


def _l1(a, b) -> F.Column:
    """Σ|a_i − b_i| over two equal-length integer arrays — pure JVM."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def transe_distance(
    triples: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame
) -> DataFrame:
    """(src, pred, dst, dist): the quantized TransE L1 distance
    ‖E_h + R_r − E_t‖₁ per candidate triple (low = plausible). Triples
    whose head/tail/pred is unknown to the model are dropped (inner
    joins — score only what the model covers)."""
    h = ent_emb.select(F.col("entity_id").alias("src"), F.col("emb").alias("_h"))
    t = ent_emb.select(F.col("entity_id").alias("dst"), F.col("emb").alias("_t"))
    r = rel_emb.select("pred", F.col("emb").alias("_r"))
    hr = F.zip_with("_h", "_r", lambda x, y: x + y)
    return (
        triples.select("src", "pred", "dst")
        .join(h, "src")
        .join(t, "dst")
        .join(F.broadcast(r), "pred")
        .select("src", "pred", "dst", _l1(hr, F.col("_t")).alias("dist"))
    )


def transe_tail_ranks(
    test_triples: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame
) -> DataFrame:
    """(src, pred, dst, rank): raw tail rank of each test triple — the
    position of the true tail when every model entity is scored as a
    candidate for (src, pred, ?). rank = 1 + #{e : d(e) < d(dst) or
    (d(e) = d(dst) and e < dst)} — exact integers, total order.

    Plan: the test set (with its head+relation embeddings and the true
    tail's distance) BROADCASTS; the entity table streams past it once;
    the count partial-aggregates per test key."""
    scored_true = transe_distance(test_triples, ent_emb, rel_emb).withColumnRenamed(
        "dist", "_dtrue"
    )
    h = ent_emb.select(F.col("entity_id").alias("src"), F.col("emb").alias("_h"))
    r = rel_emb.select("pred", F.col("emb").alias("_r"))
    probes = (
        scored_true.join(h, "src")
        .join(F.broadcast(r), "pred")
        .select(
            "src",
            "pred",
            "dst",
            "_dtrue",
            F.zip_with("_h", "_r", lambda x, y: x + y).alias("_hr"),
        )
    )
    cand = ent_emb.select(F.col("entity_id").alias("_e"), F.col("emb").alias("_t"))
    d = _l1(F.col("_hr"), F.col("_t"))
    better = (d < F.col("_dtrue")) | (
        (d == F.col("_dtrue")) & (F.col("_e") < F.col("dst"))
    )
    return (
        cand.crossJoin(F.broadcast(probes))
        .groupBy("src", "pred", "dst")
        .agg(
            (F.lit(1) + F.sum(better.cast("long"))).alias("rank"),
            F.first("_dtrue").alias("_d"),
        )
        .select("src", "pred", "dst", "rank")
    )


def ranking_metrics(ranks: DataFrame, ks: tuple[int, ...] = (1, 3, 10)) -> DataFrame:
    """One-row link-prediction summary: n, MRR, hits@k. MRR is float
    (reported, never hash-gated); hits are exact integer counts."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.avg(F.lit(1.0) / F.col("rank")).alias("mrr"),
    ] + [
        F.sum((F.col("rank") <= k).cast("long")).alias(f"hits_{k}") for k in ks
    ]
    return ranks.agg(*aggs)
