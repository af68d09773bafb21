"""KG evaluation operators: distributed precision/recall of a predicted
triple set vs a reference set, and pairwise P/R/F1 of an entity
clustering vs gold — the two numbers every extraction/canonicalization
change is judged by (the north-star P/R ≥ 0.95 gate itself).

``tools/drive_kg.py`` computes triple P/R by collecting edges to the
driver — fine at test scale, impossible at 10^12 edges. These are the
driver-free forms: distinct + one left-semi join per side, counts as
1-row partial aggregates crossJoined back (the t25/e10 broadcast-1-row
pattern) — no data ever reaches the driver.

Clustering pair-P/R (the B³-adjacent pairwise metric standard in entity
resolution): same-cluster pairs enumerate via a cluster-keyed self-join
(Σ k_c² work, bounded by the largest cluster — salt or cap giant
clusters upstream, they are almost always canonicalization bugs).

Reference parity: the reference tracks per-job processed/total counts
(`backend/app/models/processing_job.py:17-32`); these operators are the
quality counterpart a KG build publishes next to those counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one_row_count(df: DataFrame, name: str) -> DataFrame:
    return df.agg(F.count(F.lit(1)).alias(name))


def triple_pr(
    pred: DataFrame,
    gold: DataFrame,
    keys: tuple[str, ...] = ("src", "pred", "dst"),
) -> DataFrame:
    """→ ONE row (n_pred, n_gold, n_hit, precision, recall, f1) over
    DISTINCT key tuples. Empty sides score 0 (not NULL)."""
    ks = list(keys)
    p = pred.select(*ks).distinct()
    g = gold.select(*ks).distinct()
    hit = p.join(g, ks, "left_semi")
    counts = (
        _one_row_count(p, "n_pred")
        .crossJoin(F.broadcast(_one_row_count(g, "n_gold")))
        .crossJoin(F.broadcast(_one_row_count(hit, "n_hit")))
    )
    prec = F.when(F.col("n_pred") > 0, F.col("n_hit") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_gold") > 0, F.col("n_hit") / F.col("n_gold")).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    return counts.select(
        "n_pred",
        "n_gold",
        "n_hit",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def _same_cluster_pairs(assign: DataFrame, id_col: str, c_col: str) -> DataFrame:
    a = assign.select(F.col(id_col).alias("_a"), F.col(c_col).alias("_c")).distinct()
    b = a.select(F.col("_a").alias("_b"), "_c")
    return a.join(b, "_c").filter(F.col("_a") < F.col("_b")).select("_a", "_b")


def cluster_pair_pr(
    pred_assign: DataFrame,
    gold_assign: DataFrame,
    id_col: str = "id",
    pred_col: str = "cluster",
    gold_col: str = "cluster",
) -> DataFrame:
    """Pairwise clustering P/R/F1 → ONE row (n_pred_pairs, n_gold_pairs,
    n_hit_pairs, precision, recall, f1): a pair counts as predicted/gold
    when both ids share the respective cluster. The standard pairwise
    entity-resolution metric (precision = fraction of predicted merges
    that are right, recall = fraction of true merges found)."""
    pp = _same_cluster_pairs(pred_assign, id_col, pred_col)
    gp = _same_cluster_pairs(gold_assign, id_col, gold_col)
    hit = pp.join(gp, ["_a", "_b"], "left_semi")
    counts = (
        _one_row_count(pp, "n_pred_pairs")
        .crossJoin(F.broadcast(_one_row_count(gp, "n_gold_pairs")))
        .crossJoin(F.broadcast(_one_row_count(hit, "n_hit_pairs")))
    )
    prec = F.when(
        F.col("n_pred_pairs") > 0, F.col("n_hit_pairs") / F.col("n_pred_pairs")
    ).otherwise(0.0)
    rec = F.when(
        F.col("n_gold_pairs") > 0, F.col("n_hit_pairs") / F.col("n_gold_pairs")
    ).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    return counts.select(
        "n_pred_pairs",
        "n_gold_pairs",
        "n_hit_pairs",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
