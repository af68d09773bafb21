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


# ------------------------------------------------------------ training


def _epoch_draws(rng, n: int, n_ents: int):
    """One epoch's corruption draws — driver-side on BOTH paths, so the
    negative stream is identical by construction."""
    import numpy as np

    corrupt_tail = rng.rand(n) < 0.5
    neg_ent = rng.randint(0, n_ents, n)
    return corrupt_tail, neg_ent.astype(np.int64)


def _epoch_rows(E, R, h, r, t, hn, tn, margin: float):
    """Per-triple margin-SGD sign gradients for one epoch — all FLOAT
    math here is per-row/elementwise numpy on identical inputs, so it
    is bit-identical wherever the rows are evaluated; only INTEGER
    counts ever cross rows. Returns (s_pos, s_neg) int64 arrays."""
    import numpy as np

    d_pos = E[h] + R[r] - E[t]
    d_neg = E[hn] + R[r] - E[tn]
    viol = (margin + np.abs(d_pos).sum(1) - np.abs(d_neg).sum(1)) > 0
    s_pos = np.sign(d_pos).astype(np.int64) * viol[:, None]
    s_neg = np.sign(d_neg).astype(np.int64) * viol[:, None]
    return s_pos, s_neg


def _apply_counts(E, R, cE, cR, lr: float) -> None:
    """M-step: one elementwise multiply-add per parameter — identical
    float op on identical values on both paths."""
    E += lr * cE
    R += lr * cR


def transe_fit_local(
    triples: list[tuple[str, str, str]],
    dim: int = 16,
    epochs: int = 60,
    lr: float = 0.05,
    margin: float = 2.0,
    seed: int = 11,
):
    """Deterministic LOCAL reference TransE trainer (margin ranking
    loss, L1 distance, sign gradients, unit-ball projection — the
    freeze_transe.py recipe) with one deliberate change: per-epoch
    gradient ACCUMULATION is integer (Σ of ±1 sign counts, scaled by
    ``lr`` once) instead of float scatter-add. Integer sums are
    order-independent, which is what lets
    :func:`transe_fit_distributed` match this function BIT-EXACTLY —
    the float accumulation in np.add.at would differ from any
    re-ordered sum in the last ulp. → (ents, rels, E, R) with rows
    aligned to the sorted vocab lists."""
    import numpy as np

    triples = sorted(set(triples))
    ents = sorted({h for h, _, _ in triples} | {t for _, _, t in triples})
    rels = sorted({r for _, r, _ in triples})
    epos = {e: i for i, e in enumerate(ents)}
    rpos = {x: i for i, x in enumerate(rels)}
    rng = np.random.RandomState(seed)
    b = 6.0 / np.sqrt(dim)
    E = rng.uniform(-b, b, (len(ents), dim))
    R = rng.uniform(-b, b, (len(rels), dim))
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12)
    h = np.array([epos[x] for x, _, _ in triples], dtype=np.int64)
    r = np.array([rpos[x] for _, x, _ in triples], dtype=np.int64)
    t = np.array([epos[x] for _, _, x in triples], dtype=np.int64)
    n = len(triples)
    for _ in range(epochs):
        E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1.0)
        corrupt_tail, neg = _epoch_draws(rng, n, len(ents))
        hn = np.where(corrupt_tail, h, neg)
        tn = np.where(corrupt_tail, neg, t)
        s_pos, s_neg = _epoch_rows(E, R, h, r, t, hn, tn, margin)
        cE = np.zeros_like(E, dtype=np.int64)
        cR = np.zeros_like(R, dtype=np.int64)
        np.add.at(cE, h, -s_pos)
        np.add.at(cE, t, s_pos)
        np.add.at(cR, r, s_neg - s_pos)
        np.add.at(cE, hn, s_neg)
        np.add.at(cE, tn, -s_neg)
        _apply_counts(E, R, cE, cR, lr)
    return ents, rels, E, R


def transe_fit_distributed(
    triples_df: DataFrame,
    dim: int = 16,
    epochs: int = 60,
    lr: float = 0.05,
    margin: float = 2.0,
    seed: int = 11,
):
    """Corpus-scale TransE trainer, BIT-EXACTLY equal to
    :func:`transe_fit_local` (pinned in tests/test_kgembed.py):

    - Parameter state (E: |V|×d, R: |preds|×d) lives on the driver and
      broadcasts each epoch — the BPE-merge-loop / k-means posture
      (entity vocabularies are Heaps-bounded; at 10^9+ entities swap
      this for the entity-table join variant, same epoch algebra).
    - Each epoch is ONE distributed pass over the triples: a pandas
      batch computes the per-row sign gradients (float math is
      elementwise per row — bit-identical anywhere) and PRE-AGGREGATES
      INTEGER sign counts per partition, so the shuffle carries
      ≤ |touched params| × partitions rows of exact int64 — the only
      cross-row reduction, order-independent by integerness.
    - The driver applies ``param += lr × count`` — one correctly-
      rounded float op per parameter, identical on both paths.

    ``triples_df``: (src, pred, dst). Duplicates are dropped; vocab
    order is sorted (deterministic ids on both paths).
    """
    import numpy as np
    import pandas as pd_local

    spark = triples_df.sparkSession
    rows = (
        triples_df.select("src", "pred", "dst").distinct().collect()
    )  # triple ids must align with the local replica's sorted order;
    # the collect is |triples| — at real scale ship ONLY the integer id
    # arrays below to executors and keep the strings distributed
    triples = sorted((x.src, x.pred, x.dst) for x in rows)
    ents = sorted({h for h, _, _ in triples} | {t for _, _, t in triples})
    rels = sorted({r for _, r, _ in triples})
    epos = {e: i for i, e in enumerate(ents)}
    rpos = {x: i for i, x in enumerate(rels)}
    rng = np.random.RandomState(seed)
    b = 6.0 / np.sqrt(dim)
    E = rng.uniform(-b, b, (len(ents), dim))
    R = rng.uniform(-b, b, (len(rels), dim))
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12)
    h = np.array([epos[x] for x, _, _ in triples], dtype=np.int64)
    r = np.array([rpos[x] for _, x, _ in triples], dtype=np.int64)
    t = np.array([epos[x] for _, _, x in triples], dtype=np.int64)
    n = len(triples)
    idx_df = spark.createDataFrame(
        pd_local.DataFrame({"h": h, "r": r, "t": t, "i": np.arange(n)})
    ).repartition(max(2, spark.sparkContext.defaultParallelism // 4))

    for _ in range(epochs):
        E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1.0)
        corrupt_tail, neg = _epoch_draws(rng, n, len(ents))
        hn_all = np.where(corrupt_tail, h, neg)
        tn_all = np.where(corrupt_tail, neg, t)
        bE = spark.sparkContext.broadcast(E)
        bR = spark.sparkContext.broadcast(R)
        bneg = spark.sparkContext.broadcast((hn_all, tn_all))
        mrg = margin

        def _estep(batches):
            EE, RR = bE.value, bR.value
            hn_a, tn_a = bneg.value
            # dense per-partition accumulators (|V|·d int64 — the same
            # footprint as the broadcast model itself), scatter-added
            # vectorized; only touched rows are emitted
            accE = np.zeros((EE.shape[0], EE.shape[1]), dtype=np.int64)
            accR = np.zeros((RR.shape[0], RR.shape[1]), dtype=np.int64)
            for pdf in batches:
                bi = pdf["i"].to_numpy()
                bh = pdf["h"].to_numpy()
                br = pdf["r"].to_numpy()
                bt = pdf["t"].to_numpy()
                bhn, btn = hn_a[bi], tn_a[bi]
                s_pos, s_neg = _epoch_rows(EE, RR, bh, br, bt, bhn, btn, mrg)
                np.add.at(accE, bh, -s_pos)
                np.add.at(accE, bt, s_pos)
                np.add.at(accE, bhn, s_neg)
                np.add.at(accE, btn, -s_neg)
                np.add.at(accR, br, s_neg - s_pos)
            oute = np.flatnonzero(np.abs(accE).sum(1))
            outr = np.flatnonzero(np.abs(accR).sum(1))
            out = [("E", int(k), accE[k].tolist()) for k in oute] + [
                ("R", int(k), accR[k].tolist()) for k in outr
            ]
            yield pd_local.DataFrame(out, columns=["kind", "idx", "c"])

        agg = (
            idx_df.mapInPandas(_estep, "kind string, idx long, c array<long>")
            .select("kind", "idx", F.posexplode("c").alias("d", "v"))
            .groupBy("kind", "idx", "d")
            .agg(F.sum("v").alias("v"))
            .collect()
        )
        cE = np.zeros_like(E, dtype=np.int64)
        cR = np.zeros_like(R, dtype=np.int64)
        for row in agg:
            (cE if row.kind == "E" else cR)[row.idx, row.d] = row.v
        _apply_counts(E, R, cE, cR, lr)
        for bc in (bE, bR, bneg):
            bc.unpersist()
    return ents, rels, E, R


def quantize_model(ents, rels, E, R, scale: int = 1000):
    """(ent_pdf, rel_pdf) integer-quantized q = round(v·scale) — the
    freeze_transe.py contract consumed by transe_distance/ranks."""
    import pandas as pd_local

    ent = pd_local.DataFrame(
        {"entity_id": ents, "emb": [list(map(int, v)) for v in (E * scale).round().astype("int64")]}
    )
    rel = pd_local.DataFrame(
        {"pred": rels, "emb": [list(map(int, v)) for v in (R * scale).round().astype("int64")]}
    )
    return ent, rel
