"""ANN: brute-force exactness vs numpy; LSH approximation properties."""

from __future__ import annotations

import numpy as np
import pytest

from graphlab_spark.operators import ann as ANN

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint()


def test_bruteforce_matches_numpy(spark, embs):
    rows = embs.collect()
    V = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    got = ANN.brute_force_topk(embs, [0, 1, 2], k=3).collect()
    for qid in [0, 1, 2]:
        q = V[qid]
        scores = {
            nid: round(float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v))), 4)
            for nid, v in V.items()
            if nid != qid
        }
        expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        mine = sorted(
            [(r.neighbor_id, r.score) for r in got if r.query_id == qid],
            key=lambda kv: -kv[1],
        )
        assert mine == expect, (qid, mine, expect)


def test_lsh_results_subset_of_corpus_and_ranked(spark, embs):
    out = ANN.lsh_topk(embs, [0, 1, 2, 3], k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        scores = [r.score for r in sorted(rs, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)


def test_lsh_recall_floor_by_similarity_level(spark):
    """Stated recall floors of the s02 scale path (VERDICT r1 item 7):
    sign-random-projection LSH with 8 tables x 12 planes must find a
    planted neighbor at cos≈0.99 with recall ≥ 0.95, at cos≈0.95 ≥ 0.80,
    at cos≈0.86 ≥ 0.55 (theory: 1-(1-(1-θ/π)^12)^8; deterministic
    hyperplanes + deterministic fixture → a fixed, reproducible number)."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    rng = np.random.RandomState(3)
    base = rng.standard_normal((60, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, v.tolist(), "base") for i, v in enumerate(base)]
    levels = {1000: (0.12, 0.95), 2000: (0.33, 0.80), 3000: (0.60, 0.55)}
    for off, (eps, _) in levels.items():
        for i, v in enumerate(base):
            u = np.random.RandomState(1000 + i + off).standard_normal(64)
            u -= u.dot(v) * v
            u /= np.linalg.norm(u)
            w = v + eps * u
            w /= np.linalg.norm(w)
            rows.append((off + i, w.tolist(), f"pert{off}"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]))
    qids = list(range(60))
    found = {}
    for r in ANN.lsh_topk(df, qids, k=60).collect():
        found.setdefault(r.query_id, set()).add(r.neighbor_id)
    for off, (_, floor) in levels.items():
        recall = sum(1 for q in qids if off + q in found.get(q, set())) / 60
        assert recall >= floor, (off, recall, floor)


def test_lsh_finds_planted_strong_neighbors(spark, embs):
    """Sign-random-projection LSH finds STRONG neighbors (cos≈1) with
    near-certain probability — that's its contract; weak neighbors in
    random data (cos≈0.3) are beyond any LSH at this table budget."""
    from pyspark.sql import functions as F

    qids = list(range(8))
    copies = embs.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    planted = embs.unionByName(copies)
    lsh = {
        r.query_id: r.neighbor_id
        for r in ANN.lsh_topk(planted, qids, k=1).collect()
        if r.rank == 1
    }
    hits = sum(1 for q in qids if lsh.get(q) == q + 10_000)
    assert hits >= 7, (hits, lsh)


def test_ivf_recall_floor_vs_bruteforce(spark, embs):
    """IVF (64 cells, 8 probes) recall floor vs exact top-5 on the random
    corpus: measured 0.87 — pinned at >= 0.75 (deterministic centroids +
    deterministic data => a fixed number, margin for testdata re-gen)."""
    qids = list(range(20))
    bf, ivf = {}, {}
    for r in ANN.brute_force_topk(embs, qids, k=5).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in ANN.ivf_topk(embs, qids, k=5).collect():
        ivf.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(bf[q] & ivf.get(q, set())) for q in qids)
    assert hits / (5 * len(qids)) >= 0.75


def test_ivf_always_finds_exact_copies(spark, embs):
    """An identical vector lands in the identical nearest cell, and a
    query always probes its own cell — exact-duplicate recall is 1.0 by
    construction, not probabilistically."""
    from pyspark.sql import functions as F

    copies = embs.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    planted = embs.unionByName(copies)
    top1 = {
        r.query_id: r.neighbor_id
        for r in ANN.ivf_topk(planted, list(range(8)), k=1).collect()
        if r.rank == 1
    }
    assert all(top1.get(q) == q + 10_000 for q in range(8)), top1
