"""TransE scoring/ranking (operators/kgembed.py): exact-integer pins
vs an independent numpy brute force over the frozen quantized model;
the corpus-level value gate is the kg_transe_tail_ranks oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators.kgembed import (
    ENT_FIXTURE,
    REL_FIXTURE,
    ranking_metrics,
    transe_distance,
    transe_tail_ranks,
)


@pytest.fixture(scope="module")
def model(spark):
    return (
        spark.read.parquet(ENT_FIXTURE),
        spark.read.parquet(REL_FIXTURE),
    )


@pytest.fixture(scope="module")
def golden(spark):
    return (
        spark.read.parquet("fixtures/golden_triples.parquet")
        .select(
            F.col("subj_id").alias("src"),
            "pred",
            F.col("obj_id").alias("dst"),
        )
        .distinct()
    )


def _np_model():
    ent = pd.read_parquet(ENT_FIXTURE)
    rel = pd.read_parquet(REL_FIXTURE)
    E = {r.entity_id: np.asarray(r.emb, dtype=np.int64) for r in ent.itertuples()}
    R = {r.pred: np.asarray(r.emb, dtype=np.int64) for r in rel.itertuples()}
    return E, R


def test_transe_distance_matches_numpy_exactly(spark, model, golden):
    ent, rel = model
    E, R = _np_model()
    got = {
        (r.src, r.pred, r.dst): r.dist
        for r in transe_distance(golden.limit(200), ent, rel).collect()
    }
    assert len(got) == 200
    for (h, r, t), d in got.items():
        assert d == int(np.abs(E[h] + R[r] - E[t]).sum()), (h, r, t)


def test_tail_ranks_match_numpy_brute_force(spark, model, golden):
    ent, rel = model
    E, R = _np_model()
    ids = sorted(E)
    M = np.stack([E[i] for i in ids])
    idarr = np.array(ids)
    test = golden.filter(F.substring(F.md5(F.concat_ws("|", "src", "pred", "dst")), 1, 1) == "0")
    got = {
        (r.src, r.pred, r.dst): r.rank
        for r in transe_tail_ranks(test, ent, rel).collect()
    }
    assert len(got) >= 20
    for (h, r, t), rk in got.items():
        d = np.abs(E[h] + R[r] - M).sum(1)
        dt = int(np.abs(E[h] + R[r] - E[t]).sum())
        want = 1 + int(((d < dt) | ((d == dt) & (idarr < t))).sum())
        assert rk == want, (h, r, t)


def test_ranking_metrics_and_model_quality(spark, model, golden):
    """The frozen model must beat random tail guessing by a wide margin
    (random hits@10 ≈ 10/167 ≈ 0.06): the deterministic quality gate
    that catches a broken freezer or a scrambled fixture."""
    ent, rel = model
    ranks = transe_tail_ranks(golden, ent, rel)
    m = ranking_metrics(ranks).collect()[0]
    assert m.n == 782
    assert m.hits_10 / m.n > 0.3, m
    assert m.mrr > 0.1, m
    assert m.hits_1 <= m.hits_3 <= m.hits_10


def test_unknown_entities_are_dropped_not_scored(spark, model):
    ent, rel = model
    t = spark.createDataFrame(
        [("org:acme-analytics", "employs", "nosuch:entity")],
        "src string, pred string, dst string",
    )
    assert transe_distance(t, ent, rel).count() == 0


def test_rank_plan_broadcasts_eval_set_not_entities(spark, model, golden):
    """The |test|×|V| candidate pass must be a BroadcastNestedLoopJoin
    with the TEST side broadcast (entity table streams); the rank agg
    partial-aggregates; everything stays JVM-side."""
    ent, rel = model
    df = transe_tail_ranks(golden.limit(30), ent, rel)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_sum" in plan or "partial" in plan.lower()
    assert "EvalPython" not in plan


# ------------------------------------------------------------ training


def test_distributed_trainer_bitexact_equals_local(spark, golden):
    import numpy as np

    from graphlab_spark.operators.kgembed import (
        transe_fit_distributed,
        transe_fit_local,
    )

    tri_df = golden.limit(200)
    triples = [(r.src, r.pred, r.dst) for r in tri_df.collect()]
    l_ents, l_rels, lE, lR = transe_fit_local(triples, epochs=12)
    d_ents, d_rels, dE, dR = transe_fit_distributed(tri_df, epochs=12)
    assert l_ents == d_ents and l_rels == d_rels
    # bit-exact: every cross-row reduction is an integer sum, every
    # float op is elementwise on identical values
    assert np.array_equal(lE, dE)
    assert np.array_equal(lR, dR)


def test_trained_model_beats_random_ranking(spark, golden):
    from graphlab_spark.operators.kgembed import (
        quantize_model,
        transe_fit_local,
        transe_tail_ranks,
    )

    triples = sorted(
        {(r.src, r.pred, r.dst) for r in golden.collect()}
    )
    ents, rels, E, R = transe_fit_local(triples, epochs=400, lr=0.02)
    ent_pdf, rel_pdf = quantize_model(ents, rels, E, R)
    ent = spark.createDataFrame(ent_pdf)
    rel = spark.createDataFrame(rel_pdf)
    test = golden.filter(
        F.substring(F.md5(F.concat_ws("|", "src", "pred", "dst")), 1, 1) == "1"
    )
    ranks = transe_tail_ranks(test, ent, rel)
    n = ranks.count()
    assert n >= 20
    hits10 = ranks.filter(F.col("rank") <= 10).count()
    # random tail ranking over |V| entities would hit@10 ≈ 10/|V|
    n_ents = len(ents)
    assert hits10 / n >= 5 * (10 / n_ents)
