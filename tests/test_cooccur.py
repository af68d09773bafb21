import math

import pytest

from graphlab_spark.operators.cooccur import comention_pmi


def test_comention_pmi_hand_computed(spark):
    # 4 docs: {a,b}, {a,b}, {a,c}, {c} → N=4, n_a=3 n_b=2 n_c=2,
    # n_ab=2, n_ac=1 (below min_pairs=2), n_bc=0
    rows = [
        ("u1", "a"), ("u1", "b"),
        ("u2", "a"), ("u2", "b"),
        ("u3", "a"), ("u3", "c"),
        ("u4", "c"),
    ]
    dk = spark.createDataFrame(rows, "url string, skey string")
    got = comention_pmi(dk).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.key_a, r.key_b, r.n_ij) == ("a", "b", 2)
    assert r.pmi == pytest.approx(round(math.log(2 * 4 / (3 * 2)), 4), abs=1e-9)


def test_comention_pmi_dedups_repeated_mentions(spark):
    # repeated (url, key) rows count once per doc
    rows = [("u1", "a")] * 5 + [("u1", "b"), ("u2", "a"), ("u2", "b")]
    dk = spark.createDataFrame(rows, "url string, skey string")
    got = comention_pmi(dk).collect()
    assert len(got) == 1
    assert got[0].n_ij == 2
    # n_a=2 n_b=2 N=2 → pmi = ln(2*2/(2*2)) = 0
    assert got[0].pmi == 0.0


def test_comention_pmi_min_pairs_and_ordering(spark):
    rows = [("u1", "b"), ("u1", "a"), ("u2", "a"), ("u2", "b")]
    dk = spark.createDataFrame(rows, "url string, skey string")
    got = comention_pmi(dk, min_pairs=3).collect()
    assert got == []  # threshold respected
    got2 = comention_pmi(dk, min_pairs=1).collect()
    assert [(r.key_a, r.key_b) for r in got2] == [("a", "b")]  # key_a < key_b
