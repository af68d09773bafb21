"""Bigram-LM perplexity (functions/lm.py): hand-computed scores on a
tiny trained-in-test LM; the corpus-level value gate is the t18 oracle."""

from __future__ import annotations

import math

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def lm_paths(tmp_path_factory):
    from graphlab_spark.functions.lm import train_bigram_counts

    td = tmp_path_factory.mktemp("lm")
    uni, bi = train_bigram_counts(["a b a c", "a b b"])
    up, bp = str(td / "uni.parquet"), str(td / "bi.parquet")
    pd.DataFrame({"w": list(uni), "c": list(uni.values())}).to_parquet(up)
    pd.DataFrame(
        {"w1": [x for x, _ in bi], "w2": [y for _, y in bi], "c": list(bi.values())}
    ).to_parquet(bp)
    # uni: a=3, b=3, c=1  -> V = 3 + 1 = 4
    # bi:  (a,b)=2 (b,a)=1 (a,c)=1 (b,b)=1
    return up, bp


def _lp(cb: int, cu: int, v: int = 4, a: float = 0.5) -> float:
    return math.log((cb + a) / (cu + a * v))


def test_hand_computed_perplexity(spark, lm_paths):
    from graphlab_spark.functions.lm import perplexity_frame

    docs = spark.createDataFrame(
        [
            (1, "A  b a"),       # case/whitespace-normalized: bigrams (a,b) (b,a)
            (2, "a z"),          # z is OOV: cb=0, cu(a)=3
            (3, "solo"),         # single token: dropped (no bigram evidence)
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in perplexity_frame(docs, *lm_paths).collect()}
    assert set(got) == {1, 2}

    avg1 = (_lp(2, 3) + _lp(1, 3)) / 2
    assert got[1].n_bigrams == 2
    assert got[1].avg_logprob == pytest.approx(round(avg1, 6), abs=1e-9)
    assert got[1].ppl == pytest.approx(round(math.exp(-avg1), 6), abs=1e-9)

    avg2 = _lp(0, 3)  # unseen continuation smoothed: (0+.5)/(3+2)
    assert got[2].ppl == pytest.approx(round(math.exp(-avg2), 6), abs=1e-9)


def test_ppl_filter_keeps_natural_text(spark, lm_paths):
    from graphlab_spark.functions.lm import perplexity_frame, ppl_filter

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "z z z z")], "doc_id long, text string"
    )
    scores = {r.doc_id: r.ppl for r in perplexity_frame(docs, *lm_paths).collect()}
    assert scores[1] < scores[2]  # in-domain text scores lower ppl
    cut = (scores[1] + scores[2]) / 2
    kept = ppl_filter(docs, cut, *lm_paths)
    assert [r.doc_id for r in kept.collect()] == [1]
    assert kept.columns == docs.columns


def test_committed_fixture_matches_offline_trainer(spark):
    """The committed fixture must equal retraining on the sf0.01 corpus
    (guards against the corpus and fixture drifting apart silently)."""
    from graphlab_spark.functions.lm import train_bigram_counts

    texts = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")["text"]
    uni, bi = train_bigram_counts(texts.tolist())
    fu = pd.read_parquet("fixtures/lm_unigrams.parquet")
    fb = pd.read_parquet("fixtures/lm_bigrams.parquet")
    assert dict(zip(fu.w, fu.c)) == dict(uni)
    assert {(r.w1, r.w2): r.c for r in fb.itertuples()} == dict(bi)
