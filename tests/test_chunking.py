"""chunk_documents (operators/chunking.py): window/stride coverage,
short docs, overlap content, and the every-token-covered guarantee."""

from __future__ import annotations

import pytest

from graphlab_spark.operators.chunking import chunk_documents


def _words(n):
    return " ".join(f"w{i}" for i in range(n))


def test_hand_computed_windows(spark):
    docs = spark.createDataFrame(
        [(1, _words(10))], "doc_id long, text string"
    )
    got = sorted(
        (r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(docs, size=6, stride=4).collect()
    )
    # starts 0, 4, 8 → [0:6), [4:10), [8:10)
    assert got == [
        (0, " ".join(f"w{i}" for i in range(6)), 6),
        (1, " ".join(f"w{i}" for i in range(4, 10)), 6),
        (2, "w8 w9", 2),
    ]


def test_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    got = chunk_documents(docs, size=64, stride=48).collect()
    assert len(got) == 1
    assert (got[0].chunk_id, got[0].chunk_text, got[0].n_tokens) == (0, "a b c", 3)


def test_every_token_covered_and_overlap(spark):
    n = 103
    docs = spark.createDataFrame([(1, _words(n))], "doc_id long, text string")
    rows = chunk_documents(docs, size=16, stride=11).collect()
    covered = set()
    for r in rows:
        start = r.chunk_id * 11
        covered |= set(range(start, start + r.n_tokens))
        # overlap region repeats verbatim
        assert r.chunk_text.split(" ") == [f"w{i}" for i in range(start, start + r.n_tokens)]
    assert covered == set(range(n))


def test_bad_params_raise(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, size=8, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, size=8, stride=9)
