"""duplicate_spans (operators/dedup.py): Lee-et-al.-style duplicated
k-gram span extraction — hand-computed spans, island merging, within-doc
repeats, and short-doc edge cases."""

from __future__ import annotations

from graphlab_spark.operators.dedup import duplicate_spans


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_hand_computed_spans(spark):
    shared = _words("s", 10)  # 10 shared tokens → 8-gram dup windows
    docs = spark.createDataFrame(
        [
            (1, shared + " " + _words("a", 20)),
            (2, _words("b", 5) + " " + shared + " " + _words("c", 7)),
            (3, _words("u", 30)),  # fully unique → no spans
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_spans(docs, k=8).collect()
    }
    # doc 1: shared tokens occupy positions 0-9; dup 8-gram starts 0..2
    # merge to one span [0, 10)
    # doc 2: shared occupies positions 5-14 → span [5, 15)
    assert got == {(1, 0, 10, 10), (2, 5, 15, 10)}


def test_within_doc_repeat_counts_as_duplicate(spark):
    body = _words("w", 8)
    docs = spark.createDataFrame(
        [(1, body + " " + _words("x", 4) + " " + body)],
        "doc_id long, text string",
    )
    got = {
        (r.span_start, r.span_end) for r in duplicate_spans(docs, k=8).collect()
    }
    # the 8-token body appears twice within one doc: positions 0-7 and 12-19
    assert got == {(0, 8), (12, 20)}


def test_disjoint_islands_stay_separate(spark):
    s1, s2 = _words("p", 8), _words("q", 8)
    docs = spark.createDataFrame(
        [
            (1, s1 + " " + _words("g", 6) + " " + s2),
            (2, s1 + " " + _words("h", 9) + " " + s2),
        ],
        "doc_id long, text string",
    )
    spans = duplicate_spans(docs, k=8)
    d1 = sorted(
        (r.span_start, r.span_end)
        for r in spans.filter("doc_id = 1").collect()
    )
    assert d1 == [(0, 8), (14, 22)]  # two maximal spans, gap preserved


def test_short_docs_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, _words("z", 7)), (2, _words("z", 7)), (3, "")],
        "doc_id long, text string",
    )
    # 7 tokens < k=8 → no k-grams at all, even though docs 1 and 2 match
    assert duplicate_spans(docs, k=8).count() == 0


def test_cut_spans_hand_computed(spark):
    from graphlab_spark.operators.dedup import cut_duplicate_spans

    shared = _words("s", 10)
    docs = spark.createDataFrame(
        [
            (1, shared + " " + _words("a", 20)),
            (2, _words("b", 5) + " " + shared + " " + _words("c", 7)),
            (3, _words("u", 30)),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r for r in cut_duplicate_spans(docs, k=8).collect()
    }
    # doc 1: span [0,10) removed → the 20 a-words remain
    assert got[1].clean_text == _words("a", 20)
    assert (got[1].n_tokens_kept, got[1].n_tokens_removed) == (20, 10)
    # doc 2: span [5,15) removed → b-words + c-words remain
    assert got[2].clean_text == _words("b", 5) + " " + _words("c", 7)
    assert (got[2].n_tokens_kept, got[2].n_tokens_removed) == (12, 10)
    # doc 3 untouched
    assert got[3].clean_text == _words("u", 30)
    assert got[3].n_tokens_removed == 0


def test_cut_spans_fully_covered_doc_empties(spark):
    from graphlab_spark.operators.dedup import cut_duplicate_spans

    body = _words("z", 12)
    docs = spark.createDataFrame(
        [(1, body), (2, body)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in cut_duplicate_spans(docs, k=8).collect()}
    for d in (1, 2):
        assert got[d].clean_text == ""
        assert (got[d].n_tokens_kept, got[d].n_tokens_removed) == (0, 12)


def test_hashed_grams_equal_text_grams(spark):
    from graphlab_spark.operators.dedup import duplicate_spans, with_planted_near_dups

    docs = with_planted_near_dups(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    a = sorted(map(tuple, duplicate_spans(docs, k=8).collect()))
    b = sorted(map(tuple, duplicate_spans(docs, k=8, hash_grams=True).collect()))
    assert a == b
