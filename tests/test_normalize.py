"""normalize_text_frame (functions/normalize.py): NFC composition,
control stripping, whitespace collapse — hand cases, null passthrough,
idempotence, and byte-variant convergence for downstream dedup."""

from __future__ import annotations

from graphlab_spark.functions.normalize import normalize_text_frame


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in normalize_text_frame(df).collect()}


def test_nfc_composes_and_strips(spark):
    got = _run(
        spark,
        [
            (1, "café au lait"),   # decomposed → composed
            (2, "café au lait"),    # already composed
            (3, "a \x07b\x00c \x1fd"),   # control bytes stripped
            (4, "x  \t y\tz"),           # runs of space/tab collapse
            (5, "  padded  "),           # outer trim
        ],
    )
    assert got[1].norm_text == "café au lait"
    # byte-variants converge: decomposed ≡ composed after normalization
    assert got[1].norm_text == got[2].norm_text
    assert got[3].norm_text == "a bc d"
    assert got[4].norm_text == "x y z"
    assert got[5].norm_text == "padded"
    assert got[5].n_chars == 6


def test_newlines_survive_tabs_fold(spark):
    # newlines are document structure: kept everywhere, including the
    # edges (trim strips SPACES only, same as the DuckDB oracle's TRIM)
    got = _run(spark, [(1, "line one\nline\ttwo\n")])
    assert got[1].norm_text == "line one\nline two\n"


def test_null_and_empty(spark):
    got = _run(spark, [(1, None), (2, "")])
    assert got[1].norm_text is None and got[1].n_chars is None
    assert got[2].norm_text == "" and got[2].n_chars == 0


def test_idempotent(spark):
    rows = [(1, "café  x\t\x07 y "), (2, "plain ascii text")]
    once = _run(spark, rows)
    again = _run(spark, [(k, v.norm_text) for k, v in once.items()])
    for d in once:
        assert again[d].norm_text == once[d].norm_text
