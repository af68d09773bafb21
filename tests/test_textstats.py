"""Text-analysis functions: token count, quality score, lang-ID, fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark.functions import textstats as TS

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("single",)], "text string")
    out = [r.n for r in df.select(TS.token_count_col().alias("n")).collect()]
    assert out == [3, 1]


def test_quality_score_bounds_and_type(spark):
    rows = _docs(spark).select(TS.quality_score_col().alias("q")).collect()
    assert all(0 <= r.q <= 1000 for r in rows)
    assert isinstance(rows[0].q, int)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in the house",),
            ("der bericht zeigt und das ist von allen",),
            ("xyzzy qwerty plugh",),
        ],
        "text string",
    )
    out = [r.lang for r in df.select(TS.lang_id_col().alias("lang")).collect()]
    assert out == ["en", "de", "und"]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], "text string")
    fps = [r.fp for r in df.select(TS.fingerprint_col().alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert len(fps[0]) == 32


def test_winnowing_guarantee(spark):
    """The winnowing property: two documents sharing a substring of
    length >= w + k - 1 select at least one common fingerprint; disjoint
    documents (over distinct alphabets) share none."""
    from graphlab_spark.functions import textstats as TS

    shared = "the stolen passage appears verbatim in both documents here"
    assert len(shared) >= TS.WINNOW_W + TS.WINNOW_K - 1
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + shared + " delta epsilon zeta"),
            (2, "one two three four five " + shared + " six seven eight"),
            (3, "qqq www eee rrr ttt yyy uuu iii ooo ppp zzz xxx ccc vvv"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r.doc_id: set(r.wfp.split(",")) if r.wfp else set()
        for r in TS.winnow_fp_frame(docs).collect()
    }
    assert fps[1] & fps[2], "shared substring must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnowing_short_and_null_docs(spark):
    from graphlab_spark.functions import textstats as TS

    docs = spark.createDataFrame(
        [(1, "tiny"), (2, None), (3, "x" * 10)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.wfp, r.n_fp) for r in TS.winnow_fp_frame(docs).collect()}
    assert got[1] == ("", 0) and got[2] == ("", 0) and got[3] == ("", 0)


def test_repetition_stats_known_values(spark):
    from graphlab_spark.functions.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            # "a b" ×3 in 6 tokens → top2 = 3·2/6 = 1.0; top3: "a b a" ×2
            # → 2·3/6 = 1.0; top4: "a b a b" ×2 → 2·4/6 = 1.3333 (overlap
            # not deduped, per the published top-n rule); no dup 5-grams
            # (the two 5-grams differ)
            (1, "a b a b a b"),
            # all tokens distinct → top-n count 1 → n/5; no dups
            (2, "v w x y z"),
            # "x y z w v" ×3 → every 5-gram duplicated → all 15 positions
            # covered → dup5 = 15/15 = 1.0
            (3, "x y z w v x y z w v x y z w v"),
            # dup 5-grams {0,6} "p q r s t" and {1,7} "q r s t u" cover
            # positions 0..11 of 15 → dup5 = 12/15 = 0.8
            (4, "p q r s t u p q r s t u a b c"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = got[1]
    assert (r1.n_tokens, r1.n_chars) == (6, 6)
    assert (r1.top_2gram_frac, r1.top_3gram_frac, r1.top_4gram_frac) == (1.0, 1.0, 1.3333)
    assert r1.dup_5gram_char_frac == 0.0
    r2 = got[2]
    assert (r2.top_2gram_frac, r2.top_3gram_frac, r2.top_4gram_frac) == (0.4, 0.6, 0.8)
    assert all(
        getattr(r2, f"dup_{n}gram_char_frac") == 0.0 for n in (5, 6, 7, 8, 9, 10)
    )
    assert got[3].dup_5gram_char_frac == 1.0
    r4 = got[4]
    assert r4.dup_5gram_char_frac == 0.8
    # "p q r s t u" ×2 covers positions 0..11 once → dup6 = 12/15
    assert r4.dup_6gram_char_frac == 0.8
    assert r4.dup_7gram_char_frac == 0.0  # no duplicated 7-grams


def test_redact_pii_counts_and_determinism(spark):
    from graphlab_spark.functions.textstats import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b%x@foo-bar.example.com or 10.0.3.7 and x@y.io"),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_emails, r.n_ips, r.redacted_md5) for r in redact_pii(docs).collect()}
    assert got[1][0] == 2 and got[1][1] == 1
    assert got[2][0] == 0 and got[2][1] == 0
    # determinism: same input → same fingerprint
    again = {r.doc_id: r.redacted_md5 for r in redact_pii(docs).collect()}
    assert {k: v[2] for k, v in got.items()} == again


def test_doc_dup_line_stats_known_values(spark):
    from graphlab_spark.functions.textstats import doc_dup_line_stats

    docs = spark.createDataFrame(
        [
            # lines: 3, distinct 2 → 1/3; chars 29, distinct 19 → 10/29
            (1, "aaaa bbbb\nxxxxxxxxxx\nxxxxxxxxxx"),
            # duplicated whole paragraph; the blank-split lines are
            # ["p1 body", "", "p1 body"] → 1/3 by instance, 7/14 by char
            (2, "p1 body\n\np1 body"),
            (3, "all unique\nlines here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in doc_dup_line_stats(docs).collect()}
    r1 = got[1]
    assert (r1.dup_line_frac, r1.dup_line_char_frac) == (0.3333, 0.3448)
    assert (r1.dup_para_frac, r1.dup_para_char_frac) == (0.0, 0.0)
    r2 = got[2]
    assert (r2.dup_line_frac, r2.dup_line_char_frac) == (0.3333, 0.5)
    assert (r2.dup_para_frac, r2.dup_para_char_frac) == (0.5, 0.5)
    r3 = got[3]
    assert (r3.dup_line_frac, r3.dup_para_frac) == (0.0, 0.0)


def test_gopher_quality_stats_rules(spark):
    from graphlab_spark.functions.textstats import gopher_quality_stats

    good = (
        "the quick brown fox jumps over a lazy dog and then it ran to "
        "be with all of that pack that have come along with many other "
        "animals that move through the quiet forest every single day "
        "while keeping to the well worn path of least resistance ahead "
        "under clear open skies"
    )  # 52 words (>=50), mean len in range, stop words, all alphabetic
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "too short to pass"),
            (3, good + " ### ### ### ### ### ### ### ### ### ###"),  # symbol ratio
            (4, "- a\n- b\n- c\n- d"),  # all lines bullet-led
            (5, good.replace("the", "zzz").replace("to", "qq")
                 .replace("and", "xx").replace("of", "yy")
                 .replace("that", "ww").replace("with", "vv")
                 .replace("have", "uu").replace("be", "tt")),  # no stop words
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_quality_stats(docs).collect()}
    assert got[1].passes_gopher_quality
    assert got[1].stop_word_hits >= 2 and got[1].alpha_word_frac == 1.0
    assert not got[2].passes_gopher_quality  # n_words < 50
    assert not got[3].passes_gopher_quality and got[3].symbol_word_ratio > 0.1
    assert got[4].bullet_line_frac == 1.0 and not got[4].passes_gopher_quality
    assert got[5].stop_word_hits < 2 and not got[5].passes_gopher_quality
