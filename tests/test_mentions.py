"""C3 mention detection: gazetteer n-gram matching, span trimming, fallback."""

from __future__ import annotations

from graphlab_spark.operators.mentions import _norm_key, build_alias_map, find_mentions
from graphlab_spark.sources import corpus


def _amap():
    return build_alias_map(corpus.alias_rows())


def test_gazetteer_hit_with_type():
    ms = find_mentions("Yesterday Acme Systems acquired a rival.", _amap())
    assert any(m["surface"] == "Acme Systems" and m["m_type"] == "ORG" for m in ms)


def test_trailing_dot_trimming():
    ms = find_mentions("Krypton Robotics develops Signal Loom.", _amap())
    surfaces = {m["surface"] for m in ms}
    assert "Signal Loom" in surfaces  # sentence dot trimmed
    ms2 = find_mentions("It was sold to Borealis S..", _amap())
    assert any(m["surface"] == "Borealis S." for m in ms2)  # initial keeps one dot


def test_abbreviation_alias_matches():
    ms = find_mentions("Alice A. works at Acme S. these days.", _amap())
    types = {m["surface"]: m["m_type"] for m in ms}
    assert types.get("Acme S.") == "ORG"
    assert types.get("Alice A.") == "PERSON"


def test_unknown_capitalized_span_flagged_unk():
    ms = find_mentions("Zorblat Dynamics announced a merger.", _amap())
    assert any(m["m_type"] == "UNK" and m["surface"] == "Zorblat Dynamics" for m in ms)


def test_norm_key():
    assert _norm_key("Acme Systems.") == "acme systems"
    assert _norm_key("Acme S.") == "acme s."
    assert _norm_key("OSLO") == "oslo"


def test_offsets_point_at_surface():
    text = "He said Acme Systems grew."
    for m in find_mentions(text, _amap()):
        assert text[m["start"] : m["end"]] == m["surface"]


def test_lead_word_token_fast_path_equivalent():
    """The hot-loop fast path must agree with the general regex form on
    every possible _TOKEN_RE token (charset [A-Za-z][\\w.&'-]*)."""
    import re

    from graphlab_spark.operators.mentions import (
        _TOKEN_RE,
        _lead_word,
        _lead_word_token,
    )

    samples = [
        "Acme", "U.S.", "O'Neill", "Jean-Luc", "AT&T", "Inc.", "x", "A.",
        "rock-'n'-roll", "A&B.C-d'e", "Word2Vec", "e.g", "Mr.", "CO-OP",
    ]
    for s in samples:
        m = _TOKEN_RE.match(s)
        assert m is not None and m.group(0) == s, s  # sample is a valid token
        assert _lead_word_token(s) == _lead_word(s), s
    # and across a realistic text
    text = "Dr. O'Brien of AT&T met Jean-Luc at the U.S. CO-OP's H.Q. today."
    for m in _TOKEN_RE.finditer(text):
        assert _lead_word_token(m.group(0)) == _lead_word(m.group(0)), m.group(0)
