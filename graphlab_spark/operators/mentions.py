"""Stage C3 — mention detection (gazetteer + capitalized-span fallback).

Reference parity: analysis_type ``entity_extraction`` with JSON result +
confidence (``backend/app/models/paper_analysis.py:15-21``). The reference
declares this stage but ships no NLP code; semantics here follow
``BASELINE.json`` ``north_star`` ("SpanBERT/scispaCy-style mention
detection" → a deterministic gazetteer/rule stand-in).

Spark-first: one pandas UDF returning ``array<struct>`` + ``F.explode``.
The alias dictionary is the hot broadcast side (north_star C11): shipped
to executors once via ``SparkContext.broadcast``, looked up as an O(1)
hash map per token n-gram — no regex alternation over thousands of names.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MENTION_STRUCT = T.StructType(
    [
        T.StructField("surface", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("m_type", T.StringType(), False),
        T.StructField("conf", T.DoubleType(), False),
    ]
)

_TOKEN_RE = re.compile(r"[A-Za-z][\w.&'-]*")
_CAP_SPAN_RE = re.compile(r"\b[A-Z][a-z]+(?: [A-Z][a-zA-Z.]*)*")
_MAX_NGRAM = 3

# Sentence-initial capitalized function/common words are not name parts:
# "During Acme Systems ..." must yield "Acme Systems", not a three-token
# junk surface. Keeps the UNK vocabulary (and every vocabulary-sized
# stage downstream) bounded.
_COMMON_WORDS = frozenset(
    """the a an and or of to in on for with while during across over under
    this that these those it its his her their our your my was were is are
    be been has have had do does did not no yes but so if then than as at
    by from into onto after before between among against about
    market report shows steady growth regional sectors analysts expect
    further updates infrastructure supply chains quarterly revenue figures
    coming fiscal review period profit loss""".split()
)


def _norm_key(s: str) -> str:
    """Lookup key: lowercase; strip a trailing '.' unless it's an initial."""
    s = s.lower()
    if s.endswith(".") and len(s.split(" ")[-1]) > 2:
        s = s[:-1]
    return s


def _trim_span(text: str, start: int, end: int) -> int:
    """Trim trailing sentence dots: keep exactly one dot after an initial
    ("Borealis S.." → "Borealis S."), none after a full word
    ("Signal Loom." → "Signal Loom")."""
    e = end
    while e > start and text[e - 1] == ".":
        e -= 1
    word = text[start:e].split(" ")[-1] if e > start else ""
    if len(word) == 1 and e < end:
        e += 1  # it's an initial — keep one dot
    return e


_LEAD_W_RE = re.compile(r"\w+")


def _lead_word(s: str) -> str:
    """Leading maximal word-character run of ``s`` lowered ('' if none).
    General form — used at gate-BUILD time on alias keys, which may
    contain arbitrary punctuation."""
    m = _LEAD_W_RE.match(s.lower())
    return m.group(0) if m else ""


def _lead_word_token(s: str) -> str:
    """`_lead_word` fast path for the scan hot loop (once per token).
    Valid ONLY for ``_TOKEN_RE`` matches: their charset is
    ``[A-Za-z][\\w.&'-]*``, so the only possible non-``\\w`` characters
    are ``.&'-`` — a token containing none of them IS its own leading
    word-run (~2x gate speedup on heavy pages; equivalence vs
    ``_lead_word`` asserted in test_mentions.py)."""
    s = s.lower()
    if "." in s or "&" in s or "'" in s or "-" in s:
        m = _LEAD_W_RE.match(s)
        return m.group(0) if m else ""
    return s


def _first_token_gate(alias_map: dict[str, tuple[str, str]]) -> frozenset[str]:
    """Leading word-runs of every alias key — an O(1) prescreen.

    Superset proof: a candidate n-gram key is ``lower(text[tok_start:…])``
    and the token regex guarantees (a) the slice starts with the token's
    characters and (b) the character after the token's end is non-word —
    so the key's leading ``\\w+`` run equals the token's leading ``\\w+``
    run exactly (``_norm_key`` only lowercases and strips a trailing dot,
    which cannot touch the leading run). Gating the token's leading run
    against the alias keys' leading runs therefore never drops a possible
    match — including aliases with punctuation inside their first word
    ('j. smith', 'acme, inc'), which a naive first-WORD gate would lose.
    """
    return frozenset(_lead_word(k.split(" ")[0]) for k in alias_map)


def find_mentions(
    text: str | None,
    alias_map: dict[str, tuple[str, str]],
    gate: frozenset[str] | None = None,
) -> list[dict]:
    """Longest-match gazetteer scan over token n-grams, then capitalized
    spans in uncovered regions (type UNK — candidates for fuzzy linking).

    ``gate``: pass ``_first_token_gate(alias_map)`` computed once per
    batch (the UDFs do); recomputed per call when omitted.
    """
    if not text:
        return []
    if gate is None:
        gate = _first_token_gate(alias_map)
    out: list[dict] = []
    covered: list[tuple[int, int]] = []
    # token scan with absolute offsets
    toks = [(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]
    i = 0
    while i < len(toks):
        if _lead_word_token(toks[i][0]) not in gate:
            i += 1
            continue
        hit = None
        for n in range(min(_MAX_NGRAM, len(toks) - i), 0, -1):
            start, end = toks[i][1], toks[i + n - 1][2]
            key = _norm_key(text[start:end])
            if key in alias_map:
                _cid, typ = alias_map[key]
                e = _trim_span(text, start, end)
                hit = {
                    "surface": text[start:e],
                    "start": start,
                    "end": e,
                    "m_type": typ,
                    "conf": 0.9,
                }
                i += n
                break
        if hit:
            out.append(hit)
            covered.append((hit["start"], hit["end"]))
        else:
            i += 1
    # capitalized spans not overlapping gazetteer hits
    for m in _CAP_SPAN_RE.finditer(text):
        s, e = m.start(), m.end()
        if any(s < ce and e > cs for cs, ce in covered):
            continue
        # trim leading capitalized function/common words (sentence starts)
        words = m.group(0).split(" ")
        while words and words[0].lower() in _COMMON_WORDS:
            s += len(words[0]) + 1
            words = words[1:]
        if len(words) >= 2:  # single capitalized words are too noisy
            e2 = _trim_span(text, s, e)
            out.append(
                {"surface": text[s:e2], "start": s, "end": e2, "m_type": "UNK", "conf": 0.5}
            )
    out.sort(key=lambda d: (d["start"], d["end"]))
    return out


def mentions_stage(
    spark: SparkSession, docs: DataFrame, alias_map: dict[str, tuple[str, str]]
) -> DataFrame:
    """docs(url, text, ...) → mentions(url, surface, start, end, m_type, conf).

    ``alias_map``: norm_key(alias) -> (canonical_id, entity_type); broadcast.
    """
    bc = spark.sparkContext.broadcast(alias_map)

    @F.pandas_udf(T.ArrayType(MENTION_STRUCT))
    def detect(texts: pd.Series) -> pd.Series:
        amap = bc.value
        gate = _first_token_gate(amap)  # once per Arrow batch
        return texts.map(lambda t: find_mentions(t, amap, gate))

    return (
        docs.select("url", F.explode(detect(F.col("text"))).alias("m"))
        .select(
            "url",
            F.col("m.surface").alias("surface"),
            F.col("m.start").alias("start"),
            F.col("m.end").alias("end"),
            F.col("m.m_type").alias("m_type"),
            F.col("m.conf").alias("conf"),
        )
    )


def build_alias_map(alias_rows: Iterator[dict]) -> dict[str, tuple[str, str]]:
    """alias rows → lookup map (driver-side; dict is small/hot by design)."""
    return {_norm_key(r["alias"]): (r["canonical_id"], r["entity_type"]) for r in alias_rows}
