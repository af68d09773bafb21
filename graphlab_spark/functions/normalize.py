"""Unicode text normalization for web-crawl curation (CCNet/Gopher
preprocessing step): NFC composition, control-character stripping, and
horizontal-whitespace collapsing, applied BEFORE tokenization/dedup so
byte-level variants of the same text ('café' composed vs 'cafe' +
U+0301) hash, fingerprint, and shingle identically.

Contract (deterministic, engine-mirrorable):
1. NFC-normalize (canonical composition) — the only step that needs
   Python (Spark SQL exposes no Unicode normalizer); it runs as ONE
   Arrow-batched pandas UDF, the t12/BPE pattern.
2. Strip control characters ``[\\x00-\\x08\\x0B-\\x1F\\x7F]`` — explicit
   byte ranges rather than ``\\p{Cntrl}``/``\\p{Cc}`` so Java regex
   (Spark) and RE2 (DuckDB oracle) agree exactly; tab (\\x09) and
   newline (\\x0A) survive, tabs are folded by step 3, newlines are
   document structure and kept.
3. Collapse runs of spaces/tabs to one space; trim outer spaces.

At 100 TB: a narrow per-row projection — column pruning keeps the scan
at (key, text); no shuffle at all. The NFC UDF is the only Python and
transfers one Arrow batch each way.

Reference parity: the reference normalizes crawled text before keying
(slug/casefold normalization, ``backend/app/utils/slug.py``); this is
the document-body analog required before content-addressed dedup.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# explicit ranges — NOT \p{Cntrl}: Java's class is [\x00-\x1F\x7F] while
# RE2's \p{Cc} adds U+0080-U+009F; spelling the ranges keeps both
# engines byte-identical. \x09 (tab) and \x0A (newline) excluded.
CTRL_CLASS = r"[\x00-\x08\x0B-\x1F\x7F]"
HWS_CLASS = r"[ \t]+"


def _nfc_udf():
    # built lazily: pandas_udf return-type resolution needs an active
    # SparkSession, so decorating at import time breaks driver-less
    # imports (the t12/BPE pattern)
    @F.pandas_udf("string")
    def _nfc(col: pd.Series) -> pd.Series:
        import unicodedata

        return col.map(
            lambda s: unicodedata.normalize("NFC", s) if s is not None else None
        )

    return _nfc


def normalize_text_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (id, norm_text, n_chars). NULL text stays NULL (n_chars NULL)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(_nfc_udf()(F.col(text_col)), CTRL_CLASS, ""),
            HWS_CLASS,
            " ",
        )
    )
    return docs.select(
        F.col(id_col),
        norm.alias("norm_text"),
    ).withColumn("n_chars", F.length("norm_text").cast("long"))


def normalize_sql(src: str = "documents", text_col: str = "text") -> str:
    """The DuckDB mirror: nfc_normalize + the same explicit regex steps
    (global flag — DuckDB's regexp_replace replaces only the first
    match without it, Spark's is always global)."""
    return (
        f"SELECT doc_id, TRIM(regexp_replace(regexp_replace("
        f"nfc_normalize({text_col}), '{CTRL_CLASS}', '', 'g'), "
        f"'{HWS_CLASS}', ' ', 'g')) AS norm_text, "
        f"LENGTH(TRIM(regexp_replace(regexp_replace("
        f"nfc_normalize({text_col}), '{CTRL_CLASS}', '', 'g'), "
        f"'{HWS_CLASS}', ' ', 'g'))) AS n_chars "
        f"FROM {src}"
    )
