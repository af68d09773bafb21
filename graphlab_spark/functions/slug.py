"""A24 — slug normalization (NFKD → ascii fold → lowercase → dash-safe).

Reference parity: ``backend/app/utils/slug.py:8-26`` — NFKD normalize,
ascii fold, lowercase, non-[a-z0-9-_] → '-', collapse runs of '-', strip.
Behavior matched from observed semantics; implementation is fresh.

Two forms: a plain-Python function (driver-side ids, corpus synthesis)
and a pandas UDF (accent folding needs ``unicodedata`` — not expressible
in JVM functions — so it rides the Arrow batch path).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NON_SLUG = re.compile(r"[^a-z0-9\-_]+")
_DASH_RUN = re.compile(r"-{2,}")


def slugify(value: str | None) -> str | None:
    if value is None:
        return None
    s = unicodedata.normalize("NFKD", value)
    s = s.encode("ascii", "ignore").decode("ascii")
    s = s.lower()
    s = _NON_SLUG.sub("-", s)
    s = _DASH_RUN.sub("-", s)
    return s.strip("-")


@F.pandas_udf(T.StringType())
def slugify_udf(values: pd.Series) -> pd.Series:
    return values.map(slugify)
