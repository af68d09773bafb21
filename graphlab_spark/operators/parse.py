"""Fused per-document parse stage: C2 + C3 + C4 in ONE Arrow pass.

extract (html→text), mention detection, and triple extraction are all
pure per-document functions — running them as three separate pandas-UDF
stages costs three Python round-trips over the (large) text payload plus
two extra stage materializations. This operator fuses them into one
``mapInPandas``: html goes to the Python worker once, text is produced
and immediately consumed in-process, and the output row carries the text
plus BOTH result arrays (exploded JVM-side by the consumers).

Semantics are identical to the unfused stages by construction — the same
pure functions (``extract_text_bytes``, ``find_mentions``,
``extract_triples_text``) are called on the same inputs; the byte-identity
and P/R gates cover both paths.

At 100 TB this is the dominant cost centre; fusing triples per-doc work
into one pass raises docs/sec throughput AND scaling efficiency (fewer
fixed-cost stage boundaries per run).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphlab_spark.operators.extract import dedup_pages, extract_text_bytes
from graphlab_spark.operators.mentions import (
    MENTION_STRUCT,
    _first_token_gate,
    find_mentions,
)
from graphlab_spark.operators.triples import TRIPLE_STRUCT, extract_triples_text

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("mentions", T.ArrayType(MENTION_STRUCT), False),
        T.StructField("triples", T.ArrayType(TRIPLE_STRUCT), False),
    ]
)


def parse_stage(
    spark: SparkSession,
    pages: DataFrame,
    alias_map: dict[str, tuple[str, str]] | None = None,
    lang_filter: str | None = "en",
    alias_bc=None,
) -> DataFrame:
    """pages → (url, warc_ts, lang, text, mentions[], triples[]).

    Per-url dedup (C13) runs first; the alias dictionary is broadcast
    once (north_star C11) — long-running callers (streaming ingest) pass
    a pre-created ``alias_bc`` so repeated invocations don't accumulate
    broadcasts. Triples are only extracted for ``lang_filter`` pages
    (same pre-UDF filter semantics as ``triples_stage``).
    """
    bc = alias_bc if alias_bc is not None else spark.sparkContext.broadcast(alias_map)
    # mapInPandas ships EVERY input column to the Python worker (Spark
    # cannot see which ones the function touches — guide rule); project
    # to exactly the four consumed columns so a stale ``text`` column or
    # any extra metadata never crosses the Arrow boundary (r6).
    deduped = dedup_pages(pages).select("url", "warc_ts", "lang", "html")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        amap = bc.value
        gate = _first_token_gate(amap)
        for b in batches:
            texts = [extract_text_bytes(h) for h in b["html"]]
            langs = list(b["lang"])
            yield pd.DataFrame(
                {
                    "url": b["url"],
                    "warc_ts": b["warc_ts"],
                    "lang": b["lang"],
                    "text": texts,
                    "mentions": [find_mentions(t, amap, gate) for t in texts],
                    "triples": [
                        extract_triples_text(t)
                        if (lang_filter is None or lg == lang_filter)
                        else []
                        for t, lg in zip(texts, langs)
                    ],
                }
            )

    return deduped.mapInPandas(parse, PARSED_SCHEMA)


def mentions_view(parsed: DataFrame) -> DataFrame:
    """Explode the fused mentions array — JVM-side only, no Python."""
    return parsed.select("url", F.explode("mentions").alias("m")).select(
        "url",
        F.col("m.surface").alias("surface"),
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
        F.col("m.m_type").alias("m_type"),
        F.col("m.conf").alias("conf"),
    )


def triples_view(parsed: DataFrame) -> DataFrame:
    """Explode the fused triples array — JVM-side only, no Python."""
    return parsed.select("url", F.explode("triples").alias("t")).select(
        "url",
        F.col("t.subj").alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
        F.col("t.conf").alias("conf"),
        F.col("t.sent_no").alias("sent_no"),
    )
