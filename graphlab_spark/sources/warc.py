"""WARC source: read Common-Crawl-style WARC archives into the pages
table shape (url, warc_ts, html, text=NULL, lang).

Format: WARC/1.0 (ISO 28500, public spec). A record is a header block
(``WARC/1.0`` + name:value lines), CRLF CRLF, then ``Content-Length``
body bytes, then CRLF CRLF. For ``WARC-Type: response`` records the
body is an HTTP response; the page HTML is the bytes after the HTTP
header terminator. ``.warc.gz`` members concatenate per record —
Python's ``gzip.decompress`` handles multi-member streams.

Spark shape: ``binaryFile`` source + ``mapInPandas`` — ONE task per
WARC file, which is exactly Common Crawl's layout (the corpus ships as
~1 GB segment files precisely so file-level parallelism saturates a
cluster; 10^5 segments → 10^5 independent tasks, no shuffle). Payload
bytes cross into Python once, Arrow-batched, and the parser is pure
(no wall-clock, no net) so task retries are safe. Oversized single
files are the anti-pattern — split at WRITE time, like Common Crawl.
"""

from __future__ import annotations

import datetime as _dt
import gzip
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from graphlab_spark.sources.corpus import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"


def parse_warc_bytes(data: bytes, default_lang: str = "und") -> list[dict]:
    """Parse one WARC (possibly multi-member gzip) byte string →
    page dicts for every ``WARC-Type: response`` record. Deterministic;
    tolerates trailing garbage (stops at the first malformed header)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        header = data[pos:hdr_end]
        if not header.startswith(b"WARC/"):
            break
        fields: dict[str, str] = {}
        for line in header.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                fields[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
                    "utf-8", "replace"
                )
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri")
        ts_raw = fields.get("warc-date", "")
        try:
            ts = _dt.datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).replace(
                tzinfo=None
            )
        except ValueError:
            continue
        if url is None:
            continue
        http_end = body.find(_CRLF2)
        html = body[http_end + 4 :] if http_end >= 0 else body
        out.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html,
                "text": None,
                "lang": fields.get("warc-identified-content-language", default_lang),
            }
        )
    return out


def backfill_lang(docs: DataFrame, lang_col: str = "lang", text_col: str = "text") -> DataFrame:
    """Fill unidentified languages ('und' / NULL) with the n-gram
    marker-word language-ID over the EXTRACTED text (functions.textstats
    — JVM column expression, no Python). Use after ``extract_stage`` on
    WARC-ingested pages: Common-Crawl language metadata is often absent,
    and the pipeline gates triple extraction on ``lang``. Rows whose
    source declared a language are untouched."""
    from pyspark.sql import functions as F

    from graphlab_spark.functions.textstats import lang_id_col

    declared = F.col(lang_col)
    return docs.withColumn(
        lang_col,
        F.when(
            declared.isNull() | (declared == "und"), lang_id_col(text_col)
        ).otherwise(declared),
    )


def read_warc(
    spark: SparkSession, path_glob: str, default_lang: str = "und"
) -> DataFrame:
    """WARC file(s) → pages DataFrame (PAGES_SCHEMA). One task per file
    (the Common-Crawl segment layout); column pruning keeps the binary
    ``content`` column out of any plan that doesn't reach the parser."""
    files = spark.read.format("binaryFile").load(path_glob).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for blob in b["content"]:
                rows.extend(parse_warc_bytes(bytes(blob), default_lang))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.mapInPandas(parse, PAGES_SCHEMA)
