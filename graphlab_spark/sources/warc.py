"""WARC source: read Common-Crawl-style WARC archives into the pages
table shape (url, warc_ts, html, text=NULL, lang).

Format: WARC/1.0 (ISO 28500, public spec). A record is a header block
(``WARC/1.0`` + name:value lines), CRLF CRLF, then ``Content-Length``
body bytes, then CRLF CRLF. For ``WARC-Type: response`` records the
body is an HTTP response; the page HTML is the bytes after the HTTP
header terminator. ``.warc.gz`` files concatenate one gzip member per
record — the spec mandates this precisely so readers can stream.

Spark shape: ONE task per WARC file, which is exactly Common Crawl's
layout (the corpus ships as ~1 GB segment files so file-level
parallelism saturates a cluster; 10^5 segments → 10^5 independent
tasks, no shuffle). Memory is bounded: the parser streams the
(multi-member) gzip through ``gzip.GzipFile`` and buffers at most ONE
record at a time, so peak per-task memory is O(largest record), not
O(decompressed file) — a ~1 GB CC segment decompresses to 3-5 GB and
must never be held whole. Rows are emitted as bounded-size Arrow
batches, never a whole-file list. For ``file:`` storage the task opens
the path directly (zero whole-file buffering, even compressed); for
other filesystems it falls back to ``binaryFile`` content, where only
the COMPRESSED blob is held (Spark's binaryFile contract) and the
decompressed stream stays record-bounded.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
from typing import BinaryIO, Iterator
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from graphlab_spark.functions.textstats import LANG_MARKERS
from graphlab_spark.sources.corpus import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"
_CHUNK = 1 << 20  # stream read granularity
_BATCH_ROWS = 1024  # max rows per emitted Arrow batch
_BATCH_BYTES = 64 << 20  # flush a batch early past this much html

# Common Crawl's WARC-Identified-Content-Language header carries
# ISO-639-3 codes, often a comma-separated list ("eng,fra"). The
# pipeline keys on two-letter codes (LANG_MARKERS); anything it cannot
# handle is treated as UNDECLARED ("und") so backfill_lang re-identifies
# it rather than silently excluding the page from triple extraction.
_ISO639_3TO2 = {
    "eng": "en",
    "deu": "de",
    "ger": "de",
    "spa": "es",
    "fra": "fr",
    "fre": "fr",
    "zho": "zh",
    "chi": "zh",
}
_KNOWN_LANGS = frozenset(LANG_MARKERS)


def normalize_lang(value: str | None, default_lang: str = "und") -> str:
    """Normalize a declared content-language header to a pipeline code.

    Missing header → ``default_lang``; first code of a comma list;
    ISO-639-3 mapped to two-letter; any code outside the pipeline's
    known set → ``'und'`` (= undeclared, so backfill_lang re-runs
    language-ID instead of the page being dropped by the lang gate).
    """
    if value is None or not value.strip():
        return default_lang
    first = value.split(",")[0].strip().lower()
    if first in _KNOWN_LANGS:
        return first
    if first in _ISO639_3TO2:
        return _ISO639_3TO2[first]
    return "und"


def _open_record_stream(stream: BinaryIO) -> BinaryIO:
    """Sniff gzip magic on a seekable binary stream; wrap in GzipFile
    (handles multi-member concatenation, decompresses incrementally)."""
    magic = stream.read(2)
    stream.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=stream)  # type: ignore[return-value]
    return stream


def iter_warc_records(
    stream: BinaryIO, default_lang: str = "und", stats: dict | None = None
) -> Iterator[dict]:
    """Parse WARC records from a (decompressed) binary stream, yielding
    page dicts for every ``WARC-Type: response`` record. Buffers at most
    one record (+ one read chunk); ``stats['max_buffered_bytes']`` records
    the high-water mark so tests can pin the bound. Deterministic;
    tolerates trailing garbage (stops at the first malformed header).
    """
    buf = bytearray()
    eof = False

    def _note() -> None:
        if stats is not None and len(buf) > stats.get("max_buffered_bytes", 0):
            stats["max_buffered_bytes"] = len(buf)

    def _fill(need: int) -> None:
        nonlocal eof
        while len(buf) < need and not eof:
            chunk = stream.read(_CHUNK)
            if not chunk:
                eof = True
            else:
                buf.extend(chunk)
                _note()

    while True:
        # skip inter-record CRLFs
        _fill(2)
        while buf[:2] == b"\r\n":
            del buf[:2]
            _fill(2)
        if not buf and eof:
            return
        # grow the buffer only until the header terminator appears
        hdr_end = buf.find(_CRLF2)
        while hdr_end < 0 and not eof:
            _fill(len(buf) + _CHUNK)
            hdr_end = buf.find(_CRLF2)
        if hdr_end < 0:
            return
        header = bytes(buf[:hdr_end])
        if not header.startswith(b"WARC/"):
            return
        fields: dict[str, str] = {}
        for line in header.split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                fields[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
                    "utf-8", "replace"
                )
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            return
        _fill(hdr_end + 4 + length)
        body = bytes(buf[hdr_end + 4 : hdr_end + 4 + length])
        del buf[: hdr_end + 4 + length]
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri")
        if url is None:
            continue
        try:
            ts = _dt.datetime.fromisoformat(
                fields.get("warc-date", "").replace("Z", "+00:00")
            ).replace(tzinfo=None)
        except ValueError:
            continue
        http_end = body.find(_CRLF2)
        html = body[http_end + 4 :] if http_end >= 0 else body
        yield {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": None,
            "lang": normalize_lang(
                fields.get("warc-identified-content-language"), default_lang
            ),
        }


def parse_warc_bytes(data: bytes, default_lang: str = "und") -> list[dict]:
    """Compatibility wrapper: parse one WARC byte string (possibly
    multi-member gzip) into a list of page dicts. Internally streams —
    the decompressed file is never held whole even here."""
    return list(iter_warc_records(_open_record_stream(io.BytesIO(data)), default_lang))


def _record_frames(
    records: Iterator[dict], batch_rows: int, batch_bytes: int
) -> Iterator[pd.DataFrame]:
    """Group a record iterator into bounded pandas batches."""
    cols = ["url", "warc_ts", "html", "text", "lang"]
    rows: list[dict] = []
    pending = 0
    for rec in records:
        rows.append(rec)
        pending += len(rec["html"])
        if len(rows) >= batch_rows or pending >= batch_bytes:
            yield pd.DataFrame(rows, columns=cols)
            rows, pending = [], 0
    yield pd.DataFrame(rows, columns=cols)


def backfill_lang(docs: DataFrame, lang_col: str = "lang", text_col: str = "text") -> DataFrame:
    """Fill unidentified languages ('und' / NULL) with the n-gram
    marker-word language-ID over the EXTRACTED text (functions.textstats
    — JVM column expression, no Python). Use after ``extract_stage`` on
    WARC-ingested pages: Common-Crawl language metadata is often absent
    or outside the pipeline's known set (normalize_lang maps those to
    'und'), and the pipeline gates triple extraction on ``lang``. Rows
    whose source declared a known language are untouched."""
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
    spark: SparkSession,
    path_glob: str,
    default_lang: str = "und",
    batch_rows: int = _BATCH_ROWS,
    batch_bytes: int = _BATCH_BYTES,
) -> DataFrame:
    """WARC file(s) → pages DataFrame (PAGES_SCHEMA). One task per file
    (the Common-Crawl segment layout), bounded task memory.

    ``file:`` storage: only paths are listed through ``binaryFile``
    (content column pruned at the scan) and each task opens its file
    directly, so neither the compressed nor the decompressed segment is
    ever buffered whole. Other filesystems: falls back to ``binaryFile``
    content (holds the compressed blob — Spark's contract) with the same
    record-streaming decompression on top.
    """
    listing = spark.read.format("binaryFile").load(path_glob)
    first = listing.select("path").first()
    if first is None:
        return spark.createDataFrame([], PAGES_SCHEMA)
    local_fs = urlparse(first["path"]).scheme in ("file", "")

    if local_fs:
        paths = listing.select("path")
        n_files = paths.count()  # driver-side file listing, bounded

        def parse_paths(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                for uri in b["path"]:
                    with open(urlparse(uri).path, "rb") as fh:
                        yield from _record_frames(
                            iter_warc_records(_open_record_stream(fh), default_lang),
                            batch_rows,
                            batch_bytes,
                        )

        return paths.repartition(max(n_files, 1)).mapInPandas(parse_paths, PAGES_SCHEMA)

    files = listing.select("content")

    def parse_blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for blob in b["content"]:
                yield from _record_frames(
                    iter_warc_records(
                        _open_record_stream(io.BytesIO(bytes(blob))), default_lang
                    ),
                    batch_rows,
                    batch_bytes,
                )

    return files.mapInPandas(parse_blobs, PAGES_SCHEMA)
