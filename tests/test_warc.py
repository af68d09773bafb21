"""WARC source reader: ISO 28500 record parsing (plain + gzip),
response-only filtering, and end-to-end flow into the extraction stage."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from graphlab_spark.sources.warc import parse_warc_bytes, read_warc


def _record(rtype: str, url: str, date: str, payload: bytes, extra: str = "") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
    hdr = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n{extra}Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return hdr + http + b"\r\n\r\n"


HTML_A = b"<html><body><p>Hello WARC world.</p></body></html>"
HTML_B = b"<html><body><p>Second page text.</p></body></html>"


def _warc_bytes() -> bytes:
    return (
        _record("request", "https://ex.org/a", "2024-03-01T00:00:00Z", b"GET /")
        + _record("response", "https://ex.org/a", "2024-03-01T00:00:01Z", HTML_A)
        + _record(
            "response", "https://ex.org/b", "2024-03-01T00:00:02Z", HTML_B,
            extra="WARC-Identified-Content-Language: en\r\n",
        )
    )


def test_parse_warc_bytes_plain_and_gzip():
    for raw in (_warc_bytes(), gzip.compress(_warc_bytes())):
        rows = parse_warc_bytes(raw)
        assert [r["url"] for r in rows] == ["https://ex.org/a", "https://ex.org/b"]
        assert rows[0]["html"] == HTML_A  # exact payload bytes, HTTP headers stripped
        assert rows[1]["html"] == HTML_B
        assert rows[0]["lang"] == "und" and rows[1]["lang"] == "en"
        assert rows[0]["warc_ts"].isoformat() == "2024-03-01T00:00:01"


def test_read_warc_feeds_extraction(spark, tmp_path):
    # multi-member gzip: one member per record, as Common Crawl writes it
    members = (
        gzip.compress(_record("response", "https://ex.org/a", "2024-03-01T00:00:01Z", HTML_A))
        + gzip.compress(_record("response", "https://ex.org/b", "2024-03-01T00:00:02Z", HTML_B))
    )
    p = tmp_path / "seg-00000.warc.gz"
    p.write_bytes(members)

    from graphlab_spark.operators.extract import extract_stage

    pages = read_warc(spark, str(p), default_lang="en")
    docs = extract_stage(pages)
    got = {r.url: r.text for r in docs.collect()}
    assert got == {
        "https://ex.org/a": "Hello WARC world.",
        "https://ex.org/b": "Second page text.",
    }


def test_backfill_lang_only_touches_und(spark, tmp_path):
    from graphlab_spark.sources.warc import backfill_lang

    docs = spark.createDataFrame(
        [
            ("u1", "the quick brown fox and the lazy dog with many the words", "und"),
            ("u2", "der schnelle braune fuchs und der hund mit einer katze", None),
            ("u3", "whatever text", "fr"),  # declared → untouched
        ],
        "url string, text string, lang string",
    )
    got = {r.url: r.lang for r in backfill_lang(docs).collect()}
    assert got["u1"] == "en"
    assert got["u2"] == "de"
    assert got["u3"] == "fr"


def test_streaming_parser_bounds_memory():
    """Peak buffered bytes must be O(largest record), not O(file): a
    multi-member gzip of many records decompresses to far more than the
    parser ever holds at once."""
    import io

    from graphlab_spark.sources.warc import _open_record_stream, iter_warc_records

    big = b"<html><body>" + b"x" * 200_000 + b"</body></html>"
    members = b"".join(
        gzip.compress(
            _record("response", f"https://ex.org/{i}", "2024-03-01T00:00:01Z", big)
        )
        for i in range(100)
    )
    decompressed_total = 100 * (len(big) + 200)
    stats = {}
    rows = list(
        iter_warc_records(_open_record_stream(io.BytesIO(members)), "und", stats=stats)
    )
    assert len(rows) == 100
    assert all(r["html"] == big for r in rows)
    # bound: one record + one 1 MiB read chunk, never the whole stream
    assert stats["max_buffered_bytes"] < decompressed_total / 2
    assert stats["max_buffered_bytes"] < len(big) + (2 << 20)


def test_streaming_parser_identical_to_whole_buffer():
    """parse_warc_bytes (now stream-backed) preserves the original
    whole-buffer parser's output exactly: response-only filter, payload
    byte identity, trailing-garbage tolerance."""
    raw = _warc_bytes() + b"NOT A WARC HEADER trailing garbage"
    rows = parse_warc_bytes(raw)
    assert [r["url"] for r in rows] == ["https://ex.org/a", "https://ex.org/b"]
    assert rows[0]["html"] == HTML_A and rows[1]["html"] == HTML_B
    assert rows[0]["lang"] == "und" and rows[1]["lang"] == "en"


def test_lang_normalization_iso639():
    """Common Crawl declares ISO-639-3, often comma-separated; codes the
    pipeline can't handle become 'und' so backfill_lang re-identifies
    them instead of the lang gate silently dropping the page."""
    from graphlab_spark.sources.warc import normalize_lang

    assert normalize_lang("eng") == "en"
    assert normalize_lang("eng,fra") == "en"
    assert normalize_lang("fra") == "fr"
    assert normalize_lang("deu") == "de"
    assert normalize_lang("zho") == "zh"
    assert normalize_lang("jpn") == "und"  # unknown → undeclared, not dropped
    assert normalize_lang("en") == "en"
    assert normalize_lang(None, "en") == "en"  # missing header → default
    assert normalize_lang("  ", "en") == "en"

    raw = _record(
        "response", "https://ex.org/c", "2024-03-01T00:00:03Z", HTML_A,
        extra="WARC-Identified-Content-Language: eng,fra\r\n",
    )
    assert parse_warc_bytes(raw)[0]["lang"] == "en"


def test_read_warc_path_streaming_mode(spark, tmp_path):
    """file: storage takes the path-streaming branch (content never
    loaded through binaryFile) and yields the same pages table."""
    members = (
        gzip.compress(_record("response", "https://ex.org/a", "2024-03-01T00:00:01Z", HTML_A))
        + gzip.compress(_record("request", "https://ex.org/a", "2024-03-01T00:00:01Z", b"GET /"))
        + gzip.compress(_record("response", "https://ex.org/b", "2024-03-01T00:00:02Z", HTML_B))
    )
    for i in range(3):
        (tmp_path / f"seg-0000{i}.warc.gz").write_bytes(members)
    pages = read_warc(spark, str(tmp_path / "*.warc.gz"))
    rows = pages.collect()
    assert len(rows) == 6
    assert {(r.url, bytes(r.html)) for r in rows} == {
        ("https://ex.org/a", HTML_A),
        ("https://ex.org/b", HTML_B),
    }
