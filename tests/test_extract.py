"""C2 extraction: determinism + byte-identity vs the frozen golden fixture."""

from __future__ import annotations

import pandas as pd

from graphlab_spark.operators.extract import extract_text_bytes
from graphlab_spark.sources import corpus


def test_extract_deterministic():
    html = corpus.page_record(7)["html"]
    assert extract_text_bytes(html) == extract_text_bytes(bytes(html))


def test_extract_strips_script_style_comments():
    html = (
        b"<html><head><script>bad()</script><style>p{}</style></head>"
        b"<body><!-- hidden --><p>Hello &amp; goodbye.</p></body></html>"
    )
    text = extract_text_bytes(html)
    assert "bad()" not in text
    assert "p{}" not in text
    assert "hidden" not in text
    assert "Hello & goodbye." in text


def test_extract_inline_tags_and_whitespace():
    html = b"<p>Acme <b>Systems</b>   acquired\t<i>Borealis</i> Labs.</p>"
    assert extract_text_bytes(html) == "Acme Systems acquired Borealis Labs."


def test_extract_empty_and_none():
    assert extract_text_bytes(None) is None
    assert extract_text_bytes(b"") == ""
    assert extract_text_bytes(b"<p></p>") == ""


def test_byte_identity_vs_golden(repo_root):
    golden = pd.read_parquet(f"{repo_root}/fixtures/golden_text.parquet")
    latest: dict[str, int] = {}
    for i in range(300):
        rec = corpus.page_record(i)
        if latest.get(rec["url"], -1) < i:
            latest[rec["url"]] = i
    live = {url: extract_text_bytes(corpus.page_record(i)["html"]) for url, i in latest.items()}
    assert len(live) == len(golden)
    for row in golden.itertuples():
        assert live[row.url].encode("utf-8") == row.text.encode("utf-8"), row.url
