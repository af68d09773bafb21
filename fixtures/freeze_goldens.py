"""Freeze golden fixtures from a seeded reference run (SURVEY.md §5.2).

Run once (and only deliberately): regenerates
- golden_text.parquet    (url, text)  — byte-identity oracle for C2
- golden_triples.parquet (url, subj_id, pred, obj_id, subj_surface,
                          obj_surface) — the P/R ≥ 0.95 "reference triple
                          set" of BASELINE.json
at N_PAGES pages of the seeded corpus, post per-url dedup.

These parquet files are committed; tests compare live pipeline output
against them byte-for-byte. If the extractor or corpus changes
intentionally, re-freeze and note it in the commit message.
"""

from __future__ import annotations

import pandas as pd

from graphlab_spark.operators.extract import extract_text_bytes
from graphlab_spark.sources import corpus

N_PAGES = 300


def main() -> None:
    latest: dict[str, int] = {}
    recs: dict[int, dict] = {}
    for i in range(N_PAGES):
        rec = corpus.page_record(i)
        recs[i] = rec
        if latest.get(rec["url"], -1) < i:
            latest[rec["url"]] = i

    text_rows = [
        {"url": url, "text": extract_text_bytes(recs[i]["html"])}
        for url, i in sorted(latest.items())
    ]
    pd.DataFrame(text_rows).to_parquet("fixtures/golden_text.parquet", index=False)

    pd.DataFrame(corpus.golden_triples_local(N_PAGES)).to_parquet(
        "fixtures/golden_triples.parquet", index=False
    )
    print(f"froze {len(text_rows)} texts, {len(corpus.golden_triples_local(N_PAGES))} triples")


if __name__ == "__main__":
    main()
