"""C4 triple extraction: P/R ≥ 0.95 vs the frozen reference triple set
(surface level, pure Python — the distributed path is covered by the
pipeline e2e test)."""

from __future__ import annotations

import pandas as pd

from graphlab_spark.operators.extract import extract_text_bytes
from graphlab_spark.operators.triples import extract_triples_text
from graphlab_spark.sources import corpus


def test_triple_pr_vs_golden(repo_root):
    golden = pd.read_parquet(f"{repo_root}/fixtures/golden_triples.parquet")
    gold = {
        (r.url, r.subj_surface, r.pred, r.obj_surface) for r in golden.itertuples()
    }
    latest: dict[str, int] = {}
    for i in range(300):
        rec = corpus.page_record(i)
        if latest.get(rec["url"], -1) < i:
            latest[rec["url"]] = i
    emitted = set()
    for url, i in latest.items():
        text = extract_text_bytes(corpus.page_record(i)["html"])
        for t in extract_triples_text(text):
            emitted.add((url, t["subj"], t["pred"], t["obj"]))
    tp = len(gold & emitted)
    precision = tp / len(emitted)
    recall = tp / len(gold)
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"


def test_extractor_patterns():
    text = "Acme Systems was founded by Alice Almeida.\nNothing here.\n" \
           "Borealis Labs is headquartered in Oslo."
    ts = extract_triples_text(text)
    assert {(t["subj"], t["pred"], t["obj"]) for t in ts} == {
        ("Acme Systems", "founded_by", "Alice Almeida"),
        ("Borealis Labs", "headquartered_in", "Oslo"),
    }
    ts2 = extract_triples_text("Borealis Labs is headquartered in Oslo.")
    assert ts2[0]["pred"] == "headquartered_in"
    assert ts2[0]["obj"] == "Oslo"


def test_extractor_rejects_self_loops_and_empty():
    assert extract_triples_text("X acquired X.") == []
    assert extract_triples_text(None) == []
    assert extract_triples_text("") == []
