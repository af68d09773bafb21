"""Freeze golden fixtures from a seeded reference run (SURVEY.md §5.2).

Run once (and only deliberately): regenerates
- golden_text.parquet    (url, text)  — byte-identity oracle for C2
- golden_triples.parquet (url, subj_id, pred, obj_id, subj_surface,
                          obj_surface) — the P/R ≥ 0.95 "reference triple
                          set" of BASELINE.json
- golden_relevance.parquet (url, relevance) — C14 keyword-weight doc
                          ranking oracle (sum of matched alias weights)
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

    # C14: per-doc relevance (Spark-free replica of the kg_c14 query —
    # gazetteer mentions of deduped docs joined to alias weights)
    from graphlab_spark.operators.mentions import _norm_key, build_alias_map, find_mentions

    alias_rows = corpus.alias_rows()
    alias_map = build_alias_map(iter(alias_rows))
    weights: dict[str, float] = {}
    for r in alias_rows:
        k = _norm_key(r["alias"])
        weights[k] = max(weights.get(k, 0.0), r["weight"])
    rel_rows = []
    for url, i in sorted(latest.items()):
        text = extract_text_bytes(recs[i]["html"])
        total = sum(
            weights[_norm_key(m["surface"])]
            for m in find_mentions(text, alias_map)
            if m["m_type"] != "UNK" and _norm_key(m["surface"]) in weights
        )
        if total > 0:
            rel_rows.append({"url": url, "relevance": round(total, 4)})
    pd.DataFrame(rel_rows).to_parquet("fixtures/golden_relevance.parquet", index=False)

    # co-mention PMI (operators/cooccur.py contract): distinct per-doc
    # normalized mention keys; N = docs with >=1 mention; pairs kept at
    # n_ij >= 2; pmi = round(ln(n_ij*N/(n_i*n_j)), 4)
    import itertools
    import math
    from collections import Counter

    doc_keys: dict[str, set] = {}
    for url, i in sorted(latest.items()):
        text = extract_text_bytes(recs[i]["html"])
        ks = {_norm_key(m["surface"]) for m in find_mentions(text, alias_map)}
        if ks:
            doc_keys[url] = ks
    n_docs = len(doc_keys)
    n_i: Counter = Counter()
    n_ij: Counter = Counter()
    for ks in doc_keys.values():
        for k in ks:
            n_i[k] += 1
        for ka, kb in itertools.combinations(sorted(ks), 2):
            n_ij[(ka, kb)] += 1
    pmi_rows = [
        {
            "key_a": ka,
            "key_b": kb,
            "n_ij": c,
            "pmi": round(math.log((c * n_docs) / (n_i[ka] * n_i[kb])), 4),
        }
        for (ka, kb), c in sorted(n_ij.items())
        if c >= 2
    ]
    pd.DataFrame(pmi_rows).to_parquet("fixtures/golden_comention.parquet", index=False)

    # edge provenance: per canonical edge, distinct supporting docs and
    # first/last crawl timestamp (the kept-record warc_ts per url)
    ts_of = {url: recs[i]["warc_ts"] for url, i in latest.items()}
    prov: dict[tuple, dict] = {}
    for t in corpus.golden_triples_local(N_PAGES):
        k = (t["subj_id"], t["pred"], t["obj_id"])
        e = prov.setdefault(k, {"urls": set(), "ts": []})
        e["urls"].add(t["url"])
        e["ts"].append(ts_of[t["url"]])
    prov_rows = [
        {
            "src": k[0],
            "pred": k[1],
            "dst": k[2],
            "n_docs": len(v["urls"]),
            "first_seen": min(v["ts"]).strftime("%Y-%m-%d %H:%M:%S"),
            "last_seen": max(v["ts"]).strftime("%Y-%m-%d %H:%M:%S"),
        }
        for k, v in sorted(prov.items())
    ]
    pd.DataFrame(prov_rows).to_parquet(
        "fixtures/golden_edge_prov.parquet", index=False
    )

    # node provenance: per canonical TRIPLE-PARTICIPATING entity,
    # distinct supporting docs and first/last crawl timestamp (same
    # ts_of contract as edge provenance)
    nprov: dict[str, dict] = {}
    for t in corpus.golden_triples_local(N_PAGES):
        for ent in (t["subj_id"], t["obj_id"]):
            e = nprov.setdefault(ent, {"urls": set(), "ts": []})
            e["urls"].add(t["url"])
            e["ts"].append(ts_of[t["url"]])
    nprov_rows = [
        {
            "entity_id": ent,
            "n_docs": len(v["urls"]),
            "first_seen": min(v["ts"]).strftime("%Y-%m-%d %H:%M:%S"),
            "last_seen": max(v["ts"]).strftime("%Y-%m-%d %H:%M:%S"),
        }
        for ent, v in sorted(nprov.items())
    ]
    pd.DataFrame(nprov_rows).to_parquet(
        "fixtures/golden_node_prov.parquet", index=False
    )

    print(
        f"froze {len(text_rows)} texts, "
        f"{len(corpus.golden_triples_local(N_PAGES))} triples, "
        f"{len(rel_rows)} relevance rows"
    )


if __name__ == "__main__":
    main()
