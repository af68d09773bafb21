"""Freeze the BPE tokenizer fixtures (run once, deliberately):

- bpe_merges.parquet       (rank, left, right) — merges trained on the
                           sf0.01 synthetic documents corpus.
- golden_bpe_counts.parquet (text_md5, n_tokens_bpe) — expected subword
                           counts keyed by md5(text) so the oracle JOIN
                           works at any SF (doc texts differ per SF;
                           counts are frozen for every distinct text
                           with doc_id < 400 across sf0.001/0.01/0.1).

If the corpus or the tokenizer changes intentionally, re-run
``python fixtures/freeze_bpe.py`` and note it in the commit message.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from graphlab_spark.functions.bpe import count_tokens, train_merges

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TRAIN_SF = "/root/testdata/sf0.01"
N_MERGES = 200
DOC_ID_MAX = 400


def main() -> None:
    train_texts = pd.read_parquet(f"{TRAIN_SF}/documents.parquet")["text"].tolist()
    merges = train_merges(train_texts, N_MERGES)
    pd.DataFrame(
        {"rank": range(len(merges)),
         "left": [a for a, _ in merges],
         "right": [b for _, b in merges]}
    ).to_parquet("fixtures/bpe_merges.parquet", index=False)

    ranks = {m: i for i, m in enumerate(merges)}
    seen: dict[str, int] = {}
    cache: dict[str, int] = {}
    for sf in SF_DIRS:
        df = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        for t in df.loc[df["doc_id"] < DOC_ID_MAX, "text"]:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            if h not in seen:
                seen[h] = count_tokens(t, ranks, cache)
    pd.DataFrame(
        {"text_md5": list(seen), "n_tokens_bpe": list(seen.values())}
    ).to_parquet("fixtures/golden_bpe_counts.parquet", index=False)
    print(f"froze {len(merges)} merges, {len(seen)} golden counts")


if __name__ == "__main__":
    main()
