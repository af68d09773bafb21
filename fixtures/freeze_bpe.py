"""Freeze the BPE tokenizer fixtures (run once, deliberately):

- bpe_merges.parquet       (rank, left, right) — merges trained on the
                           sf0.01 synthetic documents corpus.
- golden_bpe_counts.parquet (text_md5, n_tokens_bpe) — expected subword
                           counts keyed by md5(text) so the oracle JOIN
                           works at any SF (doc texts differ per SF;
                           counts are frozen for every distinct text
                           with doc_id < 400 across sf0.001/0.01/0.1).
- golden_bpe_ids.parquet   (text_md5, ids_str) — expected token-ID
                           sequences ('-'-joined) under the same merges
                           and id scheme (char ids < 256, merge i →
                           256+i), same keying.

If the corpus or the tokenizer changes intentionally, re-run
``python fixtures/freeze_bpe.py`` and note it in the commit message.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from graphlab_spark.functions.bpe import (
    count_tokens,
    encode_ids,
    merged_ids,
    train_merges,
)

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
    mids = merged_ids(merges)
    unk_id = 256 + len(merges)
    seen: dict[str, int] = {}
    seen_ids: dict[str, str] = {}
    cache: dict[str, int] = {}
    id_cache: dict[str, list[str]] = {}
    for sf in SF_DIRS:
        df = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        for t in df.loc[df["doc_id"] < DOC_ID_MAX, "text"]:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            if h not in seen:
                seen[h] = count_tokens(t, ranks, cache)
                seen_ids[h] = "-".join(
                    map(str, encode_ids(t, ranks, mids, unk_id, id_cache))
                )
    pd.DataFrame(
        {"text_md5": list(seen), "n_tokens_bpe": list(seen.values())}
    ).to_parquet("fixtures/golden_bpe_counts.parquet", index=False)
    pd.DataFrame(
        {"text_md5": list(seen_ids), "ids_str": list(seen_ids.values())}
    ).to_parquet("fixtures/golden_bpe_ids.parquet", index=False)
    print(f"froze {len(merges)} merges, {len(seen)} golden counts/id-seqs")


if __name__ == "__main__":
    main()
