"""Freeze the unigram-LM tokenizer fixtures (run once, deliberately —
the freeze_bpe.py discipline):

- unigram_vocab.parquet      (piece, logp) — unigram model trained by
                             the deterministic LOCAL trainer on the
                             sf0.01 synthetic documents corpus.
- golden_unigram_ids.parquet (text_md5, ids_str) — expected token-ID
                             sequences ('-'-joined) under the frozen
                             QUANTIZED vocab (ids dense over the sorted
                             piece list, UNK = len(vocab)), keyed by
                             md5(text) so the oracle JOIN works at any
                             SF, frozen for every distinct text with
                             doc_id < 400 across sf0.001/0.01/0.1.

If the corpus or the tokenizer changes intentionally, re-run
``python fixtures/freeze_unigram.py`` and note it in the commit message.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from graphlab_spark.functions.unigram import (
    encode_ids_unigram,
    quantize_vocab,
    train_unigram,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TRAIN_SF = "/root/testdata/sf0.01"
# the synthetic corpus builds docs from a ~31-word lexicon (262 distinct
# substring pieces) — 120 forces several genuine EM+prune rounds
VOCAB_SIZE = 120
DOC_ID_MAX = 400


def main() -> None:
    train_texts = pd.read_parquet(f"{TRAIN_SF}/documents.parquet")["text"].tolist()
    vocab = train_unigram(train_texts, vocab_size=VOCAB_SIZE)
    pd.DataFrame(
        {"piece": [p for p, _ in vocab], "logp": [lp for _, lp in vocab]}
    ).to_parquet("fixtures/unigram_vocab.parquet", index=False)

    vq = quantize_vocab(vocab)
    seen: dict[str, str] = {}
    cache: dict[str, list[int]] = {}
    for sf in SF_DIRS:
        df = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        for t in df.loc[df["doc_id"] < DOC_ID_MAX, "text"]:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            if h not in seen:
                seen[h] = "-".join(
                    str(i) for i in encode_ids_unigram(t, vq, cache)
                )
    pd.DataFrame(
        {"text_md5": list(seen), "ids_str": list(seen.values())}
    ).to_parquet("fixtures/golden_unigram_ids.parquet", index=False)
    print(f"vocab pieces: {len(vocab)}  golden texts: {len(seen)}")


if __name__ == "__main__":
    main()
