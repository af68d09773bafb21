"""Freeze the bigram-LM count fixtures (run once, deliberately):

- lm_unigrams.parquet (w, c)      — unigram counts
- lm_bigrams.parquet  (w1, w2, c) — bigram counts

trained on the sf0.01 synthetic documents corpus (deterministic, seeded
— TESTDATA.md). Consumed by functions/lm.py (perplexity scoring) and
mirrored verbatim by the t18 DuckDB oracle.

If the corpus or the tokenizer changes intentionally, re-run
``python fixtures/freeze_lm.py`` and note it in the commit message.
"""

from __future__ import annotations

import pandas as pd

from graphlab_spark.functions.lm import train_bigram_counts

TRAIN_SF = "/root/testdata/sf0.01"


def main() -> None:
    texts = pd.read_parquet(f"{TRAIN_SF}/documents.parquet")["text"].tolist()
    uni, bi = train_bigram_counts(texts)
    pd.DataFrame(
        {"w": list(uni.keys()), "c": list(uni.values())}
    ).sort_values("w").to_parquet("fixtures/lm_unigrams.parquet", index=False)
    pd.DataFrame(
        {
            "w1": [a for a, _ in bi],
            "w2": [b for _, b in bi],
            "c": list(bi.values()),
        }
    ).sort_values(["w1", "w2"]).to_parquet("fixtures/lm_bigrams.parquet", index=False)
    print(f"froze {len(uni)} unigrams, {len(bi)} bigrams")


if __name__ == "__main__":
    main()
