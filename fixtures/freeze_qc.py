"""Freeze the fastText-style linear quality-classifier fixture (run
once, deliberately): ``qc_weights.parquet`` — integer-quantized
logistic-regression weights over hashed bag-of-words buckets.

Real curation pipelines train a small linear text classifier OFFLINE
(fastText wiki-vs-crawl quality scoring: a 'wanted' corpus vs a
'filler' corpus) and apply it at corpus scale; Spark's job is the
at-scale application (operators/qclassify.py). This freezer is the
offline half, fully deterministic (numpy float64, zero init, full-batch
gradient descent, arithmetic doc synthesis — no RNG anywhere):

- training corpus: 400 synthesized docs, 200 per class. Class 1
  ('in-domain') draws from the sf0.01 documents vocabulary; class 0
  ('filler') draws from a disjoint common-English stopword-ish list;
  every doc mixes 1-in-7 tokens from the other class so the classes
  overlap (accuracy is learned, not a vocab-lookup artifact). Token
  choice is pure index arithmetic (i·7 + j·13 style), reproducible
  byte-for-byte.
- features: token counts over ``B = 4096`` hash buckets normalized by
  doc token count; tokens are ``functions.bpe.pretokenize`` pre-tokens;
  bucket(word) = int(md5(word)[:12], 16) % B — the repo's standard
  engine-portable hash (Spark ``conv(substring(md5,1,12),16,10)`` ≡
  DuckDB ``CAST('0x' || substr(md5,1,12) AS BIGINT)``).
- quantization: w_q = round(w · 10^6) int64, bias likewise. THE FROZEN
  MODEL IS THE QUANTIZED ONE: a doc's score is the exact integer
  ``score_q = bias_q · n_tokens + Σ_tokens w_q[bucket]`` (the real
  b + mean(w) scaled by n_tokens · 10^6), so scoring hashes identically
  in any engine — no float-sum-order hazard.

The table stores one row per trained bucket (zero weights omitted;
scorers left-join and coalesce to 0) plus a ``bucket = -1`` row
carrying bias_q.

If the corpus or tokenizer changes intentionally, re-run
``PYTHONPATH=/root/repo python fixtures/freeze_qc.py`` and note it in
the commit message.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from graphlab_spark.functions.bpe import pretokenize

B = 4096
N_ITERS = 600
LR = 2.0
L2 = 1e-4
SCALE = 1_000_000
TRAIN_SF = "/root/testdata/sf0.01"
N_PER_CLASS = 200
DOC_LEN = 60
MIX_EVERY = 7  # every 7th token comes from the other class's vocab

FILLER_VOCAB = [
    "the", "and", "of", "to", "in", "is", "was", "for", "on", "with",
    "as", "by", "at", "from", "this", "that", "it", "are", "be", "or",
    "an", "which", "but", "not", "were", "their", "said", "has", "had",
    "its", "also", "more", "about", "into", "than", "other", "some",
    "time", "very", "when",
]


def bucket(word: str) -> int:
    return int(hashlib.md5(word.encode("utf-8")).hexdigest()[:12], 16) % B


def corpus_vocab() -> list[str]:
    docs = pd.read_parquet(f"{TRAIN_SF}/documents.parquet", columns=["text"])
    v: set[str] = set()
    for t in docs["text"]:
        v.update(pretokenize(t))
    return sorted(v)


def synth_training_docs() -> tuple[list[list[str]], np.ndarray]:
    """(token-lists, labels): class 1 = in-domain vocab, class 0 =
    filler vocab, deterministic index-arithmetic token choice."""
    vocab1 = corpus_vocab()
    toks: list[list[str]] = []
    labels: list[int] = []
    for label, own, other in ((1, vocab1, FILLER_VOCAB), (0, FILLER_VOCAB, vocab1)):
        for i in range(N_PER_CLASS):
            doc = []
            for j in range(DOC_LEN):
                src = other if j % MIX_EVERY == MIX_EVERY - 1 else own
                doc.append(src[(i * 7 + j * 13 + label * 3) % len(src)])
            toks.append(doc)
            labels.append(label)
    return toks, np.array(labels, dtype=np.float64)


def main() -> None:
    toks, y = synth_training_docs()
    X = np.zeros((len(toks), B), dtype=np.float64)
    for i, ws in enumerate(toks):
        for w in ws:
            X[i, bucket(w)] += 1.0
        X[i] /= len(ws)

    w = np.zeros(B, dtype=np.float64)
    b = 0.0
    n = len(toks)
    for _ in range(N_ITERS):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (X.T @ g / n + L2 * w)
        b -= LR * float(g.mean())

    w_q = np.round(w * SCALE).astype(np.int64)
    bias_q = int(round(b * SCALE))

    # accuracy of the QUANTIZED integer rule — the shipped model
    score_q = np.array(
        [bias_q * len(ws) + sum(int(w_q[bucket(t)]) for t in ws) for ws in toks]
    )
    acc = float(((score_q > 0) == (y > 0.5)).mean())

    nz = np.nonzero(w_q)[0]
    out = pd.DataFrame(
        {
            "bucket": np.concatenate([nz.astype(np.int64), [-1]]),
            "w_q": np.concatenate([w_q[nz], [bias_q]]),
        }
    )
    out.to_parquet("fixtures/qc_weights.parquet", index=False)
    print(
        f"froze {len(nz)} bucket weights + bias_q={bias_q}; "
        f"quantized train accuracy {acc:.4f} over {n} docs"
    )


if __name__ == "__main__":
    main()
