"""BPE-style subword tokenization for token-budget accounting.

Real training pipelines budget shards on SUBWORD counts, not whitespace
words. This module provides:

- :func:`train_merges` — a deterministic offline byte-pair-encoding
  trainer (greedy most-frequent-pair, ties broken lexicographically).
  Run once over the synthetic corpus by ``fixtures/freeze_goldens.py``;
  the merges table is committed at ``fixtures/bpe_merges.parquet``.
- :func:`bpe_count_col` — an Arrow-batched pandas UDF applying the
  frozen merges. The merges list is tiny (hundreds of rows) and ships
  inside the UDF closure — the broadcast-small-dictionary pattern; the
  per-batch word cache makes cost proportional to DISTINCT words per
  batch, not tokens.

``token_estimate_col`` (chars/4, pure JVM) in functions.textstats stays
the fast path when an approximate budget is enough; this is the exact
path pack_shards accepts via its ``count_col`` parameter.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# lowercase word / digit-run / punctuation-run pre-tokens (GPT-2-style
# coarse classes, without the leading-space marker — counts only here)
_PRETOKEN_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]+")

MERGES_FIXTURE = "fixtures/bpe_merges.parquet"


def pretokenize(text: str) -> list[str]:
    return _PRETOKEN_RE.findall(text.lower())


def train_merges(texts: Iterable[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Greedy BPE trainer: repeatedly merge the most frequent adjacent
    symbol pair across the word-frequency table. Fully deterministic:
    ties break on the lexicographically smallest pair; stops early when
    the best pair occurs only once."""
    word_freq: Counter[str] = Counter()
    for t in texts:
        if t:
            word_freq.update(pretokenize(t))
    seqs: dict[str, tuple[str, ...]] = {w: tuple(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: Counter[tuple[str, str]] = Counter()
        for w, f in word_freq.items():
            seq = seqs[w]
            for pair in zip(seq, seq[1:]):
                pair_freq[pair] += f
        if not pair_freq:
            break
        best = min(pair_freq, key=lambda p: (-pair_freq[p], p))
        if pair_freq[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for w, seq in seqs.items():
            if best[0] not in w or best[1] not in w:
                continue
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one pre-token: repeatedly merge every occurrence
    of the lowest-rank adjacent pair present (standard BPE apply)."""
    seq: list[str] = list(word)
    while len(seq) > 1:
        best_rank = None
        best_pair = None
        for pair in zip(seq, seq[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        out: list[str] = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best_pair:
                out.append(merged)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def count_tokens(text: str | None, ranks: dict[tuple[str, str], int],
                 cache: dict[str, int] | None = None) -> int:
    if not text:
        return 0
    cache = cache if cache is not None else {}
    total = 0
    for w in pretokenize(text):
        n = cache.get(w)
        if n is None:
            n = cache[w] = len(encode_word(w, ranks))
        total += n
    return total


def load_merges(path: str = MERGES_FIXTURE) -> list[tuple[str, str]]:
    df = pd.read_parquet(path).sort_values("rank")
    return list(zip(df["left"], df["right"]))


def bpe_count_col(merges: Sequence[tuple[str, str]], text_col: str = "text") -> Column:
    """Column: exact BPE subword count of ``text_col`` under the frozen
    merges — vectorized pandas UDF, per-batch distinct-word cache."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        return s.map(lambda t: count_tokens(t, ranks, cache)).astype("int32")

    return _count(F.col(text_col))
