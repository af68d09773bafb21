"""BPE-style subword tokenization for token-budget accounting.

Real training pipelines budget shards on SUBWORD counts, not whitespace
words. This module provides:

- :func:`train_merges` — a deterministic offline byte-pair-encoding
  trainer (greedy most-frequent-pair, ties broken lexicographically).
  Run once over the synthetic corpus by ``fixtures/freeze_goldens.py``;
  the merges table is committed at ``fixtures/bpe_merges.parquet``.
- :func:`train_merges_distributed` — the same trainer at corpus scale:
  the ONLY corpus-sized pass is a pure-JVM word-frequency aggregation
  (lower + regexp_extract_all + explode + groupBy, one shuffle, partial
  agg map-side); the greedy merge loop then runs over the collected
  word-frequency table, which is VOCABULARY-sized (Heaps' law — and
  hard-bounded by ``min_count``/``max_words``), never corpus-sized.
  This is the standard tokenizer-training shape (HuggingFace trainers
  do exactly this split); with no truncation it is bit-identical to
  :func:`train_merges` on the same texts.
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
from pyspark.sql import Column, DataFrame
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
    return _merge_loop(word_freq, n_merges)


def _merge_loop(word_freq: Counter, n_merges: int) -> list[tuple[str, str]]:
    """The greedy merge loop over a (word → frequency) table. Cost is
    O(n_merges × distinct words) — independent of corpus size."""
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


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) frequency table of pre-tokens across the corpus —
    the one corpus-scale pass of distributed BPE training, entirely
    JVM-side: ``lower`` + ``regexp_extract_all`` + ``explode`` inside
    whole-stage codegen, then ONE groupBy shuffle with map-side partial
    aggregation, so the shuffle carries (word, partial-count) rows, not
    token occurrences. No Python touches corpus rows.

    The Java pattern mirrors ``_PRETOKEN_RE`` exactly; both engines use
    leftmost-first alternation and ``lower`` agrees on the pipeline's
    NFC-normalized input (functions.normalize is the upstream stage)."""
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+"), F.lit(0)
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_merges_distributed(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    min_count: int = 1,
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Corpus-scale BPE training: distributed :func:`word_counts`, then
    the driver-side :func:`_merge_loop` over the vocabulary table.

    The collect is VOCABULARY-sized, not corpus-sized — and bounded
    explicitly: ``min_count`` drops hapax junk (at web scale almost all
    distinct "words" are frequency-1 noise), ``max_words`` keeps the
    top-K by (count desc, word asc) via a top-K sort (TakeOrdered —
    never a global sort). With ``min_count=1`` and no cap this is
    bit-identical to :func:`train_merges` over the same texts (pinned
    in tests/test_bpe.py); with truncation it is the standard trainer
    approximation every production tokenizer makes."""
    wc = word_counts(df, text_col)
    if min_count > 1:
        wc = wc.where(F.col("cnt") >= min_count)
    if max_words is not None:
        wc = wc.orderBy(F.col("cnt").desc(), F.col("word")).limit(max_words)
    word_freq: Counter[str] = Counter()
    for r in wc.collect():
        word_freq[r["word"]] = r["cnt"]
    return _merge_loop(word_freq, n_merges)


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


def merged_ids(merges: Sequence[tuple[str, str]]) -> dict[str, int]:
    """Deterministic id space (GPT-2-byte-level flavored): single chars
    with codepoint < 256 keep their codepoint as id; the i-th merge's
    product gets id 256+i; anything else (non-Latin-1 chars — rare
    after upstream NFC normalization) maps to UNK = 256+len(merges)."""
    return {a + b: 256 + i for i, (a, b) in enumerate(merges)}


def encode_ids(
    text: str | None,
    ranks: dict[tuple[str, str], int],
    mids: dict[str, int],
    unk_id: int,
    cache: dict[str, list[str]] | None = None,
) -> list[int]:
    """Token-id sequence of ``text`` under the frozen merges — the
    payload a training shard actually carries (counts are its length)."""
    if not text:
        return []
    cache = cache if cache is not None else {}
    ids: list[int] = []
    for w in pretokenize(text):
        toks = cache.get(w)
        if toks is None:
            toks = cache[w] = encode_word(w, ranks)
        for t in toks:
            if len(t) == 1:
                o = ord(t)
                ids.append(o if o < 256 else unk_id)
            else:
                ids.append(mids.get(t, unk_id))
    return ids


def bpe_ids_col(merges: Sequence[tuple[str, str]], text_col: str = "text") -> Column:
    """Column: ``array<int>`` token ids of ``text_col`` under the frozen
    merges — same Arrow-batched UDF + per-batch distinct-word cache as
    :func:`bpe_count_col`; ``size()`` of this column equals that count."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    mids = merged_ids(merges)
    unk_id = 256 + len(merges)

    @F.pandas_udf("array<int>")
    def _ids(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        return s.map(lambda t: encode_ids(t, ranks, mids, unk_id, cache))

    return _ids(F.col(text_col))


def decode_ids(ids: Sequence[int], merges: Sequence[tuple[str, str]]) -> str:
    """Inverse of :func:`encode_ids` up to pre-tokenization:
    ``decode_ids(encode_ids(text)) == "".join(pretokenize(text))``
    (whitespace and case are dropped by the pre-tokenizer BY DESIGN —
    pinned by the round-trip test). Unknown ids render U+FFFD, the
    tokenizer-standard replacement."""
    products = {256 + i: a + b for i, (a, b) in enumerate(merges)}
    return "".join(
        chr(i) if 0 <= i < 256 else products.get(i, "�") for i in ids
    )


def bpe_decode_col(
    merges: Sequence[tuple[str, str]], ids_col: str = "ids"
) -> Column:
    """Column: decoded string of an ``array<int>`` id column — the
    shard-inspection path (spot-check what a packed training shard
    actually says). Same Arrow-batched shape as :func:`bpe_ids_col`;
    the id→token table is merges-sized and closure-captured (broadcast
    with the task, never a join)."""

    @F.pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        return s.map(lambda ids: decode_ids(ids, merges))

    return _dec(F.col(ids_col))


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
