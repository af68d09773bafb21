"""Unigram-LM subword tokenization (Kudo 2018 — SentencePiece's unigram
model; public method), completing the tokenizer family next to
:mod:`graphlab_spark.functions.bpe`: real pipelines train BOTH and pick
per-corpus.

Same architecture split as the BPE module:

- The ONLY corpus-sized passes are pure-JVM aggregations: the pre-token
  word-frequency table (reused from ``bpe.word_counts`` — one partial-agg
  shuffle) and the seed-substring counts (:func:`substring_counts` —
  higher-order array expressions + explode + ONE partial-agg groupBy;
  the shuffle carries (piece, partial-count) rows, never positions).
- EM then runs over the WORD-FREQUENCY table, which is vocabulary-sized
  (Heaps' law, plus explicit ``min_count``/``max_words`` bounds). The
  distributed E-step (:func:`expected_counts_distributed`) maps the
  word table through ``mapInPandas`` with the current piece log-probs
  in the task closure (vocabulary-sized — the broadcast-small-dict
  pattern) and PRE-AGGREGATES per partition in Python, so the shuffle
  is bounded by |vocab| × partitions regardless of word count; the
  M-step/prune loop on the driver touches only vocabulary-sized state
  (the BPE merge-loop posture).
- :func:`train_unigram` is the deterministic LOCAL reference trainer
  (runs inside ``fixtures/freeze_unigram.py`` to produce the committed
  vocab); :func:`train_unigram_distributed` is the corpus-scale path,
  pinned ≡ local at float tolerance in tests/test_unigram.py (float
  partial-sum order differs across partitionings — the kmeans/pagerank
  posture).
- Encoding applies the FROZEN vocab with INTEGER-quantized log-probs
  (round(logp·1000) — the qc/lm/transe fixture discipline), so the
  Viterbi DP is exact int64 arithmetic with a total deterministic
  tie-break: maximize (score, −n_pieces, longest-last-piece).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphlab_spark.functions.bpe import pretokenize, word_counts

VOCAB_FIXTURE = "fixtures/unigram_vocab.parquet"
MAX_PIECE_LEN = 8
_NEG_INF = float("-inf")


# ------------------------------------------------------------ seeding


def substring_counts(
    df: DataFrame, text_col: str = "text", max_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """(piece, cnt): occurrence counts of every pre-token substring of
    length 1..max_len across the corpus — the unigram seed-candidate
    pass. Two stages, both bounded: the word-frequency aggregation
    (corpus-sized input, vocabulary-sized output), then the substring
    explode over the WORD table only, weighted by word count — so a
    word repeated 10^9 times is enumerated once. All JVM: nested
    ``transform`` over ``sequence`` (hoisted projections — the t20
    lesson: nothing re-evaluates inside a lambda), flatten, explode,
    ONE partial-agg groupBy."""
    return substring_counts_from_wc(word_counts(df, text_col), max_len)


def substring_counts_from_wc(
    wc: DataFrame, max_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """The substring-explode half of :func:`substring_counts`, over an
    existing (word, cnt) table — what the distributed trainer seeds
    from (so min_count/max_words truncation applies to seeding too)."""
    n = F.length(F.col("word"))
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_len), n - i + 1)),
                lambda l: F.substring(F.col("word"), i, l),
            ),
        )
    )
    return (
        wc.select(F.col("cnt"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )


def seed_vocab_distributed(
    wc: DataFrame, max_pieces: int = 2000, max_len: int = MAX_PIECE_LEN
) -> dict[str, float]:
    """Distributed twin of :func:`seed_vocab`: the substring counts come
    from the JVM partial-agg pass over the word table; only the SELECTED
    vocabulary (every char + top ``max_pieces`` multi-char pieces by
    (count desc, piece asc) — a TakeOrdered top-k, no global sort) is
    collected, and the identical log(count/total) arithmetic runs
    driver-side on the same integers — so the result equals
    :func:`seed_vocab` over the same word table exactly (pinned)."""
    sc = substring_counts_from_wc(wc, max_len)
    chars = sc.filter(F.length("piece") == 1).collect()
    multi = (
        sc.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(max_pieces)
        .collect()
    )
    counts = {r["piece"]: int(r["cnt"]) for r in chars}
    counts.update({r["piece"]: int(r["cnt"]) for r in multi})
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items()}


def seed_vocab(
    word_freq: Counter, max_pieces: int = 2000, max_len: int = MAX_PIECE_LEN
) -> dict[str, float]:
    """Seed piece set from a word-frequency table: every single char
    (coverage guarantee) + the top ``max_pieces`` multi-char substrings
    by (count desc, piece asc); initial log-probs ∝ counts. The local
    twin of :func:`substring_counts` + top-k."""
    counts: Counter[str] = Counter()
    for w, f in word_freq.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                counts[w[i : i + l]] += f
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )[: max_pieces]
    vocab = chars | set(multi)
    total = sum(counts[p] for p in vocab)
    return {p: math.log(counts[p] / total) for p in vocab}


# ----------------------------------------------------------------- EM


def _forward_backward(word: str, logp: dict[str, float]) -> dict[str, float] | None:
    """Expected piece counts for ONE word under the current model
    (posterior over the segmentation lattice). None if the word cannot
    be segmented (a char missing from the vocab)."""
    n = len(word)
    fwd = [_NEG_INF] * (n + 1)
    fwd[0] = 0.0
    for j in range(1, n + 1):
        acc = _NEG_INF
        for i in range(max(0, j - MAX_PIECE_LEN), j):
            lp = logp.get(word[i:j])
            if lp is None or fwd[i] == _NEG_INF:
                continue
            x = fwd[i] + lp
            acc = x if acc == _NEG_INF else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
            )
        fwd[j] = acc
    if fwd[n] == _NEG_INF:
        return None
    bwd = [_NEG_INF] * (n + 1)
    bwd[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = _NEG_INF
        for j in range(i + 1, min(n, i + MAX_PIECE_LEN) + 1):
            lp = logp.get(word[i:j])
            if lp is None or bwd[j] == _NEG_INF:
                continue
            x = lp + bwd[j]
            acc = x if acc == _NEG_INF else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
            )
        bwd[i] = acc
    z = fwd[n]
    out: dict[str, float] = {}
    for i in range(n):
        if fwd[i] == _NEG_INF:
            continue
        for j in range(i + 1, min(n, i + MAX_PIECE_LEN) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or bwd[j] == _NEG_INF:
                continue
            out[piece] = out.get(piece, 0.0) + math.exp(fwd[i] + lp + bwd[j] - z)
    return out


def expected_counts_local(
    word_freq: Counter, logp: dict[str, float]
) -> Counter:
    """One E-step over a word-frequency table (local reference)."""
    agg: Counter[str] = Counter()
    for w, f in word_freq.items():
        ec = _forward_backward(w, logp)
        if ec:
            for p, c in ec.items():
                agg[p] += c * f
    return agg


def expected_counts_distributed(
    wc: DataFrame, logp: dict[str, float]
) -> Counter:
    """One E-step over a distributed (word, cnt) table: ``mapInPandas``
    with the vocab log-probs in the closure, per-partition Python
    pre-aggregation (output bounded by |vocab| per partition), ONE
    partial-agg groupBy(piece), vocabulary-sized collect."""
    model = dict(logp)

    def _estep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        agg: dict[str, float] = {}
        for pdf in batches:
            for w, f in zip(pdf["word"], pdf["cnt"]):
                ec = _forward_backward(w, model)
                if ec:
                    for p, c in ec.items():
                        agg[p] = agg.get(p, 0.0) + c * float(f)
        yield pd.DataFrame({"piece": list(agg), "ec": list(agg.values())})

    rows = (
        wc.mapInPandas(_estep, "piece string, ec double")
        .groupBy("piece")
        .agg(F.sum("ec").alias("ec"))
        .collect()
    )
    return Counter({r["piece"]: r["ec"] for r in rows})


def _em_prune_loop(
    vocab: dict[str, float],
    vocab_size: int,
    estep,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> list[tuple[str, float]]:
    """Alternate EM and pruning until the vocab reaches ``vocab_size``
    (SentencePiece's schedule, simplified deterministically: prune by
    lowest expected count, ties by piece, single chars never pruned),
    then run one final EM round. Driver state is vocabulary-sized."""

    def em_round(v: dict[str, float]) -> tuple[dict[str, float], Counter]:
        ec = Counter()
        for _ in range(em_iters):
            ec = estep(v)
            total = sum(ec.values())
            v = {p: math.log(ec[p] / total) for p in v if ec.get(p, 0.0) > 0.0}
        return v, ec

    while True:
        vocab, ec = em_round(vocab)
        n_multi = sum(1 for p in vocab if len(p) > 1)
        n_chars = len(vocab) - n_multi
        if n_chars + n_multi <= vocab_size:
            break
        keep_multi = max(vocab_size - n_chars, int(n_multi * shrink))
        if keep_multi >= n_multi:
            break
        kept = sorted(
            (p for p in vocab if len(p) > 1),
            key=lambda p: (-ec.get(p, 0.0), p),
        )[:keep_multi]
        vocab = {p: lp for p, lp in vocab.items() if len(p) == 1 or p in set(kept)}
    vocab, _ = em_round(vocab)
    return sorted(vocab.items())


def train_unigram(
    texts: Iterable[str],
    vocab_size: int = 400,
    max_pieces: int = 2000,
) -> list[tuple[str, float]]:
    """Deterministic LOCAL reference trainer → sorted (piece, logp).
    Runs in ``fixtures/freeze_unigram.py`` to produce the committed
    vocab; :func:`train_unigram_distributed` is pinned against it."""
    word_freq: Counter[str] = Counter()
    for t in texts:
        if t:
            word_freq.update(pretokenize(t))
    vocab = seed_vocab(word_freq, max_pieces)
    return _em_prune_loop(
        vocab, vocab_size, lambda v: expected_counts_local(word_freq, v)
    )


def train_unigram_distributed(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    max_pieces: int = 2000,
    min_count: int = 1,
    max_words: int | None = None,
) -> list[tuple[str, float]]:
    """Corpus-scale trainer: distributed word counts + distributed
    seed-substring counts (both pure-JVM partial-agg shuffles), then
    the EM/prune loop with the DISTRIBUTED E-step. The collected state
    is vocabulary-sized at every point; with no truncation the result
    matches :func:`train_unigram` to float tolerance (pinned)."""
    import uuid

    from graphlab_spark.operators.scratch import cleanup_prefix, materialize

    wc = word_counts(df, text_col)
    if min_count > 1:
        wc = wc.where(F.col("cnt") >= min_count)
    if max_words is not None:
        wc = wc.orderBy(F.col("cnt").desc(), F.col("word")).limit(max_words)
    # per-call tag + cleanup after the final EM round: the word table is
    # corpus-vocabulary-sized, and leaving it pinned under a fixed name
    # until process exit leaked one copy per training call (r6, ADVICE)
    tag = f"unigram_wc_{uuid.uuid4().hex[:8]}"
    wc = materialize(wc, tag)  # EM re-reads it every iteration
    try:
        vocab = seed_vocab_distributed(wc, max_pieces)  # vocab-sized collect
        return _em_prune_loop(
            vocab, vocab_size, lambda v: expected_counts_distributed(wc, v)
        )
    finally:
        cleanup_prefix(tag)


# ------------------------------------------------------------ encoding


def quantize_vocab(vocab: list[tuple[str, float]]) -> dict[str, tuple[int, int]]:
    """piece → (id, logp_q) with ids dense over the SORTED piece list
    and logp_q = round(logp·1000) — exact int64 Viterbi arithmetic, the
    qc/lm/transe fixture discipline. UNK id = len(vocab)."""
    return {p: (i, round(lp * 1000)) for i, (p, lp) in enumerate(sorted(vocab))}


def viterbi_pieces(word: str, vq: dict[str, tuple[int, int]]) -> list[str] | None:
    """Best segmentation under quantized log-probs — integer DP maximizing
    (score, −n_pieces, longest-last-piece), a TOTAL deterministic
    order. None if the word cannot be covered."""
    n = len(word)
    # dp[j] = (score, -npieces, start_of_last_piece) — prefer smaller i
    # (longer last piece) at full ties via strict > on the tuple with
    # ascending i: the first maximal candidate wins
    dp: list[tuple[int, int, int] | None] = [None] * (n + 1)
    dp[0] = (0, 0, 0)
    for j in range(1, n + 1):
        best = None
        for i in range(max(0, j - MAX_PIECE_LEN), j):
            if dp[i] is None:
                continue
            ent = vq.get(word[i:j])
            if ent is None:
                continue
            cand = (dp[i][0] + ent[1], dp[i][1] - 1, i)
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        dp[j] = best
    if dp[n] is None:
        return None
    out: list[str] = []
    j = n
    while j > 0:
        i = dp[j][2]
        out.append(word[i:j])
        j = i
    return out[::-1]


def encode_ids_unigram(
    text: str | None,
    vq: dict[str, tuple[int, int]],
    cache: dict[str, list[int]] | None = None,
) -> list[int]:
    """Token-id sequence of ``text`` under the frozen quantized vocab;
    unsegmentable words emit one UNK (= len(vocab)) per uncovered run
    char-by-char fallback: chars in vocab still map, missing chars map
    to UNK."""
    if not text:
        return []
    unk = len(vq)
    cache = cache if cache is not None else {}
    ids: list[int] = []
    for w in pretokenize(text):
        got = cache.get(w)
        if got is None:
            pieces = viterbi_pieces(w, vq)
            if pieces is None:
                got = [vq[c][0] if c in vq else unk for c in w]
            else:
                got = [vq[p][0] for p in pieces]
            cache[w] = got
        ids.extend(got)
    return ids


def unigram_ids_col(
    vocab: list[tuple[str, float]], text_col: str = "text"
) -> Column:
    """Column: ``array<int>`` unigram token ids — Arrow-batched pandas
    UDF, vocab in the closure (vocabulary-sized, ships with the task),
    per-batch distinct-word cache (cost ∝ distinct words per batch)."""
    vq = quantize_vocab(vocab)

    @F.pandas_udf("array<int>")
    def _ids(s: pd.Series) -> pd.Series:
        cache: dict[str, list[int]] = {}
        return s.map(lambda t: encode_ids_unigram(t, vq, cache))

    return _ids(F.col(text_col))


def load_vocab(path: str = VOCAB_FIXTURE) -> list[tuple[str, float]]:
    pdf = pd.read_parquet(path)
    return sorted(zip(pdf["piece"], pdf["logp"]))
