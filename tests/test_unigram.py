"""Unigram-LM tokenizer (functions/unigram.py): local trainer
determinism + real subword behavior, distributed trainer ≡ local,
distributed seed counts ≡ python, and the frozen-vocab Spark encoder
against the committed golden ids."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from graphlab_spark.functions.bpe import pretokenize
from graphlab_spark.functions.unigram import (
    encode_ids_unigram,
    expected_counts_distributed,
    expected_counts_local,
    load_vocab,
    quantize_vocab,
    seed_vocab,
    substring_counts,
    train_unigram,
    train_unigram_distributed,
    unigram_ids_col,
    viterbi_pieces,
)

# morphological corpus: shared stems × prefixes, so sub-word pieces
# (not whole words) genuinely carry probability mass
STEM_TEXTS = [
    "resample rescale regroup sample scale group",
    "resample sample resample sample rescale scale",
    "regroup group regroup group resample rescale",
    "presample prescale pregroup sample scale group",
] * 3


def test_local_trainer_deterministic_and_normalized():
    v1 = train_unigram(STEM_TEXTS, vocab_size=30)
    v2 = train_unigram(STEM_TEXTS, vocab_size=30)
    assert v1 == v2
    total = sum(math.exp(lp) for _, lp in v1)
    assert abs(total - 1.0) < 1e-9  # a proper distribution
    corpus = "".join(STEM_TEXTS)
    assert all(p in corpus for p, _ in v1)


def test_subword_pieces_survive_and_segment_unseen_words():
    vocab = train_unigram(STEM_TEXTS, vocab_size=18)
    pieces = {p for p, _ in vocab}
    words = set()
    for t in STEM_TEXTS:
        words.update(pretokenize(t))
    multi_nonword = {p for p in pieces if len(p) > 1 and p not in words}
    assert multi_nonword  # real sub-word units, not just whole words
    vq = quantize_vocab(vocab)
    # an UNSEEN composite of seen morphemes segments into multi-char
    # pieces rather than characters
    seg = viterbi_pieces("represample", vq)
    assert seg is not None and "".join(seg) == "represample"
    assert any(len(p) > 1 for p in seg)


def test_distributed_trainer_matches_local(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    local = train_unigram(texts, vocab_size=60)
    dist = train_unigram_distributed(docs, vocab_size=60)
    assert [p for p, _ in local] == [p for p, _ in dist]
    for (_, a), (_, b) in zip(local, dist):
        assert abs(a - b) < 1e-8  # float partial-sum order differs only


def test_distributed_estep_matches_local(spark):
    wf = Counter()
    for t in STEM_TEXTS:
        wf.update(pretokenize(t))
    model = seed_vocab(wf, max_pieces=100)
    wc = spark.createDataFrame(
        [(w, int(c)) for w, c in sorted(wf.items())], "word string, cnt long"
    ).repartition(4)
    dist = expected_counts_distributed(wc, model)
    local = expected_counts_local(wf, model)
    assert set(dist) == set(local)
    for p in local:
        assert dist[p] == pytest.approx(local[p], rel=1e-9)


def test_substring_counts_matches_python(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.piece: r.cnt for r in substring_counts(docs).collect()}
    exp: Counter[str] = Counter()
    for r in docs.select("text").collect():
        for w in pretokenize(r.text):
            for i in range(len(w)):
                for l in range(1, min(8, len(w) - i) + 1):
                    exp[w[i : i + l]] += 1
    assert got == dict(exp)


def test_viterbi_determinism_and_unk():
    vocab = [("a", -1.0), ("ab", -1.2), ("b", -2.0), ("abc", -2.5), ("c", -1.1)]
    vq = quantize_vocab(vocab)
    # same total score paths resolve by fewer pieces then longest-last
    assert viterbi_pieces("abc", vq) in (["abc"], ["ab", "c"], ["a", "b", "c"])
    assert viterbi_pieces("abc", vq) == viterbi_pieces("abc", vq)
    assert viterbi_pieces("zz", vq) is None
    ids = encode_ids_unigram("abc zz", vq)
    unk = len(vq)
    assert ids[-2:] == [unk, unk]  # uncovered chars fall back to UNK
    assert encode_ids_unigram(None, vq) == []
    assert encode_ids_unigram("", vq) == []


def test_spark_encoder_matches_frozen_golden(spark, repo_root):
    vocab = load_vocab(f"{repo_root}/fixtures/unigram_vocab.parquet")
    golden = spark.read.parquet(
        f"{repo_root}/fixtures/golden_unigram_ids.parquet"
    )
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", "text", F.md5(F.col("text")).alias("text_md5"))
    )
    live = docs.withColumn("ids", unigram_ids_col(vocab)).select(
        "doc_id",
        "text_md5",
        F.array_join(F.transform("ids", lambda x: x.cast("string")), "-").alias(
            "live_ids"
        ),
    )
    j = live.join(golden, "text_md5", "left").collect()
    assert len(j) > 100
    for r in j:
        assert r.ids_str is not None and r.live_ids == r.ids_str, r.doc_id


def test_pack_shards_accepts_unigram_counts(spark, repo_root):
    """The shard packer budgets on unigram subword counts exactly as it
    does on BPE counts — the tokenizer family is interchangeable at the
    export seam (size(ids) is the count by construction)."""
    from graphlab_spark.operators.sampling import pack_shards

    vocab = load_vocab(f"{repo_root}/fixtures/unigram_vocab.parquet")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id", "text", F.size(unigram_ids_col(vocab)).alias("n_uni")
        )
    )
    packed = pack_shards(docs, budget_tokens=500, n_buckets=8, count_col="n_uni")
    rows = packed.collect()
    assert len(rows) == 200
    uni = {r.doc_id: r.n_uni for r in docs.collect()}
    assert all(r.n_tokens == uni[r.doc_id] for r in rows)
    agg: dict = {}
    for r in sorted(rows, key=lambda r: (r.bucket, r.doc_id)):
        agg.setdefault((r.bucket, r.chunk_id), []).append(r.n_tokens)
    for toks in agg.values():
        assert sum(toks) < 500 + toks[-1]
    assert any(r.chunk_id > 0 for r in rows)


def test_distributed_seed_matches_local(spark):
    """seed_vocab_distributed (JVM substring pass + vocab-sized
    collect) equals seed_vocab over the same word table exactly —
    identical integers, identical log arithmetic."""
    from graphlab_spark.functions.unigram import seed_vocab_distributed

    wf = Counter()
    for t in STEM_TEXTS:
        wf.update(pretokenize(t))
    wc = spark.createDataFrame(
        [(w, int(c)) for w, c in sorted(wf.items())], "word string, cnt long"
    ).repartition(3)
    local = seed_vocab(wf, max_pieces=40)
    dist = seed_vocab_distributed(wc, max_pieces=40)
    assert dist == local
