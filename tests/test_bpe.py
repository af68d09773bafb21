"""BPE subword tokenizer: trainer determinism (hand-computed merges),
encoder correctness, the Spark pandas-UDF column, and pack_shards
budgeting on exact subword counts."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphlab_spark.functions.bpe import (
    bpe_count_col,
    count_tokens,
    encode_word,
    load_merges,
    pretokenize,
    train_merges,
    train_merges_distributed,
    word_counts,
)

TOY = ["low low low low low", "lower lower", "newest newest newest"]


def test_train_merges_hand_computed():
    """Greedy most-frequent pair with lexicographic tie-break, traced by
    hand over the classic low/lower/newest corpus."""
    merges = train_merges(TOY, n_merges=5)
    assert merges == [("l", "o"), ("lo", "w"), ("e", "s"), ("e", "w"), ("es", "t")]
    # determinism: same input → same merges, order-insensitive input too
    assert train_merges(list(reversed(TOY)), n_merges=5) == merges


def test_encode_word_applies_rank_order():
    ranks = {m: i for i, m in enumerate(train_merges(TOY, n_merges=5))}
    assert encode_word("lowest", ranks) == ["low", "est"]
    assert encode_word("low", ranks) == ["low"]
    assert encode_word("xyz", ranks) == ["x", "y", "z"]  # no applicable merges


def test_count_tokens_pretokenizer_classes():
    ranks = {m: i for i, m in enumerate(train_merges(TOY, n_merges=5))}
    assert pretokenize("Lowest, lowest 42!") == ["lowest", ",", "lowest", "42", "!"]
    assert count_tokens("Lowest lowest!", ranks) == 5  # 2 + 2 + 1
    assert count_tokens(None, ranks) == 0
    assert count_tokens("", ranks) == 0


def test_frozen_merges_fixture_stable():
    """The committed merges table re-trains identically from the sf0.01
    corpus — the fixture is reproducible, not hand-edited."""
    merges = load_merges("/root/repo/fixtures/bpe_merges.parquet")
    texts = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")["text"].tolist()
    assert train_merges(texts, n_merges=200) == merges


def test_word_counts_jvm_matches_python(spark):
    """The JVM regexp_extract_all pre-tokenizer agrees token-for-token
    with the Python ``pretokenize`` it mirrors — including digit runs,
    punctuation runs, case folding, and NULL/empty rows."""
    from collections import Counter

    texts = [
        "low low LOWER 42!",
        "a--b 007 c?!d",
        "",
        None,
        "Tabs\tand\nnewlines are separators; commas, too.",
    ]
    expected = Counter()
    for t in texts:
        if t:
            expected.update(pretokenize(t))
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    assert got == dict(expected)


def test_train_merges_distributed_equals_local(spark):
    """No-truncation distributed training is bit-identical to the local
    trainer on the sf0.001 corpus (the fixture-freezing equivalence)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    local = train_merges(texts, n_merges=80)
    dist = train_merges_distributed(docs, n_merges=80)
    assert dist == local


def test_train_merges_distributed_truncation(spark):
    """min_count / max_words bound the driver-side vocabulary exactly:
    the distributed result equals the local merge loop over the same
    truncated frequency table."""
    from collections import Counter

    from graphlab_spark.functions.bpe import _merge_loop

    df = spark.createDataFrame([(t,) for t in TOY], "text string")
    full = Counter()
    for t in TOY:
        full.update(pretokenize(t))
    # min_count=3 drops 'lower' (freq 2)
    kept = Counter({w: c for w, c in full.items() if c >= 3})
    assert train_merges_distributed(df, n_merges=5, min_count=3) == _merge_loop(kept, 5)
    # max_words=1 keeps only the most frequent word ('low', freq 5)
    top1 = Counter({"low": 5})
    assert train_merges_distributed(df, n_merges=5, max_words=1) == _merge_loop(top1, 5)


def test_bpe_count_col_matches_golden(spark):
    """Spark UDF counts == frozen golden counts (md5-keyed) at sf0.001."""
    import hashlib

    merges = load_merges("/root/repo/fixtures/bpe_merges.parquet")
    golden = pd.read_parquet("/root/repo/fixtures/golden_bpe_counts.parquet")
    expected = dict(zip(golden["text_md5"], golden["n_tokens_bpe"]))

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 400)
    )
    got = docs.select("doc_id", "text", bpe_count_col(merges).alias("n")).collect()
    assert len(got) == 400
    for r in got:
        h = hashlib.md5(r.text.encode("utf-8")).hexdigest()
        assert r.n == expected[h], f"doc {r.doc_id}"


def test_encode_ids_scheme():
    """Id space: single chars keep their codepoint, merge i → 256+i,
    non-Latin-1 → UNK; sequence length == count_tokens."""
    from graphlab_spark.functions.bpe import encode_ids, merged_ids

    merges = train_merges(TOY, n_merges=5)
    ranks = {m: i for i, m in enumerate(merges)}
    mids = merged_ids(merges)
    unk = 256 + len(merges)
    # 'low' is merge #1's product ('lo'+'w') → id 257; '!' → ord('!')
    assert encode_ids("low!", ranks, mids, unk) == [257, ord("!")]
    # 'est' = merge #4 ('es'+'t') → 260; 'x' stays a char id
    assert encode_ids("lowest x", ranks, mids, unk) == [257, 260, ord("x")]
    # non-Latin-1 char → UNK
    assert encode_ids("€", ranks, mids, unk) == [unk]
    assert encode_ids(None, ranks, mids, unk) == []
    for t in ["Lowest, lowest 42!", "low lower newest"]:
        assert len(encode_ids(t, ranks, mids, unk)) == count_tokens(t, ranks)


def test_bpe_ids_col_matches_python(spark):
    """The Spark array<int> column equals the pure-Python encoder and
    its size equals bpe_count_col row-for-row."""
    from graphlab_spark.functions.bpe import bpe_ids_col, encode_ids, merged_ids

    merges = load_merges("/root/repo/fixtures/bpe_merges.parquet")
    ranks = {m: i for i, m in enumerate(merges)}
    mids = merged_ids(merges)
    unk = 256 + len(merges)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    got = docs.select(
        "doc_id", "text", bpe_ids_col(merges).alias("ids"),
        bpe_count_col(merges).alias("n"),
    ).collect()
    assert len(got) == 100
    for r in got:
        assert list(r.ids) == encode_ids(r.text, ranks, mids, unk)
        assert len(r.ids) == r.n


def test_pack_shards_accepts_bpe_counts(spark):
    from graphlab_spark.operators.sampling import pack_shards

    merges = load_merges("/root/repo/fixtures/bpe_merges.parquet")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text", bpe_count_col(merges).alias("n_bpe"))
    )
    packed = pack_shards(docs, budget_tokens=500, n_buckets=8, count_col="n_bpe")
    rows = packed.collect()
    assert len(rows) == 200
    # budgeting used the BPE counts, not whitespace counts
    bpe = {r.doc_id: r.n_bpe for r in docs.collect()}
    assert all(r.n_tokens == bpe[r.doc_id] for r in rows)
    # greedy invariant: each chunk's sum < budget + its max single doc
    agg = {}
    for r in sorted(rows, key=lambda r: (r.bucket, r.doc_id)):
        agg.setdefault((r.bucket, r.chunk_id), []).append(r.n_tokens)
    for toks in agg.values():
        assert sum(toks) < 500 + toks[-1]
    # a too-small budget would collapse everything into chunk 0 otherwise
    assert any(r.chunk_id > 0 for r in rows)


# ----------------------------------------------------------- decode


def test_decode_round_trips_to_pretoken_stream(spark):
    """decode(encode(text)) == ''.join(pretokenize(text)) for every
    sf0.001 document — the id sequence preserves all non-whitespace
    content under the frozen merges (whitespace/case drop is the
    pre-tokenizer contract, not decoder loss)."""
    from pyspark.sql import functions as F

    from graphlab_spark.functions.bpe import (
        bpe_decode_col,
        bpe_ids_col,
        load_merges,
        pretokenize,
    )

    merges = load_merges()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    got = (
        docs.withColumn("ids", bpe_ids_col(merges))
        .withColumn("decoded", bpe_decode_col(merges))
        .select("doc_id", "text", "decoded")
        .collect()
    )
    assert len(got) > 100
    for r in got:
        assert r.decoded == "".join(pretokenize(r.text)), r.doc_id


def test_decode_unknown_id_renders_replacement():
    from graphlab_spark.functions.bpe import decode_ids, load_merges

    merges = load_merges()
    assert decode_ids([ord("h"), ord("i")], merges) == "hi"
    assert decode_ids([999999], merges) == "�"
    assert decode_ids([], merges) == ""
