"""Dedup tiers: exact, exact-Jaccard, MinHash-LSH, SimHash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators import dedup as DD

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("doc_id") < 200)
    return DD.with_planted_near_dups(docs).localCheckpoint()


def test_exact_dedup_removes_planted_copies(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    both = docs.unionByName(copies)
    groups = DD.exact_dup_groups(both)
    n_copies = copies.count()
    assert groups.count() == n_copies
    # keeper is always the original (smaller id)
    assert groups.filter(F.col("keeper") >= 1_000_000).count() == 0
    assert DD.exact_dedup(both).count() == docs.count()


def test_minhash_equals_exact_jaccard_on_planted(spark, planted):
    exact = {
        (r.a, r.b) for r in DD.jaccard_pairs_exact(planted, threshold=0.8).collect()
    }
    lsh = {(r.a, r.b) for r in DD.minhash_lsh_pairs(planted, threshold=0.8).collect()}
    # verification makes LSH ⊆ exact; 16x4 bands give ~full recall at J≥0.8
    assert lsh.issubset(exact)
    assert len(lsh) >= 0.98 * len(exact)
    # recall-side oracle (VERDICT r1 item 7): EVERY exact pair at J≥0.9
    # must appear in the LSH output — p(miss | J=0.9) ≈ 3e-8 per pair,
    # so on this fixture the gate is deterministic-in-practice
    exact_hi = {
        (r.a, r.b) for r in DD.jaccard_pairs_exact(planted, threshold=0.9).collect()
    }
    assert exact_hi, "fixture must plant J≥0.9 pairs"
    assert exact_hi.issubset(lsh)
    # every planted (original, copy) pair found
    planted_pairs = {
        (r.doc_id, r.doc_id + 10_000_000)
        for r in planted.filter("doc_id < 200 AND doc_id % 10 = 0").collect()
    }
    assert planted_pairs.issubset(lsh)


def test_simhash_guaranteed_recall_within_hamming_3(spark, planted):
    """Pigeonhole: a pair within Hamming ≤ 3 of 64 bits shares one of the
    four 16-bit chunks, so blocking recall is exactly 1.0 there."""
    pairs = {(r.a, r.b) for r in DD.simhash_near_pairs(planted, max_hamming=3).collect()}
    sims = {r.doc_id: r.simhash for r in DD.simhash_table(planted).collect()}
    planted_close = {
        (r.doc_id, r.doc_id + 10_000_000)
        for r in planted.filter("doc_id < 200 AND doc_id % 10 = 0").collect()
        if bin(sims[r.doc_id] ^ sims[r.doc_id + 10_000_000]).count("1") <= 3
    }
    assert planted_close, "fixture should plant some close pairs"
    assert planted_close.issubset(pairs)
    # and every returned pair genuinely verifies
    for r in DD.simhash_near_pairs(planted, max_hamming=3).collect():
        assert r.hamming <= 3


def test_simhash_deterministic(spark, planted):
    a = {(r.doc_id, r.simhash) for r in DD.simhash_table(planted).collect()}
    b = {(r.doc_id, r.simhash) for r in DD.simhash_table(planted).collect()}
    assert a == b


def test_shingled_equals_shingles_col(spark):
    """The hoisted two-projection form must be byte-identical to the
    single-expression shingles_col on real corpus text — the pin behind
    shingled()'s docstring claim (all three dedup tiers now build on
    shingled, so without this test a tokenization regression would
    cancel out everywhere except the d03 oracle)."""
    docs = DD.with_planted_near_dups(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    )
    diff = (
        docs.select("doc_id", DD.shingles_col().alias("sh")).alias("o")
        .join(DD.shingled(docs).alias("n"), "doc_id")
        .filter(F.expr("NOT (o.sh <=> n.sh)"))
        .count()
    )
    assert diff == 0


def test_neardup_keepers_clusters_and_singletons(spark):
    """Keeper = min id of the pair-graph component, including chains
    where similarity is not pairwise-transitive (10~20, 20~30 but no
    10~30 edge); docs in no pair keep themselves; numeric min (not
    lexical: 9 vs 10 ordering)."""
    from pyspark.sql import functions as F

    from graphlab_spark.operators.dedup import neardup_keepers

    docs = spark.createDataFrame([(i,) for i in (9, 10, 20, 30, 77)], "doc_id long")
    pairs = spark.createDataFrame([(10, 20), (20, 30)], "a long, b long")
    got = {r.doc_id: r.keeper for r in neardup_keepers(docs, pairs).collect()}
    assert got == {9: 9, 10: 10, 20: 10, 30: 10, 77: 77}


def test_contaminated_docs_flags_only_overlaps(spark):
    from pyspark.sql import functions as F

    from graphlab_spark.operators.dedup import contaminated_docs

    long_a = " ".join(f"w{i}" for i in range(30))
    long_b = " ".join(f"x{i}" for i in range(30))
    bench = spark.createDataFrame([(1, long_a)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (100, long_a + " extra tail tokens"),  # shares 13-grams → flagged
            (101, long_b),                          # disjoint → clean
            (102, " ".join(f"w{i}" for i in range(12))),  # too short to share a 13-gram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_hits for r in contaminated_docs(corpus, bench, n=13).collect()}
    assert set(got) == {100}
    assert got[100] == 18  # 30-token doc shares all 18 of bench's 13-grams


def test_line_dedup_keeper_and_guards(spark):
    """Cross-doc line dedup: duplicated eligible lines removed except
    the globally-smallest (doc_id, line_no) keeper; short lines never
    touched; within-doc repeats count too."""
    from graphlab_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha unique first line\nshared boilerplate line here\nshort"),
            (2, "beta unique line two\nshared boilerplate line here"),
            (3, "gamma\nshared boilerplate line here"),
            # same eligible line twice WITHIN one doc → second instance dropped
            (4, "repeat me exactly now\nrepeat me exactly now"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert got[1].clean_text == "alpha unique first line\nshared boilerplate line here\nshort"
    assert (got[1].n_removed, got[1].n_kept) == (0, 3)
    assert got[2].clean_text == "beta unique line two"
    assert (got[2].n_removed, got[2].n_kept) == (1, 1)
    assert got[3].clean_text == "gamma"  # 'gamma' is short → untouched
    assert got[4].clean_text == "repeat me exactly now"
    assert (got[4].n_removed, got[4].n_kept) == (1, 1)

    # min_count=4: no line occurs 4x → nothing removed anywhere
    got4 = {r.doc_id: r for r in line_dedup(docs, min_count=4).collect()}
    assert all(r.n_removed == 0 for r in got4.values())
    # min_count=3: the 3x shared line goes, the 2x within-doc repeat stays
    got3 = {r.doc_id: r for r in line_dedup(docs, min_count=3).collect()}
    assert got3[2].n_removed == 1 and got3[4].n_removed == 0


def test_mulmod61_exact_vs_bigint():
    """r4 ADVICE: the minhash permutation multiply must be exact mod
    2^61-1 — numpy int64 naive (h*a) wraps mod 2^64 first, silently
    leaving the claimed universal-hash family."""
    import numpy as np

    from graphlab_spark.operators.dedup import _MERSENNE, _mulmod61

    rng = np.random.RandomState(11)
    x = rng.randint(0, _MERSENNE, size=512, dtype=np.int64)
    y = rng.randint(0, _MERSENNE, size=512, dtype=np.int64)
    got = _mulmod61(x, y)
    exp = np.array(
        [(int(a) * int(b)) % _MERSENNE for a, b in zip(x, y)], dtype=np.int64
    )
    assert (got == exp).all()
    for a in (0, 1, _MERSENNE - 1, (1 << 60) + 12345):
        for b in (0, 1, _MERSENNE - 1, (1 << 60) + 999):
            g = int(_mulmod61(np.array([a]), np.array([b]))[0])
            assert g == (a * b) % _MERSENNE, (a, b, g)


def test_permute_min31_exact_vs_bigint():
    """r6: the 31-bit permutation family (document-dedup path) must be
    exact — with a, b, h < 2^31-1 every a*h + b stays below 2^62, so
    one int64 multiply + one mod is overflow-free. Pin it against
    Python bigint arithmetic so a future constant change (wider family,
    bigger seed range) can't silently reintroduce the r5 wrap bug."""
    import numpy as np

    from graphlab_spark.operators.dedup import (
        _HASH_A31,
        _HASH_B31,
        _MERSENNE31,
        _permute_min31,
    )

    assert int(_HASH_A31.max()) < _MERSENNE31 and int(_HASH_B31.max()) < _MERSENNE31
    rng = np.random.RandomState(17)
    for size in (1, 7, 257):
        hv = rng.randint(0, _MERSENNE31, size=size, dtype=np.int64)
        got = _permute_min31(hv)
        exp = [
            min(
                (int(h) * int(a) + int(b)) % _MERSENNE31
                for h in hv
            )
            for a, b in zip(_HASH_A31, _HASH_B31)
        ]
        assert got == exp
    # boundary values: the largest representable inputs cannot overflow
    edge = np.array([_MERSENNE31 - 1, 0, 1], dtype=np.int64)
    got = _permute_min31(edge)
    exp = [
        min((int(h) * int(a) + int(b)) % _MERSENNE31 for h in edge)
        for a, b in zip(_HASH_A31, _HASH_B31)
    ]
    assert got == exp
