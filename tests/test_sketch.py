"""Count-Min sketch: one-sided error, exactness without collisions,
counter-wise mergeability (the distributed property), bounded state,
and the broadcast probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark.operators.sketch import cms_build, cms_estimate, cms_merge


def _vals(spark, words):
    return spark.createDataFrame([(w,) for w in words], "value string")


def test_cms_never_undercounts_and_is_exact_when_sparse(spark):
    words = ["a"] * 5 + ["b"] * 3 + ["c"]
    sk = cms_build(_vals(spark, words), depth=3, width=1024)
    probes = _vals(spark, ["a", "b", "c", "never-seen"])
    got = {r.value: r.est for r in cms_estimate(sk, probes).collect()}
    true = {"a": 5, "b": 3, "c": 1, "never-seen": 0}
    for k, t in true.items():
        assert got[k] >= t  # one-sided: never undercounts
    # 3 distinct keys in 3×1024 cells: collisions are (md5-)impossible
    # to all collide across every row — min recovers the exact count
    assert got == true


def test_cms_merge_equals_union(spark):
    a = ["x"] * 4 + ["y"]
    b = ["x"] * 2 + ["z"] * 7
    sk_union = cms_build(_vals(spark, a + b), depth=3, width=64)
    sk_merged = cms_merge(
        cms_build(_vals(spark, a), depth=3, width=64),
        cms_build(_vals(spark, b), depth=3, width=64),
    )
    u = {(r.row, r.bucket): r.cnt for r in sk_union.collect()}
    m = {(r.row, r.bucket): r.cnt for r in sk_merged.collect()}
    assert u == m  # sketch(A ∪ B) == merge(sketch(A), sketch(B))


def test_cms_state_is_bounded(spark):
    # 10k distinct keys, width 32: the sketch can never exceed d×w rows
    vals = spark.range(10_000).select(F.col("id").cast("string").alias("value"))
    sk = cms_build(vals, depth=3, width=32)
    assert sk.count() <= 3 * 32


def test_cms_probe_plan_broadcasts(spark):
    vals = spark.range(1000).select(F.col("id").cast("string").alias("value"))
    sk = cms_build(vals, depth=3, width=64)
    probes = _vals(spark, ["1", "2"])
    plan = (
        cms_estimate(sk, probes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_no_false_negatives_and_merge(spark):
    from graphlab_spark.operators.sketch import bloom_build, bloom_probe

    mem = _vals(spark, [f"url-{i}" for i in range(200)])
    bloom = bloom_build(mem, n_hashes=4, n_bits=8192)
    assert bloom.count() <= 8192
    got = {
        r.value: r.maybe_present
        for r in bloom_probe(bloom, mem, n_hashes=4, n_bits=8192).collect()
    }
    assert all(got.values())  # every member reads present — always

    # merge = union-distinct of bit tables ≡ building over the union
    a = _vals(spark, ["p", "q"])
    b = _vals(spark, ["q", "r"])
    merged = bloom_build(a).unionByName(bloom_build(b)).distinct()
    full = bloom_build(_vals(spark, ["p", "q", "r"]))
    assert {r.bit for r in merged.collect()} == {r.bit for r in full.collect()}


def test_bloom_rejects_most_non_members(spark):
    from graphlab_spark.operators.sketch import bloom_build, bloom_probe

    mem = _vals(spark, [f"url-{i}" for i in range(100)])
    bloom = bloom_build(mem, n_hashes=4, n_bits=8192)
    alien = _vals(spark, [f"other-{i}" for i in range(200)])
    got = [r.maybe_present for r in bloom_probe(bloom, alien).collect()]
    # fp rate at k=4, n=100, m=8192 is ~1e-5 — 200 probes: expect 0 hits
    assert sum(got) == 0


def test_hll_registers_merge_and_estimate(spark):
    from graphlab_spark.operators.sketch import hll_build, hll_estimate, hll_merge

    a = _vals(spark, [f"u{i}" for i in range(3000)])
    b = _vals(spark, [f"u{i}" for i in range(1500, 4500)])  # 1500 overlap
    sk_a, sk_b = hll_build(a), hll_build(b)
    merged = hll_merge(sk_a, sk_b)
    full = hll_build(a.unionByName(b))
    assert {(r.bucket, r.reg) for r in merged.collect()} == {
        (r.bucket, r.reg) for r in full.collect()
    }
    # estimate within the canonical ~1.04/sqrt(m) band (p=12 → ~1.6%);
    # allow 4 sigma
    est = hll_estimate(merged)
    assert abs(est - 4500) / 4500 < 0.065
    # duplicate-insensitive: rebuilding over the same keys twice is a
    # no-op on the registers
    dup = hll_build(a.unionByName(a))
    assert {(r.bucket, r.reg) for r in dup.collect()} == {
        (r.bucket, r.reg) for r in hll_build(a).collect()
    }


def test_hll_state_bound(spark):
    from graphlab_spark.operators.sketch import hll_build

    vals = spark.range(50_000).select(F.col("id").cast("string").alias("value"))
    assert hll_build(vals, p=8).count() <= 256


# ----------------------------------------------------------- HDR histogram


def test_hdr_quantile_within_relative_error(spark):
    """Readout is within a factor 1/s of the exact percentile (below it
    by construction — the bin LOWER bound), on a wide log-range."""
    import numpy as np

    from graphlab_spark.operators.sketch import hdr_build, hdr_quantiles

    vals = [int(x) for x in np.random.RandomState(3).lognormal(6, 1.5, 5000)]
    vals = [max(v, 1) for v in vals]
    df = spark.createDataFrame([(v,) for v in vals], "value long")
    got = {
        (r.q_num, r.q_den): r.value
        for r in hdr_quantiles(hdr_build(df, s=16)).collect()
    }
    for num, den in [(1, 2), (9, 10), (99, 100)]:
        k = -(-len(vals) * num // den)  # ceil rank
        exact = sorted(vals)[k - 1]
        est = got[(num, den)]
        assert est <= exact, (num, den, est, exact)
        # lower bound of the bin containing the exact value: within 1/s
        # of it, plus one bin of slack at octave edges
        assert est >= exact / (1 + 2 / 16) - 1, (num, den, est, exact)


def test_hdr_merge_equals_oneshot(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — counters add."""
    from graphlab_spark.operators.sketch import hdr_build, hdr_merge

    a = spark.createDataFrame([(v,) for v in range(1, 800)], "value long")
    b = spark.createDataFrame([(v,) for v in range(400, 1200)], "value long")
    merged = {
        r.bin: r.cnt
        for r in hdr_merge(hdr_build(a), hdr_build(b)).collect()
    }
    oneshot = {
        r.bin: r.cnt
        for r in hdr_build(a.unionByName(b)).collect()
    }
    assert merged == oneshot


def test_hdr_state_bounded_and_partial_agg(spark):
    from graphlab_spark.operators.sketch import hdr_build

    df = spark.createDataFrame(
        [(i % 50000 + 1,) for i in range(100_000)], "value long"
    )
    h = hdr_build(df, s=16)
    assert h.count() <= 40 * 16  # bins, regardless of cardinality
    plan = h._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "partial_count" in plan and "EvalPython" not in plan
