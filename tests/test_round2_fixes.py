"""Round-2 fixes: fused parse equality, adaptive vocabulary path equality,
deterministic salted join, merge/name guards, manifest input fingerprints."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators.extract import extract_stage
from graphlab_spark.operators.manifest import Manifest
from graphlab_spark.operators.materialize import (
    merge_into_sql,
    merge_upsert,
    validate_output_name,
)
from graphlab_spark.operators.mentions import build_alias_map, mentions_stage
from graphlab_spark.operators.parse import mentions_view, parse_stage, triples_view
from graphlab_spark.operators.skew import salt_col, salted_join
from graphlab_spark.operators.triples import triples_stage
from graphlab_spark.plans.pipeline import run_pipeline_in_memory, run_stage
from graphlab_spark.sources import corpus

N = 200


# ------------------------------------------------ fused parse == unfused

def test_fused_parse_equals_unfused_stages(spark):
    pages = corpus.generate_pages(spark, N)
    aliases = corpus.alias_df(spark)
    alias_map = build_alias_map(r.asDict() for r in aliases.collect())

    parsed = parse_stage(spark, pages, alias_map).localCheckpoint()
    docs = extract_stage(pages).select("url", "warc_ts", "lang", "text").localCheckpoint()

    fused_docs = {tuple(r) for r in parsed.select("url", "text").collect()}
    unfused_docs = {tuple(r) for r in docs.select("url", "text").collect()}
    assert fused_docs == unfused_docs

    fused_m = {tuple(r) for r in mentions_view(parsed).collect()}
    unfused_m = {
        tuple(r) for r in mentions_stage(spark, docs.select("url", "text"), alias_map).collect()
    }
    assert fused_m == unfused_m

    fused_t = {tuple(r) for r in triples_view(parsed).collect()}
    unfused_t = {tuple(r) for r in triples_stage(docs).collect()}
    assert fused_t == unfused_t


# --------------------------------- vocab driver path == distributed path

def test_vocab_driver_path_equals_distributed(spark):
    pages = corpus.generate_pages(spark, N)
    aliases = corpus.alias_df(spark)
    small = run_pipeline_in_memory(spark, pages, aliases, vocab_driver_max=10**6)
    big = run_pipeline_in_memory(spark, pages, aliases, vocab_driver_max=0)

    for key in ["links", "entity_map"]:
        a = {tuple(r) for r in small[key].collect()}
        b = {tuple(r) for r in big[key].collect()}
        assert a == b, f"{key}: driver path diverges from distributed path"
    ea = {tuple(r) for r in small["edges"].select("src", "pred", "dst", "weight").collect()}
    eb = {tuple(r) for r in big["edges"].select("src", "pred", "dst", "weight").collect()}
    assert ea == eb


# ---------------------------------------------------- salted join / salt

def test_salted_join_equals_plain_join(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dim = (
        ev.select("user_id").distinct()
        .withColumn("segment", F.concat(F.lit("seg"), F.pmod(F.col("user_id"), F.lit(5))))
    )
    plain = (
        ev.join(dim, "user_id").groupBy("segment").agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(ev, dim, "user_id").groupBy("segment").agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salt_is_deterministic_across_evaluations(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    salted = ev.withColumn("_salt", salt_col(ev))
    a = salted.groupBy("_salt").count().orderBy("_salt").collect()
    b = salted.groupBy("_salt").count().orderBy("_salt").collect()
    assert a == b
    # and it actually spreads a hot key over several salts
    hot = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    n_salts = (
        salted.filter(F.col("user_id") == hot.user_id).select("_salt").distinct().count()
    )
    assert n_salts > 1


# ----------------------------------------------- B6 guard + MERGE seam

def test_validate_output_name_guard():
    assert validate_output_name("nodes_v2") == "nodes_v2"
    for bad in ["../etc", "a.b", "1abc", "", "x;drop table", "a b", None]:
        with pytest.raises((ValueError, TypeError)):
            validate_output_name(bad)


def test_merge_into_sql_text_and_injection_guard():
    sql = merge_into_sql("kg.nodes", "updates", ["id"], ["id", "name", "n"])
    assert sql == (
        "MERGE INTO kg.nodes t USING updates s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET t.name = s.name, t.n = s.n "
        "WHEN NOT MATCHED THEN INSERT (id, name, n) VALUES (s.id, s.name, s.n)"
    )
    with pytest.raises(ValueError):
        merge_into_sql("kg.nodes; DROP TABLE x", "updates", ["id"], ["id"])
    with pytest.raises(ValueError):
        merge_into_sql("kg.nodes", "updates", ["id"], ["id", "name--"])


def test_merge_upsert_rejects_invalid_table_name(spark, tmp_path):
    df = spark.range(3).select(F.col("id"), F.lit("x").alias("v"))
    with pytest.raises(ValueError):
        merge_upsert(spark, str(tmp_path / "bad name!"), df, ["id"])


def test_merge_upsert_raises_on_corrupt_table_instead_of_overwriting(spark, tmp_path):
    """A transient/corrupt read must NOT be treated as first-write (which
    would silently replace the table with only the updates)."""
    path = str(tmp_path / "tbl")
    os.makedirs(path)
    with open(f"{path}/part-00000.parquet", "wb") as f:
        f.write(b"this is not parquet")
    updates = spark.range(3).select(F.col("id"), F.lit("u").alias("v"))
    with pytest.raises(Exception):
        merge_upsert(spark, path, updates, ["id"])
    # the corrupt table was left in place, not overwritten
    with open(f"{path}/part-00000.parquet", "rb") as f:
        assert f.read() == b"this is not parquet"


# ------------------------------------- manifest input fingerprint (C12)

def _mini_pages(spark, n, text):
    return spark.createDataFrame(
        [(f"u{i}", i) for i in range(n)], "url string, ts long"
    ).select(
        "url",
        F.timestamp_seconds("ts").alias("warc_ts"),
        F.encode(F.lit(f"<p>{text}</p>"), "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )


def test_resume_recomputes_when_input_changed(spark, tmp_path):
    out = str(tmp_path / "fp")
    manifest = Manifest(spark, f"{out}/manifest")
    fn = lambda d: extract_stage(d).select("url", "warc_ts", "lang", "text")  # noqa: E731

    r1 = run_stage(
        spark, manifest, "r", "extract", _mini_pages(spark, 40, "Old text."),
        "url", fn, f"{out}/docs", fp_cols=["url", "html"],
    )
    assert r1.filter(F.col("text") == "Old text.").count() == 40
    # same run_id + out_dir, DIFFERENT input → fingerprints mismatch →
    # buckets recompute; output reflects the NEW input, never stale rows
    r2 = run_stage(
        spark, manifest, "r", "extract", _mini_pages(spark, 40, "New text."),
        "url", fn, f"{out}/docs", fp_cols=["url", "html"],
    )
    assert r2.filter(F.col("text") == "New text.").count() == 40
    assert r2.filter(F.col("text") == "Old text.").count() == 0


def test_resume_skips_when_input_unchanged(spark, tmp_path):
    out = str(tmp_path / "fp2")
    manifest = Manifest(spark, f"{out}/manifest")
    calls = {"n": 0}

    def fn(d):
        calls["n"] += 1
        return extract_stage(d).select("url", "warc_ts", "lang", "text")

    run_stage(spark, manifest, "r", "e", _mini_pages(spark, 40, "T."), "url", fn,
              f"{out}/docs", fp_cols=["url", "html"])
    assert calls["n"] == 1
    run_stage(spark, manifest, "r", "e", _mini_pages(spark, 40, "T."), "url", fn,
              f"{out}/docs", fp_cols=["url", "html"])
    assert calls["n"] == 1, "unchanged input must not recompute"


# ------------------------------------- fast-path candidate budget guard

def test_fastpath_overflow_raises_fast_on_clustered_vocab():
    """Near-identical strings cluster into the same LSH buckets, making
    driver-side pair enumeration O(n²). The budget guard must trip BEFORE
    enumerating (projected-count check), not after minutes of work."""
    import time

    import pytest as _pytest

    from graphlab_spark.operators.canonicalize import FastPathOverflow, canonicalize_small

    ents = [(f"unk:e{i}", f"entity number {i} corp", False) for i in range(4000)]
    t0 = time.time()
    with _pytest.raises(FastPathOverflow):
        canonicalize_small(ents, max_candidates=100_000)
    assert time.time() - t0 < 30, "guard must trip before the O(n²) loop runs"


def test_pipeline_falls_back_to_distributed_on_overflow(spark, monkeypatch):
    import graphlab_spark.operators.canonicalize as C

    monkeypatch.setattr(C, "FASTPATH_MAX_CANDIDATES", 1)
    pages = corpus.generate_pages(spark, 100)
    aliases = corpus.alias_df(spark)
    res = run_pipeline_in_memory(spark, pages, aliases, vocab_driver_max=10**6)
    assert res["edges"].count() > 0  # distributed fallback produced the graph


# ------------------------------ determinism across parallelism levels

def test_pipeline_output_invariant_to_shuffle_partitions(spark):
    """The north rule requires the same output at N and 4N executors —
    pinned here by running the pipeline under different shuffle
    parallelism and comparing the full edge set (ids, weights, counts)."""
    pages = corpus.generate_pages(spark, 150)
    aliases = corpus.alias_df(spark)
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = run_pipeline_in_memory(spark, pages, aliases)
        ea = {tuple(r) for r in a["edges"].select("src", "pred", "dst", "n_evidence", "weight").collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = run_pipeline_in_memory(spark, pages, aliases)
        eb = {tuple(r) for r in b["edges"].select("src", "pred", "dst", "n_evidence", "weight").collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert ea == eb


def test_khop_matches_python_bfs(spark):
    """k_hop_neighbors against a driver-side BFS over the same edge set."""
    from graphlab_spark.operators.graph_query import k_hop_neighbors

    edges = spark.createDataFrame(
        [("a", "x", "b"), ("b", "x", "c"), ("c", "x", "d"), ("e", "x", "a"), ("f", "x", "g")],
        "src string, pred string, dst string",
    )
    got = {(r.id, r.hop) for r in k_hop_neighbors(edges, "a", k=2).collect()}
    assert got == {("b", 1), ("e", 1), ("c", 2)}


def test_alias_collect_ceiling_raises(spark):
    """The driver-resident alias dictionary has a hard row ceiling — a
    vocabulary-sized table must fail loudly, not be collected silently."""
    from graphlab_spark.operators.linking import collect_alias_rows

    big = spark.range(50).selectExpr("cast(id as string) AS alias")
    with pytest.raises(ValueError):
        collect_alias_rows(big, max_rows=10)
    assert len(collect_alias_rows(big, max_rows=100)) == 50


# ----------------------------- review findings (round-2 self-review)

def test_gate_keeps_punctuated_aliases():
    """Aliases whose first word carries punctuation ('j. smith',
    'acme, inc') must still match through the first-token gate."""
    from graphlab_spark.operators.mentions import find_mentions

    amap = {
        "j. smith": ("p:js", "PERSON"),
        "acme, inc": ("o:ai", "ORG"),
        "acme systems": ("o:as", "ORG"),
    }
    text = "Yesterday J. Smith met with Acme, Inc about Acme Systems."
    got = {(m["surface"], m["m_type"]) for m in find_mentions(text, amap)}
    assert ("J. Smith", "PERSON") in got
    assert ("Acme, Inc", "ORG") in got
    assert ("Acme Systems", "ORG") in got


def test_global_stages_recompute_when_upstream_input_changed(spark, tmp_path):
    """Changing the corpus under the same run_id must flow through to the
    FINAL graph tables — global stages key on the transitive fingerprint
    of upstream manifest rows, not mere existence of a completed row."""
    from graphlab_spark.plans.pipeline import run_pipeline

    out = str(tmp_path / "gfp")
    aliases = corpus.alias_df(spark)
    r1 = run_pipeline(spark, corpus.generate_pages(spark, 80), aliases, out, run_id="r")
    e1 = {tuple(r) for r in r1["edges"].select("src", "pred", "dst").collect()}
    # different input, SAME run_id/out_dir: more pages → more edges
    r2 = run_pipeline(spark, corpus.generate_pages(spark, 140), aliases, out, run_id="r")
    e2 = {tuple(r) for r in r2["edges"].select("src", "pred", "dst").collect()}
    fresh = run_pipeline(
        spark, corpus.generate_pages(spark, 140), aliases, str(tmp_path / "fresh")
    )
    ef = {tuple(r) for r in fresh["edges"].select("src", "pred", "dst").collect()}
    assert e2 == ef, "resumed-with-changed-input edges must equal a fresh run"
    assert e2 != e1


def test_bucket_revert_recomputes(spark, tmp_path):
    """X → X' → X again under one run_id: the append-only manifest holds a
    historical fingerprint for X, but only the LATEST row counts — the
    final output must reflect X, not the X'-derived parquet."""
    out = str(tmp_path / "revert")
    manifest = Manifest(spark, f"{out}/manifest")
    fn = lambda d: extract_stage(d).select("url", "warc_ts", "lang", "text")  # noqa: E731
    for text in ["Version A.", "Version B.", "Version A."]:
        r = run_stage(
            spark, manifest, "r", "e", _mini_pages(spark, 30, text), "url", fn,
            f"{out}/docs", fp_cols=["url", "html"],
        )
    assert r.filter(F.col("text") == "Version A.").count() == 30
    assert r.filter(F.col("text") == "Version B.").count() == 0


def test_merge_into_sql_edge_cases():
    # key-only table: no UPDATE clause, insert-if-absent only
    sql = merge_into_sql("t", "s", ["id"], ["id"])
    assert "UPDATE" not in sql and "WHEN NOT MATCHED THEN INSERT (id)" in sql
    # keys omitted from columns must still be inserted
    sql = merge_into_sql("t", "s", ["id"], ["val"])
    assert "INSERT (id, val) VALUES (s.id, s.val)" in sql
    with pytest.raises(ValueError):
        merge_into_sql("t", "s", [], ["val"])


def test_upsert_tolerates_column_order(spark):
    from graphlab_spark.operators.keywords import upsert_keywords_non_null

    existing = spark.createDataFrame(
        [("s", "a", 0.5, "user")], "session_id string, term string, weight double, source string"
    )
    incoming = spark.createDataFrame(
        [("s", "a", "ai", None)], "session_id string, term string, source string, weight double"
    )
    out = upsert_keywords_non_null(existing, incoming).collect()[0]
    assert out.weight == 0.5 and out.source == "ai"


def test_merge_upsert_combine_semantics(spark, tmp_path):
    """Matched rows combine per-column; one-sided rows pass through; a
    missing combiner is an explicit error (not silent replacement)."""
    from graphlab_spark.operators.materialize import merge_upsert_combine

    path = str(tmp_path / "cmb")
    base = spark.createDataFrame(
        [("a", 2, ["u1"]), ("b", 5, ["u2"])], "k string, n long, s array<string>"
    )
    upd = spark.createDataFrame(
        [("a", 3, ["u3"]), ("c", 1, ["u4"])], "k string, n long, s array<string>"
    )
    combine = {
        "n": lambda e, i: e + i,
        "s": lambda e, i: F.array_sort(F.array_union(e, i)),
    }
    merge_upsert_combine(spark, path, base, ["k"], combine)
    out = merge_upsert_combine(spark, path, upd, ["k"], combine)
    got = {r.k: (r.n, list(r.s)) for r in out.collect()}
    assert got == {"a": (5, ["u1", "u3"]), "b": (5, ["u2"]), "c": (1, ["u4"])}

    with pytest.raises(ValueError, match="combiner"):
        merge_upsert_combine(spark, path, upd, ["k"], {"n": lambda e, i: e + i})
