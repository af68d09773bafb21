"""Structured-Streaming ingest: micro-batched increments produce the same
graph as one batch run, and replays stay idempotent (effectively-once)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graphlab_spark.sources import corpus
from graphlab_spark.streaming.ingest import read_pages_stream, start_ingest

N = 120


def _drop_increment(spark, path: str, lo: int, hi: int) -> None:
    """Write pages [lo, hi) as one parquet drop (a finished crawl job)."""
    import pandas as pd

    rows = [corpus.page_record(i) for i in range(lo, hi)]
    spark.createDataFrame(pd.DataFrame(rows), corpus.PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_increments_match_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    aliases = corpus.alias_df(spark)

    # two increments land before the run; maxFilesPerTrigger=1 forces
    # one micro-batch per increment so the cross-batch COMBINE path
    # (counts add, sets union) is genuinely exercised — asserted via the
    # applied-batch markers
    _drop_increment(spark, in_dir, 0, 60)
    _drop_increment(spark, in_dir, 60, N)
    q = start_ingest(
        spark, read_pages_stream(spark, in_dir, max_files_per_trigger=1),
        aliases, out_dir, ckpt,
    )
    q.awaitTermination(300)
    assert sorted(os.listdir(os.path.join(ckpt, "applied_batches"))) == ["0", "1"]

    nodes = spark.read.parquet(f"{out_dir}/nodes")
    edges = spark.read.parquet(f"{out_dir}/edges")
    assert nodes.count() > 0 and edges.count() > 0
    # every edge endpoint resolves to a node or a known canonical id
    ids = {r.id for r in nodes.select("id").collect()}
    for r in edges.select("src", "dst").limit(50).collect():
        assert r.src in ids and r.dst in ids

    # batch reference over the same pages: with cumulative combine-MERGE
    # the FULL rows must match — counts, bounded evidence, weights,
    # alias sets — not just the key sets. (Increments were split on
    # page-id; this fixture's duplicate urls always pair page i with i-1
    # inside the same increment, so per-url dedup sees them together.)
    from graphlab_spark.plans.pipeline import run_pipeline_in_memory

    def edge_rows(df):
        return {
            tuple(r)
            for r in df.select(
                "src", "pred", "dst", "n_evidence",
                F.col("evidence").cast("string"), F.round("weight", 6),
            ).collect()
        }

    def node_rows(df):
        return {
            tuple(r)
            for r in df.select(
                "id", "canonical_name", "entity_type",
                F.col("aliases").cast("string"), "n_mentions",
            ).collect()
        }

    batch = run_pipeline_in_memory(spark, corpus.generate_pages(spark, N), aliases)
    assert edge_rows(edges) == edge_rows(batch["edges"])
    assert node_rows(nodes) == node_rows(batch["nodes"])

    # replay: rerunning the stream with the same checkpoint processes
    # nothing new and leaves the tables unchanged (effectively-once —
    # cumulative merges are gated by the applied-batch markers)
    before = sorted(tuple(r) for r in edges.collect())
    q2 = start_ingest(
        spark, read_pages_stream(spark, in_dir, max_files_per_trigger=1),
        aliases, out_dir, ckpt,
    )
    q2.awaitTermination(120)
    after = sorted(tuple(r) for r in spark.read.parquet(f"{out_dir}/edges").collect())
    assert before == after

    # a FRESH checkpoint against the existing tables must refuse (it
    # would re-combine all history → double counts)
    import pytest

    q3 = start_ingest(
        spark, read_pages_stream(spark, in_dir), aliases, out_dir,
        str(tmp_path / "ckpt_fresh"),
    )
    with pytest.raises(Exception, match="double"):
        q3.awaitTermination(120)


def test_streaming_reclaims_scratch_per_batch(spark, tmp_path):
    """Continuous ingest must not accumulate per-batch scratch parquet."""
    import glob

    from graphlab_spark.operators.scratch import scratch_dir

    in_dir = str(tmp_path / "in2")
    os.makedirs(in_dir)
    _drop_increment(spark, in_dir, 0, 40)
    q = start_ingest(
        spark, read_pages_stream(spark, in_dir), corpus.alias_df(spark),
        str(tmp_path / "out2"), str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(180)
    leftovers = glob.glob(f"{scratch_dir()}/stream_*")
    assert leftovers == [], leftovers


def test_bridge_surface_across_increments(spark, tmp_path):
    """r2 advice: an UNK surface whose merge partner lands in a DIFFERENT
    increment must still canonicalize to the one-shot entity. The old
    per-batch entity map split such entities (batch 2 never saw batch 1's
    vocabulary); the stats+rebuild path canonicalizes over the
    ACCUMULATED vocabulary, so incremental ≡ one-shot exactly."""
    import datetime as dt

    import pandas as pd

    in_dir = str(tmp_path / "in_br")
    out_dir = str(tmp_path / "out_br")
    ckpt = str(tmp_path / "ckpt_br")
    os.makedirs(in_dir)
    aliases = corpus.alias_df(spark)
    epoch = dt.datetime(2024, 1, 1)

    def _page(i, body):
        return {
            "url": f"https://example.org/bridge/{i}",
            "warc_ts": epoch + dt.timedelta(seconds=i),
            "html": f"<html><body><p>{body}</p></body></html>".encode(),
            "text": None,
            "lang": "en",
        }

    # increment 1: surface "Quantumflux Research Labs" (UNK);
    # increment 2: surface "Quantumflux Research Lab" (UNK) — char-gram
    # Jaccard distance ≈ 0.04 « 0.28, so one-shot merges them into the
    # lexically-smaller unk: entity. Batch-local canonicalization can't.
    inc1 = [_page(1, "Quantumflux Research Labs announced a partnership today.")]
    inc2 = [_page(2, "Quantumflux Research Lab published new results yesterday.")]
    for k, inc in enumerate([inc1, inc2]):
        spark.createDataFrame(pd.DataFrame(inc), corpus.PAGES_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    q = start_ingest(
        spark, read_pages_stream(spark, in_dir, max_files_per_trigger=1),
        aliases, out_dir, ckpt,
    )
    q.awaitTermination(300)
    assert sorted(os.listdir(os.path.join(ckpt, "applied_batches"))) == ["0", "1"]

    nodes = spark.read.parquet(f"{out_dir}/nodes")
    got = {
        (r.id, tuple(r.aliases), r.n_mentions)
        for r in nodes.filter(F.col("id").startswith("unk:quantumflux")).collect()
    }
    # one-shot reference over the union of both increments
    from graphlab_spark.plans.pipeline import run_pipeline_in_memory

    pages = spark.createDataFrame(pd.DataFrame(inc1 + inc2), corpus.PAGES_SCHEMA)
    batch = run_pipeline_in_memory(spark, pages, aliases)
    want = {
        (r.id, tuple(r.aliases), r.n_mentions)
        for r in batch["nodes"].filter(
            F.col("id").startswith("unk:quantumflux")
        ).collect()
    }
    assert got == want
    assert len(got) == 1  # merged into ONE entity (the bridge held)
    (_, aliases_got, n_mentions) = next(iter(got))
    assert set(aliases_got) == {
        "Quantumflux Research Labs", "Quantumflux Research Lab"
    }
    assert n_mentions == 2


def test_stats_rebuild_equals_one_shot_for_any_split(spark):
    """Algebraic pin for the drift-free ingest: for ANY k-way split of
    the mention/triple streams, combining per-part SURFACE stats and
    rebuilding via nodes_from_stats/edges_from_stats equals build_nodes/
    build_edges over the whole stream (same entity map). This is the
    associativity property the streaming commit relies on, tested
    without the streaming machinery."""
    from graphlab_spark.operators import materialize as M

    mrows = [
        (f"u{i}", f"S{i % 7}", "ORG" if i % 3 else "UNK", 0.5)
        for i in range(60)
    ]
    trows = [
        (f"S{i % 7}", f"p{i % 4}", f"S{(i + 2) % 7}", f"u{i}", 0.25 + (i % 3) / 10)
        for i in range(60)
    ]
    mentions = spark.createDataFrame(
        mrows, "url string, surface string, m_type string, conf double"
    )
    triples = spark.createDataFrame(
        trows, "subj string, pred string, obj string, url string, conf double"
    )
    emap = spark.createDataFrame(
        [(f"S{k}", f"ent:{k % 4}") for k in range(7)],  # several surfaces per entity
        "surface string, entity_id string",
    )

    def _norm(v):
        if isinstance(v, list):
            return tuple(v)
        if isinstance(v, float):
            return round(v, 6)  # float sums are order-dependent (IEEE)
        return v

    def _rows(df):
        return {tuple(_norm(v) for v in r) for r in df.collect()}

    one_shot_nodes = _rows(
        M.build_nodes(
            mentions.join(emap, "surface").selectExpr(
                "entity_id as canonical_id", "surface", "m_type"
            )
        )
    )
    t = (
        triples.join(emap.withColumnRenamed("surface", "subj"), "subj")
        .withColumnRenamed("entity_id", "subj_id")
        .join(emap.withColumnRenamed("surface", "obj"), "obj")
        .withColumnRenamed("entity_id", "obj_id")
    )
    one_shot_edges = _rows(
        M.build_edges(t.select("subj_id", "pred", "obj_id", "url", "conf"))
    )

    for k in (1, 2, 5):
        # combine per-part stats with the SAME algebra the committer uses
        parts_m = [
            M.mention_stats_frame(mentions.filter(F.col("url").substr(2, 9).cast("int") % k == j))
            for j in range(k)
        ]
        parts_t = [
            M.triple_stats_frame(triples.filter(F.col("url").substr(2, 9).cast("int") % k == j))
            for j in range(k)
        ]

        def _combine(parts, keys, combine):
            acc = parts[0]
            for p in parts[1:]:
                cols = [c for c in acc.columns if c not in keys]
                joined = acc.alias("e").join(p.alias("i"), keys, "full")
                acc = joined.select(
                    *keys,
                    *[
                        F.when(F.col(f"e.{c}").isNull(), F.col(f"i.{c}"))
                        .when(F.col(f"i.{c}").isNull(), F.col(f"e.{c}"))
                        .otherwise(combine[c](F.col(f"e.{c}"), F.col(f"i.{c}")))
                        .alias(c)
                        for c in cols
                    ],
                )
            return acc

        mstats = _combine(parts_m, ["surface", "m_type"], M.MENTION_STATS_COMBINE)
        tstats = _combine(parts_t, ["subj", "pred", "obj"], M.edges_combine())
        got_nodes = _rows(M.nodes_from_stats(mstats, emap))
        got_edges = _rows(M.edges_from_stats(tstats, emap))
        assert got_nodes == one_shot_nodes, f"nodes mismatch at k={k}"
        assert got_edges == one_shot_edges, f"edges mismatch at k={k}"


def test_bridge_surfaces_distributed_vocab_path(spark, tmp_path, monkeypatch):
    """Same cross-increment bridge scenario, but with the driver fast
    path disabled (SPARK_GRAFT_VOCAB_DRIVER_MAX=0) so BOTH the per-batch
    rebuild and the one-shot reference run the fully DISTRIBUTED
    link+canonicalize — the 100 TB path must satisfy the same exact
    incremental ≡ one-shot contract."""
    import datetime as dt

    import pandas as pd

    monkeypatch.setenv("SPARK_GRAFT_VOCAB_DRIVER_MAX", "0")

    in_dir = str(tmp_path / "in_brd")
    out_dir = str(tmp_path / "out_brd")
    ckpt = str(tmp_path / "ckpt_brd")
    os.makedirs(in_dir)
    aliases = corpus.alias_df(spark)
    epoch = dt.datetime(2024, 1, 1)

    def _page(i, body):
        return {
            "url": f"https://example.org/bridged/{i}",
            "warc_ts": epoch + dt.timedelta(seconds=i),
            "html": f"<html><body><p>{body}</p></body></html>".encode(),
            "text": None,
            "lang": "en",
        }

    inc1 = [_page(1, "Quantumflux Research Labs announced a partnership today.")]
    inc2 = [_page(2, "Quantumflux Research Lab published new results yesterday.")]
    for inc in (inc1, inc2):
        spark.createDataFrame(pd.DataFrame(inc), corpus.PAGES_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    q = start_ingest(
        spark, read_pages_stream(spark, in_dir, max_files_per_trigger=1),
        aliases, out_dir, ckpt,
    )
    q.awaitTermination(300)

    nodes = spark.read.parquet(f"{out_dir}/nodes")
    got = {
        (r.id, tuple(r.aliases), r.n_mentions)
        for r in nodes.filter(F.col("id").startswith("unk:quantumflux")).collect()
    }
    from graphlab_spark.plans.pipeline import run_pipeline_in_memory

    pages = spark.createDataFrame(pd.DataFrame(inc1 + inc2), corpus.PAGES_SCHEMA)
    batch = run_pipeline_in_memory(spark, pages, aliases, vocab_driver_max=0)
    want = {
        (r.id, tuple(r.aliases), r.n_mentions)
        for r in batch["nodes"].filter(
            F.col("id").startswith("unk:quantumflux")
        ).collect()
    }
    assert got == want
    assert len(got) == 1  # distributed canonicalization merged the bridge too
