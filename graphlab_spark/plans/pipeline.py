"""End-to-end KG-construction pipeline (the flagship flow).

pages → dedup+extract (C2/C13) → mentions (C3) → triples (C4) →
link surfaces (C5-C7) → canonicalize entities (C8-C9) →
nodes/edges materialize (C10), with per-partition lineage + resume (C12).

Reference parity: this is the declared job DAG ``paper_crawl →
paper_process → entity_extract → vector_embed → kg_upsert``
(``backend/app/models/processing_job.py:17``; ``backend/README.md:95-108``)
re-expressed as Spark stages over a Common-Crawl-style corpus.

Resume contract: every url-keyed stage writes output parquet partitioned
by a STABLE hash bucket of the url (not the physical partition id — so a
run can resume at a different executor count) under dynamic partition
overwrite, then appends `completed` manifest rows per bucket. A rerun
anti-joins completed buckets away and recomputes only the remainder;
reruns of a finished pipeline touch nothing and reproduce identical
output.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphlab_spark.operators import canonicalize as _canon
from graphlab_spark.operators import linking as _linking
from graphlab_spark.operators import materialize as _mat
from graphlab_spark.operators.extract import extract_stage
from graphlab_spark.operators.manifest import Manifest, bucket_of
from graphlab_spark.operators.mentions import build_alias_map, mentions_stage
from graphlab_spark.operators.triples import triples_stage
from graphlab_spark.functions.slug import slugify_udf
from graphlab_spark.operators.linking import norm_key_udf


def _readable(spark: SparkSession, path: str) -> bool:
    """True if ``path`` is a readable parquet table (guards the resume
    fast-path against manifest/output divergence after external deletion)."""
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def run_stage(
    spark: SparkSession,
    manifest: Manifest,
    run_id: str,
    stage: str,
    input_df: DataFrame,
    key_col: str,
    compute_fn: Callable[[DataFrame], DataFrame],
    out_path: str,
) -> DataFrame:
    """Resumable url-keyed stage: compute only pending buckets, overwrite
    exactly those bucket partitions, mark them completed."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if _readable(spark, out_path):
        done = manifest.completed_partitions(run_id, stage)
    else:
        # output vanished (external deletion / partial commit) → recompute all
        done = spark.createDataFrame([], "partition_id int")
    keyed = input_df.withColumn("partition_id", bucket_of(key_col))
    pending = keyed.join(F.broadcast(done), "partition_id", "left_anti")
    if pending.isEmpty():
        return spark.read.parquet(out_path).drop("partition_id")

    in_stats = pending.groupBy("partition_id").agg(F.count(F.lit(1)).alias("rows_in"))
    out_df = compute_fn(pending.drop("partition_id"))
    out_keyed = out_df.withColumn("partition_id", bucket_of(key_col)).localCheckpoint()
    out_keyed.write.partitionBy("partition_id").mode("overwrite").parquet(out_path)

    out_stats = out_keyed.groupBy("partition_id").agg(F.count(F.lit(1)).alias("rows_out"))
    stats = in_stats.join(out_stats, "partition_id", "left").fillna(0, ["rows_out"])
    manifest.record_completed(run_id, stage, stats)
    return spark.read.parquet(out_path).drop("partition_id")


def run_global_stage(
    spark: SparkSession,
    manifest: Manifest,
    run_id: str,
    stage: str,
    compute_fn: Callable[[], DataFrame],
    out_path: str,
) -> DataFrame:
    """Resumable vocabulary-level stage (single logical partition)."""
    done = manifest.completed_partitions(run_id, stage)
    if done.count() > 0 and _readable(spark, out_path):
        return spark.read.parquet(out_path)
    out_df = compute_fn().localCheckpoint()
    out_df.write.mode("overwrite").parquet(out_path)
    n = out_df.count()
    stats = spark.createDataFrame(
        [(0, n, n)], "partition_id int, rows_in long, rows_out long"
    )
    manifest.record_completed(run_id, stage, stats)
    return spark.read.parquet(out_path)


def _new_entity_id(col):
    """Deterministic id for a surface with no alias-dict match."""
    return F.concat(F.lit("unk:"), slugify_udf(norm_key_udf(col)))


def run_pipeline_in_memory(
    spark: SparkSession,
    pages: DataFrame,
    aliases: DataFrame,
    link_threshold: float = _linking.DEFAULT_THRESHOLD,
    jaccard_dist: float = _canon.DEFAULT_JACCARD_DIST,
    stage_timings: dict[str, float] | None = None,
) -> dict[str, DataFrame]:
    """Manifest-free pipeline for query/benchmark use: same stages as
    :func:`run_pipeline`, without the lineage manifest. Stage results are
    materialized as parquet under a scratch dir (tmpfs by default) rather
    than ``localCheckpoint`` — block-manager checkpoints accumulate on the
    driver heap and cause erratic GC stalls over repeated runs, while a
    parquet round-trip is off-heap and predictable. Pass
    ``stage_timings={}`` to record per-stage wall-clock seconds (each
    stage is forced by its materialization, so the split is meaningful)."""
    import tempfile
    import time as _time

    scratch = tempfile.mkdtemp(prefix="glpipe-", dir=os.environ.get(
        "SPARK_GRAFT_SCRATCH", "/dev/shm"))

    def _save(df: DataFrame, name: str) -> DataFrame:
        path = f"{scratch}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    _t = [_time.time()]

    def _mark(name: str) -> None:
        if stage_timings is not None:
            now = _time.time()
            stage_timings[name] = round(now - _t[0], 3)
            _t[0] = now

    alias_map = build_alias_map(r.asDict() for r in aliases.collect())
    # html is dead weight once text is extracted — keep the materialization slim
    docs = _save(extract_stage(pages).select("url", "warc_ts", "lang", "text"), "docs")
    _mark("extract")
    mentions = _save(mentions_stage(spark, docs.select("url", "text"), alias_map), "mentions")
    _mark("mentions")
    triples = _save(triples_stage(docs.select("url", "text", "lang")), "triples")
    _mark("triples")

    # distinct surfaces: checkpointed — every vocabulary stage below
    # consumes it, and re-deriving it re-scans the full mention stream.
    surfaces = _save(
        mentions.select("surface")
        .unionByName(triples.select(F.col("subj").alias("surface")))
        .unionByName(triples.select(F.col("obj").alias("surface")))
        .distinct()
        .coalesce(4),  # vocabulary-sized: stop scheduling 32 tasks per op
        "surfaces",
    )
    _mark("surfaces")
    links = _save(_linking.link_surfaces(spark, surfaces, aliases, link_threshold), "links")
    _mark("links")

    surf_entity = surfaces.join(
        F.broadcast(links.select("surface", "canonical_id")), "surface", "left"
    ).select(
        "surface",
        F.coalesce(F.col("canonical_id"), _new_entity_id(F.col("surface"))).alias("entity_id"),
    )
    known_ents = (
        aliases.filter(F.col("is_primary"))
        .select(
            F.col("canonical_id").alias("entity_id"),
            norm_key_udf(F.col("alias")).alias("surface"),
            F.lit(True).alias("is_known"),
        )
        .dropDuplicates(["entity_id"])
    )
    unk_ents = (
        surf_entity.filter(F.col("entity_id").startswith("unk:"))
        .select(
            "entity_id",
            norm_key_udf(F.col("surface")).alias("surface"),
            F.lit(False).alias("is_known"),
        )
        .dropDuplicates(["entity_id"])
    )
    mapping = _canon.canonicalize_stage(spark, known_ents.unionByName(unk_ents), jaccard_dist)
    entity_map = _save(
        surf_entity.join(mapping, "entity_id")
        .select("surface", F.col("canonical_id").alias("entity_id")),
        "entity_map",
    )
    _mark("canonicalize+entity_map")

    linked_mentions = mentions.join(F.broadcast(entity_map), "surface").select(
        F.col("entity_id").alias("canonical_id"), "surface", "m_type"
    )
    nodes = _mat.build_nodes(linked_mentions)
    em = F.broadcast(entity_map)
    t = (
        triples.join(em.withColumnRenamed("surface", "subj"), "subj")
        .withColumnRenamed("entity_id", "subj_id")
        .join(em.withColumnRenamed("surface", "obj"), "obj")
        .withColumnRenamed("entity_id", "obj_id")
    )
    edges = _mat.build_edges(t.select("subj_id", "pred", "obj_id", "url", "conf"))
    return {
        "docs": docs,
        "mentions": mentions,
        "triples": triples,
        "links": links,
        "entity_map": entity_map,
        "nodes": nodes,
        "edges": edges,
    }


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    aliases: DataFrame,
    out_dir: str,
    run_id: str = "run-1",
    link_threshold: float = _linking.DEFAULT_THRESHOLD,
    jaccard_dist: float = _canon.DEFAULT_JACCARD_DIST,
) -> dict[str, DataFrame]:
    """Full pipeline. Returns the materialized DataFrames per stage."""
    manifest = Manifest(spark, f"{out_dir}/manifest")
    alias_map = build_alias_map(r.asDict() for r in aliases.collect())

    docs = run_stage(
        spark, manifest, run_id, "extract", pages, "url",
        # html is dead weight once text is extracted — persist slim
        lambda d: extract_stage(d).select("url", "warc_ts", "lang", "text"),
        f"{out_dir}/docs",
    )
    mentions = run_stage(
        spark, manifest, run_id, "mentions", docs.select("url", "text"), "url",
        lambda d: mentions_stage(spark, d, alias_map), f"{out_dir}/mentions",
    )
    triples = run_stage(
        spark, manifest, run_id, "triples", docs.select("url", "text", "lang"), "url",
        triples_stage, f"{out_dir}/triples",
    )

    # --- vocabulary-level: link every distinct surface seen anywhere.
    # Checkpointed once, lazily — several stages consume it, but a fully
    # resumed run must not pay for it at all.
    _surf: dict[str, DataFrame] = {}

    def all_surfaces() -> DataFrame:
        if "df" not in _surf:
            _surf["df"] = (
                mentions.select("surface")
                .unionByName(triples.select(F.col("subj").alias("surface")))
                .unionByName(triples.select(F.col("obj").alias("surface")))
                .distinct()
                .localCheckpoint()
            )
        return _surf["df"]

    def _links() -> DataFrame:
        return _linking.link_surfaces(spark, all_surfaces(), aliases, link_threshold)

    links = run_global_stage(spark, manifest, run_id, "linking", _links, f"{out_dir}/links")

    # --- entity set = linked canonical ids + new (unlinked) surfaces.
    # 'unk:' sorts after every known type prefix, so component-min picks
    # the known entity as the canonical survivor.
    def _entity_map() -> DataFrame:
        surf_entity = all_surfaces().join(
            F.broadcast(links.select("surface", "canonical_id")), "surface", "left"
        ).select(
            "surface",
            F.coalesce(F.col("canonical_id"), _new_entity_id(F.col("surface"))).alias("entity_id"),
        )
        # Known entities are represented by their primary alias (the alias
        # dict is authoritative); unknown entities by their observed surface.
        known_ents = (
            aliases.filter(F.col("is_primary"))
            .select(
                F.col("canonical_id").alias("entity_id"),
                norm_key_udf(F.col("alias")).alias("surface"),
                F.lit(True).alias("is_known"),
            )
            .dropDuplicates(["entity_id"])
        )
        unk_ents = (
            surf_entity.filter(F.col("entity_id").startswith("unk:"))
            .select(
                "entity_id",
                norm_key_udf(F.col("surface")).alias("surface"),
                F.lit(False).alias("is_known"),
            )
            .dropDuplicates(["entity_id"])
        )
        mapping = _canon.canonicalize_stage(
            spark, known_ents.unionByName(unk_ents), jaccard_dist
        )
        return surf_entity.join(mapping, "entity_id").select(
            "surface", F.col("canonical_id").alias("entity_id")
        )

    entity_map = run_global_stage(
        spark, manifest, run_id, "canonicalize", _entity_map, f"{out_dir}/entity_map"
    )

    # --- materialize nodes/edges with canonical ids
    def _nodes() -> DataFrame:
        linked_mentions = mentions.join(F.broadcast(entity_map), "surface").select(
            F.col("entity_id").alias("canonical_id"), "surface", "m_type"
        )
        return _mat.build_nodes(linked_mentions)

    def _edges() -> DataFrame:
        em = F.broadcast(entity_map)
        t = (
            triples.join(em.withColumnRenamed("surface", "subj"), "subj")
            .withColumnRenamed("entity_id", "subj_id")
            .join(em.withColumnRenamed("surface", "obj"), "obj")
            .withColumnRenamed("entity_id", "obj_id")
        )
        return _mat.build_edges(t.select("subj_id", "pred", "obj_id", "url", "conf"))

    nodes = run_global_stage(spark, manifest, run_id, "nodes", _nodes, f"{out_dir}/nodes")
    edges = run_global_stage(spark, manifest, run_id, "edges", _edges, f"{out_dir}/edges")

    return {
        "docs": docs,
        "mentions": mentions,
        "triples": triples,
        "links": links,
        "entity_map": entity_map,
        "nodes": nodes,
        "edges": edges,
        "manifest": manifest.read(),
    }
