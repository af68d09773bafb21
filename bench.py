"""Benchmark harness. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set:
- kg_pipeline      — full KG construction (extract → triples → link →
                     canonicalize → nodes/edges) over a synthetic corpus
                     sized to the SF; also reports docs/sec + triples/sec
                     (the BASELINE.json metric).
- tpch q1/q3/q5    — scan/agg, join+topk, multi-join star.
- dedup_minhash    — MinHash-LSH near-dup over the documents table
                     (planted near-dups, unbounded).
- dedup_exact      — fingerprint groupBy.
- ann_bruteforce   — cosine top-k, 50 queries.
- text_stats       — token/quality/lang/fingerprint single-pass.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PAGES overrides corpus size,
     SPARK_GRAFT_BENCH_REPS (default 2) — per-query repetitions, MIN
     reported: host steal-time on this sandbox fluctuates ~2x minute to
     minute (BENCH/BASELINE.md), so the quiet-window wall is the signal.
     Every timed region is read-only, so repetition is side-effect-free.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from graphlab_spark.session import get_spark  # noqa: E402


def _count(df) -> int:
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", str(max(300, int(sf * 200_000)))))

    # reclaim only DEAD sessions' scratch roots — never a live
    # concurrent session's pinned frames (see operators/scratch.py)
    from graphlab_spark.operators.scratch import reclaim_dead_roots

    reclaim_dead_roots()

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    from graphlab_spark.operators import ann as ANN
    from graphlab_spark.operators import dedup as DD
    from graphlab_spark.operators.extract import extract_stage
    from graphlab_spark.operators.triples import triples_stage
    from graphlab_spark.plans import event_queries  # noqa: F401  (fills REGISTRY)
    from graphlab_spark.plans import training_queries  # noqa: F401  (t25 et al.)
    from graphlab_spark.plans.pipeline import run_pipeline_in_memory
    from graphlab_spark.plans.relational import REGISTRY
    from graphlab_spark.functions import textstats as TS
    from graphlab_spark.sources import corpus

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    def timed(name, fn):
        best = None
        out = None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            w = time.time() - t0
            best = w if best is None or w < best else best
        timings[name] = round(best, 3)
        return out

    # Untimed warm-up at full size: the first heavy job in a fresh JVM
    # pays one-off JIT/codegen/heap-growth cost (SURVEY §8 — up to 10x);
    # without this the first timed query absorbs it and round-over-round
    # per-query numbers measure JVM state, not the plan. (Added r02: r01's
    # q1 line included warm-up.)
    _count(REGISTRY["tpch_q1_pricing_summary"].fn(spark, sf_dir))

    # --- relational headliners
    for name in ["tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
                 "tpch_q5_local_supplier_volume"]:
        timed(name, lambda n=name: _count(REGISTRY[n].fn(spark, sf_dir)))

    # --- event-time rollup (e01) over the events table
    timed(
        "event_rollup",
        lambda: _count(REGISTRY["e01_windowed_event_counts"].fn(spark, sf_dir)),
    )

    # --- training-data ops at full table scale
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = DD.with_planted_near_dups(docs)
    timed("dedup_exact", lambda: _count(DD.exact_dup_groups(planted)))
    timed("dedup_minhash", lambda: _count(DD.minhash_lsh_pairs(planted, 0.8)))
    # incremental dedup: 90% of the corpus pre-indexed (untimed); the
    # timed region DETECTS the remaining 10%'s near-dups against the
    # index — the steady-state cost of deduping a new crawl increment
    # (compare with dedup_minhash, the from-scratch cost over the full
    # corpus). The index append is untimed: on Iceberg it is a metadata
    # append transaction; the sandbox emulation's full parquet rewrite
    # would only measure the emulation.
    import tempfile

    from graphlab_spark.operators.dedup_incremental import apply_increment, dedup_increment

    with tempfile.TemporaryDirectory(dir=os.environ.get("SPARK_GRAFT_SCRATCH")) as td:
        dedup_increment(spark, f"{td}/idx", planted.filter(F.col("doc_id") % 10 != 9))
        inc = planted.filter(F.col("doc_id") % 10 == 9)
        timed(
            "dedup_increment_10pct",
            lambda: _count(apply_increment(spark, f"{td}/idx", inc)["pairs"]),
        )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("ann_bruteforce", lambda: _count(ANN.brute_force_topk(embs, list(range(50)), k=10)))
    timed("ann_ivf", lambda: _count(ANN.ivf_topk(embs, list(range(50)), k=10)))
    # r5: IVF-PQ with exact refine — the compressed-index serving path
    # (16 small ints/vector, probed-cell code scan + top-50 exact re-rank)
    from graphlab_spark.operators.ann_pq import ivfpq_topk, load_pq_model

    pq_model = load_pq_model(spark)
    timed(
        "ann_ivfpq_refine",
        lambda: _count(ivfpq_topk(embs, list(range(50)), k=10, refine=50, model=pq_model)),
    )

    # --- r4 curation additions at full table scale
    from graphlab_spark.functions.lm import perplexity_frame
    from graphlab_spark.operators.curation import curation_funnel
    from graphlab_spark.operators.semdedup import semantic_dedup

    fixdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    timed(
        "lm_perplexity",
        lambda: _count(
            perplexity_frame(
                docs,
                f"{fixdir}/lm_unigrams.parquet",
                f"{fixdir}/lm_bigrams.parquet",
            )
        ),
    )
    timed("curation_funnel", lambda: _count(curation_funnel(docs)))
    # learned quality classifier: broadcast quantized weights + JVM
    # tokenize/hash + one partial-agg doc shuffle — the per-doc scoring
    # cost every curation recipe pays on the full crawl
    from graphlab_spark.operators.qclassify import classifier_scores

    timed(
        "quality_classifier",
        lambda: _count(
            classifier_scores(spark, docs, f"{fixdir}/qc_weights.parquet")
        ),
    )
    cent = spark.read.parquet(f"{fixdir}/semdedup_centroids.parquet")
    timed("semantic_dedup", lambda: _count(semantic_dedup(embs, cent)))
    # Lee-et-al duplicated-substring spans: the corpus-wide k-gram
    # shuffle is the dominant cost — same planted frame as the dedup
    # lines so the numbers share an input
    # hash_grams=True is the production/100-TB path (gram shuffles as a
    # 64-bit hash, not its text); pytest pins hashed ≡ text output
    timed("dup_spans", lambda: _count(DD.duplicate_spans(planted, k=8, hash_grams=True)))
    # as-of join over the events table (union + running-window plan)
    timed(
        "asof_join",
        lambda: _count(REGISTRY["e06_asof_join_last_purchase"].fn(spark, sf_dir)),
    )
    # r4 fourth wave: funnel (stage-chained conditional MINs on
    # user_id), cohort retention (user-keyed aggs + O(weeks^2) grid),
    # BM25 (zero-shuffle scoring + 1-row stats broadcast)
    timed(
        "event_funnel",
        lambda: _count(REGISTRY["e07_funnel_stages"].fn(spark, sf_dir)),
    )
    timed(
        "cohort_retention",
        lambda: _count(REGISTRY["e08_cohort_retention"].fn(spark, sf_dir)),
    )
    timed(
        "bm25_ranking",
        lambda: _count(REGISTRY["t25_bm25_ranking"].fn(spark, sf_dir)),
    )
    # r5: hybrid retrieval — BM25 × quality rankings fused (RRF); the
    # marginal cost over bm25_ranking is the quality scan + two
    # TakeOrderedAndProject cuts + one tiny groupBy
    timed(
        "hybrid_rrf",
        lambda: _count(REGISTRY["t37_hybrid_rrf"].fn(spark, sf_dir)),
    )
    timed(
        "text_stats",
        lambda: _count(
            docs.select(
                "doc_id",
                TS.token_count_col().alias("n_tokens"),
                TS.quality_score_col().alias("quality"),
                TS.lang_id_col().alias("lang_pred"),
                TS.fingerprint_col().alias("fp"),
            ).filter(F.col("n_tokens") >= 0)
        ),
    )

    # --- KG pipeline last. Since r02: heavy=True (realistic Common-Crawl
    # per-doc weight, ~8x more prose than r01's light pages — r01's
    # 822 docs/s at sf0.1 is not comparable) and the corpus is
    # PRE-MATERIALIZED untimed (the contract input is a table of web
    # pages; the timed region reads parquet, mirroring scaling_bench).
    from graphlab_spark.operators.scratch import scratch_dir

    pages_path = f"{scratch_dir()}/bench_pages"
    corpus.generate_pages(spark, n_pages, heavy=True).write.mode("overwrite").parquet(
        pages_path
    )
    pages = spark.read.parquet(pages_path)
    aliases = corpus.alias_df(spark)
    # min-of-reps: host steal-time on this sandbox fluctuates 2x minute
    # to minute (see BENCH/BASELINE.md); the quiet-window wall is the
    # signal. Per-stage seconds from the FASTEST rep are emitted as
    # kg.stages so any round-over-round delta decomposes into parse vs
    # link+canonicalize vs materialize instead of reading as one opaque
    # (noise-dominated) number.
    kg_wall = None
    kg_stages: dict[str, float] = {}
    for _ in range(max(reps, 1)):
        stages: dict[str, float] = {}
        t0 = time.time()
        res = run_pipeline_in_memory(spark, pages, aliases, stage_timings=stages)
        # nodes/edges are built lazily; the count is the materialize job
        t_mat = time.time()
        n_edges = res["edges"].count()
        stages["materialize"] = round(time.time() - t_mat, 3)
        w = time.time() - t0
        if kg_wall is None or w < kg_wall:
            kg_wall = w
            kg_stages = stages
    n_docs = res["docs"].count()
    n_triples = res["triples"].count()
    timings["kg_pipeline"] = round(kg_wall, 3)
    extras["kg_docs"] = n_docs
    extras["kg_triples"] = n_triples
    extras["kg_edges"] = n_edges
    extras["docs_per_sec"] = round(n_docs / kg_wall, 2)
    extras["triples_per_sec"] = round(n_triples / kg_wall, 2)
    extras["stages"] = kg_stages
    extras["reps"] = max(reps, 1)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_pages": n_pages,
                "kg": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
