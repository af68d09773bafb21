"""Capture .explain("formatted") output for the r6-touched queries.

Usage: python tools/capture_plans_r06.py <out_dir> <suffix> [name...]

Writes <out_dir>/<name>_<suffix>.txt for each query. Names cover both
registry entries (by registry name) and the bench-only operator paths
(dedup_minhash, dedup_increment, ann_* at bench scale), built exactly
the way bench.py builds them. Run from the tree whose plans you want
(the round-start worktree for "before", HEAD for "after").
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphlab_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def build(spark, name):
    from graphlab_spark.operators import ann as ANN
    from graphlab_spark.operators import dedup as DD
    from graphlab_spark.plans import event_queries  # noqa: F401
    from graphlab_spark.plans import training_queries  # noqa: F401
    from graphlab_spark.plans.relational import REGISTRY

    if name in REGISTRY:
        return REGISTRY[name].fn(spark, SF_DIR)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    planted = DD.with_planted_near_dups(docs)
    fixdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    )
    if name == "dedup_minhash":
        return DD.minhash_lsh_pairs(planted, 0.8)
    if name == "dedup_exact":
        return DD.exact_dup_groups(planted)
    if name == "dup_spans":
        return DD.duplicate_spans(planted, k=8, hash_grams=True)
    if name == "ann_bruteforce":
        return ANN.brute_force_topk(embs, list(range(50)), k=10)
    if name == "ann_ivf":
        return ANN.ivf_topk(embs, list(range(50)), k=10)
    if name == "ann_lsh":
        return ANN.lsh_topk(embs, list(range(50)), k=10)
    if name == "ann_ivfpq_refine":
        from graphlab_spark.operators.ann_pq import ivfpq_topk, load_pq_model

        model = load_pq_model(spark)
        return ivfpq_topk(embs, list(range(50)), k=10, refine=50, model=model)
    if name == "semantic_dedup":
        from graphlab_spark.operators.semdedup import semantic_dedup

        cent = spark.read.parquet(f"{fixdir}/semdedup_centroids.parquet")
        return semantic_dedup(embs, cent)
    if name == "lm_perplexity":
        from graphlab_spark.functions.lm import perplexity_frame

        return perplexity_frame(
            docs,
            f"{fixdir}/lm_unigrams.parquet",
            f"{fixdir}/lm_bigrams.parquet",
        )
    if name == "curation_funnel":
        from graphlab_spark.operators.curation import curation_funnel

        return curation_funnel(docs)
    if name == "quality_classifier":
        from graphlab_spark.operators.qclassify import classifier_scores

        return classifier_scores(spark, docs, f"{fixdir}/qc_weights.parquet")
    if name == "text_stats":
        from graphlab_spark.functions import textstats as TS

        return docs.select(
            "doc_id",
            TS.token_count_col().alias("n_tokens"),
            TS.quality_score_col().alias("quality"),
            TS.lang_id_col().alias("lang_pred"),
            TS.fingerprint_col().alias("fp"),
        ).filter(F.col("n_tokens") >= 0)
    raise SystemExit(f"unknown query name: {name}")


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    for name in names:
        df = build(spark, name)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan_text(df))
        print(f"captured {name}_{suffix}")


if __name__ == "__main__":
    main()
