"""End-to-end curation funnel: the composed training-data pipeline.

Real curation is not one operator but a FUNNEL — quality gate → exact
dedup → per-domain mixing quota — and what operators report is the
survivor count and token mass at each stage (the number every data-card
publishes). This module composes the already-oracled pieces
(functions.textstats.quality_score_col, operators.dedup.exact_dedup,
operators.sampling.domain_quota) into one call so a user can run the
whole flow and read the funnel.

Scale shape: stage 1-2 are zero-shuffle scans; stage 3 is the one
fingerprint window; stage 4 is the one per-domain window. The four
stage aggregations are partial-aggregated counts/sums unioned into a
4-row frame — nothing here adds a shuffle the constituent operators
did not already have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curation_funnel(
    docs: DataFrame,
    quality_threshold: int = 500,
    per_domain: int = 20,
    domain_col: str = "source",
    classifier_weights: str | None = None,
) -> DataFrame:
    """Run quality-gate → [learned classifier] → exact-dedup →
    domain-quota over ``docs`` (doc_id, text, ``domain_col``) and
    return the funnel report (stage, docs, tokens) with tokens =
    whitespace token mass. ``classifier_weights``: path to a frozen
    quantized model (operators.qclassify) to insert as stage 2b — the
    rule-then-model ordering every production recipe uses (cheap JVM
    rules first, the model only on survivors). Deterministic end to
    end: the dedup keeper is min doc_id, the quota tie-break is doc_id
    asc."""
    from graphlab_spark.functions.textstats import quality_score_col
    from graphlab_spark.operators.dedup import exact_dedup
    from graphlab_spark.operators.sampling import domain_quota

    # Deliberately NOT spread(): the funnel is several independent agg
    # branches over the same scan, and a round-robin exchange per branch
    # costs more than the per-doc scoring saves (A/B measured +0.3 s at
    # sf0.1 with spread).
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+"))

    def report(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(ntok).alias("tokens"),
        ).select(F.lit(stage).alias("stage"), "docs", "tokens")

    s2 = docs.filter(quality_score_col() >= quality_threshold)
    out = report(docs, "1_total").unionByName(report(s2, "2_quality_gate"))
    if classifier_weights is not None:
        from graphlab_spark.operators.qclassify import classifier_filter

        s2 = classifier_filter(s2.sparkSession, s2, classifier_weights)
        out = out.unionByName(report(s2, "2b_learned_filter"))
    s3 = exact_dedup(s2)
    s4 = s3.join(
        domain_quota(s3, per_domain, domain_col=domain_col).select("doc_id"),
        "doc_id",
    )
    return (
        out
        .unionByName(report(s3, "3_exact_dedup"))
        .unionByName(report(s4, "4_domain_quota"))
    )
