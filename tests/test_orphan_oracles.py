"""Oracle gate for registry entries BEYOND the driver's 50-row cap.

The driver's CORRECTNESS harness records only the first 50 ``queries()``
entries; the registry deliberately parks rows-only entries and two
near-trivial filters past the cap (see ``reorder_registry_last`` in
plans/relational.py). This test replicates the driver's compare
(row count, column set, order-insensitive value hash vs the DuckDB
oracle) for every entry past the cap, so a registry reorder can never
silently orphan a gate. Rows-only entries past the cap get the same
weaker check the driver would give them: the query runs and its row
count is sane.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E
from tools.check_oracles import TABLES, value_hash

SF_DIR = "/root/testdata/sf0.001"
DRIVER_CAP = 50


def _beyond_cap() -> list[str]:
    return list(E.queries())[DRIVER_CAP:]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_cap_split_is_intentional():
    names = list(E.queries())
    oracles = E.oracle_sql()
    # every oracled entry past the cap must be one we consciously parked
    # r5 rotation (see reorder_registry_last in plans/training_queries):
    # every parked entry below carries an r1–r4 driver record; the r4
    # zero-record gates, the r5 changed-code operators, and the new
    # r5 operators (s04, c16, t34, kg_hyperball, t37) hold the recorded
    # window this round (t37 took d07's slot — d07 has an r4 full-pass
    # record and its modmul change is hash-verified by check_oracles).
    parked_oracled = {
        "d07_neardup_keepers",
        "kg_graph_pattern",
        "t38_unigram_ids",
        "a33_expectations",
        "a03_ilike_search",
        "t21_cut_duplicate_spans",
        "t24_chunk_documents",
        "kg_eval_triple_pr",
        "kg_eval_cluster_pr",
        "t35_hdr_quantiles",
        "kg_scd2_node_history",
        "kg_transe_tail_ranks",
        "a15_anti_join_new_only",
        "a27_rollup_subtotals",
        "a28_pivot_event_matrix",
        "e04_sliding_window_counts",
        "e05_value_percentiles",
        "e07_funnel_stages",
        "e08_cohort_retention",
        "e09_resampled_counts",
        "e10_anomalous_hours",
        "d08_semantic_dedup",
        "m01_media_meta",
        "m04_media_features",
        "t09_domain_quota",
        "t08_benchmark_contamination",
        "t10_repetition_stats",
        "t11_pii_redaction",
        "t12_bpe_token_count",
        "t13_url_canonical",
        "t14_line_dedup",
        "t15_doc_dup_structure",
        "t22_normalize_text",
        "t23_temperature_mixture",
        "t26_mixture_sample",
        "t18_lm_perplexity",
        "t19_shuffled_packing",
        "c11_salted_join",
        "t25_bm25_ranking",
        "e01_windowed_event_counts",
        "e02_user_sessions",
        "e03_props_json_stats",
        "t01_token_count",
        "t02_quality_score",
        "t03_lang_id",
        "t04_fingerprint",
        "d01_exact_dup_groups",
        "d03_ngram_jaccard_pairs",
        "t06_token_budget_packing",
        "t07_winnowing_fp",
        "t05_stratified_sample",
        "c11_salted_groupby",
        "d06_embedding_near_dup",
        "d02_exact_dedup_keepers",
        "s01_ann_bruteforce_topk",
        "a25_joined_load",
        "m02_frame_sample_counts",
        "m03_resize_plan",
        "a01_filter_eq",
        "a02_filter_null_tombstone",
        "a04_disjunction",
        "a05_conjunction",
        "a06_in_list",
        "a07_sort_topk",
        "a08_pagination",
        "a09_count",
        "a10_max",
        "a11_group_count",
        "a12_avg",
        "a18_bulk_merge_semantics",
        "a13_histogram",
        "a14_conditional_count",
        "a16_ci_distinct",
        "a17_single_upsert",
        "a19_delete_not_found",
        "a20_set_diff",
        "c13_dedup_latest_per_key",
        "tpch_q1_pricing_summary",
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier_volume",
    }
    beyond = set(names[DRIVER_CAP:])
    assert {n for n in beyond if n in oracles} <= parked_oracled
    # and every in-cap entry is oracled (no wasted driver rows)
    assert all(n in oracles for n in names[:DRIVER_CAP])
    # the kg north-star gates all sit inside the recorded window —
    # except ones EXPLICITLY parked above
    kg_oracled = {n for n in names if n.startswith("kg_") and n in oracles}
    assert kg_oracled - parked_oracled <= set(names[:DRIVER_CAP])


@pytest.mark.parametrize("name", _beyond_cap())
def test_orphan_entry(name, spark, duck):
    fn = E.queries()[name]
    sql = E.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(sdf) >= 0  # rows-only: ran to completion with a schema
        assert list(sdf.columns)
        return
    odf = duck.sql(sql).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf), f"{name}: value-hash mismatch"
