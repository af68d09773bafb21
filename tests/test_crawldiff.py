"""Crawl-snapshot delta (operators/crawldiff)."""

from __future__ import annotations

from graphlab_spark.operators.crawldiff import changed_or_added, crawl_delta


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url STRING, text STRING")


def test_crawl_delta_all_statuses(spark):
    old = _snap(
        spark,
        [
            ("u1", "same"),
            ("u2", "before"),
            ("u3", "gone"),
            ("u5", None),
            ("u6", None),
        ],
    )
    new = _snap(
        spark,
        [
            ("u1", "same"),
            ("u2", "after"),
            ("u4", "fresh"),
            ("u5", None),
            ("u6", "now text"),
        ],
    )
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "added",
        "u5": "unchanged",  # NULL vs NULL content
        "u6": "changed",  # NULL vs text
    }


def test_changed_or_added_is_the_incremental_worklist(spark):
    old = _snap(spark, [("u1", "same"), ("u2", "before")])
    new = _snap(spark, [("u1", "same"), ("u2", "after"), ("u3", "fresh")])
    got = sorted((r["url"], r["text"]) for r in changed_or_added(old, new).collect())
    assert got == [("u2", "after"), ("u3", "fresh")]
    # schema of the work-list is the NEW snapshot's schema, unwidened
    assert changed_or_added(old, new).columns == new.columns


def test_crawl_delta_empty_sides(spark):
    empty = _snap(spark, [])
    new = _snap(spark, [("u1", "x")])
    assert {r["status"] for r in crawl_delta(empty, new).collect()} == {"added"}
    assert {r["status"] for r in crawl_delta(new, empty).collect()} == {"removed"}


def test_crawl_delta_shuffles_hashes_not_bodies(spark):
    # the projection under the join must be (key, md5, marker) — page
    # bodies must not survive past the map side
    old = _snap(spark, [("u1", "body")])
    new = _snap(spark, [("u1", "body")])
    plan = (
        crawl_delta(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "md5" in plan
    assert "CartesianProduct" not in plan


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src string, pred string, dst string, n_docs long"
    )


def test_graph_delta_all_statuses(spark):
    from graphlab_spark.operators.crawldiff import graph_delta, graph_delta_summary

    old = _edges(
        spark,
        [
            ("a", "p", "b", 3),   # unchanged
            ("a", "p", "c", 2),   # changed (weight 2 → 5)
            ("x", "q", "y", 1),   # removed
        ],
    )
    new = _edges(
        spark,
        [
            ("a", "p", "b", 3),
            ("a", "p", "c", 5),
            ("n", "r", "m", 7),   # added
        ],
    )
    got = {
        (r.src, r.pred, r.dst): (r.w_old, r.w_new, r.status)
        for r in graph_delta(old, new).collect()
    }
    assert got == {
        ("a", "p", "b"): (3, 3, "unchanged"),
        ("a", "p", "c"): (2, 5, "changed"),
        ("x", "q", "y"): (1, None, "removed"),
        ("n", "r", "m"): (None, 7, "added"),
    }
    summary = {r.status: r.n_edges for r in graph_delta_summary(graph_delta(old, new)).collect()}
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_graph_delta_null_weights_null_safe(spark):
    from graphlab_spark.operators.crawldiff import graph_delta

    old = _edges(spark, [("a", "p", "b", None), ("a", "p", "c", None)])
    new = _edges(spark, [("a", "p", "b", None), ("a", "p", "c", 4)])
    got = {(r.src, r.pred, r.dst): r.status for r in graph_delta(old, new).collect()}
    # NULL <=> NULL is unchanged; NULL vs value is changed — presence is
    # tracked by markers, never by weight nullness
    assert got == {("a", "p", "b"): "unchanged", ("a", "p", "c"): "changed"}


def test_graph_delta_single_join_no_cartesian(spark):
    from graphlab_spark.operators.crawldiff import graph_delta

    old = _edges(spark, [("a", "p", "b", 1)])
    new = _edges(spark, [("a", "p", "b", 1)])
    plan = graph_delta(old, new)._jdf.queryExecution().optimizedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("Join") == 1


def test_apply_graph_delta_reproduces_new_snapshot(spark, tmp_path):
    """old table + graph_delta(old, new) == new, exactly — the O(delta)
    incremental-republication contract; idempotent on re-apply."""
    from graphlab_spark.operators.crawldiff import graph_delta
    from graphlab_spark.operators.materialize import apply_graph_delta

    old = _edges(
        spark,
        [("a", "p", "b", 3), ("a", "p", "c", 2), ("x", "q", "y", 1)],
    )
    new = _edges(
        spark,
        [("a", "p", "b", 3), ("a", "p", "c", 5), ("n", "r", "m", 7)],
    )
    path = str(tmp_path / "edges")
    old.write.parquet(path)
    delta = graph_delta(old, new)

    def snap(df):
        return sorted((r.src, r.pred, r.dst, r.n_docs) for r in df.collect())

    got = apply_graph_delta(spark, path, delta)
    assert snap(got) == snap(new)
    # re-applying the same delta is a no-op (idempotent republication)
    again = apply_graph_delta(spark, path, delta)
    assert snap(again) == snap(new)


def test_merge_apply_delta_sql_statement():
    from graphlab_spark.operators.materialize import merge_apply_delta_sql

    sql = merge_apply_delta_sql("kg.edges", "delta_v", ["src", "pred", "dst"], "n_docs")
    assert sql == (
        "MERGE INTO kg.edges t USING delta_v s "
        "ON t.src = s.src AND t.pred = s.pred AND t.dst = s.dst "
        "WHEN MATCHED AND s.status = 'removed' THEN DELETE "
        "WHEN MATCHED AND s.status = 'changed' THEN UPDATE SET t.n_docs = s.w_new "
        "WHEN NOT MATCHED AND s.status = 'added' THEN INSERT "
        "(src, pred, dst, n_docs) VALUES (s.src, s.pred, s.dst, s.w_new)"
    )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        merge_apply_delta_sql("kg.edges; DROP", "v", ["src"], "w")
