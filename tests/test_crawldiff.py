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
