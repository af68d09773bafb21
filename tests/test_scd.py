"""SCD2 entity-attribute history (operators/scd.py): hand-built crawl
sequences; the corpus-level value gate is the kg_scd2_node_history
oracle (parked for the r6 rotation, orphan-gated)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlab_spark.operators.scd import scd2_apply, scd2_as_of, scd2_init


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "k string, v long, valid_from long, valid_to long"
    )


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _d(df):
    return {
        (r.k, r.valid_from): (r.v, r.valid_to)
        for r in df.collect()
    }


def test_scd2_change_delete_insert_unchanged(spark):
    h = scd2_init(_snap(spark, [("a", 1), ("b", 2), ("c", 3)]), ["k"], ["v"], 1)
    h2 = scd2_apply(h, _snap(spark, [("a", 1), ("b", 9), ("d", 4)]), ["k"], ["v"], 2)
    got = _d(h2)
    assert got == {
        ("a", 1): (1, None),   # unchanged: open row untouched
        ("b", 1): (2, 2),      # changed: closed at crawl 2 ...
        ("b", 2): (9, None),   # ... new open version
        ("c", 1): (3, 2),      # deleted: closed
        ("d", 2): (4, None),   # inserted: new open
    }


def test_scd2_reapply_is_noop_and_closed_rows_immutable(spark):
    h = scd2_init(_snap(spark, [("a", 1), ("b", 2)]), ["k"], ["v"], 1)
    h2 = scd2_apply(h, _snap(spark, [("a", 5)]), ["k"], ["v"], 2)
    h2b = scd2_apply(h2, _snap(spark, [("a", 5)]), ["k"], ["v"], 2)
    assert _d(h2) == _d(h2b)
    # a key returning after deletion opens a NEW version; its old closed
    # row survives verbatim
    h3 = scd2_apply(h2, _snap(spark, [("a", 5), ("b", 7)]), ["k"], ["v"], 3)
    got = _d(h3)
    assert got[("b", 1)] == (2, 2) and got[("b", 3)] == (7, None)


def test_scd2_as_of_point_in_time(spark):
    h = scd2_init(_snap(spark, [("a", 1), ("b", 2)]), ["k"], ["v"], 1)
    h = scd2_apply(h, _snap(spark, [("a", 5)]), ["k"], ["v"], 2)
    h = scd2_apply(h, _snap(spark, [("a", 5), ("b", 7)]), ["k"], ["v"], 3)
    at = lambda t: {r.k: r.v for r in scd2_as_of(h, t).collect()}  # noqa: E731
    assert at(1) == {"a": 1, "b": 2}
    assert at(2) == {"a": 5}          # b deleted in crawl 2
    assert at(3) == {"a": 5, "b": 7}
    assert at(0) == {}


def test_scd2_null_attrs_nullsafe_compare(spark):
    """NULL attribute values compare null-safely: NULL→NULL is
    unchanged, NULL→value and value→NULL are changes."""
    h = scd2_init(
        spark.createDataFrame([("a", None), ("b", 2)], "k string, v long"),
        ["k"], ["v"], 1,
    )
    h2 = scd2_apply(
        h,
        spark.createDataFrame([("a", None), ("b", None)], "k string, v long"),
        ["k"], ["v"], 2,
    )
    got = _d(h2)
    assert got[("a", 1)] == (None, None)      # NULL == NULL: untouched
    assert got[("b", 1)] == (2, 2)            # value -> NULL: closed
    assert got[("b", 2)] == (None, None)


def test_scd2_single_foj_closed_rows_skip_join(spark, tmp_path):
    """Plan shape for one apply over a PERSISTED history (the real
    usage: history is a maintained table between crawls): exactly ONE
    join — key-hashed full outer, never nested-loop, never re-derived
    per output branch — fed by the open-slice filter."""
    import re

    h = scd2_init(_snap(spark, [("a", 1), ("b", 2)]), ["k"], ["v"], 1)
    p = str(tmp_path / "hist")
    h.write.parquet(p)
    out = scd2_apply(
        spark.read.parquet(p), _snap(spark, [("a", 3)]), ["k"], ["v"], 2
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    joins = re.findall(r"^\(\d+\) (\w*Join\w*)", plan, re.M)
    assert len(joins) == 1 and "Nested" not in joins[0], joins
    assert "isnull(valid_to" in plan  # open-slice filter reaches the scan
    # the filter is PUSHED to the parquet scan of the history
    assert "PushedFilters" in plan
