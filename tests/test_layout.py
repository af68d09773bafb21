"""Z-order layout: bit-interleave correctness vs a Python replica,
curve locality, the clustered write's per-file footer tightness, and
the zero-shuffle key plan."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from graphlab_spark.operators.layout import zorder_key, zorder_sql_expr, zorder_write


def _py_z(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_replica(spark):
    rows = [(a, b) for a in range(0, 70, 7) for b in range(0, 70, 11)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r.a, r.b): r.z for r in df.select("a", "b", zorder_key("a", "b").alias("z")).collect()}
    assert got == {(a, b): _py_z(a, b) for a, b in rows}
    # hand-traced corners
    assert got[(0, 0)] == 0
    assert _py_z(1, 0) == 1 and _py_z(0, 1) == 2 and _py_z(3, 3) == 15


def test_zorder_sql_expr_same_algebra(spark):
    # the SQL generator and the Column builder are the same algebra:
    # evaluate the generated SQL via Spark's own expr()
    df = spark.createDataFrame([(5, 9), (1000, 4095)], "a long, b long")
    got = df.select(
        zorder_key("a", "b").alias("z1"), F.expr(zorder_sql_expr("a", "b")).alias("z2")
    ).collect()
    assert all(r.z1 == r.z2 for r in got)


def test_zorder_locality_monotone_slices(spark):
    # with one coordinate fixed, z is strictly increasing in the other —
    # the property that makes range predicates prune on either column
    for fixed in (0, 21):
        zs = [_py_z(a, fixed) for a in range(64)]
        assert zs == sorted(zs) and len(set(zs)) == 64
        zs = [_py_z(fixed, b) for b in range(64)]
        assert zs == sorted(zs) and len(set(zs)) == 64


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    # grid data written on the z-curve: every file's bounding box covers
    # a small fraction of the full (a, b) domain in BOTH dimensions —
    # single-column sorting would leave one dimension's range full-width
    n = 64
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )
    out = str(tmp_path / "z")
    zorder_write(df, out, ("a", "b"), bits=6, n_files=16)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 16
    import pyarrow.parquet as pq

    for f in files:
        t = pq.read_table(f)
        a = t.column("a").to_pylist()
        b = t.column("b").to_pylist()
        # each z-range tile spans ≤ half the domain per dimension
        assert max(a) - min(a) <= n // 2
        assert max(b) - min(b) <= n // 2


def test_zorder_key_plan_is_pure_codegen(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = (
        docs.select(zorder_key(F.col("o_custkey") % 256, F.col("o_orderkey") % 256, bits=8))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_zorder_key_n_matches_replica_and_specializes(spark):
    from pyspark.sql import functions as F

    from graphlab_spark.operators.layout import zorder_key, zorder_key_n

    def py_zn(vals, bits):
        z = 0
        k = len(vals)
        for i in range(bits):
            for j, v in enumerate(vals):
                z |= ((v >> i) & 1) << (i * k + j)
        return z

    rows = [(a, b, c) for a in (0, 5, 63) for b in (0, 17, 63) for c in (0, 42, 63)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = df.select(
        "a", "b", "c",
        zorder_key_n(["a", "b", "c"], bits=6).alias("z3"),
        zorder_key_n(["a", "b"], bits=6).alias("z2n"),
        zorder_key(F.col("a"), F.col("b"), bits=6).alias("z2"),
    ).collect()
    for r in got:
        assert r.z3 == py_zn([r.a, r.b, r.c], 6)
        assert r.z2n == r.z2  # k=2 specializes to the pairwise key

    import pytest as _pytest

    with _pytest.raises(ValueError):
        zorder_key_n(["a", "b", "c"], bits=21)  # 63 bits > 62
