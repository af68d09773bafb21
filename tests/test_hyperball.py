"""HyperBall (operators/hyperball.py): registers match a driver-side
replay, ball-size estimates track exact BFS ball sizes, state stays
bounded, and the per-iteration plan is join+partial-agg (no cartesian,
no Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators.hyperball import hyperball_registers, hyperball_sizes


@pytest.fixture()
def chain_edges(spark):
    # a 40-node directed chain + a hub fanning to 10 nodes: known exact
    # ball sizes (chain interior: t+1; hub at t>=1: 11)
    rows = [(f"c{i}", f"c{i + 1}") for i in range(39)]
    rows += [("hub", f"h{i}") for i in range(10)]
    return spark.createDataFrame(rows, "src string, dst string")


def _exact_ball_sizes(rows, t):
    adj = {}
    nodes = set()
    for s, d in rows:
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    out = {}
    for v in nodes:
        ball = {v}
        frontier = {v}
        for _ in range(t):
            frontier = {w for u in frontier for w in adj.get(u, ())} - ball
            ball |= frontier
        out[v] = len(ball)
    return out


def test_estimates_track_exact_ball_sizes(spark, chain_edges):
    """At p=10 (1024 buckets) on balls of size ≤ 11 the linear-counting
    regime is near-exact: every estimate within 10% of the BFS truth."""
    t = 3
    regs = hyperball_registers(chain_edges, t=t, p=10)
    est = {r.id: r.ball_size for r in hyperball_sizes(regs, p=10).collect()}
    exact = _exact_ball_sizes(
        [(r.src, r.dst) for r in chain_edges.collect()], t
    )
    assert set(est) == set(exact)
    for v, n in exact.items():
        assert abs(est[v] - n) / n < 0.10, (v, est[v], n)


def test_registers_bounded_by_nodes_times_m(spark, chain_edges):
    regs = hyperball_registers(chain_edges, t=4, p=4)
    n_nodes = (
        chain_edges.select(F.col("src").alias("id"))
        .unionByName(chain_edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    assert regs.count() <= n_nodes * 16  # 2^p
    # every node keeps at least its own singleton register
    assert regs.select("id").distinct().count() == n_nodes


def test_t0_is_singleton_sketch(spark, chain_edges):
    """t=0: exactly one register row per node (the {v} sketch)."""
    regs = hyperball_registers(chain_edges, t=0, p=4)
    per_node = regs.groupBy("id").count().agg(F.max("count")).collect()[0][0]
    assert per_node == 1


def test_iteration_plan_shape(spark, chain_edges):
    """The returned (scratch-pinned) frame reads the final round's
    parquet — flat lineage; and one extra merge round's plan is a hash
    join + partial-agg MAX, never cartesian or Python."""
    regs = hyperball_registers(chain_edges, t=2, p=4)
    e = chain_edges.select("src", "dst").distinct()
    nbr = e.join(regs.withColumnRenamed("id", "dst"), "dst").select(
        F.col("src").alias("id"), "bucket", "reg"
    )
    merged = regs.unionByName(nbr).groupBy("id", "bucket").agg(
        F.max("reg").alias("reg")
    )
    plan = merged._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    assert "partial_max" in plan
    assert "EvalPython" not in plan


def test_harmonic_centrality_tracks_exact(spark, chain_edges):
    """Harmonic centrality from ball-size deltas vs the exact
    Σ 1/dist over the same t_max horizon (truncated harmonic), within
    HLL tolerance at p=10."""
    from graphlab_spark.operators.hyperball import harmonic_centrality

    t_max = 3
    rows = [(r.src, r.dst) for r in chain_edges.collect()]
    adj = {}
    nodes = set()
    for s, d in rows:
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    exact = {}
    for v in nodes:
        ball, frontier, h = {v}, {v}, 0.0
        for t in range(1, t_max + 1):
            frontier = {w for u in frontier for w in adj.get(u, ())} - ball
            ball |= frontier
            h += len(frontier) / t
        exact[v] = h
    got = {r.id: r.harmonic for r in harmonic_centrality(
        chain_edges, t_max=t_max, p=10).collect()}
    assert set(got) == set(exact)
    for v, h in exact.items():
        assert abs(got[v] - h) <= max(0.15 * h, 0.15), (v, got[v], h)
