"""HyperBall: per-node t-hop neighborhood sizes via HLL counters
(Boldi & Vigna 2013, "In-Core Computation of Geometric Centralities
with HyperBall") — the bounded-state answer to "how big is each node's
reach" on a web-scale graph.

Exact per-node ball sizes need per-node SETS (quadratic state on dense
graphs); HyperBall keeps ONE HLL register table per node (≤ 2^p rows)
and iterates the set-union as a bucket-wise MAX merge:

    c_0(v) = sketch({v})
    c_k(v) = c_k-1(v)  ∪  ⋃_{(v,w) ∈ E} c_k-1(w)

Scale shape per iteration: one hash join of edges against the register
table on dst (carries ≤ |V|·2^p rows, never ball contents) + one
partial-aggregated groupBy (id, bucket) MAX — two bounded shuffles,
zero driver syncs; iterations scratch-pin like the pagerank/k_core
loops. At t = diameter this computes the full neighborhood function /
effective-diameter machinery of the paper.

Gating (the t33 precedent): registers are EXACT integers (shift/mask
md5 hashing shared with operators/sketch.py), so the kg_hyperball gate
hash-compares the register table against a DuckDB replay with the
iterations unrolled; the float ball-size ESTIMATE is pytest-pinned
against exact BFS ball sizes instead.

Reference parity: the reference's graph lives in Neo4j
(`backend/app/utils/neo4j_client.py`) where reachability questions are
per-query Cypher traversals; this is the all-nodes-at-once form that
survives 10^12 edges.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlab_spark.operators.sketch import _hll_cols


def _register_rounds(edges, t, p, src, dst, keep_rounds=False):
    """Yield (k, regs) for k = 0..t — the incremental HyperBall loop.
    Each round scratch-pins its register table; previous rounds are
    reclaimed unless ``keep_rounds`` (harmonic centrality reads every
    round's sizes, so its frames must stay live until it finishes)."""
    from graphlab_spark.operators.scratch import cleanup_prefix, materialize

    tag = f"hb_{uuid.uuid4().hex[:8]}"
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    bucket, rho = _hll_cols(F.col("id"), p)
    # singleton sketch: exactly one register row per node
    regs = materialize(
        nodes.select("id", bucket.cast("int").alias("bucket"), rho.alias("reg")),
        f"{tag}_r0",
    )
    yield 0, regs
    for k in range(t):
        nbr = (
            e.join(regs.withColumnRenamed("id", "dst"), "dst")
            .select(F.col("src").alias("id"), "bucket", "reg")
        )
        regs = materialize(
            regs.unionByName(nbr)
            .groupBy("id", "bucket")
            .agg(F.max("reg").alias("reg")),
            f"{tag}_r{k + 1}",
        )
        if not keep_rounds:
            cleanup_prefix(f"{tag}_r{k}")
        yield k + 1, regs


def hyperball_registers(
    edges: DataFrame,
    t: int = 2,
    p: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HLL register table per node after ``t`` merge rounds →
    (id, bucket, reg): node v's registers sketch {w : dist(v, w) ≤ t}
    along OUT edges (v itself included). Sparse — absent (id, bucket)
    rows are implicit zero registers, identically in both engines."""
    for _, regs in _register_rounds(edges, t, p, src, dst):
        pass
    return regs.select("id", "bucket", F.col("reg").cast("int").alias("reg"))


def harmonic_centrality(
    edges: DataFrame,
    t_max: int = 4,
    p: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, harmonic): HyperBall's headline application — harmonic
    centrality Σ_{w≠v} 1/dist(v,w) estimated from the ball-size deltas:

        H(v) ≈ Σ_{t=1..t_max} (|B_t(v)| − |B_{t−1}(v)|) / t

    (distances follow IN-edges of the original graph when you want
    "who can reach v" — pass reversed edges for that convention; this
    computes over OUT-edges as given.) One register table per round,
    sizes via :func:`hyperball_sizes`, deltas joined on the node id —
    t_max bounded shuffles total, state ≤ |V|·2^p throughout. Estimate
    quality is the HLL error (~1.04/√2^p); pytest pins a tolerance vs
    exact BFS on a fixed graph."""
    sizes = None
    for t, regs in _register_rounds(edges, t_max, p, src, dst, keep_rounds=True):
        s_t = hyperball_sizes(regs, p).withColumnRenamed("ball_size", f"b{t}")
        sizes = s_t if sizes is None else sizes.join(s_t, "id")
    h = None
    for t in range(1, t_max + 1):
        term = (F.col(f"b{t}") - F.col(f"b{t - 1}")) / t
        h = term if h is None else h + term
    return sizes.select("id", F.greatest(h, F.lit(0.0)).alias("harmonic"))


def hyperball_sizes(registers: DataFrame, p: int = 4) -> DataFrame:
    """(id, ball_size): the standard HLL estimate per node over its
    sparse register rows (absent buckets contribute 2^0 = 1 to the
    harmonic sum), with the small-range linear-counting correction —
    all column expressions, one partial-aggregated groupBy(id)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.groupBy("id").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_present"),
        F.sum((F.col("reg") > 0).cast("int")).alias("_nonzero"),
    )
    s = F.col("_s_present") + (F.lit(m) - F.col("_n_present"))  # absent ⇒ 2^-0
    raw = F.lit(alpha * m * m) / s
    zeros = F.lit(m) - F.col("_nonzero")
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lin).otherwise(raw)
    return agg.select("id", est.alias("ball_size"))
