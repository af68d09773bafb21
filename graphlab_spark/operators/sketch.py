"""Count-Min sketch: bounded-memory frequency estimation.

At 100 TB a plain ``groupBy(token).count()`` for heavy-hitter detection
shuffles a row per DISTINCT key — unbounded. A Count-Min sketch (Cormode
& Muthukrishnan, 2005) caps state at ``depth × width`` integer counters
with a one-sided error (estimates never undercount, overcount ≤ εN with
ε = e/width at probability 1−(1/2)^depth), and sketches MERGE by
counter-wise addition — the property that makes them shuffle-friendly:
map-side partial aggregation already IS the merge.

Engine-portable hashing (the repo's md5-12-hex pattern):
``bucket_i(v) = int(md5(str(i) + '|' + v)[:12], 16) % width`` — so a
DuckDB oracle replays the exact counters and estimates.

Spark shape: build = explode to ``depth`` (row, bucket) cells per value
→ ONE partial-aggregated groupBy over ≤ depth·width cells (the shuffle
carries at most the sketch, never the key space). Estimate = broadcast
the probe terms, join the sketch on (row, bucket), take the min across
rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, row: int, width: int) -> Column:
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}|"), col)), 1, 12), 16, 10
        ).cast("long"),
        F.lit(width),
    )


def cms_build(
    values: DataFrame, col: str = "value", depth: int = 3, width: int = 1024
) -> DataFrame:
    """Counter table (row, bucket, cnt) over all rows of ``values`` —
    at most depth·width rows regardless of key cardinality."""
    cells = values.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col(col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.*")
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-wise sum — sketch(A ∪ B) == merge(sketch(A), sketch(B)),
    the distributive property partial aggregation exploits."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str = "value",
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """(value, est) upper-bound frequency per probe value: min over the
    depth counters. Probes are query-sized → broadcast; absent cells
    count 0 (value never seen)."""
    keyed = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col(col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(col, "c.*")
    return (
        F.broadcast(keyed)
        .join(sketch, ["row", "bucket"], "left")
        .fillna(0, ["cnt"])
        .groupBy(col)
        .agg(F.min("cnt").cast("long").alias("est"))
    )


def bloom_build(
    values: DataFrame, col: str = "value", n_hashes: int = 4, n_bits: int = 8192
) -> DataFrame:
    """Bloom filter as a DISTINCT bit-position table (≤ n_bits rows —
    bounded regardless of key cardinality): bit_i(v) = md5-12-hex of
    ``str(i) + '|' + v`` mod n_bits. Merge = union-distinct (bitwise OR
    of the bit sets) — like the CMS, partial aggregation is the merge.
    The membership primitive behind "have we crawled this url" when the
    key set no longer fits an exact table."""
    return (
        values.select(
            F.explode(
                F.array(*[_bucket(F.col(col), i, n_bits) for i in range(n_hashes)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    col: str = "value",
    n_hashes: int = 4,
    n_bits: int = 8192,
) -> DataFrame:
    """(value, maybe_present) per probe: present iff ALL k bits are set.
    No false negatives ever; false-positive rate ≈ (1 − e^{−kn/m})^k.
    The bit table is ≤ n_bits rows → broadcast; count-of-hits equals k
    exactly when every bit is found (bits per probe are exploded
    DISTINCT positions... k positions may collide for one value, so the
    check compares against the value's own DISTINCT bit count)."""
    keyed = probes.select(
        F.col(col),
        F.explode(
            F.array_distinct(
                F.array(*[_bucket(F.col(col), i, n_bits) for i in range(n_hashes)])
            )
        ).alias("bit"),
    )
    hits = (
        keyed.join(
            F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left"
        )
        .groupBy(col)
        .agg(
            F.count(F.lit(1)).alias("_k"),
            F.sum(F.coalesce(F.col("_set"), F.lit(0))).alias("_hits"),
        )
    )
    return hits.select(col, (F.col("_hits") == F.col("_k")).alias("maybe_present"))


def _hll_cols(col: Column, p: int):
    """(bucket, rho) for one value: 60-bit md5 hash h; bucket = h mod
    2^p; w = h >> p (60−p bits); rho = leading zeros of w + 1, computed
    as pure integer comparisons (no float log — exact in any engine)."""
    m = 1 << p
    wbits = 60 - p
    h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    # shift/mask, never float division — a 60-bit h loses low bits as a
    # double above 2^53
    bucket = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftright(h, p)
    # bit_length(w) = Σ_i [w >= 2^i]; rho = wbits − bit_length + 1
    bl = None
    for i in range(wbits):
        term = (w >= F.lit(1 << i)).cast("int")
        bl = term if bl is None else bl + term
    return bucket, (F.lit(wbits) - bl + 1).cast("int")


def hll_build(values: DataFrame, col: str = "value", p: int = 12) -> DataFrame:
    """HyperLogLog register table (bucket, reg) — ≤ 2^p rows of state
    for ANY key cardinality; reg = max rho per bucket, so sketches merge
    by bucket-wise MAX (again: partial aggregation is the merge). This
    is the mergeable state behind approx_count_distinct, materialized
    as a table so increments can union into it across pipeline runs."""
    bucket, rho = _hll_cols(F.col(col), p)
    return (
        values.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bucket-wise max — sketch(A ∪ B) == merge(sketch(A), sketch(B))."""
    return (
        a.unionByName(b).groupBy("bucket").agg(F.max("reg").alias("reg"))
    )


def hll_estimate(registers: DataFrame, p: int = 12) -> float:
    """Standard HLL estimator over the register table (driver-side —
    the table is ≤ 2^p rows): alpha·m²/Σ2^(−reg), with the small-range
    linear-counting correction. Float by nature — gate the REGISTERS
    (exact integers), pin the estimate's accuracy in pytest."""
    import math

    m = 1 << p
    regs = {r.bucket: r.reg for r in registers.collect()}
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -regs.get(i, 0) for i in range(m))
    est = alpha * m * m / s
    zeros = m - len([v for v in regs.values() if v > 0])
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est
