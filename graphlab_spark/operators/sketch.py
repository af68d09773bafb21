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


# ----------------------------------------------------------- HDR histogram
# The quantile member of the sketch family (CMS/Bloom/HLL + this): an
# HdrHistogram-style log-bucketed counter table — the industry-standard
# mergeable percentile state for latency/length distributions. State is
# ≤ octaves·s counter rows for ANY value cardinality; merge = counter
# addition (partial aggregation IS the merge, like the CMS); relative
# quantile error ≤ 1/s by construction. Everything — binning, rank
# threshold, value readout — is EXACT integer arithmetic (the bit-length
# ladder + integer division), so the DuckDB oracle matches hash-for-hash
# and only the ±1/s error bound needs a pytest pin.

HDR_MAX_BITS = 40  # values up to 2^40 — lengths/latency-µs territory


def _hdr_bitlen(col: Column) -> Column:
    """bit_length(v) for v ≥ 1 as the integer comparison ladder (the
    _hll_cols trick — no float log at bin boundaries in any engine)."""
    bl = None
    for i in range(HDR_MAX_BITS):
        term = (col >= F.lit(1 << i)).cast("int")
        bl = term if bl is None else bl + term
    return bl


def hdr_bin(col: Column, s: int = 16) -> Column:
    """HDR bin id of an integer value: octave b = bit_length(v)−1,
    minor = (v − 2^b)·s div 2^b → bin = b·s + minor. Values < 1 clamp
    to bin 0 (the v=1 bucket)."""
    v = F.greatest(col.cast("long"), F.lit(1))
    b = (_hdr_bitlen(v) - 1).cast("long")
    # 2^b as pow→long: exact for b ≤ 40 (well under double's 2^53)
    low = F.pow(F.lit(2.0), b.cast("double")).cast("long")
    minor = ((v - low) * s).cast("long") / low
    return (b * s + F.floor(minor)).cast("long")


def hdr_build(
    values: DataFrame, col: str = "value", s: int = 16, by: list[str] | None = None
) -> DataFrame:
    """(…by, bin, cnt) — one partial-aggregated groupBy; ≤ 40·s bins per
    group regardless of input size. Merge two histograms by unioning and
    summing counts (hdr_merge)."""
    keys = (by or []) + [hdr_bin(F.col(col), s).alias("bin")]
    return values.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def hdr_merge(a: DataFrame, b: DataFrame, by: list[str] | None = None) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy(*((by or []) + ["bin"]))
        .agg(F.sum("cnt").alias("cnt"))
    )


def hdr_quantiles(
    hist: DataFrame,
    qs: list[tuple[int, int]] = ((1, 2), (9, 10), (99, 100)),
    s: int = 16,
    by: list[str] | None = None,
) -> DataFrame:
    """(…by, q_num, q_den, value) — quantile readout: rank threshold
    k = ceil(n·num/den) (exact integer), value = LOWER BOUND of the
    first bin whose cumulative count reaches k: 2^b + minor·2^b div s.
    All integers → gate-able exactly; the true quantile lies within a
    factor (1 + 1/s) of the readout (pytest-pinned)."""
    from pyspark.sql import Window

    keys = by or []
    w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).join(
        hist.groupBy(*keys).agg(F.sum("cnt").alias("n")), keys or None, "inner"
    ) if keys else hist.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
        F.broadcast(hist.agg(F.sum("cnt").alias("n")))
    )
    qdf = hist.sparkSession.createDataFrame(
        [(int(a), int(b)) for a, b in qs], "q_num long, q_den long"
    )
    j = cum.crossJoin(F.broadcast(qdf))
    k = F.floor((F.col("n") * F.col("q_num") + F.col("q_den") - 1) / F.col("q_den"))
    hit = j.filter(F.col("cum") >= k)
    pick = Window.partitionBy(*(keys + ["q_num", "q_den"])).orderBy("bin")
    b = F.floor(F.col("bin") / s).cast("long")
    low = F.pow(F.lit(2.0), b.cast("double")).cast("long")
    minor = F.col("bin") - b * s
    val = low + F.floor(minor * low / s)
    return (
        hit.withColumn("_r", F.row_number().over(pick))
        .filter(F.col("_r") == 1)
        .select(*keys, "q_num", "q_den", val.cast("long").alias("value"))
    )
