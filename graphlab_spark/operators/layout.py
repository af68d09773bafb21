"""Z-order (Morton) layout keys for multi-dimensional file clustering.

Sorting a table by one column gives min/max-footer pruning on that
column only; interleaving the bits of TWO columns (the Z-order curve —
Delta's ``OPTIMIZE ZORDER BY``, Iceberg's sort-order z-curve) makes one
sort key locality-preserving in both, so range predicates on either
column prune files. The key computation is pure JVM bit algebra
(shiftright / AND / shiftleft — whole-stage codegen, zero shuffle);
the write path adds the one range-partitioned sort every clustered
write already pays.

Inputs are masked to the low ``bits`` bits, so callers normalize each
dimension (e.g. ``% 2^bits`` or a bucketized rank) first; 16+16 bits
fit a 32-bit curve in a long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(c1: str | Column, c2: str | Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: bit i of ``c1`` lands at position 2i, of ``c2`` at 2i+1."""
    a = F.col(c1) if isinstance(c1, str) else c1
    b = F.col(c2) if isinstance(c2, str) else c2
    a = a.cast("long")
    b = b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def zorder_key_n(cols: list[str | Column], bits: int = 8) -> Column:
    """N-column Morton interleave: bit i of column j lands at position
    i·k + j (k = len(cols)). ``bits·k`` must fit a long (≤ 62). The
    2-column :func:`zorder_key` is the k=2 special case; ZORDER BY over
    3-4 columns is the common lakehouse request this covers."""
    k = len(cols)
    if bits * k > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z + F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
    return z


def zorder_sql_expr(c1: str, c2: str, bits: int = 16) -> str:
    """The identical bit algebra as ANSI SQL (DuckDB-runnable) — the
    oracle replays it so the Spark expression is value-gated."""
    terms = []
    for i in range(bits):
        terms.append(f"((({c1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({c2} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    bits: int = 16,
    n_files: int = 32,
) -> None:
    """Cluster ``df`` on the z-curve of ``cols`` and write ``n_files``
    parquet files: range-partition by the key (sampled bounds — never a
    single-reducer global sort), sort within each file, drop the key.
    Files then carry tight min/max footers in BOTH dimensions."""
    keyed = df.withColumn("_z", zorder_key(*cols, bits=bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
