"""Driver-replica: run every queries() entry and its DuckDB oracle
side-by-side; compare row-count, schema (column names), and an
order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from graphlab_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df


def value_hash(df: pd.DataFrame) -> str:
    from hashlib import blake2b

    df = norm_frame(df.copy())
    rows = sorted(
        "|".join("" if pd.isna(v) else (f"{v:.6f}" if isinstance(v, float) else str(v)) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    h = blake2b(digest_size=12)
    for r in rows:
        h.update(r.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]
    spark = get_spark("oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    DRIVER_CAP = 50  # the driver's CORRECTNESS harness records only this many
    if len(qs) > DRIVER_CAP:
        beyond = list(qs)[DRIVER_CAP:]
        orphaned = [n for n in beyond if n in oracles]
        print(
            f"WARN  registry has {len(qs)} entries; the driver records only the "
            f"first {DRIVER_CAP}. Beyond the cap: {beyond}"
        )
        if orphaned:
            print(
                f"WARN  ORACLED entries beyond the cap (no driver record — must "
                f"be covered by tests/test_orphan_oracles.py): {orphaned}"
            )
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows, cols={sorted(sdf.columns)} "
                  f"({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {str(ex)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems and value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            s, o = norm_frame(sdf), norm_frame(odf)
            key = sorted(sdf.columns)[0]
            try:
                merged = s.merge(o, how="outer", indicator=True, on=list(s.columns))
                diff = merged[merged["_merge"] != "both"]
                problems.append(f"diff rows: {len(diff)}; sample:\n{diff.head(4)}")
            except Exception:
                pass
        if problems:
            print(f"FAIL  {name}: {'; '.join(str(p) for p in problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
