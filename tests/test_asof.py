"""asof_join (operators/events.py): backward point-in-time semantics —
hand-computed matches, inclusive ties, left-join nulls, and agreement
with DuckDB's native ASOF JOIN on a generated frame."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from graphlab_spark.operators.events import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),
            (2, 10, _ts("2024-01-01 12:00:00")),
            (3, 10, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 20, _ts("2024-01-01 11:00:00")),  # user with no right rows
            (5, 30, _ts("2024-01-01 10:30:00")),  # exact-tie with right
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:30:00"), 101, 5.0),
            (10, _ts("2024-01-01 11:00:00"), 102, 7.0),
            (30, _ts("2024-01-01 10:30:00"), 103, 9.0),
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    return left, right


def test_backward_semantics(frames):
    left, right = frames
    rows = {
        r.event_id: r
        for r in asof_join(left, right, key="user_id", ts="ts", prefix="p_").collect()
    }
    assert rows[1].p_event_id == 101  # latest right ts <= 10:00 is 09:30
    assert rows[2].p_event_id == 102  # 11:00 <= 12:00
    assert rows[3].p_event_id is None and rows[3].p_ts is None  # none prior
    assert rows[4].p_event_id is None  # user 20 has no right rows
    assert rows[5].p_event_id == 103  # equal ts matches (inclusive)
    assert rows[5].p_value == 9.0
    # left columns and row count survive untouched
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[2].user_id == 10 and rows[2].ts == _ts("2024-01-01 12:00:00")


def test_matches_duckdb_asof(spark):
    """Union+running-window plan ≡ DuckDB native ASOF LEFT JOIN on a
    deterministic generated frame (unique right (key, ts) by construction)."""
    left = spark.range(200).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(1704067200 + (F.col("id") * 977) % 86400).alias("ts"),
    )
    right = spark.range(60).select(
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(1704067200 + (F.col("id") * 2113) % 86400).alias("ts"),
        (F.col("id") + 1000).alias("r_id"),
    )
    got = sorted(
        (r.event_id, r.p_r_id)
        for r in asof_join(left, right, key="user_id", ts="ts", prefix="p_").collect()
    )
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    want = sorted(
        map(
            tuple,
            con.sql(
                "SELECT l.event_id, r.r_id FROM l ASOF LEFT JOIN r "
                "ON l.user_id = r.user_id AND r.ts <= l.ts"
            ).fetchall(),
        )
    )
    assert got == want
