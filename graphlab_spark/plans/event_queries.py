"""Event-time query surface over the ``events`` testdata table — each
entry pairs the DataFrame plan (operators/events.py) with its exact
DuckDB oracle.

Oracle notes:
- e01: epoch-aligned 1-hour ``F.window`` ≡ ``date_trunc('hour', ts)``.
- e02: Spark ``session_window`` merges on ts <= prev + gap (INCLUSIVE —
  pinned by test_events.py::test_session_boundary_semantics), expressed
  in SQL as the classic gaps-and-islands lag/cumsum.
- Timestamps render as strings on both sides (driver contract);
  ``strftime`` and ``date_format`` both floor sub-second digits.
"""

from __future__ import annotations

from graphlab_spark.operators import events as EV
from graphlab_spark.plans.relational import _t, q


@q(
    "e01_windowed_event_counts",
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, "
    "event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value "
    "FROM events GROUP BY 1, 2",
    "event-time tumbling-window rollup (ref processing_job.py:14-30 timestamps)",
)
def e01(spark, sf):
    return EV.windowed_counts(_t(spark, sf, "events"))


@q(
    "e04_sliding_window_counts",
    # Spark's F.window(ts, 1h, 15m) assigns each event to the 4
    # epoch-aligned 15-min-grid starts in (ts-1h, ts]; mirrored by
    # flooring ts to the slide grid and stepping back k=0..3 slides.
    "SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts) "
    "- k * INTERVAL 15 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_start, "
    "event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value "
    "FROM events CROSS JOIN generate_series(0, 3) AS t(k) GROUP BY 1, 2",
    "event-time SLIDING-window rollup (1h windows every 15min) — the "
    "overlapping-window counterpart of e01",
)
def e04(spark, sf):
    return EV.sliding_counts(_t(spark, sf, "events"))


@q(
    "e02_user_sessions",
    "WITH flagged AS ("
    "  SELECT user_id, ts, value,"
    "    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)"
    "              <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_s"
    "  FROM events"
    "), sess AS ("
    "  SELECT user_id, ts, value,"
    "    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts"
    "                     ROWS UNBOUNDED PRECEDING) AS sid"
    "  FROM flagged) "
    "SELECT user_id,"
    " strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,"
    " strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,"
    " COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value "
    "FROM sess GROUP BY user_id, sid",
    "per-user session windows, 30-min inactivity gap",
)
def e02(spark, sf):
    return EV.sessionize(_t(spark, sf, "events"))


@q(
    "e05_value_percentiles",
    "SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS p50, "
    "ROUND(quantile_cont(value, 0.95), 4) AS p95, "
    "ROUND(quantile_cont(value, 0.99), 4) AS p99 "
    "FROM events GROUP BY event_type",
    "per-type value percentiles: exact linear-interpolation percentile "
    "(≡ quantile_cont); approx_percentile is the mergeable 100-TB path",
)
def e05(spark, sf):
    return EV.value_percentiles(_t(spark, sf, "events"))


@q(
    "e03_props_json_stats",
    "SELECT event_type, COUNT(*) AS n,"
    " ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 2) AS avg_k,"
    " MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k "
    "FROM events GROUP BY event_type",
    "typed JSON-props extraction + per-type stats (codegen get_json_object)",
)
def e03(spark, sf):
    return EV.props_stats(_t(spark, sf, "events"))


@q(
    "e06_asof_join_last_purchase",
    # DuckDB's native ASOF JOIN is the oracle for the union+running-
    # window plan (operators/events.py asof_join). Right side deduped
    # to one row per (user_id, ts) on both sides (determinism contract).
    "WITH rt AS ("
    "  SELECT user_id, ts, MAX(event_id) AS r_event_id,"
    "         MAX_BY(value, event_id) AS r_value"
    "  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) "
    "SELECT l.event_id, l.user_id,"
    " strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,"
    " strftime(rt.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,"
    " rt.r_event_id AS purchase_event_id,"
    " ROUND(rt.r_value, 2) AS purchase_value "
    "FROM (SELECT event_id, user_id, ts FROM events"
    "      WHERE event_type = 'error') l "
    "ASOF LEFT JOIN rt ON l.user_id = rt.user_id AND rt.ts <= l.ts",
    "backward as-of join: each error event annotated with the user's "
    "most recent prior-or-equal purchase (point-in-time attribution; "
    "single-shuffle union+running-window plan, no range-join blow-up)",
)
def e06(spark, sf):
    from pyspark.sql import functions as F

    ev = _t(spark, sf, "events")
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("event_id"),
            F.expr("max_by(value, event_id)").alias("value"),
        )
    )
    j = EV.asof_join(left, right, key="user_id", ts="ts", prefix="p_")
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", EV.TS_FMT).alias("ts_str"),
        F.date_format("p_ts", EV.TS_FMT).alias("purchase_ts"),
        F.col("p_event_id").alias("purchase_event_id"),
        F.round("p_value", 2).alias("purchase_value"),
    )


_FUNNEL = ["signup", "view", "click", "purchase"]

# greedy earliest-chain funnel CTEs: stage i = MIN ts of its type
# at-or-after stage i-1's matched ts — the same chain of conditional
# MIN aggregations on both engines; shared by e07 and e11
_FUNNEL_CTE = (
    "WITH u AS (SELECT DISTINCT user_id FROM events), "
    "s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events "
    " WHERE event_type = 'signup' GROUP BY 1), "
    "s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e "
    " JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1 "
    " WHERE e.event_type = 'view' GROUP BY 1), "
    "s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e "
    " JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2 "
    " WHERE e.event_type = 'click' GROUP BY 1), "
    "s4 AS (SELECT e.user_id, MIN(e.ts) AS t4 FROM events e "
    " JOIN s3 ON e.user_id = s3.user_id AND e.ts >= s3.t3 "
    " WHERE e.event_type = 'purchase' GROUP BY 1) "
)
_FUNNEL_JOINED = (
    "FROM u LEFT JOIN s1 ON u.user_id = s1.user_id "
    "LEFT JOIN s2 ON u.user_id = s2.user_id "
    "LEFT JOIN s3 ON u.user_id = s3.user_id "
    "LEFT JOIN s4 ON u.user_id = s4.user_id"
)
_STAGE_CASE = (
    "CAST(CASE WHEN t4 IS NOT NULL THEN 4 WHEN t3 IS NOT NULL THEN 3 "
    " WHEN t2 IS NOT NULL THEN 2 WHEN t1 IS NOT NULL THEN 1 "
    " ELSE 0 END AS BIGINT)"
)


@q(
    "e07_funnel_stages",
    _FUNNEL_CTE +
    "SELECT u.user_id, " +
    _STAGE_CASE + " AS stage_reached, "
    "strftime(t1, '%Y-%m-%d %H:%M:%S') AS t_signup, "
    "strftime(t2, '%Y-%m-%d %H:%M:%S') AS t_view, "
    "strftime(t3, '%Y-%m-%d %H:%M:%S') AS t_click, "
    "strftime(t4, '%Y-%m-%d %H:%M:%S') AS t_purchase "
    + _FUNNEL_JOINED,
    "ordered event funnel (signup -> view -> click -> purchase): greedy "
    "earliest-chain per user; one conditional-MIN agg + left join per "
    "stage, all keyed on user_id so co-partitioning is reused end-to-end",
)
def e07(spark, sf):
    from pyspark.sql import functions as F

    j = EV.funnel_stages(_t(spark, sf, "events"), _FUNNEL)
    return j.select(
        "user_id",
        "stage_reached",
        *[
            F.date_format(f"t_{s}", EV.TS_FMT).alias(f"t_{s}")
            for s in _FUNNEL
        ],
    )


@q(
    "e08_cohort_retention",
    # cohort = Monday-truncated week of first event; week_index =
    # (active_week - cohort_week)/7 days, exact because both dates are
    # week starts. DuckDB date_trunc('week') is Monday-based like
    # Spark's.
    "WITH f AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE)"
    " AS cw FROM events GROUP BY 1), "
    "a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE)"
    " AS wk FROM events) "
    "SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, "
    "date_diff('day', cw, wk) // 7 AS week_index, "
    "COUNT(DISTINCT a.user_id) AS n_users "
    "FROM a JOIN f USING (user_id) GROUP BY 1, 2",
    "weekly cohort-retention triangle: first-event cohort x weeks-since "
    "distinct actives; both heavy aggs key on user_id (co-partitioned "
    "join), final grid is O(weeks^2) regardless of input size",
)
def e08(spark, sf):
    from pyspark.sql import functions as F

    r = EV.cohort_retention(_t(spark, sf, "events"))
    return r.select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_index",
        "n_users",
    )


@q(
    "e09_resampled_counts",
    # complete hourly grid between corpus min/max hours, empty buckets
    # as 0 — generate_series mirrors Spark's sequence+explode (both
    # inclusive of the upper bound)
    "WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS mn, "
    "date_trunc('hour', MAX(ts)) AS mx FROM events), "
    "g AS (SELECT UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) "
    " AS ws FROM b WHERE mn IS NOT NULL), "
    "c AS (SELECT date_trunc('hour', ts) AS ws, COUNT(*) AS n, "
    " SUM(value) AS sv FROM events GROUP BY 1) "
    "SELECT strftime(g.ws, '%Y-%m-%d %H:%M:%S') AS window_start, "
    "COALESCE(n, 0) AS n_events, ROUND(COALESCE(sv, 0), 2) AS sum_value "
    "FROM g LEFT JOIN c ON g.ws = c.ws",
    "gap-filling hourly resample: complete min-to-max grid with empty "
    "buckets as 0; counts are the e01 partial-agg shuffle, the grid "
    "comes from a 1-row min/max agg via sequence+explode (no driver "
    "loop), and the final join is O(hours) x O(hours)",
)
def e09(spark, sf):
    from pyspark.sql import functions as F

    r = EV.resample_counts(_t(spark, sf, "events"))
    return r.select(
        F.date_format("window_start", EV.TS_FMT).alias("window_start"),
        "n_events",
        "sum_value",
    )


@q(
    "e10_anomalous_hours",
    # z-score over the e09 gap-filled grid; stddev_pop + one cross-joined
    # 1-row stats agg on both engines; the |z|>2 cut uses the UNROUNDED
    # ratio on both sides, ROUND 4 only on the reported column
    "WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS mn, "
    "date_trunc('hour', MAX(ts)) AS mx FROM events), "
    "g AS (SELECT UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) "
    " AS ws FROM b WHERE mn IS NOT NULL), "
    "c AS (SELECT date_trunc('hour', ts) AS ws, COUNT(*) AS n "
    " FROM events GROUP BY 1), "
    "grid AS (SELECT g.ws, COALESCE(n, 0) AS n FROM g LEFT JOIN c "
    " ON g.ws = c.ws), "
    "st AS (SELECT AVG(n) AS mu, stddev_pop(n) AS sd FROM grid) "
    "SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, "
    "n AS n_events, ROUND((n - mu) / sd, 4) AS zscore "
    "FROM grid, st WHERE sd > 0 AND abs((n - mu) / sd) > 2.0",
    "hourly anomaly detection: |z| > 2 vs the corpus mean over the "
    "gap-filled grid (zero-count hours surface too); every post-count "
    "frame is O(hours), stats broadcast back from a 1-row agg",
)
def e10(spark, sf):
    from pyspark.sql import functions as F

    r = EV.anomalous_hours(_t(spark, sf, "events"), z=2.0)
    return r.select(
        F.date_format("window_start", EV.TS_FMT).alias("window_start"),
        "n_events",
        "zscore",
    )


@q(
    "e11_funnel_summary",
    # conversion report over the e07 chain: exact + cumulative counts
    # per stage; the running-sum window runs over a ≤(stages+1)-row frame
    _FUNNEL_CTE
    + "SELECT stage_reached, COUNT(*) AS n_exact, "
    "CAST(SUM(COUNT(*)) OVER (ORDER BY stage_reached DESC "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    " AS n_at_least "
    f"FROM (SELECT {_STAGE_CASE} AS stage_reached {_FUNNEL_JOINED}) "
    "GROUP BY 1",
    "funnel conversion report: users per exact stage + cumulative "
    "users reaching at least each stage; the heavy work is e07's "
    "user_id-keyed chain, the summary agg partial-aggregates to a "
    "(stages+1)-row frame where the running-sum window is free — "
    "registered parked (e07 carries the recorded funnel gate)",
)
def e11(spark, sf):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    j = EV.funnel_stages(_t(spark, sf, "events"), _FUNNEL)
    per = j.groupBy("stage_reached").agg(F.count(F.lit(1)).alias("n_exact"))
    w = (
        Window.orderBy(F.col("stage_reached").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.select(
        "stage_reached",
        "n_exact",
        F.sum("n_exact").over(w).alias("n_at_least"),
    )


@q(
    "e12_interval_range_join",
    # 10 synthetic intervals derived from the corpus min hour (start =
    # mn + i*71h, length = (i%5)+1 hours); DuckDB executes the range
    # join natively (IEJoin), Spark runs the BINNED equi-join plan —
    # identical results is exactly the point
    "WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS mn FROM events), "
    "iv AS (SELECT i AS interval_id, "
    " mn + i * INTERVAL 71 HOUR AS t_start, "
    " mn + i * INTERVAL 71 HOUR + ((i % 5) + 1) * INTERVAL 1 HOUR "
    "  AS t_end "
    " FROM b, UNNEST(generate_series(0, 9)) AS t(i)), "
    "c AS (SELECT iv.interval_id, COUNT(*) AS n FROM iv JOIN events e "
    " ON e.ts >= iv.t_start AND e.ts < iv.t_end GROUP BY 1) "
    "SELECT iv.interval_id, "
    "strftime(t_start, '%Y-%m-%d %H:%M:%S') AS t_start, "
    "strftime(t_end, '%Y-%m-%d %H:%M:%S') AS t_end, "
    "COALESCE(n, 0) AS n_events "
    "FROM iv LEFT JOIN c USING (interval_id)",
    "interval-containment range join via hour-bin equi-join: intervals "
    "explode to their overlapping bins (fan-out = interval length), "
    "events map to ONE bin in the scan, the range predicate is a "
    "residual filter after a plain hash join — O(events + "
    "intervals*bins), never events x intervals; zero-count intervals "
    "kept",
)
def e12(spark, sf):
    from pyspark.sql import functions as F

    ev = _t(spark, sf, "events")
    b = ev.agg(F.date_trunc("hour", F.min("ts")).alias("_mn"))
    iv = b.select(
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("interval_id"), "_mn"
    ).select(
        "interval_id",
        F.expr("_mn + make_interval(0, 0, 0, 0, interval_id * 71, 0, 0)").alias(
            "t_start"
        ),
        F.expr(
            "_mn + make_interval(0, 0, 0, 0, "
            "interval_id * 71 + (interval_id % 5) + 1, 0, 0)"
        ).alias("t_end"),
    )
    r = EV.interval_counts(ev, iv)
    return r.select(
        "interval_id",
        F.date_format("t_start", EV.TS_FMT).alias("t_start"),
        F.date_format("t_end", EV.TS_FMT).alias("t_end"),
        "n_events",
    )


@q(
    "e13_band_join",
    # Temporal band join: (purchase, error) pairs within ±600 s. DuckDB
    # executes the inequality join natively (IEJoin); Spark runs the
    # BINNED ±1-bucket equi-join plan — identical results is the point.
    # dt is exact integer microseconds so the compare is hash-exact.
    # Parked past the recorded cap BY DESIGN: e12 carries the
    # inequality-join family's recorded gate; orphan-gated.
    "SELECT a.event_id AS a_id, b.event_id AS b_id, "
    "epoch_us(b.ts) - epoch_us(a.ts) AS dt_us "
    "FROM events a JOIN events b "
    "ON a.event_type = 'purchase' AND b.event_type = 'error' "
    "AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 600000000",
    "temporal band join (|Δt| ≤ 600 s event-pair correlation): bin-"
    "exploded hash EQUI-join + residual predicate — one hash join, "
    "never a nested loop over events × events",
)
def e13(spark, sf):
    from pyspark.sql import functions as F

    ev = _t(spark, sf, "events")
    pairs = EV.band_join(
        ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("a_id"), "ts"
        ),
        ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("b_id"), F.col("ts").alias("ts2")
        ),
        delta_us=600_000_000,
        l_ts="ts",
        r_ts="ts2",
    )
    return pairs.select("a_id", "b_id", F.col("dt_us").cast("long").alias("dt_us"))
