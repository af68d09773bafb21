"""Event-time analytics semantics (operators/events.py). The sf0.01
oracle equivalence (e01/e02/e03) is the driver's CORRECTNESS gate; these
tests pin the SEMANTICS the oracles were written against."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphlab_spark.operators import events as EV

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, et, v, p) for i, (ts, uid, et, v, p) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )


def test_session_boundary_semantics(spark):
    """Pin the inclusive-gap merge rule the e02 oracle encodes: events
    EXACTLY one gap apart share a session; one microsecond beyond splits.
    session_end = last event ts + gap."""
    rows = [
        (T0, 1, "a", 1.0, "{}"),
        (T0 + dt.timedelta(minutes=30), 1, "a", 1.0, "{}"),  # exactly gap
        (T0, 2, "a", 1.0, "{}"),
        (T0 + dt.timedelta(minutes=30, microseconds=1), 2, "a", 1.0, "{}"),
    ]
    out = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in EV.sessionize(_events(spark, rows)).collect()
    }
    assert (1, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 2) in out
    assert sum(1 for u, *_ in out if u == 2) == 2  # split into two sessions


def test_windowed_counts_epoch_alignment(spark):
    """1-hour F.window starts == date_trunc('hour') for every event —
    the identity the e01 oracle relies on."""
    rows = [
        (T0 + dt.timedelta(minutes=m), 1, "click", 0.5, "{}")
        for m in (0, 59, 60, 61, 125)
    ]
    got = {
        (r.window_start, r.n_events)
        for r in EV.windowed_counts(_events(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", 2),
        ("2024-01-01 01:00:00", 2),
        ("2024-01-01 02:00:00", 1),
    }


def test_props_stats_null_safe(spark):
    """Missing/corrupt JSON contributes NULL to avg/max but still counts
    in n (AVG ignores nulls on both engines)."""
    rows = [
        (T0, 1, "view", 0.0, '{"k": 10}'),
        (T0, 1, "view", 0.0, '{"k": 20}'),
        (T0, 1, "view", 0.0, "not json"),
        (T0, 1, "view", 0.0, '{"other": 1}'),
    ]
    r = EV.props_stats(_events(spark, rows)).collect()[0]
    assert (r.n, r.avg_k, r.max_k) == (4, 15.0, 20)


def test_windowed_counts_plan_is_partial_agg(spark):
    """Scale posture: the rollup must partial-aggregate map-side (one
    exchange keyed by window+type, count/sum combined before shuffle)."""
    plan = EV.windowed_counts(
        _events(spark, [(T0, 1, "a", 1.0, "{}")])
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial" in plan.lower()
    assert plan.lower().count("exchange") <= 2  # agg exchange (+AQE read)


def test_sliding_counts_overlap_factor(spark):
    """Each event lands in exactly width/slide = 4 overlapping windows."""
    from graphlab_spark.operators.events import sliding_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_events = ev.count()
    total = sliding_counts(ev).agg(F.sum("n_events")).collect()[0][0]
    assert total == 4 * n_events


def test_value_percentiles_exact_vs_approx(spark):
    """approx_percentile (the mergeable 100-TB path) returns an order
    statistic whose EMPIRICAL RANK is within a small band of the target
    quantile — the right bound (a value-distance band breaks on sparse
    tails, where exact interpolates between distant points)."""
    from graphlab_spark.operators.events import value_percentiles

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    approx = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in value_percentiles(ev, exact=False, accuracy=10000).collect()
    }
    rows = ev.select("event_type", "value").collect()
    by_type: dict = {}
    for r in rows:
        if r.value is not None:
            by_type.setdefault(r.event_type, []).append(r.value)
    assert set(approx) == set(by_type)
    for et, (a50, a95, a99) in approx.items():
        vals = sorted(by_type[et])
        n = len(vals)
        for target, a in [(0.5, a50), (0.95, a95), (0.99, a99)]:
            rank_le = sum(1 for v in vals if v <= a) / n
            rank_lt = sum(1 for v in vals if v < a) / n
            # the empirical quantile interval covering `a` must overlap
            # [target - slack, target + slack]; slack covers sketch error
            # plus the 1/n discrete mass of tiny groups
            slack = 0.02 + 1.0 / n
            assert rank_le >= target - slack and rank_lt <= target + slack, (
                et, target, a, rank_lt, rank_le)


def test_funnel_greedy_semantics(spark):
    import datetime as dt

    from graphlab_spark.operators.events import funnel_stages

    def t(h):
        return dt.datetime(2024, 1, 1, h)

    rows = [
        # user 1 completes in order
        (1, t(1), "signup"), (1, t(2), "view"), (1, t(3), "click"),
        (1, t(4), "purchase"),
        # user 2: purchase BEFORE click → stops at click (stage 3)
        (2, t(1), "signup"), (2, t(2), "view"), (2, t(4), "click"),
        (2, t(3), "purchase"),
        # user 3: no signup at all → stage 0 despite later events
        (3, t(1), "view"), (3, t(2), "click"), (3, t(3), "purchase"),
        # user 4: simultaneous signup+view (inclusive tie matches)
        (4, t(5), "signup"), (4, t(5), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r.user_id: r
        for r in funnel_stages(
            ev, ["signup", "view", "click", "purchase"]
        ).collect()
    }
    assert got[1].stage_reached == 4 and got[1].t_purchase == t(4)
    assert got[2].stage_reached == 3 and got[2].t_purchase is None
    assert got[3].stage_reached == 0 and got[3].t_signup is None
    assert got[4].stage_reached == 2 and got[4].t_view == t(5)
    # greedy chain is monotone: nulls only AFTER the reached stage
    for u, r in got.items():
        ts_list = [r.t_signup, r.t_view, r.t_click, r.t_purchase]
        seen_null = False
        for v in ts_list:
            if v is None:
                seen_null = True
            else:
                assert not seen_null


def test_cohort_retention_semantics(spark):
    import datetime as dt

    from graphlab_spark.operators.events import cohort_retention

    # Mondays: 2024-01-01 (w0), 2024-01-08 (w1), 2024-01-15 (w2)
    def d(day, h=12):
        return dt.datetime(2024, 1, day, h)

    rows = [
        # user 1: cohort w0, active w0 and w2 (twice in w2 -> one active week)
        (1, d(3), "view"), (1, d(16), "click"), (1, d(17), "view"),
        # user 2: cohort w0, active w0 only
        (2, d(1), "view"),
        # user 3: cohort w1, active w1 and w2
        (3, d(9), "view"), (3, d(15), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        (str(r.cohort_week), r.week_index): r.n_users
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_resample_fills_gaps(spark):
    import datetime as dt

    from graphlab_spark.operators.events import resample_counts

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 15), 2.0),
        (2, dt.datetime(2024, 1, 1, 10, 45), 3.0),
        # gap: hours 11 and 12 empty
        (3, dt.datetime(2024, 1, 1, 13, 5), 1.5),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    got = {
        r.window_start.hour: (r.n_events, r.sum_value)
        for r in resample_counts(ev).collect()
    }
    assert got == {10: (2, 5.0), 11: (0, 0.0), 12: (0, 0.0), 13: (1, 1.5)}


def test_resample_empty_input(spark):
    import datetime as dt  # noqa: F401

    from graphlab_spark.operators.events import resample_counts

    ev = spark.createDataFrame([], "event_id long, ts timestamp, value double")
    assert resample_counts(ev).count() == 0


def test_anomalous_hours_flags_spike_and_gap(spark):
    import datetime as dt

    from graphlab_spark.operators.events import anomalous_hours

    # 12 hours: baseline 10 events/hour, hour 5 spikes to 60, hour 8
    # empty (gap) — both must surface
    rows = []
    eid = 0
    for h in range(12):
        n = 60 if h == 5 else (0 if h == 8 else 10)
        for _ in range(n):
            rows.append((eid, dt.datetime(2024, 1, 1, h, 30)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {r.window_start.hour: r.zscore for r in anomalous_hours(ev, z=2.0).collect()}
    assert 5 in got and got[5] > 2
    assert set(got) == {5}  # z=2 on this series flags only the spike
    got15 = {
        r.window_start.hour: r.zscore
        for r in anomalous_hours(ev, z=0.5).collect()
    }
    assert 8 in got15 and got15[8] < 0  # the empty hour at a looser cut


def test_anomalous_hours_constant_series_empty(spark):
    import datetime as dt

    from graphlab_spark.operators.events import anomalous_hours

    rows = [(i, dt.datetime(2024, 1, 1, i % 4, 0)) for i in range(8)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    assert anomalous_hours(ev).count() == 0  # sd == 0 → no anomalies


def test_interval_counts_binned_range_join(spark):
    import datetime as dt

    from graphlab_spark.operators.events import interval_counts

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 0)),   # == start (inclusive)
            (2, dt.datetime(2024, 1, 1, 11, 59)),  # inside
            (3, dt.datetime(2024, 1, 1, 12, 0)),   # == end (exclusive)
            (4, dt.datetime(2024, 1, 2, 5, 30)),   # inside second
            (5, dt.datetime(2024, 1, 3, 0, 0)),    # outside all
        ],
        "event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 1, 10, 0), dt.datetime(2024, 1, 1, 12, 0)),
            (1, dt.datetime(2024, 1, 2, 5, 0), dt.datetime(2024, 1, 2, 6, 0)),
            (2, dt.datetime(2024, 1, 4, 0, 0), dt.datetime(2024, 1, 4, 1, 0)),
        ],
        "interval_id long, t_start timestamp, t_end timestamp",
    )
    got = {r.interval_id: r.n_events for r in interval_counts(ev, iv).collect()}
    assert got == {0: 2, 1: 1, 2: 0}  # inclusive start, exclusive end, zero kept


def test_band_join_exact_pairs_and_no_duplicates(spark):
    from datetime import datetime

    from graphlab_spark.operators.events import band_join
    from pyspark.sql import functions as F

    base = datetime(2024, 1, 1)

    def at(sec):
        return datetime(2024, 1, 1, 0, sec // 60, sec % 60)

    left = spark.createDataFrame(
        [(1, at(0)), (2, at(100))], "a_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, at(5)), (11, at(59)), (12, at(61)), (13, at(160))],
        "b_id long, ts2 timestamp",
    )
    got = {
        (r.a_id, r.b_id): r.dt_us
        for r in band_join(left, right, 60_000_000, "ts", "ts2").collect()
    }
    # a=0s matches 5s (+5) and 59s (+59) but not 61s; a=100s matches
    # 59s (−41), 61s (−39), 160s (+60, inclusive boundary)
    assert got == {
        (1, 10): 5_000_000,
        (1, 11): 59_000_000,
        (2, 11): -41_000_000,
        (2, 12): -39_000_000,
        (2, 13): 60_000_000,
    }
    # exactly-once per qualifying pair (the 3-bin explode never dups)
    rows = band_join(left, right, 60_000_000, "ts", "ts2").count()
    assert rows == len(got)


def test_band_join_plan_is_equi_join(spark):
    from graphlab_spark.operators.events import band_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = ev.select(F.col("event_id").alias("a_id"), "ts")
    b = ev.select(F.col("event_id").alias("b_id"), F.col("ts").alias("ts2"))
    plan = (
        band_join(a, b, 600_000_000, "ts", "ts2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_null_payload_column_not_blended(spark):
    """r4 ADVICE: a right row with a legitimately NULL payload column
    must NOT hand that column to an older right row — all r_* columns
    come from the same matched right row (single-struct carry)."""
    from graphlab_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, 50), (1, 150)], "user_id int, ts long"
    )
    right = spark.createDataFrame(
        [(1, 10, "old_price", "old_cat"), (1, 100, None, "new_cat")],
        "user_id int, ts long, price string, cat string",
    )
    got = {r.ts: r for r in asof_join(left, right).collect()}
    # left@50 matches right@10 fully
    assert (got[50].r_price, got[50].r_cat) == ("old_price", "old_cat")
    # left@150 matches right@100: price must be NULL (that row's value),
    # never "old_price" blended in from right@10
    assert got[150].r_ts == 100
    assert got[150].r_cat == "new_cat"
    assert got[150].r_price is None
