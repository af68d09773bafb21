"""Event-time analytics over the ``events`` table: tumbling-window
aggregation, session windows, and JSON-props extraction.

Reference parity: the reference tracks per-lab processing jobs with
created/started/finished timestamps and per-job progress counters
(``backend/app/models/processing_job.py:14-30``) and surfaces activity
summaries over them; these operators are the Spark-native generalization
— event-time rollups a large-scale ingest pipeline needs (hourly
throughput, per-user crawl sessions, typed metadata pulled out of a JSON
props column).

Spark-first posture: every plan here is pure DataFrame algebra —
``F.window`` / ``F.session_window`` / ``get_json_object`` are JVM-side
and whole-stage-codegen'd; there is no Python in the row path. The same
plan functions serve batch queries (DuckDB-oracled) and Structured
Streaming (``streaming/rollup.py`` adds the watermark).

Scale: one hash-aggregate shuffle keyed by (window, event_type) — at
1000 executors the map-side partial aggregation collapses each
partition's rows to one row per (hour, type) before the exchange, so
shuffle volume is O(hours × types), independent of input rows.
``session_window`` shuffles by user_id; skewed users are bounded by the
gap parameter (a user's events merge into few sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def windowed_counts(
    events: DataFrame, width: str = "1 hour", rounded: bool = True
) -> DataFrame:
    """Tumbling-window throughput rollup: (window_start, event_type) →
    n_events, sum_value. Epoch-aligned windows (``F.window`` default), so
    ``width='1 hour'`` matches ``date_trunc('hour', ts)`` exactly.

    ``rounded=False`` keeps the exact double sum — required by the
    additive streaming rollup, which must not round per-batch partials
    (rounding is only stable applied once, at the end).
    """
    sum_v = F.sum("value")
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(sum_v, 2) if rounded else sum_v).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """SLIDING-window throughput rollup: every event contributes to
    ``width/slide`` overlapping epoch-aligned windows (``F.window`` with
    a slide duration). Same partial-agg shuffle shape as the tumbling
    form — shuffle volume grows by the overlap factor (windows × types),
    still independent of input rows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def value_percentiles(
    events: DataFrame,
    ps: tuple = (0.5, 0.95, 0.99),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-event-type value percentiles (p50/p95/p99 — the latency/size
    distribution surface every rollup dashboard needs).

    ``exact=True`` uses Spark's exact ``percentile`` aggregate (linear
    interpolation — bit-matches DuckDB ``quantile_cont``, the oracle).
    Exact percentile buffers each group's values — fine while a single
    group fits an executor. At 100 TB use ``exact=False``:
    ``approx_percentile`` (t-digest-style sketch) is mergeable map-side
    like any partial aggregate, O(accuracy) memory per group; its error
    bound vs exact is pinned by test_events.py.
    """
    fn = "percentile" if exact else "approx_percentile"
    extra = "" if exact else f", {accuracy}"
    aggs = [
        F.round(F.expr(f"{fn}(value, {p}{extra})"), 4).alias(f"p{int(p * 100)}")
        for p in ps
    ]
    return events.groupBy("event_type").agg(*aggs)


def sessionize(
    events: DataFrame, gap: str = "30 minutes", rounded: bool = True
) -> DataFrame:
    """Per-user session windows with inactivity gap ``gap``.

    Spark merge semantics (pinned by test_events.py): an event extends
    the current session when its ts is <= previous ts + gap (INCLUSIVE
    boundary — two events exactly one gap apart share a session), and
    session_end = last event ts + gap.
    """
    sum_v = F.sum("value")
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(sum_v, 2) if rounded else sum_v).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT).alias("session_start"),
            F.date_format(F.col("w.end"), TS_FMT).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: each left row gains the columns of the
    LATEST right row with ``right.ts <= left.ts`` for the same ``key``
    (left join — unmatched left rows keep NULLs). The matched right
    timestamp lands in ``{prefix}{ts}``; every other right column in
    ``{prefix}{col}``.

    The classic point-in-time primitive (feature lookup as-of an event,
    last-touch attribution, slowly-changing-dimension reads) that Spark
    has no built-in operator for. A naive range join explodes to
    O(left × right-per-key) then filters; this plan instead UNIONS the
    two sides tagged, sorts each key's timeline ONCE, and carries the
    most recent right values forward with ``last(ignorenulls)`` over a
    running window — one shuffle on ``key``, O(n log n) per key, no
    pair blow-up. Equal timestamps match (right sorts before left at
    ties, making the join inclusive).

    Determinism contract: right must be unique per (key, ts) — dedup
    upstream (e.g. ``max_by`` per key+ts) or ties are resolved
    arbitrarily. At web scale a hot key serializes into one task's
    sort; as-of state is carried by time order, so shard hot keys into
    time buckets (process buckets independently, seeding each bucket
    with the previous bucket's last right row) — the same time-sliced
    recipe Structured Streaming's state store uses.

    The right payload is carried forward as ONE struct with a single
    ``last(ignorenulls)`` — never per-column: per-column carry would
    let a right row with a legitimately NULL payload column hand that
    column to an OLDER right row while the other columns come from the
    newer one, synthesizing a composite right record that never
    existed. All ``{prefix}*`` columns always come from the same
    matched right row.
    """
    rpayload = [c for c in right.columns if c not in (key, ts)]
    lpayload = [c for c in left.columns if c not in (key, ts)]
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rstruct = F.struct(
        F.col(ts).alias(prefix + ts),
        *[F.col(c).alias(prefix + c) for c in rpayload],
    )
    rstruct_type = right.select(rstruct.alias("_r")).schema["_r"].dataType
    l2 = left.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lpayload],
        F.lit(None).cast(rstruct_type).alias("_r"),
    )
    r2 = right.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lpayload],
        rstruct.alias("_r"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l2.unionByName(r2).select(
        F.col(key),
        F.col("_ts"),
        "_side",
        *[F.col(c) for c in lpayload],
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col(key),
        F.col("_ts").alias(ts),
        *[F.col(c) for c in lpayload],
        *[F.col(f"_r.{prefix}{c}").alias(prefix + c) for c in [ts] + rpayload],
    )


def props_stats(events: DataFrame, json_path: str = "$.k") -> DataFrame:
    """Typed extraction from the JSON ``props`` column → per-type stats.

    ``get_json_object`` is a JVM expression (codegen'd, no UDF); at scale
    the extraction happens during the scan projection, before the single
    aggregate shuffle."""
    k = F.get_json_object("props", json_path).cast("int")
    return (
        events.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("_k"), 2).alias("avg_k"),
            F.max("_k").alias("max_k"),
        )
    )


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Greedy ordered-funnel matching per ``key``: stage i matches the
    EARLIEST event of type ``stages[i]`` at-or-after the matched stage
    i-1 timestamp (ties inclusive) → (key, stage_reached, t_<stage>...),
    stage_reached in [0, len(stages)], timestamps NULL beyond the
    reached stage. Every key with any event appears (stage 0 = never
    entered the funnel).

    The greedy earliest-chain is the standard funnel definition
    (monotone: relaxing any prefix cannot help later stages), and it is
    what makes the operator exactly SQL-mirrorable as a chain of
    conditional MIN aggregations.

    Scale shape: one filtered conditional-MIN agg + one left join PER
    STAGE, every one keyed on ``key`` — a single logical shuffle key
    throughout, so co-partitioning is reused across the whole chain
    (bucketing events by key makes the entire funnel exchange-free);
    each stage's agg partial-aggregates map-side. Stage count is fixed
    and small; nothing is ever corpus × corpus.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    res = events.select(key).distinct()
    prev_t = None
    tcols = []
    for i, s in enumerate(stages, 1):
        ev_s = events.filter(F.col(type_col) == s).select(
            key, F.col(ts).alias("_ts")
        )
        tcol = f"t_{s}"
        if prev_t is None:
            ti = ev_s.groupBy(key).agg(F.min("_ts").alias(tcol))
        else:
            ti = (
                ev_s.join(res.select(key, prev_t).filter(F.col(prev_t).isNotNull()), key)
                .filter(F.col("_ts") >= F.col(prev_t))
                .groupBy(key)
                .agg(F.min("_ts").alias(tcol))
            )
        res = res.join(ti, key, "left")
        prev_t = tcol
        tcols.append(tcol)
    reached = None
    for i, c in enumerate(tcols, 1):
        stage_i = F.when(F.col(c).isNotNull(), i).otherwise(0)
        reached = stage_i if reached is None else F.greatest(reached, stage_i)
    return res.select(
        key,
        reached.cast("long").alias("stage_reached"),
        *[F.col(c) for c in tcols],
    )


def cohort_retention(
    events: DataFrame, key: str = "user_id", ts: str = "ts"
) -> DataFrame:
    """Weekly cohort-retention matrix: cohort_week = Monday-truncated
    week of each key's FIRST event; every (key, active week) pair then
    lands in bucket ``week_index = (active_week - cohort_week) / 7``
    days (both week-starts, so the division is exact). Output
    (cohort_week, week_index, n_users) — the classic retention
    triangle; week_index 0 row is the cohort size.

    Scale shape: activity distinct and the first-event MIN both shuffle
    on ``key`` (one logical key, partial-aggregated map-side), their
    join is key-co-partitioned, and the final groupBy lands on the
    (cohort_week, week_index) grid — O(weeks²) rows, independent of
    input size. countDistinct(key) inside one cohort cell is exact
    because a key contributes each active week once (the distinct
    upstream); no expansion joins anywhere.
    """
    wk = F.date_trunc("week", F.col(ts)).cast("date")
    first = (
        events.groupBy(key)
        .agg(F.min(ts).alias("_first_ts"))
        .select(key, F.date_trunc("week", "_first_ts").cast("date").alias("_cw"))
    )
    active = events.select(key, wk.alias("_wk")).distinct()
    return (
        active.join(first, key)
        .groupBy(
            F.col("_cw").alias("cohort_week"),
            F.floor(F.datediff("_wk", "_cw") / 7).cast("long").alias("week_index"),
        )
        .agg(F.count_distinct(key).alias("n_users"))
    )


def resample_counts(
    events: DataFrame, ts: str = "ts", value_col: str | None = "value"
) -> DataFrame:
    """Gap-filling hourly resample: the COMPLETE hour grid from the
    corpus min to max hour (inclusive), each bucket carrying its event
    count and value sum, empty buckets materialized as 0 — the
    time-series shape plotting/anomaly tooling needs (a groupBy alone
    silently drops empty buckets).

    Scale shape: bucket counts are one partial-aggregated shuffle (the
    e01 plan); the grid is generated from a ONE-ROW min/max aggregate
    via ``sequence`` + ``explode`` — O(hours) rows born on an executor,
    never a driver-side loop — and both join sides are O(hours) after
    aggregation, so the final join is broadcast-sized regardless of
    input rows.
    """
    hour = F.date_trunc("hour", F.col(ts))
    bounds = events.agg(
        F.min(hour).alias("_mn"), F.max(hour).alias("_mx")
    )
    grid = bounds.filter(F.col("_mn").isNotNull()).select(
        F.explode(
            F.sequence("_mn", "_mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("window_start")
    )
    with_value = value_col is not None and value_col in events.columns
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if with_value:
        aggs.append(F.sum(value_col).alias("_sv"))
    counts = events.groupBy(hour.alias("window_start")).agg(*aggs)
    cols = [
        "window_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    ]
    if with_value:
        cols.append(
            F.round(F.coalesce("_sv", F.lit(0.0)), 2).alias("sum_value")
        )
    return grid.join(counts, "window_start", "left").select(*cols)


def anomalous_hours(events: DataFrame, z: float = 2.0, ts: str = "ts") -> DataFrame:
    """Hours whose event count deviates from the corpus mean by more
    than ``z`` population standard deviations, over the GAP-FILLED
    hourly grid (``resample_counts`` — zero-count hours are real
    anomalies too, which a bare groupBy would never surface).

    → (window_start, n_events, zscore) with zscore rounded to 4.

    Scale shape: inherits e09's plan (partial-agg counts + 1-row-agg
    grid); the mean/stddev come from ONE more aggregate over the
    O(hours) grid frame, broadcast back — every post-count frame in the
    plan is O(hours), so the anomaly scan costs nothing beyond the
    rollup itself.
    """
    grid = resample_counts(events, ts=ts, value_col=None).select(
        "window_start", "n_events"
    )
    stats = grid.agg(
        F.avg("n_events").alias("_mu"),
        F.stddev_pop("n_events").alias("_sd"),
    )
    return (
        grid.crossJoin(F.broadcast(stats))
        .filter(F.col("_sd") > 0)
        .withColumn(
            "zscore",
            F.round((F.col("n_events") - F.col("_mu")) / F.col("_sd"), 4),
        )
        .filter(F.abs((F.col("n_events") - F.col("_mu")) / F.col("_sd")) > z)
        .select("window_start", "n_events", "zscore")
    )


def interval_counts(
    events: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    id_col: str = "interval_id",
    start_col: str = "t_start",
    end_col: str = "t_end",
) -> DataFrame:
    """Range-containment join: count events with ``start <= ts < end``
    per interval → (id_col, start_col, end_col, n_events), zero-count
    intervals included. The operation a naive plan turns into a
    BroadcastNestedLoopJoin over an inequality predicate — quadratic at
    scale.

    Scale shape — the BINNED range join: each interval explodes to its
    overlapping hour bins (fan-out bounded by interval length), each
    event maps to ONE bin (a scan-stage column), and the join becomes an
    EQUI-join on the bin key with the exact range predicate as a
    residual filter. Cost is O(events + intervals · hours-per-interval)
    through one hash join — never events × intervals. Bin width should
    roughly match typical interval length; hours fit the events corpus.
    """
    sec = lambda c: F.unix_timestamp(F.col(c))  # noqa: E731  (UTC session)
    bins = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(sec(start_col) / 3600),
                F.floor((sec(end_col) - 1) / 3600),
            )
        ),
    )
    hits = (
        events.withColumn("_bin", F.floor(sec(ts) / 3600))
        .join(bins, "_bin")
        .filter((F.col(ts) >= F.col(start_col)) & (F.col(ts) < F.col(end_col)))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        intervals.join(hits, id_col, "left")
        .select(
            id_col,
            start_col,
            end_col,
            F.coalesce("_n", F.lit(0)).alias("n_events"),
        )
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    delta_us: int,
    l_ts: str = "ts",
    r_ts: str = "ts",
) -> DataFrame:
    """Temporal band join: every (left, right) pair with
    ``|ts_r − ts_l| ≤ delta_us`` microseconds → all left columns, all
    right columns, plus ``dt_us = ts_r − ts_l`` (exact integer
    microseconds). The correlation join behind "errors within a minute
    of a purchase" — an inequality predicate a naive plan turns into a
    nested loop.

    Scale shape — the binned band join (the e12 interval pattern, both
    sides moving): bin width = delta, the LEFT side explodes to its bin
    ± 1 (exactly 3 bins — any pair within delta lands in adjacent
    bins), the RIGHT side maps to ONE bin in the scan, and the join is
    an EQUI-join on the bin with the exact band predicate as a residual.
    Each qualifying pair appears exactly once (the 3 exploded bins are
    distinct). Cost O(3·left + right) through one hash join — never
    left × right."""
    lb = left.withColumn("_lus", F.unix_micros(F.col(l_ts).cast("timestamp")))
    lbin = F.floor(F.col("_lus") / delta_us)
    lb = lb.withColumn(
        "_bin", F.explode(F.array(lbin - 1, lbin, lbin + 1))
    )
    rb = right.withColumn(
        "_rus", F.unix_micros(F.col(r_ts).cast("timestamp"))
    ).withColumn(
        "_bin", F.floor(F.col("_rus") / delta_us)
    )
    return (
        lb.join(rb, "_bin")
        .filter(F.abs(F.col("_rus") - F.col("_lus")) <= delta_us)
        .withColumn("dt_us", F.col("_rus") - F.col("_lus"))
        .drop("_bin", "_lus", "_rus")
    )
