"""Event-time windowing over the ``events`` table — the beyond-reference
streaming extension (SURVEY.md §7 phase 6: the reference is processing-time
only, flink-ddl.sql:10; no WATERMARK clause exists anywhere in it).

Each operator is written so its batch form IS the streaming form's result:
`windowed_event_stats` is exactly what `readStream.withWatermark(...)
.groupBy(window(...))` emits once the watermark passes (tested in
tests/test_streaming_extras.py), so correctness is checkable against a SQL
oracle without a streaming trigger.

Scale notes: tumbling/hopping aggs are one shuffle on (window, keys) with
partial aggregation; hop windows fan out rows ×(size/slide) before the
shuffle — that factor is the knob to watch at 100 TB. Sessionization is one
shuffle on user_id then a linear per-partition pass (window functions), the
same shape Spark's native session_window uses.

Determinism: window bounds are formatted strings (UTC), money-style sums go
through DECIMAL (order-independent), microsecond longs for gap arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEC = "decimal(18,6)"
_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_SQL = "%Y-%m-%d %H:%M:%S"


def windowed_event_stats(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type: count + exact sum.
    In streaming this is `withWatermark('ts', ...)` + the same groupBy —
    identical output (append mode emits each window once, final)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


WINDOWED_EVENT_STATS_SQL = f"""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_SQL}') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def hopping_event_stats(events: DataFrame) -> DataFrame:
    """Hopping (sliding) windows: 1-hour size, 30-minute slide — every event
    lands in exactly 2 windows. The ×(size/slide) row fan-out happens before
    the shuffle; at scale prefer the tumbling+re-merge decomposition when
    slide divides size."""
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


HOPPING_EVENT_STATS_SQL = f"""
WITH hops AS (
  SELECT event_type,
         time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start
  FROM events, UNNEST([0, 1]) AS t(k)
)
SELECT strftime(window_start, '{_TS_FMT_SQL}') AS window_start, event_type,
       COUNT(*) AS n_events
FROM hops GROUP BY 1, 2
"""


def hopping_event_stats_decomposed(events: DataFrame) -> DataFrame:
    """The pane-based decomposition of ``hopping_event_stats`` — the scale
    path the hop docstring names: aggregate each 30-minute PANE once (panes
    = gcd(size, slide) tumbling buckets, a plain partial+final agg over the
    raw rows with NO fan-out), then fan each pane out to the ≤ size/slide
    windows containing it and merge. The ×(size/slide) row multiplication
    moves from the raw event stream to the pane relation (|panes| ≈
    #buckets × #keys — bounded by time, not data), so at 100 TB the big
    scan aggregates exactly once. Output ≡ ``hopping_event_stats`` (same
    registry oracle; equivalence also pinned in tests)."""
    pane_s = 30 * 60
    panes = (
        events.groupBy(F.window("ts", "30 minutes").alias("p"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("p.start").cast("timestamp").cast("long").alias("pane_s"),
            "event_type",
            "n",
        )
    )
    fanned = panes.select(
        "event_type",
        "n",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("k"),
        (F.col("pane_s") - F.col("k") * pane_s).alias("w_start_s"),
    )
    return (
        fanned.groupBy("w_start_s", "event_type")
        .agg(F.sum("n").cast("long").alias("n_events"))
        .select(
            F.date_format(F.col("w_start_s").cast("timestamp"), _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


SESSION_GAP_MINUTES = 30


def session_windows(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the gap
    since the previous event exceeds ``gap_minutes``. Formulated with window
    functions (lag + running sum) so the SQL oracle is exact; the streaming
    twin is Spark's native `session_window` / `applyInPandasWithState`."""
    gap_us = gap_minutes * 60 * 1_000_000
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    # NTZ-safe: under parquet inferTimestampNTZ the column loads as
    # TIMESTAMP_NTZ, which unix_micros rejects at analysis time. The cast to
    # (session-tz) TIMESTAMP is a no-op for already-TZ columns and exact for
    # NTZ under our pinned UTC session timezone.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(prev_us.isNull() | ((us - prev_us) > gap_us), 1).otherwise(0)
    sess = (
        events.withColumn("session_idx", F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), _TS_FMT).alias("session_end"),
        )
        .select("user_id", "session_idx", "n_events", "session_start", "session_end")
    )


def session_windows_sql(gap_minutes: int = SESSION_GAP_MINUTES) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       strftime(MIN(ts), '{_TS_FMT_SQL}') AS session_start,
       strftime(MAX(ts), '{_TS_FMT_SQL}') AS session_end
FROM sessions GROUP BY 1, 2
"""


def session_windows_stream(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming twin of ``session_windows``: Spark's native
    ``session_window`` merges events within the gap in the state store and
    emits a session once the watermark passes its close. Boundary nuance vs
    the lag-based batch form: the native window opens a new session at
    gap ≥ g (exclusive interval end) while the batch rule is gap > g —
    indistinguishable on microsecond-jittered event time. State per key =
    open sessions only; watermark bounds it (the reference's idle-state
    answer, sql-client-conf.yaml:33-34)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            "n_events",
        )
    )


CUMULATE_MAX_MINUTES = 60
CUMULATE_STEP_MINUTES = 15


def cumulate_event_stats(
    events: DataFrame,
    max_minutes: int = CUMULATE_MAX_MINUTES,
    step_minutes: int = CUMULATE_STEP_MINUTES,
) -> DataFrame:
    """Flink SQL's CUMULATE window (the third windowing TVF next to TUMBLE/
    HOP): windows share a start at the max-size boundary and grow by `step`
    — an event at ts lands in every window of its hour whose end exceeds
    ts, giving early partial results that converge to the tumbling total.
    Spark has no native cumulate; the fan-out is explicit: per row,
    generate the (few) window ends it belongs to, then one partial+final
    agg on (window_start, window_end, key). Row fan-out ≤ max/step (here
    4), before the shuffle — same cost envelope as the hop decomposition.

    Invariant (tested): the last cumulate slice (window_end = start + max)
    equals the tumbling aggregate of the same hour."""
    assert max_minutes % step_minutes == 0
    n_steps = max_minutes // step_minutes
    step_s = step_minutes * 60
    max_s = max_minutes * 60
    # NTZ-safe epoch seconds (UTC session tz pinned in tune_session)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    hour_start = (ts_s - ts_s % max_s).cast("long")
    first_k = ((ts_s - hour_start) / step_s).cast("long") + 1
    ks = F.sequence(first_k, F.lit(n_steps))
    fanned = events.select(
        "event_type",
        F.col("value"),
        hour_start.alias("w_start_s"),
        F.explode(ks).alias("k"),
    )
    return (
        fanned.groupBy("w_start_s", "k", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w_start_s").cast("timestamp"), _TS_FMT).alias("window_start"),
            F.date_format(
                (F.col("w_start_s") + F.col("k") * step_s).cast("timestamp"), _TS_FMT
            ).alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def cumulate_event_stats_sql(
    max_minutes: int = CUMULATE_MAX_MINUTES,
    step_minutes: int = CUMULATE_STEP_MINUTES,
) -> str:
    n_steps = max_minutes // step_minutes
    step_s = step_minutes * 60
    max_s = max_minutes * 60
    return f"""
WITH secs AS (
  -- floor, not ::BIGINT: DuckDB's double->int cast rounds half-up, which
  -- would shift events with >=0.5s fractional seconds into the next second
  -- (Spark's timestamp->long cast truncates)
  SELECT event_type, value, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
),
base AS (
  SELECT event_type, value,
         ts_s - ts_s % {max_s} AS w_start_s,
         CAST(floor((ts_s % {max_s}) / {step_s}) AS BIGINT) + 1 AS first_k
  FROM secs
),
fanned AS (
  SELECT event_type, value, w_start_s, k
  FROM base, UNNEST(range(first_k, {n_steps} + 1)) AS t(k)
)
SELECT strftime(to_timestamp(w_start_s), '{_TS_FMT_SQL}') AS window_start,
       strftime(to_timestamp(w_start_s + k * {step_s}), '{_TS_FMT_SQL}') AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM fanned
GROUP BY 1, 2, 3
"""


def cumulate_event_stats_stream(
    events: DataFrame,
    watermark: str = "30 minutes",
    max_minutes: int = CUMULATE_MAX_MINUTES,
    step_minutes: int = CUMULATE_STEP_MINUTES,
) -> DataFrame:
    """Streaming twin of ``cumulate_event_stats``. The fan-out is stateless
    (explode before the aggregation), so the same formulation streams: to
    satisfy append-mode eviction the hour bucket is expressed as a native
    `window("ts", max)` group (watermark-aware), with the slice index `k`
    as an ordinary grouping column — state per key is one partial aggregate,
    retired when the watermark passes the hour."""
    assert max_minutes % step_minutes == 0
    n_steps = max_minutes // step_minutes
    step_s = step_minutes * 60
    max_s = max_minutes * 60
    ts_s = F.col("ts").cast("timestamp").cast("long")
    first_k = ((ts_s % max_s) / step_s).cast("long") + 1
    fanned = events.withWatermark("ts", watermark).select(
        "ts",
        "event_type",
        "value",
        F.explode(F.sequence(first_k, F.lit(n_steps))).alias("k"),
    )
    return (
        fanned.groupBy(
            F.window("ts", f"{max_minutes} minutes").alias("w"), "k", "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            F.date_format(
                (F.col("w.start").cast("long") + F.col("k") * step_s).cast("timestamp"),
                _TS_FMT,
            ).alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Daily gap-fill — the hypertable-style rollup + forward-fill (TimescaleDB's
# time_bucket_gapfill / locf, reproduced as a pure DataFrame plan): roll
# events up to (user, day), generate each user's dense daily spine between
# their first and last active day, and carry the last observed day-value
# forward across the gaps. Scale shape: the rollup is one shuffle with
# map-side combine; the spine explode is bounded by the OUTPUT size (one row
# per user-day — exactly what the report must emit anyway, never more than
# days×users); the forward fill is a linear per-user window pass riding the
# same user_id partitioning. Day sums go through DECIMAL(18,6) so they are
# order-independent (exact) before the cast back to double.


def gap_fill_daily(events: DataFrame) -> DataFrame:
    daily = events.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("day_value"),
    )
    span = daily.groupBy("user_id").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = span.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    )
    j = spine.join(daily, ["user_id", "d"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("n_events").isNull(), 1).otherwise(0).cast("long").alias("is_gap"),
        "day_value",
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    )


GAP_FILL_DAILY_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM span
)
SELECT s.user_id,
       strftime(s.d, '%Y-%m-%d') AS day,
       CAST(COALESCE(dy.n_events, 0) AS BIGINT) AS n_events,
       CAST(CASE WHEN dy.n_events IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
       dy.day_value,
       last_value(dy.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM spine s LEFT JOIN daily dy ON s.user_id = dy.user_id AND s.d = dy.d
"""
