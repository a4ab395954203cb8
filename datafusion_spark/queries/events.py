"""Event-stream analytics over the `events` table (batch forms).

These are the batch twins of the Structured Streaming operators in
datafusion_spark/streaming/ — same window/sessionization semantics, so
the oracle-checked batch results also validate the streaming logic.
Reference: DataFusion's streaming scans + window aggregates
(datafusion/physical-plan/src/streaming.rs, windows/).

Scale notes: all aggregations key on (user_id | time bucket) — high
cardinality, shuffle-friendly.  Sessionization is one shuffle + two
window passes; the funnel is a single groupBy(user) with conditional
min aggregates (no self-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_spark.catalog import load_table
from datafusion_spark.operators.asof import asof_join
from datafusion_spark.queries.helpers import DEC
from datafusion_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "events_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
    tags=("events", "time-window", "bench"),
)
def events_tumbling_hourly(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "events_sliding_windows",
    oracle="""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL 30 MINUTES, CAST(ts AS TIMESTAMP)) AS b, value
      FROM events
    ), exploded AS (
      SELECT b AS window_start, value FROM buckets
      UNION ALL
      SELECT b - INTERVAL 30 MINUTES AS window_start, value FROM buckets
    )
    SELECT window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM exploded
    GROUP BY window_start
    """,
    tags=("events", "time-window"),
)
def events_sliding_windows(spark, sf_dir):
    # 1h windows sliding every 30m → each event lands in exactly 2 windows.
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "events_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - LAG(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTES
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
    tags=("events", "session"),
)
def events_sessionization(spark, sf_dir):
    """Gap-based sessions (30-min inactivity) — lag → flag → running sum →
    aggregate.  One shuffle on user_id; both window passes reuse it."""
    e = _t(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev_ts = F.lag("ts").over(w_ord)
    new_session = (
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > 30 * 60)
    ).cast("int")
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_no", F.sum("new_session").over(w_run).cast("long"))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("session_value"),
        )
    )


@query(
    "events_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS k_total,
           CAST(SUM(CAST(props->>'$.k' AS INT)) AS DOUBLE) / COUNT(*) AS k_avg,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "json"),
)
def events_json_props(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("k_total"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("k_avg"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "events_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT) AS viewed,
           CAST(COUNT(CASE WHEN t_view < t_click THEN 1 END) AS BIGINT) AS clicked_after_view,
           CAST(COUNT(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 END)
                AS BIGINT) AS full_funnel
    FROM per_user
    """,
    tags=("events", "funnel"),
)
def events_funnel(spark, sf_dir):
    """view → click → purchase funnel as ONE aggregation pass — no
    self-joins, so it scales linearly in events and users."""
    e = _t(spark, sf_dir, "events")

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("viewed"),
        F.count(F.when(F.col("t_view") < F.col("t_click"), 1)).alias("clicked_after_view"),
        F.count(
            F.when(
                (F.col("t_view") < F.col("t_click")) & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        ).alias("full_funnel"),
    )


@query(
    "events_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
    tags=("events", "asof-join"),
)
def events_asof_join(spark, sf_dir):
    """Each purchase matched to the user's most recent signup at-or-before
    it — DuckDB ASOF JOIN semantics via the union+carry-forward operator
    (datafusion_spark/operators/asof.py)."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts"), F.col("ts").alias("ts")
    ).select("user_id", "ts", "signup_ts")
    joined = asof_join(purchases, signups, on="ts", by="user_id", value_cols=["signup_ts"])
    return joined.select(
        "event_id", "user_id", "ts", F.col("signup_ts_right").alias("signup_ts")
    )


@query(
    "events_retention_wow",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week_start
      FROM events
    )
    SELECT a.week_start,
           COUNT(*) AS n_active,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained
    FROM uw a
    LEFT JOIN uw b
      ON b.user_id = a.user_id AND b.week_start = a.week_start + INTERVAL 7 DAY
    GROUP BY a.week_start
    """,
    tags=("events", "retention"),
)
def events_retention_wow(spark, sf_dir):
    """Week-over-week cohort retention: distinct (user, week) grid
    self-joined at +7 days.  Scale: the grid is tiny relative to events
    (distinct collapses first — one shuffle), and the self-join co-keys on
    user_id."""
    e = _t(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week_start")
    ).distinct()
    b = uw.select(
        F.col("user_id").alias("b_user"), F.col("week_start").alias("b_week")
    )
    return (
        uw.join(
            b,
            (F.col("b_user") == F.col("user_id"))
            & (F.col("b_week") == F.date_add(F.col("week_start"), 7)),
            "left",
        )
        .groupBy("week_start")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(F.when(F.col("b_user").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_retained"),
        )
    )


@query(
    "events_session_window_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("events", "session"),
)
def events_session_window_native(spark, sf_dir):
    """Spark-NATIVE gap sessionization: F.session_window(ts, gap) — the
    built-in session operator (also streaming-capable), vs the window-
    function island formulation the oracle uses and DataFusion would need.
    Semantics coincide: maximal event chains with inter-event gaps ≤ 30min.
    One shuffle on (user_id); session merging is operator-internal."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


@query(
    "events_gap_fill_interpolate",
    oracle="""
    WITH daily AS (
      SELECT user_id AS series, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
      FROM events WHERE user_id < 400 GROUP BY series, day
    ),
    spans AS (
      SELECT series, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY series
    ),
    calendar AS (
      SELECT series, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM spans
    ),
    joined AS (
      SELECT c.series, c.day, daily.v
      FROM calendar c LEFT JOIN daily ON daily.series = c.series AND daily.day = c.day
    ),
    ctx AS (
      SELECT series, day, v,
             last_value(v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER w_prev AS pd,
             first_value(v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER w_next AS nd
      FROM joined
      WINDOW w_prev AS (PARTITION BY series ORDER BY day ROWS UNBOUNDED PRECEDING),
             w_next AS (PARTITION BY series ORDER BY day
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT series, day, v IS NOT NULL AS observed,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * date_diff('day', pd, day)
                       / date_diff('day', pd, nd)
           END, 6) AS value_filled
    FROM ctx
    """,
    tags=("events", "time-series", "gap-fill"),
)
def events_gap_fill_interpolate(spark, sf_dir):
    """Calendar gap-fill + LINEAR INTERPOLATION — the time-series resample
    primitive (TimescaleDB's time_bucket_gapfill/interpolate; DataFusion
    ecosystem ships it as an extension).  Dense calendar per series from
    a min/max span (sequence → explode, row-local), left-join observed
    days, then one window pass each direction (last/first IGNORE NULLS)
    supplies the bracketing observations; edges carry forward/backward.
    Scale: both windows share the (series, day) sort → one shuffle; the
    calendar explode is linear in days×series, tiny next to the event
    scan; daily sums are decimal-accumulated (§4 rule 1), interpolation
    arithmetic is the identical expression tree on both engines, rounded
    at 6dp."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 400)
    daily = (
        e.groupBy(
            F.col("user_id").alias("series"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("v"))
    )
    spans = daily.groupBy("series").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = spans.select(
        "series",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = calendar.join(daily, ["series", "day"], "left")
    w_prev = W.partitionBy("series").orderBy("day").rowsBetween(
        W.unboundedPreceding, 0
    )
    w_next = W.partitionBy("series").orderBy("day").rowsBetween(
        0, W.unboundedFollowing
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = joined.select(
        "series",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    frac = F.datediff("day", "pd").cast("double") / F.datediff("nd", "pd").cast(
        "double"
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return ctx.select(
        "series",
        "day",
        F.col("v").isNotNull().alias("observed"),
        F.round(filled, 6).alias("value_filled"),
    )


@query(
    "events_path_prefixes",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path ORDER BY n_users DESC, path
    """,
    tags=("events", "analytics", "paths"),
)
def events_path_prefixes(spark, sf_dir):
    """User-journey path analysis: each user's first three event types
    (deterministic order: ts then unique event_id) concatenated into a
    path string, then counted across users — the sequence-prefix funnel
    ClickHouse expresses with sequenceMatch and the reference leaves to
    window + agg composition.

    Scale: one keyed window (user_id partitions — hash-distributed, never
    single-partition), WindowGroupLimit prunes each partition to 3 rows
    before anything else moves, then an ordered listagg per user and a
    low-cardinality path count with map-side partials.  No joins, two
    keyed exchanges total."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        e.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s.getField("event_type"),
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
    )


@query(
    "events_sequence_conversion",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS next_purchase
      FROM events
    )
    SELECT CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
               AS clicks,
           CAST(COUNT(CASE WHEN event_type = 'click' AND next_purchase > ts
                       AND next_purchase <= ts + INTERVAL '1' HOUR THEN 1 END)
                AS BIGINT) AS clicks_converted_1h,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'click'
                       AND next_purchase > ts
                       AND next_purchase <= ts + INTERVAL '1' HOUR
                       THEN user_id END) AS BIGINT) AS users_converted_1h
    FROM seq
    """,
    tags=("events", "funnel", "sequence"),
)
def events_sequence_conversion(spark, sf_dir):
    """Time-window sequence match (ClickHouse sequenceMatch territory):
    which clicks are followed by a purchase within ONE HOUR — per event,
    not per first-occurrence, so a user whose first click went stale but
    whose later click converted still counts (the MIN-based funnel in
    `events_funnel` cannot see that).

    Construction: every event's NEXT purchase timestamp is a running MIN
    over the user's events in REVERSE time order — one keyed window pass,
    no event-to-event self-join.  At 100 TB: hash-partitioned by user_id,
    per-user state is one timestamp; the classic self-join formulation
    would shuffle clicks × purchases."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = e.withColumn(
        "next_purchase",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w),
    )
    converted = (
        (F.col("event_type") == "click")
        & (F.col("next_purchase") > F.col("ts"))
        & (F.col("next_purchase") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return seq.agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("long").alias("clicks"),
        F.count(F.when(converted, 1)).cast("long").alias("clicks_converted_1h"),
        F.countDistinct(F.when(converted, F.col("user_id"))).cast("long")
            .alias("users_converted_1h"),
    )


@query(
    "events_ohlc_downsample",
    oracle="""
    WITH keyed AS (
      SELECT event_type,
             make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
                 AS bucket,
             value,
             lpad(CAST(epoch_us(ts) + 4611686018427387904 AS VARCHAR), 20, '0') ||
             lpad(CAST(event_id AS VARCHAR), 12, '0')      AS ord_key
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, bucket,
           arg_min(value, ord_key)                          AS open,
           MAX(value)                                       AS high,
           MIN(value)                                       AS low,
           arg_max(value, ord_key)                          AS close,
           CAST(COUNT(*) AS BIGINT)                         AS volume,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM keyed
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
    tags=("events", "timeseries", "ohlc", "bench"),
)
def events_ohlc_downsample(spark, sf_dir):
    """OHLC resampling (the time-series downsample every market/metrics
    pipeline runs; reference streaming window aggs + first/last_value
    ordered aggregates): 6-hour buckets per event_type with
    open/high/low/close/volume.  Open/close are min_by/max_by over a
    fixed-width (epoch_us, event_id) string key — a single-pass mergeable
    accumulator (no window sort, no per-bucket shuffle beyond the one
    groupBy), deterministic under ts ties because event_id is unique.
    Bucketing is pure integer arithmetic on epoch micros, so both engines
    bin identically at any timezone."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # cast: some sources ship ts as TIMESTAMP_NTZ (e.g. Spark-written
    # parquet), which unix_micros rejects; the session is pinned UTC so
    # the cast is value-preserving
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # floor division (not truncation): for pre-1970 timestamps epoch
    # micros are negative and `us - us % n` with Spark's truncating %
    # would bin into a different bucket than the oracle's floor `//`
    bucket = F.timestamp_micros(
        (F.floor(us / F.lit(21600000000)) * F.lit(21600000000)).cast("long")
    )
    # epoch-offset keeps the lpad'd sort key order-correct for negative
    # epoch micros too (min int64 offset would overflow; pre-1677 ts
    # can't appear in a micros timestamp anyway)
    ord_key = F.concat(
        F.lpad((us + F.lit(1 << 62)).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        e.select("event_type", bucket.alias("bucket"), "value",
                 ord_key.alias("ord_key"))
        .groupBy("event_type", "bucket")
        .agg(
            F.min_by("value", "ord_key").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ord_key").alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH keyed AS (
      SELECT event_id, event_type, value, ts,
             SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) OVER w AS s1,
             SUM(CAST(FLOOR(value * value * 1000000.0) AS BIGINT)) OVER w AS s2,
             COUNT(*) OVER w AS n
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type, value,
           ROUND((value - CAST(s1 AS DOUBLE) / (n * 1000000.0))
                 / sqrt((CAST(s2 AS DOUBLE) / 1000000.0
                         - (CAST(s1 AS DOUBLE) / 1000000.0)
                           * (CAST(s1 AS DOUBLE) / 1000000.0) / n)
                        / (n - 1)), 4) AS z
    FROM keyed
    WHERE n >= 30
      AND ABS((value - CAST(s1 AS DOUBLE) / (n * 1000000.0))
              / sqrt((CAST(s2 AS DOUBLE) / 1000000.0
                      - (CAST(s1 AS DOUBLE) / 1000000.0)
                        * (CAST(s1 AS DOUBLE) / 1000000.0) / n)
                     / (n - 1))) > 3.0
    ORDER BY event_type, event_id
    """,
    tags=("events", "timeseries", "anomaly"),
)
def events_anomaly_zscore(spark, sf_dir):
    """Rolling z-score anomaly detection: each event is scored against the
    mean/std of the PREVIOUS 50 events of its type (ROWS frame ending at
    1 PRECEDING — the score never sees its own value), flagging |z| > 3.
    Determinism: the window sums accumulate floor(v*1e6) integers
    (exact, order-independent); mean/variance derive from those integers
    with the identical double formula on both engines, so the threshold
    comparison and 4-dp rounding agree bit-for-bit.  One keyed window
    sort per event_type — the same shape as any per-key rolling metric
    at 100 TB (no global ordering anywhere)."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("ts", "event_id") \
              .rowsBetween(-50, -1)
    s1 = F.sum(F.floor(F.col("value") * 1000000.0).cast("long")).over(w)
    s2 = F.sum(
        F.floor(F.col("value") * F.col("value") * 1000000.0).cast("long")
    ).over(w)
    n = F.count(F.lit(1)).over(w)
    scored = e.select(
        "event_id", "event_type", "value",
        s1.alias("s1"), s2.alias("s2"), n.alias("n"),
    )
    mean = F.col("s1").cast("double") / (F.col("n") * 1000000.0)
    var = (
        F.col("s2").cast("double") / 1000000.0
        - (F.col("s1").cast("double") / 1000000.0)
          * (F.col("s1").cast("double") / 1000000.0) / F.col("n")
    ) / (F.col("n") - 1)
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        scored.filter(F.col("n") >= 30)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 3.0)
        .select("event_id", "event_type", "value", F.round("z", 4).alias("z"))
        .orderBy("event_type", "event_id")
    )


@query(
    "events_ewma_smoothing",
    oracle="""
    WITH ordered AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           vals[1] AS first_value,
           vals[len(vals)] AS last_value,
           ROUND(list_reduce(vals, (s, x) -> 0.3 * x + 0.7 * s), 6) AS ewma
    FROM ordered ORDER BY user_id
    """,
    tags=("events", "timeseries", "ewma"),
)
def events_ewma_smoothing(spark, sf_dir):
    """Exponentially-weighted moving average per user (alpha = 0.3) — a
    sequential recurrence s_i = a*x_i + (1-a)*s_{i-1} that no windowed
    aggregate expresses, run as a per-key ordered list fold: Spark's
    aggregate() seeded with the first element equals DuckDB's unseeded
    list_reduce fold step-for-step, so the result is bit-identical.
    One shuffle on user_id; state per key is the ordered value list
    (bounded by per-user event counts — at 100 TB the same recurrence
    runs windowed per day/session to cap list sizes)."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ordered = (
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("trip")
        )
        .select(
            "user_id",
            F.transform("trip", lambda t: t.getField("value")).alias("vals"),
        )
    )
    ewma = F.aggregate(
        F.expr("slice(vals, 2, size(vals) - 1)"),
        F.element_at("vals", 1),
        lambda s, x: F.lit(0.3) * x + F.lit(0.7) * s,
    )
    return ordered.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        F.element_at("vals", 1).alias("first_value"),
        F.element_at("vals", -1).alias("last_value"),
        F.round(ewma, 6).alias("ewma"),
    ).orderBy("user_id")
