"""Streaming operators over the events stream.

DataFusion executes unbounded inputs through the same physical operators
with streaming-friendly execution modes (reference:
datafusion/physical-plan/src/streaming.rs, memory.rs); the Spark-native
counterpart is Structured Streaming: readStream → the SAME DataFrame
transformations as batch → writeStream with watermarks bounding state.

The transformation functions below are written against a plain DataFrame
so the identical code path serves batch (oracle-checked via the batch
twins in queries/events.py) and streaming (exercised in
tests/test_streaming.py with availableNow + memory sink).

Scale: watermarks bound the window state store; sessionization uses
applyInPandasWithState with per-user state and an inactivity timeout —
state size is O(active users), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA_NANOS = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)
EVENTS_SCHEMA_MICROS = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
)
EVENTS_SCHEMA_MICROS_UTC = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (ts has shipped as either raw
    nanos — handled with the same nanosAsLong conversion as the batch
    catalog — or plain micros; the footer decides).

    A file-source stream needs a directory; the read-only single-file
    table is staged via symlink into a scratch dir.
    """
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    stage = os.path.join(
        tempfile.gettempdir(),
        "datafusion_spark_stream",
        hashlib.md5(src.encode()).hexdigest()[:12],
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    import pyarrow as pa
    import pyarrow.parquet as pq

    # Decide the declared stream schema from the footer STRUCTURALLY
    # (str-equality misses tz-annotated footers like 'timestamp[ns, tz=UTC]'):
    # nanos at any tz -> read as raw long (nanosAsLong) and convert; micros
    # with a tz annotation (isAdjustedToUTC) -> declare TIMESTAMP so the
    # vectorized reader accepts it; plain micros -> TIMESTAMP_NTZ, matching
    # the batch catalog's tolerance.
    t = pq.read_schema(src).field("ts").type
    nanos = pa.types.is_timestamp(t) and t.unit == "ns"
    tz_adjusted = pa.types.is_timestamp(t) and t.tz is not None
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if nanos:
        schema = EVENTS_SCHEMA_NANOS
    elif tz_adjusted:
        schema = EVENTS_SCHEMA_MICROS_UTC
    else:
        schema = EVENTS_SCHEMA_MICROS
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif not tz_adjusted:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts+sums.  On a stream the watermark lets Spark
    evict window state once event time passes start+window+watermark."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts(events: DataFrame, window: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    src = events.withWatermark("ts", "2 hours") if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

GAP_SECONDS = 30 * 60


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful session operator: emits a session row whenever the
    inactivity gap exceeds GAP_SECONDS (or the state times out)."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return

    rows = []
    if state.exists:
        start_us, last_us, n, total = state.get
    else:
        start_us = last_us = None, None  # type: ignore[assignment]
        start_us, last_us, n, total = None, None, 0, 0.0
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            us = int(pd.Timestamp(ts).value // 1000)
            if start_us is None:
                start_us, last_us, n, total = us, us, 1, float(value)
            elif us - last_us > GAP_SECONDS * 1_000_000:
                rows.append((user_id, start_us, last_us, n, total))
                start_us, last_us, n, total = us, us, 1, float(value)
            else:
                last_us, n, total = us, n + 1, total + float(value)
    state.update((start_us, last_us, n, total))
    state.setTimeoutDuration(GAP_SECONDS * 1000)
    if rows:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "session_start": [pd.Timestamp(r[1], unit="us") for r in rows],
                "session_end": [pd.Timestamp(r[2], unit="us") for r in rows],
                "n_events": [r[3] for r in rows],
                "total_value": [r[4] for r in rows],
            }
        )


def click_purchase_join(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join (reference: datafusion/physical-plan/src/
    joins/symmetric_hash_join.rs — DataFusion's streaming-capable join):
    per-user 'click' events joined to 'purchase' events that follow within
    ``within``.  Both sides carry watermarks and the join condition has a
    time bound in BOTH directions, so Spark can evict join state — state
    size is O(events inside the watermark horizon), not O(stream).

    Works identically on batch DataFrames (no watermark needed) — the
    batch twin is oracle-checked as events_funnel-style SQL.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond).select(
        F.col("c_user").alias("user_id"),
        "c_event_id",
        "p_event_id",
        "c_ts",
        "p_ts",
        "p_value",
    )


def click_purchase_join_outer(
    events, within: str = "1 hour", watermark: str = "2 hours"
):
    """Stream-stream LEFT OUTER join (reference: physical-plan/src/joins/
    symmetric_hash_join.rs — the symmetric hash join's unmatched-row
    emission).  Same per-user click→purchase time-bounded condition as
    click_purchase_join, but clicks with no purchase within ``within``
    are emitted with NULL purchase columns — in streaming mode only once
    the watermark passes the click's join horizon, because until then a
    matching purchase could still arrive.  State stays bounded by the
    watermark horizon exactly as in the inner variant; the only extra
    cost is the per-row matched bit Spark keeps to decide null-emission.

    On batch inputs this is a plain left outer join with the same
    condition, which is what the equivalence test compares against
    (matched rows must agree exactly; streaming may legitimately withhold
    tail unmatched rows whose horizon the final watermark never passed).
    """
    from pyspark.sql import functions as F

    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond, "leftOuter").select(
        F.col("c_user").alias("user_id"),
        "c_event_id",
        "p_event_id",
        "c_ts",
        "p_ts",
        "p_value",
    )


def click_purchase_join_semi(
    events, within: str = "1 hour", watermark: str = "2 hours"
):
    """Stream-stream LEFT SEMI join (reference: physical-plan/src/joins/
    symmetric_hash_join.rs supports SemiJoin — existence, not payload):
    emit each CLICK that is followed by at least one purchase from the
    same user within ``within`` — the purchase columns never leave the
    join, so the output is click-shaped and duplicate-free regardless of
    how many purchases matched (the "converted clicks" stream).

    State economics match the inner variant: both sides watermarked,
    time-bounded in both directions, so Spark evicts click state once
    its horizon passes and purchase state once nothing earlier can still
    match it.  On batch inputs this is a plain left semi join with the
    same condition — the stream==batch test compares exactly.
    """
    from pyspark.sql import functions as F

    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond, "leftSemi").select(
        F.col("c_user").alias("user_id"), "c_event_id", "c_ts",
    )


def click_purchase_join_full(
    events, within: str = "1 hour", watermark: str = "2 hours"
):
    """Stream-stream FULL OUTER join (reference: physical-plan/src/joins/
    symmetric_hash_join.rs supports JoinType::Full — unmatched-row
    emission on BOTH sides): the same per-user click→purchase
    time-bounded condition, but clicks with no purchase AND purchases
    with no preceding click both surface with NULLs on the other side —
    the complete conversion picture (converted, abandoned click,
    attribution-less purchase) in one stream.

    This is the hardest eviction reasoning of the join matrix: a CLICK
    null-emits only once the watermark passes c_ts + within (no matching
    purchase can still arrive); a PURCHASE null-emits only once the
    watermark passes p_ts (no click at or before it can still arrive —
    the condition lower-bounds p_ts by c_ts, so a purchase's match
    horizon closes when ITS OWN timestamp is past the watermark).  Spark
    derives both horizons from the two-sided time bound; state stays
    O(watermark horizon) exactly as in the inner variant, plus the
    per-row matched bits.

    On batch inputs this is a plain full outer join with the same
    condition — the stream==batch test compares matched pairs exactly
    and requires each side's null-emissions to be a subset of the batch
    unmatched rows (tail rows whose horizon the final watermark never
    passed are legitimately withheld).
    """
    from pyspark.sql import functions as F

    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond, "fullOuter").select(
        F.coalesce("c_user", "p_user").alias("user_id"),
        "c_event_id",
        "p_event_id",
        "c_ts",
        "p_ts",
        "p_value",
    )


def click_purchase_join_right(
    events, within: str = "1 hour", watermark: str = "2 hours"
):
    """Stream-stream RIGHT OUTER join (reference: physical-plan/src/joins/
    symmetric_hash_join.rs supports JoinType::Right) — the literal mirror
    of click_purchase_join_outer, completing the join matrix: every
    PURCHASE surfaces, with NULL click columns when no click from the
    same user preceded it within ``within`` (the attribution-less
    purchase stream).

    Eviction mirrors the full-outer's right-side reasoning: a purchase
    null-emits once the watermark passes p_ts — the condition
    lower-bounds p_ts by c_ts, so no click at or before the purchase can
    still arrive once its OWN timestamp is past the watermark.  Click
    state evicts when the watermark passes c_ts + within, exactly as in
    the inner variant.  State stays O(watermark horizon).

    On batch inputs this is a plain right outer join with the same
    condition — the stream==batch test compares matched pairs exactly
    and requires the null-emissions to be a subset of the batch
    unmatched purchases (tail rows whose horizon the final watermark
    never passed are legitimately withheld).
    """
    from pyspark.sql import functions as F

    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond, "rightOuter").select(
        F.col("p_user").alias("user_id"),
        "c_event_id",
        "p_event_id",
        "c_ts",
        "p_ts",
        "p_value",
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id: dropDuplicatesWithinWatermark
    keeps state only for ids newer than the watermark horizon — the
    streaming twin of the batch dedup_exact operator (state O(horizon),
    not O(stream history))."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """applyInPandasWithState sessionization: per-user state, 30-min gap,
    processing-time timeout flushes idle sessions."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def fn(key, pdfs, state):
        # cwd-independent worker import (free-variable root pickles by
        # value; the module-level _session_fn would pickle by reference)
        import sys

        if root not in sys.path:
            sys.path.insert(0, root)
        from datafusion_spark.streaming.ops import _session_fn

        return _session_fn(key, pdfs, state)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )

def session_window_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session-window aggregation (gap-merged), batch/stream twin of
    queries/events.py events_session_window_native.  On a stream the
    watermark lets the store drop sessions whose close is final."""
    src = events.withWatermark("ts", "2 hours") if events.isStreaming else events
    return (
        src.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def foreach_batch_append_sink(stream_df: DataFrame, target: str):
    """foreachBatch sink with merge-on-read upsert semantics: each
    micro-batch APPENDS immutable parquet files tagged with its batch id;
    readers resolve the latest row per key at scan time
    (read_latest_per_user).  This is the scalable pattern for keyed upserts
    without a transactional table format — appends never rewrite data, and
    exactly-once comes from Structured Streaming's (checkpoint, batch_id)
    contract: a replayed batch overwrites itself idempotently via the
    deterministic __batch_id column.

    Returns the started StreamingQuery (availableNow, so it drains the
    source then stops)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(target)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", target + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )


def read_latest_per_user(spark: SparkSession, target: str) -> DataFrame:
    """Merge-on-read resolver for foreach_batch_append_sink output: latest
    row per user_id by (ts, event_id) — one keyed shuffle; at 100 TB the
    periodic compaction job runs exactly this query and rewrites the
    partition."""
    from pyspark.sql.window import Window

    df = spark.read.parquet(target)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__batch_id")
    )


def enrich_with_static_dim(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join + windowed rollup: each micro-batch joins the
    (slowly-changing) dimension snapshot — Spark re-resolves the static
    side per batch, so a dimension refresh is picked up without restarting
    the query.  The static side is broadcast: no stream-side shuffle for
    the join, state is bounded by the watermark, and the dimension never
    holds streaming state.  This is the canonical enrichment shape
    (events × user/feature table) in a 100 TB ingest path.
    """
    joined = events.join(F.broadcast(user_dim), "user_id", "left").fillna(
        {"segment": "unknown"}
    )
    return (
        joined.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            "total_value",
        )
    )


class _RunningTotalsProcessor:
    """StatefulProcessor for transformWithStateInPandas (defined lazily in
    running_totals_tws so the module imports on Spark versions without the
    TWS API)."""


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas (reference:
    DataFusion's streaming-capable stateful operators; this is Spark 4's
    arbitrary-state API — the successor of applyInPandasWithState with
    typed state primitives, timers, and RocksDB-backed stores).

    Each micro-batch updates a ValueState[(n, total)] per user and emits
    the new cumulative row — Update-mode semantics.  State is one tuple
    per user (O(active users)); with RocksDB + changelog checkpointing
    the store scales past executor memory, which is the 100 TB stream
    answer.  Requires the RocksDB state store provider (set in the test
    harness); the batch twin for verification is a plain groupBy.
    """
    import pandas as pd  # noqa: F811 (local for worker pickling)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType as _D,
        LongType as _L,
        StructField as _SF,
        StructType as _ST,
    )

    out_schema = _ST(
        [
            _SF("user_id", _L()),
            _SF("n_events", _L()),
            _SF("total_value", _D()),
        ]
    )
    state_schema = _ST([_SF("n", _L()), _SF("total", _D())])

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (0, 0.0)
            if self._totals.exists():
                n, total = self._totals.get()
            for pdf in rows:
                n += int(len(pdf))
                total += float(pdf["value"].fillna(0.0).sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def ohlc_downsample(
    events: DataFrame, window: str = "6 hours", watermark: str = "12 hours"
) -> DataFrame:
    """Streaming OHLC resampling — the stream twin of the batch
    ``events_ohlc_downsample`` entry: per (event_type, tumbling window),
    open/close via min_by/max_by over a fixed-width (epoch_us, event_id)
    string key, plus high/low/volume.  Every aggregate is a mergeable
    single-pass accumulator, so Spark maintains it incrementally per
    window and the watermark bounds state exactly like any windowed agg
    — no sort, no custom state."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # epoch-offset keeps the lpad'd key order-correct for pre-1970
    # (negative-micros) events, matching the batch twin in queries/events.py
    ord_key = F.concat(
        F.lpad((us + F.lit(1 << 62)).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    keyed = src.filter(F.col("value").isNotNull()).withColumn("ord_key", ord_key)
    return (
        keyed.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min_by("value", "ord_key").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ord_key").alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "open", "high", "low", "close", "volume",
        )
    )
