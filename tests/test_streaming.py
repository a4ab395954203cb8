"""Structured Streaming end-to-end: the streaming operators produce the
same results as their oracle-checked batch twins (availableNow trigger +
memory sink)."""

from __future__ import annotations

import uuid

import pytest

from datafusion_spark.catalog import load_table
from datafusion_spark.streaming import read_events_stream, tumbling_counts
from tests.conftest import SF_SMALL


def _run_available_now(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_tumbling_matches_batch(spark):
    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, SF_SMALL)
    assert stream.isStreaming
    q = _run_available_now(tumbling_counts(stream), name)
    try:
        got = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        batch = tumbling_counts(load_table(spark, SF_SMALL, "events"))
        want = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in batch.collect()
        }
        assert got == want
        assert len(want) > 0
    finally:
        q.stop()


def test_streaming_incremental_files(spark, tmp_path):
    """Multi-file source processed incrementally (maxFilesPerTrigger=1)
    still converges to the batch answer."""
    import pyspark.sql.functions as F

    events = load_table(spark, SF_SMALL, "events").limit(200)
    src = str(tmp_path / "stream_src")
    events.withColumn("ts", F.col("ts").cast("long") * 1_000_000_000).repartition(4).write.parquet(src)

    raw = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double, props string, ts long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = _run_available_now(tumbling_counts(stream), name)
    try:
        total = spark.sql(f"SELECT SUM(n_events) AS n FROM {name}").collect()[0].n
        assert total == 200
    finally:
        q.stop()


def test_stream_stream_join_matches_batch(spark):
    from datafusion_spark.streaming import click_purchase_join, read_events_stream

    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, SF_SMALL)
    q = (
        click_purchase_join(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        got = {
            (r.c_event_id, r.p_event_id)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        batch = click_purchase_join(load_table(spark, SF_SMALL, "events"))
        want = {(r.c_event_id, r.p_event_id) for r in batch.collect()}
        assert got == want
        assert len(want) > 0
    finally:
        q.stop()


def test_dedup_within_watermark_stream(spark, tmp_path):
    """A source with duplicated event_ids collapses to one row per id."""
    import pyspark.sql.functions as F

    from datafusion_spark.streaming import dedup_within_watermark

    events = load_table(spark, SF_SMALL, "events").limit(100)
    dup = events.unionByName(events)  # every id twice
    src = str(tmp_path / "dedup_src")
    dup.withColumn("ts", F.col("ts").cast("long") * 1_000_000_000).repartition(
        3
    ).write.parquet(src)

    raw = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double, props string, ts long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_within_watermark(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        rows = spark.sql(f"SELECT event_id, COUNT(*) AS n FROM {name} GROUP BY event_id").collect()
        assert len(rows) == 100
        assert all(r.n == 1 for r in rows)
    finally:
        q.stop()

def test_streaming_sliding_matches_batch(spark):
    from datafusion_spark.streaming import sliding_counts

    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, SF_SMALL)
    q = _run_available_now(sliding_counts(stream), name)
    try:
        got = {
            (r.window_start, r.n_events)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        want = {
            (r.window_start, r.n_events)
            for r in sliding_counts(load_table(spark, SF_SMALL, "events")).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_streaming_session_window_matches_batch(spark):
    from datafusion_spark.streaming import session_window_counts

    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, SF_SMALL)
    q = _run_available_now(session_window_counts(stream), name)
    try:
        got = {
            (r.user_id, r.session_start, r.n_events)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        want = {
            (r.user_id, r.session_start, r.n_events)
            for r in session_window_counts(
                load_table(spark, SF_SMALL, "events")
            ).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_foreach_batch_upsert_sink(spark, tmp_path):
    """foreachBatch append sink + merge-on-read resolver converges to the
    batch keep-latest answer across multiple micro-batches."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from datafusion_spark.streaming import (
        foreach_batch_append_sink,
        read_latest_per_user,
    )

    events = load_table(spark, SF_SMALL, "events").limit(300)
    src = str(tmp_path / "upsert_src")
    events.withColumn("ts", F.col("ts").cast("long") * 1_000_000_000).repartition(
        4
    ).write.parquet(src)

    raw = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double, props string, ts long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    target = str(tmp_path / "upsert_target")
    q = foreach_batch_append_sink(stream, target)
    q.awaitTermination(120)

    got = {
        (r.user_id, r.event_id)
        for r in read_latest_per_user(spark, target).collect()
    }
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = {
        (r.user_id, r.event_id)
        for r in events.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_static_join_matches_batch(spark):
    """Stream-static broadcast enrichment converges to the batch answer
    under availableNow."""
    import pyspark.sql.functions as F

    from datafusion_spark.streaming.ops import (
        enrich_with_static_dim,
        read_events_stream,
    )

    user_dim = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.concat(F.lit("seg_"), (F.col("user_id") % 5).cast("string")).alias(
                "segment"
            ),
        )
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = _run_available_now(
        enrich_with_static_dim(read_events_stream(spark, SF_SMALL), user_dim), name
    )
    try:
        got = {
            (r.window_start, r.segment): (r.n_events, r.total_value)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        batch = enrich_with_static_dim(
            load_table(spark, SF_SMALL, "events"), user_dim
        )
        want = {
            (r.window_start, r.segment): (r.n_events, r.total_value)
            for r in batch.collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_rate_source_windowed_agg(spark):
    """Generator (rate) source → watermarked windowed aggregation: the
    synthetic-source path used for load testing a streaming topology
    before pointing it at real ingest.  Proves trigger wiring + window
    state flushing with no file dependency."""
    import pyspark.sql.functions as F

    name = f"t_{uuid.uuid4().hex[:8]}"
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 50)
        .option("numPartitions", 2)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )
    agg = (
        rate.withWatermark("timestamp", "10 seconds")
        .groupBy(F.window("timestamp", "2 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("ws"), "n", "sv")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        import time

        rows = []
        for _ in range(120):  # poll until ≥2 full 2s windows materialize
            rows = spark.sql(f"SELECT * FROM {name}").collect()
            if sum(r.n for r in rows) >= 300:
                break
            time.sleep(0.5)
        assert sum(r.n for r in rows) >= 300, rows
        # each 2s event-time window spans two 50-row batches
        full_windows = [r for r in rows if r.n == 100]
        assert full_windows, f"expected saturated windows, got {rows}"
    finally:
        q.stop()


def test_stream_stream_outer_join_matches_batch(spark):
    """Matched pairs identical to batch; streaming null-emissions are a
    subset of batch unmatched clicks (tail clicks whose horizon the final
    watermark never passed are legitimately withheld)."""
    from datafusion_spark.streaming import (
        click_purchase_join_outer,
        read_events_stream,
    )

    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, SF_SMALL)
    q = (
        click_purchase_join_outer(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        got = spark.sql(f"SELECT * FROM {name}").collect()
        batch = click_purchase_join_outer(
            load_table(spark, SF_SMALL, "events")
        ).collect()
        got_matched = {(r.c_event_id, r.p_event_id) for r in got if r.p_event_id is not None}
        want_matched = {(r.c_event_id, r.p_event_id) for r in batch if r.p_event_id is not None}
        assert got_matched == want_matched
        assert len(want_matched) > 0
        got_unmatched = {r.c_event_id for r in got if r.p_event_id is None}
        want_unmatched = {r.c_event_id for r in batch if r.p_event_id is None}
        assert got_unmatched <= want_unmatched
        assert len(want_unmatched) > 0
    finally:
        q.stop()


def test_transform_with_state_running_totals(spark):
    """transformWithStateInPandas cumulative per-user totals: the LAST
    Update-mode emission per user must equal the batch groupBy.

    Environment gate: the TWS driver worker requires google.protobuf,
    absent in the offline container (same class of gate as the
    spark-avro jar — the operator is exercised wherever protobuf
    exists; applyInPandasWithState covers stateful streaming here).
    """
    pytest.importorskip("google.protobuf.descriptor")
    import pyspark.sql.functions as F

    from datafusion_spark.streaming import read_events_stream, running_totals_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        name = f"t_{uuid.uuid4().hex[:8]}"
        stream = read_events_stream(spark, SF_SMALL)
        q = (
            running_totals_tws(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        try:
            # keep the last emission per user (update mode re-emits)
            got = {
                r.user_id: (r.n_events, r.total_value)
                for r in spark.sql(
                    f"SELECT * FROM {name} QUALIFY row_number() OVER "
                    "(PARTITION BY user_id ORDER BY n_events DESC) = 1"
                ).collect()
            }
            batch = (
                load_table(spark, SF_SMALL, "events")
                .groupBy("user_id")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias(
                        "total_value"
                    ),
                )
            )
            want = {
                r.user_id: (r.n_events, r.total_value) for r in batch.collect()
            }
            assert set(got) == set(want)
            for u in want:
                assert got[u][0] == want[u][0], u
                assert abs(got[u][1] - want[u][1]) < 1e-6, u
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_ohlc_matches_batch(spark):
    """Streaming OHLC (min_by/max_by open/close as incremental mergeable
    aggregates under a watermark) converges to the batch twin under
    availableNow."""
    from datafusion_spark.streaming.ops import ohlc_downsample

    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, SF_SMALL)
    q = _run_available_now(ohlc_downsample(stream), name)
    try:
        got = {
            (r.window_start, r.event_type):
                (r.open, r.high, r.low, r.close, r.volume)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        batch = ohlc_downsample(load_table(spark, SF_SMALL, "events"))
        want = {
            (r.window_start, r.event_type):
                (r.open, r.high, r.low, r.close, r.volume)
            for r in batch.collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics, the half of the watermark contract the
    stream==batch twins can't see: once the watermark has passed a
    window's close, a late row for that window must be DROPPED — the
    finalized (append-mode) result never changes.  Two sequential
    availableNow runs over one checkpoint: run 1 processes on-time rows
    and advances the watermark far past the first window; run 2 feeds a
    late row into that closed window.  The file sink's output must hold
    exactly one finalized row for the window, counting only on-time
    rows."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "late_src")
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")
    schema = "event_type string, value double, ts timestamp"

    def write_batch(rows, fname):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("w.start", "event_type", "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    import datetime as dt

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    # run 1: two on-time rows in the 00:00 window, then a row at 05:00
    # that advances the watermark to 04:00 — window 00:00 closes.
    write_batch(
        [("click", 1.0, t(0, 10)), ("click", 2.0, t(0, 40)),
         ("click", 9.0, t(5, 0))],
        "b1",
    )
    run_once()
    # run 2: a LATE row for the closed 00:00 window (watermark 04:00).
    write_batch([("click", 7.0, t(0, 50))], "b2")
    run_once()

    got = {
        (r["start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    key = (t(0, 0), "click")
    assert got.get(key) == 2, got  # late row NOT counted, row NOT re-emitted


def test_stream_stream_semi_join_matches_batch(spark):
    """Converted clicks (left SEMI stream-stream join): the streamed
    result must equal the batch left-semi join exactly — click-shaped
    output, one row per converted click no matter how many purchases
    matched inside the window."""
    from datafusion_spark.streaming import (
        click_purchase_join_semi,
        read_events_stream,
    )

    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, SF_SMALL)
    q = (
        click_purchase_join_semi(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        got = {r.c_event_id
               for r in spark.sql(f"SELECT * FROM {name}").collect()}
        batch = click_purchase_join_semi(load_table(spark, SF_SMALL, "events"))
        want = {r.c_event_id for r in batch.collect()}
        assert got == want and want
        # semi: strictly fewer rows than the inner join's match pairs
        from datafusion_spark.streaming import click_purchase_join
        inner = click_purchase_join(load_table(spark, SF_SMALL, "events"))
        assert len(want) <= inner.count()
    finally:
        q.stop()


def test_stream_stream_full_outer_join_matches_batch(spark):
    """FULL OUTER stream-stream join (both-side null emission — the
    hardest eviction reasoning of the join matrix): matched pairs
    identical to batch; EACH side's null-emissions are a subset of the
    batch unmatched rows (tail rows whose horizon the final watermark
    never passed are legitimately withheld); and both unmatched classes
    must actually appear in the batch reference."""
    from datafusion_spark.streaming import (
        click_purchase_join_full,
        read_events_stream,
    )

    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, SF_SMALL)
    q = (
        click_purchase_join_full(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        got = spark.sql(f"SELECT * FROM {name}").collect()
        batch = click_purchase_join_full(
            load_table(spark, SF_SMALL, "events")
        ).collect()
        pairs = lambda rows: {
            (r.c_event_id, r.p_event_id) for r in rows
            if r.c_event_id is not None and r.p_event_id is not None}
        assert pairs(got) == pairs(batch) and pairs(batch)
        got_left = {r.c_event_id for r in got if r.p_event_id is None}
        want_left = {r.c_event_id for r in batch if r.p_event_id is None}
        got_right = {r.p_event_id for r in got if r.c_event_id is None}
        want_right = {r.p_event_id for r in batch if r.c_event_id is None}
        assert got_left <= want_left and want_left
        assert got_right <= want_right and want_right
        # every output row carries user_id (coalesced across sides)
        assert all(r.user_id is not None for r in got)
    finally:
        q.stop()


def test_stream_stream_right_outer_join_matches_batch(spark):
    """RIGHT OUTER stream-stream join (the mirror of left-outer,
    completing the join matrix — reference symmetric_hash_join.rs
    JoinType::Right): matched pairs identical to batch; null-emissions
    (attribution-less purchases) a subset of the batch unmatched
    purchases; every output row is purchase-shaped (p_event_id never
    NULL) and carries the purchase's user_id."""
    from datafusion_spark.streaming import (
        click_purchase_join_right,
        read_events_stream,
    )

    name = f"t_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, SF_SMALL)
    q = (
        click_purchase_join_right(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        got = spark.sql(f"SELECT * FROM {name}").collect()
        batch = click_purchase_join_right(
            load_table(spark, SF_SMALL, "events")
        ).collect()
        pairs = lambda rows: {
            (r.c_event_id, r.p_event_id) for r in rows
            if r.c_event_id is not None}
        assert pairs(got) == pairs(batch) and pairs(batch)
        got_un = {r.p_event_id for r in got if r.c_event_id is None}
        want_un = {r.p_event_id for r in batch if r.c_event_id is None}
        assert got_un <= want_un and want_un
        assert all(r.p_event_id is not None for r in got)
        assert all(r.user_id is not None for r in got)
        # mirror check: the unmatched-purchase set equals the full
        # outer's right-side null emissions on batch input
        from datafusion_spark.streaming import click_purchase_join_full
        full = click_purchase_join_full(
            load_table(spark, SF_SMALL, "events")).collect()
        assert want_un == {
            r.p_event_id for r in full if r.c_event_id is None}
    finally:
        q.stop()
