"""Stateful streaming sessionization: per-user state carried across
micro-batches via applyInPandasWithState; sessions emitted when the event-time
watermark passes session_end + gap. Also pins the batch sessionizers against
each other (islands vs built-in session_window)."""

import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connector_s3_sink_spark.streaming.sessions import (
    sessionize_batch,
    session_window_stats,
    stream_sessionize,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _mk_events(spark, rows):
    from datetime import datetime, timezone

    data = [
        Row(
            user_id=u,
            event_id=e,
            ts=datetime.fromtimestamp(ts_s, tz=timezone.utc).replace(tzinfo=None),
            value=float(v),
        )
        for (u, e, ts_s, v) in rows
    ]
    return spark.createDataFrame(data, EVENT_SCHEMA)


def test_batch_sessionizers_agree(spark):
    """Islands formulation and built-in session_window cut identical sessions
    (away from the >=/<~boundary the two define identically)."""
    base = 1_700_000_000
    rows = [
        (1, 1, base, 1.0),
        (1, 2, base + 60, 2.0),          # same session (1 min gap)
        (1, 3, base + 60 + 3600, 3.0),   # new session (1h gap)
        (2, 4, base, 5.0),               # other user
    ]
    ev = _mk_events(spark, rows)
    islands = sessionize_batch(ev).collect()
    native = session_window_stats(ev).collect()
    assert [(r.user_id, r.n_events, r.session_value) for r in islands] == [
        (1, 2, 3.0),
        (1, 1, 3.0),
        (2, 1, 5.0),
    ]
    assert [(r.user_id, r.n_events, r.session_value) for r in native] == [
        (1, 2, 3.0),
        (1, 1, 3.0),
        (2, 1, 5.0),
    ]
    # session bounds agree: session_window end = islands end + gap
    assert [r.session_start for r in native] == [r.session_start for r in islands]


def test_stream_sessionize_emits_on_watermark(spark, tmp_path):
    """Two micro-batches: batch 0 opens a session; batch 1's much-later event
    advances the watermark past session_end + gap → the stateful operator emits
    the closed session (state store logic, not re-aggregation)."""
    src = tmp_path / "src"
    src.mkdir()
    base = 1_700_000_000

    def emit(name, rows):
        _mk_events(spark, rows).coalesce(1).write.parquet(str(src / name))

    emit("b0", [(7, 1, base, 1.0), (7, 2, base + 120, 1.0)])

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src / "*"))
    sessions = stream_sessionize(stream, gap_minutes=30, watermark="1 minute")
    query = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not query.recentProgress:
            time.sleep(0.5)
        # batch 1: 3 hours later → watermark (max_ts - 1min) >> session_end + 30min
        emit("b1", [(7, 3, base + 3 * 3600, 1.0)])
        deadline = time.time() + 30
        result = []
        while time.time() < deadline:
            result = spark.sql("SELECT * FROM sess_out").collect()
            if result:
                break
            time.sleep(0.5)
    finally:
        query.stop()

    assert len(result) == 1, f"expected 1 closed session, got {result}"
    r = result[0]
    assert (r.user_id, r.n_events) == (7, 2)
    assert r.session_start == base * 1000
    assert r.session_end == (base + 120) * 1000
