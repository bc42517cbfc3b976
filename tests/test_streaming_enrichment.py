"""Stream-static enrichment and watermark late-data semantics.

Two canonical production shapes the batch gate cannot cover:

- a stream joined to a STATIC dimension table (per-micro-batch broadcast
  hash join — no state store, the 100 TB pattern for enriching an event
  stream with reference data), and
- event-time windowed aggregation under a watermark, where a row arriving
  later than the watermark allows is DROPPED rather than re-opening its
  window (the correctness contract that bounds state size at scale).
"""

import time

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _emit(spark, path, rows):
    from datetime import datetime, timezone

    data = [
        Row(
            user_id=u,
            event_id=e,
            ts=datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None),
            value=v,
        )
        for (u, e, s, v) in rows
    ]
    spark.createDataFrame(data, EVENT_SCHEMA).coalesce(1).write.parquet(str(path))


def _drain(spark, query, table, want, timeout=30):
    deadline = time.time() + timeout
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= want:
            break
        time.sleep(0.5)
    return rows


def test_stream_static_dimension_enrichment(spark, tmp_path):
    """Events stream ⋈ static user dimension: every micro-batch plans a fresh
    join against the static side (broadcast-sized here), so dimension updates
    need no stream restart bookkeeping and no state store is involved."""
    src = tmp_path / "src"
    src.mkdir()
    base = 1_700_000_000
    _emit(spark, src / "b0", [(1, 10, base, 5.0), (2, 20, base + 60, 7.0), (9, 90, base + 90, 1.0)])

    users = spark.createDataFrame(
        [Row(user_id=1, tier="gold"), Row(user_id=2, tier="basic")]
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src / "*"))
    enriched = stream.join(F.broadcast(users), "user_id").select(
        "user_id", "event_id", "tier", "value"
    )
    query = (
        enriched.writeStream.format("memory")
        .queryName("enriched_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        rows = _drain(spark, query, "enriched_out", want=2)
    finally:
        query.stop()

    got = {(r.user_id, r.event_id, r.tier, r.value) for r in rows}
    # user 9 has no dimension row → inner join drops it
    assert got == {(1, 10, "gold", 5.0), (2, 20, "basic", 7.0)}


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming exact-dedup with BOUNDED state: dropDuplicatesWithinWatermark
    keeps a key's state only for the watermark horizon, so at 100 TB/day the
    state store holds a sliding window of keys, not the full history. A
    duplicate inside one micro-batch and a cross-batch duplicate arriving
    within the horizon are both dropped."""
    src = tmp_path / "src"
    src.mkdir()
    base = 1_700_000_000
    # batch 0: event 10 twice (in-batch dup) + event 20
    _emit(
        spark,
        src / "b0",
        [(1, 10, base, 1.0), (1, 10, base + 5, 1.0), (2, 20, base + 10, 1.0)],
    )

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src / "*"))
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    query = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        rows = _drain(spark, query, "dedup_out", want=2)
        assert sorted(r.event_id for r in rows) == [10, 20]
        # batch 1: event 10 AGAIN within the watermark horizon (+10 min) plus a
        # fresh event — the repeat must hit state and be dropped
        _emit(spark, src / "b1", [(1, 10, base + 600, 2.0), (3, 30, base + 660, 1.0)])
        rows = _drain(spark, query, "dedup_out", want=3)
        assert sorted(r.event_id for r in rows) == [10, 20, 30]
        assert [r.value for r in rows if r.event_id == 10] == [1.0], (
            "cross-batch duplicate was re-emitted"
        )
    finally:
        query.stop()


def test_watermark_drops_late_rows(spark, tmp_path):
    """1-hour tumbling counts with a 1-minute watermark, append mode: after a
    much-later event finalizes the first window, a straggler row stamped inside
    that window must be dropped — the emitted count stays at the on-time rows
    and the window never re-emits."""
    src = tmp_path / "src"
    src.mkdir()
    base = 1_700_000_000  # 2023-11-14 22:13:20 UTC; window [22:00, 23:00)

    _emit(spark, src / "b0", [(1, 1, base, 1.0), (1, 2, base + 30, 1.0)])

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src / "*"))
    counts = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    query = (
        counts.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # wait for batch 0 to be absorbed (append emits nothing yet)
        deadline = time.time() + 30
        while time.time() < deadline and not query.recentProgress:
            time.sleep(0.5)
        # batch 1: +3h advances the watermark far past the first window's end,
        # closing it and emitting its count
        _emit(spark, src / "b1", [(1, 3, base + 3 * 3600, 1.0)])
        rows = _drain(spark, query, "wm_out", want=1)
        assert len(rows) == 1 and rows[0].n == 2, f"unexpected emission: {rows}"

        # batch 2: a straggler INSIDE the closed window + a fresh on-time event
        # (so the batch provably processes); the straggler must not re-emit or
        # bump the closed window
        _emit(
            spark,
            src / "b2",
            [(1, 4, base + 60, 1.0), (1, 5, base + 3 * 3600 + 60, 1.0)],
        )
        deadline = time.time() + 20
        seen_drop = False
        while time.time() < deadline and not seen_drop:
            rows = spark.sql("SELECT * FROM wm_out").collect()
            assert all(r.n == 2 for r in rows if r.window_start.minute == 0), (
                f"late row re-opened a closed window: {rows}"
            )
            seen_drop = any(
                p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) > 0
                for p in (query.recentProgress or [])
                if p.get("stateOperators")
            )
            time.sleep(0.5)
        late_metrics = [
            p["stateOperators"][0]["numRowsDroppedByWatermark"]
            for p in (query.recentProgress or [])
            if p.get("stateOperators")
        ]
        assert any(n > 0 for n in late_metrics), (
            f"watermark never reported a dropped row: {late_metrics}"
        )
    finally:
        query.stop()
