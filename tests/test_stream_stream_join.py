"""Watermarked stream-stream interval join: click events joined to the same
user's purchase events within 1 hour — Spark buffers both sides in the state
store and evicts by watermark. The canonical streaming shape for
attribution-style joins the reference cannot express at all."""

import time

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _emit(spark, path, rows):
    from datetime import datetime, timezone

    data = [
        Row(
            user_id=u,
            event_id=e,
            ts=datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None),
        )
        for (u, e, s) in rows
    ]
    spark.createDataFrame(data, EVENT_SCHEMA).coalesce(1).write.parquet(str(path))


def test_stream_stream_interval_join(spark, tmp_path):
    base = 1_700_000_000
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()
    # click 1 → purchase 40min later (joins); click 2 → purchase 3h later (no join)
    _emit(spark, clicks_dir / "b0", [(1, 10, base), (2, 20, base)])
    _emit(spark, buys_dir / "b0", [(1, 11, base + 2400), (2, 21, base + 10800)])

    clicks = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(str(clicks_dir / "*"))
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    buys = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(str(buys_dir / "*"))
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("buy_ts"),
        )
    )
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") < F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    query = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT click_id, buy_id FROM ss_join").collect()
            if rows:
                break
            time.sleep(0.5)
    finally:
        query.stop()
    assert [(r.click_id, r.buy_id) for r in rows] == [(10, 11)]
