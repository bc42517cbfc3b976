"""Canonical Kafka-record DataFrame shape and test-table adapters.

The unit of data is the SinkRecord envelope (SURVEY.md §1.1, from
``S3SinkTaskTest.java:811-820``): topic, partition, offset, key, value,
timestamp (epoch ms), headers (ordered list of key/bytes pairs — ArrayType of
Struct, NOT MapType, to preserve order and duplicate keys).

This matches Spark's native Kafka-source schema
(``spark.readStream.format("kafka")``): key binary, value binary, topic string,
partition int, offset long, timestamp, headers array<struct<key,value>>, so a
pipeline built on this shape runs unchanged on a real Kafka stream.

The driver's ``events`` parquet table is not Kafka-shaped, so ``kafka_records_from_events``
derives a deterministic Kafka view from it; ``KAFKA_VIEW_SQL`` is the equivalent
ANSI SQL (DuckDB-compatible) used by the correctness oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("timestamp", T.LongType(), True),  # epoch ms (CREATE_TIME)
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), False),
                        T.StructField("value", T.BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

# ByteArrayConverter-shaped canonical record: key/value stay BinaryType
# end-to-end (the Kafka source's native shape; the CSV contract's required
# BYTES schema type, S3SinkTaskTest.java:474-498).
KAFKA_RECORD_SCHEMA_BINARY = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("headers", KAFKA_RECORD_SCHEMA["headers"].dataType, True),
    ]
)

N_PARTITIONS = 4


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the driver's ``events`` table, normalizing whatever physical type
    this round's generator used for ``ts`` to a regular UTC-instant
    TimestampType. The column has shipped as TIMESTAMP(NANOS) (illegal for
    Spark's parquet reader by default → nanos-as-long → µs truncation, the
    same truncation DuckDB's reader applies) and as µs TIMESTAMP_NTZ (Spark
    infers TimestampNTZType → cast to instant in an explicitly-UTC session,
    matching DuckDB's naive-timestamp-as-UTC ``epoch_ms``). Oracle
    comparisons stay exact on every path."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ→instant cast reads the session zone AT ANALYSIS TIME (the cast
    # expression captures it when the transformation resolves), so pin UTC
    # only around the cast and restore the caller's zone after — a reader
    # call must not silently change timestamp rendering for every subsequent
    # query in the caller's session.
    prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        t = dict(ev.dtypes).get("ts")
        if t == "bigint":  # nanos-as-long path
            # integer DIV, not `/`: epoch-ns (~1.7e18) exceeds double's 2^53
            # exact range, so float division would round the low bits
            ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif t == "timestamp_ntz":
            ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    finally:
        if prev_tz is not None:
            spark.conf.set("spark.sql.session.timeZone", prev_tz)
        else:
            spark.conf.unset("spark.sql.session.timeZone")
    return ev


def kafka_records_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Kafka-record view over the driver's ``events`` table.

    topic = event_type, partition = user_id % 4, offset = event_id (globally
    unique → unique within partition), key = user_id as string but NULL for
    'error' events (exercises the null-key path, IntegrationTest.java:370-373),
    value = props JSON string, timestamp = epoch millis of ts.
    """
    events = read_events(spark, sf_dir)
    return events.select(
        F.col("event_type").alias("topic"),
        (F.col("user_id") % N_PARTITIONS).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.col("user_id").cast("string"))
        .alias("key"),
        F.col("props").alias("value"),
        F.unix_millis(F.col("ts")).alias("timestamp"),
        F.lit(None).cast(KAFKA_RECORD_SCHEMA["headers"].dataType).alias("headers"),
    )


# DuckDB-compatible equivalent of kafka_records_from_events, used as a CTE by
# every sink-operator oracle. Column semantics must stay in lockstep with the
# Spark view above.
KAFKA_VIEW_SQL = """
    SELECT
        event_type AS topic,
        CAST(user_id % 4 AS INTEGER) AS partition,
        event_id AS "offset",
        CASE WHEN event_type = 'error' THEN NULL ELSE CAST(user_id AS VARCHAR) END AS key,
        props AS value,
        CAST(epoch_ms(ts) AS BIGINT) AS "timestamp"
    FROM events
"""


def with_synthetic_headers(df: DataFrame) -> DataFrame:
    """Attach two deterministic headers per record (mirrors the reference's
    two-header fixture, S3SinkTaskTest.java:848-853) for header-serialization tests."""
    return df.withColumn(
        "headers",
        F.array(
            F.struct(
                F.lit("h-topic").alias("key"),
                F.encode(F.col("topic"), "UTF-8").alias("value"),
            ),
            F.struct(
                F.lit("h-offset").alias("key"),
                F.encode(F.col("offset").cast("string"), "UTF-8").alias("value"),
            ),
        ),
    )
