"""Structured Streaming pipeline: Kafka (or any streaming source in the
canonical record shape) → grouped, formatted, exactly-named objects.

Maps the reference's control flow 1:1 onto Structured Streaming
(SURVEY.md §3.2):

- ``topics`` / ``topics.regex``      → ``subscribe`` / ``subscribePattern``
- ``offset.flush.interval.ms``       → ``trigger(processingTime=…)``
- offset commit on flush             → checkpoint commit (exactly-once batch ids)
- ``kafka.retry.backoff.ms``         → Spark task/epoch retry (failures in
                                       ``foreachBatch`` rerun the same epoch,
                                       same idempotent object names)
- flush barrier + clear()            → each micro-batch IS the flush; no
                                       driver-heap record map exists at all

The same ``write_batch`` runs in batch tests and under ``foreachBatch`` —
one code path, which is what makes the golden-file tests meaningful for the
streaming deployment.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.config import EngineConfig
from kafka_connector_s3_sink_spark.sinks.writer import write_batch
from kafka_connector_s3_sink_spark.template import ensure_utc_session


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: Optional[str] = None,
    topics_regex: Optional[str] = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming DataFrame in Spark's native Kafka shape. ``topics`` XOR
    ``topics_regex`` mirrors ``topics`` / ``topics.regex`` (README.md:537-540)."""
    if (topics is None) == (topics_regex is None):
        raise ValueError("exactly one of topics / topics_regex must be set")
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", "true")
    )
    if topics is not None:
        reader = reader.option("subscribe", topics)
    else:
        reader = reader.option("subscribePattern", topics_regex)
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def normalize_kafka_stream(df: DataFrame, converter: str = "string") -> DataFrame:
    """Kafka-source columns → canonical record shape.

    ``converter="string"`` decodes binary key/value as UTF-8 strings
    (records.KAFKA_RECORD_SCHEMA); ``converter="bytes"`` keeps the source's
    native BinaryType payloads end-to-end (ByteArrayConverter — the shape the
    reference's CSV contract requires, records.KAFKA_RECORD_SCHEMA_BINARY)."""
    if converter not in ("string", "bytes"):
        raise ValueError(f"converter must be 'string' or 'bytes', {converter!r} given")
    key = F.col("key")
    value = F.col("value")
    if converter == "string":
        key = key.cast("string")
        value = value.cast("string")
    return df.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        key.alias("key"),
        value.alias("value"),
        F.unix_millis(F.col("timestamp")).alias("timestamp"),
        F.col("headers"),
    )


def split_dead_letters(df: DataFrame, error_col: str = "decode_error"):
    """Kafka Connect's ``errors.tolerance=all`` + dead-letter-queue routing
    as a DataFrame split: ``(clean, dlq)`` where ``dlq`` holds the rows a
    capture-mode converter marked (``decode_avro_column(on_error="capture")``,
    ``multimodal.extract_features(on_error="capture")``) and ``clean`` drops
    the error column. Write ``dlq`` through the same sink under its own
    prefix (the DLQ "topic"), carrying the error text as Connect's DLQ
    headers do — one poison record never stalls the pipeline, and nothing
    is silently dropped."""
    clean = df.filter(F.col(error_col).isNull()).drop(error_col)
    dlq = df.filter(F.col(error_col).isNotNull())
    return clean, dlq


def start_pipeline(
    records: DataFrame,
    config: EngineConfig,
    dest_dir: str,
    query_name: str = "kafka-s3-sink",
    fault: object | None = None,
):
    """Start the sink query: every micro-batch runs the batch writer (the flush).

    The checkpoint location (``config.checkpoint_location``) is the offset-commit
    ledger; re-running a failed epoch rewrites the same object names
    (idempotent at-least-once, §2.5 delivery semantics).

    ``fault`` forwards to ``write_batch``'s per-object fault hook (crash-path
    tests: a mid-epoch failure must leave no partial object, and the
    checkpoint replay must converge to the clean-run object set).
    """
    if not config.checkpoint_location:
        raise ValueError("checkpoint_location is required to start the streaming pipeline")
    ensure_utc_session(records.sparkSession)

    def flush(batch_df: DataFrame, batch_id: int) -> None:
        write_batch(batch_df, config, dest_dir, fault=fault)

    writer = (
        records.writeStream.queryName(query_name)
        .foreachBatch(flush)
        .option("checkpointLocation", config.checkpoint_location)
        .trigger(processingTime=f"{config.flush_interval_ms} milliseconds")
    )
    return writer.start()
