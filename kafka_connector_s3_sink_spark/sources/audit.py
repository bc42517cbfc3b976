"""Delivery audit over sink output: did every flush land, exactly once?

The reference's delivery contract is at-least-once with idempotent object
overwrite (``README.md:101-133``) — object names derive from
(topic, partition, start_offset), so a lost flush is a HOLE in the offset
line and a partial failure is an object whose record count disagrees with
its manifest entry. Both are detectable from the output alone; this module
turns that check into one DataFrame job:

1. re-ingest the objects (``sources.objects.read_sink_objects``) and reduce
   to one row per object: record count + min/max offset — one hash shuffle
   on object_name with map-side partial aggregation;
2. left-join the ``_manifest`` sidecar shards (written by
   ``sinks.writer.write_batch(manifest="sidecar")``) — per-object expected
   counts, absent ⇒ null checks;
3. window ``lead(start_offset)`` per (topic, partition) over the recovered
   name variables: the next object's start offset must be exactly
   ``max_offset + 1`` — a larger gap means a lost flush, a smaller one means
   overlapping delivery. One window on the same key the objects already
   group by; O(objects), never O(records), past step 1's reduction.

Timestamp-grouped and key-grouped sinks have no contiguous-offset contract
(objects split on wallclock / later flushes overwrite per key), so the
continuity column is only emitted for plain topic+partition grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.config import EngineConfig, OutputField
from kafka_connector_s3_sink_spark.sources.objects import read_sink_objects
from kafka_connector_s3_sink_spark.template import GrouperType


def repair_sink_output(
    records: DataFrame,
    dest_dir: str,
    config: EngineConfig,
    clock=None,
    manifest: str = "driver",
    storage=None,
) -> list[tuple[str, int]]:
    """Self-healing delivery: rewrite exactly the objects that are broken.

    Object names and contents are deterministic functions of the records
    (the idempotence the reference's delivery contract rests on,
    ``README.md:101-133``), so repair is a pure diff-and-rewrite:

    1. ``expected_manifest`` computes the (object_name, records) set the
       write WOULD produce — no storage touched;
    2. the delivery audit reads what IS there (decode errors routed);
    3. objects that are missing, record-count-mismatched, or undecodable are
       rewritten by the normal writer restricted to that name set
       (``only_objects`` semi join — healthy groups drop before rendering,
       so repair cost scales with the damage, not the corpus).

    Returns the writer's [(object_name, records)] for the rewritten set
    (empty = store already consistent). Count equality is the cheap
    integrity proxy the sidecar manifest also uses; byte-level verification
    is the read-back round-trip's job (``sink_headers_csv`` oracle branch).
    ``records`` must cover the audited range — records absent from the
    input cannot be rewritten (missing objects outside it still surface in
    the audit, just not here).
    """
    from kafka_connector_s3_sink_spark.sinks.writer import (
        expected_manifest,
        write_batch,
    )

    spark = records.sparkSession
    expected = expected_manifest(records, config, clock)
    observed = audit_sink_output(spark, dest_dir, config, check_manifest=False)
    obs_cols = ["object_name", F.col("records").alias("observed_records")]
    if "decode_error" in observed.columns:
        obs_cols.append("decode_error")
    else:
        obs_cols.append(F.lit(None).cast("string").alias("decode_error"))
    observed = observed.select(*obs_cols)
    broken = (
        expected.join(observed, "object_name", "left")
        .filter(
            F.col("observed_records").isNull()
            | (F.col("observed_records") != F.col("expected_records"))
            | F.col("decode_error").isNotNull()
        )
        .select("object_name")
    )
    return write_batch(
        records,
        config,
        dest_dir,
        clock=clock,
        manifest=manifest,
        storage=storage,
        only_objects=broken,
    )


def read_manifest(spark: SparkSession, dest_dir: str) -> DataFrame:
    """(object, records) from the ``_manifest`` sidecar shards. The shards
    live under a ``_``-prefixed directory precisely so data scans skip them;
    the audit loads them by explicit path."""
    return (
        spark.read.schema("object string, records long")
        .json(f"{dest_dir}/_manifest")
        .withColumnRenamed("object", "object_name")
        .withColumnRenamed("records", "manifest_records")
    )


def audit_sink_output(
    spark: SparkSession,
    dest_dir: str,
    config: EngineConfig,
    check_manifest: bool = True,
    on_error: str = "route",
) -> DataFrame:
    """One row per written object:
    (object_name, topic, partition, start_offset, records, min_offset,
    max_offset, manifest_records, manifest_ok, next_start_offset, gap_after)

    - ``manifest_ok``: record count equals the sidecar entry (null when no
      manifest was written or ``check_manifest=False``);
    - ``gap_after``: offsets skipped between this object's ``max_offset`` and
      the next object's ``start_offset`` in the same (topic, partition) —
      0 is contiguous, >0 lost records, <0 overlapping delivery; null on the
      last object of each partition (nothing follows yet). Offset columns
      require ``OutputField.OFFSET`` in the sink's output fields; without it
      the audit still checks names and manifest counts.
    - ``decode_error``: a corrupt/undecodable object surfaces as a row with
      ``records=0`` and the exception text — an AUDIT must report broken
      objects, not die on them, so routing is the default here (pass
      ``on_error="fail"`` to get the strict behavior). Text formats route
      per-object decode failures; parquet (r6) routes footer-validation
      failures (a corrupt footer would otherwise kill the native scan at
      planning time).
    """
    has_offsets = OutputField.OFFSET in config.output_fields
    back = read_sink_objects(
        spark, dest_dir, config, parse_names=True, on_error=on_error,
    )
    routed = on_error == "route"

    # a routed poison object contributes one decode_error row — it must count
    # as 0 records, and the error text rides along per object
    aggs = [
        F.count(F.when(F.col("decode_error").isNull(), 1)).alias("records")
        if routed
        else F.count(F.lit(1)).alias("records")
    ]
    if routed:
        aggs.append(F.max("decode_error").alias("decode_error"))
    if has_offsets:
        aggs += [
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
        ]
    group_cols = ["object_name"]
    if config.template.grouper_type is not GrouperType.KEY:
        group_cols += ["topic", "partition", "start_offset"]
    else:
        group_cols += ["key_str"]
    per_object = back.groupBy(*group_cols).agg(*aggs)

    if check_manifest:
        try:
            manifest = read_manifest(spark, dest_dir)
            per_object = per_object.join(manifest, "object_name", "left").withColumn(
                "manifest_ok",
                F.when(
                    F.col("manifest_records").isNotNull(),
                    F.col("manifest_records") == F.col("records"),
                ),
            )
        except Exception:  # noqa: BLE001 — no sidecar written (driver manifest)
            per_object = per_object.withColumn(
                "manifest_records", F.lit(None).cast("long")
            ).withColumn("manifest_ok", F.lit(None).cast("boolean"))
    else:
        per_object = per_object.withColumn(
            "manifest_records", F.lit(None).cast("long")
        ).withColumn("manifest_ok", F.lit(None).cast("boolean"))

    if has_offsets and config.template.grouper_type is GrouperType.TOPIC_PARTITION:
        w = Window.partitionBy("topic", "partition").orderBy("start_offset")
        per_object = per_object.withColumn(
            "next_start_offset", F.lead("start_offset").over(w)
        ).withColumn(
            "gap_after",
            F.col("next_start_offset") - F.col("max_offset") - F.lit(1),
        )
    return per_object
