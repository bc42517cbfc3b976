"""Checkpoint introspection: Structured Streaming's offset/commit logs as
DataFrames.

The delivery audit answers "did every flush land?" from the OUTPUT; this
module answers the other half — "what did the stream think it did?" — from
the CHECKPOINT, without restarting the query. Spark's checkpoint layout is
public/stable: ``offsets/<batchId>`` holds the planned offsets for each
epoch (a ``v1`` version line, a metadata JSON line, then one offset JSON
per source), ``commits/<batchId>`` exists iff the epoch COMMITTED. The two
directories' difference is exactly the replay frontier: a batch with an
offset file but no commit file is the one a restart will re-run — the
at-least-once window the idempotent sink absorbs.

Driver-side small-file reads through ``ObjectStorage`` (a checkpoint holds
O(retained epochs) tiny files, bounded by
``spark.sql.streaming.minBatchesToRetain``), so any pyarrow.fs URI works.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from kafka_connector_s3_sink_spark.sinks.storage import ObjectStorage


def _read_log(storage: ObjectStorage, subdir: str) -> list[tuple[int, list[str]]]:
    out = []
    for name in storage.listing():
        parts = name.split("/")
        if len(parts) == 2 and parts[0] == subdir:
            try:
                batch_id = int(parts[1])
            except ValueError:
                continue  # .compact and friends
            lines = storage.read_bytes(name).decode("utf-8").splitlines()
            out.append((batch_id, lines))
    return sorted(out)


def read_checkpoint_state(
    spark: SparkSession, checkpoint_dir: str
) -> DataFrame:
    """One row per epoch in the checkpoint:
    ``(batch_id, committed, n_sources, source_offsets, batch_watermark_ms,
    batch_timestamp_ms)``.

    ``committed=false`` on the newest row is normal (the in-flight epoch);
    anywhere else it marks the replay frontier after a crash.
    ``source_offsets`` carries each source's offset JSON verbatim — source
    formats differ (Kafka: partition map; file/``sink_objects``/``warc``
    sources: their own cursor), and interpreting them is the caller's
    domain knowledge."""
    storage = ObjectStorage(checkpoint_dir)
    offsets = _read_log(storage, "offsets")
    commits = {b for b, _ in _read_log(storage, "commits")}
    rows = []
    for batch_id, lines in offsets:
        meta: dict = {}
        sources: list[str] = []
        for line in lines[1:]:  # line 0 is the "v1" version marker
            if not line.strip():
                continue
            try:
                parsed = json.loads(line)
            except ValueError:
                sources.append(line)
                continue
            if (
                not meta
                and isinstance(parsed, dict)
                and ("batchWatermarkMs" in parsed or "batchTimestampMs" in parsed)
            ):
                meta = parsed
            else:
                sources.append(line)
        rows.append(
            (
                batch_id,
                batch_id in commits,
                len(sources),
                sources,
                meta.get("batchWatermarkMs"),
                meta.get("batchTimestampMs"),
            )
        )
    return spark.createDataFrame(
        rows,
        "batch_id long, committed boolean, n_sources int, "
        "source_offsets array<string>, batch_watermark_ms long, "
        "batch_timestamp_ms long",
    )


def replay_frontier(spark: SparkSession, checkpoint_dir: str) -> list[int]:
    """Batch ids a restart will re-run: offsets written, commit missing.
    Empty list = the checkpoint is fully committed (clean shutdown)."""
    state = read_checkpoint_state(spark, checkpoint_dir)
    return [
        r["batch_id"]
        for r in state.filter(~state["committed"]).collect()
    ]
