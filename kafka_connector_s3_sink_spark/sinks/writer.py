"""Batch object writer: one output object per record group, exactly named by the
filename template (the reference's flush path, ``S3SinkTask.java:121-144``).

Spark-first decomposition:

1. group key + chunk assignment   — Column expressions (grouping.py)
2. per-group start offset         — window ``min(offset)`` over the group
                                    (same shuffle the write needs anyway)
3. line rendering                 — Column expressions, JVM codegen (formats/render.py)
4. distribution                   — ``repartition(filename)`` +
                                    ``sortWithinPartitions(filename, offset)``
5. object write                   — per-partition Python writer streaming Arrow
                                    record batches into compressed files; memory
                                    is bounded by one compression buffer (text) or
                                    one group's columnar buffer (parquet/ORC),
                                    not by partition size

Only step 5 is Python, and it is pure I/O (the bytes were rendered JVM-side).
Data crosses the JVM→Python boundary as Arrow record batches (``mapInArrow``,
r16 — previously ``rdd.mapPartitions`` pickled every row): group boundaries are
found with vectorized dictionary-encode + diff, text groups are joined with one
C-level ``binary_join`` per batch slice instead of a per-row loop, and columnar
groups are written from the arriving Arrow arrays directly. Output bytes are
identical (verified object-for-object against the row path).
Object I/O goes through ``sinks.storage.ObjectStorage`` (pyarrow.fs), so
``dest_dir`` may be a local path, ``file://``, ``s3://``, ``gs://`` or
``hdfs://`` URI; every object commit is atomic (temp+rename, or direct PUT on
object stores) with abort-on-error parity to ``S3OutputStream.java:101-132``.
Idempotence: object names derive from (topic, partition, start_offset) — at-least-once
reprocessing overwrites the same objects (``README.md:101-133``); key-mode later
flushes intentionally overwrite (``README.md:158-170``).

Scale notes: ``repartition(filename)`` hash-distributes groups across executors;
a skewed group (one huge topic-partition) maps to one task, which is the
reference's behavior too (one file is inherently one writer) — ``file.max.records``
is the knob that splits it. For directory-layout output at 100 TB (no exact-name
requirement) prefer ``write_spark_native``, which keeps everything in the JVM
(``partitionBy`` + ``maxRecordsPerFile``).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.config import CompressionType, EngineConfig, FormatType
from kafka_connector_s3_sink_spark.formats.compression import open_compressed
from kafka_connector_s3_sink_spark.formats.render import record_line_column
from kafka_connector_s3_sink_spark.operators.projection import (
    enforce_csv_schema_types,
)
from kafka_connector_s3_sink_spark.operators.grouping import (
    assign_file_chunks,
    assign_schema_runs,
    last_value_per_key,
)
from kafka_connector_s3_sink_spark.sinks.storage import ObjectStorage
from kafka_connector_s3_sink_spark.template import GrouperType, ensure_utc_session


def _filename_column(config: EngineConfig, clock: Column | None) -> Column:
    """Filename per record with per-group start offset resolved via a window
    min — offsets arrive near-sorted per Kafka partition, so the sort is cheap."""
    tpl = config.template
    if tpl.grouper_type is GrouperType.KEY:
        start = F.col("offset")
    else:
        gk = ["topic", "partition", "_chunk"]
        start = F.min("offset").over(Window.partitionBy(*gk))
    return tpl.filename_column(
        start_offset=start,
        clock=clock,
        timezone=config.timestamp_timezone,
        prefix=config.prefix,
        extension=config.filename_extension,
    )


def prepare_with_filenames(
    df: DataFrame, config: EngineConfig, clock: Column | None = None
) -> DataFrame:
    """Records with their deterministic ``_file`` object name attached — the
    grouping/chunking/rotation half of the write, shared by the writer, the
    dry-run manifest, and the audit-driven repair path."""
    enforce_csv_schema_types(df.schema, config)
    tpl = config.template
    if tpl.grouper_type is GrouperType.KEY:
        # last-value-per-key upsert (one record per key → one object per key)
        df = last_value_per_key(df)
        return df.withColumn("_file", _filename_column(config, clock))
    if config.format_type is FormatType.PARQUET and config.parquet_schema_rotation:
        # schema-change rotation: fold the schema-run index into the chunk
        # key so each run names its own object starting at the run's first
        # offset (AvroParquetIntegrationTest.java:288-335). The run window
        # and the chunk window share one (topic, partition) shuffle.
        df = assign_schema_runs(df)
        if config.file_max_records > 0:
            w = Window.partitionBy("topic", "partition", "_schema_run").orderBy(
                "offset"
            )
            rn = F.row_number().over(w) - F.lit(1)
            sub = (rn / config.file_max_records).cast("int")
        else:
            sub = F.lit(0)
        chunked = df.withColumn(
            "_chunk", F.concat_ws("-", F.col("_schema_run"), sub)
        )
    else:
        chunked = assign_file_chunks(df, config)
    return chunked.withColumn("_file", _filename_column(config, clock))


def expected_manifest(
    df: DataFrame, config: EngineConfig, clock: Column | None = None
) -> DataFrame:
    """Dry-run manifest: (object_name, records) the write WOULD produce —
    object names are deterministic functions of the records, so this is
    computable without touching storage. The repair path diffs it against
    the observed store."""
    ensure_utc_session(df.sparkSession)
    return (
        prepare_with_filenames(df, config, clock)
        .groupBy(F.col("_file").alias("object_name"))
        .agg(F.count(F.lit(1)).alias("expected_records"))
    )


def write_batch(
    df: DataFrame,
    config: EngineConfig,
    dest_dir: str,
    clock: Column | None = None,
    manifest: str = "driver",
    storage: ObjectStorage | None = None,
    fault: object | None = None,
    only_objects: DataFrame | None = None,
) -> list[tuple[str, int]]:
    """Write one batch of canonical Kafka records as exactly-named objects under
    ``dest_dir`` (a local path or any ``pyarrow.fs`` URI — ``file://``,
    ``s3://``, ``hdfs://``). Returns [(object_name, record_count)] sorted by
    name. ``storage`` overrides the default ``ObjectStorage(dest_dir)``
    (e.g. to force a commit mode); ``fault`` is a picklable callable
    ``fault(object_name)`` invoked mid-write before each object commits —
    test hook for the abort-on-error contract (a raised exception must leave
    no partial object, ``S3OutputStreamTest``'s abort semantics).

    ``clock`` injects a fixed timestamp for the {{timestamp}} template variable
    (tests; the reference's own tests race midnight, IntegrationTest.java:246-258).

    ``only_objects`` (a one-column DataFrame of object names) restricts the
    write to that subset of groups — the audit-driven repair path: names are
    deterministic, so rewriting a group reproduces it, and untouched groups
    cost no I/O (their rows drop before rendering/shuffle).

    ``manifest`` controls where the per-object manifest goes. ``"driver"``
    (default) collects one (name, count) tuple per OBJECT — never data rows —
    which is fine until a batch writes millions of objects (file.max.records=1
    at 100 TB). ``"sidecar"`` keeps the manifest distributed: each task appends
    its entries to ``dest_dir/_manifest/part-<pid>.jsonl`` and the driver sees
    only the object count (returns []). Sidecar shards are written by the same
    task that wrote the objects, so a task retry rewrites both identically
    (same names, same contents — idempotent like the objects themselves).
    """
    ensure_utc_session(df.sparkSession)
    if storage is None:
        storage = ObjectStorage(dest_dir)
    prepared = prepare_with_filenames(df, config, clock)
    if only_objects is not None:
        # repair mode: restrict the write to a given object-name set (the
        # names are deterministic, so rewriting a group reproduces its bytes)
        prepared = prepared.join(
            only_objects.select(F.col(only_objects.columns[0]).alias("_file")),
            "_file",
            "left_semi",
        )

    fmt = config.format_type
    if fmt in (FormatType.PARQUET, FormatType.AVRO, FormatType.ORC):
        cols = [F.col("_file")] + [
            F.col(f.value).alias(f.value) for f in config.output_fields
        ]
        ordered = (
            prepared.select(*cols, F.col("offset").alias("_ord"))
            .repartition(F.col("_file"))
            .sortWithinPartitions("_file", "_ord")
        )
        if config.parquet_value_schema is not None and "value" in ordered.columns:
            # schema'd value mode: the envelope's value becomes a TRUE NESTED
            # RECORD (the reference's Avro-record value shape,
            # AvroParquetIntegrationTest.java:136-349, README.md:357-405).
            # Parsed AFTER rotation/chunk assignment, which key on the raw
            # JSON's observed key set — the JSON analog of the embedded
            # Avro-schema identity that drives the reference's rotation.
            ordered = ordered.withColumn(
                "value",
                F.from_json(
                    F.col("value").cast("string"), config.parquet_value_schema
                ),
            )
        if fmt is FormatType.AVRO:
            writer = _avro_partition_writer(storage, config, ordered.schema, fault)
        else:
            writer = _parquet_partition_writer(
                storage, config, ordered.schema, fault
            )
    else:
        ordered = (
            prepared.select(
                F.col("_file"),
                record_line_column(config, prepared.schema).alias("_line"),
                F.col("offset").alias("_ord"),
            )
            .repartition(F.col("_file"))
            .sortWithinPartitions("_file", "_ord")
        )
        writer = _text_partition_writer(storage, config, fault)

    out_schema = "object string, records long"
    if manifest == "sidecar":
        # triggers the write; only (object, records) rows reach the driver,
        # and the sidecar mode discards even those (shards hold the manifest)
        ordered.mapInArrow(
            _sidecar_manifest(writer, storage), out_schema
        ).collect()
        return []
    rows = ordered.mapInArrow(_arrow_emit(writer), out_schema).collect()
    return sorted((r[0], r[1]) for r in rows)


def _group_runs(batch) -> Iterator[tuple[str, int, int]]:
    """(object_name, start, length) runs of equal ``_file`` (column 0) within
    one Arrow record batch. Rows arrive clustered by filename, so runs are
    contiguous; boundaries come from a vectorized dictionary-encode + diff
    instead of a per-row comparison loop."""
    import numpy as np

    if batch.num_rows == 0:
        return
    di = batch.column(0).dictionary_encode()
    idx = di.indices.to_numpy(zero_copy_only=False)
    uniq = di.dictionary.to_pylist()
    cuts = (np.nonzero(np.diff(idx))[0] + 1).tolist()
    starts = [0] + cuts
    ends = cuts + [len(idx)]
    for s, e in zip(starts, ends):
        yield uniq[idx[s]], s, e - s


def _arrow_emit(writer):
    """Adapt a batch writer (yields (name, count) tuples) to ``mapInArrow``'s
    contract: one (object, records) record batch per task."""

    def run(batches) -> Iterator:
        import pyarrow as pa

        names: list[str] = []
        counts: list[int] = []
        for name, count in writer(batches):
            names.append(name)
            counts.append(count)
        yield pa.RecordBatch.from_arrays(
            [pa.array(names, type=pa.string()), pa.array(counts, type=pa.int64())],
            names=["object", "records"],
        )

    return run


def _sidecar_manifest(writer, storage: ObjectStorage):
    """Wrap a partition writer so each task streams its own manifest shard to
    ``<dest>/_manifest/part-<partitionId>.jsonl`` — one JSON line per object,
    nothing returned to the driver.

    Shards go through the same ``ObjectStorage`` client as the data objects,
    so the manifest works on any pyarrow.fs backend (``file:``/``s3://``/
    ``hdfs://``) — no shared-mount assumption. The shard is buffered in the
    task (one small JSON line per OBJECT the task wrote — bounded by the
    manifest's own documented O(objects-per-task)) and committed atomically
    after the task's objects, so a task retry rewrites both identically."""

    def write(batches) -> Iterator:
        import json

        import pyarrow as pa
        from pyspark import TaskContext

        lines: list[str] = []
        names: list[str] = []
        counts: list[int] = []
        for name, count in writer(batches):
            lines.append(json.dumps({"object": name, "records": count}))
            names.append(name)
            counts.append(count)
        if lines:
            pid = TaskContext.get().partitionId()
            storage.write_bytes(
                f"_manifest/part-{pid:05d}.jsonl",
                ("\n".join(lines) + "\n").encode(),
            )
        yield pa.RecordBatch.from_arrays(
            [pa.array(names, type=pa.string()), pa.array(counts, type=pa.int64())],
            names=["object", "records"],
        )

    return write


def _text_partition_writer(storage: ObjectStorage, config: EngineConfig, fault=None):
    """Streaming per-partition writer for CSV/JSONL/JSON over Arrow batches.

    Rows arrive clustered by filename and sorted by offset; the writer holds
    one open compressed stream per in-flight object. Each batch slice of a
    group is concatenated with ONE C-level ``binary_join`` (an Arrow string
    column is a contiguous buffer + offsets, so the join never touches rows
    from Python) and written in a single call — memory is O(compression
    buffer + one batch), never O(group). JSON's array framing ("[", ",\\n"
    separators, "]") is byte-identical to the old per-row lookbehind form:
    a group renders as "[\\n" + ",\\n".join(lines) + "\\n]\\n" across any
    batch split.

    Each object streams through ``storage.open_output`` — committed only on a
    clean finish; any exception (including the ``fault`` test hook) aborts the
    in-flight object so no partial bytes are visible under its final name
    (``S3OutputStream.java:101-132`` abort parity).
    """
    compression = config.file_compression
    is_json_array = config.format_type is FormatType.JSON

    def write(batches) -> Iterator[tuple[str, int]]:
        import pyarrow as pa
        import pyarrow.compute as pc

        current: str | None = None
        cm = None  # storage.open_output context for the in-flight object
        stream = None
        count = 0

        def join_slice(lines, sep: str) -> bytes:
            la = pa.ListArray.from_arrays(
                pa.array([0, len(lines)], type=pa.int32()), lines
            )
            return pc.binary_join(la, sep)[0].as_py().encode()

        def finish():
            nonlocal cm, stream, count
            if cm is None:
                return None
            if is_json_array:
                stream.write(b"\n]\n")
            stream.close()  # flush compressed tail into the raw stream
            if fault is not None:
                fault(current)  # raises → except below aborts via cm.__exit__
            cm.__exit__(None, None, None)  # commit (rename / complete upload)
            result = (current, count)
            cm = stream = None
            return result

        try:
            for batch in batches:
                lines_col = batch.column(1)
                for name, start, length in _group_runs(batch):
                    if name != current:
                        done = finish()
                        if done:
                            yield done
                        current = name
                        count = 0
                        cm = storage.open_output(name)
                        raw = cm.__enter__()
                        stream = open_compressed(raw, compression)
                        if is_json_array:
                            stream.write(b"[\n")
                    elif is_json_array:
                        stream.write(b",\n")  # group continues across batches
                    sl = lines_col.slice(start, length)
                    if is_json_array:
                        stream.write(join_slice(sl, ",\n"))
                    else:
                        stream.write(join_slice(sl, "\n") + b"\n")
                    count += length
            done = finish()
            if done:
                yield done
        except BaseException as e:
            if cm is not None:  # abort: delete temp / never complete final
                cm.__exit__(type(e), e, e.__traceback__)
                cm = None
            raise

    return write


def _parquet_partition_writer(
    storage: ObjectStorage, config: EngineConfig, schema, fault=None
):
    """Per-partition columnar writer (parquet, and — r8 engine extension —
    ORC via ``pyarrow.orc``): buffers one group's rows into an Arrow table
    and writes a single object with the reference's envelope column order
    (README.md:357-405). A columnar container needs the whole row group
    anyway, so per-group buffering matches the format's own memory model;
    the ``file.max.records`` chunking bounds it.

    ``schema`` is the prepared DataFrame's Spark schema (``_file``, envelope
    fields, ``_ord``); the Arrow schema is derived from it explicitly so
    all-null groups keep their declared types and nested-struct values
    (``parquet_value_schema`` mode) round-trip losslessly. The arriving Arrow
    batch slices are buffered per group and written directly (cast to the
    declared schema, chunks combined so the column layout matches the old
    single-array build — verified byte-identical); no value ever round-trips
    through Python objects.
    """
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    is_orc = config.format_type is FormatType.ORC
    if is_orc:
        # ORC's codec registry (pyarrow.orc): gzip maps to zlib — the same
        # DEFLATE family, matching the avro writer's gzip→deflate mapping
        compression = {
            CompressionType.NONE: "uncompressed",
            CompressionType.GZIP: "zlib",
            CompressionType.SNAPPY: "snappy",
            CompressionType.ZSTD: "zstd",
        }[config.file_compression]
    else:
        compression = {
            CompressionType.NONE: "none",
            CompressionType.GZIP: "gzip",
            CompressionType.SNAPPY: "snappy",
            CompressionType.ZSTD: "zstd",
        }[config.file_compression]
    field_names = [f.value for f in config.output_fields]
    envelope_schema = StructType([schema[n] for n in field_names])
    arrow_schema = to_arrow_schema(envelope_schema)
    n_fields = len(field_names)

    def write(batches) -> Iterator[tuple[str, int]]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if is_orc:
            import pyarrow.orc as pa_orc

        current: str | None = None
        parts: list = []  # envelope-column batch slices of the open group

        def flush():
            nonlocal parts
            if current is None or not parts:
                return None
            table = pa.Table.from_batches(parts)
            if table.schema != arrow_schema:
                table = table.cast(arrow_schema)
            table = table.combine_chunks()
            parts = []
            with storage.open_output(current) as out:
                if is_orc:
                    pa_orc.write_table(table, out, compression=compression)
                else:
                    pq.write_table(table, out, compression=compression)
                if fault is not None:
                    fault(current)  # raises inside the context → abort, no object
            return (current, table.num_rows)

        for batch in batches:
            env = pa.RecordBatch.from_arrays(
                [batch.column(i + 1) for i in range(n_fields)],
                names=field_names,
            )
            for name, start, length in _group_runs(batch):
                if name != current:
                    done = flush()
                    if done:
                        yield done
                    current = name
                parts.append(env.slice(start, length))
        done = flush()
        if done:
            yield done

    return write


def _avro_partition_writer(storage: ObjectStorage, config: EngineConfig, schema, fault=None):
    """Per-partition Avro OCF writer (engine extension — the format family's
    fifth member beside CSV/JSONL/JSON/parquet). Rows arrive clustered by
    filename and offset-sorted; each group streams through ``formats.avro.
    OCFWriter`` in 1000-record blocks — memory is O(block), never O(group).

    Idempotence: the 16-byte sync marker is ``md5(object_name)``, so an
    at-least-once replay rewrites a byte-identical object — the same
    name-determinism contract as every other format (README.md:101-133).

    Compression maps onto OCF codecs (compression lives INSIDE the container,
    like parquet — no filename suffix): none→null, gzip→deflate (OCF has no
    gzip codec; deflate is the identical DEFLATE stream minus the gzip
    wrapper), snappy→snappy (+ the spec's CRC32 suffix), zstd→zstandard.

    Abort-on-error parity: any exception (including the ``fault`` hook) exits
    the storage context with the error, so no partial object is ever visible
    under its final name (S3OutputStream.java:101-132)."""
    from pyspark.sql.types import StructType

    from kafka_connector_s3_sink_spark.formats.avro import (
        OCFWriter,
        avro_schema_for_spark,
    )

    codec = {
        CompressionType.NONE: "null",
        CompressionType.GZIP: "deflate",
        CompressionType.SNAPPY: "snappy",
        CompressionType.ZSTD: "zstandard",
    }[config.file_compression]
    field_names = [f.value for f in config.output_fields]
    envelope = StructType([schema[n] for n in field_names])
    avro_schema = avro_schema_for_spark(envelope)

    n_fields = len(field_names)

    def write(batches) -> Iterator[tuple[str, int]]:
        import hashlib

        current: str | None = None
        cm = None
        ocf = None
        count = 0

        def finish():
            nonlocal cm, ocf, count
            if cm is None:
                return None
            ocf.close()
            if fault is not None:
                fault(current)  # raises → except below aborts via cm.__exit__
            cm.__exit__(None, None, None)
            result = (current, count)
            cm = ocf = None
            return result

        try:
            for batch in batches:
                # one columnar→python conversion per batch (Arrow gives
                # bytes/dict/list natively — the old pickled-Row path needed
                # a recursive to_py per value); the OCF block encoder itself
                # is row-oriented, so rows are zipped from the converted
                # columns per group slice.
                cols = [
                    batch.column(i + 1).to_pylist() for i in range(n_fields)
                ]
                for name, start, length in _group_runs(batch):
                    if name != current:
                        done = finish()
                        if done:
                            yield done
                        current = name
                        count = 0
                        cm = storage.open_output(name)
                        raw = cm.__enter__()
                        ocf = OCFWriter(
                            raw,
                            avro_schema,
                            codec=codec,
                            sync_marker=hashlib.md5(name.encode()).digest(),
                        )
                    for vals in zip(
                        *(c[start : start + length] for c in cols)
                    ):
                        ocf.append(dict(zip(field_names, vals)))
                    count += length
            done = finish()
            if done:
                yield done
        except BaseException as e:
            if cm is not None:  # abort: delete temp / never complete final
                cm.__exit__(type(e), e, e.__traceback__)
                cm = None
            raise

    return write


def write_spark_native(
    df: DataFrame,
    config: EngineConfig,
    dest_dir: str,
) -> None:
    """Directory-layout alternative for 100 TB: everything stays in the JVM.
    ``partitionBy(topic, partition)`` replaces the filename template with a
    directory scheme; ``maxRecordsPerFile`` replaces ``file.max.records``;
    the format writer applies compression natively. Use when exact
    reference-compatible object names are not required."""
    enforce_csv_schema_types(df.schema, config)
    writer = (
        df.write.mode("overwrite")
        .partitionBy("topic", "partition")
        .option("compression", config.file_compression.value)
    )
    if config.file_max_records > 0:
        writer = writer.option("maxRecordsPerFile", config.file_max_records)
    if config.format_type is FormatType.PARQUET:
        writer.parquet(dest_dir)
    else:
        lines = df.select(
            record_line_column(config, df.schema).alias("value"),
            "topic",
            "partition",
        )
        text_writer = (
            lines.write.mode("overwrite")
            .partitionBy("topic", "partition")
            .option("compression", config.file_compression.value)
        )
        if config.file_max_records > 0:
            text_writer = text_writer.option(
                "maxRecordsPerFile", config.file_max_records
            )
        text_writer.text(dest_dir)
