"""Read-back source: sink-written objects → canonical record rows.

The reference is write-only — once objects land on S3, verifying or
re-ingesting them is the user's problem (its integration tests read objects
back with ad-hoc Java readers, ``S3SinkTaskTest.java:811-866``). At 100 TB
that read path IS an analytics job, so this module re-exposes it Spark-first:

- **listing/scan** — ``binaryFile`` datasource (distributed, works on
  ``file:``/``s3a:``/``hdfs:``; hidden ``_``/``.`` prefixed paths such as the
  ``_manifest`` sidecars are excluded by Spark's own file index);
- **decompress + line split** — one Arrow-batched ``mapInPandas`` step
  (gzip/zstd/snappy via the same codecs the writer streams through);
  per-task memory is O(one decompressed object), the same bound the writer's
  ``file.max.records`` knob already enforces on the write side;
- **typed field parsing** — pure JVM Column expressions (``split`` /
  ``get_json_object`` / ``try_to_binary`` / ``from_json``), so the hot path
  stays in whole-stage codegen;
- **name parsing** — the filename template's regex inverse
  (``FilenameTemplate.parse_pattern``) recovers the grouping variables
  (topic, partition, start_offset | key) that the reference encodes ONLY in
  the object name.

Round-trip caveats (inherent to the reference's formats, not this reader):
CSV renders null and empty string identically (``''``), so both read back as
null; ``encoding=none`` payloads that contained the CSV separator or line
breaks were written ambiguously and cannot be re-split; JSONL values that
were inlined JSON documents read back as their compact JSON text.
"""

from __future__ import annotations

import posixpath
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connector_s3_sink_spark.config import (
    CompressionType,
    EngineConfig,
    FieldEncoding,
    FormatType,
    OutputField,
)
from kafka_connector_s3_sink_spark.sinks.storage import _split_uri
from kafka_connector_s3_sink_spark.template import GrouperType

_LINES_SCHEMA = T.StructType(
    [
        T.StructField("object_name", T.StringType(), False),
        T.StructField("line_no", T.LongType(), False),
        T.StructField("line", T.StringType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)

def _relative_name(dest_dir: str) -> Column:
    """Object name relative to the sink root, from binaryFile's ``path``.

    ``path`` is fully qualified (``file:/…``, ``s3a://bucket/…``); the scheme
    spelling AND slash count vary by filesystem (``file:/p``, ``file:///p``),
    so strip an ANCHORED prefix: optional scheme, any run of slashes, then
    the scheme-less dest path literally. Anchoring (vs the old
    substring-index on the tail's last occurrence) keeps object paths that
    repeat the dest's tail segment (dest ``/data`` holding ``x/data/y``) and
    bucket-root dests relativizing correctly — a mis-relativized name parses
    to null grouping columns and silently drops out of the delivery audit."""
    import os
    import re as _re

    scheme, rest = _split_uri(dest_dir)
    if scheme is None:
        rest = os.path.abspath(rest)  # binaryFile qualifies relative paths
    rest = rest.strip("/")
    prefix = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?/*" + _re.escape(rest) + "/+"
    return F.regexp_replace(F.col("path"), prefix, "").alias("object_name")


def sink_object_lines(
    spark: SparkSession,
    dest_dir: str,
    config: EngineConfig,
    on_error: str = "fail",
) -> DataFrame:
    """(object_name, line_no, line, decode_error) for every record line of
    every text-format object under ``dest_dir`` — decompressed with the
    write-side codecs and, for the JSON-array format, stripped of the
    ``[`` / ``]`` frame and element commas, so one output row is one record.

    ``on_error`` is the poison-object policy (the read-side analog of
    ``errors.tolerance``): ``"fail"`` propagates a corrupt object's exception
    and kills the task; ``"route"`` survives it — the object contributes one
    row with ``line`` null and ``decode_error`` carrying the exception, so a
    crawl-scale audit keeps going and the dead objects are one filter away."""
    if on_error not in ("fail", "route"):
        raise ValueError(f"on_error must be 'fail' or 'route', got {on_error!r}")
    compression = config.file_compression
    is_json_array = config.format_type is FormatType.JSON

    def decode(batches) -> Iterator:
        import pandas as pd

        from kafka_connector_s3_sink_spark.formats.compression import (
            decompress_bytes,
        )

        for pdf in batches:
            names: list[str] = []
            line_nos: list[int] = []
            lines: list[str | None] = []
            errors: list[str | None] = []
            for name, content in zip(pdf["object_name"], pdf["content"]):
                try:
                    text = decompress_bytes(bytes(content), compression).decode(
                        "utf-8"
                    )
                except Exception as e:  # noqa: BLE001 — routed per policy
                    if on_error == "fail":
                        raise
                    names.append(name)
                    line_nos.append(-1)
                    lines.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
                    continue
                rows = text.splitlines()
                if is_json_array:
                    # '[' opener, one element per line with a trailing comma
                    # on all but the last, ']' closer (render.assemble_json_array)
                    rows = [r.rstrip(",") for r in rows[1:-1]]
                for i, row in enumerate(rows):
                    names.append(name)
                    line_nos.append(i)
                    lines.append(row)
                    errors.append(None)
            yield pd.DataFrame(
                {
                    "object_name": names,
                    "line_no": line_nos,
                    "line": lines,
                    "decode_error": errors,
                }
            )

    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(dest_dir)
        .select(_relative_name(dest_dir), "content")
    )
    return raw.mapInPandas(decode, _LINES_SCHEMA)


def _csv_headers(el: Column) -> Column:
    """Invert ``projection.headers_csv_column``: ``b64(k):b64(v);…`` →
    array<struct<key string, value binary>>."""
    return F.transform(
        F.split(el, ";"),
        lambda p: F.struct(
            F.decode(
                F.try_to_binary(F.split_part(p, F.lit(":"), F.lit(1)), F.lit("base64")),
                "UTF-8",
            ).alias("key"),
            F.try_to_binary(
                F.split_part(p, F.lit(":"), F.lit(2)), F.lit("base64")
            ).alias("value"),
        ),
    )


def _csv_fields(config: EngineConfig) -> list[Column]:
    fields = F.split(F.col("line"), ",", -1)
    cols: list[Column] = []
    for i, f in enumerate(config.output_fields):
        el = F.nullif(F.get(fields, i), F.lit(""))
        if f in (OutputField.KEY, OutputField.VALUE):
            if config.value_encoding is FieldEncoding.BASE64:
                cols.append(F.try_to_binary(el, F.lit("base64")).alias(f.value))
            else:
                cols.append(el.alias(f.value))
        elif f is OutputField.HEADERS:
            cols.append(_csv_headers(el).alias(f.value))
        else:  # offset / timestamp
            cols.append(el.try_cast("long").alias(f.value))
    return cols


def _json_fields(config: EngineConfig, binary_payloads: bool) -> list[Column]:
    line = F.col("line")
    if not config.envelope and len(config.output_fields) == 1:
        # unwrapped single-field objects: the line IS the field's JSON value;
        # rewrap so one extraction path handles string literals and documents
        line = F.concat(F.lit('{"'), F.lit(config.output_fields[0].value),
                        F.lit('":'), line, F.lit("}"))
    cols: list[Column] = []
    for f in config.output_fields:
        el = F.get_json_object(line, f"$.{f.value}")
        if f in (OutputField.KEY, OutputField.VALUE):
            if binary_payloads:
                # byte[] payloads were serialized as base64 JSON strings
                cols.append(F.try_to_binary(el, F.lit("base64")).alias(f.value))
            else:
                cols.append(el.alias(f.value))
        elif f is OutputField.HEADERS:
            parsed = F.from_json(
                el,
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType(), False),
                            T.StructField("value", T.StringType(), True),
                        ]
                    )
                ),
            )
            cols.append(
                F.transform(
                    parsed,
                    lambda h: F.struct(
                        h["key"].alias("key"),
                        F.try_to_binary(h["value"], F.lit("base64")).alias("value"),
                    ),
                ).alias(f.value)
            )
        else:
            cols.append(el.try_cast("long").alias(f.value))
    return cols


def _validate_parquet_objects(
    spark: SparkSession, dest_dir: str, fmt: str = "parquet"
) -> tuple[list[str], list[tuple[str, str]]]:
    """Partition the store's objects into (healthy, [(name, error)]) by
    reading each object's FOOTER (parquet thrift or — ``fmt="orc"`` — the
    ORC tail metadata) in executor tasks (pyarrow through the picklable
    ``ObjectStorage`` client — executors have no py4j gateway). Footer
    metadata is the integrity gate the native scan itself trusts: a
    truncated/overwritten tail or bad magic fails here, one task per batch
    of objects, O(footer bytes) per object. Driver cost is O(objects)
    names — the same order as the listing that planned them."""
    from kafka_connector_s3_sink_spark.sinks.storage import ObjectStorage

    storage = ObjectStorage(dest_dir)
    names = storage.listing()
    if not names:
        return [], []

    def validate(batches) -> Iterator:
        import pandas as pd
        import pyarrow.orc as pa_orc
        import pyarrow.parquet as pq

        for pdf in batches:
            errs = []
            for n in pdf["object_name"]:
                try:
                    # metadata parse validates magic + footer; touch the row
                    # count so a lazily-parsed footer fully materializes.
                    # Seekable handle → pyarrow reads ONLY the footer (tail
                    # magic + metadata), keeping this O(footer bytes) per
                    # object even when the store holds multi-GB objects.
                    with storage.open_input_file(n) as f:
                        if fmt == "orc":
                            pa_orc.ORCFile(f).nrows
                        else:
                            pq.ParquetFile(f).metadata.num_rows
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — routed per contract
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {"object_name": pdf["object_name"], "decode_error": errs}
            )

    name_df = spark.createDataFrame(
        [(n,) for n in names], "object_name string"
    ).repartition(min(len(names), 32))
    rows = name_df.mapInPandas(
        validate, "object_name string, decode_error string"
    ).collect()
    good = sorted(r["object_name"] for r in rows if r["decode_error"] is None)
    bad = sorted(
        (r["object_name"], r["decode_error"])
        for r in rows
        if r["decode_error"] is not None
    )
    return good, bad


def _parquet_envelope_schema(config: EngineConfig) -> T.StructType:
    """Envelope schema for the degenerate every-object-corrupt route case —
    no healthy footer exists to type the columns, so key/value fall back to
    binary (the sink's BYTES-converter shape)."""
    value_t: T.DataType = (
        T.StructType.fromDDL(config.parquet_value_schema)
        if config.parquet_value_schema
        else T.BinaryType()
    )
    types: dict[str, T.DataType] = {
        "key": T.BinaryType(),
        "value": value_t,
        "offset": T.LongType(),
        "timestamp": T.LongType(),
        "headers": T.ArrayType(
            T.StructType(
                [
                    T.StructField("key", T.StringType(), True),
                    T.StructField("value", T.BinaryType(), True),
                ]
            )
        ),
    }
    return T.StructType(
        [T.StructField("object_name", T.StringType(), False)]
        + [
            T.StructField(f.value, types[f.value], True)
            for f in config.output_fields
        ]
    )


def _avro_envelope_schema(
    config: EngineConfig, binary_payloads: bool
) -> T.StructType:
    """Declared read-back schema for Avro OCF objects: key/value binary or
    string per ``binary_payloads`` (mirroring the record frame the sink
    consumed — the OCF writer schema preserves the Spark types verbatim),
    offset/timestamp long, headers array<struct<key string, value binary>>."""
    payload_t: T.DataType = T.BinaryType() if binary_payloads else T.StringType()
    types: dict[str, T.DataType] = {
        "key": payload_t,
        "value": payload_t,
        "offset": T.LongType(),
        "timestamp": T.LongType(),
        "headers": T.ArrayType(
            T.StructType(
                [
                    T.StructField("key", T.StringType(), True),
                    T.StructField("value", T.BinaryType(), True),
                ]
            )
        ),
    }
    return T.StructType(
        [
            T.StructField("object_name", T.StringType(), False),
            T.StructField("line_no", T.LongType(), False),
        ]
        + [
            T.StructField(f.value, types[f.value], True)
            for f in config.output_fields
        ]
        + [T.StructField("decode_error", T.StringType(), True)]
    )


def _read_avro_objects(
    spark: SparkSession,
    dest_dir: str,
    config: EngineConfig,
    parse_names: bool,
    binary_payloads: bool,
    on_error: str,
) -> DataFrame:
    """Re-ingest Avro OCF objects: binaryFile scan → Arrow-batched OCF decode
    in executor tasks (``formats.avro.read_ocf`` — pure Python, no avro jar),
    one output row per record with ``line_no`` its position in the object.
    ``on_error="route"`` converts a corrupt object (bad magic, sync-marker
    mismatch, truncated block, CRC failure) into one ``decode_error`` row —
    OCF sync markers make corruption detection structural, so a poison object
    can never silently yield short rows."""
    if on_error not in ("fail", "route"):
        raise ValueError(f"on_error must be 'fail' or 'route', got {on_error!r}")
    field_names = [f.value for f in config.output_fields]
    out_schema = _avro_envelope_schema(config, binary_payloads)

    def decode(batches) -> Iterator:
        import pandas as pd

        from kafka_connector_s3_sink_spark.formats.avro import read_ocf

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for name, content in zip(pdf["object_name"], pdf["content"]):
                try:
                    _, records = read_ocf(bytes(content))
                except Exception as e:  # noqa: BLE001 — routed per policy
                    if on_error == "fail":
                        raise
                    out["object_name"].append(name)
                    out["line_no"].append(-1)
                    for fn in field_names:
                        out[fn].append(None)
                    out["decode_error"].append(f"{type(e).__name__}: {e}")
                    continue
                for i, rec in enumerate(records):
                    out["object_name"].append(name)
                    out["line_no"].append(i)
                    for fn in field_names:
                        out[fn].append(rec.get(fn))
                    out["decode_error"].append(None)
            yield pd.DataFrame(out)

    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(dest_dir)
        .select(_relative_name(dest_dir), "content")
    )
    rows = raw.mapInPandas(decode, out_schema)
    out_cols: list[Column] = [F.col("object_name"), F.col("line_no")]
    if parse_names:
        out_cols += _name_columns(config)
    out_cols += [F.col(fn) for fn in field_names]
    if on_error == "route":
        out_cols += [F.col("decode_error")]
    return rows.select(*out_cols)


def _name_columns(config: EngineConfig) -> list[Column]:
    """Grouping variables recovered from the object name via the template's
    regex inverse — empty match (a foreign file in the directory) → null."""
    tpl = config.template
    pattern, groups = tpl.parse_pattern(
        prefix=config.prefix, extension=config.filename_extension
    )
    name = F.col("object_name")

    def grp(var: str) -> Column:
        return F.nullif(F.regexp_extract(name, pattern, groups[var]), F.lit(""))

    if tpl.grouper_type is GrouperType.KEY:
        return [grp("key").alias("key_str")]
    cols = [
        grp("topic").alias("topic"),
        grp("partition").try_cast("int").alias("partition"),
        grp("start_offset").try_cast("long").alias("start_offset"),
    ]
    return cols


def stream_sink_objects(
    spark: SparkSession,
    dest_dir: str,
    config: EngineConfig,
    parse_names: bool = True,
    binary_payloads: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming re-ingest: sink output as a LIVE source. Downstream pipelines
    (enrichment, the LLM ingest cascade, replication to another store) chain
    onto a running sink by watching its destination with Spark's native file
    streaming source — new objects become new micro-batch rows, checkpointed
    exactly-once like any other stream.

    The line scan is ``readStream.text`` (one task per object, gzip
    decompressed by Hadoop's built-in codec from the ``.gz`` extension);
    parsing reuses the exact batch-path Column expressions, with the object
    name recovered from ``input_file_name()``. Constraints inherent to the
    streaming source: line formats only (CSV / JSONL — a JSON-array file
    needs whole-file framing; parquet objects stream with
    ``readStream.parquet`` directly), and none/gzip compression (zstd/snappy
    objects need the Arrow codecs of the batch reader — Hadoop ships no
    pure-JVM decoder for them)."""
    if config.format_type not in (FormatType.CSV, FormatType.JSONL):
        raise ValueError(
            "streaming read-back supports line formats (csv/jsonl); "
            f"{config.format_type.value} objects need the batch reader"
        )
    if config.file_compression not in (CompressionType.NONE, CompressionType.GZIP):
        raise ValueError(
            f"streaming read-back cannot decompress {config.file_compression.value} "
            "(no pure-JVM Hadoop codec); use the batch reader"
        )
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = (
        reader.load(dest_dir)
        .withColumn("path", F.input_file_name())
        .select(_relative_name(dest_dir), F.col("value").alias("line"))
    )
    if config.format_type is FormatType.CSV:
        fields = _csv_fields(config)
    else:
        fields = _json_fields(config, binary_payloads)
    out_cols = [F.col("object_name")]
    if parse_names:
        out_cols += _name_columns(config)
    return lines.select(*(out_cols + fields))


def read_sink_objects(
    spark: SparkSession,
    dest_dir: str,
    config: EngineConfig,
    parse_names: bool = True,
    binary_payloads: bool = True,
    on_error: str = "fail",
) -> DataFrame:
    """Re-ingest every object the sink wrote under ``dest_dir`` as one row per
    record: (object_name, line_no, [name-derived grouping columns], then the
    configured output fields with canonical types — key/value binary (or
    string for ``encoding=none`` CSV / ``binary_payloads=False`` JSON),
    offset/timestamp long, headers array<struct<key string, value binary>>).

    ``parse_names`` adds the grouping columns recovered from the object name
    (topic / partition / start_offset, or the stringified key in key-mode).
    ``binary_payloads`` mirrors the write side's record schema: True when the
    sink consumed binary key/value (base64 JSON strings / base64 CSV), False
    when it consumed strings. ``on_error="route"`` survives corrupt objects:
    their row carries a ``decode_error`` column (appended to the output) with
    every field null — ``fail`` (default) propagates the task error.

    Parquet objects skip the line path entirely: they re-read with the native
    parquet scan (typed envelope columns, internal compression), plus the
    same name parsing. ``on_error="route"`` for parquet (r6) pre-validates
    every object's FOOTER in executor tasks (pyarrow metadata read through
    the same ``ObjectStorage`` client) — a corrupt-footer object would
    otherwise kill the whole native scan at planning; validated-bad objects
    surface as one ``decode_error`` row each and the scan reads only the
    healthy set.
    """
    if config.format_type in (FormatType.PARQUET, FormatType.ORC):
        if on_error not in ("fail", "route"):
            raise ValueError(
                f"on_error must be 'fail' or 'route', got {on_error!r}"
            )
        fmt_name = config.format_type.value
        reader = spark.read.option("recursiveFileLookup", "true")
        if config.parquet_schema_rotation or config.parquet_value_schema:
            # schema-rotated sinks write objects with DIFFERENT value structs
            # per run; a plain read resolves to one file's schema and silently
            # nulls the rest — merge the per-object footers instead (fields
            # absent from an object read back null, Spark's evolution rule)
            reader = reader.option("mergeSchema", "true")
        bad: list[tuple[str, str]] = []
        source: str | list[str] = dest_dir
        if on_error == "route":
            good, bad = _validate_parquet_objects(spark, dest_dir, fmt_name)
            source = [f"{dest_dir.rstrip('/')}/{n}" for n in good]
        df = (
            reader.format(fmt_name).load(source)  # str or healthy-name list
            .withColumn("path", F.col("_metadata.file_path"))
            .withColumn("object_name", _relative_name(dest_dir))
            .drop("path")
        ) if source else None
        out_cols: list[Column] = [F.col("object_name")]
        if parse_names:
            out_cols += _name_columns(config)
        out_cols += [F.col(f.value) for f in config.output_fields]
        if on_error != "route":
            return df.select(*out_cols)
        if df is None:
            # every object failed validation: synthesize the envelope types
            # so the error rows still carry the documented columns
            df = spark.createDataFrame([], _parquet_envelope_schema(config))
        good_df = df.select(*out_cols, F.lit(None).cast("string").alias("decode_error"))
        if not bad:
            return good_df
        bad_df = spark.createDataFrame(
            bad, "object_name string, decode_error string"
        )
        null_fields = [
            F.lit(None).cast(good_df.schema[f.value].dataType).alias(f.value)
            for f in config.output_fields
        ]
        bad_cols: list[Column] = [F.col("object_name")]
        if parse_names:
            bad_cols += _name_columns(config)
        return good_df.unionByName(
            bad_df.select(*bad_cols, *null_fields, F.col("decode_error"))
        )

    if config.format_type is FormatType.AVRO:
        return _read_avro_objects(
            spark, dest_dir, config, parse_names, binary_payloads, on_error
        )
    lines = sink_object_lines(spark, dest_dir, config, on_error=on_error)
    if config.format_type is FormatType.CSV:
        fields = _csv_fields(config)
    else:
        fields = _json_fields(config, binary_payloads)
    out_cols = [F.col("object_name"), F.col("line_no")]
    if parse_names:
        out_cols += _name_columns(config)
    if on_error == "route":
        fields = fields + [F.col("decode_error")]
    return lines.select(*(out_cols + fields))
