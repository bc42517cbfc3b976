"""Spark Python Data Source exposing sink output as a registrable format.

``sources.objects.read_sink_objects`` is the FAST path (JVM column parsing
behind one Arrow boundary). This module wraps the same store as a Spark 4
Python Data Source — ``spark.read.format("sink_objects")`` — for the places
a format string is the integration point: SQL (``CREATE TABLE … USING``),
catalog tools, and anything that configures readers by name rather than by
Python call. The trade is explicit: rows materialize in Python (the Data
Source API's execution model), so per-byte cost is higher than the
column-expression path; the partition planning is identical in spirit —
one ``InputPartition`` per object, so a billion-object store fans out to
exactly as many tasks as objects and each task streams one object through
the write-side codecs.

Options (all strings, per the API):
- ``path``              — sink destination (any ``pyarrow.fs`` URI)
- ``format``            — csv | jsonl | json | orc | avro (Avro OCF) |
  parquet. Container formats (orc/avro/parquet) decode per object through
  the write-side codecs — ``formats.avro.read_ocf`` / ``pyarrow.orc`` /
  ``pyarrow.parquet`` — and ignore ``compression``, which is internal to
  the container. Parquet here buys what the native reader can't give a
  SQL-first user: per-object corrupt routing (``on_error=route`` turns a
  truncated/bad-footer object into one ``decode_error`` row instead of a
  task-killing scan — the posture ``sources.objects.read_sink_objects``
  already has) and name-derived topic/partition/offset columns. For bulk
  healthy scans the native ``spark.read.parquet`` remains the fast path.
- ``compression``       — none | gzip | snappy | zstd (text formats)
- ``fields``            — comma-joined output fields, default ``value``
- ``encoding``          — base64 | none (CSV payload encoding)
- ``binary_payloads``   — true | false: decode key/value to BinaryType
  (default: true for csv+base64, false for jsonl/json — i.e. each format's
  faithful read-back; set true on JSON formats to recover original bytes,
  matching ``read_sink_objects(binary_payloads=True)``)
- ``on_error``          — fail (default) | route: with ``route``, a corrupt
  object (or unparseable line) yields one row with the exception in an
  appended ``decode_error`` column instead of failing the task — the
  format-API form of the fast path's poison-object routing
- ``template``/``prefix`` — filename template for name parsing

Registration: ``spark.dataSource.register(SinkObjectsDataSource)`` (the
engine does not auto-register — Python data sources are per-session).
"""

from __future__ import annotations

import base64
import json
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T


class _ObjectPartition(InputPartition):
    def __init__(self, name: str):
        self.name = name


def _resolve_binary(fmt: str, encoding: str, option: str | None) -> bool:
    """Whether key/value columns decode to BinaryType. Default preserves the
    sink's serialization faithfully per format (csv+base64 → bytes, JSON
    formats → the b64 strings as written, container formats → the binary
    envelope the sink wrote); an explicit ``binary_payloads`` option
    overrides, so the SAME store reads back with the SAME types from this
    DataSource and from ``read_sink_objects(binary_payloads=True)``."""
    if option is not None:
        return option.lower() == "true"
    return fmt in ("orc", "avro", "parquet") or (
        fmt == "csv" and encoding == "base64"
    )


def _schema_for(
    fields: Sequence[str],
    fmt: str,
    encoding: str,
    binary_payloads: bool,
    route_errors: bool = False,
) -> T.StructType:
    cols = [
        T.StructField("object_name", T.StringType(), False),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("start_offset", T.LongType(), True),
    ]
    for f in fields:
        if f in ("key", "value"):
            t = T.BinaryType() if binary_payloads else T.StringType()
        elif f in ("offset", "timestamp"):
            t = T.LongType()
        elif f == "headers":
            t = T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), True),
                        T.StructField("value", T.BinaryType(), True),
                    ]
                )
            )
        else:
            raise ValueError(f"unknown output field {f!r}")
        cols.append(T.StructField(f, t, True))
    if route_errors:
        cols.append(T.StructField("decode_error", T.StringType(), True))
    return T.StructType(cols)


class SinkObjectsDataSource(DataSource):
    """``spark.read.format("sink_objects").option("path", …)`` over a sink
    destination. See module docstring for options and the fast-path note."""

    @classmethod
    def name(cls) -> str:
        return "sink_objects"

    def schema(self) -> T.StructType:
        fields = [
            f.strip()
            for f in self.options.get("fields", "value").split(",")
            if f.strip()
        ]
        fmt = self.options.get("format", "csv")
        enc = self.options.get("encoding", "base64")
        return _schema_for(
            fields,
            fmt,
            enc,
            _resolve_binary(fmt, enc, self.options.get("binary_payloads")),
            route_errors=self.options.get("on_error", "fail").lower() == "route",
        )

    def reader(self, schema: T.StructType) -> "_SinkObjectsReader":
        # pushdown is an OPT-IN subclass: Spark refuses to initialize any
        # reader that merely DEFINES pushFilters() unless
        # spark.sql.python.filterPushdown.enabled is true, so the capability
        # must not leak into default configurations
        if self.options.get("pushdown", "false").lower() == "true":
            return _SinkObjectsPushdownReader(self.options, schema)
        return _SinkObjectsReader(self.options, schema)

    def streamReader(self, schema: T.StructType):
        return _SinkObjectsStreamReader(self.options, schema)


class _SinkObjectsReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options["path"]
        self.fmt = options.get("format", "csv")
        self.compression = options.get("compression", "gzip")
        self.fields = [
            f.strip() for f in options.get("fields", "value").split(",") if f.strip()
        ]
        self.encoding = options.get("encoding", "base64")
        self.binary_payloads = _resolve_binary(
            self.fmt, self.encoding, options.get("binary_payloads")
        )
        self.template = options.get(
            "template", "{{topic}}-{{partition}}-{{start_offset}}"
        )
        self.prefix = options.get("prefix", "")
        self.envelope = options.get("envelope", "true").lower() == "true"
        self.on_error = options.get("on_error", "fail").lower()
        if self.on_error not in ("fail", "route"):
            raise ValueError(
                f"on_error must be 'fail' or 'route', got {self.on_error!r}"
            )
        if self.fmt not in ("csv", "jsonl", "json", "orc", "avro", "parquet"):
            raise ValueError(
                "sink_objects reads csv/jsonl/json/orc/avro/parquet "
                f"(got {self.fmt!r})"
            )

    # -- planning (driver): one partition per object --------------------
    def partitions(self):
        from kafka_connector_s3_sink_spark.sinks.storage import ObjectStorage

        storage = ObjectStorage(self.path)
        names = storage.listing()
        preds = getattr(self, "_name_predicates", [])
        if preds:
            kept = []
            for n in names:
                parsed = dict(zip(("topic", "partition", "start_offset"),
                                  self._parse_name(n)))
                # NULL comparisons are never true — unparseable names prune
                if all(
                    parsed[c] is not None and op(parsed[c], v)
                    for c, op, v in preds
                ):
                    kept.append(n)
            names = kept
        return [_ObjectPartition(n) for n in names]

    # -- execution (task): stream one object ----------------------------
    def read(self, partition: _ObjectPartition) -> Iterator[tuple]:
        return self.read_object(partition.name)

    def _parse_name(self, name: str) -> tuple:
        """(topic, partition, start_offset) recovered from one object name
        via the template regex inverse; (None, None, None) when unparseable."""
        from kafka_connector_s3_sink_spark.config import CompressionType
        from kafka_connector_s3_sink_spark.template import FilenameTemplate

        tpl = FilenameTemplate(self.template)
        # container formats never carry a compression suffix (compression is
        # internal — config.filename_extension's rule, mirrored here)
        ext = (
            ""
            if self.compression == "none"
            or self.fmt in ("orc", "avro", "parquet")
            else CompressionType(self.compression).extension
        )
        pattern, groups = tpl.parse_pattern(prefix=self.prefix, extension=ext)
        m = re.match(pattern, name)
        topic = m.group(groups["topic"]) if m and "topic" in groups else None
        part = (
            int(m.group(groups["partition"]))
            if m and "partition" in groups
            else None
        )
        start = (
            int(m.group(groups["start_offset"]))
            if m and "start_offset" in groups
            else None
        )
        return topic, part, start

    def read_object(self, name: str) -> Iterator[tuple]:
        from kafka_connector_s3_sink_spark.config import CompressionType
        from kafka_connector_s3_sink_spark.formats.compression import (
            decompress_bytes,
        )
        from kafka_connector_s3_sink_spark.sinks.storage import ObjectStorage

        topic, part, start = self._parse_name(name)
        route = self.on_error == "route"
        nulls = (None,) * len(self.fields)
        if self.fmt in ("orc", "avro", "parquet"):
            yield from self._read_container(name, topic, part, start)
            return
        try:
            data = decompress_bytes(
                ObjectStorage(self.path).read_bytes(name),
                CompressionType(self.compression),
            )
            lines = data.decode("utf-8").splitlines()
        except Exception as e:  # noqa: BLE001 — routed per option
            if not route:
                raise
            # poison OBJECT: one row, payload columns null, error text rides
            yield (name, topic, part, start, *nulls, f"{type(e).__name__}: {e}")
            return
        if self.fmt == "json":
            lines = [l.rstrip(",") for l in lines[1:-1]]
        for line in lines:
            try:
                parsed = self._parse(line)
            except Exception as e:  # noqa: BLE001 — routed per option
                if not route:
                    raise
                yield (name, topic, part, start, *nulls,
                       f"{type(e).__name__}: {e}")
                continue
            if route:
                yield (name, topic, part, start, *parsed, None)
            else:
                yield (name, topic, part, start, *parsed)

    def _read_container(
        self, name: str, topic, part, start
    ) -> Iterator[tuple]:
        """One ORC, Avro OCF, or parquet object → envelope rows. All three
        containers compress internally, so the raw bytes stream straight
        into the write-side decoder (``formats.avro.read_ocf`` — pure
        Python, every block sync verified — or ``pyarrow.orc`` /
        ``pyarrow.parquet``, whose footer parse IS the integrity gate
        ``sources.objects._validate_parquet_objects`` uses).
        ``on_error="route"`` turns a corrupt object (bad magic/sync/footer)
        into one ``decode_error`` row, same contract as the text formats."""
        from kafka_connector_s3_sink_spark.sinks.storage import ObjectStorage

        route = self.on_error == "route"
        nulls = (None,) * len(self.fields)
        try:
            data = ObjectStorage(self.path).read_bytes(name)
            if self.fmt == "avro":
                from kafka_connector_s3_sink_spark.formats.avro import read_ocf

                _, records = read_ocf(bytes(data))
            elif self.fmt == "parquet":
                import io

                import pyarrow.parquet as pq

                pf = pq.ParquetFile(io.BytesIO(data))
                pf.metadata.num_rows  # force the full footer parse
                records = pf.read().to_pylist()
            else:
                import io

                import pyarrow.orc as pa_orc

                records = pa_orc.ORCFile(io.BytesIO(data)).read().to_pylist()
        except Exception as e:  # noqa: BLE001 — routed per option
            if not route:
                raise
            yield (name, topic, part, start, *nulls, f"{type(e).__name__}: {e}")
            return
        for rec in records:
            vals = []
            for f in self.fields:
                v = rec.get(f)
                if f == "headers" and v is not None:
                    # array<struct> envelopes decode as a list of
                    # {'key':…,'value':…} dicts; an Avro MAP of headers
                    # (headers_as_map schemas read back via read_ocf)
                    # decodes as one python dict — normalize both to
                    # (key, value) tuples. Iterating a bare dict would
                    # yield key strings (and tuple(h) character tuples),
                    # so the map shape is handled before the loop.
                    if isinstance(v, dict):
                        v = list(v.items())
                    else:
                        v = [
                            (h["key"], h["value"])
                            if isinstance(h, dict)
                            else tuple(h)
                            for h in v
                        ]
                elif f in ("key", "value") and v is not None:
                    # coerce to the DECLARED payload type so one option
                    # (binary_payloads) governs the schema regardless of
                    # whether the sink's envelope stored bytes or strings
                    if self.binary_payloads and isinstance(v, str):
                        v = v.encode("utf-8")
                    elif not self.binary_payloads and isinstance(
                        v, (bytes, bytearray)
                    ):
                        v = bytes(v).decode("utf-8")
                vals.append(v)
            if route:
                yield (name, topic, part, start, *vals, None)
            else:
                yield (name, topic, part, start, *vals)

    def _parse(self, line: str) -> list:
        if self.fmt == "csv":
            cells = line.split(",")
            out = []
            for i, f in enumerate(self.fields):
                cell = cells[i] if i < len(cells) else ""
                if cell == "":
                    out.append(None)
                elif f in ("key", "value"):
                    out.append(
                        base64.b64decode(cell)
                        if self.encoding == "base64" and self.binary_payloads
                        else cell
                    )
                elif f in ("offset", "timestamp"):
                    out.append(int(cell))
                elif f == "headers":
                    out.append(
                        [
                            (
                                base64.b64decode(k).decode("utf-8"),
                                base64.b64decode(v),
                            )
                            for k, v in (p.split(":", 1) for p in cell.split(";"))
                        ]
                    )
            return out
        if not self.envelope and len(self.fields) == 1:
            # unwrapped single-field objects: the line IS the field's value
            obj = {self.fields[0]: json.loads(line)}
        else:
            obj = json.loads(line)
        out = []
        for f in self.fields:
            v = obj.get(f)
            if f == "headers" and v is not None:
                v = [(h["key"], base64.b64decode(h["value"])) for h in v]
            elif f == "value" and isinstance(v, (dict, list)):
                v = json.dumps(v, separators=(",", ":"))
                if self.binary_payloads:
                    v = v.encode("utf-8")
            elif (
                f in ("key", "value")
                and self.binary_payloads
                and isinstance(v, str)
            ):
                # sink JSON formats serialize binary key/value as base64
                # strings; binary_payloads=true restores the original bytes
                # so this path agrees with read_sink_objects(binary_payloads)
                v = base64.b64decode(v)
            out.append(v)
        return out


class _SinkObjectsPushdownReader(_SinkObjectsReader):
    """Opt-in (``option("pushdown", "true")`` + Spark conf
    ``spark.sql.python.filterPushdown.enabled=true``): accepts filters over
    the name-derived columns (``topic``, ``partition``, ``start_offset``) —
    constant per object, so evaluating them against the PARSED NAME prunes
    whole objects at planning time, before any byte is read: the format-API
    analog of partition pruning. ``offset``-level predicates are NOT
    prunable from names (an object's row-offset range isn't knowable
    without reading it) and are returned to Spark with everything else."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: lambda a, b: a == b,
            GreaterThan: lambda a, b: a > b,
            GreaterThanOrEqual: lambda a, b: a >= b,
            LessThan: lambda a, b: a < b,
            LessThanOrEqual: lambda a, b: a <= b,
        }
        self._name_predicates = []
        rest = []
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col in ("topic", "partition", "start_offset") and type(f) in ops:
                self._name_predicates.append((col, ops[type(f)], f.value))
            else:
                rest.append(f)
        return rest

class _SinkObjectsStreamReader(DataSourceStreamReader):
    """Streaming form: ``spark.readStream.format("sink_objects")``.

    Complements ``sources.objects.stream_sink_objects`` (Spark's file
    source), which cannot decompress zstd/snappy (no pure-JVM Hadoop codec)
    — here decompression is the Python write-side codecs, so EVERY sink
    compression streams.

    Partition-planning reader (r6 — graduated from
    ``SimpleDataSourceStreamReader``, whose execution model materialized
    every new object's rows ON THE DRIVER): the driver only LISTS —
    ``latestOffset`` snapshots the store's object names, ``partitions``
    plans one ``InputPartition`` per listing-delta object, and every byte
    of object data is read, decompressed, and parsed inside executor tasks
    via ``read`` — the engine's last driver-side data path removed.

    The offset is the set of already-ingested object names: objects are
    immutable and appear under new names, so set difference IS the new
    data, and replaying ``end − start`` from the checkpoint is exactly-once.
    The offset JSON therefore grows with the object count — the listing,
    not the data, is the driver's only per-object cost."""

    def __init__(self, options, schema):
        self._batch = _SinkObjectsReader(options, schema)
        self._path = options["path"]

    def initialOffset(self) -> dict:
        return {"names": []}

    def _listing(self) -> list:
        from kafka_connector_s3_sink_spark.sinks.storage import ObjectStorage

        return ObjectStorage(self._path).listing()

    def latestOffset(self) -> dict:
        return {"names": self._listing()}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["names"]) - set(start["names"]))
        return [_ObjectPartition(n) for n in new]

    def read(self, partition: _ObjectPartition) -> Iterator[tuple]:
        # runs in an executor task — one object per task, streamed through
        # the write-side codecs, identical row shape to the batch reader
        return self._batch.read_object(partition.name)

    def commit(self, end: dict) -> None:
        pass  # objects are immutable; nothing to clean up
