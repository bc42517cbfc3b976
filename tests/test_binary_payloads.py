"""ByteArrayConverter (BYTES schema type) payload path.

The reference's CSV contract *requires* BYTES key/value and rejects other
schema types at flush with a pinned message (S3SinkTaskTest.java:474-498
STRING, :554-578 STRUCT); JSONL accepts STRING (:501-551). These tests drive
true BinaryType columns — including non-UTF-8 byte sequences — through
projection/encoding/rendering/write end-to-end, and pin the schema-type error
messages byte-for-byte.
"""

import base64
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.config import (
    CompressionType,
    EngineConfig,
    FormatType,
    OutputField,
)
from kafka_connector_s3_sink_spark.formats.compression import read_compressed
from kafka_connector_s3_sink_spark.operators.projection import SchemaTypeError
from kafka_connector_s3_sink_spark.records import (
    KAFKA_RECORD_SCHEMA,
    KAFKA_RECORD_SCHEMA_BINARY,
)
from kafka_connector_s3_sink_spark.sinks.writer import write_batch

# deliberately includes invalid-UTF-8 sequences: a BYTES pipeline must never
# depend on the payload decoding as text
PAYLOADS = [
    b"plain bytes",
    bytes([0x00, 0xFF, 0xFE, 0x01]),
    b"\x89PNG\r\n\x1a\n fake image header",
    "unicode-Ω\U0001f642".encode("utf-8"),
    b"",
]


def _binary_rows():
    return [
        Row(topic="bin", partition=0, offset=i, key=f"k{i}".encode(), value=v,
            timestamp=1000 + i, headers=None)
        for i, v in enumerate(PAYLOADS)
    ]


def test_csv_base64_roundtrips_binary_payloads(spark, tmp_path):
    cfg = EngineConfig(
        output_fields=(OutputField.KEY, OutputField.VALUE),
        file_compression=CompressionType.NONE,
    )
    df = spark.createDataFrame(_binary_rows(), KAFKA_RECORD_SCHEMA_BINARY)
    written = write_batch(df, cfg, str(tmp_path))
    assert written == [("bin-0-0", len(PAYLOADS))]
    data = read_compressed(os.path.join(tmp_path, "bin-0-0"), CompressionType.NONE)
    lines = data.decode().split("\n")[:-1]
    for i, line in enumerate(lines):
        k_b64, v_b64 = line.split(",")
        assert base64.b64decode(k_b64) == f"k{i}".encode()
        assert base64.b64decode(v_b64) == PAYLOADS[i]


def test_jsonl_binary_value_serializes_as_base64_string(spark, tmp_path):
    cfg = EngineConfig(
        format_type=FormatType.JSONL,
        output_fields=(OutputField.VALUE, OutputField.OFFSET),
        file_compression=CompressionType.NONE,
    )
    df = spark.createDataFrame(_binary_rows(), KAFKA_RECORD_SCHEMA_BINARY)
    write_batch(df, cfg, str(tmp_path))
    data = read_compressed(os.path.join(tmp_path, "bin-0-0"), CompressionType.NONE)
    lines = data.decode().split("\n")[:-1]
    assert len(lines) == len(PAYLOADS)
    for i, line in enumerate(lines):
        obj = json.loads(line)  # every line stays valid JSON
        assert base64.b64decode(obj["value"]) == PAYLOADS[i]
        assert obj["offset"] == i


def test_csv_rejects_string_schema_with_reference_message(spark, tmp_path):
    rows = [Row(topic="t", partition=0, offset=0, key="k", value="v",
                timestamp=None, headers=None)]
    cfg = EngineConfig(
        output_fields=(OutputField.KEY, OutputField.VALUE),
        value_converter="string",
    )
    df = spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA)
    with pytest.raises(SchemaTypeError) as e:
        write_batch(df, cfg, str(tmp_path))
    assert str(e.value) == "Record value schema type must be BYTES, STRING given"


def test_csv_rejects_string_key_schema(spark, tmp_path):
    rows = [Row(topic="t", partition=0, offset=0, key="k", value="v",
                timestamp=None, headers=None)]
    cfg = EngineConfig(
        output_fields=(OutputField.KEY, OutputField.VALUE),
        key_converter="string",
    )
    df = spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA)
    with pytest.raises(SchemaTypeError) as e:
        write_batch(df, cfg, str(tmp_path))
    assert str(e.value) == "Record key schema type must be BYTES, STRING given"


def test_csv_rejects_struct_value_with_reference_message(spark, tmp_path):
    rows = [Row(topic="t", partition=0, offset=0, key="k",
                value=Row(name="n"), timestamp=None, headers=None)]
    df = spark.createDataFrame(
        rows,
        "topic string, partition int, offset long, key string, "
        "value struct<name:string>, timestamp long, "
        "headers array<struct<key:string,value:binary>>",
    )
    cfg = EngineConfig(output_fields=(OutputField.VALUE,))
    with pytest.raises(SchemaTypeError) as e:
        write_batch(df, cfg, str(tmp_path))
    assert str(e.value) == "Record value schema type must be BYTES, STRUCT given"


def test_jsonl_accepts_string_schema(spark, tmp_path):
    """supportStringValuesForJsonL (S3SinkTaskTest.java:501-551): the same
    STRING-schema records that fail CSV flush cleanly as JSONL."""
    rows = [Row(topic="t", partition=0, offset=0, key="key0", value="value0",
                timestamp=None, headers=None)]
    cfg = EngineConfig(
        format_type=FormatType.JSONL,
        output_fields=(OutputField.VALUE, OutputField.KEY),
        value_converter="string",
        key_converter="string",
        file_compression=CompressionType.NONE,
    )
    df = spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA)
    write_batch(df, cfg, str(tmp_path))
    data = read_compressed(os.path.join(tmp_path, "t-0-0"), CompressionType.NONE)
    assert json.loads(data.decode().splitlines()[0]) == {
        "value": "value0", "key": "key0"
    }


def test_jsonl_struct_value_serializes_as_json_document(spark, tmp_path):
    rows = [Row(topic="t", partition=0, offset=0, key=None,
                value=Row(name="n", n=3), timestamp=None, headers=None)]
    df = spark.createDataFrame(
        rows,
        "topic string, partition int, offset long, key string, "
        "value struct<name:string,n:int>, timestamp long, "
        "headers array<struct<key:string,value:binary>>",
    )
    cfg = EngineConfig(
        format_type=FormatType.JSONL,
        output_fields=(OutputField.VALUE,),
        envelope=False,
        file_compression=CompressionType.NONE,
    )
    write_batch(df, cfg, str(tmp_path))
    data = read_compressed(os.path.join(tmp_path, "t-0-0"), CompressionType.NONE)
    assert json.loads(data.decode().splitlines()[0]) == {"name": "n", "n": 3}


def test_binary_stream_normalizer_keeps_bytes(spark):
    from kafka_connector_s3_sink_spark.streaming.pipeline import (
        normalize_kafka_stream,
    )

    src = spark.createDataFrame(
        [Row(topic="t", partition=0, offset=0, key=b"k", value=bytes([0xFF]),
             timestamp=None, headers=None)],
        "topic string, partition int, offset long, key binary, value binary, "
        "timestamp timestamp, headers array<struct<key:string,value:binary>>",
    )
    out = normalize_kafka_stream(src, converter="bytes")
    assert dict(out.dtypes)["value"] == "binary"
    assert out.collect()[0]["value"] == bytes([0xFF])
    out_str = normalize_kafka_stream(src, converter="string")
    assert dict(out_str.dtypes)["value"] == "string"
