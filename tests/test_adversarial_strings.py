"""Adversarial-string round-trips through the object writer.

The reference ships blns.txt in test resources but references it from no test
(SURVEY.md §5) — this suite actually exercises that coverage: values
containing CSV delimiters, newlines, quotes, unicode, and JSON-breaking
characters must round-trip byte-exactly through each format. The base64
default encoding is what makes unquoted CSV safe; JSONL relies on to_json
escaping."""

import base64
import json
import os

import pytest
from pyspark.sql import Row

from kafka_connector_s3_sink_spark.config import (
    CompressionType,
    EngineConfig,
    FieldEncoding,
    FormatType,
    OutputField,
)
from kafka_connector_s3_sink_spark.formats.compression import read_compressed
from kafka_connector_s3_sink_spark.records import KAFKA_RECORD_SCHEMA
from kafka_connector_s3_sink_spark.sinks.writer import write_batch

NASTY = [
    "plain",
    "comma,inside",
    'quote"inside',
    "new" + chr(10) + "line",
    "tab" + chr(9) + "and" + chr(13) + "carriage",
    "unicode-Ω≈ç√∫˜µ≤≥-文字-🙂",
    " leading and trailing ",
    '{"json":"looking"}',
    "back" + chr(92) + "slash",
    "semi;colon:and=equals",
    "control" + chr(1) + "char",  # raw 0x01 (a NUL would break text formats)
    "ʇxǝʇ uʍop-ǝpısdn",
]


def _rows():
    return [
        Row(topic="nasty", partition=0, offset=i, key=f"k{i}", value=v,
            timestamp=1000 + i, headers=None)
        for i, v in enumerate(NASTY)
    ]


def test_csv_base64_roundtrips_nasty_values(spark, tmp_path):
    cfg = EngineConfig(file_compression=CompressionType.GZIP)
    written = write_batch(
        spark.createDataFrame(_rows(), KAFKA_RECORD_SCHEMA), cfg, str(tmp_path)
    )
    assert written == [("nasty-0-0.gz", len(NASTY))]
    data = read_compressed(os.path.join(tmp_path, "nasty-0-0.gz"), CompressionType.GZIP)
    lines = data.decode().split("\n")[:-1]
    decoded = [base64.b64decode(l).decode() for l in lines]
    # newlines inside values survive because base64 emits no raw newline —
    # the one-record-per-line invariant holds
    assert decoded == NASTY


def test_jsonl_escapes_nasty_values(spark, tmp_path):
    cfg = EngineConfig(
        format_type=FormatType.JSONL,
        output_fields=(OutputField.VALUE, OutputField.OFFSET),
        file_compression=CompressionType.NONE,
    )
    written = write_batch(
        spark.createDataFrame(_rows(), KAFKA_RECORD_SCHEMA), cfg, str(tmp_path)
    )
    data = read_compressed(os.path.join(tmp_path, "nasty-0-0"), CompressionType.NONE)
    lines = data.decode("utf-8").split("\n")[:-1]
    assert len(lines) == len(NASTY)
    for i, line in enumerate(lines):
        obj = json.loads(line)  # every line must be valid JSON
        assert obj["offset"] == i


def test_parquet_roundtrips_nasty_values(spark, tmp_path):
    cfg = EngineConfig(
        format_type=FormatType.PARQUET,
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
    )
    write_batch(spark.createDataFrame(_rows(), KAFKA_RECORD_SCHEMA), cfg, str(tmp_path))
    import pyarrow.parquet as pq

    table = pq.read_table(os.path.join(tmp_path, "nasty-0-0"))
    assert table.column("value").to_pylist() == NASTY
