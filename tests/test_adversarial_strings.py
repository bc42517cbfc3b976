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
    "{oops",  # JSON-lookalike that does NOT parse — must be escaped, not inlined
    "[1,2",
    '{"trailing":}',
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


def test_key_template_rejects_path_traversal(spark, tmp_path):
    """A hostile key must not write outside the sink directory: {{key}} object
    names with '..' segments are refused; plain keys with '/' become
    S3-prefix-style subdirectories."""
    cfg = EngineConfig(
        file_name_template="{{key}}",
        file_max_records=1,
        value_encoding=FieldEncoding.NONE,
        file_compression=CompressionType.NONE,
    )
    evil = [Row(topic="t", partition=0, offset=0, key="../../escape", value="v",
                timestamp=None, headers=None)]
    with pytest.raises(Exception, match="escapes the sink"):
        write_batch(spark.createDataFrame(evil, KAFKA_RECORD_SCHEMA), cfg,
                    str(tmp_path / "dest"))
    assert not (tmp_path / "escape").exists()

    nested = [Row(topic="t", partition=0, offset=0, key="a/b/c", value="v",
                  timestamp=None, headers=None)]
    dest = tmp_path / "dest2"
    dest.mkdir()
    written = write_batch(
        spark.createDataFrame(nested, KAFKA_RECORD_SCHEMA), cfg, str(dest)
    )
    assert written == [("a/b/c", 1)]
    assert (dest / "a" / "b" / "c").exists()


def test_fuzz_csv_roundtrip_random_unicode(spark, tmp_path):
    """Seeded fuzz: 200 random unicode strings (including control chars and
    astral-plane codepoints, excluding NUL and surrogates) round-trip through
    CSV+base64 byte-exactly."""
    import random

    rng = random.Random(42)
    pool = (
        [chr(c) for c in range(1, 0x80)]
        + [chr(c) for c in range(0xA0, 0x2000, 37)]
        + ["文", "字", "🙂", "𝄞", "ḁ", " ", " "]
    )
    values = [
        "".join(rng.choice(pool) for _ in range(rng.randint(1, 40)))
        for _ in range(200)
    ]
    rows = [
        Row(topic="fz", partition=0, offset=i, key=None, value=v,
            timestamp=None, headers=None)
        for i, v in enumerate(values)
    ]
    cfg = EngineConfig(file_compression=CompressionType.NONE)
    write_batch(spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA), cfg, str(tmp_path))
    data = read_compressed(os.path.join(tmp_path, "fz-0-0"), CompressionType.NONE)
    decoded = [base64.b64decode(l).decode() for l in data.decode().split("\n")[:-1]]
    assert decoded == values


def test_jsonl_multiline_json_value_stays_one_line(spark, tmp_path):
    """A value that is VALID JSON but spans lines must not be inlined verbatim
    (raw newlines would break JSONL) — it is escaped as a JSON string."""
    multiline = '{"a":' + chr(10) + ' 1}'
    rows = [Row(topic="m", partition=0, offset=0, key=None, value=multiline,
                timestamp=None, headers=None)]
    cfg = EngineConfig(
        format_type=FormatType.JSONL,
        output_fields=(OutputField.VALUE,),
        file_compression=CompressionType.NONE,
    )
    write_batch(spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA), cfg, str(tmp_path))
    data = read_compressed(os.path.join(tmp_path, "m-0-0"), CompressionType.NONE)
    lines = data.decode().split("\n")[:-1]
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == multiline
