"""Round-trip tests for the read-back source (`sources/objects.py`):
write_batch → read_sink_objects must reconstruct the records the sink
consumed, for every format and compression, including the grouping variables
that only exist in the object NAME (the reference encodes the flush grouping
solely in the filename, S3SinkTask.java:121-144)."""

import base64

import pytest
from pyspark.sql import Row

from kafka_connector_s3_sink_spark.config import (
    CompressionType,
    EngineConfig,
    FieldEncoding,
    FormatType,
    OutputField,
)
from kafka_connector_s3_sink_spark.records import KAFKA_RECORD_SCHEMA
from kafka_connector_s3_sink_spark.sinks.writer import write_batch
from kafka_connector_s3_sink_spark.sources.objects import read_sink_objects
from kafka_connector_s3_sink_spark.template import FilenameTemplate


def records_df(spark, rows):
    return spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA)


def _rows():
    return [
        Row(
            topic="t-a", partition=0, offset=10, key="k1", value="v-ten",
            timestamp=1000, headers=[Row(key="h1", value=bytearray(b"x"))],
        ),
        Row(
            topic="t-a", partition=0, offset=11, key=None, value="v,comma",
            timestamp=1001, headers=None,
        ),
        Row(
            topic="t-a", partition=1, offset=5, key="k2", value=None,
            timestamp=None, headers=[Row(key="h2", value=None)],
        ),
        Row(
            topic="t-b", partition=0, offset=7, key="k3", value='{"j":1}',
            timestamp=1003, headers=None,
        ),
    ]


ALL_FIELDS = (
    OutputField.KEY,
    OutputField.VALUE,
    OutputField.OFFSET,
    OutputField.TIMESTAMP,
    OutputField.HEADERS,
)


def _by_offset(df):
    out = {}
    for r in df.collect():
        out[r["offset"]] = r
    return out


@pytest.mark.parametrize(
    "compression",
    [CompressionType.NONE, CompressionType.GZIP, CompressionType.SNAPPY,
     CompressionType.ZSTD],
)
def test_csv_roundtrip_all_compressions(spark, tmp_path, compression):
    cfg = EngineConfig(
        output_fields=ALL_FIELDS, file_compression=compression,
    )
    write_batch(records_df(spark, _rows()), cfg, str(tmp_path))
    back = read_sink_objects(spark, str(tmp_path), cfg)
    got = _by_offset(back)
    assert len(got) == 4
    r10 = got[10]
    assert (r10["topic"], r10["partition"], r10["start_offset"]) == ("t-a", 0, 10)
    assert bytes(r10["key"]) == b"k1" and bytes(r10["value"]) == b"v-ten"
    assert r10["timestamp"] == 1000
    assert [(h["key"], bytes(h["value"])) for h in r10["headers"]] == [("h1", b"x")]
    # base64 CSV is comma-safe: the payload containing ',' survives
    assert bytes(got[11]["value"]) == b"v,comma"
    assert got[11]["key"] is None
    # null value / null timestamp read back as null
    assert got[5]["value"] is None and got[5]["timestamp"] is None
    assert (got[5]["topic"], got[5]["partition"]) == ("t-a", 1)


def test_csv_encoding_none_strings(spark, tmp_path):
    cfg = EngineConfig(
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        value_encoding=FieldEncoding.NONE,
        file_compression=CompressionType.NONE,
    )
    rows = [
        Row(topic="t", partition=0, offset=1, key=None, value="plain",
            timestamp=1, headers=None),
    ]
    write_batch(records_df(spark, rows), cfg, str(tmp_path))
    back = read_sink_objects(spark, str(tmp_path), cfg)
    r = back.collect()[0]
    assert r["value"] == "plain" and r["offset"] == 1


def test_jsonl_roundtrip(spark, tmp_path):
    cfg = EngineConfig(
        format_type=FormatType.JSONL,
        output_fields=ALL_FIELDS,
        file_compression=CompressionType.GZIP,
    )
    write_batch(records_df(spark, _rows()), cfg, str(tmp_path))
    back = read_sink_objects(spark, str(tmp_path), cfg, binary_payloads=False)
    got = _by_offset(back)
    assert len(got) == 4
    assert got[10]["key"] == "k1" and got[10]["value"] == "v-ten"
    assert [(h["key"], bytes(h["value"])) for h in got[10]["headers"]] == [
        ("h1", b"x")
    ]
    assert got[5]["value"] is None
    # an inlined JSON document reads back as its compact JSON text
    assert got[7]["value"] == '{"j":1}'
    assert (got[7]["topic"], got[7]["start_offset"]) == ("t-b", 7)


def test_json_array_roundtrip_including_single_record(spark, tmp_path):
    cfg = EngineConfig(
        format_type=FormatType.JSON,
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        file_compression=CompressionType.NONE,
    )
    rows = [
        Row(topic="t", partition=0, offset=i, key=None, value=f"v{i}",
            timestamp=1, headers=None)
        for i in range(3)
    ] + [
        Row(topic="t", partition=1, offset=9, key=None, value="only",
            timestamp=1, headers=None)
    ]
    write_batch(records_df(spark, rows), cfg, str(tmp_path))
    back = read_sink_objects(spark, str(tmp_path), cfg, binary_payloads=False)
    got = _by_offset(back)
    assert {k: v["value"] for k, v in got.items()} == {
        0: "v0", 1: "v1", 2: "v2", 9: "only"
    }
    # line_no restarts per object and skips the [ ] frame
    assert got[0]["line_no"] == 0 and got[9]["line_no"] == 0


def test_parquet_roundtrip(spark, tmp_path):
    cfg = EngineConfig(
        format_type=FormatType.PARQUET,
        output_fields=(OutputField.KEY, OutputField.OFFSET, OutputField.VALUE),
    )
    write_batch(records_df(spark, _rows()), cfg, str(tmp_path))
    back = read_sink_objects(spark, str(tmp_path), cfg)
    got = _by_offset(back)
    assert len(got) == 4
    assert got[10]["key"] == "k1" and got[10]["value"] == "v-ten"
    assert (got[10]["topic"], got[10]["partition"], got[10]["start_offset"]) == (
        "t-a", 0, 10,
    )
    assert got[5]["value"] is None


def test_unwrapped_single_field_jsonl(spark, tmp_path):
    cfg = EngineConfig(
        format_type=FormatType.JSONL,
        output_fields=(OutputField.VALUE,),
        envelope=False,
        file_compression=CompressionType.NONE,
    )
    rows = [
        Row(topic="t", partition=0, offset=0, key=None, value="plain text",
            timestamp=1, headers=None),
        Row(topic="t", partition=0, offset=1, key=None, value='{"doc":true}',
            timestamp=1, headers=None),
    ]
    write_batch(records_df(spark, rows), cfg, str(tmp_path))
    back = read_sink_objects(spark, str(tmp_path), cfg, binary_payloads=False)
    vals = sorted(r["value"] for r in back.collect())
    assert vals == sorted(["plain text", '{"doc":true}'])


def test_padded_template_and_prefix_name_parsing(spark, tmp_path):
    cfg = EngineConfig(
        prefix="pre/",
        file_name_template=(
            "{{topic}}-{{partition:padding=true}}-{{start_offset:padding=true}}"
        ),
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        file_compression=CompressionType.NONE,
    )
    rows = [
        Row(topic="top-3-4", partition=2, offset=31, key=None, value="v",
            timestamp=1, headers=None),
    ]
    written = write_batch(records_df(spark, rows), cfg, str(tmp_path))
    assert written[0][0] == "pre/top-3-4-0000000002-00000000000000000031"
    r = read_sink_objects(spark, str(tmp_path), cfg).collect()[0]
    # greedy topic + fixed-width padded groups disambiguate the dashes
    assert (r["topic"], r["partition"], r["start_offset"]) == ("top-3-4", 2, 31)


def test_key_mode_name_parsing(spark, tmp_path):
    cfg = EngineConfig(
        file_name_template="{{key}}",
        output_fields=(OutputField.VALUE,),
        file_compression=CompressionType.NONE,
    )
    rows = [
        Row(topic="t", partition=0, offset=0, key="alpha", value="v1",
            timestamp=1, headers=None),
        Row(topic="t", partition=0, offset=1, key="alpha", value="v2",
            timestamp=2, headers=None),
        Row(topic="t", partition=0, offset=2, key=None, value="v3",
            timestamp=3, headers=None),
    ]
    write_batch(records_df(spark, rows), cfg, str(tmp_path))
    back = read_sink_objects(spark, str(tmp_path), cfg)
    got = {r["key_str"]: bytes(r["value"]).decode() for r in back.collect()}
    # upsert kept the last value per key; null key stringifies as "null"
    assert got == {"alpha": "v2", "null": "v3"}


def test_parse_pattern_unit():
    tpl = FilenameTemplate("{{topic}}-{{partition}}-{{start_offset}}")
    pattern, groups = tpl.parse_pattern(extension=".gz")
    import re

    m = re.match(pattern, "events-2-345.gz")
    assert m.group(groups["topic"]) == "events"
    assert m.group(groups["partition"]) == "2"
    assert m.group(groups["start_offset"]) == "345"
    # a dashed topic parses greedily
    m = re.match(pattern, "a-b-1-2.gz")
    assert m.group(groups["topic"]) == "a-b"
    assert m.group(groups["partition"]) == "1"
    # non-matching (foreign) names don't match at all
    assert re.match(pattern, "README.md") is None


def test_foreign_files_yield_null_name_columns(spark, tmp_path):
    cfg = EngineConfig(
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        file_compression=CompressionType.NONE,
    )
    rows = [
        Row(topic="t", partition=0, offset=0, key=None, value="v",
            timestamp=1, headers=None),
    ]
    write_batch(records_df(spark, rows), cfg, str(tmp_path))
    r = read_sink_objects(spark, str(tmp_path), cfg).collect()[0]
    assert (r["topic"], r["partition"], r["start_offset"]) == ("t", 0, 0)
    assert bytes(r["value"]) == b"v"


def test_fuzz_roundtrip_nasty_and_random_unicode(spark, tmp_path):
    """Seeded fuzz through the FULL cycle: adversarial + random unicode values
    written by write_batch, recovered by read_sink_objects — CSV+base64 (the
    comma/newline-proof path) and JSONL both byte-exact."""
    import random

    from tests.test_adversarial_strings import NASTY

    rng = random.Random(7)
    pool = (
        [chr(c) for c in range(1, 0x80)]
        + [chr(c) for c in range(0xA0, 0x2000, 37)]
        + ["文", "🙂", "𝄞", " "]
    )
    values = list(NASTY) + [
        "".join(rng.choice(pool) for _ in range(rng.randint(1, 40)))
        for _ in range(150)
    ]
    rows = [
        Row(topic="fz", partition=0, offset=i, key=None, value=v,
            timestamp=None, headers=None)
        for i, v in enumerate(values)
    ]
    csv_cfg = EngineConfig(
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        file_compression=CompressionType.GZIP,
    )
    write_batch(records_df(spark, rows), csv_cfg, str(tmp_path / "csv"))
    back = read_sink_objects(spark, str(tmp_path / "csv"), csv_cfg)
    got = {r["offset"]: bytes(r["value"]).decode() for r in back.collect()}
    assert got == dict(enumerate(values))

    jsonl_cfg = EngineConfig(
        format_type=FormatType.JSONL,
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        file_compression=CompressionType.NONE,
    )
    write_batch(records_df(spark, rows), jsonl_cfg, str(tmp_path / "jsonl"))
    back = read_sink_objects(
        spark, str(tmp_path / "jsonl"), jsonl_cfg, binary_payloads=False
    )
    got = {r["offset"]: r["value"] for r in back.collect()}
    # JSON-document payloads read back as their compact JSON text; everything
    # else must be byte-exact (multi-line and non-parsing lookalikes were
    # escaped as strings by the writer, so they round-trip exactly)
    for i, v in enumerate(values):
        assert got[i] == v


def test_parquet_readback_merges_evolved_value_schemas(spark, tmp_path):
    """Two sink runs with an EVOLVED value schema (a -> a,b) write objects
    whose envelope structs differ; the read-back merges footers, so run-1
    rows surface with the new field null instead of being silently dropped
    or mis-typed (a plain parquet read resolves to ONE file's schema)."""
    def run(cfg, rows):
        write_batch(records_df(spark, rows), cfg, str(tmp_path))

    v1 = EngineConfig(
        format_type=FormatType.PARQUET,
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        parquet_value_schema="a BIGINT",
    )
    v2 = EngineConfig(
        format_type=FormatType.PARQUET,
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        parquet_value_schema="a BIGINT, b STRING",
    )
    run(v1, [Row(topic="t", partition=0, offset=0, key=None,
                 value='{"a": 1}', timestamp=1, headers=None)])
    run(v2, [Row(topic="t", partition=1, offset=5, key=None,
                 value='{"a": 2, "b": "x"}', timestamp=1, headers=None)])
    back = read_sink_objects(spark, str(tmp_path), v2)
    got = {r["offset"]: r for r in back.collect()}
    assert got[0]["value"]["a"] == 1 and got[0]["value"]["b"] is None
    assert got[5]["value"]["a"] == 2 and got[5]["value"]["b"] == "x"


def test_relative_name_anchored_strip(spark, tmp_path):
    """r6 regression (ADVICE low): an object path that REPEATS the dest dir's
    tail segment must relativize from the anchored dest prefix, not the last
    occurrence of the tail — otherwise name parsing yields null grouping
    columns and the delivery audit silently loses those objects."""
    from pyspark.sql import functions as F

    from kafka_connector_s3_sink_spark.sources.objects import _relative_name

    dest = str(tmp_path / "data")
    paths = [
        f"file:{dest}/x/data/y-0-1.gz",   # tail 'data' repeats mid-path
        f"file://{dest}/plain-0-2.gz",    # slash-count variant
        f"file:{dest}/data/data-0-3.gz",  # object dir literally named 'data'
    ]
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    got = [r["object_name"] for r in df.select(_relative_name(dest)).collect()]
    assert got == ["x/data/y-0-1.gz", "plain-0-2.gz", "data/data-0-3.gz"]
