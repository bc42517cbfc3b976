"""Streaming re-ingest + poison-object tolerance for the read-back source."""

import uuid

import pytest
from pyspark.sql import Row

from kafka_connector_s3_sink_spark.config import (
    CompressionType,
    EngineConfig,
    FormatType,
    OutputField,
)
from kafka_connector_s3_sink_spark.records import KAFKA_RECORD_SCHEMA
from kafka_connector_s3_sink_spark.sinks.writer import write_batch
from kafka_connector_s3_sink_spark.sources.objects import (
    read_sink_objects,
    stream_sink_objects,
)


def records_df(spark, rows):
    return spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA)


def _rows(n=6, partition=0, start=0):
    return [
        Row(topic="t", partition=partition, offset=start + i, key=f"k{start + i}",
            value=f"v{start + i}", timestamp=1000 + i, headers=None)
        for i in range(n)
    ]


def _drain(stream_df):
    name = "mem_" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_streaming_reingest_csv_gzip(spark, tmp_path):
    cfg = EngineConfig(
        output_fields=(OutputField.OFFSET, OutputField.KEY, OutputField.VALUE),
        file_max_records=2,
        file_compression=CompressionType.GZIP,
    )
    write_batch(records_df(spark, _rows(6)), cfg, str(tmp_path))
    name = _drain(stream_sink_objects(spark, str(tmp_path), cfg))
    got = {r["offset"]: r for r in spark.table(name).collect()}
    assert len(got) == 6
    assert bytes(got[3]["value"]) == b"v3" and bytes(got[3]["key"]) == b"k3"
    # grouping recovered from the object name, gzip decoded by the JVM codec
    assert (got[3]["topic"], got[3]["partition"], got[3]["start_offset"]) == (
        "t", 0, 2,
    )


def test_streaming_reingest_jsonl_picks_up_new_objects(spark, tmp_path):
    cfg = EngineConfig(
        format_type=FormatType.JSONL,
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        file_compression=CompressionType.NONE,
    )
    write_batch(records_df(spark, _rows(3)), cfg, str(tmp_path))
    name = _drain(stream_sink_objects(spark, str(tmp_path), cfg,
                                      binary_payloads=False))
    assert spark.table(name).count() == 3
    # a later flush adds objects; a fresh availableNow pass sees the union
    write_batch(records_df(spark, _rows(2, partition=1, start=50)), cfg,
                str(tmp_path))
    name2 = _drain(stream_sink_objects(spark, str(tmp_path), cfg,
                                       binary_payloads=False))
    got = {r["offset"] for r in spark.table(name2).collect()}
    assert got == {0, 1, 2, 50, 51}


def test_streaming_rejects_unstreamable_configs(spark, tmp_path):
    with pytest.raises(ValueError, match="line formats"):
        stream_sink_objects(
            spark, str(tmp_path), EngineConfig(format_type=FormatType.JSON)
        )
    with pytest.raises(ValueError, match="decompress"):
        stream_sink_objects(
            spark, str(tmp_path),
            EngineConfig(file_compression=CompressionType.ZSTD),
        )


def test_corrupt_object_routes_instead_of_failing(spark, tmp_path):
    cfg = EngineConfig(
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        file_max_records=2,
        file_compression=CompressionType.GZIP,
    )
    write_batch(records_df(spark, _rows(4)), cfg, str(tmp_path))
    # poison one object: not gzip at all
    (tmp_path / "t-0-0.gz").write_bytes(b"this is not gzip")
    routed = read_sink_objects(spark, str(tmp_path), cfg, on_error="route")
    rows = routed.collect()
    bad = [r for r in rows if r["decode_error"] is not None]
    good = [r for r in rows if r["decode_error"] is None]
    assert len(bad) == 1 and bad[0]["object_name"] == "t-0-0.gz"
    assert bad[0]["value"] is None and "BadGzipFile" in bad[0]["decode_error"]
    # the healthy object's records all survive
    assert {r["offset"] for r in good} == {2, 3}
    # default policy still fails loudly
    with pytest.raises(Exception):
        read_sink_objects(spark, str(tmp_path), cfg).collect()
