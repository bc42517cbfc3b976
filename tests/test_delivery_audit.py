"""Delivery-audit tests (`sources/audit.py`): manifest agreement and
offset-continuity detection over written sink output — the queryable form of
the reference's at-least-once + idempotent-names delivery contract
(README.md:101-133)."""

import os

from pyspark.sql import Row

from kafka_connector_s3_sink_spark.config import (
    CompressionType,
    EngineConfig,
    OutputField,
)
from kafka_connector_s3_sink_spark.records import KAFKA_RECORD_SCHEMA
from kafka_connector_s3_sink_spark.sinks.writer import write_batch
from kafka_connector_s3_sink_spark.sources.audit import audit_sink_output


def records_df(spark, rows):
    return spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA)


def _rows(topic="t", partition=0, n=9, start=0):
    return [
        Row(topic=topic, partition=partition, offset=start + i, key=None,
            value=f"v{start + i}", timestamp=1000 + i, headers=None)
        for i in range(n)
    ]


CFG = EngineConfig(
    output_fields=(OutputField.OFFSET, OutputField.VALUE),
    file_max_records=3,
    file_compression=CompressionType.NONE,
)


def test_contiguous_chunks_and_sidecar_manifest(spark, tmp_path):
    rows = _rows(n=9) + _rows(partition=1, n=4, start=100)
    write_batch(records_df(spark, rows), CFG, str(tmp_path), manifest="sidecar")
    audit = audit_sink_output(spark, str(tmp_path), CFG)
    got = {r["object_name"]: r for r in audit.collect()}
    # 3 chunks of 3 on partition 0, 2 chunks (3+1) on partition 1
    assert set(got) == {"t-0-0", "t-0-3", "t-0-6", "t-1-100", "t-1-103"}
    assert all(r["manifest_ok"] for r in got.values())
    assert got["t-0-0"]["records"] == 3 and got["t-0-0"]["gap_after"] == 0
    assert got["t-0-3"]["gap_after"] == 0
    # last object per partition has nothing after it
    assert got["t-0-6"]["gap_after"] is None
    assert got["t-1-100"]["gap_after"] == 0
    assert got["t-1-103"]["records"] == 1


def test_missing_object_shows_gap(spark, tmp_path):
    write_batch(records_df(spark, _rows(n=9)), CFG, str(tmp_path))
    os.remove(tmp_path / "t-0-3")  # lose the middle flush
    audit = audit_sink_output(spark, str(tmp_path), CFG)
    got = {r["object_name"]: r for r in audit.collect()}
    assert set(got) == {"t-0-0", "t-0-6"}
    # offsets 3..5 vanished: predecessor sees a 3-offset hole
    assert got["t-0-0"]["gap_after"] == 3
    # no sidecar was written → manifest checks are null, not failures
    assert got["t-0-0"]["manifest_ok"] is None


def test_tampered_object_fails_manifest(spark, tmp_path):
    write_batch(records_df(spark, _rows(n=6)), CFG, str(tmp_path), manifest="sidecar")
    # drop one line from an object: count no longer matches its manifest entry
    p = tmp_path / "t-0-0"
    lines = p.read_text().splitlines()
    p.write_text("\n".join(lines[:-1]) + "\n")
    audit = audit_sink_output(spark, str(tmp_path), CFG)
    got = {r["object_name"]: r for r in audit.collect()}
    assert got["t-0-0"]["manifest_ok"] is False
    assert got["t-0-0"]["records"] == 2 and got["t-0-0"]["manifest_records"] == 3
    assert got["t-0-3"]["manifest_ok"] is True
    # the truncation also breaks offset continuity toward the next object
    assert got["t-0-0"]["gap_after"] == 1


def test_corrupt_object_surfaces_in_audit(spark, tmp_path):
    """An audit must REPORT a broken object, not die on it: the poisoned
    object appears with records=0 and its decode error, and the healthy
    neighbours still audit clean."""
    cfg = EngineConfig(
        output_fields=(OutputField.OFFSET, OutputField.VALUE),
        file_max_records=3,
        file_compression=CompressionType.GZIP,
    )
    write_batch(records_df(spark, _rows(n=6)), cfg, str(tmp_path),
                manifest="sidecar")
    (tmp_path / "t-0-3.gz").write_bytes(b"garbage, not gzip")
    audit = audit_sink_output(spark, str(tmp_path), cfg)
    got = {r["object_name"]: r for r in audit.collect()}
    bad = got["t-0-3.gz"]
    assert bad["records"] == 0 and "BadGzipFile" in bad["decode_error"]
    assert bad["manifest_ok"] is False  # manifest said 3, store yields 0
    good = got["t-0-0.gz"]
    assert good["records"] == 3 and good["manifest_ok"] is True
    assert good["decode_error"] is None


def test_repair_rewrites_only_broken_objects(spark, tmp_path):
    """repair_sink_output: deleted and truncated objects are rewritten
    byte-identically; healthy objects are not touched; a second repair is a
    no-op."""
    from kafka_connector_s3_sink_spark.sources.audit import repair_sink_output

    df = records_df(spark, _rows(n=9))
    write_batch(df, CFG, str(tmp_path))
    original = (tmp_path / "t-0-3").read_bytes()
    healthy_mtime = os.path.getmtime(tmp_path / "t-0-0")
    os.remove(tmp_path / "t-0-3")
    # truncate: drop the last record line of the third chunk
    p = tmp_path / "t-0-6"
    p.write_text("\n".join(p.read_text().splitlines()[:-1]) + "\n")

    repaired = repair_sink_output(df, str(tmp_path), CFG)
    assert {n for n, _ in repaired} == {"t-0-3", "t-0-6"}
    assert dict(repaired) == {"t-0-3": 3, "t-0-6": 3}
    # determinism: the rewritten object is byte-identical to the original
    assert (tmp_path / "t-0-3").read_bytes() == original
    # the healthy object was never rewritten
    assert os.path.getmtime(tmp_path / "t-0-0") == healthy_mtime
    # store is consistent now: audit clean, second repair a no-op
    audit = audit_sink_output(spark, str(tmp_path), CFG)
    assert all(r["records"] == 3 for r in audit.collect())
    assert repair_sink_output(df, str(tmp_path), CFG) == []


PARQUET_CFG_KW = dict(
    output_fields=(OutputField.OFFSET, OutputField.VALUE),
    file_max_records=3,
)


def _parquet_cfg():
    from kafka_connector_s3_sink_spark.config import FormatType

    return EngineConfig(format_type=FormatType.PARQUET, **PARQUET_CFG_KW)


def test_parquet_corrupt_footer_routed_in_audit(spark, tmp_path):
    """r6: a parquet object with a damaged FOOTER (truncated tail — the
    magic+metadata live at the end) is routed as a decode_error row instead
    of killing the native scan; healthy neighbours audit clean with intact
    offsets."""
    cfg = _parquet_cfg()
    write_batch(records_df(spark, _rows(n=9)), cfg, str(tmp_path),
                manifest="sidecar")
    victim = tmp_path / "t-0-3"
    data = victim.read_bytes()
    victim.write_bytes(data[: len(data) // 2])  # footer gone
    audit = audit_sink_output(spark, str(tmp_path), cfg)
    got = {r["object_name"]: r for r in audit.collect()}
    assert set(got) == {"t-0-0", "t-0-3", "t-0-6"}
    bad = got["t-0-3"]
    assert bad["records"] == 0 and bad["decode_error"]
    assert bad["manifest_ok"] is False
    # name-derived columns survive even though the payload is unreadable
    assert (bad["topic"], bad["partition"], bad["start_offset"]) == ("t", 0, 3)
    good = got["t-0-0"]
    assert good["records"] == 3 and good["manifest_ok"] is True
    assert good["min_offset"] == 0 and good["max_offset"] == 2


def test_parquet_repair_rewrites_corrupt_footer_object(spark, tmp_path):
    """r6: repair detects the footer-corrupt parquet object and rewrites it
    byte-identically (deterministic parquet writer); healthy objects
    untouched; second repair is a no-op."""
    from kafka_connector_s3_sink_spark.sources.audit import repair_sink_output

    cfg = _parquet_cfg()
    df = records_df(spark, _rows(n=9))
    write_batch(df, cfg, str(tmp_path))
    original = (tmp_path / "t-0-3").read_bytes()
    healthy_mtime = os.path.getmtime(tmp_path / "t-0-0")
    data = (tmp_path / "t-0-3").read_bytes()
    (tmp_path / "t-0-3").write_bytes(data[: len(data) // 2])

    repaired = repair_sink_output(df, str(tmp_path), cfg)
    assert dict(repaired) == {"t-0-3": 3}
    assert (tmp_path / "t-0-3").read_bytes() == original
    assert os.path.getmtime(tmp_path / "t-0-0") == healthy_mtime
    audit = audit_sink_output(spark, str(tmp_path), cfg)
    rows = audit.collect()
    assert all(r["records"] == 3 for r in rows)
    assert all(r["decode_error"] is None for r in rows)
    assert repair_sink_output(df, str(tmp_path), cfg) == []


def test_parquet_every_object_corrupt_still_audits(spark, tmp_path):
    """Degenerate route case: ALL footers damaged — the audit still returns
    one error row per object (typed schema synthesized, no native scan)."""
    cfg = _parquet_cfg()
    write_batch(records_df(spark, _rows(n=6)), cfg, str(tmp_path))
    for p in tmp_path.iterdir():
        if p.is_file():
            p.write_bytes(p.read_bytes()[:40])
    audit = audit_sink_output(spark, str(tmp_path), cfg)
    got = {r["object_name"]: r for r in audit.collect()}
    assert set(got) == {"t-0-0", "t-0-3"}
    assert all(r["records"] == 0 and r["decode_error"] for r in got.values())
