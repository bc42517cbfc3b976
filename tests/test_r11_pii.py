"""PII redaction wired into both flagship ladders (r11).

`text.redact_pii_columns` existed as an oracle-gated operator since r5 but
neither `pretraining_pipeline` nor the streaming ingest applied it — a real
production corpus build redacts PII before anything trainer-facing is
written. The wiring contract both paths share:

- redaction is the LAST text mutation: dedup/decontam/DSIR fingerprints
  (and the streaming ingest's persisted index) are computed on RAW text,
  so redaction never shifts admitted ids or duplicate classification;
- nothing written for the trainer (preset: the post-redaction stage frames
  and everything derived; ingest: the documents/packs sink objects)
  carries raw PII;
- OFF by default — both configs must opt in.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark import pretraining
from kafka_connector_s3_sink_spark.operators import incremental
from kafka_connector_s3_sink_spark.streaming import ingest

# Long-running e2e/preset suite: excluded from the default pytest
# selection (pytest.ini addopts -m "not slow") so the routine gate
# finishes inside a CI window; run the full suite with
#   python -m pytest tests/ -m "slow or not slow"
pytestmark = pytest.mark.slow

PREFIX = "r11pii"

EMAIL = "alice.smith@example.com"
PHONE = "+14155550123"


def _prose(tag, n=20):
    stops = ["the", "and", "of", "to", "is"]
    return " ".join(
        w for i in range(n) for w in (stops[i % 5], f"{tag}{i}")
    )


PII_DOC = _prose("p1") + f" contact {EMAIL} or {PHONE} now"
CLEAN_DOC = _prose("c1")
ROWS = [(1, PII_DOC), (2, CLEAN_DOC)]


def _preset_cfg(**over):
    base = dict(
        quality_floor=0.2,
        splits={"train": 1.0},
        ctx_len=64,
        seed="r11pii",
    )
    base.update(over)
    return pretraining.PretrainingConfig(**base)


def test_preset_redacts_trainer_facing_text(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    res = pretraining.pretraining_pipeline(
        docs, config=_preset_cfg(redact_pii=True)
    )
    try:
        assert "pii_redaction" in res.stages
        final = [df for df in res.stages.values() if "text" in df.columns][-1]
        texts = {r["doc_id"]: r["text"] for r in final.select("doc_id", "text").collect()}
        assert EMAIL not in texts[1] and PHONE not in texts[1]
        assert "<EMAIL>" in texts[1] and "<PHONE>" in texts[1]
        assert texts[2] == CLEAN_DOC  # clean docs byte-identical
        # per-type totals: one email, one phone, nothing else
        totals = res.pii_totals.collect()[0].asDict()
        assert totals["n_pii_email"] == 1
        assert totals["n_pii_phone"] == 1
        assert totals["n_pii_cc"] == 0 and totals["n_pii_id"] == 0
        # redaction never changes the admitted set
        assert {
            r["doc_id"] for r in res.packed.select("doc_id").distinct().collect()
        } == {1, 2}
    finally:
        res.unpersist()


def test_preset_redaction_off_by_default(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    res = pretraining.pretraining_pipeline(docs, config=_preset_cfg())
    try:
        assert "pii_redaction" not in res.stages
        assert res.pii_totals is None
        final = [df for df in res.stages.values() if "text" in df.columns][-1]
        raw = final.filter("doc_id = 1").select("text").first()[0]
        assert EMAIL in raw and PHONE in raw
    finally:
        res.unpersist()


def _ingest_cfg(tmp_path, loc, **over):
    base = dict(
        index_prefix=PREFIX,
        index_location=loc,
        dest_dir=str(tmp_path / "out"),
        checkpoint_location=str(tmp_path / "ckpt"),
        num_buckets=2,
        ctx_len=64,
        split_weights={"train": 1.0},
        min_quality=0.2,
    )
    base.update(over)
    return ingest.IngestConfig(**base)


def test_ingest_redacts_sink_objects_and_stays_idempotent(spark, tmp_path):
    """The documents AND packs the trainer reads are redacted; replaying the
    epoch (the at-least-once contract) reproduces identical redacted rows;
    and the index keeps RAW-text fingerprints — a later epoch re-sending the
    raw document still classifies as a duplicate of the redacted keeper."""
    loc = str(tmp_path / "index")
    base = spark.createDataFrame([(9999, _prose("hist", 25))], ["doc_id", "text"])
    incremental.build_dedup_index(base, PREFIX, loc, num_buckets=2)
    cfg = _ingest_cfg(tmp_path, loc, redact_pii=True)
    try:
        batch = spark.createDataFrame(ROWS, ["doc_id", "text"])
        ingest.process_crawl_batch(batch, 0, cfg)
        out = spark.read.parquet(f"{cfg.dest_dir}/documents")
        texts = {r["doc_id"]: r["text"] for r in out.select("doc_id", "text").collect()}
        assert EMAIL not in texts[1] and "<EMAIL>" in texts[1]
        assert texts[2] == CLEAN_DOC
        # packs were budgeted over the same redacted frame and exist
        packs = spark.read.parquet(f"{cfg.dest_dir}/packs")
        assert packs.count() > 0
        rows1 = sorted(
            spark.read.parquet(f"{cfg.dest_dir}/documents").collect(),
            key=lambda r: r["doc_id"],
        )
        # replay the epoch: same objects, same redacted content
        ingest.process_crawl_batch(batch, 0, cfg)
        rows2 = sorted(
            spark.read.parquet(f"{cfg.dest_dir}/documents").collect(),
            key=lambda r: r["doc_id"],
        )
        assert rows1 == rows2
        # the INDEX holds raw-text fingerprints: epoch 1 re-sends the raw
        # PII doc under a new id — it must classify as a duplicate (shed),
        # which can only happen if the index was appended pre-redaction
        ingest.process_crawl_batch(
            spark.createDataFrame([(31, PII_DOC)], ["doc_id", "text"]), 1, cfg
        )
        ep1 = spark.read.parquet(f"{cfg.dest_dir}/documents").filter(
            F.col("batch_id") == "epoch-00000000000000000001"
        )
        assert ep1.count() == 0
    finally:
        incremental.drop_dedup_index(spark, PREFIX)


def test_preset_ingest_redaction_parity(spark, tmp_path):
    """With redaction ON in both ladders: identical admitted ids AND
    identical redacted text per id (the parity contract extends to the
    trainer-facing bytes)."""
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    res = pretraining.pretraining_pipeline(
        docs, config=_preset_cfg(redact_pii=True)
    )
    try:
        final = [df for df in res.stages.values() if "text" in df.columns][-1]
        preset_texts = {
            r["doc_id"]: r["text"]
            for r in final.select("doc_id", "text").collect()
        }
    finally:
        res.unpersist()

    loc = str(tmp_path / "index2")
    base = spark.createDataFrame([(9999, _prose("hist", 25))], ["doc_id", "text"])
    incremental.build_dedup_index(base, PREFIX + "b", loc, num_buckets=2)
    try:
        cfg = _ingest_cfg(
            tmp_path, loc, index_prefix=PREFIX + "b", redact_pii=True
        )
        ingest.process_crawl_batch(docs, 0, cfg)
        ingest_texts = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{cfg.dest_dir}/documents")
            .select("doc_id", "text")
            .collect()
        }
    finally:
        incremental.drop_dedup_index(spark, PREFIX + "b")
    assert preset_texts == ingest_texts


def test_pii_totals_rides_pre_mixture_cache(spark):
    """r12 (VERDICT r11 item 3 / ADVICE item 1): in the LAZY path
    (persist_stages=False), ``res.pii_totals`` aggregates over the
    materialized pre-mixture frame — its plan reads the cache
    (InMemoryRelation), so collecting it costs ONE aggregation job in both
    modes instead of replaying the quality→dedup→decontam ladder."""
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    res = pretraining.pretraining_pipeline(
        docs, config=_preset_cfg(redact_pii=True)
    )
    try:
        plan = res.pii_totals._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" in plan, plan
        totals = res.pii_totals.collect()[0]
        assert totals["n_pii_email"] == 1
        assert totals["n_pii_phone"] == 1
        # the redacted stage frame still rides the SAME cache (the regex
        # chain is row-local on top of it — no second ladder replay)
        stage_plan = (
            res.stages["pii_redaction"]
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "InMemoryRelation" in stage_plan, stage_plan
    finally:
        res.unpersist()
