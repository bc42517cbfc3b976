"""r12: the streaming ingest's trainer handoff gets the preset writer's
contract — pack-file locality and a verifying reader.

`pretraining.write_packed_corpus`/`read_packed_corpus` (r9/r11) give the
batch ladder a locality-guaranteed pack layout plus two bounded startup
checks. The streaming ingest wrote its per-epoch packs as bare task output:
no locality (a pack's segments could span files) and no stats table, so a
trainer consuming `<dest>/packs` had neither the no-shuffle streaming
guarantee nor a tamper check. r12 mirrors the contract:

- the epoch's packs are hash-repartitioned on ``pack_id`` and sorted
  ``(pack_id, pack_pos)`` within files before the partitioned write;
- one stats row per epoch (recomputed FROM THE WRITTEN FILES, so it
  describes what is actually on disk) lands under ``<dest>/pack_stats``
  with the same idempotent per-epoch overwrite;
- ``ingest.read_ingest_packs(..., verify=True)`` replays the two checks
  keyed on (batch_id, pack_id) — pack ids are per-epoch.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.operators import incremental
from kafka_connector_s3_sink_spark.streaming import ingest

# Long-running e2e/preset suite: excluded from the default pytest
# selection (pytest.ini addopts -m "not slow") so the routine gate
# finishes inside a CI window; run the full suite with
#   python -m pytest tests/ -m "slow or not slow"
pytestmark = pytest.mark.slow

PREFIX = "r12pack"


def _prose(tag, n=20):
    stops = ["the", "and", "of", "to", "is"]
    return " ".join(
        w for i in range(n) for w in (stops[i % 5], f"{tag}{i}")
    )


def _cfg(tmp_path, loc, **over):
    base = dict(
        index_prefix=PREFIX,
        index_location=loc,
        dest_dir=str(tmp_path / "out"),
        checkpoint_location=str(tmp_path / "ckpt"),
        num_buckets=2,
        ctx_len=64,
        split_weights={"train": 1.0},
    )
    base.update(over)
    return ingest.IngestConfig(**base)


@pytest.fixture()
def index(spark, tmp_path):
    loc = str(tmp_path / "index")
    base = spark.createDataFrame(
        [(9999, _prose("hist", 25))], ["doc_id", "text"]
    )
    incremental.build_dedup_index(base, PREFIX, loc, num_buckets=2)
    yield loc
    incremental.drop_dedup_index(spark, PREFIX)


def test_pack_locality_stats_and_verifying_read(spark, tmp_path, index):
    rows = [(i, _prose(f"d{i}", 10 + i)) for i in range(1, 9)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = _cfg(tmp_path, index)
    ingest.process_crawl_batch(docs, 0, cfg)
    ingest.process_crawl_batch(
        spark.createDataFrame(
            [(100 + i, _prose(f"e{i}", 12 + i)) for i in range(1, 5)],
            ["doc_id", "text"],
        ),
        1,
        cfg,
    )

    packs = ingest.read_ingest_packs(spark, cfg.dest_dir)
    assert packs.count() > 0
    # locality: every (batch_id, pack_id) lives in exactly one file
    loc_df = (
        packs.withColumn("_f", F.input_file_name())
        .groupBy("batch_id", "pack_id")
        .agg(F.countDistinct("_f").alias("nf"))
    )
    assert loc_df.filter(F.col("nf") > 1).count() == 0
    # both epochs present; per-epoch filter prunes
    epochs = {r["batch_id"] for r in packs.select("batch_id").distinct().collect()}
    assert len(epochs) == 2
    one = ingest.read_ingest_packs(
        spark, cfg.dest_dir, batch_id=sorted(epochs)[0]
    )
    assert {r["batch_id"] for r in one.select("batch_id").distinct().collect()} == {
        sorted(epochs)[0]
    }

    # stats table: one row per epoch, agreeing with the data
    stats = {
        r["batch_id"]: (r["n_packs"], r["n_docs"], r["n_segments"], r["n_tokens"])
        for r in spark.read.parquet(f"{cfg.dest_dir}/pack_stats").collect()
    }
    assert set(stats) == epochs
    recomputed = {
        r["batch_id"]: (r["n_packs"], r["n_docs"], r["n_segments"], r["n_tokens"])
        for r in packs.groupBy("batch_id")
        .agg(
            F.countDistinct("pack_id").alias("n_packs"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("seg_tokens").alias("n_tokens"),
        )
        .collect()
    }
    assert stats == recomputed


def test_verify_catches_stats_tamper(spark, tmp_path, index):
    rows = [(i, _prose(f"d{i}", 10 + i)) for i in range(1, 6)]
    cfg = _cfg(tmp_path, index)
    ingest.process_crawl_batch(
        spark.createDataFrame(rows, ["doc_id", "text"]), 0, cfg
    )
    ingest.read_ingest_packs(spark, cfg.dest_dir)  # clean: no raise

    # tamper: rewrite the stats with a wrong token total (collect first —
    # a self-overwrite would read the files it is replacing)
    rows = spark.read.parquet(f"{cfg.dest_dir}/pack_stats").collect()
    broken = spark.createDataFrame(
        [
            (r["n_packs"], r["n_docs"], r["n_segments"], r["n_tokens"] + 1,
             r["batch_id"])
            for r in rows
        ],
        "n_packs long, n_docs long, n_segments long, n_tokens long, "
        "batch_id string",
    )
    broken.write.mode("overwrite").parquet(f"{cfg.dest_dir}/pack_stats")
    with pytest.raises(ValueError, match="disagrees"):
        ingest.read_ingest_packs(spark, cfg.dest_dir)


def test_replay_idempotent_with_pack_stats(spark, tmp_path, index):
    """A replayed epoch rewrites its packs AND its pack_stats row under the
    same dynamic-partition-overwrite contract — the verifying read stays
    green and totals are unchanged."""
    rows = [(i, _prose(f"d{i}", 10 + i)) for i in range(1, 6)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = _cfg(tmp_path, index)
    ingest.process_crawl_batch(docs, 0, cfg)
    before = (
        ingest.read_ingest_packs(spark, cfg.dest_dir)
        .agg(F.sum("seg_tokens").alias("t"))
        .collect()[0]["t"]
    )
    ingest.process_crawl_batch(docs, 0, cfg)  # replay
    after_df = ingest.read_ingest_packs(spark, cfg.dest_dir)
    after = after_df.agg(F.sum("seg_tokens").alias("t")).collect()[0]["t"]
    assert before == after
    assert (
        spark.read.parquet(f"{cfg.dest_dir}/pack_stats").count() == 1
    )


def test_corpus_datasheet(spark):
    """r12: the one-call data card — stage_rows mirror accounting(), split
    volumetrics mirror the packed layout, the mixture section reflects the
    α-sampled distribution, and pii totals surface when redaction ran."""
    from kafka_connector_s3_sink_spark import pretraining
    from kafka_connector_s3_sink_spark.operators.text import LANGUAGE_PROFILES

    rows = []
    doc_id = 0
    for code, n in (("en", 30), ("de", 10)):
        words = LANGUAGE_PROFILES[code]
        for _ in range(n):
            toks = []
            for j, w in enumerate(words):
                toks.append(w)
                toks.append(f"u{code}{doc_id}x{j}")
            rows.append((doc_id, " ".join(toks) + " mail a@b.co"))
            doc_id += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = pretraining.PretrainingConfig(
        quality_floor=None,
        mixture_alpha=0.3,
        source_col="lang",
        derive_source_language=True,
        redact_pii=True,
        ctx_len=64,
        splits={"train": 1.0},
        seed="r12sheet",
    )
    res = pretraining.pretraining_pipeline(docs, config=cfg)
    try:
        sheet = {
            (r["section"], r["key"]): r["value"]
            for r in pretraining.corpus_datasheet(
                res, source_col="lang"
            ).collect()
        }
        # stage_rows mirror accounting()
        for name, count in res.accounting():
            assert sheet[("stage_rows", name)] == float(count)
        # split volumetrics mirror the packed frame
        n_tokens = res.packed.agg(
            F.sum("seg_tokens").alias("t")
        ).collect()[0]["t"]
        assert sheet[("split", "train:n_tokens")] == float(n_tokens)
        # mixture distribution present for both detected languages,
        # α-flattened (de upsampled, en downsampled)
        assert sheet[("mixture", "de")] > 10
        assert sheet[("mixture", "en")] < 30
        # every doc carries one planted email
        assert sheet[("pii", "n_pii_email")] == float(len(rows))
        # straddle section (r13) mirrors the shared _straddle_stats agg
        # (single split -> no pack can carry another split's segments)
        assert sheet[("straddle", "train:n_straddling_packs")] == 0.0
        assert sheet[("straddle", "train:n_hole_tokens")] == 0.0
    finally:
        res.unpersist()


def test_corpus_datasheet_straddle_matches_stats_table(spark, tmp_path):
    """r13: the datasheet's straddle section and write_packed_corpus's
    stats table come from ONE implementation — force a straddling pack
    with a 3-way split and pin the card against the written stats."""
    from kafka_connector_s3_sink_spark import pretraining

    rows = [
        (i, " ".join(f"s{i}w{j}" for j in range(20))) for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = pretraining.PretrainingConfig(
        quality_floor=None,
        ctx_len=64,
        splits={"train": 0.5, "val": 0.3, "test": 0.2},
        seed="r13straddle",
    )
    res = pretraining.pretraining_pipeline(docs, config=cfg)
    try:
        sheet = {
            (r["section"], r["key"]): r["value"]
            for r in pretraining.corpus_datasheet(res).collect()
        }
        dest = str(tmp_path / "corpus")
        pretraining.write_packed_corpus(res, dest, shards_per_split=2)
        stats = spark.read.parquet(f"{dest}/stats").collect()
        assert any(r["n_straddling_packs"] > 0 for r in stats)
        for r in stats:
            for m in ("n_straddling_packs", "n_hole_tokens"):
                assert sheet[("straddle", f"{r['split']}:{m}")] == float(
                    r[m]
                ), (r["split"], m)
    finally:
        res.unpersist()
