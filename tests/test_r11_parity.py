"""Round-11 preset ↔ streaming-ingest parity pin (VERDICT r10 item 2).

``pretraining.pretraining_pipeline`` and ``streaming.ingest.
process_crawl_batch`` implement the same quality → dedup → decontam ladder
with separately-written stage orders. These tests pin the contract:

1. On a corpus that exercises every shared stage (quality floor, exact
   dup, near dup, out-of-cluster benchmark leak), the ADMITTED doc-id sets
   are IDENTICAL — the two flagship paths cannot drift silently.
2. The one documented ordering divergence — ingest decontaminates BEFORE
   the cascade, the preset AFTER — is pinned at its edge: a leak that is
   also a near-dup cluster's canonical. Ingest sheds the leak first and
   re-canonicalizes around it (precise: only actual leaks die); the preset
   crowns the leak canonical, then sheds it, taking the whole cluster with
   it (conservative: near-dups of leaks die too). Both are defensible;
   neither may change silently.
"""

import hashlib

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

PREFIX = "r11par"


def _prose(tag, n=20):
    """Stopword-laced unique-token prose (clears the 0.2 quality floor,
    shares no 3-shingle across tags)."""
    stops = ["the", "and", "of", "to", "is"]
    return " ".join(
        w for i in range(n) for w in (stops[i % 5], f"{tag}{i}")
    )


G1 = _prose("g1")                      # admitted
GIB = "@@!! ##$$ %%^^ &&**"            # quality floor
NEAR = G1.replace("g110", "changed")   # near-dup of G1 (3 shingles differ)
B1 = _prose("b1")                      # the eval-suite doc
LEAK = B1 + " " + _prose("x5", 3)      # contains all of B1's shingles
G2 = _prose("g6")                      # admitted

CORPUS = [(1, G1), (2, GIB), (3, G1), (4, NEAR), (5, LEAK), (6, G2)]
EXPECT = {1, 6}

KNOBS = dict(
    jaccard_threshold=0.8,
    decontam_overlap=0.5,
    near_decontam_jaccard=0.5,
)


def _run_preset(spark, rows, bench_rows, span_tokens=50):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame(bench_rows, ["doc_id", "text"])
    cfg = pretraining.PretrainingConfig(
        quality_floor=0.2,
        span_tokens=span_tokens,
        splits={"train": 1.0},
        ctx_len=64,
        seed="r11parity",
        **KNOBS,
    )
    res = pretraining.pretraining_pipeline(docs, benchmark=bench, config=cfg)
    try:
        return {
            r["doc_id"]
            for r in res.packed.select("doc_id").distinct().collect()
        }
    finally:
        res.unpersist()


def _run_ingest(spark, tmp_path, rows, bench_rows):
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(bench_rows, ["doc_id", "text"]).write.mode(
        "overwrite"
    ).parquet(bench_path)
    loc = str(tmp_path / "index")
    # unrelated 1-doc history so the incremental stage classifies nothing
    # as a historical dup (the preset has no history — epoch-exclusion
    # semantics are the documented asymmetry this fixture avoids)
    base = spark.createDataFrame([(9999, _prose("hist", 25))], ["doc_id", "text"])
    incremental.build_dedup_index(base, PREFIX, loc, num_buckets=2)
    cfg = ingest.IngestConfig(
        index_prefix=PREFIX,
        index_location=loc,
        dest_dir=str(tmp_path / "out"),
        checkpoint_location=str(tmp_path / "ckpt"),
        num_buckets=2,
        ctx_len=64,
        split_weights={"train": 1.0},
        min_quality=0.2,
        benchmark_path=bench_path,
        **KNOBS,
    )
    try:
        batch = spark.createDataFrame(rows, ["doc_id", "text"])
        ingest.process_crawl_batch(batch, 0, cfg)
        out = spark.read.parquet(f"{cfg.dest_dir}/documents")
        return {r["doc_id"] for r in out.select("doc_id").collect()}
    finally:
        incremental.drop_dedup_index(spark, PREFIX)


def test_preset_ingest_admitted_sets_agree(spark, tmp_path):
    """Same corpus, same knobs → same admitted ids through both flagship
    paths (quality floor, exact dup, near dup, and an out-of-cluster leak
    each shed exactly once, on both sides)."""
    bench = [(100, B1)]
    preset_ids = _run_preset(spark, CORPUS, bench)
    ingest_ids = _run_ingest(spark, tmp_path, CORPUS, bench)
    assert preset_ids == EXPECT
    assert ingest_ids == EXPECT


def test_decontam_order_divergence_pinned(spark, tmp_path):
    """The documented edge where the ladders legitimately differ: the leak
    IS the near-dup cluster's canonical (min id). Ingest decontaminates
    first → the clean near-dup survives as the new canonical; the preset
    cascades first → the leak wins canonicality, decontam then removes it,
    and the whole cluster's content is gone. Pinned so the divergence can
    never drift silently into something else."""
    P = _prose("pp", 75)               # 150 shared tokens → jaccard ≈ 0.86
    B2 = _prose("b2", 5)
    e_leak = P + " " + B2              # id 10: leak AND cluster canonical
    e_clean = P + " " + _prose("tt", 5)  # id 11: near-dup of the leak
    rows = [(10, e_leak), (11, e_clean)]
    bench = [(200, B2)]
    # span_tokens > |P| so the preset-only span surgery can't touch the
    # shared prefix — this pin is about decontam ORDER, nothing else
    preset_ids = _run_preset(spark, rows, bench, span_tokens=1000)
    ingest_ids = _run_ingest(spark, tmp_path, rows, bench)
    assert ingest_ids == {11}   # precise: only the actual leak dies
    assert preset_ids == set()  # conservative: the leak's cluster dies too


def test_bpe_pack_geometry_parity(spark, tmp_path):
    """r12 (VERDICT r11 item 2): tokenizer-true packing on BOTH ladders —
    ``IngestConfig.bpe_merges`` mirrors ``PretrainingConfig.bpe_merges``, so
    on a shared corpus the two trainer-facing pack layouts agree on
    geometry: pack count AND the multiset of per-pack token budgets.
    Concat-and-chunk is order-invariant in totals (identical BPE token
    counts → identical budgets whatever the stream order), so the pin holds
    even though the ladders hash different packing identities. Both are
    checked against the independently-computed true-BPE expectation, not
    just against each other — a ladder silently falling back to the
    whitespace heuristic (~6x fewer tokens here) fails loudly."""
    import math

    from kafka_connector_s3_sink_spark.operators import tokenizer

    merges = (("t", "h"), ("th", "e"), ("the", "</w>"))
    ctx = 64
    rows = [(i, _prose(f"d{i}", 10 + i)) for i in range(1, 7)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    enc = tokenizer.bpe_encode(docs, list(merges))
    total = enc.agg(F.sum("n_tokens").alias("t")).collect()[0]["t"]
    ws_total = sum(len(t.split()) for _, t in rows)
    assert total > 2 * ws_total  # BPE budgets, not the whitespace heuristic
    k = math.ceil(total / ctx)
    expected = sorted([ctx] * (k - 1) + [total - ctx * (k - 1)])
    assert k > 1

    cfg = pretraining.PretrainingConfig(
        quality_floor=0.2,
        splits={"train": 1.0},
        ctx_len=ctx,
        seed="r11parity",
        bpe_merges=merges,
        **KNOBS,
    )
    res = pretraining.pretraining_pipeline(docs, config=cfg)
    try:
        preset_budgets = sorted(
            r["budget"]
            for r in res.packed.groupBy("pack_id")
            .agg(F.sum("seg_tokens").alias("budget"))
            .collect()
        )
    finally:
        res.unpersist()
    assert preset_budgets == expected

    loc = str(tmp_path / "index_bpe")
    base = spark.createDataFrame(
        [(9999, _prose("hist", 25))], ["doc_id", "text"]
    )
    incremental.build_dedup_index(base, PREFIX + "bpe", loc, num_buckets=2)
    try:
        icfg = ingest.IngestConfig(
            index_prefix=PREFIX + "bpe",
            index_location=loc,
            dest_dir=str(tmp_path / "out_bpe"),
            checkpoint_location=str(tmp_path / "ckpt_bpe"),
            num_buckets=2,
            ctx_len=ctx,
            split_weights={"train": 1.0},
            min_quality=0.2,
            bpe_merges=merges,
            **KNOBS,
        )
        ingest.process_crawl_batch(docs, 0, icfg)
        packs = spark.read.parquet(f"{icfg.dest_dir}/packs")
        ingest_budgets = sorted(
            r["budget"]
            for r in packs.groupBy("pack_id")
            .agg(F.sum("seg_tokens").alias("budget"))
            .collect()
        )
    finally:
        incremental.drop_dedup_index(spark, PREFIX + "bpe")
    assert ingest_budgets == expected
