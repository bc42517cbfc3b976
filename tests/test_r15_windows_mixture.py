"""r15 (r14 ADVICE, high): `assemble_windows` with an UP-sampLED mixture.

The preset's final pre-packing stage — the documented `docs` input to
`assemble_windows` — carries one row per replica (duplicate doc_id,
distinct mix_epoch) whenever any mixture rate > 1, while mix_epoch is
never part of the pack key. The unguarded doc_id join fanned every
segment out to every replica row, multiplying pack_tokens by the replica
count and duplicating segments inside pack_window/pack_text. r14's tests
only exercised mixture=None; these pin the fix (reduce to the epoch-0
slice before joining) on both the heuristic and the BPE path.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark import pretraining as pt
from kafka_connector_s3_sink_spark.operators import tokenizer


def _prose(tag, n=18):
    stops = ["the", "and", "of", "to", "is"]
    return " ".join(w for i in range(n) for w in (stops[i % 5], f"{tag}{i}"))


@pytest.fixture(scope="module")
def mix_docs(spark):
    return spark.createDataFrame(
        [
            (i, _prose(f"m{i}", 8 + i), "src0" if i % 2 else "src1")
            for i in range(1, 9)
        ],
        ["doc_id", "text", "source"],
    )


def _cfg(**over):
    base = dict(
        quality_floor=None,
        domain_cap=None,
        mixture={"src0": 2.0, "src1": 1.0},
        ctx_len=48,
        splits={"train": 1.0},
    )
    base.update(over)
    return pt.PretrainingConfig(**base)


def test_upsampled_mixture_windows_heuristic(spark, mix_docs):
    res = pt.pretraining_pipeline(mix_docs, config=_cfg())
    try:
        mixture = res.stages["mixture"]
        # precondition: the pre-packing stage really carries replicas
        dup = (
            mixture.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        assert dup > 0, "mixture rate 2.0 must produce duplicate doc_id rows"
        win = pt.assemble_windows(res, mixture).collect()
        want = {
            r["pack_id"]: r["n"]
            for r in res.packed.groupBy("pack_id")
            .agg(F.sum("seg_tokens").alias("n"))
            .collect()
        }
        # pre-fix, replicated docs' segments joined every replica row and
        # pack_tokens read a multiple of the layout's seg_tokens sum
        assert {r["pack_id"]: r["pack_tokens"] for r in win} == want
        for r in win:
            assert len(r["pack_text"].split()) == r["pack_tokens"]
    finally:
        res.unpersist()


def test_upsampled_mixture_windows_bpe(spark, mix_docs):
    wf = tokenizer.word_frequencies(mix_docs)
    merges = tokenizer.fit_bpe(wf, n_merges=20)
    res = pt.pretraining_pipeline(
        mix_docs, config=_cfg(bpe_merges=tuple(merges))
    )
    try:
        win = pt.assemble_windows(res, res.stages["mixture"]).collect()
        assert win
        assert all(r["n_bad_segments"] == 0 for r in win)
        assert all(r["pack_tokens"] == r["layout_tokens"] for r in win)
        assert sum(r["pack_tokens"] for r in win) == (
            res.packed.agg(F.sum("seg_tokens")).collect()[0][0]
        )
    finally:
        res.unpersist()


def test_replica_free_docs_unchanged(spark, mix_docs):
    # no mixture: the guard is a no-op (mix_epoch absent from the stage
    # frames) and the r14 behavior is untouched
    res = pt.pretraining_pipeline(mix_docs, config=_cfg(mixture=None))
    try:
        win = pt.assemble_windows(res, mix_docs).collect()
        assert sum(r["pack_tokens"] for r in win) == (
            res.packed.agg(F.sum("seg_tokens")).collect()[0][0]
        )
    finally:
        res.unpersist()
