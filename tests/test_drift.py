"""Corpus drift monitoring (`operators/drift.py`): PSI/KL/TVD between two
snapshots — identical corpora read ~0, a planted shift crosses the industry
PSI threshold, outliers clamp to edge buckets, and the whole report is one
aggregation shuffle."""

import pytest
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.operators import drift


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "word " * (10 + i % 20)) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _report(base, cur):
    return {
        r["feature"]: r
        for r in drift.drift_report(
            base, cur, drift.text_drift_features()
        ).collect()
    }


def test_identical_snapshots_read_stable(docs):
    rep = _report(docs, docs)
    assert set(rep) == {"text_chars", "text_words", "digit_ratio"}
    for r in rep.values():
        assert r["psi"] == 0.0 and r["kl"] == 0.0 and r["tvd"] == 0.0
        assert r["n_base"] == r["n_cur"] == 200


def test_planted_shift_crosses_psi_threshold(docs):
    shifted = docs.select(
        "doc_id", F.concat(F.col("text"), F.col("text"), F.col("text")).alias("text")
    )
    rep = _report(docs, shifted)
    # tripled text: length/word distributions move whole buckets -> PSI in
    # the "shifted" regime (>0.25); digit density is unchanged
    assert rep["text_chars"]["psi"] > 0.25
    assert rep["text_words"]["psi"] > 0.25
    assert rep["digit_ratio"]["psi"] == 0.0
    assert rep["text_words"]["tvd"] > 0.5


def test_outliers_clamp_to_edge_buckets(spark):
    base = spark.createDataFrame(
        [(0, "x " * 50)], "doc_id long, text string"
    )
    cur = spark.createDataFrame(
        [(0, "x " * 100000)], "doc_id long, text string"  # way past hi=2000
    )
    rep = _report(base, cur)
    # the monster doc lands in the top bucket (registered, not dropped)
    assert rep["text_chars"]["psi"] > 0
    assert rep["text_chars"]["n_cur"] == 1


def test_report_is_one_corpus_shuffle(docs):
    plan = (
        drift.drift_report(docs, docs, drift.text_drift_features())
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus-sized aggregation shuffles once; everything after runs on
    # the (feature x bucket) frame. Count DISTINCT exchanges (reused
    # subtrees reprint) on corpus-scale keys: feature/bucket grouping.
    import re

    ids = set(re.findall(r"Exchange hashpartitioning\(feature", plan))
    assert len(ids) <= 2  # (feature,bucket) agg + (feature) totals agg


def test_empty_features_raise(docs):
    with pytest.raises(ValueError):
        drift.drift_report(docs, docs, [])
