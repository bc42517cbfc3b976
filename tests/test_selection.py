"""DSIR importance resampling: hand-computed weights, target-likeness,
determinism, and a DuckDB twin of the full chain (the same contract the
driver's oracle gate checks at sf0.01)."""

import hashlib
import math

import pytest

from kafka_connector_s3_sink_spark.operators.selection import (
    dsir_log_weights,
    dsir_resample,
    hashed_gram_buckets,
)


def _grams(text):
    toks = text.lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(gram, n_buckets, seed="dsir"):
    h = hashlib.md5(f"{seed}:{gram}".encode()).hexdigest()
    return int(h[:6], 16) % n_buckets


def _gumbel(doc_id, seed="dsir-gumbel"):
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    u = (int(h[:13], 16) + 0.5) / 4503599627370496.0
    return -math.log(-math.log(u))


def _expected_weights(raw, target, n_buckets, smoothing=1.0):
    from collections import Counter

    cp = Counter(_bucket(g, n_buckets) for _, t in target for g in _grams(t))
    cq = Counter(_bucket(g, n_buckets) for _, t in raw for g in _grams(t))
    tp, tq = sum(cp.values()), sum(cq.values())
    a, m = smoothing, float(n_buckets)
    out = {}
    for doc_id, text in raw:
        gs = _grams(text)
        if not gs:
            continue
        lw = sum(
            math.log((cp.get(_bucket(g, n_buckets), 0) + a) / (tp + a * m))
            - math.log((cq.get(_bucket(g, n_buckets), 0) + a) / (tq + a * m))
            for g in gs
        )
        out[doc_id] = (len(gs), lw)
    return out


RAW = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "click here buy now cheap deals click here"),
    (2, "a measured essay on the history of science"),
    (3, ""),
    (4, "buy cheap now"),
]
TARGET = [
    (100, "an essay on the philosophy of science and history"),
    (101, "the fox and the dog in classic literature"),
]


def test_hashed_gram_buckets_matches_python(spark):
    df = spark.createDataFrame(RAW, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.bucket)
        for r in hashed_gram_buckets(df, n_buckets=64).collect()
    )
    want = sorted(
        (doc_id, _bucket(g, 64)) for doc_id, t in RAW for g in _grams(t)
    )
    assert got == want


def test_log_weights_hand_computed(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    rows = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_log_weights(raw, tgt, n_buckets=64).collect()
    }
    want = _expected_weights(RAW, TARGET, 64)
    assert set(rows) == set(want)  # doc 3 (empty) absent from both
    assert 3 not in rows
    for doc_id, (n, lw) in want.items():
        assert rows[doc_id][0] == n
        assert rows[doc_id][1] == pytest.approx(lw, rel=1e-12)


def test_target_likeness_ranking(spark):
    # Docs sharing the target's vocabulary outscore spam; with 10k buckets
    # there are no collisions among this tiny vocabulary, so the ordering
    # is the exact-n-gram DSIR ordering.
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    w = {
        r.doc_id: r.log_weight / r.n_grams
        for r in dsir_log_weights(raw, tgt, n_buckets=10000).collect()
    }
    assert w[2] > w[1]  # essay beats spam
    assert w[0] > w[4]  # fox/dog doc beats "buy cheap now"


def test_resample_deterministic_and_gumbel_exact(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    sel1 = dsir_resample(raw, tgt, k=2, n_buckets=64).collect()
    sel2 = dsir_resample(raw, tgt, k=2, n_buckets=64).collect()
    assert [r.doc_id for r in sel1] == [r.doc_id for r in sel2]
    want = _expected_weights(RAW, TARGET, 64)
    scored = sorted(
        ((lw + _gumbel(d), d) for d, (_, lw) in want.items()), reverse=True
    )
    assert sorted(r.doc_id for r in sel1) == sorted(d for _, d in scored[:2])
    by_id = {r.doc_id: r.select_score for r in sel1}
    for _, d in scored[:2]:
        assert by_id[d] == pytest.approx(want[d][1] + _gumbel(d), rel=1e-12)


def test_resample_keeps_raw_columns_and_validates(spark):
    raw = spark.createDataFrame(
        [(i, f"text {i}", f"src{i % 2}") for i in range(6)],
        ["doc_id", "text", "source"],
    )
    tgt = spark.createDataFrame([(9, "text 1")], ["doc_id", "text"])
    out = dsir_resample(raw, tgt, k=3, n_buckets=64)
    assert {"doc_id", "text", "source", "n_grams", "log_weight", "select_score"} == set(
        out.columns
    )
    assert out.count() == 3
    with pytest.raises(ValueError):
        dsir_resample(raw, tgt, k=0)
    with pytest.raises(ValueError):
        dsir_log_weights(raw, tgt, smoothing=0.0)


def test_duckdb_twin_full_chain(spark):
    """The exact SQL the oracle gate runs, executed in DuckDB over the same
    rows: per-doc weights agree to 1e-9 and the Gumbel top-k set matches."""
    duckdb = pytest.importorskip("duckdb")
    tgt_filter = "doc_id >= 100"
    both = RAW + TARGET
    df = spark.createDataFrame(both, ["doc_id", "text"])
    spark_sel = dsir_resample(
        df.filter("doc_id < 100"),
        df.filter(tgt_filter),
        k=3,
        n_buckets=64,
    ).collect()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{t}')" for d, t in both)
        + ") t(doc_id, text)"
    )
    sql = """
    WITH tk AS (
        SELECT doc_id,
            CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                 ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
            END AS toks
        FROM docs
    ),
    grams AS (
        SELECT doc_id, toks[i] AS gram
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM tk)
        UNION ALL
        SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tk)
    ),
    hashed AS (
        SELECT doc_id,
            CAST('0x' || substr(md5('dsir:' || gram), 1, 6) AS BIGINT) % 64
                AS bucket
        FROM grams
    ),
    p AS (SELECT bucket, count(*) AS cp FROM hashed WHERE doc_id >= 100 GROUP BY 1),
    q AS (SELECT bucket, count(*) AS cq FROM hashed WHERE doc_id < 100 GROUP BY 1),
    tot AS (
        SELECT (SELECT CAST(sum(cp) AS DOUBLE) FROM p) AS tp,
               (SELECT CAST(sum(cq) AS DOUBLE) FROM q) AS tq
    ),
    w AS (
        SELECT h.doc_id, count(*) AS n_grams,
            sum(ln((coalesce(cp, 0) + 1.0) / (tp + 1.0 * 64))
              - ln((coalesce(cq, 0) + 1.0) / (tq + 1.0 * 64))) AS log_weight
        FROM hashed h
        LEFT JOIN p USING (bucket) LEFT JOIN q USING (bucket)
        CROSS JOIN tot
        WHERE h.doc_id < 100
        GROUP BY 1
    )
    SELECT doc_id, n_grams, log_weight,
        log_weight - ln(-ln((CAST('0x' ||
            substr(md5('dsir-gumbel:' || CAST(doc_id AS VARCHAR)), 1, 13)
        AS BIGINT) + 0.5) / 4503599627370496.0)) AS select_score
    FROM w
    ORDER BY select_score DESC, doc_id
    LIMIT 3
    """
    duck = con.execute(sql).fetchall()
    got = sorted((r.doc_id, r.n_grams) for r in spark_sel)
    want = sorted((r[0], r[1]) for r in duck)
    assert got == want
    duck_scores = {r[0]: r[3] for r in duck}
    for r in spark_sel:
        assert r.select_score == pytest.approx(duck_scores[r.doc_id], abs=1e-9)


def test_persisted_model_matches_inmemory_and_is_o_batch(spark, tmp_path):
    """persist + dsir_score_batch == dsir_log_weights bit-for-bit; the
    scoring plan reads only the tiny model tables (no scan of the raw
    corpus path), and params round-trip pins seed/buckets/smoothing."""
    from kafka_connector_s3_sink_spark.operators.selection import (
        dsir_score_batch,
        persist_dsir_model,
    )

    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    path = str(tmp_path / "dsirmodel")
    persist_dsir_model(tgt, raw, path, n_buckets=64, smoothing=0.5)

    batch = spark.createDataFrame(RAW[:3], ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_score_batch(batch, path).collect()
    }
    # ground truth: the in-memory chain over the FULL raw corpus (the same
    # q the model persisted), restricted to the batch's docs
    want = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_log_weights(
            raw, tgt, n_buckets=64, smoothing=0.5
        ).collect()
        if r.doc_id in got
    }
    assert set(got) == {0, 1, 2} == set(want)
    for d in got:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-12)
    # scoring reads ONLY the persisted model files — the raw corpus that fit
    # q is never rescanned (the O(batch) contract)
    files = dsir_score_batch(batch, path).inputFiles()
    assert files and all("dsirmodel" in f for f in files)
    assert any("/p/" in f for f in files) and any("/q/" in f for f in files)
