"""r15 (VERDICT items 1+3): the integer-id trainer handoff is
destination-complete, and the lowercase stamp travels with the corpus.

Both ladders persist the frozen vocab beside the merges
(`<dest>/tokenizer/vocab.json`), `read_ingest_windows(ids=True)` /
`assemble_windows(ids=True)` return `pack_ids` via the PERSISTED vocab,
a missing vocab raises a named ValueError like the missing-merges path,
and `pack_stats`/`stats` stamp `lowercase` so the readers route on it
(mixed stamps refuse instead of assembling half the corpus wrong).
"""

import pytest
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark import pretraining as pt
from kafka_connector_s3_sink_spark.operators import incremental
from kafka_connector_s3_sink_spark.operators import tokenizer as tok
from kafka_connector_s3_sink_spark.streaming import ingest

# Long-running e2e/preset suite: excluded from the default pytest
# selection (pytest.ini addopts -m "not slow") so the routine gate
# finishes inside a CI window; run the full suite with
#   python -m pytest tests/ -m "slow or not slow"
pytestmark = pytest.mark.slow

PREFIX = "r15ids"


def _prose(tag, n=10):
    stops = ["the", "and", "of", "to", "is"]
    return " ".join(w for i in range(n) for w in (stops[i % 5], f"{tag}{i}"))


def _epoch_docs(spark, epoch, n=4):
    return spark.createDataFrame(
        [
            (100 * epoch + i, _prose(f"e{epoch}d{i}", 8 + i))
            for i in range(1, n + 1)
        ],
        ["doc_id", "text"],
    )


@pytest.fixture(scope="module")
def frozen(spark):
    """(merges, vocab) fit on the union of every doc the tests ingest —
    zero UNK ids by construction."""
    fit_docs = _epoch_docs(spark, 0).unionByName(_epoch_docs(spark, 1))
    wf = tok.word_frequencies(fit_docs)
    merges = tok.fit_bpe(wf, n_merges=25)
    return merges, tok.bpe_vocab_ids(wf, merges)


@pytest.fixture()
def index(spark, tmp_path):
    loc = str(tmp_path / "index")
    base = spark.createDataFrame(
        [(9999, _prose("hist", 25))], ["doc_id", "text"]
    )
    incremental.build_dedup_index(base, PREFIX, loc, num_buckets=2)
    yield loc
    incremental.drop_dedup_index(spark, PREFIX)


def _cfg(tmp_path, loc, **over):
    base = dict(
        index_prefix=PREFIX,
        index_location=loc,
        dest_dir=str(tmp_path / "out"),
        checkpoint_location=str(tmp_path / "ckpt"),
        num_buckets=2,
        ctx_len=48,
        split_weights={"train": 1.0},
    )
    base.update(over)
    return ingest.IngestConfig(**base)


def test_ingest_id_windows_are_destination_complete(
    spark, tmp_path, index, frozen
):
    merges, vocab = frozen
    cfg = _cfg(
        tmp_path, index, bpe_merges=tuple(merges), bpe_vocab=tuple(vocab)
    )
    for epoch in range(2):
        ingest.process_crawl_batch(_epoch_docs(spark, epoch), epoch, cfg)
    # both artifacts landed beside the corpus
    assert tok.load_merges(f"{cfg.dest_dir}/tokenizer/merges.json") == merges
    assert tok.load_vocab(f"{cfg.dest_dir}/tokenizer/vocab.json") == vocab
    # lowercase stamped (True — the hard default the writer encoded with)
    stats = spark.read.parquet(f"{cfg.dest_dir}/pack_stats")
    assert {r["lowercase"] for r in stats.collect()} == {True}
    # ids=True: pack_ids via the PERSISTED vocab, parity with the string
    # window (itself pinned against a direct encode by the r14 tests)
    win = ingest.read_ingest_windows(spark, cfg.dest_dir, ids=True).collect()
    assert win and all(r["n_bad_segments"] == 0 for r in win)
    idmap = {t: i for i, t in enumerate(vocab)}
    for r in win:
        assert r["pack_ids"] == [idmap[t] for t in r["pack_window"]]
        assert 0 not in r["pack_ids"]  # vocab fit on this corpus: no UNK
        # decode round-trips the window text through ids alone
        assert tok.bpe_decode_ids(r["pack_ids"], vocab) == r["pack_text"]
    # ids=False keeps the r14 shape untouched
    plain = ingest.read_ingest_windows(spark, cfg.dest_dir)
    assert "pack_ids" not in plain.columns


def test_missing_vocab_is_named(spark, tmp_path, index, frozen):
    merges, _ = frozen
    cfg = _cfg(tmp_path, index, bpe_merges=tuple(merges))  # no vocab
    ingest.process_crawl_batch(_epoch_docs(spark, 0), 0, cfg)
    with pytest.raises(ValueError, match="no persisted vocab"):
        ingest.read_ingest_windows(spark, cfg.dest_dir, ids=True)
    # the string windows still assemble fine
    win = ingest.read_ingest_windows(spark, cfg.dest_dir).collect()
    assert win and all(r["n_bad_segments"] == 0 for r in win)


def test_heuristic_corpus_refuses_ids(spark, tmp_path, index):
    cfg = _cfg(tmp_path, index)
    ingest.process_crawl_batch(_epoch_docs(spark, 0), 0, cfg)
    with pytest.raises(ValueError, match="token_mode"):
        ingest.read_ingest_windows(spark, cfg.dest_dir, ids=True)


def test_vocab_without_merges_rejected(spark, tmp_path, index, frozen):
    _, vocab = frozen
    cfg = _cfg(tmp_path, index, bpe_vocab=tuple(vocab))
    with pytest.raises(ValueError, match="requires bpe_merges"):
        ingest.process_crawl_batch(_epoch_docs(spark, 0), 0, cfg)


def test_changed_vocab_between_epochs_refused(spark, tmp_path, index, frozen):
    merges, vocab = frozen
    cfg = _cfg(
        tmp_path, index, bpe_merges=tuple(merges), bpe_vocab=tuple(vocab)
    )
    ingest.process_crawl_batch(_epoch_docs(spark, 0), 0, cfg)
    tampered = _cfg(
        tmp_path,
        index,
        bpe_merges=tuple(merges),
        bpe_vocab=tuple(vocab[:-1]),
    )
    with pytest.raises(ValueError, match="bpe_vocab differs"):
        ingest.process_crawl_batch(_epoch_docs(spark, 1), 1, tampered)
    # the identical frozen pair replays fine
    ingest.process_crawl_batch(_epoch_docs(spark, 1), 1, cfg)


def test_mixed_lowercase_stamp_refused(spark, tmp_path, index, frozen):
    merges, _ = frozen
    cfg = _cfg(tmp_path, index, bpe_merges=tuple(merges))
    for epoch in range(2):
        ingest.process_crawl_batch(_epoch_docs(spark, epoch), epoch, cfg)
    path = f"{cfg.dest_dir}/pack_stats"
    df = spark.read.parquet(path)
    e1 = ingest._epoch_batch_id(1)
    flipped = df.withColumn(
        "lowercase",
        F.when(F.col("batch_id") == e1, F.lit(False)).otherwise(
            F.col("lowercase")
        ),
    )
    rows, schema = flipped.collect(), flipped.schema
    spark.createDataFrame(rows, schema).write.mode("overwrite").partitionBy(
        "batch_id"
    ).parquet(path)
    with pytest.raises(ValueError, match="different token models"):
        ingest.read_ingest_windows(spark, cfg.dest_dir)
    # epoch-scoped reads still route under each epoch's own stamp
    e0 = ingest._epoch_batch_id(0)
    w0 = ingest.read_ingest_windows(spark, cfg.dest_dir, batch_id=e0)
    assert all(r["n_bad_segments"] == 0 for r in w0.collect())


# --- preset ladder


def test_preset_id_windows_and_artifacts(spark, tmp_path, frozen):
    merges, vocab = frozen
    docs = _epoch_docs(spark, 0, n=8)
    res = pt.pretraining_pipeline(
        docs,
        config=pt.PretrainingConfig(
            quality_floor=None,
            domain_cap=None,
            mixture=None,
            ctx_len=48,
            splits={"train": 1.0},
            bpe_merges=tuple(merges),
            bpe_vocab=tuple(vocab),
        ),
    )
    try:
        dest = str(tmp_path / "corpus")
        pt.write_packed_corpus(res, dest)
        assert tok.load_vocab(f"{dest}/tokenizer/vocab.json") == vocab
        stats = spark.read.parquet(f"{dest}/stats").collect()
        assert {r["lowercase"] for r in stats} == {True}
        win = pt.assemble_windows(res, docs, ids=True).collect()
        assert win and all(r["n_bad_segments"] == 0 for r in win)
        idmap = {t: i for i, t in enumerate(vocab)}
        for r in win:
            assert r["pack_ids"] == [idmap[t] for t in r["pack_window"]]
            assert tok.bpe_decode_ids(r["pack_ids"], vocab) == r["pack_text"]
    finally:
        res.unpersist()


def test_preset_ids_refusals(spark, frozen):
    merges, vocab = frozen
    docs = _epoch_docs(spark, 0, n=6)
    with pytest.raises(ValueError, match="requires bpe_merges"):
        pt.pretraining_pipeline(
            docs, config=pt.PretrainingConfig(bpe_vocab=tuple(vocab))
        )
    lean = dict(
        quality_floor=None,
        domain_cap=None,
        mixture=None,
        ctx_len=48,
        splits={"train": 1.0},
    )
    res = pt.pretraining_pipeline(
        docs, config=pt.PretrainingConfig(**lean, bpe_merges=tuple(merges))
    )
    try:
        with pytest.raises(ValueError, match="no bpe_vocab"):
            pt.assemble_windows(res, docs, ids=True)
    finally:
        res.unpersist()
    res_h = pt.pretraining_pipeline(docs, config=pt.PretrainingConfig(**lean))
    try:
        with pytest.raises(ValueError, match="no id inventory"):
            pt.assemble_windows(res_h, docs, ids=True)
    finally:
        res_h.unpersist()
