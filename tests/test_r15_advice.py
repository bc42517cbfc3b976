"""r15: the three low r14 ADVICE items.

1. `bpe_vocab_ids` must build its character inventory codepoint-wise
   (matching `_encode_word`'s `list(word)` symbol model) — the JVM
   `split(word, '')` cut UTF-16 code units, entering non-BMP characters
   as surrogate halves the encoder never emits, so emoji/rare-CJK seen at
   fit time still mapped to UNK.
2. Two merges can produce the same surface string; the vocab keeps the
   first occurrence so id<->token stays a bijection.
3. The ingest's per-epoch `merges.json` write must refuse a config whose
   bpe_merges changed since the artifact was persisted (earlier epochs
   would silently assemble under the new list).
"""

import pytest

from kafka_connector_s3_sink_spark.operators import incremental
from kafka_connector_s3_sink_spark.operators import tokenizer as tok
from kafka_connector_s3_sink_spark.streaming import ingest

EMOJI = chr(0x1F389)  # non-BMP: a surrogate pair in UTF-16


def test_non_bmp_chars_get_real_ids(spark):
    docs = spark.createDataFrame(
        [(1, f"{EMOJI}party {EMOJI}party go go")],
        "doc_id long, text string",
    )
    wf = tok.word_frequencies(docs)
    merges = tok.fit_bpe(wf, n_merges=4)
    vocab = tok.bpe_vocab_ids(wf, merges)
    # the emoji enters as ONE code point, never as surrogate halves
    assert EMOJI in vocab
    assert not any(
        "\ud800" <= ch <= "\udfff" for v in vocab for ch in v
    )
    # everything in this text was seen at fit time -> zero UNK ids
    row = tok.bpe_encode_ids(docs, merges, vocab).collect()[0]
    assert row["token_ids"] and 0 not in row["token_ids"]
    assert tok.bpe_decode_ids(row["token_ids"], vocab) == (
        f"{EMOJI}party {EMOJI}party go go"
    )


def test_duplicate_merge_products_keep_bijection(spark):
    wf = tok.word_frequencies(
        spark.createDataFrame([(1, "abc abc cab")], "doc_id long, text string")
    )
    # hand-built: ('ab','c') and ('a','bc') share the surface string 'abc'
    merges = [("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc")]
    vocab = tok.bpe_vocab_ids(wf, merges)
    assert vocab.count("abc") == 1
    assert len(set(vocab)) == len(vocab)
    # first occurrence wins: 'abc' sits at the ('ab','c') merge's slot
    assert vocab.index("abc") < len(vocab) - 1 or vocab[-1] == "abc"
    base = 1 + len("abc") + 1  # <unk> + chars(a,b,c) + </w>
    assert vocab[base:] == ["ab", "bc", "abc"]


# --- item 3: frozen-merges enforcement on the ingest ladder

PREFIX = "r15adv"


def _prose(tag, n=10):
    stops = ["the", "and", "of", "to", "is"]
    return " ".join(w for i in range(n) for w in (stops[i % 5], f"{tag}{i}"))


@pytest.fixture()
def index(spark, tmp_path):
    loc = str(tmp_path / "index")
    base = spark.createDataFrame(
        [(9999, _prose("hist", 25))], ["doc_id", "text"]
    )
    incremental.build_dedup_index(base, PREFIX, loc, num_buckets=2)
    yield loc
    incremental.drop_dedup_index(spark, PREFIX)


def _cfg(tmp_path, loc, merges):
    return ingest.IngestConfig(
        index_prefix=PREFIX,
        index_location=loc,
        dest_dir=str(tmp_path / "out"),
        checkpoint_location=str(tmp_path / "ckpt"),
        num_buckets=2,
        ctx_len=48,
        split_weights={"train": 1.0},
        bpe_merges=tuple(merges),
    )


def test_changed_merges_between_epochs_refused(spark, tmp_path, index):
    fit_docs = spark.createDataFrame(
        [(0, _prose("fit", 30))], ["doc_id", "text"]
    )
    wf = tok.word_frequencies(fit_docs)
    merges_a = tok.fit_bpe(wf, n_merges=12)
    merges_b = tok.fit_bpe(wf, n_merges=6)
    assert merges_a != merges_b

    docs0 = spark.createDataFrame(
        [(i, _prose(f"e0d{i}", 8 + i)) for i in range(1, 4)],
        ["doc_id", "text"],
    )
    cfg_a = _cfg(tmp_path, index, merges_a)
    ingest.process_crawl_batch(docs0, 0, cfg_a)

    docs1 = spark.createDataFrame(
        [(100 + i, _prose(f"e1d{i}", 8 + i)) for i in range(1, 4)],
        ["doc_id", "text"],
    )
    # a different frozen list is refused BEFORE any write of epoch 1
    with pytest.raises(ValueError, match="bpe_merges differs"):
        ingest.process_crawl_batch(docs1, 1, _cfg(tmp_path, index, merges_b))
    stats = spark.read.parquet(f"{cfg_a.dest_dir}/pack_stats")
    assert stats.select("batch_id").distinct().count() == 1  # epoch 0 only

    # the identical frozen list proceeds (epoch 1) and a replay of an
    # earlier epoch under it stays idempotent
    ingest.process_crawl_batch(docs1, 1, cfg_a)
    ingest.process_crawl_batch(docs0, 0, cfg_a)
    assert tok.load_merges(
        f"{cfg_a.dest_dir}/tokenizer/merges.json"
    ) == merges_a
    win = ingest.read_ingest_windows(spark, cfg_a.dest_dir).collect()
    assert win and all(r["n_bad_segments"] == 0 for r in win)
