"""r13: pack assembly — the end-to-end slice-correctness gate.

`packing.assemble_packs` materializes each training pack's token window
from the packed segment map. Nothing previously verified that
`pack_sequences`' (doc_offset, seg_tokens) actually address the right
tokens end-to-end; these invariants (plus the `assemble` branch of the
`pipeline_pack_split` driver entry, which DuckDB-replays the full
reconstruction) close that.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.operators import packing

CTX = 32


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, " ".join(f"d{i}w{j}" for j in range(5 + 7 * i)))
        for i in range(1, 9)
    ]
    return rows, spark.createDataFrame(rows, ["doc_id", "text"])


def test_assembled_packs_reconstruct_the_corpus(spark, corpus):
    rows, docs = corpus
    packed = packing.pack_sequences(docs, ctx_len=CTX)
    asm = packing.assemble_packs(packed, docs).collect()

    total = sum(len(t.split()) for _, t in rows)
    # every pack is exactly CTX full except the final one, which carries
    # the remainder; the window ids tile 0..k-1 with no gaps
    by_id = {r["pack_id"]: r for r in asm}
    k = len(by_id)
    assert sorted(by_id) == list(range(k))
    assert sum(r["pack_tokens"] for r in asm) == total
    for pid in range(k - 1):
        assert by_id[pid]["pack_tokens"] == CTX
    assert by_id[k - 1]["pack_tokens"] == total - CTX * (k - 1)
    # pack_text really carries pack_tokens whitespace tokens
    for r in asm:
        assert len(r["pack_text"].split()) == r["pack_tokens"]

    # per-document reconstruction: concatenating one document's slices
    # across its packs in doc_offset order yields the document verbatim —
    # (doc_offset, seg_tokens) address the right tokens, with no overlap,
    # loss, or reordering
    slices = (
        packed.join(docs, "doc_id")
        .select(
            "doc_id",
            "doc_offset",
            F.concat_ws(
                " ",
                F.slice(
                    F.split(F.trim("text"), r"\s+"),
                    F.col("doc_offset").cast("int") + 1,
                    F.col("seg_tokens").cast("int"),
                ),
            ).alias("piece"),
        )
        .collect()
    )
    pieces: dict[int, list] = {}
    for r in slices:
        pieces.setdefault(r["doc_id"], []).append((r["doc_offset"], r["piece"]))
    for doc_id, text in rows:
        got = " ".join(p for _, p in sorted(pieces[doc_id]))
        assert got == text, doc_id

    # and the global stream: concatenating pack_text in pack_id order is a
    # permutation-free concatenation of the documents in shuffle order —
    # each document appears exactly once, contiguously
    stream = " ".join(by_id[p]["pack_text"] for p in range(k)).split()
    for doc_id, text in rows:
        toks = text.split()
        start = stream.index(toks[0])
        assert stream[start : start + len(toks)] == toks, doc_id


def test_assemble_ingest_packs_keyed_by_epoch(spark, tmp_path):
    """The streaming-ingest layout assembles under ("batch_id", "pack_id")
    — per-epoch pack ids collide across epochs, so the epoch must be part
    of the pack key (two single-epoch assemblies == the keyed two-epoch
    assembly)."""
    from kafka_connector_s3_sink_spark.operators import incremental
    from kafka_connector_s3_sink_spark.streaming import ingest

    loc = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(9999, " ".join(f"hist{j}" for j in range(40)))],
        ["doc_id", "text"],
    )
    incremental.build_dedup_index(base, "r13asm", loc, num_buckets=2)
    try:
        cfg = ingest.IngestConfig(
            index_prefix="r13asm",
            index_location=loc,
            dest_dir=str(tmp_path / "out"),
            checkpoint_location=str(tmp_path / "ckpt"),
            num_buckets=2,
            ctx_len=CTX,
            split_weights={"train": 1.0},
        )
        mk = lambda tag, i: " ".join(
            w
            for j in range(12 + i)
            for w in (["the", "and", "of", "to", "is"][j % 5], f"{tag}{j}")
        )
        e0 = [(i, mk(f"a{i}", i)) for i in range(1, 5)]
        e1 = [(10 + i, mk(f"b{i}", i)) for i in range(1, 4)]
        ingest.process_crawl_batch(
            spark.createDataFrame(e0, ["doc_id", "text"]), 0, cfg
        )
        ingest.process_crawl_batch(
            spark.createDataFrame(e1, ["doc_id", "text"]), 1, cfg
        )
        packs = ingest.read_ingest_packs(spark, cfg.dest_dir)
        docs = spark.read.parquet(f"{cfg.dest_dir}/documents")
        keyed = packing.assemble_packs(
            packs, docs, pack_key=("batch_id", "pack_id")
        ).collect()
        # totals agree with per-epoch single-stream assembly
        for epoch in sorted(
            r["batch_id"]
            for r in packs.select("batch_id").distinct().collect()
        ):
            one = packing.assemble_packs(
                packs.filter(F.col("batch_id") == epoch),
                docs.filter(F.col("batch_id") == epoch),
            ).collect()
            got = {
                r["pack_id"]: (r["pack_tokens"], r["pack_text"])
                for r in keyed
                if r["batch_id"] == epoch
            }
            want = {
                r["pack_id"]: (r["pack_tokens"], r["pack_text"]) for r in one
            }
            assert got == want, epoch
    finally:
        incremental.drop_dedup_index(spark, "r13asm")
