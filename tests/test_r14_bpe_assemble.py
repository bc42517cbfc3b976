"""r14: BPE-true window reconstruction (VERDICT r13 item 5).

Both production ladders pack under BPE budgets (`bpe_merges` config), but
the r13 reconstruction operator was whitespace-only — the layout
arithmetic was never end-to-end proven on the budgets production actually
uses. `assemble_bpe_packs` re-encodes each document with the FROZEN merge
list and slices the context windows from the token stream itself; these
tests pin parity between the assembled windows and a direct per-document
encode/decode.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.operators import packing, tokenizer

CTX = 24


@pytest.fixture(scope="module")
def corpus(spark):
    # repeated subword structure so fit_bpe learns real multi-char merges
    themes = ["lowering", "lowest", "newer", "wider", "newest", "lowly"]
    rows = [
        (
            i,
            " ".join(
                themes[(i + j) % len(themes)] + ("" if j % 3 else "s")
                for j in range(6 + 2 * i)
            ),
        )
        for i in range(1, 8)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = tokenizer.fit_bpe(tokenizer.word_frequencies(docs), n_merges=40)
    assert len(merges) > 10  # the corpus really trained a tokenizer
    return rows, docs, merges


def _direct_encode(rows, merges):
    """Driver-side reference: each document's token stream via the same
    public single-word encoder the distributed path uses."""
    ranks = {p: i for i, p in enumerate(merges)}
    cache: dict[str, list[str]] = {}
    return {
        doc_id: [
            t
            for w in text.lower().split()
            for t in tokenizer._encode_word(w, ranks, cache)
        ]
        for doc_id, text in rows
    }


def _pack_with_budgets(docs, merges, **kw):
    enc = tokenizer.bpe_encode(docs, merges).select(
        "doc_id", F.col("n_tokens").alias("bpe_tokens")
    )
    return packing.pack_sequences(
        docs.join(enc, "doc_id"),
        ctx_len=CTX,
        token_count_col="bpe_tokens",
        **kw,
    )


def test_assembled_windows_match_direct_per_document_decode(spark, corpus):
    rows, docs, merges = corpus
    packed = _pack_with_budgets(docs, merges)
    asm = packing.assemble_bpe_packs(packed, docs, merges).collect()
    streams = _direct_encode(rows, merges)
    total = sum(len(s) for s in streams.values())

    by_id = {r["pack_id"]: r for r in asm}
    k = len(by_id)
    assert sorted(by_id) == list(range(k))
    # the reconstructed slot count equals the layout's everywhere — the
    # built-in merge-list/overhead mismatch detector reads clean
    for r in asm:
        assert r["pack_tokens"] == r["layout_tokens"], r["pack_id"]
        assert len(r["pack_window"]) == r["pack_tokens"]
    assert sum(r["pack_tokens"] for r in asm) == total
    for pid in range(k - 1):
        assert by_id[pid]["pack_tokens"] == CTX

    # global stream: pack windows in pack order tile the corpus — the
    # stream must equal the documents' DIRECT token streams concatenated
    # at the global offsets the layout itself assigns (each segment
    # implies its document's start: pack_id*CTX + pack_pos - doc_offset,
    # and all of a document's segments must agree on it)
    stream = [t for p in range(k) for t in by_id[p]["pack_window"]]
    starts: dict[int, int] = {}
    for r in packed.collect():
        s = r["pack_id"] * CTX + r["pack_pos"] - r["doc_offset"]
        assert starts.setdefault(r["doc_id"], s) == s, r["doc_id"]
    expected = [None] * total
    for doc_id, s in starts.items():
        expected[s : s + len(streams[doc_id])] = streams[doc_id]
    assert stream == expected

    # decode parity: pack_text is the decoded window (partial words at
    # window edges decode faithfully)
    for r in asm:
        want = (
            "".join(r["pack_window"])
            .replace(tokenizer.END_OF_WORD, " ")
            .strip()
        )
        assert r["pack_text"] == want


def test_per_document_slices_reassemble_the_document(spark, corpus):
    rows, docs, merges = corpus
    packed = _pack_with_budgets(docs, merges)
    streams = _direct_encode(rows, merges)
    # slice each document's windows straight from the layout and the
    # direct encode; concatenated in doc_offset order they must be the
    # document's token stream verbatim (no loss, overlap, or reorder)
    for r in packed.collect():
        want = streams[r["doc_id"]][
            r["doc_offset"] : r["doc_offset"] + r["seg_tokens"]
        ]
        assert len(want) == r["seg_tokens"], r
    per_doc: dict[int, list] = {}
    for r in packed.collect():
        per_doc.setdefault(r["doc_id"], []).append(
            (r["doc_offset"], r["seg_tokens"])
        )
    for doc_id, segs in per_doc.items():
        segs.sort()
        assert segs[0][0] == 0
        assert sum(n for _, n in segs) == len(streams[doc_id])
        for (o1, n1), (o2, _) in zip(segs, segs[1:]):
            assert o1 + n1 == o2  # contiguous, gap-free


def test_per_doc_overhead_materializes_framing_slots(spark, corpus):
    rows, docs, merges = corpus
    packed = _pack_with_budgets(docs, merges, per_doc_overhead=1)
    asm = packing.assemble_bpe_packs(
        packed, docs, merges, per_doc_overhead=1, eod_token="<eod>"
    ).collect()
    streams = _direct_encode(rows, merges)
    total = sum(len(s) + 1 for s in streams.values())
    for r in asm:
        assert r["pack_tokens"] == r["layout_tokens"]
    assert sum(r["pack_tokens"] for r in asm) == total
    # exactly one framing token per document, each directly after its
    # document's token stream (document starts derived from the layout —
    # substring search would alias under this corpus's shared subwords)
    stream = [
        t
        for p in sorted(r["pack_id"] for r in asm)
        for r2 in asm
        if r2["pack_id"] == p
        for t in r2["pack_window"]
    ]
    assert stream.count("<eod>") == len(rows)
    starts: dict[int, int] = {}
    for r in packed.collect():
        s = r["pack_id"] * CTX + r["pack_pos"] - r["doc_offset"]
        assert starts.setdefault(r["doc_id"], s) == s, r["doc_id"]
    for doc_id, want in streams.items():
        s = starts[doc_id]
        assert stream[s : s + len(want)] == want, doc_id
        assert stream[s + len(want)] == "<eod>", doc_id


def test_mismatched_merge_list_is_detected(spark, corpus):
    rows, docs, merges = corpus
    packed = _pack_with_budgets(docs, merges)
    # assemble under a DIFFERENT tokenizer (truncated merges -> LONGER
    # token streams): the slices still address seg_tokens positions, so
    # pack_tokens alone can read clean — n_bad_segments is the detector
    # that must fire instead of silently producing wrong windows
    wrong = packing.assemble_bpe_packs(
        packed, docs, merges[: len(merges) // 4]
    ).collect()
    assert sum(r["n_bad_segments"] for r in wrong) > 0
    # and the other direction (re-encode SHORTER than the layout: pack
    # under the truncated tokenizer, assemble under the full one) trips
    # BOTH detectors
    repacked = _pack_with_budgets(docs, merges[: len(merges) // 4])
    wrong2 = packing.assemble_bpe_packs(repacked, docs, merges).collect()
    assert sum(r["n_bad_segments"] for r in wrong2) > 0
    assert any(r["pack_tokens"] != r["layout_tokens"] for r in wrong2)
    # the matched configuration stays clean
    ok = packing.assemble_bpe_packs(packed, docs, merges).collect()
    assert all(r["n_bad_segments"] == 0 for r in ok)
