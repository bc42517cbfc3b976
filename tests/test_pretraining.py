"""End-to-end pretraining preset: synthetic WARC → enrich →
``pretraining_pipeline`` → packed shards, with every stage's row accounting
asserted against a hand-planted fixture (one planted casualty per stage)."""

import gzip
import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.pretraining import (
    PretrainingConfig,
    pretraining_pipeline,
)
from kafka_connector_s3_sink_spark.sources.warc import (

    build_http_response_payload,
    build_record,
    enrich_crawl_documents,
    read_warc,
    warc_documents,
)

# Long-running e2e/preset suite: excluded from the default pytest
# selection (pytest.ini addopts -m "not slow") so the routine gate
# finishes inside a CI window; run the full suite with
#   python -m pytest tests/ -m "slow or not slow"
pytestmark = pytest.mark.slow


def _bucket(seed, i):
    return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:4], 16)


def _prose(tag, n=45):
    """Stopword-laced unique-token prose: clears the static quality floor,
    shares no 3-gram shingle with any other tag's doc."""
    stops = ["the", "and", "of", "to", "is"]
    return " ".join(
        w for i in range(n) for w in (stops[i % 5], f"{tag}{i}")
    )


# a 54-token license header: long enough to carry span_tokens=50 windows
HEADER = _prose("license", 27)
PARA = "the shared boilerplate paragraph that appears in three documents verbatim today"

# url -> (pinned doc_id, text); one planted casualty per stage. Prose docs
# stay short enough that no CROSS-doc shared run reaches 50 tokens (the
# A/C near-dup pair shares 22-token runs at most), so span surgery touches
# only the planted header.
A = _prose("aa", 22)
C = A.replace("aa10", "changed")  # near-dup of A: one mid word
K = _prose("kk", 40)
L = _prose("ll", 40)
DOCS = {
    "https://wiki.org/a": (1, A),
    "https://b.com/b": (2, A),                      # exact copy -> paragraph stage
    "https://c.com/c": (3, C),                      # near dup   -> cascade
    "https://wiki.org/d": (4, PARA + "\n" + _prose("dd", 15)),
    "https://e.com/e": (5, PARA + "\n" + _prose("ee", 15)),
    "https://f.com/f": (6, PARA),                   # only dup para -> paragraph stage
    "https://g.com/g": (7, "@@!! ##$$ %%^^ &&**"),  # gibberish -> quality floor
    "https://k.com/k": (8, K),                      # -> exact decontam
    "https://l.com/l": (9, L),                      # -> near decontam
    "https://capped.com/p1": (10, _prose("ma", 22)),
    "https://capped.com/p2": (11, _prose("mb", 22)),
    "https://capped.com/p3": (12, _prose("mc", 6)),  # lowest quality -> cap
    "https://h.com/h": (13, HEADER + " " + _prose("hh", 15)),
    "https://i.com/i": (14, HEADER + " " + _prose("ii", 15)),
    "https://j.com/j": (15, HEADER),                # only dup span -> span surgery
}
URL_404 = "https://z.com/missing"


@pytest.fixture(scope="module")
def enriched(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("warc_corpus")
    records = [build_record("warcinfo", b"software: test\r\n")]
    for url, (_i, text) in DOCS.items():
        records.append(
            build_record(
                "conversion",
                text.encode(),
                target_uri=url,
                content_type="text/plain",
            )
        )
    records.append(
        build_record(
            "response",
            build_http_response_payload(
                b"gone", status=404, content_type="application/octet-stream"
            ),
            target_uri=URL_404,
        )
    )
    (tmp / "corpus.warc.gz").write_bytes(
        b"".join(gzip.compress(r, mtime=0) for r in records)
    )
    docs = enrich_crawl_documents(warc_documents(read_warc(spark, str(tmp))))
    # pin doc_ids so stage ownership (min-id canonical elections, paragraph
    # first-occurrence) is deterministic instead of xxhash-ordered
    id_map = F.create_map(
        *[
            F.lit(x)
            for url, (i, _t) in list(DOCS.items()) + [(URL_404, (16, ""))]
            for x in (url, i)
        ]
    )
    return docs.withColumn("doc_id", id_map[F.col("url")].cast("long"))


@pytest.fixture(scope="module")
def result(spark, enriched):
    bench = spark.createDataFrame(
        [
            # tail-trimmed copy of K: exact containment 1.0
            Row(doc_id=901, text=K.rsplit(" ", 1)[0]),
            # first word replaced in L: only the near pass is guaranteed
            Row(doc_id=902, text="paraphrased " + L.split(" ", 1)[1]),
        ]
    )
    wiki = F.col("domain") == "wiki.org"
    cfg = PretrainingConfig(
        quality_floor=0.3,
        span_tokens=50,
        domain_cap=2,
        n_salts=4,
        mixture={"wiki": 2.5, "web": 1.0},
        ctx_len=64,
    )
    res = pretraining_pipeline(
        enriched.withColumn(
            "source", F.when(wiki, F.lit("wiki")).otherwise(F.lit("web"))
        ),
        benchmark=bench,
        config=cfg,
    )
    yield res
    res.unpersist()  # release the cascade/decontam caches for later modules


def test_stage_accounting(result):
    counts = dict(result.accounting())
    assert list(counts) == [
        "input", "nonempty", "quality_floor", "paragraph_dedup",
        "span_surgery", "near_dedup", "decontam", "domain_cap",
        "mixture", "packed",
    ]
    assert counts["input"] == 16          # 15 conversions + the 404 response
    assert counts["nonempty"] == 15       # 404 has null text
    assert counts["quality_floor"] == 14  # gibberish under the floor
    assert counts["paragraph_dedup"] == 12  # exact copy B + para-only F
    assert counts["span_surgery"] == 11   # header-only J stripped empty
    assert counts["near_dedup"] == 10     # near-dup C folds into A's cluster
    assert counts["decontam"] == 8        # K (exact pass) + L (near pass)
    assert counts["domain_cap"] == 7      # lowest-quality capped.com page
    # wiki docs (A=1, D=4) serve 2 copies + a 0.5-Bernoulli third under the
    # shared bucket; web survivors serve once
    wiki_extra = sum(
        _bucket("pretrain:mix", i) < 32768 for i in (1, 4)
    )
    assert counts["mixture"] == 2 * 2 + wiki_extra + 5
    assert counts["packed"] >= counts["mixture"]


def test_stage_membership(result):
    """The right DOCUMENTS survive, not just the right counts."""
    ids = lambda name: {
        r["doc_id"] for r in result.stages[name].select("doc_id").collect()
    }
    assert 7 not in ids("quality_floor")
    assert ids("paragraph_dedup") == ids("quality_floor") - {2, 6}
    assert ids("span_surgery") == ids("paragraph_dedup") - {15}
    assert ids("near_dedup") == ids("span_surgery") - {3}
    assert ids("decontam") == ids("near_dedup") - {8, 9}
    assert ids("domain_cap") == ids("decontam") - {12}  # mc is shortest
    assert ids("domain_cap") == {1, 4, 5, 10, 11, 13, 14}


def test_surgery_rewrote_content(result):
    """Span surgery removed the license header from H; paragraph dedup left
    the boilerplate paragraph only in its first-occurrence doc (D)."""
    texts = {
        r["doc_id"]: r["text"]
        for r in result.stages["span_surgery"].select("doc_id", "text").collect()
    }
    assert HEADER not in texts[13] and HEADER not in texts[14]
    assert texts[13].startswith("hh0") or "hh0" in texts[13]
    assert PARA in texts[4] and PARA not in texts[5]


def test_packed_layout_and_split_stability(result):
    rows = result.packed.collect()
    assert len(rows) > 0
    reps = {(r["doc_id"], r["mix_epoch"]) for r in rows}
    # every mixture replica packs somewhere, none invented
    mix = {
        (r["doc_id"], r["mix_epoch"])
        for r in result.stages["mixture"].select("doc_id", "mix_epoch").collect()
    }
    assert reps == mix
    assert result.epoch_slots == 3  # ceil(2.5)
    # wiki docs carry epochs {0, 1} (+2 if the fractional bucket hit)
    for d in (1, 4):
        eps = {e for (i, e) in reps if i == d}
        want = {0, 1} | ({2} if _bucket("pretrain:mix", d) < 32768 else set())
        assert eps == want
    # split labels replay the md5 thresholds, replicas never straddle splits
    for r in rows:
        b = _bucket("pretrain:split", r["doc_id"])
        want = (
            "train" if b < int(0.9 * 65536)
            else "val" if b < int(0.95 * 65536) else "test"
        )
        assert r["split"] == want
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_doc.values())
    # pack budgets respect ctx_len and H's count excludes the stripped header
    assert all(r["seg_tokens"] <= 64 for r in rows)
    h_tokens = {r["n_tokens"] for r in rows if r["doc_id"] == 13}
    # 15 stopword+unique tail pairs minus one: H's and I's tails both open
    # with 'the', so the duplicated 50-gram reaches one token past the
    # 54-token header and surgery removes 55 tokens
    assert h_tokens == {29}


def test_semantic_decontam_rung(spark):
    """r8: benchmark_embeddings adds the third decontam rung — a doc whose
    TEXT shares no n-grams with the eval suite but whose embedding is a
    scaled copy of a benchmark embedding is cut at the decontam stage;
    lexically AND semantically clean docs survive; missing embedding col
    raises."""
    from kafka_connector_s3_sink_spark.pretraining import (
        PretrainingConfig,
        pretraining_pipeline,
    )

    base = [3.0, -2.0, 5.0, -4.0, 2.5, -3.5, 4.0, -2.0]
    far = [5.0, 5.0, -5.0, 5.0, -5.0, -5.0, 5.0, 5.0]
    docs = spark.createDataFrame(
        [
            # semantically leaked: unique prose, embedding = 2x benchmark
            (1, _prose("leak", 40), [2.0 * x for x in base]),
            (2, _prose("clean-a", 40), far),
            (3, _prose("clean-b", 40), [-x for x in base]),
        ],
        ["doc_id", "text", "embedding"],
    )
    bench_emb = spark.createDataFrame(
        [(900, base)], ["doc_id", "embedding"]
    )
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None, mixture=None,
        embedding_dim=8, ctx_len=64,
    )
    res = pretraining_pipeline(
        docs, config=cfg, benchmark_embeddings=bench_emb
    )
    kept = {r.doc_id for r in res.stages["decontam"].select("doc_id").collect()}
    assert kept == {2, 3}
    # docs without the embedding column: loud error, not a silent skip
    import pytest as _pytest

    with _pytest.raises(ValueError, match="embedding"):
        pretraining_pipeline(
            docs.drop("embedding"), config=cfg, benchmark_embeddings=bench_emb
        )


# -- r9: selection stage, leakage-safe split, persist_stages, BPE packing,
# -- and the composite replica-id encode (wide/string doc_ids) -------------


def test_candidate_pair_lands_same_split(spark):
    """A band-colliding pair whose Jaccard (0.69) is below the cascade
    threshold: BOTH docs survive dedup — under plain hash_split they could
    straddle train/val; the preset's candidate-cluster split blocking must
    put them in one split, proven by an empty split_leakage_report.
    Singleton docs keep plain hash_split labels exactly."""
    from kafka_connector_s3_sink_spark.operators.sampling import (
        split_leakage_report,
    )

    common = _prose("pre", 16)
    a = common + " " + _prose("xx", 4)
    b = common + " " + _prose("yy", 4)
    docs = spark.createDataFrame(
        [(100, a), (200, b), (300, _prose("solo", 40))], ["doc_id", "text"]
    )
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None, mixture=None, ctx_len=64
    )
    res = pretraining_pipeline(docs, config=cfg)
    kept = {r.doc_id for r in res.stages["near_dedup"].select("doc_id").collect()}
    assert kept == {100, 200, 300}  # candidates, but verify rejected the pair
    splits = {r["doc_id"]: r["split"] for r in res.packed.collect()}
    assert splits[100] == splits[200]
    # the pair's shared label hashes the CLUSTER key (min id = 100)
    b100 = _bucket("pretrain:split", 100)
    want = (
        "train" if b100 < int(0.9 * 65536)
        else "val" if b100 < int(0.95 * 65536) else "test"
    )
    assert splits[100] == want
    # the singleton degenerates to hash_split on its own id
    b300 = _bucket("pretrain:split", 300)
    want300 = (
        "train" if b300 < int(0.9 * 65536)
        else "val" if b300 < int(0.95 * 65536) else "test"
    )
    assert splits[300] == want300
    # independent audit: no candidate pair straddles splits
    pairs = spark.createDataFrame([(100, 200)], ["id1", "id2"])
    rep = split_leakage_report(
        res.packed.select("doc_id", "split").distinct(),
        pairs,
        left_col="id1",
        right_col="id2",
    )
    assert rep.count() == 0


def test_dsir_selection_stage(spark, tmp_path):
    """Planted off-target doc: shares no vocabulary with the curated target
    → most-negative DSIR log-weight → cut by the selection stage between
    decontam and the cap. The persisted-model path (same seeds) selects the
    identical set; misconfigurations fail loudly."""
    from kafka_connector_s3_sink_spark.operators import selection

    on_target = {i: _prose(f"alpha{i}", 40) for i in (1, 2, 3)}
    junk = " ".join(f"junk{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(i, t) for i, t in on_target.items()] + [(4, junk)],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(900 + i, t) for i, t in on_target.items()], ["doc_id", "text"]
    )
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None, mixture=None,
        dsir_top_k=3, ctx_len=64,
    )
    res = pretraining_pipeline(docs, config=cfg, target_docs=target)
    sel = {r.doc_id for r in res.stages["selection"].select("doc_id").collect()}
    assert sel == {1, 2, 3}
    assert list(res.stages) == [
        "input", "nonempty", "paragraph_dedup", "span_surgery",
        "near_dedup", "selection", "packed",
    ]
    assert {r["doc_id"] for r in res.packed.collect()} == {1, 2, 3}
    # persisted-model path: same hash/gumbel seeds -> identical selection
    path = str(tmp_path / "dsir_model")
    selection.persist_dsir_model(target, docs, path, seed="pretrain:dsir")
    res2 = pretraining_pipeline(docs, config=cfg, dsir_model_path=path)
    sel2 = {
        r.doc_id for r in res2.stages["selection"].select("doc_id").collect()
    }
    assert sel2 == sel
    # loud misconfiguration, not silent skips
    with pytest.raises(ValueError, match="dsir_top_k"):
        pretraining_pipeline(
            docs,
            config=PretrainingConfig(
                quality_floor=None, domain_cap=None, mixture=None
            ),
            target_docs=target,
        )
    with pytest.raises(ValueError, match="XOR"):
        pretraining_pipeline(
            docs, config=cfg, target_docs=target, dsir_model_path=path
        )
    with pytest.raises(ValueError, match="neither"):
        pretraining_pipeline(docs, config=cfg)


def test_persist_stages_accounting_is_single_pass(spark, tmp_path):
    """persist_stages=True: accounting() materializes each stage once (each
    count reuses the previous stage's cache). Pin: after the first
    accounting() the SOURCE FILES are deleted — a second accounting() must
    still succeed (pure cache, zero lineage replay back to the scan) and
    return identical counts."""
    import shutil

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, _prose(f"p{i}", 30)) for i in range(8)], ["doc_id", "text"]
    ).write.parquet(src)
    docs = spark.read.parquet(src)
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None, mixture=None,
        ctx_len=64, persist_stages=True,
    )
    res = pretraining_pipeline(docs, config=cfg)
    first = res.accounting()
    shutil.rmtree(src)
    second = res.accounting()
    assert second == first and dict(first)["input"] == 8
    res.unpersist()


def test_bpe_pack_budgets_follow_tokenizer_counts(spark):
    """bpe_merges switches pack budgets from the whitespace heuristic to
    real BPE token counts: packed n_tokens equals tokenizer.bpe_encode's
    n_tokens per doc (which differs from the whitespace count)."""
    from kafka_connector_s3_sink_spark.operators import tokenizer

    texts = {
        1: "banana bandana banana cabana",
        2: "banana banana banana banana banana banana",
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    merges = tokenizer.fit_bpe(tokenizer.word_frequencies(docs), n_merges=6)
    expected = {
        r["doc_id"]: r["n_tokens"]
        for r in tokenizer.bpe_encode(docs, merges).collect()
    }
    ws = {i: len(t.split()) for i, t in texts.items()}
    assert expected != ws  # the fixture genuinely distinguishes the paths
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None, mixture=None,
        ctx_len=16, bpe_merges=tuple(merges),
    )
    res = pretraining_pipeline(docs, config=cfg)
    got = {r["doc_id"]: r["n_tokens"] for r in res.packed.collect()}
    assert got == expected
    # whitespace default really is different on this fixture
    res_ws = pretraining_pipeline(
        docs,
        config=PretrainingConfig(
            quality_floor=None, domain_cap=None, mixture=None, ctx_len=16
        ),
    )
    assert {
        r["doc_id"]: r["n_tokens"] for r in res_ws.packed.collect()
    } == ws


def test_wide_and_string_doc_ids_roundtrip_packing(spark):
    """The composite '<epoch>:<doc_id>' replica id: 63-bit xxhash-scale ids
    (where an integer doc_id·slots+epoch encode overflows and a double
    division decode is inexact) and string ids (even containing ':')
    round-trip exactly through mixture replication + packing."""
    big = (1 << 62) + 987654321012345
    docs = spark.createDataFrame(
        [
            (big, _prose("wa", 30), "web"),
            (big + 7, _prose("wb", 30), "web"),
        ],
        ["doc_id", "text", "source"],
    )
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None,
        mixture={"web": 2.5}, ctx_len=32,
    )
    res = pretraining_pipeline(docs, config=cfg)
    reps = {(r["doc_id"], r["mix_epoch"]) for r in res.packed.collect()}
    mix = {
        (r["doc_id"], r["mix_epoch"])
        for r in res.stages["mixture"].select("doc_id", "mix_epoch").collect()
    }
    assert reps == mix and {i for i, _ in reps} == {big, big + 7}
    assert {e for _, e in reps} >= {0, 1}  # upsampled replicas decoded intact
    # string ids, including ':' inside the id itself
    sdocs = spark.createDataFrame(
        [("urn:doc:1", _prose("sa", 30)), ("urn:doc:2", _prose("sb", 30))],
        ["doc_id", "text"],
    )
    scfg = PretrainingConfig(
        quality_floor=None, domain_cap=None, mixture=None, ctx_len=32
    )
    sres = pretraining_pipeline(sdocs, config=scfg)
    srows = sres.packed.collect()
    assert {r["doc_id"] for r in srows} == {"urn:doc:1", "urn:doc:2"}
    assert all(r["mix_epoch"] == 0 for r in srows)


def test_temperature_mixture_in_preset(spark):
    """mixture_alpha fits XLM-R temperature rates on the corpus that
    reaches the mixture stage: the low-resource source up-samples
    (epochs > 0), the high-resource source down-samples, the expected
    total is ~scale x corpus, and replicas still decode exactly; passing
    both mixture and mixture_alpha is a loud error."""
    from kafka_connector_s3_sink_spark.operators import sampling as s_ops

    rows = [(i, _prose(f"hi{i}", 25), "high") for i in range(40)] + [
        (100 + i, _prose(f"lo{i}", 25), "low") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None,
        mixture_alpha=0.3, ctx_len=64,
    )
    res = pretraining_pipeline(docs, config=cfg)
    mix = res.stages["mixture"].groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in mix}
    rates = s_ops.temperature_mixture_rates(
        res.stages["near_dedup"], group_col="source", alpha=0.3
    )
    assert rates["low"] > 1.0 > rates["high"]
    assert by_src["high"] < 40          # high-resource down-sampled
    assert by_src["low"] >= 4           # low-resource replicated
    assert res.epoch_slots >= 2
    # replicas decode exactly through the composite id
    reps = {(r["doc_id"], r["mix_epoch"]) for r in res.packed.collect()}
    mixset = {
        (r["doc_id"], r["mix_epoch"])
        for r in res.stages["mixture"].select("doc_id", "mix_epoch").collect()
    }
    assert reps == mixset
    with pytest.raises(ValueError, match="XOR"):
        pretraining_pipeline(
            docs,
            config=PretrainingConfig(
                quality_floor=None, domain_cap=None,
                mixture={"high": 1.0}, mixture_alpha=0.3,
            ),
        )


def test_write_packed_corpus(spark, tmp_path):
    """The trainer-facing writer: split-partitioned packed files with one
    pack's segments co-located and (pack_id, pack_pos)-ordered inside a
    file; the stats table accounts every segment/token; rows round-trip
    exactly."""
    from kafka_connector_s3_sink_spark.pretraining import write_packed_corpus

    docs = spark.createDataFrame(
        [(i, _prose(f"wp{i}", 30)) for i in range(12)], ["doc_id", "text"]
    )
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None, mixture=None, ctx_len=64
    )
    res = pretraining_pipeline(docs, config=cfg)
    dest = str(tmp_path / "corpus")
    write_packed_corpus(res, dest, shards_per_split=2)
    back = spark.read.parquet(f"{dest}/packed")
    want = sorted(map(tuple, res.packed.collect()))
    got = sorted(
        map(tuple, back.select(*res.packed.columns).collect())
    )
    assert got == want
    # one pack never straddles files, and segments are ordered within one
    import collections

    by_pack = collections.defaultdict(set)
    files = back.select(
        "split", "pack_id", F.col("_metadata.file_path").alias("f")
    )
    for r in files.collect():
        by_pack[(r["split"], r["pack_id"])].add(r["f"])
    assert all(len(fs) == 1 for fs in by_pack.values())
    stats = {
        r["split"]: r for r in spark.read.parquet(f"{dest}/stats").collect()
    }
    total_segments = sum(r["n_segments"] for r in stats.values())
    assert total_segments == res.packed.count()
    total_tokens = sum(r["n_tokens"] for r in stats.values())
    assert total_tokens == res.packed.agg(F.sum("seg_tokens")).collect()[0][0]
    # r10: straddle/hole accounting — recompute from the packed rows and
    # pin the stats table to it (global stream: a pack whose documents
    # land in several splits is straddling in EACH of those splits, and a
    # split's holes are the other splits' tokens inside its packs)
    import collections as _c

    pack_tokens = _c.defaultdict(int)
    split_pack_tokens = _c.defaultdict(int)
    for r in res.packed.collect():
        pack_tokens[r["pack_id"]] += r["seg_tokens"]
        split_pack_tokens[(r["split"], r["pack_id"])] += r["seg_tokens"]
    want_straddle = _c.defaultdict(int)
    want_holes = _c.defaultdict(int)
    for (sp, pid), tok in split_pack_tokens.items():
        if pack_tokens[pid] > tok:
            want_straddle[sp] += 1
            want_holes[sp] += pack_tokens[pid] - tok
    for sp, r in stats.items():
        assert r["n_straddling_packs"] == want_straddle[sp], sp
        assert r["n_hole_tokens"] == want_holes[sp], sp
    # the fixture is small enough that at least one pack straddles — the
    # accounting must be exercised, not vacuous
    assert sum(want_straddle.values()) > 0
    with pytest.raises(ValueError, match="packed"):
        from kafka_connector_s3_sink_spark.pretraining import PretrainingResult

        write_packed_corpus(PretrainingResult(), dest)


def test_write_packed_corpus_per_split_zero_holes(spark, tmp_path):
    """pack_per_split=True: the stats table's straddle columns are zero —
    computed from the data under the per-split pack-id scoping, so a
    training run asserts hole-freeness without trusting the writer."""
    from kafka_connector_s3_sink_spark.pretraining import write_packed_corpus

    docs = spark.createDataFrame(
        [(i, _prose(f"wz{i}", 30)) for i in range(12)], ["doc_id", "text"]
    )
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None, mixture=None, ctx_len=64,
        pack_per_split=True,
    )
    res = pretraining_pipeline(docs, config=cfg)
    dest = str(tmp_path / "corpus_ps")
    write_packed_corpus(res, dest, shards_per_split=2)
    stats = spark.read.parquet(f"{dest}/stats").collect()
    assert len(stats) >= 2  # several splits actually populated
    for r in stats:
        assert r["n_straddling_packs"] == 0, r
        assert r["n_hole_tokens"] == 0, r


def test_pack_per_split_hole_free(spark):
    """pack_per_split=True: every split packs as an independent stream —
    within a split, every pack except the split's LAST is exactly full
    (zero holes), no pack spans splits by construction, split labels match
    the global-stream path, and every mixture replica still packs."""
    import collections

    docs = spark.createDataFrame(
        [(i, _prose(f"ps{i}", 20 + i % 7), "web") for i in range(40)],
        ["doc_id", "text", "source"],
    )
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None,
        mixture={"web": 1.5}, ctx_len=32, pack_per_split=True,
    )
    res = pretraining_pipeline(docs, config=cfg)
    rows = res.packed.collect()
    reps = {(r["doc_id"], r["mix_epoch"]) for r in rows}
    mix = {
        (r["doc_id"], r["mix_epoch"])
        for r in res.stages["mixture"].select("doc_id", "mix_epoch").collect()
    }
    assert reps == mix
    fill = collections.defaultdict(int)
    for r in rows:
        fill[(r["split"], r["pack_id"])] += r["seg_tokens"]
    last = {}
    for (sp, pid) in fill:
        last[sp] = max(last.get(sp, -1), pid)
    for (sp, pid), tokens in fill.items():
        if pid != last[sp]:
            assert tokens == 32, (sp, pid, tokens)  # hole-free full packs
        else:
            assert 0 < tokens <= 32
    # split labels are identical to the global-stream path (labels derive
    # from doc ids / clusters, not from the packing mode)
    res_g = pretraining_pipeline(
        docs,
        config=PretrainingConfig(
            quality_floor=None, domain_cap=None,
            mixture={"web": 1.5}, ctx_len=32,
        ),
    )
    lab = lambda rs: {r["doc_id"]: r["split"] for r in rs.packed.collect()}
    assert lab(res) == lab(res_g)


def test_quality_floor_with_learned_classifier(spark):
    """r11 parity with IngestConfig.quality_weights: the preset's quality
    floor gates on the trained classifier_score when weights are supplied
    (no precomputed quality column needed); junk the MODEL scores low is
    cut at the first stage. A precomputed `quality` column still wins."""
    from kafka_connector_s3_sink_spark.operators.quality import (
        fit_quality_classifier,
    )

    good = (
        "the committee published its final report on the river restoration "
        "and the town council voted to adopt all of the recommendations"
    )
    junk = "!!! ??? buy now $$$ ;;; :::"
    train = spark.createDataFrame(
        [Row(text=good, label=1), Row(text=junk, label=0),
         Row(text=good + " again this year", label=1),
         Row(text="%% ## @@ || ~~", label=0)]
    )
    weights = tuple(fit_quality_classifier(train))
    docs = spark.createDataFrame(
        [(1, good + " published today"), (2, junk)], ["doc_id", "text"]
    )
    cfg = PretrainingConfig(
        quality_floor=0.5,
        quality_weights=weights,
        splits={"train": 1.0},
        ctx_len=64,
        seed="r11qw",
    )
    res = pretraining_pipeline(docs, config=cfg)
    try:
        kept = {
            r["doc_id"]
            for r in res.stages["quality_floor"].select("doc_id").collect()
        }
        assert kept == {1}
    finally:
        res.unpersist()
    # a precomputed quality column overrides the weights: score the junk 1.0
    docs_q = docs.withColumn(
        "quality", F.when(F.col("doc_id") == 2, 1.0).otherwise(0.0)
    )
    res2 = pretraining_pipeline(docs_q, config=cfg)
    try:
        kept2 = {
            r["doc_id"]
            for r in res2.stages["quality_floor"].select("doc_id").collect()
        }
        assert kept2 == {2}
    finally:
        res2.unpersist()


def test_read_packed_corpus_verifies_and_prunes(spark, tmp_path):
    """r11 loader half of the handoff: read_packed_corpus returns the
    written rows, prunes to one split at scan time, and its verify pass
    catches both failure modes — broken pack-file locality and a stats
    table that disagrees with the data."""
    from kafka_connector_s3_sink_spark.pretraining import (
        read_packed_corpus,
        write_packed_corpus,
    )

    docs = spark.createDataFrame(
        [(i, _prose(f"rp{i}", 30)) for i in range(12)], ["doc_id", "text"]
    )
    cfg = PretrainingConfig(
        quality_floor=None, domain_cap=None, mixture=None, ctx_len=64
    )
    res = pretraining_pipeline(docs, config=cfg)
    dest = str(tmp_path / "corpus")
    write_packed_corpus(res, dest, shards_per_split=2)

    back = read_packed_corpus(spark, dest)  # verify=True passes
    want = sorted(map(tuple, res.packed.collect()))
    got = sorted(map(tuple, back.select(*res.packed.columns).collect()))
    assert got == want

    train_only = read_packed_corpus(spark, dest, split="train")
    assert {r["split"] for r in train_only.select("split").collect()} == {
        "train"
    }

    # tamper 1: stats from "a different corpus version"
    stats = spark.read.parquet(f"{dest}/stats")
    stats.withColumn("n_tokens", F.col("n_tokens") + 1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/corpus2/stats")
    spark.read.parquet(f"{dest}/packed").write.mode("overwrite").partitionBy(
        "split"
    ).parquet(f"{tmp_path}/corpus2/packed")
    with pytest.raises(ValueError, match="stats"):
        read_packed_corpus(spark, str(tmp_path / "corpus2"))

    # tamper 2: a rewrite that scatters one pack across files (the exact
    # thing a naive manual repartition does)
    packed = spark.read.parquet(f"{dest}/packed")
    multi = (
        packed.groupBy("split", "pack_id")
        .count()
        .filter("count > 1")
        .count()
    )
    assert multi > 0  # fixture must contain a multi-segment pack
    packed.repartition(4, "pack_pos").write.mode("overwrite").partitionBy(
        "split"
    ).parquet(f"{tmp_path}/corpus3/packed")
    stats.write.mode("overwrite").parquet(f"{tmp_path}/corpus3/stats")
    with pytest.raises(ValueError, match="locality"):
        read_packed_corpus(spark, str(tmp_path / "corpus3"))
    res.unpersist()
