#!/usr/bin/env python
"""r11 scale probes (VERDICT r10 items 3+4): the hot-band cap, the two
driver-coordinated loops, and the preset e2e composition.

Sections (pass any subset as argv; default all):

- ``hotband`` — plant a boilerplate family (10% of docs share one template,
  each with a unique tail) at 1x and 10x corpus scale and measure, capped
  vs uncapped: candidate-pair volume, wall time, recall on PLANTED genuine
  near-dup pairs, and recall on the boilerplate family itself (the
  documented loss). Also reports the ORGANIC band-df distribution of the
  clean corpus — the basis for the recommended ``max_band_df`` value: the
  cap must sit above organic band frequencies (so exact-LSH semantics are
  untouched on clean data) and below boilerplate family sizes (so the
  C(n,2) blowup is bounded). The planted family is shared across clones
  (NOT letter-rotated like the filler clones) so the 10x corpus has a 10x
  hot band — the quadratic case the cap exists for.
- ``bigloops`` — one 100x point (sf0.1 x100 = 500k docs / 200k vectors)
  for the two driver-coordinated loops: candidate-CC (wall, propagation
  ROUNDS via connected_components(stats=...), JVM VmHWM) and the IVF
  k-means fit (wall at fixed iterations=2; bounded-sample contract says
  flat). Clone texts are letter-rotation decorrelated (see probe_r9's
  fixture lesson) so pair counts scale with corpus size, not fixture
  duplicate structure.
- ``preset`` — pretraining_pipeline e2e at sf0.1, persist_stages off/on,
  1 cold + 1 warm pass each (VERDICT item 3: a tracked preset number so
  composition regressions are attributed to the preset itself).
- ``packio`` (r12, VERDICT r11 item 6) — the full trainer handoff loop at
  sf0.1 under BOTH pack_per_split modes: preset → write_packed_corpus →
  read_packed_corpus(verify=True) → re-read verify=False. Times the write,
  the verifying first read (the startup-check cost a 100 TB user asks
  about: pack-file locality + stats agreement, one pass each), and the
  steady-state read.

- ``packscale`` (r12) — `read_packed_corpus`'s verifying startup checks at
  1x and 10x packed volume over a synthesized layout: pins the "both
  checks are one pass, ~linear in segments" claim with a measurement.
  Not in the default section list (the 10x build is minutes of one-off
  fixture work) — run explicitly after reader changes.

Usage: python tools/probe_r11.py [hotband] [bigloops] [preset] [packio]
       [packscale]
"""

from __future__ import annotations

import glob
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BOILER = (
    "this website uses cookies to improve your experience by continuing "
    "to browse the site you agree to our use of cookies please review our "
    "privacy policy and terms of service for more information about how "
    "we collect store and process your personal data in accordance with "
    "applicable regulations you may withdraw consent at any time"
)


def jvm_hwm_mb() -> int:
    """Peak RSS (VmHWM, MiB) across java processes — the Spark driver JVM
    in local mode. /proc scan; psutil is not in the container."""
    best = 0
    for p in glob.glob("/proc/[0-9]*/comm"):
        try:
            with open(p) as f:
                if f.read().strip() != "java":
                    continue
            pid = p.split("/")[2]
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        best = max(best, int(line.split()[1]) // 1024)
        except OSError:
            continue
    return best


def _spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-r11")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _clones(docs, factor):
    """Letter-rotation decorrelated clones (probe_r9 fixture lesson)."""
    from pyspark.sql import functions as F

    alpha = "abcdefghijklmnopqrstuvwxyz"
    out = None
    for i in range(factor):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.translate(
                F.col("text"), alpha, alpha[i % 26:] + alpha[: i % 26]
            ).alias("text"),
        )
        out = c if out is None else out.unionByName(c)
    return out


def probe_hotband(spark) -> None:
    from pyspark.sql import functions as F

    from kafka_connector_s3_sink_spark.operators import dedup

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )

    # organic band-df distribution of the CLEAN corpus — what the cap must
    # clear to leave exact-LSH semantics untouched on non-boilerplate data
    reg: list = []
    bands = dedup.minhash_bands(docs1, unpersist_registry=reg)
    dfs = bands.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("df")
    )
    stats = dfs.agg(
        F.max("df").alias("max"),
        F.expr("percentile_approx(df, 0.999)").alias("p999"),
        F.count(F.lit(1)).alias("n_bands"),
    ).first()
    print(
        f"organic band df @1x clean: max={stats['max']} "
        f"p99.9={stats['p999']} n_band_keys={stats['n_bands']}",
        flush=True,
    )
    for f in reg:
        f.unpersist()

    for factor in (1, 10):
        base = _clones(docs1, factor)
        # plant the hot family AFTER cloning — same template across clones,
        # unique tail per doc, so ONE band key accumulates ~10% of the
        # whole Nx corpus
        planted = base.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 5,
                F.concat(
                    F.lit(BOILER + " "),
                    F.lit("tail token "),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.col("text")),
        )
        # genuine near-dup pairs OUTSIDE the family: doc_id%100==1 clones
        # with a one-word tail edit (high jaccard, bands cold)
        truth = planted.filter(F.col("doc_id") % 100 == 1).select(
            (F.col("doc_id") + 90_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" xyzzy")).alias("text"),
        )
        corpus = planted.unionByName(truth).repartition(32).persist()
        n = corpus.count()
        n_family = corpus.filter(
            (F.col("doc_id") % 10 == 5) & (F.col("doc_id") < 90_000_000)
        ).count()
        n_truth = truth.count()
        truth_pairs = {
            (r[0], r[0] + 90_000_000)
            for r in planted.filter(F.col("doc_id") % 100 == 1)
            .select("doc_id")
            .collect()
        }
        print(
            f"-- {factor}x: corpus={n} family={n_family} "
            f"planted_true_pairs={n_truth}",
            flush=True,
        )
        for cap in (None, 8, 64):
            reg = []
            t0 = time.time()
            pairs = dedup.minhash_lsh_pairs(
                corpus, max_band_df=cap, unpersist_registry=reg
            ).persist()
            n_pairs = pairs.count()
            dt = time.time() - t0
            got = {
                (r["id1"], r["id2"])
                for r in pairs.join(
                    spark.createDataFrame(
                        [(a, b) for a, b in truth_pairs], ["id1", "id2"]
                    ),
                    ["id1", "id2"],
                    "left_semi",
                ).collect()
            }
            recall_true = len(got) / max(len(truth_pairs), 1)
            fam_pairs = pairs.filter(
                (F.col("id1") % 10 == 5)
                & (F.col("id2") % 10 == 5)
                & (F.col("id1") < 90_000_000)
                & (F.col("id2") < 90_000_000)
            ).count()
            fam_possible = n_family * (n_family - 1) // 2
            print(
                f"  cap={cap}: pairs={n_pairs} wall={dt:.2f}s "
                f"true_pair_recall={recall_true:.3f} "
                f"family_pairs={fam_pairs}/{fam_possible} "
                f"({fam_pairs / max(fam_possible, 1):.4f})",
                flush=True,
            )
            pairs.unpersist()
            for f in reg:
                f.unpersist()
        corpus.unpersist()
    print(
        "recommendation: set max_band_df well above the organic p99.9/max "
        "band df (exact semantics on clean data) and below expected "
        "boilerplate family sizes — for this corpus shape, 64.",
        flush=True,
    )


def probe_bigloops(spark) -> None:
    from pyspark.sql import functions as F

    from kafka_connector_s3_sink_spark.operators import dedup, similarity

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )

    for factor in (1, 100):
        docs = (
            _clones(docs1, factor).repartition(32).persist()
            if factor > 1
            else docs1.persist()
        )
        n = docs.count()
        reg: list = []
        candidates = dedup._materialize(
            dedup.minhash_lsh_pairs(
                docs, max_band_df=64, unpersist_registry=reg
            )
        )
        n_cand = candidates.count()
        cand_ids = (
            candidates.select(F.col("id1").alias("doc_id"))
            .unionByName(candidates.select(F.col("id2").alias("doc_id")))
            .distinct()
        )
        st: dict = {}
        t0 = time.time()
        cc = dedup.connected_components(cand_ids, candidates, stats=st)
        cc.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(
            f"candidate_cc {factor}x: docs={n} cand_pairs={n_cand} "
            f"cc_wall={dt:.2f}s rounds={st['rounds']} "
            f"jvm_hwm={jvm_hwm_mb()}MiB "
            f"py_rss={resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024}MiB",
            flush=True,
        )
        candidates.unpersist()
        for f in reg:
            f.unpersist()
        docs.unpersist()

        emb = (
            emb1
            if factor == 1
            else emb1.crossJoin(
                spark.range(factor).select(F.col("id").alias("_rep"))
            ).select(
                (F.col("doc_id") + F.col("_rep") * 1_000_000).alias("doc_id"),
                F.transform(
                    "embedding",
                    lambda x: x * (1.0 + F.col("_rep").cast("double") * 0.001),
                ).alias("embedding"),
            )
        ).repartition(32).persist()
        nv = emb.count()
        t0 = time.time()
        cents = similarity.ivf_centroids(
            emb, n_centroids=8, iterations=2, id_col="doc_id"
        )
        dt = time.time() - t0
        print(
            f"ivf_kmeans_fit {factor}x: vectors={nv} iterations=2 "
            f"fit_wall={dt:.2f}s n_centroids={len(cents)} "
            f"jvm_hwm={jvm_hwm_mb()}MiB",
            flush=True,
        )
        emb.unpersist()


def probe_preset(spark) -> None:
    from pyspark.sql import functions as F

    from kafka_connector_s3_sink_spark import pretraining

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("doc_id", "text")

    def run(persist, full=False):
        # full=True adds the r11 stages: PII redaction (5-regex chain as
        # the last text mutation) and the language-derived mixture column
        # (language_id_multi instead of the corpus's source column)
        extra = (
            dict(redact_pii=True, derive_source_language=True,
                 source_col="lang")
            if full
            else dict(source_col="source")
        )
        cfg = pretraining.PretrainingConfig(
            quality_floor=0.2,
            mixture_alpha=0.3,
            ctx_len=512,
            persist_stages=persist,
            seed="bench",
            **extra,
        )
        t0 = time.time()
        res = pretraining.pretraining_pipeline(
            docs, benchmark=bench, config=cfg
        )
        res.packed.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        nrows = res.packed.count()
        res.unpersist()
        return dt, nrows

    for persist in (False, True):
        for i, label in enumerate(("cold", "warm")):
            dt, nrows = run(persist)
            print(
                f"preset_e2e persist_stages={persist} {label}: {dt:.2f}s "
                f"packed_rows={nrows}",
                flush=True,
            )
    for i, label in enumerate(("cold", "warm")):
        dt, nrows = run(False, full=True)
        print(
            f"preset_e2e full-knob (pii+lang) lazy {label}: {dt:.2f}s "
            f"packed_rows={nrows}",
            flush=True,
        )


def probe_packio(spark) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kafka_connector_s3_sink_spark import pretraining

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("doc_id", "text")

    for per_split in (False, True):
        cfg = pretraining.PretrainingConfig(
            quality_floor=0.2,
            mixture_alpha=0.3,
            source_col="source",
            ctx_len=512,
            pack_per_split=per_split,
            seed="bench",
        )
        res = pretraining.pretraining_pipeline(docs, benchmark=bench, config=cfg)
        dest = tempfile.mkdtemp(prefix="packio-")
        try:
            t0 = time.time()
            pretraining.write_packed_corpus(res, dest)
            t_write = time.time() - t0
            t0 = time.time()
            verified = pretraining.read_packed_corpus(spark, dest, verify=True)
            n = verified.count()
            t_verify = time.time() - t0
            t0 = time.time()
            m = pretraining.read_packed_corpus(
                spark, dest, split="train", verify=False
            ).count()
            t_read = time.time() - t0
            print(
                f"packio pack_per_split={per_split}: write={t_write:.2f}s "
                f"read_verify={t_verify:.2f}s ({n} segments) "
                f"read_train_noverify={t_read:.2f}s ({m} segments)",
                flush=True,
            )
        finally:
            res.unpersist()
            shutil.rmtree(dest, ignore_errors=True)


def probe_packscale(spark) -> None:
    """read_packed_corpus' verifying startup checks at 1x and 10x packed
    volume (r12): both checks are single passes over the packed table, so
    the cost must read ~linear in segments — pinning the SCALING.md claim
    with a measurement instead of shape reasoning. The packed layout is
    synthesized directly (pack_sequences + hash_split over letter-rotation
    clones) — the upstream preset ladder is irrelevant to the reader."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kafka_connector_s3_sink_spark import pretraining
    from kafka_connector_s3_sink_spark.operators import packing, sampling

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    for factor in (1, 10):
        docs = _clones(docs1, factor) if factor > 1 else docs1
        packed = (
            packing.pack_sequences(docs, ctx_len=512)
            .join(sampling.hash_split(docs.select("doc_id")), "doc_id")
            .withColumn("mix_epoch", F.lit(0).cast("int"))
            .withMetadata("pack_id", {"pack_scope": "global"})
        )
        res = pretraining.PretrainingResult(packed=packed)
        dest = tempfile.mkdtemp(prefix=f"packscale{factor}-")
        try:
            t0 = time.time()
            pretraining.write_packed_corpus(res, dest)
            t_write = time.time() - t0
            t0 = time.time()
            n = pretraining.read_packed_corpus(spark, dest, verify=True).count()
            t_verify = time.time() - t0
            t0 = time.time()
            m = pretraining.read_packed_corpus(
                spark, dest, split="train", verify=False
            ).count()
            t_read = time.time() - t0
            print(
                f"packscale {factor}x: write={t_write:.2f}s "
                f"read_verify={t_verify:.2f}s ({n} segments) "
                f"read_train_noverify={t_read:.2f}s ({m} segments)",
                flush=True,
            )
        finally:
            shutil.rmtree(dest, ignore_errors=True)


def main() -> None:
    sections = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "hotband",
        "bigloops",
        "preset",
        "packio",
    ]
    spark = _spark()
    try:
        for s in sections:
            print(f"== {s} ==", flush=True)
            {"hotband": probe_hotband,
             "bigloops": probe_bigloops,
             "preset": probe_preset,
             "packio": probe_packio,
             "packscale": probe_packscale}[s](spark)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
