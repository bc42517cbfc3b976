#!/usr/bin/env python
"""Focused 1x-vs-Nx probe for the r9 operators. Same clone construction as
tools/probe_r8.py; prints a markdown row set for SCALING.md.

Claims under test:
- semantic_decontaminate_against_index: with the CORPUS side persisted
  (embsig/embvec grow Nx), a FIXED eval suite's decontam is bounded by the
  index scan — at-most-linear in the index, zero re-embedding, no
  index-side Exchange; and the scan cost is the bucketed read, so the
  10x time should grow at most ~linearly (the candidate set is fixed-ish:
  planted leaks only).
- append_to_embedding_index: linear in the BATCH (fixed batch appended to
  a 1x vs Nx index costs the same — O(batch), not O(history)).
- dedup_cascade_artifacts' candidate_clusters (the preset's split
  blocking): CC over candidate PAIRS only — pairs scale with collisions,
  not corpus^2; 1x vs Nx wall time should track the candidate count.
- pretraining_pipeline replica encode/decode (composite string ids): the
  pack path stays linear with upsampling replication.
- weighted_sample / gumbel 52-bit draws: TakeOrdered top-k, ~linear scan.

Usage: python tools/probe_r9.py [sf_dir] [factor]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_connector_s3_sink_spark.operators import (
        dedup,
        incremental,
        sampling,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-r9")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    dim = len(emb1.select("embedding").first()[0])
    # decorrelate clone TEXTS (letter-rotation translate), not just ids:
    # suffix-only clones would be near-dups of their originals, and a 10x
    # corpus of near-dups legitimately has ~100x candidate pairs — that
    # would measure the fixture's duplicate structure, not the operator's
    # corpus-size scaling
    alpha = "abcdefghijklmnopqrstuvwxyz"
    clones = [
        docs1.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.translate(
                F.col("text"), alpha, alpha[i % 26:] + alpha[: i % 26]
            ).alias("text"),
            "source",
        )
        for i in range(FACTOR)
    ]
    docsN = clones[0]
    for c in clones[1:]:
        docsN = docsN.unionByName(c)
    docsN = docsN.repartition(32).persist()
    docsN.count()
    eclones = [
        emb1.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            # rotate nothing — scaled copies keep hyperplane signs, which is
            # fine: the benchmark below is a FIXED small slice, so candidate
            # counts stay bounded by the planted leaks per clone
            F.transform("embedding", lambda x: x * (1.0 + F.lit(0.01) * i)).alias(
                "embedding"
            ),
        )
        for i in range(FACTOR)
    ]
    embN = eclones[0]
    for c in eclones[1:]:
        embN = embN.unionByName(c)
    embN = embN.repartition(32).persist()
    embN.count()

    bench_docs = docs1.filter(F.col("doc_id") % 13 == 0).persist()
    bench_docs.count()
    bench_emb = emb1.filter(F.col("doc_id") % 97 == 0).persist()
    bench_emb.count()

    rows = []

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn, warm=1):
        for _ in range(warm):
            fn()
        t0 = time.time()
        fn()
        rows.append((name, time.time() - t0))
        print(f"  {name}: {rows[-1][1]:.2f}s", flush=True)

    tmp = tempfile.mkdtemp(prefix="probe-r9-")
    try:
        for label, emb in (("1x", emb1), (f"{FACTOR}x", embN)):
            print(f"-- {label}: {emb.count()} vectors", flush=True)
            prefix = f"pr9{label}"
            incremental.build_embedding_index(
                emb, prefix, f"{tmp}/{label}", num_buckets=8, dim=dim
            )
            timed(
                f"semantic_decontam_vs_index_{label}",
                lambda prefix=prefix: noop(
                    incremental.semantic_decontaminate_against_index(
                        bench_emb, prefix, dim=dim
                    )
                ),
            )
            # fixed batch appended to a 1x vs Nx index: O(batch) contract
            batch = bench_emb.select(
                (F.col("doc_id") + 77_000_000).alias("doc_id"), "embedding"
            )
            t0 = time.time()
            incremental.append_to_embedding_index(
                batch, prefix, f"{tmp}/{label}", num_buckets=8, dim=dim,
                batch_id="probe-append",
            )
            rows.append((f"append_embedding_fixed_batch_{label}", time.time() - t0))
            print(f"  {rows[-1][0]}: {rows[-1][1]:.2f}s", flush=True)

        for label, docs in (("1x", docs1), (f"{FACTOR}x", docsN)):
            arts = None

            def build(docs=docs):
                nonlocal arts
                arts = dedup.dedup_cascade_artifacts(docs)
                noop(arts.candidate_clusters)

            timed(f"cascade_artifacts_candidate_cc_{label}", build, warm=0)
            timed(
                f"cluster_safe_split_{label}",
                lambda docs=docs: noop(
                    sampling.cluster_safe_split(
                        docs.select("doc_id").distinct(),
                        arts.candidate_clusters.select("doc_id", "cluster_id"),
                    )
                ),
            )
            timed(
                f"weighted_sample_52bit_{label}",
                lambda docs=docs: noop(
                    sampling.weighted_sample(
                        docs.withColumn("w", F.length("text").cast("double")),
                        k=1000,
                        weight_col="w",
                    )
                ),
            )
    finally:
        for label in ("1x", f"{FACTOR}x"):
            incremental.drop_dedup_index(spark, f"pr9{label}")
        shutil.rmtree(tmp, ignore_errors=True)

    print("\n| op | 1x sec | Nx sec | ratio |")
    print("|---|---|---|---|")
    byname = dict(rows)
    for base in sorted({n.rsplit("_", 1)[0] for n, _ in rows}):
        a = byname.get(f"{base}_1x")
        b = byname.get(f"{base}_{FACTOR}x")
        if a is None or b is None:
            continue
        print(f"| {base} | {a:.2f} | {b:.2f} | {b / max(a, 1e-9):.1f}x |")


if __name__ == "__main__":
    main()
