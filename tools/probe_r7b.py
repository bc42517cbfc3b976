#!/usr/bin/env python
"""Focused 1x-vs-10x probe for the late-r7 operators (substring span dedup,
per-domain capping, perceptual media index). Same clone construction as
tools/scale_probe.py; prints a markdown row set for SCALING.md.

Claims under test:
- duplicate_spans: one corpus-wide hash shuffle + per-doc windows — linear.
- cap_per_domain: salted two-phase must stay healthy when one domain holds
  a constant share of a 10x corpus (the hot-domain case the plain window
  funnels into one task).
- incremental_media_dedup: classifying a FIXED batch against a 10x-grown
  phash index must stay ~flat (broadcast-batch join, history never moves).

Usage: python tools/probe_r7b.py [sf_dir] [factor]
"""

from __future__ import annotations

import os
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
        multimodal,
        sampling,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-r7b")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    clones = [
        docs1.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" clone{i}")).alias("text"),
        )
        for i in range(FACTOR)
    ]
    docsN = clones[0]
    for c in clones[1:]:
        docsN = docsN.unionByName(c)

    rows = []

    def timed(name, fn, warm=1):
        for _ in range(warm):
            fn()
        t0 = time.time()
        fn()
        rows.append((name, time.time() - t0))
        print(f"  {name}: {rows[-1][1]:.2f}s", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    fixed_media = multimodal.media_from_documents(
        docs1.filter(F.col("doc_id") % 50 == 3)
    )

    for label, docs in (("1x", docs1), (f"{FACTOR}x", docsN)):
        print(f"-- {label}: {docs.count()} docs", flush=True)

        # substring span dedup: linear (hash shuffle + doc windows)
        timed(
            f"duplicate_spans_{label}",
            lambda: noop(dedup.duplicate_spans(docs, span_tokens=8)),
        )

        # hot-domain capping: domain 'hot.com' holds ~1/3 of the corpus at
        # every scale; salted two-phase bounds its window input at K*salts
        domained = docs.withColumn(
            "domain",
            F.when(F.col("doc_id") % 3 == 0, F.lit("hot.com")).otherwise(
                F.concat(
                    F.lit("s"), (F.col("doc_id") % 997).cast("string"), F.lit(".com")
                )
            ),
        )
        timed(
            f"cap_plain_{label}",
            lambda: noop(
                sampling.cap_per_domain(domained, "domain", 20).filter("kept")
            ),
        )
        timed(
            f"cap_salted_{label}",
            lambda: noop(
                sampling.cap_per_domain(
                    domained, "domain", 20, n_salts=16
                ).filter("kept")
            ),
        )

        # media phash index at this scale (fake hasher: the claim is the
        # JOIN shape, not the decoder), then classify the FIXED batch
        media = multimodal.media_from_documents(docs)
        loc = tempfile.mkdtemp(prefix=f"probe_midx_{label}_")
        t0 = time.time()
        multimodal.build_media_index(
            media,
            f"probemidx_{label}",
            loc,
            num_buckets=16,
            hasher=multimodal.fake_perceptual_hash,
        )
        rows.append((f"media_index_build_{label}", time.time() - t0))
        print(f"  media_index_build_{label}: {rows[-1][1]:.2f}s", flush=True)
        timed(
            f"media_classify_fixed_batch_vs_{label}",
            lambda: noop(
                multimodal.incremental_media_dedup(
                    fixed_media,
                    f"probemidx_{label}",
                    hasher=multimodal.fake_perceptual_hash,
                )
            ),
        )
        multimodal.drop_media_index(spark, f"probemidx_{label}")

    print("\n| op | " + " | ".join(n for n, _ in rows) + " |")
    print("| t(s) | " + " | ".join(f"{t:.1f}" for _, t in rows) + " |")


if __name__ == "__main__":
    main()
