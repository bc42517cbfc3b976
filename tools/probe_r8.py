#!/usr/bin/env python
"""Focused 1x-vs-10x probe for the r8 operators. Same clone construction as
tools/scale_probe.py; prints a markdown row set for SCALING.md.

Claims under test:
- dsir_log_weights / dsir_resample: both bucket fits collapse to <=m rows
  (broadcast), scoring is one exploded scan + one doc-keyed agg, the top-k
  is TakeOrdered — the whole chain must scale ~linearly in the corpus.
- near_decontamination_matches: corpus-side bands stream against a FIXED
  broadcast benchmark — linear in the corpus, never all-pairs.
- trigram_perplexity (self-trained): two corpus aggregations + equi-joins
  back — at-most-linear (the model tables are Zipf-sparse).
- mixture_sample with rates > 1: narrow per-row replication — linear.
- corpus_diff: one full outer equi-join on the id — linear.
- Avro OCF grouped write of the record stream — linear in records.

Usage: python tools/probe_r8.py [sf_dir] [factor]
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

    from kafka_connector_s3_sink_spark.config import (
        CompressionType,
        EngineConfig,
        FormatType,
        OutputField,
    )
    from kafka_connector_s3_sink_spark.operators import (
        dedup,
        drift,
        quality,
        sampling,
        selection,
    )
    from kafka_connector_s3_sink_spark.records import kafka_records_from_events
    from kafka_connector_s3_sink_spark.sinks.writer import write_batch

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-r8")
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
    clones = [
        docs1.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" clone{i}")).alias("text"),
            "source",
        )
        for i in range(FACTOR)
    ]
    docsN = clones[0]
    for c in clones[1:]:
        docsN = docsN.unionByName(c)
    docsN = docsN.repartition(32).persist()
    docsN.count()

    recs1 = kafka_records_from_events(spark, SF_DIR)
    rclones = [
        recs1.withColumn("offset", F.col("offset") + F.lit(i * 1_000_000_000))
        for i in range(FACTOR)
    ]
    recsN = rclones[0]
    for c in rclones[1:]:
        recsN = recsN.unionByName(c)
    recsN = recsN.repartition(32).persist()
    recsN.count()

    # fixed target / benchmark: NEVER scales with the corpus
    target = docs1.filter(F.col("doc_id") % 7 == 0).persist()
    target.count()
    benchmark = (
        docs1.filter(F.col("doc_id") % 13 == 0)
        .select("doc_id", "text")
        .persist()
    )
    benchmark.count()

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

    for label, docs, recs in (("1x", docs1, recs1), (f"{FACTOR}x", docsN, recsN)):
        print(f"-- {label}: {docs.count()} docs", flush=True)

        timed(
            f"dsir_weights_{label}",
            lambda: noop(selection.dsir_log_weights(docs, target, n_buckets=1024)),
        )
        timed(
            f"dsir_resample_{label}",
            lambda: noop(
                selection.dsir_resample(docs, target, k=100, n_buckets=1024)
            ),
        )
        timed(
            f"near_decontam_{label}",
            lambda: noop(
                dedup.near_decontamination_matches(docs, benchmark)
            ),
        )
        # semantic decontam: corpus embeddings (synthesized from doc ids —
        # the shape matters, not the values) vs a FIXED benchmark set
        emb = docs.select(
            F.col("doc_id").alias("vec_id"),
            F.array(
                *[
                    (F.col("doc_id") % (7 + i) - (3 + i) / 2.0).cast("double")
                    for i in range(16)
                ]
            ).alias("embedding"),
        )
        bench_emb = emb.filter(F.col("vec_id") % 13 == 0).limit(100)
        timed(
            f"semantic_decontam_{label}",
            lambda: noop(
                dedup.semantic_decontamination_matches(
                    emb, bench_emb, dim=16, cosine_threshold=0.999
                )
            ),
        )
        timed(
            f"trigram_ppl_{label}",
            lambda: noop(quality.trigram_perplexity(docs)),
        )
        timed(
            f"mixture_upsample_{label}",
            lambda: noop(
                sampling.mixture_sample(
                    docs, {"src0": 2.3, "src1": 1.0, "src2": 0.4},
                    epoch_col="mix_epoch",
                )
            ),
        )
        # diff each scale's corpus against a perturbed copy of itself —
        # BOTH sides scale, the join is the claim
        perturbed = docs.filter(F.col("doc_id") % 5 != 0).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.col("text"), F.lit(" edit")),
            ).otherwise(F.col("text")).alias("text"),
        )
        timed(
            f"corpus_diff_{label}",
            lambda: noop(drift.corpus_diff(docs, perturbed)),
        )

        cfg = EngineConfig(
            format_type=FormatType.AVRO,
            file_compression=CompressionType.ZSTD,
            output_fields=(OutputField.KEY, OutputField.OFFSET,
                           OutputField.TIMESTAMP, OutputField.VALUE),
        )

        def avro_write():
            dest = tempfile.mkdtemp(prefix=f"probe_avro_{label}_")
            try:
                write_batch(recs, cfg, dest)
            finally:
                shutil.rmtree(dest, ignore_errors=True)

        timed(f"avro_write_{label}", avro_write)

    print("\n| op | " + " | ".join(n for n, _ in rows) + " |")
    print("| t(s) | " + " | ".join(f"{t:.1f}" for _, t in rows) + " |")


if __name__ == "__main__":
    main()
