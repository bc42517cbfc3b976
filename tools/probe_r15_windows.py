#!/usr/bin/env python
"""10× scale probe for the BPE window read and the r15 serving plan
(VERDICT r14 item 5).

Builds a real two-epoch BPE ingest (the exact r14-measurement shape: sf0.1
documents, 200 merges, ctx 2048) at 1× and at N× (clones get offset ids AND
a distinct per-clone suffix token, so the ingest's dedup cascade keeps them
— data volume scales, the read path is probed against a genuinely larger
corpus), then times:

- ``read_ingest_windows`` verify=True / verify=False at both scales — the
  claim under test is "linear scan shape": the N× read should be ~N× the
  1× read, with no super-linear cliff and no O(corpus) driver step;
- the EXECUTED shuffle count of the verified read at both scales (diffing
  the AppStatusStore's shuffle-write stages around the action, the same
  ground-truth counter tools/audit_plans.py uses) — the shuffle COUNT must
  not grow with data, only the per-shuffle volume;
- ``serving.write_serving_plan`` (2 epochs) + a mid-corpus
  ``read_serving_plan`` resume at both scales — the r15 surface's one
  window shuffle + broadcast offsets must hold the same flat shuffle count.

Prints a markdown table for SCALING.md. Usage:
    python tools/probe_r15_windows.py [sf_dir] [factor]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def _shuffle_write_stages(spark):
    jvm = spark._jvm
    store = spark._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    doubles = spark.sparkContext._gateway.new_array(jvm.double, 0)
    seq = store.stageList(empty, False, False, doubles, empty)
    return {
        seq.apply(i).stageId(): seq.apply(i).shuffleWriteBytes()
        for i in range(seq.size())
    }


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_connector_s3_sink_spark.operators import (
        incremental,
        serving,
        tokenizer,
    )
    from kafka_connector_s3_sink_spark.streaming import ingest

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-r15-windows")
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
    # decorrelate clone TEXTS (letter-rotation translate, the r9 probe's
    # fixture rule) — suffix-only clones would be near-dups the ingest
    # cascade legitimately deletes, collapsing the 10x corpus back to 1x
    alpha = "abcdefghijklmnopqrstuvwxyz"
    clones = [
        docs1.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            F.translate(
                F.col("text"), alpha, alpha[k % 26:] + alpha[: k % 26]
            ).alias("text"),
        )
        for k in range(FACTOR)
    ]
    docsN = clones[0]
    for c in clones[1:]:
        docsN = docsN.unionByName(c)
    docsN = docsN.repartition(32).persist()
    docsN.count()

    wf = tokenizer.word_frequencies(docs1.limit(500))
    merges = tokenizer.fit_bpe(wf, n_merges=200)

    def timed(fn, warm=1, reps=3):
        for _ in range(warm):
            fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    results = []
    for label, docs in (("1x", docs1), (f"{FACTOR}x", docsN)):
        tmp = tempfile.mkdtemp(prefix=f"probe_win_{label}_")
        prefix = f"pr15{label}"
        loc = os.path.join(tmp, "index")
        base = spark.createDataFrame(
            [(999_999_999, "probe history seed document text")],
            ["doc_id", "text"],
        )
        incremental.build_dedup_index(base, prefix, loc, num_buckets=8)
        cfg = ingest.IngestConfig(
            index_prefix=prefix,
            index_location=loc,
            dest_dir=os.path.join(tmp, "out"),
            checkpoint_location=os.path.join(tmp, "ckpt"),
            num_buckets=8,
            ctx_len=2048,
            split_weights={"train": 1.0},
            bpe_merges=tuple(merges),
        )
        t0 = time.time()
        for epoch in range(2):
            # disjoint halves per epoch (parity; the 10M clone offset is
            # even, so clones keep their base doc's parity) — feeding the
            # same docs twice would just exact-dedup epoch 1 to nothing
            ingest.process_crawl_batch(
                docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == epoch),
                epoch,
                cfg,
            )
        t_ingest = time.time() - t0

        t_ver = timed(
            lambda: noop(ingest.read_ingest_windows(spark, cfg.dest_dir))
        )
        t_raw = timed(
            lambda: noop(
                ingest.read_ingest_windows(spark, cfg.dest_dir, verify=False)
            )
        )
        before = _shuffle_write_stages(spark)
        noop(ingest.read_ingest_windows(spark, cfg.dest_dir))
        after = _shuffle_write_stages(spark)
        n_shuf = sum(
            1 for sid, b in after.items() if sid not in before and b > 0
        )

        layout = ingest.read_ingest_packs(
            spark, cfg.dest_dir, verify=False
        ).withColumn(
            "pack_id",
            F.concat_ws("#", F.col("batch_id"), F.col("pack_id")),
        )
        n_packs = layout.select("pack_id").distinct().count()
        t_plan = timed(
            lambda: serving.write_serving_plan(
                layout, tmp, n_shards=32, epochs=2
            ),
            warm=0,
            reps=1,
        )
        before = _shuffle_write_stages(spark)
        noop(
            serving.read_serving_plan(
                spark, tmp, epoch=1, from_step=n_packs // 2
            )
        )
        after = _shuffle_write_stages(spark)
        s_shuf = sum(
            1 for sid, b in after.items() if sid not in before and b > 0
        )
        t_resume = timed(
            lambda: noop(
                serving.read_serving_plan(
                    spark, tmp, epoch=1, from_step=n_packs // 2
                )
            )
        )
        incremental.drop_dedup_index(spark, prefix)
        results.append(
            (
                label,
                n_packs,
                t_ingest,
                t_ver,
                t_raw,
                n_shuf,
                t_plan,
                t_resume,
                s_shuf,
            )
        )
        print(f"done {label}: packs={n_packs}", flush=True)

    print()
    print(
        "| scale | packs | ingest 2ep | win read (verify) | win read (raw) "
        "| win shuffles | plan write 2ep | resume read | resume shuffles |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r[0]} | {r[1]} | {r[2]:.1f}s | {r[3]:.2f}s | {r[4]:.2f}s "
            f"| {r[5]} | {r[6]:.1f}s | {r[7]:.2f}s | {r[8]} |"
        )
    (l1, lN) = results
    print()
    print(
        f"verified-read scale ratio: {lN[3] / l1[3]:.2f}x for {FACTOR}x data; "
        f"raw {lN[4] / l1[4]:.2f}x; shuffle count {l1[5]} -> {lN[5]} "
        f"(must be equal); resume shuffles {l1[8]} -> {lN[8]}"
    )


if __name__ == "__main__":
    main()
