#!/usr/bin/env python
"""r9 ABAB noise probe (VERDICT r8 item 4): `tpch_order_analytics` and
`ann_topk` moved 3.93->4.88s (6.47 in the driver re-run) and 3.09->3.92s
r7->r8 with ZERO code change to their hot paths (`relational.py` /
`similarity.py` untouched — judge-verified). Same protocol that closed the
r7 item-2 deltas as noise: fresh process per run, one checkout per process
(`sys.path[0]` = the worktree), bench session config, 1 cold + 3 warm noop
passes, median reported; runs interleaved A(r7) B(HEAD) A B on a quiet
machine so slow drift (page cache, thermal) hits both arms.

Usage:
  python tools/probe_r9_abab.py <checkout_dir> <entry>   # one arm, one entry
  python tools/probe_r9_abab.py --drive                  # full ABAB schedule

Point at the current round's suspects without editing the file:
  ABAB_ARMS="r9:/tmp/r9probe,head:/root/repo" \
  ABAB_ENTRIES="dedup_clusters,sink_group_key_upsert" \
  python tools/probe_r9_abab.py --drive
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ENTRIES = os.environ.get(
    "ABAB_ENTRIES", "tpch_order_analytics,ann_topk"
).split(",")
ARMS = dict(
    a.split(":", 1)
    for a in os.environ.get("ABAB_ARMS", "r7:/tmp/r7probe,head:/root/repo").split(",")
)


def run_one(checkout: str, entry: str) -> float:
    sys.path.insert(0, checkout)
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("abab-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    fn = entrymod.queries()[entry]

    def run():
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    run()
    entrymod.release_caches()
    warm = []
    for _ in range(3):
        t1 = time.time()
        run()
        warm.append(time.time() - t1)
        entrymod.release_caches()
    return sorted(warm)[1]


def drive() -> None:
    results: dict[str, dict[str, list[float]]] = {
        e: {a: [] for a in ARMS} for e in ENTRIES
    }
    # interleave arms: A B A B per entry
    for _ in range(2):
        for arm, checkout in ARMS.items():
            for entry in ENTRIES:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), checkout, entry],
                    capture_output=True,
                    text=True,
                    timeout=900,
                )
                line = out.stdout.strip().splitlines()[-1]
                t = json.loads(line)["median_warm_sec"]
                results[entry][arm].append(t)
                print(f"{arm:5s} {entry}: {t:.2f}s", flush=True)
    print(json.dumps(results))
    old_arm, new_arm = list(ARMS)[0], list(ARMS)[-1]
    for entry in ENTRIES:
        a = results[entry][old_arm]
        b = results[entry][new_arm]
        ratio = (sum(b) / len(b)) / (sum(a) / len(a))
        verdict = "NOISE (within 1.2x)" if ratio <= 1.2 else "REGRESSION?"
        print(
            f"{entry}: {old_arm} {sorted(a)} vs {new_arm} {sorted(b)} "
            f"-> mean ratio {ratio:.2f}x: {verdict}"
        )


if __name__ == "__main__":
    if "--drive" in sys.argv[1:]:
        drive()
    else:
        checkout, entry = sys.argv[1], sys.argv[2]
        t = run_one(checkout, entry)
        print(json.dumps({"checkout": checkout, "entry": entry,
                          "median_warm_sec": round(t, 3)}))
