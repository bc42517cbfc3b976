"""Sequence packing and file compaction for training-data pipelines.

``pack_sequences`` maps a document corpus onto fixed-length training context
windows (the GPT-style concat-and-chunk formulation): documents are laid out
in a deterministic pseudo-random order, token positions are assigned by a
GLOBAL prefix sum, and each document is split across the context windows
(packs) it spans. The whole layout is declarative:

- the global prefix sum is the classic two-level formulation — a per-shard
  running-sum window (one hash shuffle) plus a shard-offset table of
  ``n_shards`` rows joined back by broadcast — never a single-partition
  window over the corpus;
- pack membership is ``explode(sequence(first_pack, last_pack))`` — each row
  fans out only to the packs it actually overlaps, so the output is
  O(tokens / ctx_len + docs) rows regardless of corpus size;
- ordering and sharding reuse ``sampling.shuffle_key`` / ``hash_bucket``
  (md5-derived), so the layout is reproducible run-to-run and the whole
  operator is oracle-checkable in DuckDB with the same expressions.

``compaction_plan`` / ``compact_parquet`` address the small-files problem an
incremental 100 TB ingest accumulates: plan target-size output groups over the
file-metadata listing (O(n_files) rows, not O(data)), then rewrite.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.operators.sampling import hash_bucket, shuffle_key
from kafka_connector_s3_sink_spark.operators.text import token_count


def pack_sequences(
    df: DataFrame,
    ctx_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
    n_shards: int = 32,
) -> DataFrame:
    """Assign every document its segments in fixed-``ctx_len`` training packs.

    Output grain: one row per (document, pack) overlap —
    ``doc_id, n_tokens, pack_id, pack_pos, doc_offset, seg_tokens`` where
    ``pack_pos`` is the segment's start slot inside the pack and
    ``doc_offset`` the first packed token's offset within the document.
    Zero-token documents pack nowhere and are dropped (documented; count them
    upstream with ``text.token_count`` if they must be accounted).

    Scale shape: one hash shuffle (shard window) + one broadcast join
    (``n_shards`` offset rows) + a narrow fan-out. The shard-offset window
    sorts ``n_shards`` rows on a single task — bounded by config, not data.
    """
    if ctx_len <= 0:
        raise ValueError(f"ctx_len must be positive, got {ctx_len}")
    did = F.col(id_col)
    toks = (
        df.select(
            did,
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
            (hash_bucket(did, seed) % n_shards).alias("_shard"),
            shuffle_key(did, seed).alias("_ord"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    w_shard = (
        Window.partitionBy("_shard")
        .orderBy(F.col("_ord").asc(), did.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = toks.withColumn("_cum", F.sum("n_tokens").over(w_shard))

    shard_totals = toks.groupBy("_shard").agg(F.sum("n_tokens").alias("_shard_toks"))
    w_off = (
        Window.orderBy(F.col("_shard").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = shard_totals.select(
        "_shard", F.coalesce(F.sum("_shard_toks").over(w_off), F.lit(0)).alias("_off")
    )

    placed = local.join(F.broadcast(offsets), "_shard").select(
        did,
        "n_tokens",
        (F.col("_off") + F.col("_cum") - F.col("n_tokens")).alias("_start"),
    )
    start, n = F.col("_start"), F.col("n_tokens")
    first_pack = F.floor(start / ctx_len)
    last_pack = F.floor((start + n - 1) / ctx_len)
    packed = placed.select(
        did,
        "n_tokens",
        "_start",
        F.explode(F.sequence(first_pack, last_pack)).alias("pack_id"),
    )
    seg_start = F.greatest(start, F.col("pack_id") * ctx_len)
    seg_end = F.least(start + n, (F.col("pack_id") + 1) * ctx_len)
    return packed.select(
        did,
        "n_tokens",
        "pack_id",
        (seg_start - F.col("pack_id") * ctx_len).alias("pack_pos"),
        (seg_start - start).alias("doc_offset"),
        (seg_end - seg_start).alias("seg_tokens"),
    )


def pack_stats(packed: DataFrame, ctx_len: int) -> DataFrame:
    """Per-pack rollup of a ``pack_sequences`` result: document count, packed
    tokens, and fill ratio (only the final pack may be partial — everything
    else is exactly ``ctx_len`` by construction, which this rollup proves)."""
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("seg_tokens").alias("pack_tokens"),
        )
        .withColumn("fill_ratio", F.col("pack_tokens") / F.lit(float(ctx_len)))
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    path_col: str = "path",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Group a file listing into target-size compaction bins: files in path
    order, a running byte total, and ``bin = floor(preceding_bytes / target)``
    — i.e. the bins are consecutive ``target_bytes`` byte-ranges of the
    concatenated stream, and each file lands in the bin containing its first
    byte. A non-last bin's total therefore deviates from ``target_bytes`` by
    at most one file size in either direction (a boundary-straddling file
    stays whole in the bin where it starts) — the same
    overshoot-by-one-element contract as Spark's ``maxRecordsPerFile``.

    The window runs over FILE METADATA (one row per file). A million-file
    listing is a few tens of MB — driver-trivial; partition the window by
    table/date directory if a single listing ever exceeds that."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    w = (
        Window.orderBy(F.col(path_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
    return files.select(
        F.col(path_col),
        F.col(bytes_col),
        F.floor(before / target_bytes).cast("int").alias("bin"),
    )


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a directory of small parquet files into ~``target_bytes``
    outputs. Output-file count derives from the listing's total bytes (local
    paths here; an object-store deployment reads sizes from the FS client the
    same way — the plan, a round-robin ``repartition``, is storage-agnostic).
    Returns the number of output partitions written."""
    df = spark.read.parquet(src_dir)
    paths = [p.removeprefix("file:") for p in df.inputFiles()]
    total = sum(os.path.getsize(p) for p in paths)
    n_out = max(1, math.ceil(total / target_bytes))
    df.repartition(n_out).write.mode("overwrite").parquet(dest_dir)
    return n_out
