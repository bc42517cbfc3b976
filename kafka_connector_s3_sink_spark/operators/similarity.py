"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set against the
(huge) corpus; per-row work is a JVM ``zip_with``/``aggregate`` dot product, so
the scan parallelizes over corpus partitions with zero shuffle until the final
per-query top-k aggregation.

Scale path: LSH-bucketed ANN — random-hyperplane signs bucket the corpus; only
same-bucket candidates are scored. Bucket ids are deterministic (seeded
md5-derived hyperplanes) so results are reproducible.

All float math is done in double with explicit rounding so the DuckDB oracle
hash-matches.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from kafka_connector_s3_sink_spark.functions.numeric import stable_round


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    Plan: broadcast(queries) ⋈ corpus (no shuffle of the corpus), then a single
    ``min_by``-style top-k via groupBy(query).agg over (cosine, id) — partial
    aggregation keeps only k candidates per task. Implemented with a window for
    exact rank semantics; ties broken by corpus id for determinism.
    """
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("cvec")
    ).withColumn("cnorm", l2norm(F.col("cvec")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    ).withColumn("qnorm", l2norm(F.col("qvec")))
    # norms precomputed per row below the join — the interpreted fold would
    # otherwise run per (query × corpus) pair
    scored = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("nbr_id"))
    scored = scored.select(
        "query_id",
        "nbr_id",
        stable_round(
            dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")), 4
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5(seed, plane, coord):
    component = (md5_int mod 2001 - 1000) / 1000 ∈ [-1, 1]. No numpy RNG —
    reproducible across engines and versions."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append(((int(h[:8], 16) % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_bucket_column(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane, packed into a string
    like '1011…' (string keeps it engine-portable)."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(c) for c in plane])) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH bucket.

    At 100 TB the corpus side is pre-bucketed (partitioned/bucketed table on
    the bucket id) so a query probe touches one bucket's partitions only.
    """
    from pyspark.sql import Window

    planes = _hyperplanes(dim, n_planes)
    c = (
        corpus.select(
            F.col(id_col).alias("nbr_id"),
            F.col(vec_col).cast("array<double>").alias("cvec"),
        )
        .withColumn("bucket", lsh_bucket_column(F.col("cvec"), planes))
        .withColumn("cnorm", l2norm(F.col("cvec")))
    )
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qvec"),
        )
        .withColumn("bucket", lsh_bucket_column(F.col("qvec"), planes))
        .withColumn("qnorm", l2norm(F.col("qvec")))
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select(
            "query_id",
            "nbr_id",
            stable_round(
                dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )
