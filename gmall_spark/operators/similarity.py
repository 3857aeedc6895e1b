"""Similarity search over embedding columns (array<float>).

Two tiers (BASELINE extension mandate):

- brute-force cosine top-k: exact baseline. The query set is
  broadcast; each partition scores its vectors locally, then a single
  top-k-per-query window runs on (query, score). No all-to-all.
- LSH-bucketed ANN: deterministic hyperplane signatures (md5-derived
  planes — no RNG, resumable) bucket the corpus; queries probe only
  their bucket. The scale path: at 100 TB each query touches
  |corpus| / 2^bits vectors in expectation.

Ranking ties are broken by vec_id so results are deterministic; the
score is rounded before ranking so Spark's and the oracle's float
folds agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gmall_spark.functions.vectors import cosine, dot


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is small -> broadcast cross join; cosine runs as a
    codegen'd higher-order function; row_number picks k per query.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            "cos_sim",
        )
    )


def hyperplane_signature(vec: Column, n_planes: int, dim: int) -> Column:
    """Deterministic random-hyperplane LSH signature (int bucket id).

    Plane p's component d is +1/-1 from a bit of md5(f"{p}:{d}") —
    reproducible across engines and runs without storing plane
    matrices. sign(dot(vec, plane)) per plane -> n_planes-bit bucket.
    """
    from gmall_spark.functions.text import nibble

    sig = F.lit(0)
    for p in range(n_planes):
        acc = F.lit(0.0)
        for d in range(dim):
            # one md5 per (plane, dim) constant — folded at plan time
            h = F.md5(F.lit(f"{p}:{d}"))
            bit = (nibble(F.substring(h, 1, 1)) % 2 == 1).cast("int")
            coef = (bit * 2 - 1).cast("double")
            acc = acc + F.element_at(vec, d + 1).cast("double") * coef
        sig = sig + F.when(acc > 0, F.lit(2**p)).otherwise(F.lit(0))
    return sig.cast("bigint")


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: score only corpus vectors in the query's hyperplane bucket."""
    sig = hyperplane_signature(F.col(vec_col), n_planes, dim)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        sig.alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sig.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            "cos_sim",
        )
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos_sim >= threshold).

    Exact all-pairs formulation: self cross join blocked to the upper
    triangle (id_a < id_b halves the work); cosine runs as a codegen'd
    higher-order fold, the filter prunes before any wide row is built.
    At 100 TB the same verify step runs after an LSH candidate
    prefilter instead of the cross join: bucket both sides with
    ``hyperplane_signature`` and equi-join on the bucket (cost tracks
    duplicate density, not corpus²) at the price of recall < 1.
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
