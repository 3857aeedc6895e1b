"""SemDeDup-style semantic deduplication (cluster-then-prune).

The published SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540)
for pruning semantically redundant training data: k-means-cluster the
embedding space, then compare pairs only WITHIN each cluster and drop
near-duplicates above a cosine threshold. The clustering bounds the
quadratic term — all-pairs cost n² becomes k·(n/k)² — and the
per-cluster work is embarrassingly parallel.

Spark shape: the trainer is the IVF spherical k-means
(operators.ivf.train_centroids — DataFrame aggregates, only k
centroid vectors on the driver), assignment is the same one-gemm
Arrow UDF, and the within-cluster pair generation is a codegen'd
self-join on ``list_id`` — at 100 TB the index table is written
partitioned by ``list_id`` so the self-join co-locates without a
shuffle. Verification reuses the vectorized exact-cosine pass, so
false positives are impossible (same band-then-verify discipline as
the MinHash and hyperplane-LSH paths).

Determinism: everything upstream is deterministic (md5-ordered
sample/init, fixed Lloyd iterations, lower-id ties), which is what
lets the registered query carry a generated DuckDB oracle
(ann_oracles.semantic_dedup_oracle) despite the iterative trainer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_spark.operators import ivf
from gmall_spark.operators.similarity import _verify_pairs


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_lists: int = ivf.IVF_LISTS,
    iters: int = ivf.IVF_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(id_a, id_b, cos_sim) near-dup pairs found within k-means
    clusters (id_a < id_b, cos_sim >= threshold).

    Versus the all-pairs scan this misses only pairs straddling a
    cluster boundary — the SemDeDup trade: at production scale the
    clusters are tight enough (k grows with n) that boundary pairs
    are rare, and the cost drops from n² to k·(n/k)².
    """
    centroids = centroids or ivf.train_centroids(
        embeddings, n_lists, iters, id_col=id_col, vec_col=vec_col
    )
    index = ivf.build_index(embeddings, centroids, id_col, vec_col).select(
        "vec_id", "list_id"
    )
    other = index.select(
        F.col("vec_id").alias("vid2"), F.col("list_id")
    )
    cand = (
        index.join(other, "list_id")
        .filter(F.col("vec_id") < F.col("vid2"))
        .select(F.col("vec_id").alias("id_a"), F.col("vid2").alias("id_b"))
    )
    return _verify_pairs(cand, embeddings, threshold, id_col, vec_col)


def semantic_dedup_keepers(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    **kwargs,
) -> DataFrame:
    """Corpus ids minus the higher member of every within-cluster
    near-dup pair (the SemDeDup pruning decision)."""
    drops = (
        semantic_dedup_pairs(embeddings, threshold, id_col=id_col, **kwargs)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return embeddings.select(id_col).join(drops, id_col, "anti")
