"""Incremental (streaming) IVF index maintenance: a continuously-
ingesting ANN index.

The ANN operators (operators/ivf.py, operators/pq.py) build their
inverted index from a static corpus; a production embedding store
INGESTS — new vectors arrive continuously and must become searchable
without re-indexing the corpus. This module is that path, in the
faiss-at-scale shape: the coarse quantizer (centroids) is FIXED
(trained offline on a bounded sample, retrained out-of-band when
drift warrants — assignments are append-only between retrains), and
each micro-batch is one embarrassingly-parallel gemm assignment pass
appended to a list_id-PARTITIONED parquet store. Probing reads ONLY
the nprobe matching partitions (partition pruning at the scan —
asserted on the plan), so query cost tracks nprobe/n_lists of the
corpus no matter how many batches have been ingested.

Batch-equals-streaming: assignment depends only on (vector,
centroids), so the union of per-batch assignments IS the batch-built
index — row for row (asserted by tests/test_streaming.py), and
top-k probed from the store equals ``ivf.ivf_topk`` on the union
with the same centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_spark.functions.vectors import cosine
from gmall_spark.operators import ivf


def process_batch(
    batch: DataFrame,
    centroids: list[list[float]],
    store_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Assign one micro-batch against the FIXED coarse quantizer and
    append it to the partitioned index store."""
    assigned = ivf.build_index(batch, centroids, id_col, vec_col)
    assigned.write.mode("append").partitionBy("list_id").parquet(store_dir)


def read_index(spark: SparkSession, store_dir: str) -> DataFrame:
    """The index as of the last completed batch."""
    return spark.read.parquet(store_dir)


def topk_from_store(
    spark: SparkSession,
    store_dir: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = ivf.IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``ivf.ivf_topk`` semantics against the persisted store: the
    probed list_ids reach the scan as partition filters, so only
    nprobe/n_lists of the store's files are read."""
    index = read_index(spark, store_dir)
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            ivf._nearest_lists_udf(centroids, nprobe)(F.col(vec_col))
        ).alias("list_id"),
    )
    scored = (
        index.join(F.broadcast(probes), "list_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine("qvec", "embedding"), 6).alias("cos_sim"),
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
