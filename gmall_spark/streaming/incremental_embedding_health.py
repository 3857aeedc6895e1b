"""Incremental (streaming) embedding-table health audit — X186's twin
in the X179 SUM-mergeable equality class.

X186 deliberately reports ONLY order-independent statistics (min/max
envelopes and integer counts — never a float SUM), which makes every
one of them mergeable: per-dimension min-of-mins / max-of-maxes /
sum-of-zeros, and corpus counters summed. The one non-SUM field,
n_widths (distinct embedding widths), merges exactly too because the
per-batch state is keyed BY width — the distinct count happens at the
read over the merged keys. So streaming state after ANY batch split
is EXACTLY the batch audit over the union, bit-identical.

Idempotence comes from the per-batch-subdir overwrite (the CMS/
value-hist pattern). At 100 TB the subdirs become date partitions and
current_health a scheduled rollup, unchanged.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DIM_SCHEMA = "dim long, dim_min double, dim_max double, zeros long"
_CORPUS_SCHEMA = (
    "width int, n_vectors long, nan_vectors long, zero_vectors long"
)
_BATCH_DIR_RE = _re.compile(r"^b\d+$")


def _dirs(root: str, sub: str) -> list[str]:
    base = os.path.join(root, sub)
    try:
        return sorted(
            os.path.join(base, d)
            for d in os.listdir(base)
            if _BATCH_DIR_RE.match(d)
        )
    except FileNotFoundError:
        return []


def process_batch(
    spark: SparkSession,
    batch_emb: DataFrame,
    store_root: str,
    batch_id: int,
) -> None:
    """Audit one micro-batch of (vec_id, embedding) rows: per-dim
    envelope partials and per-WIDTH corpus counters, each to the
    batch's own subdir (idempotent overwrite)."""
    e = batch_emb.select(
        F.size("embedding").alias("width"),
        F.aggregate(
            F.transform(
                "embedding",
                lambda x: F.when(F.isnan(x.cast("double")), 1).otherwise(0),
            ),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("nan_ct"),
        F.aggregate(
            F.transform(
                "embedding",
                lambda x: F.when(x.cast("double") == 0.0, 0).otherwise(1),
            ),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("nonzero_ct"),
    )
    corpus = e.groupBy("width").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.when(F.col("nan_ct") > 0, 1).otherwise(0))
        .cast("long")
        .alias("nan_vectors"),
        F.sum(F.when(F.col("nonzero_ct") == 0, 1).otherwise(0))
        .cast("long")
        .alias("zero_vectors"),
    )
    dims = (
        batch_emb.select(
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("dim0", "x")
        )
        .select((F.col("dim0") + 1).cast("long").alias("dim"), "x")
        .groupBy("dim")
        .agg(
            F.min("x").alias("dim_min"),
            F.max("x").alias("dim_max"),
            F.sum(F.when(F.col("x") == 0.0, 1).otherwise(0))
            .cast("long")
            .alias("zeros"),
        )
    )
    dims.write.mode("overwrite").parquet(
        os.path.join(store_root, "dims", f"b{batch_id}")
    )
    corpus.write.mode("overwrite").parquet(
        os.path.join(store_root, "corpus", f"b{batch_id}")
    )


def stored_dims(spark: SparkSession, store_root: str) -> DataFrame:
    dirs = _dirs(store_root, "dims")
    if not dirs:
        return spark.createDataFrame([], _DIM_SCHEMA)
    return spark.read.schema(_DIM_SCHEMA).parquet(*dirs)


def stored_corpus(spark: SparkSession, store_root: str) -> DataFrame:
    dirs = _dirs(store_root, "corpus")
    if not dirs:
        return spark.createDataFrame([], _CORPUS_SCHEMA)
    return spark.read.schema(_CORPUS_SCHEMA).parquet(*dirs)


def current_health(spark: SparkSession, store_root: str) -> DataFrame:
    """The X186 report over every vector seen so far — bit-identical
    to the batch audit on the union (min/max/int-count merges only)."""
    per_dim = (
        stored_dims(spark, store_root)
        .groupBy("dim")
        .agg(
            F.min("dim_min").alias("dim_min"),
            F.max("dim_max").alias("dim_max"),
            F.sum("zeros").cast("bigint").alias("zeros"),
        )
        .select(F.col("dim").cast("bigint").alias("dim"), "dim_min", "dim_max", "zeros")
    )
    corpus = stored_corpus(spark, store_root).agg(
        F.sum("n_vectors").cast("bigint").alias("n_vectors"),
        F.countDistinct("width").cast("bigint").alias("n_widths"),
        F.sum("nan_vectors").cast("bigint").alias("nan_vectors"),
        F.sum("zero_vectors").cast("bigint").alias("zero_vectors"),
    )
    return per_dim.crossJoin(F.broadcast(corpus)).select(
        "dim",
        "dim_min",
        "dim_max",
        "zeros",
        "n_vectors",
        "n_widths",
        "nan_vectors",
        "zero_vectors",
    )
