"""Incremental (streaming) count-min sketch: continuously-maintained
heavy-hitter counts.

The CMS companion to streaming/incremental_bloom.py: each
micro-batch's items are hashed into (lane, col, cell_ct) partial
counts and SUM-merged into a persisted cell store. Addition is
associative and commutative, so after ANY batch split the store
equals ``cms_build`` over the union of all batches cell-for-cell
(asserted by tests/test_streaming.py) — and estimates probed against
it are therefore identical too. Like the Bloom store the rewrite is
O(d·w) regardless of how much has been ingested; the swap is
write-to-temp + atomic rename.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_spark.operators import sketches

_STORE_SCHEMA = T.StructType(
    [
        T.StructField("lane", T.IntegerType()),
        T.StructField("col", T.LongType()),
        T.StructField("cell_ct", T.LongType()),
    ]
)


def _read_or_empty(spark: SparkSession, path: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(_STORE_SCHEMA).parquet(path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return spark.createDataFrame([], _STORE_SCHEMA)
        raise


def process_batch(
    spark: SparkSession,
    batch: DataFrame,
    key_col: str,
    store_dir: str,
    depth: int = sketches.CMS_DEPTH,
    width: int = sketches.CMS_WIDTH,
) -> None:
    """SUM-merge one micro-batch of items into the persisted cells."""
    delta = sketches.cms_build(batch, key_col, depth, width).select(
        F.col("lane").cast("int").alias("lane"),
        F.col("col").cast("bigint").alias("col"),
        F.col("cell_ct").cast("bigint").alias("cell_ct"),
    )
    merged = (
        _read_or_empty(spark, store_dir)
        .unionByName(delta)
        .groupBy("lane", "col")
        .agg(F.sum("cell_ct").cast("bigint").alias("cell_ct"))
    )
    tmp = store_dir.rstrip("/") + ".next"
    merged.write.mode("overwrite").parquet(tmp)
    final = store_dir.rstrip("/")
    old = final + ".old"
    if os.path.exists(final):
        os.replace(final, old)
    os.replace(tmp, final)
    shutil.rmtree(old, ignore_errors=True)


def current_sketch(spark: SparkSession, store_dir: str) -> DataFrame:
    """The sketch as of the last completed batch — feed straight into
    ``sketches.cms_estimate``."""
    return _read_or_empty(spark, store_dir)
