"""Incremental (streaming) value-distribution drift monitor — X183 as
a continuous pipeline. The UNDERLYING state, (day, bucket) counts, is
SUM-mergeable (the X179 equality class), so the store is per-batch
partial grids merged at read; the chi-square terms themselves are NOT
mergeable — the reference/current split point is the global day-span
midpoint, which a late day can MOVE — so the report re-derives from
the merged grid (the X156/X168 class): after any batch split the
emitted table is row-identical to the batch operator over the union,
including retroactive re-splits when a new day extends the span.

State is one count per (day, bucket) cell — bounded by span x value
domain, not event volume. At 100 TB the grid store is a
date-partitioned rollup table and the drift read a scheduled report,
unchanged.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GRID_SCHEMA = "d date, bucket long, cnt long"
_BATCH_DIR_RE = _re.compile(r"^b\d+$")


def _grid_dirs(root: str) -> list[str]:
    base = os.path.join(root, "grid")
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
    batch: DataFrame,
    store_root: str,
    batch_id: int,
    value_col: str = "value",
    ts_col: str = "ts",
) -> None:
    """Reduce one micro-batch to its (day, bucket) partial grid and
    write it to the batch's own subdir (idempotent overwrite)."""
    from gmall_spark.queries_llm import DRIFT_W

    (
        batch.select(
            F.to_date(ts_col).alias("d"),
            F.floor(F.col(value_col) / DRIFT_W).cast("bigint").alias("bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .write.mode("overwrite")
        .parquet(os.path.join(store_root, "grid", f"b{batch_id}"))
    )


def stored_grid(spark: SparkSession, store_root: str) -> DataFrame:
    dirs = _grid_dirs(store_root)
    if not dirs:
        return spark.createDataFrame([], _GRID_SCHEMA)
    return (
        spark.read.schema(_GRID_SCHEMA)
        .parquet(*dirs)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def current_drift(spark: SparkSession, store_root: str) -> DataFrame:
    """The X183 report over ALL events seen so far — identical to the
    batch operator on the union (the split midpoint re-derives from
    the merged grid's own span, so late days retroactively re-split
    the windows)."""
    g = stored_grid(spark, store_root)
    span = g.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    tagged = g.crossJoin(F.broadcast(span)).select(
        "bucket",
        "cnt",
        F.when(
            F.datediff("d", "lo") * 2 <= F.datediff("hi", "lo"), 1
        ).otherwise(0).alias("is_ref"),
    )
    agg = tagged.groupBy("bucket").agg(
        F.sum(F.col("cnt") * F.col("is_ref")).alias("ref_cnt"),
        F.sum(F.col("cnt") * (1 - F.col("is_ref"))).alias("cur_cnt"),
    )
    tot = agg.agg(
        F.sum("ref_cnt").alias("ref_t"), F.sum("cur_cnt").alias("cur_t")
    )
    exp = (F.col("ref_cnt") + 1.0) * F.col("cur_t") / (F.col("ref_t") + 1.0)
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("ref_cnt").cast("bigint").alias("ref_cnt"),
        F.col("cur_cnt").cast("bigint").alias("cur_cnt"),
        F.round(
            (F.col("cur_cnt") - exp) * (F.col("cur_cnt") - exp) / exp, 6
        ).alias("chi_term"),
    )
