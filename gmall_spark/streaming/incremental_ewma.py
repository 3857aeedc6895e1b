"""Incremental (streaming) EWMA forecasting — X161 as a continuous
pipeline. The decomposition is the point: the EWMA fold itself is
order-sensitive and NOT mergeable, but the (type, day) COUNT rollup
underneath it is plain addition — so state is the sum-merged day
grid (per-batch delta subdirs, idempotent overwrite, replay-safe via
re-derivation from immutable deltas... a replayed batch overwrites
its own subdir with identical counts), and the forecast RE-DERIVES
by folding the merged series through the exact batch operator's
arithmetic. Consequences the tests pin:

- streaming == batch EXACTLY after any split (same merged day grid
  ⇒ same fold, bit for bit);
- RETROACTIVE smoothing: a late event landing on an OLD day changes
  that day's count, and the re-derived fold propagates the change
  through every later day's smoothed value — the correction a
  store-the-running-s design can never make.

Scale: state is the day grid per type (bounded by the calendar, not
the corpus); each batch contributes one tiny delta; the fold runs
over the grid only.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DELTA_SCHEMA = "event_type string, d date, cnt long"
_BATCH_DIR_RE = _re.compile(r"^b\d+$")


def _dirs(root: str) -> list[str]:
    base = os.path.join(root, "days")
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
) -> None:
    """Append one micro-batch's (type, day) count delta to the
    batch's own subdir (idempotent overwrite, replay-safe)."""
    batch.groupBy(
        "event_type", F.to_date(F.col("ts").cast("timestamp")).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt")).write.mode(
        "overwrite"
    ).parquet(os.path.join(store_root, "days", f"b{batch_id}"))


def merged_days(spark: SparkSession, store_root: str) -> DataFrame:
    dirs = _dirs(store_root)
    if not dirs:
        return spark.createDataFrame([], _DELTA_SCHEMA)
    return (
        spark.read.schema(_DELTA_SCHEMA)
        .parquet(*dirs)
        .groupBy("event_type", "d")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def current_forecast(spark: SparkSession, store_root: str) -> DataFrame:
    """(event_type, last_day, n_days, last_count, ewma_forecast) over
    everything ingested so far — the exact batch fold over the merged
    day grid (operators-side arithmetic shared by construction)."""
    s = merged_days(spark, store_root).groupBy("event_type").agg(
        F.expr("array_sort(collect_list(struct(d, cnt)))").alias("ser"),
        F.max("d").alias("last_day"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return s.select(
        "event_type",
        F.date_format("last_day", "yyyy-MM-dd").alias("last_day"),
        F.col("n_days").cast("bigint").alias("n_days"),
        F.element_at(F.col("ser"), -1)["cnt"].cast("bigint").alias("last_count"),
        F.round(
            F.expr(
                "aggregate(slice(ser, 2, size(ser) - 1),"
                " cast(ser[0].cnt as double),"
                " (acc, x) -> (acc + x.cnt) * 0.5)"
            ),
            6,
        ).alias("ewma_forecast"),
    )
