"""Tumbling-window aggregation with reference-style window metadata.

Every reference DWS job is: watermark -> keyBy -> 10 s tumble ->
incremental reduce -> inject ``stt``/``edt`` strings
(DwsTrafficVcChArIsNewPageViewWindow.java:135-180). Spark's streaming
aggregation is already incremental (partial aggregate + state store),
so the operator is just groupBy(window(...)) with formatted bounds.

Batch and streaming share this helper: on a static DataFrame it is a
plain hash aggregate; under readStream it becomes a stateful windowed
aggregation (add ``withWatermark`` upstream — see streaming/runner).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_spark.functions.datetime import to_datetime_str


def tumble_agg(
    df: DataFrame,
    ts_col: str,
    window_seconds: int,
    keys: Sequence[str],
    aggs: Sequence[Column],
    emit_ts: bool = False,
) -> DataFrame:
    """GroupBy (tumble(ts), keys) -> aggs, with ``stt``/``edt`` strings.

    One shuffle on (window, keys); map-side partial aggregation means
    at 100 TB only (windows × keys) partial rows cross the wire.
    """
    win = F.window(F.col(ts_col), f"{window_seconds} seconds")
    grouped = df.groupBy(win.alias("w"), *keys).agg(*aggs)
    cols = [
        to_datetime_str(F.col("w.start")).alias("stt"),
        to_datetime_str(F.col("w.end")).alias("edt"),
        *keys,
        *[c for c in grouped.columns if c not in ("w", *keys)],
    ]
    out = grouped.select(*cols)
    if emit_ts:
        out = out.withColumn("ts", F.unix_timestamp(F.col("edt")))
    return out
