"""ADS layer: dashboard queries over DWS/DWD results.

Re-expresses the publisher's ~20 MyBatis ClickHouse SQLs
(gmall-publisher-2022/.../mapper/*.java) as Spark transforms. These
run over the aggregate store (parquet stand-in for ClickHouse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_spark.functions.datetime import epoch_seconds_to_ts


def trade_stats_by_day(order_detail: DataFrame) -> DataFrame:
    """Day rollup of GMV + distinct orders.

    Ref mapper/TradeStatsMapper.java:12-16 (``sum(order_amount) ...
    group by toYYYYMMDD(stt)``) — here derived straight from the DWD
    fact (same result, one fewer materialization).
    """
    return (
        order_detail.groupBy(
            F.date_format(epoch_seconds_to_ts("ts"), "yyyy-MM-dd").alias("dt")
        )
        .agg(
            F.count_distinct("order_id").alias("order_count"),
            F.sum("split_total_amount").alias("order_amount"),
        )
        .select(
            "dt",
            F.col("order_count").cast("bigint").alias("order_count"),
            F.col("order_amount").cast("double").alias("order_amount"),
        )
    )
