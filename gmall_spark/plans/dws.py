"""DWS layer: 10 s tumbling-window aggregates over DWD facts.

Each function mirrors one reference Dws*Window job (SURVEY §2.11):
watermark -> key -> 10 s tumble -> sum-style agg (+ exact distinct via
set) -> dim enrichment -> aggregate store. The aggregate store here is
parquet (stands in for ClickHouse); enrichment is broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_spark.operators.windows import tumble_agg
from gmall_spark.plans.dwd import with_event_time

WINDOW_SECONDS = 10


def dws_trade_province_order_window(
    order_detail: DataFrame, province_dim: DataFrame
) -> DataFrame:
    """Per-province 10 s order window: distinct orders + amount.

    Ref DwsTradeProvinceOrderWindow.java:84-134 — the reference
    accumulates a Java ``Set<String>`` of order ids per (window,
    province) and counts it at window fire (SURVEY A4); Spark-first
    that is ``count_distinct`` inside the window aggregate (exact, as
    the reference; swap to approx_count_distinct at 100 TB if a ~1%
    error is acceptable). Province name enrichment is a broadcast join
    against the dim snapshot (replaces DimAsyncFunction + Redis).
    """
    od = with_event_time(order_detail)
    agg = tumble_agg(
        od,
        "rt",
        WINDOW_SECONDS,
        keys=["province_id"],
        aggs=[
            F.count_distinct(F.col("order_id")).alias("order_count"),
            F.sum("split_total_amount").alias("order_amount"),
        ],
    )
    return (
        agg.join(F.broadcast(province_dim), "province_id", "left")
        .select(
            "stt",
            "edt",
            "province_id",
            F.col("province_name"),
            F.col("order_count").cast("bigint").alias("order_count"),
            F.col("order_amount").cast("double").alias("order_amount"),
        )
    )


def dws_trade_trademark_user_order_window(
    order_detail: DataFrame, sku_dim: DataFrame
) -> DataFrame:
    """Per (trademark, user) 10 s order window.

    Ref DwsTradeTrademarkCategoryUserSpuOrderWindow.java:88-259 — the
    reference chains 4-6 async Phoenix lookups (SKU→SPU→TM→C3→C2→C1)
    per record; here the whole dim chain is pre-joined into one
    broadcast ``sku_dim`` (sku_id -> tm/category/spu attributes), so
    enrichment is a single broadcast hash join before the window agg.
    """
    od = with_event_time(order_detail)
    enriched = od.join(F.broadcast(sku_dim), "sku_id", "left")
    agg = tumble_agg(
        enriched,
        "rt",
        WINDOW_SECONDS,
        keys=["trademark_id", "trademark_name", "user_id"],
        aggs=[
            F.count_distinct(F.col("order_id")).alias("order_count"),
            F.sum("split_total_amount").alias("order_amount"),
        ],
    )
    return agg.select(
        "stt",
        "edt",
        "trademark_id",
        "trademark_name",
        "user_id",
        F.col("order_count").cast("bigint").alias("order_count"),
        F.col("order_amount").cast("double").alias("order_amount"),
    )
