"""DWS layer: 10 s tumbling-window aggregates over DWD facts.

Each function mirrors one reference Dws*Window job (SURVEY §2.11):
watermark -> key -> 10 s tumble -> sum-style agg (+ exact distinct via
set) -> dim enrichment -> aggregate store. The aggregate store here is
parquet (stands in for ClickHouse); enrichment is broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_spark.operators.uv import first_ever_flag, first_of_day_flag
from gmall_spark.operators.windows import tumble_agg
from gmall_spark.plans.dwd import with_event_time

WINDOW_SECONDS = 10


def _with_dt(df: DataFrame) -> DataFrame:
    return with_event_time(df).withColumn("dt", F.date_format("rt", "yyyy-MM-dd"))


# Relative-error target for the approx (HLL) distinct-count twins —
# the documented 100 TB swap for the exact Set-per-window paths.
APPROX_RSD = 0.02


def _order_count_agg(approx: bool):
    """Exact ``count_distinct`` (the reference's Java Set semantics)
    or its ``approx_count_distinct`` twin: HLL partials merge
    map-side into constant-size state, so the shuffle carries one
    sketch per (window, key) instead of every distinct order id —
    the documented 100 TB swap (SURVEY §7.3, VERDICT r4 item 7).
    Accuracy vs exact is gated by tests/test_plan_shape.py."""
    if approx:
        return F.approx_count_distinct(F.col("order_id"), APPROX_RSD).alias(
            "order_count"
        )
    return F.count_distinct(F.col("order_id")).alias("order_count")


def dws_trade_province_order_window(
    order_detail: DataFrame, province_dim: DataFrame, approx: bool = False
) -> DataFrame:
    """Per-province 10 s order window: distinct orders + amount.

    Ref DwsTradeProvinceOrderWindow.java:84-134 — the reference
    accumulates a Java ``Set<String>`` of order ids per (window,
    province) and counts it at window fire (SURVEY A4); Spark-first
    that is ``count_distinct`` inside the window aggregate (exact, as
    the reference; ``approx=True`` swaps in the HLL twin for 100 TB —
    see _order_count_agg). Province name enrichment is a broadcast
    join against the dim snapshot (replaces DimAsyncFunction + Redis).
    """
    od = with_event_time(order_detail)
    agg = tumble_agg(
        od,
        "rt",
        WINDOW_SECONDS,
        keys=["province_id"],
        aggs=[
            _order_count_agg(approx),
            F.sum("split_total_amount").alias("order_amount"),
        ],
    )
    return agg.join(F.broadcast(province_dim), "province_id", "left").select(
        "stt",
        "edt",
        "province_id",
        F.col("province_name"),
        F.col("order_count").cast("bigint").alias("order_count"),
        F.col("order_amount").cast("double").alias("order_amount"),
    )


def dws_trade_cart_add_uu_window(cart_add: DataFrame) -> DataFrame:
    """Global 10 s window: distinct cart-add users (first per day).

    Ref DwsTradeCartAddUuWindow.java:79-144 (SURVEY A5 cart variant).
    """
    flagged = first_of_day_flag(
        _with_dt(cart_add), "user_id", "dt", ["ts", "id"], "uu_flag"
    )
    return tumble_agg(
        flagged.filter(F.col("uu_flag") == 1),
        "rt",
        WINDOW_SECONDS,
        keys=[],
        aggs=[F.count(F.lit(1)).cast("bigint").alias("cart_add_uu_ct")],
    )


def dws_trade_order_window(order_detail: DataFrame) -> DataFrame:
    """Global 10 s window: unique + first-ever order users, amounts.

    Ref DwsTradeOrderWindow.java:74-160 (SURVEY A7): per-user
    last-order-date ValueState -> first-of-day / first-ever flags;
    activity/coupon reductions null->0 coalesced before the sum
    (DwsTradeOrderWindow.java:109-117).
    """
    od = first_of_day_flag(
        _with_dt(order_detail), "user_id", "dt", ["ts", "id"], "uu_flag"
    )
    od = first_ever_flag(od, "user_id", "dt", "fe_flag")
    return tumble_agg(
        od,
        "rt",
        WINDOW_SECONDS,
        keys=[],
        aggs=[
            F.sum("uu_flag").cast("bigint").alias("order_unique_user_count"),
            F.sum(F.col("uu_flag") * F.col("fe_flag"))
            .cast("bigint")
            .alias("order_new_user_count"),
            F.sum(F.coalesce(F.col("split_activity_amount"), F.lit(0).cast("decimal(18,4)")))
            .cast("double")
            .alias("order_activity_reduce_amount"),
            F.sum(F.coalesce(F.col("split_coupon_amount"), F.lit(0).cast("decimal(18,4)")))
            .cast("double")
            .alias("order_coupon_reduce_amount"),
            # the reference sums the ORDER-grain original_total_amount
            # carried on each detail record (DwsTradeOrderWindow.java:
            # 124,138) — not the per-detail order_price
            F.sum("original_total_amount")
            .cast("double")
            .alias("order_origin_total_amount"),
        ],
    )


def dws_trade_payment_suc_window(pay_suc: DataFrame) -> DataFrame:
    """Global 10 s window: unique + first-ever paying users.

    Ref DwsTradePaymentSucWindow.java:74-180 (SURVEY A7 + T3 dedup).
    """
    pay = first_of_day_flag(
        _with_dt(pay_suc), "user_id", "dt", ["ts", "order_id"], "uu_flag"
    )
    pay = first_ever_flag(pay, "user_id", "dt", "fe_flag")
    return tumble_agg(
        pay,
        "rt",
        WINDOW_SECONDS,
        keys=[],
        aggs=[
            F.sum("uu_flag").cast("bigint").alias("payment_suc_unique_user_count"),
            F.sum(F.col("uu_flag") * F.col("fe_flag"))
            .cast("bigint")
            .alias("payment_new_user_count"),
        ],
    )


def dws_trade_trademark_category_user_order_window(
    order_detail: DataFrame, sku_dim: DataFrame, approx: bool = False
) -> DataFrame:
    """Per (trademark, category3, user) 10 s order window.

    Ref DwsTradeTrademarkCategoryUserSpuOrderWindow.java:88-259 — the
    reference chains 4-6 async Phoenix lookups (SKU→SPU→TM→C3→C2→C1)
    per record (SURVEY J6/T7); here the whole chain is pre-flattened
    into one broadcast ``sku_dim``, so enrichment is a single
    broadcast hash join before the window agg. ``approx=True`` swaps
    the exact distinct-order count for the HLL twin (_order_count_agg,
    the 100 TB path).
    """
    od = with_event_time(order_detail)
    enriched = od.join(F.broadcast(sku_dim), "sku_id", "left")
    keys = [
        "trademark_name",
        "category1_name",
        "category2_name",
        "category3_name",
        "spu_name",
        "user_id",
    ]
    agg = tumble_agg(
        enriched,
        "rt",
        WINDOW_SECONDS,
        keys=keys,
        aggs=[
            _order_count_agg(approx),
            F.sum("split_total_amount").alias("order_amount"),
        ],
    )
    return agg.select(
        "stt",
        "edt",
        *keys,
        F.col("order_count").cast("bigint").alias("order_count"),
        F.col("order_amount").cast("double").alias("order_amount"),
    )


def dws_trade_trademark_category_user_refund_window(
    refund: DataFrame, sku_dim: DataFrame
) -> DataFrame:
    """Per (sku, trademark, categories, user) 10 s refund window.

    Ref DwsTradeTrademarkCategoryUserRefundWindow.java:71-241 (keys:
    sku, tm, c1, c2, c3, user).
    """
    rf = with_event_time(refund)
    enriched = rf.join(F.broadcast(sku_dim), "sku_id", "left")
    keys = [
        "sku_id",
        "trademark_name",
        "category1_name",
        "category2_name",
        "category3_name",
        "user_id",
    ]
    agg = tumble_agg(
        enriched,
        "rt",
        WINDOW_SECONDS,
        keys=keys,
        aggs=[
            F.count_distinct(F.col("order_id")).alias("refund_count"),
            F.sum("refund_amount").alias("refund_amount"),
        ],
    )
    return agg.select(
        "stt",
        "edt",
        *keys,
        F.col("refund_count").cast("bigint").alias("refund_count"),
        F.col("refund_amount").cast("double").alias("refund_amount"),
    )
