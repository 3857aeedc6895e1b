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


def traffic_channel_stats(vc_window: DataFrame) -> DataFrame:
    """Per (day, channel) rollup with ratio-of-sums metrics + sort.

    Ref mapper/TrafficChannelStatsMapper.java:11-50 (SURVEY A8/A10/O1):
    ``sum(uv_ct) ... order by uv_ct desc`` plus per-session ratios
    sum(pv)/sum(sv), sum(dur)/sum(sv), sum(uj)/sum(sv).
    """
    rolled = (
        vc_window.groupBy(F.substring("stt", 1, 10).alias("dt"), "ch")
        .agg(
            F.sum("uv_ct").cast("bigint").alias("uv_ct"),
            F.sum("sv_ct").cast("bigint").alias("sv_ct"),
            F.sum("pv_ct").cast("bigint").alias("pv_ct"),
            F.sum("dur_sum").cast("bigint").alias("dur_sum"),
            F.sum("uj_ct").cast("bigint").alias("uj_ct"),
        )
    )
    sv = F.when(F.col("sv_ct") > 0, F.col("sv_ct").cast("double"))
    return rolled.select(
        "dt",
        "ch",
        "uv_ct",
        "sv_ct",
        "pv_ct",
        (F.col("pv_ct").cast("double") / sv).alias("pv_per_session"),
        (F.col("dur_sum").cast("double") / sv).alias("dur_per_session"),
        (F.col("uj_ct").cast("double") / sv).alias("uj_rate"),
    ).orderBy(F.desc("uv_ct"), "dt", "ch")


def traffic_visitor_stats_by_hour(vc_window: DataFrame) -> DataFrame:
    """Per (day, hour) visitor stats with conditional new-visitor sum.

    Ref mapper/TrafficVisitorStatsMapper.java:24-30 (SURVEY A11/A14):
    ``sum(if(is_new='1', uv_ct, 0))`` + ``toHour(stt)`` grouping.
    """
    return (
        vc_window.groupBy(
            F.substring("stt", 1, 10).alias("dt"),
            F.substring("stt", 12, 2).cast("bigint").alias("hr"),
        )
        .agg(
            F.sum("uv_ct").cast("bigint").alias("uv_ct"),
            F.sum(F.when(F.col("is_new") == "1", F.col("uv_ct")).otherwise(0))
            .cast("bigint")
            .alias("new_uv_ct"),
            F.sum("sv_ct").cast("bigint").alias("sv_ct"),
            F.sum("pv_ct").cast("bigint").alias("pv_ct"),
        )
    )


def trade_province_stats(province_window: DataFrame) -> DataFrame:
    """Per (day, province) order count + amount rollup.

    Ref mapper/TradeStatsMapper.java selectTradeProvinceOrderCt /
    selectTradeProvinceOrderAmount (SURVEY A8): ``sum(order_count),
    sum(order_amount) ... group by province_id, province_name`` over the
    DWS window table — note the reference sums per-window distinct
    counts (not day-exact distincts); mirrored faithfully.
    """
    return (
        province_window.groupBy(
            F.substring("stt", 1, 10).alias("dt"), "province_id"
        )
        .agg(
            F.any_value("province_name").alias("province_name"),
            F.sum("order_count").cast("bigint").alias("order_count"),
            F.sum("order_amount").cast("double").alias("order_amount"),
        )
    )


def uv_by_channel(vc_window: DataFrame) -> DataFrame:
    """Per (day, channel) UV + jump counters.

    Ref gmall-publisher/.../UvMapper.java selectUvByCh: ``select ch,
    sum(uv_ct) uv, sum(uj_ct) uj ... group by ch``.
    """
    return vc_window.groupBy(F.substring("stt", 1, 10).alias("dt"), "ch").agg(
        F.sum("uv_ct").cast("bigint").alias("uv"),
        F.sum("uj_ct").cast("bigint").alias("uj"),
    )


def traffic_visitor_stats_by_isnew(vc_window: DataFrame) -> DataFrame:
    """Per (day, is_new) visitor stats.

    Ref mapper/TrafficVisitorStatsMapper.java selectVisitorStatsByNewFlag
    (SURVEY A8): uv/pv/sv/uj/dur sums grouped by the new-visitor flag.
    """
    return vc_window.groupBy(
        F.substring("stt", 1, 10).alias("dt"), "is_new"
    ).agg(
        F.sum("uv_ct").cast("bigint").alias("uv_ct"),
        F.sum("pv_ct").cast("bigint").alias("pv_ct"),
        F.sum("sv_ct").cast("bigint").alias("sv_ct"),
        F.sum("uj_ct").cast("bigint").alias("uj_ct"),
        F.sum("dur_sum").cast("bigint").alias("dur_sum"),
    )


def traffic_keywords(searches: DataFrame) -> DataFrame:
    """Weighted keyword score (ref mapper/TrafficKeywordsMapper.java:12-20,
    SURVEY A12/O2): sum(count * CASE source ... END) ordered desc.

    ``searches`` = exploded (keyword, ch) rows from the page log.
    """
    weight = (
        F.when(F.col("ch") == "appstore", 10)
        .when(F.col("ch") == "web", 5)
        .otherwise(2)
    )
    return (
        searches.groupBy("keyword")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("keyword_ct"),
            F.sum(weight).cast("bigint").alias("keyword_score"),
        )
        .orderBy(F.desc("keyword_score"), "keyword")
    )


def trade_stats_union(
    order_detail: DataFrame, cancel: DataFrame, refund: DataFrame
) -> DataFrame:
    """Label-stacked totals via UNION ALL (ref mapper/TradeStatsMapper.
    java:18-37, SURVEY U3): one row per metric type with a literal tag.
    """
    def _tag(df: DataFrame, tag: str) -> DataFrame:
        return df.select(F.lit(tag).alias("type"), "order_ct", "order_amount")

    o = order_detail.agg(
        F.count_distinct("order_id").cast("bigint").alias("order_ct"),
        F.sum("split_total_amount").cast("double").alias("order_amount"),
    )
    c = cancel.agg(
        F.count_distinct("order_id").cast("bigint").alias("order_ct"),
        F.sum("cancel_amount").cast("double").alias("order_amount"),
    )
    r = refund.agg(
        F.count_distinct("order_id").cast("bigint").alias("order_ct"),
        F.sum("refund_amount").cast("double").alias("order_amount"),
    )
    return _tag(o, "order").unionByName(_tag(c, "cancel")).unionByName(_tag(r, "refund"))


def commodity_stats_full_outer(
    order_detail: DataFrame, refund: DataFrame, sku_dim: DataFrame
) -> DataFrame:
    """Order vs refund aggregates FULL OUTER joined on trademark.

    Ref mapper/CommodityStatsMapper.java:13-36 (SURVEY J8): trademarks
    with only orders or only refunds surface with NULLs on the other
    side.
    """
    o = (
        order_detail.join(F.broadcast(sku_dim), "sku_id", "left")
        .groupBy("trademark_name")
        .agg(
            F.count_distinct("order_id").cast("bigint").alias("order_ct"),
            F.sum("split_total_amount").cast("double").alias("order_amount"),
        )
    )
    r = (
        refund.join(F.broadcast(sku_dim), "sku_id", "left")
        .groupBy("trademark_name")
        .agg(
            F.count_distinct("order_id").cast("bigint").alias("refund_ct"),
            F.sum("refund_amount").cast("double").alias("refund_amount"),
        )
    )
    return o.join(r, "trademark_name", "full_outer")


def activity_stats(order_detail: DataFrame) -> DataFrame:
    """Activity subsidy rate (ref mapper/ActivityStatsMapper.java:10-16,
    SURVEY A13): round(reduce/original, 4)."""
    agg = (
        order_detail.filter(F.col("activity_id").isNotNull())
        .groupBy("activity_id")
        .agg(
            F.sum(F.coalesce("split_activity_amount", F.lit(0).cast("decimal(18,4)")))
            .alias("reduce_amount"),
            F.sum("split_total_amount").alias("origin_amount"),
        )
    )
    return agg.select(
        "activity_id",
        F.col("reduce_amount").cast("double").alias("reduce_amount"),
        F.col("origin_amount").cast("double").alias("origin_amount"),
        F.round(
            F.col("reduce_amount").cast("double") / F.col("origin_amount").cast("double"),
            4,
        ).alias("subsidy_rate"),
    )


def coupon_stats(order_detail: DataFrame) -> DataFrame:
    """Coupon subsidy rate (ref mapper/CouponStatsMapper.java:10-16)."""
    agg = (
        order_detail.filter(F.col("coupon_id").isNotNull())
        .groupBy("coupon_id")
        .agg(
            F.sum(F.coalesce("split_coupon_amount", F.lit(0).cast("decimal(18,4)")))
            .alias("reduce_amount"),
            F.sum("split_total_amount").alias("origin_amount"),
        )
    )
    return agg.select(
        "coupon_id",
        F.col("reduce_amount").cast("double").alias("reduce_amount"),
        F.col("origin_amount").cast("double").alias("origin_amount"),
        F.round(
            F.col("reduce_amount").cast("double") / F.col("origin_amount").cast("double"),
            4,
        ).alias("subsidy_rate"),
    )


def _day(df: DataFrame) -> F.Column:
    return F.substring("stt", 1, 10).alias("dt")


def commodity_stats_trademark(
    order_window: DataFrame, refund_window: DataFrame
) -> DataFrame:
    """Trademark-grain commodity stats with unique-user re-aggregation.

    Ref mapper/CommodityStatsMapper.java:14-37 (selectTrademarkStats):
    order-side sums + ``count(distinct user_id)`` over the trademark/
    category/user DWS window table, FULL OUTER joined to the refund
    side on trademark. The reference filters one day via parameter;
    here the day is a grouping column (one row per (dt, trademark)).
    Distinct-user counts re-aggregate the window table's user_id key —
    sum of per-window counts would overcount repeat users, which is
    exactly why the reference re-counts at query time.
    """
    o = order_window.groupBy(_day(order_window), "trademark_name").agg(
        F.sum("order_count").cast("bigint").alias("order_count"),
        F.count_distinct("user_id").cast("bigint").alias("uu_count"),
        F.sum("order_amount").cast("double").alias("order_amount"),
    )
    r = refund_window.groupBy(_day(refund_window), "trademark_name").agg(
        F.sum("refund_count").cast("bigint").alias("refund_count"),
        F.count_distinct("user_id").cast("bigint").alias("refund_uu_count"),
    )
    return o.join(r, ["dt", "trademark_name"], "full_outer")


def commodity_stats_category(
    order_window: DataFrame, refund_window: DataFrame
) -> DataFrame:
    """Category-grain (c1/c2/c3) commodity stats, FULL OUTER on the
    three category levels.

    Ref mapper/CommodityStatsMapper.java:47-97 (selectCategoryStats).
    """
    keys = ["category1_name", "category2_name", "category3_name"]
    o = order_window.groupBy(_day(order_window), *keys).agg(
        F.sum("order_count").cast("bigint").alias("order_count"),
        F.count_distinct("user_id").cast("bigint").alias("uu_count"),
        F.sum("order_amount").cast("double").alias("order_amount"),
    )
    r = refund_window.groupBy(_day(refund_window), *keys).agg(
        F.sum("refund_count").cast("bigint").alias("refund_count"),
        F.count_distinct("user_id").cast("bigint").alias("refund_uu_count"),
    )
    return o.join(r, ["dt", *keys], "full_outer")


def commodity_stats_spu(order_window: DataFrame) -> DataFrame:
    """SPU-grain order stats with unique users.

    Ref mapper/CommodityStatsMapper.java:99-106 (selectSpuStats).
    """
    return order_window.groupBy(_day(order_window), "spu_name").agg(
        F.sum("order_count").cast("bigint").alias("order_count"),
        F.count_distinct("user_id").cast("bigint").alias("uu_count"),
        F.sum("order_amount").cast("double").alias("order_amount"),
    )


def trademark_order_amount_pie(order_window: DataFrame) -> DataFrame:
    """Trademark order-amount pie slices.

    Ref mapper/CommodityStatsMapper.java:39-45 (selectTmOrderAmtPieGra).
    """
    return order_window.groupBy(_day(order_window), "trademark_name").agg(
        F.sum("order_amount").cast("double").alias("order_amount")
    )


def user_uv_by_page(
    page_view_window: DataFrame,
    cart_uu_window: DataFrame,
    order_window: DataFrame,
    payment_window: DataFrame,
) -> DataFrame:
    """Per-page funnel UVs: 5-branch UNION ALL over four DWS tables.

    Ref mapper/UserStatsMapper.java:12-36 (selectUvByPage): home /
    good_detail (page-view window), cart (cart-add UU window), trade
    (order window), payment (payment window), each tagged with a
    literal page_id.
    """

    def branch(df: DataFrame, col: str, tag: str) -> DataFrame:
        return df.groupBy(_day(df)).agg(
            F.sum(col).cast("bigint").alias("uv_ct")
        ).select("dt", F.lit(tag).alias("page_id"), "uv_ct")

    return (
        branch(page_view_window, "home_uv_ct", "home")
        .unionByName(branch(page_view_window, "good_detail_uv_ct", "good_detail"))
        .unionByName(branch(cart_uu_window, "cart_add_uu_ct", "cart"))
        .unionByName(branch(order_window, "order_unique_user_count", "trade"))
        .unionByName(branch(payment_window, "payment_suc_unique_user_count", "payment"))
    )


def user_change_ct_per_type(
    login_window: DataFrame, register_window: DataFrame
) -> DataFrame:
    """User-change counters per type: backCt / activeUserCt / newUserCt.

    Ref mapper/UserStatsMapper.java:38-55 (selectUserChangeCtPerType).
    """

    def branch(df: DataFrame, col: str, tag: str) -> DataFrame:
        return df.groupBy(_day(df)).agg(
            F.sum(col).cast("bigint").alias("user_ct")
        ).select("dt", F.lit(tag).alias("type"), "user_ct")

    return (
        branch(login_window, "back_ct", "backCt")
        .unionByName(branch(login_window, "uu_ct", "activeUserCt"))
        .unionByName(branch(register_window, "register_ct", "newUserCt"))
    )


def trade_user_ct(order_window: DataFrame, payment_window: DataFrame) -> DataFrame:
    """First-ever (new) trading users per trade type.

    Ref mapper/UserStatsMapper.java:57-67 (selectTradeUserCt).
    """

    def branch(df: DataFrame, col: str, tag: str) -> DataFrame:
        return df.groupBy(_day(df)).agg(
            F.sum(col).cast("bigint").alias("new_user_ct")
        ).select("dt", F.lit(tag).alias("trade_type"), "new_user_ct")

    return branch(order_window, "order_new_user_count", "order").unionByName(
        branch(payment_window, "payment_new_user_count", "payment")
    )


def user_stats_union(page_log: DataFrame, order_detail: DataFrame) -> DataFrame:
    """Label-stacked user counters (ref mapper/UserStatsMapper.java:12-63,
    SURVEY U3): register / active / ordering users as tagged rows.
    """
    def _tag(df: DataFrame, tag: str) -> DataFrame:
        return df.select(F.lit(tag).alias("type"), "user_ct")

    reg = page_log.filter(F.col("page_id") == "register").agg(
        F.count(F.lit(1)).cast("bigint").alias("user_ct")
    )
    active = page_log.agg(F.count_distinct("user_id").cast("bigint").alias("user_ct"))
    ordering = order_detail.agg(
        F.count_distinct("user_id").cast("bigint").alias("user_ct")
    )
    return _tag(reg, "register").unionByName(_tag(active, "active")).unionByName(
        _tag(ordering, "order")
    )
