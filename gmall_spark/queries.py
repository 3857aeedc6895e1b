"""Query registry: named queries + matching DuckDB oracle SQL.

Every implemented operator from SURVEY §2 gets one entry here: a
callable ``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible)
an equivalent ANSI-SQL string the DuckDB oracle replays over the same
parquet tables. This is the correctness gate (BASELINE.json t2).

Output-type discipline (so the driver's value-hash matches):
- money: exact decimal arithmetic inside, final cast to DOUBLE
- counts/keys: BIGINT
- window bounds / dates: formatted strings (``stt``/``edt``)
- column names identical on both sides (aliased everywhere)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_spark.plans import ads, dwd, dws, llm, traffic
from gmall_spark.sources import cdc_gen, dims, log_gen

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _topic_db(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc_gen.topic_db(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


# ---------------------------------------------------------------------------
# Shared oracle CTE fragments (mirror cdc_gen + plans/dwd exactly)
# ---------------------------------------------------------------------------

# dwd_trade_order_detail flattened: CDC derivation ∘ DWD pipeline. The
# map-envelope plumbing cancels out in SQL.
SQL_DWD_ORDER_DETAIL = f"""
WITH od AS (
  SELECT l_orderkey * 8 + l_linenumber AS id,
         l_orderkey AS order_id,
         l_partkey AS sku_id,
         CAST(CAST(l_quantity AS INT) AS BIGINT) AS sku_num,
         CAST(CAST(l_extendedprice AS DECIMAL(16,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS split_total_amount,
         '240' || CAST(1 + l_partkey % 4 AS VARCHAR) AS source_type,
         strftime(make_timestamp((CAST(epoch(l_shipdate) AS BIGINT) + (l_orderkey * 7 + l_linenumber) % 86400) * 1000000), '%Y-%m-%d %H:%M:%S') AS create_time,
         CAST(epoch(l_shipdate) AS BIGINT) + (l_orderkey * 7 + l_linenumber) % 86400 AS ts
  FROM lineitem
), oi AS (
  SELECT o_orderkey AS order_id,
         o_custkey AS user_id,
         o_custkey % 25 AS province_id,
         CASE o_orderstatus WHEN 'O' THEN '1001' WHEN 'P' THEN '1002' ELSE '1004' END AS order_status
  FROM orders
), act AS (
  SELECT l_orderkey * 8 + l_linenumber AS id, 1 + l_orderkey % 3 AS activity_id
  FROM lineitem WHERE l_orderkey % 5 = 0
), cou AS (
  SELECT l_orderkey * 8 + l_linenumber AS id, 1 + l_orderkey % 4 AS coupon_id
  FROM lineitem WHERE l_orderkey % 7 = 0
), dic AS (
  SELECT * FROM {dims.base_dic_values_sql()}
), dwd_order_detail AS (
  SELECT od.id, od.order_id, oi.user_id, od.sku_id, od.sku_num,
         oi.province_id, oi.order_status, act.activity_id, cou.coupon_id,
         od.split_total_amount, od.source_type, dic.dic_name AS source_type_name,
         od.create_time, od.ts
  FROM od
  JOIN oi ON od.order_id = oi.order_id
  LEFT JOIN act ON od.id = act.id
  LEFT JOIN cou ON od.id = cou.id
  LEFT JOIN dic ON od.source_type = dic.dic_code
)
"""


def _province_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("province_id"),
        F.col("n_name").alias("province_name"),
    )


SQL_PROVINCE_DIM = "SELECT CAST(n_nationkey AS BIGINT) AS province_id, n_name AS province_name FROM nation"


# ---------------------------------------------------------------------------
# Flagship slice: DWD order detail -> DWS province window -> ADS day rollup
# ---------------------------------------------------------------------------


@query(
    "dwd_trade_order_detail",
    SQL_DWD_ORDER_DETAIL
    + """
SELECT id, order_id, user_id, sku_id, sku_num, province_id, order_status,
       activity_id, coupon_id,
       CAST(split_total_amount AS DOUBLE) AS split_total_amount,
       source_type, source_type_name, create_time, ts
FROM dwd_order_detail
""",
)
def q_dwd_trade_order_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = dwd.dwd_trade_order_detail(_topic_db(spark, sf_dir), dims.base_dic(spark))
    return df.select(
        "id",
        "order_id",
        "user_id",
        "sku_id",
        "sku_num",
        "province_id",
        "order_status",
        "activity_id",
        "coupon_id",
        F.col("split_total_amount").cast("double").alias("split_total_amount"),
        "source_type",
        "source_type_name",
        "create_time",
        "ts",
    )


@query(
    "dws_trade_province_order_window",
    SQL_DWD_ORDER_DETAIL
    + f"""
, prov AS ({SQL_PROVINCE_DIM})
SELECT strftime(make_timestamp(((ts // 10) * 10) * 1000000), '%Y-%m-%d %H:%M:%S') AS stt,
       strftime(make_timestamp(((ts // 10) * 10 + 10) * 1000000), '%Y-%m-%d %H:%M:%S') AS edt,
       province_id,
       any_value(province_name) AS province_name,
       CAST(COUNT(DISTINCT order_id) AS BIGINT) AS order_count,
       CAST(SUM(split_total_amount) AS DOUBLE) AS order_amount
FROM dwd_order_detail LEFT JOIN prov USING (province_id)
GROUP BY (ts // 10) * 10, province_id
""",
)
def q_dws_trade_province_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = dwd.dwd_trade_order_detail(_topic_db(spark, sf_dir), dims.base_dic(spark))
    return dws.dws_trade_province_order_window(od, _province_dim(spark, sf_dir))


@query(
    "ads_trade_stats_by_day",
    SQL_DWD_ORDER_DETAIL
    + """
SELECT strftime(make_timestamp(ts * 1000000), '%Y-%m-%d') AS dt,
       CAST(COUNT(DISTINCT order_id) AS BIGINT) AS order_count,
       CAST(SUM(split_total_amount) AS DOUBLE) AS order_amount
FROM dwd_order_detail
GROUP BY 1
""",
)
def q_ads_trade_stats_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADS day rollup (ref mapper/TradeStatsMapper.java:12-16, SURVEY A8)."""
    od = dwd.dwd_trade_order_detail(_topic_db(spark, sf_dir), dims.base_dic(spark))
    return ads.trade_stats_by_day(od)
