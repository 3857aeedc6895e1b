"""Shared ANSI-SQL oracle fragments (DuckDB dialect).

Each fragment mirrors, in flat SQL over the driver's parquet views,
the composition of a deterministic derivation (sources/cdc_gen,
sources/log_gen) with a DWD pipeline. The envelope/JSON plumbing the
Spark side exercises cancels out here — that's the point: the oracle
checks *semantics*, the Spark side additionally proves the envelope
machinery (maps, JSON round-trip, explode) preserves them.

Dialect notes (DuckDB):
- make_timestamp(micros) builds a naive UTC timestamp — timezone-free,
  unlike to_timestamp() which returns TIMESTAMPTZ in the server zone.
- epoch_us(ts) mirrors Spark's unix_micros; `//` is integer division.
"""

from __future__ import annotations

from gmall_spark.sources.dims import base_dic_values_sql

# --- page log derivation (mirrors sources/log_gen.py exactly) -------------

SQL_PAGE_LOG = """
WITH ev AS (
  SELECT event_id, user_id,
         epoch_us(ts) AS ts_us,
         strftime(ts, '%Y-%m-%d') AS dt,
         'mid_' || CAST(user_id AS VARCHAR) AS mid,
         'v3.' || CAST(user_id % 3 AS VARCHAR) AS vc,
         (['appstore','xiaomi','huawei','oppo','web'])[CAST(1 + user_id % 5 AS INT)] AS ch,
         CAST(user_id % 10 AS VARCHAR) AS ar,
         CASE WHEN event_id % 4 = 0 THEN '1' ELSE '0' END AS is_new,
         (event_type = 'click' AND event_id % 3 = 0) AS is_search,
         (event_type = 'view') AS is_view,
         CASE WHEN event_type = 'click' AND event_id % 3 = 0 THEN 'good_list'
              WHEN event_type = 'view' THEN 'good_detail'
              WHEN event_type = 'click' THEN 'home'
              WHEN event_type = 'purchase' THEN 'trade'
              WHEN event_type = 'signup' THEN 'register'
              ELSE 'mine' END AS page_id,
         CASE WHEN event_type = 'click' AND event_id % 3 = 0
              THEN 'brand' || CAST(event_id % 4 AS VARCHAR) || ' kw' || CAST(event_id % 8 AS VARCHAR)
              END AS item,
         CASE WHEN event_type = 'click' AND event_id % 3 = 0 THEN 'keyword' END AS item_type,
         CAST(round(value * 1000) AS BIGINT) AS during_time
  FROM events
), lagged AS (
  SELECT *,
         lag(page_id) OVER w AS prev_page,
         lag(ts_us)   OVER w AS prev_ts
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), pl0 AS (
  SELECT event_id, user_id, mid, vc, ch, ar, is_new, page_id, item, item_type,
         during_time, ts_us, dt, is_view,
         CASE WHEN is_search THEN 'search'
              WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000 THEN NULL
              ELSE prev_page END AS last_page_id
  FROM lagged
  WHERE event_id % 97 <> 0
), page_log AS (
  SELECT *, CASE WHEN last_page_id IS NULL THEN 1 ELSE 0 END AS is_session_start
  FROM pl0
)
"""

# Derived partsupp (the lite schema ships no partsupp table): each
# part gets 4 deterministic suppliers; availqty and supplycost are
# integer arithmetic over (partkey, suppkey), cost kept in BIGINT
# CENTS so every comparison/aggregate is exact in both engines (a
# DECIMAL division would hit engine-specific scale rules). Shared
# verbatim by the Spark derivation (queries._partsupp) and the
# oracles of the Q2/Q11/Q16/Q20 twins.
SQL_PARTSUPP = """
ns_t AS (SELECT count(*) AS ns FROM supplier),
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7 + iv.i * 13) % ns_t.ns AS ps_suppkey,
         (p_partkey * 13 + ((p_partkey * 7 + iv.i * 13) % ns_t.ns) * 7) % 10000 + 1 AS ps_availqty,
         (p_partkey * 31 + ((p_partkey * 7 + iv.i * 13) % ns_t.ns) * 17) % 10000 + 100 AS ps_supplycost_cents
  FROM part CROSS JOIN ns_t
  CROSS JOIN (SELECT unnest(range(0, 4)) AS i) iv
)
"""


def segment_keywords_sql(expr: str) -> str:
    """DuckDB twin of functions.text.segment_keywords (CJK-aware
    keyword tokenizer, SURVEY F1)."""
    from gmall_spark.functions.text import segment_keywords_oracle

    return segment_keywords_oracle(expr)


# window-start helpers over micro timestamps
def tumble_stt(ts_us: str = "ts_us", seconds: int = 10) -> str:
    us = seconds * 1_000_000
    return f"strftime(make_timestamp(({ts_us} // {us}) * {us}), '%Y-%m-%d %H:%M:%S')"


def tumble_edt(ts_us: str = "ts_us", seconds: int = 10) -> str:
    us = seconds * 1_000_000
    return f"strftime(make_timestamp(({ts_us} // {us}) * {us} + {us}), '%Y-%m-%d %H:%M:%S')"


# --- trade CDC derivation (mirrors sources/cdc_gen.py + plans/dwd.py) -----

SQL_DWD_ORDER_DETAIL = f"""
WITH od AS (
  SELECT l_orderkey * 8 + l_linenumber AS id,
         l_orderkey AS order_id,
         l_partkey AS sku_id,
         CAST(CAST(l_quantity AS INT) AS BIGINT) AS sku_num,
         CAST(l_extendedprice AS DECIMAL(16,2)) AS order_price,
         CAST(CAST(l_extendedprice AS DECIMAL(16,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS split_total_amount,
         CASE WHEN l_orderkey % 5 = 0
              THEN CAST(CAST(l_extendedprice AS DECIMAL(16,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4)) END
           AS split_activity_amount,
         CASE WHEN l_orderkey % 7 = 0
              THEN CAST(CAST(l_extendedprice AS DECIMAL(16,2)) * CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(18,4)) END
           AS split_coupon_amount,
         '240' || CAST(1 + l_partkey % 4 AS VARCHAR) AS source_type,
         strftime(make_timestamp((CAST(epoch(l_shipdate) AS BIGINT) + (l_orderkey * 7 + l_linenumber) % 86400) * 1000000), '%Y-%m-%d %H:%M:%S') AS create_time,
         CAST(epoch(l_shipdate) AS BIGINT) + (l_orderkey * 7 + l_linenumber) % 86400 AS ts
  FROM lineitem
), oi AS (
  SELECT o_orderkey AS order_id,
         o_custkey AS user_id,
         o_custkey % 25 AS province_id,
         CASE o_orderstatus WHEN 'O' THEN '1001' WHEN 'P' THEN '1002' ELSE '1004' END AS order_status,
         CAST(o_totalprice AS DECIMAL(16,2)) AS original_total_amount
  FROM orders
), act AS (
  SELECT l_orderkey * 8 + l_linenumber AS id, 1 + l_orderkey % 3 AS activity_id
  FROM lineitem WHERE l_orderkey % 5 = 0
), cou AS (
  SELECT l_orderkey * 8 + l_linenumber AS id, 1 + l_orderkey % 4 AS coupon_id
  FROM lineitem WHERE l_orderkey % 7 = 0
), dic AS (
  SELECT * FROM {base_dic_values_sql()}
), dwd_order_detail AS (
  SELECT od.id, od.order_id, oi.user_id, od.sku_id, od.sku_num, od.order_price,
         oi.province_id, oi.order_status, oi.original_total_amount,
         act.activity_id, cou.coupon_id,
         od.split_total_amount, od.split_activity_amount, od.split_coupon_amount,
         od.source_type, dic.dic_name AS source_type_name,
         od.create_time, od.ts
  FROM od
  JOIN oi ON od.order_id = oi.order_id
  LEFT JOIN act ON od.id = act.id
  LEFT JOIN cou ON od.id = cou.id
  LEFT JOIN dic ON od.source_type = dic.dic_code
)
"""

SQL_PROVINCE_DIM = "SELECT CAST(n_nationkey AS BIGINT) AS province_id, n_name AS province_name FROM nation"

# sku dim chain flattened from part (SKU -> trademark/category levels),
# mirrors queries._sku_dim
SQL_SKU_DIM = """
SELECT p_partkey AS sku_id,
       p_brand AS trademark_name,
       p_type AS category1_name,
       p_type || '#' || CAST(p_size % 3 AS VARCHAR) AS category2_name,
       p_type || '#' || CAST(p_size % 3 AS VARCHAR) || '#' || CAST(p_size % 9 AS VARCHAR) AS category3_name,
       p_name AS spu_name
FROM part
"""

# payment CDC (mirrors cdc_gen.payment_info_cdc ∘ dwd_trade_pay_detail_suc)
SQL_DWD_PAY_SUC = f"""
WITH pay AS (
  SELECT o_orderkey AS order_id,
         o_custkey AS user_id,
         '110' || CAST(1 + o_orderkey % 3 AS VARCHAR) AS payment_type,
         CAST(o_totalprice AS DECIMAL(16,2)) AS pay_amount,
         CAST(epoch(o_orderdate) AS BIGINT) + o_orderkey % 86400 + 1800 AS ts
  FROM orders WHERE o_orderkey % 3 = 0
), dic AS (
  SELECT * FROM {base_dic_values_sql()}
), dwd_pay_suc AS (
  SELECT pay.order_id, pay.user_id, pay.payment_type, dic.dic_name AS payment_type_name,
         pay.pay_amount,
         strftime(make_timestamp(pay.ts * 1000000), '%Y-%m-%d %H:%M:%S') AS callback_time,
         pay.ts
  FROM pay LEFT JOIN dic ON pay.payment_type = dic.dic_code
)
"""

# cart CDC kept rows with delta (mirrors cdc_gen.cart_info_cdc ∘ dwd_trade_cart_add)
SQL_DWD_CART_ADD = """
WITH cart_base AS (
  SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey, l_extendedprice,
         CAST(l_quantity AS INT) AS qty,
         l_orderkey % 4 AS mod4,
         CAST(epoch(l_shipdate) AS BIGINT) + (l_orderkey * 7 + l_linenumber) % 86400 AS base_ts
  FROM lineitem
), dwd_cart_add AS (
  -- inserts keep full qty; qty-raising updates keep the delta (=1);
  -- qty-lowering updates are dropped by the change-detection predicate
  SELECT l_orderkey * 8 + l_linenumber AS id,
         l_suppkey % 500 AS user_id,
         l_partkey AS sku_id,
         CAST(qty AS BIGINT) AS sku_num,
         '240' || CAST(1 + l_partkey % 4 AS VARCHAR) AS source_type,
         base_ts AS ts
  FROM cart_base WHERE mod4 IN (1, 2, 3)
  UNION ALL
  SELECT l_orderkey * 8 + l_linenumber,
         l_suppkey % 500,
         l_partkey,
         CAST(1 AS BIGINT),
         '240' || CAST(1 + l_partkey % 4 AS VARCHAR),
         base_ts + 60
  FROM cart_base WHERE mod4 = 2
), cart_stream AS (
  -- the full cart_info changelog (inserts + both update kinds).
  -- lineitem contains duplicate (orderkey, linenumber) pairs, so ids
  -- collide; dedup ordering must therefore tiebreak on the payload.
  SELECT l_orderkey * 8 + l_linenumber AS id, l_suppkey % 500 AS user_id,
         l_partkey AS sku_id, CAST(qty AS BIGINT) AS sku_num, base_ts AS ts
  FROM cart_base WHERE mod4 IN (1, 2, 3)
  UNION ALL
  SELECT l_orderkey * 8 + l_linenumber, l_suppkey % 500,
         l_partkey, CAST(qty + 1 AS BIGINT), base_ts + 60
  FROM cart_base WHERE mod4 = 2
  UNION ALL
  SELECT l_orderkey * 8 + l_linenumber, l_suppkey % 500,
         l_partkey, CAST(qty - 1 AS BIGINT), base_ts + 60
  FROM cart_base WHERE mod4 = 3 AND qty > 1
), cart_latest AS (
  -- last-one-wins resolution of the cart changelog (SURVEY T4)
  SELECT id, user_id, sku_id, sku_num, ts FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY ts DESC, user_id DESC, sku_id DESC, sku_num DESC
    ) AS rn FROM cart_stream
  ) t WHERE rn = 1
), cart_first AS (
  -- first-one-wins (SURVEY T3): the insert row per id
  SELECT id, user_id, sku_id, sku_num, ts FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY ts ASC, user_id ASC, sku_id ASC, sku_num ASC
    ) AS rn FROM cart_stream
  ) t WHERE rn = 1
)
"""
