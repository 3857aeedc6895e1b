"""Deterministic CDC-envelope derivation from the driver's tables.

FIXTURES.md §1: the reference's ODS layer is a Kafka topic ``topic_db``
of Maxwell CDC envelopes ``{database, table, type, data, old, ts}``
(ref utils/MyKafkaUtil.java:91-100). The driver provides TPC-H-ish
parquet instead, so this module derives reference-shaped CDC rows from
``orders``/``lineitem`` with deterministic, seedless expressions that
are reproducible in ANSI SQL for the DuckDB oracle.

Derivation rules (all modulo-arithmetic on keys, so both engines agree):

- every order  -> one ``order_info`` insert (status from o_orderstatus)
- o_orderkey%10==0 -> an ``order_info`` cancel update (status '1003',
  old[order_status] set) 1 h later   [exercises P7 cancel filter]
- every lineitem -> one ``order_detail`` insert
- l_orderkey%5==0 -> one ``order_detail_activity`` insert
- l_orderkey%7==0 -> one ``order_detail_coupon`` insert
- o_orderkey%3==0 -> a ``payment_info`` pay-success update
  (payment_status '1602', old set)   [exercises P7 pay-success filter]
- o_orderkey%10==5 -> an ``order_refund_info`` insert + an
  ``order_info`` refund update ('1005')  [P7 refund filter]
- cart rows from lineitem (changelog per id): l_orderkey%4 in
  {1,2,3} -> insert; %4==2 -> + update raising sku_num by 1 (kept,
  delta rule P4); %4==3 & qty>1 -> + update lowering sku_num (must
  be dropped by the delta rule; exercises last-one-wins dedup T4)

Timestamps: ts = epoch(o_orderdate) + key % 86400 (spread across the
day so tumbling windows get sub-day exercise).

Money discipline: parquet stores 2-decimal money as DOUBLE. Casting a
*stored* cent value to DECIMAL(16,2) is engine-agnostic (the double is
within 1e-11 of the cent, nowhere near the .005 boundary), but casting
a *computed* double (e.g. price*(1-disc)) is not — Spark rounds the
double's shortest decimal string, DuckDB rounds the exact binary value,
and half-cent products disagree. So: cast sources to decimal first,
multiply in exact decimal arithmetic, keep the full scale-4 product,
never round a computed double.

Implementation note: every envelope column is built as ONE Spark-SQL
expression string fed to ``selectExpr`` instead of composing hundreds
of ``pyspark.sql.functions`` Column objects. The resulting Catalyst
plans are identical (verified by exceptAll both ways against the
Column-based build at sf0.01), but plan CONSTRUCTION drops from ~2.2 s
to ~0.1 s of driver time: each ``F.create_map``/``F.lit``/``.cast``
chain is a py4j round-trip, and the 11-branch envelope makes thousands
of them, which dominated the bench's materialize line item. At 100 TB
the execution plan is unchanged; this only removes driver-side latency
per job submission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DB = "gmall"

# o_orderstatus -> reference order_status codes
# 'O' (open) -> 1001 unpaid, 'P' (pending) -> 1002 paid, 'F' (finished) -> 1004 done
_STATUS = {"O": "1001", "P": "1002", "F": "1004"}

_STATUS_SQL = (
    "CASE WHEN o_orderstatus = 'O' THEN '1001' "
    "WHEN o_orderstatus = 'P' THEN '1002' ELSE '1004' END"
)

# ts = epoch(o_orderdate) + key % 86400 (spread across the day)
_ORDER_TS = "(unix_timestamp(o_orderdate) + (o_orderkey % 86400))"
_DETAIL_TS = "(unix_timestamp(l_shipdate) + ((l_orderkey * 7 + l_linenumber) % 86400))"

_NULL_MAP = "CAST(NULL AS MAP<STRING,STRING>)"


def _fmt(ts_sql: str) -> str:
    return f"from_unixtime({ts_sql}, 'yyyy-MM-dd HH:mm:ss')"


def _s(expr: str) -> str:
    return f"CAST({expr} AS STRING)"


def _map(*pairs: str) -> str:
    """map('k1', v1, 'k2', v2, ...) from alternating key/value SQL."""
    return "map(" + ", ".join(pairs) + ")"


def _envelope(table: str, typ: str, data: str, old: str, ts: str) -> list[str]:
    """The six envelope columns as selectExpr strings.

    ``typ`` is a quoted literal like ``'insert'`` (or any SQL string
    expression); ``table`` needs backticks — it is a reserved word in
    the Spark SQL parser.
    """
    return [
        f"'{DB}' AS database",
        f"'{table}' AS `table`",
        f"{typ} AS type",
        f"{data} AS data",
        f"{old} AS old",
        f"CAST({ts} AS BIGINT) AS ts",
    ]


def order_info_cdc(orders: DataFrame) -> DataFrame:
    """order_info inserts + cancel/refund status updates."""
    ts = _ORDER_TS

    def _data(status_sql: str, extra: str = "") -> str:
        return _map(
            "'id'", _s("o_orderkey"),
            "'user_id'", _s("o_custkey"),
            "'province_id'", _s("o_custkey % 25"),
            "'order_status'", status_sql,
            "'original_total_amount'", _s("CAST(o_totalprice AS DECIMAL(16,2))"),
            "'create_time'", _fmt(ts),
            *([extra] if extra else []),
        )

    inserts = orders.selectExpr(
        *_envelope("order_info", "'insert'", _data(_STATUS_SQL), _NULL_MAP, ts)
    )

    def _update(pred: str, new_status: str, delay: int) -> DataFrame:
        uts = f"({ts} + {delay})"
        data = _data(f"'{new_status}'", f"'operate_time', {_fmt(uts)}")
        old = _map("'order_status'", _STATUS_SQL)
        return orders.filter(pred).selectExpr(
            *_envelope("order_info", "'update'", data, old, uts)
        )

    cancels = _update("o_orderkey % 10 = 0", "1003", 3600)
    refunds = _update("o_orderkey % 10 = 5", "1005", 7200)
    return inserts.unionByName(cancels).unionByName(refunds)


def order_detail_cdc(lineitem: DataFrame) -> DataFrame:
    """order_detail inserts (one per lineitem; id = orderkey*8+linenumber)."""
    ts = _DETAIL_TS
    price_dec = "CAST(l_extendedprice AS DECIMAL(16,2))"
    data = _map(
        "'id'", _s("l_orderkey * 8 + l_linenumber"),
        "'order_id'", _s("l_orderkey"),
        "'sku_id'", _s("l_partkey"),
        "'sku_num'", _s("CAST(l_quantity AS INT)"),
        "'order_price'", _s(price_dec),
        "'split_total_amount'",
        _s(
            f"CAST({price_dec} * (CAST(1 AS DECIMAL(4,2)) - "
            "CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"
        ),
        "'split_activity_amount'",
        _s(
            "CASE WHEN l_orderkey % 5 = 0 THEN "
            f"CAST({price_dec} * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4)) END"
        ),
        "'split_coupon_amount'",
        _s(
            "CASE WHEN l_orderkey % 7 = 0 THEN "
            f"CAST({price_dec} * CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(18,4)) END"
        ),
        "'source_type'", "concat('240', CAST(1 + l_partkey % 4 AS STRING))",
        "'create_time'", _fmt(ts),
    )
    return lineitem.selectExpr(
        *_envelope("order_detail", "'insert'", data, _NULL_MAP, ts)
    )


def order_detail_activity_cdc(lineitem: DataFrame) -> DataFrame:
    ts = _DETAIL_TS
    data = _map(
        "'order_detail_id'", _s("l_orderkey * 8 + l_linenumber"),
        "'order_id'", _s("l_orderkey"),
        "'activity_id'", _s("1 + l_orderkey % 3"),
        "'activity_rule_id'", _s("1 + l_orderkey % 6"),
        "'create_time'", _fmt(ts),
    )
    return lineitem.filter("l_orderkey % 5 = 0").selectExpr(
        *_envelope("order_detail_activity", "'insert'", data, _NULL_MAP, ts)
    )


def order_detail_coupon_cdc(lineitem: DataFrame) -> DataFrame:
    ts = _DETAIL_TS
    data = _map(
        "'order_detail_id'", _s("l_orderkey * 8 + l_linenumber"),
        "'order_id'", _s("l_orderkey"),
        "'coupon_id'", _s("1 + l_orderkey % 4"),
        "'create_time'", _fmt(ts),
    )
    return lineitem.filter("l_orderkey % 7 = 0").selectExpr(
        *_envelope("order_detail_coupon", "'insert'", data, _NULL_MAP, ts)
    )


def payment_info_cdc(orders: DataFrame) -> DataFrame:
    """payment_info pay-success updates (payment_status 1602, old set)."""
    ts = f"({_ORDER_TS} + 1800)"
    data = _map(
        "'order_id'", _s("o_orderkey"),
        "'user_id'", _s("o_custkey"),
        "'payment_type'", "concat('110', CAST(1 + o_orderkey % 3 AS STRING))",
        "'payment_status'", "'1602'",
        "'callback_time'", _fmt(ts),
        "'total_amount'", _s("CAST(o_totalprice AS DECIMAL(16,2))"),
    )
    old = _map("'payment_status'", "'1601'")
    return orders.filter("o_orderkey % 3 = 0").selectExpr(
        *_envelope("payment_info", "'update'", data, old, ts)
    )


def order_refund_info_cdc(orders: DataFrame) -> DataFrame:
    ts = f"({_ORDER_TS} + 7200)"
    data = _map(
        "'id'", _s("o_orderkey"),
        "'user_id'", _s("o_custkey"),
        "'order_id'", _s("o_orderkey"),
        "'sku_id'", _s("o_orderkey % 2000"),
        "'refund_type'", "concat('150', CAST(1 + o_orderkey % 2 AS STRING))",
        "'refund_num'", "'1'",
        "'refund_amount'", _s("CAST(o_totalprice AS DECIMAL(16,2))"),
        "'create_time'", _fmt(ts),
    )
    return orders.filter("o_orderkey % 10 = 5").selectExpr(
        *_envelope("order_refund_info", "'insert'", data, _NULL_MAP, ts)
    )


def cart_info_cdc(lineitem: DataFrame) -> DataFrame:
    """cart_info inserts + sku_num up/down updates (P4 delta rule)."""
    ts = _DETAIL_TS
    qty = "CAST(l_quantity AS INT)"

    def _data(num_sql: str) -> str:
        return _map(
            "'id'", _s("l_orderkey * 8 + l_linenumber"),
            "'user_id'", _s("l_suppkey % 500"),
            "'sku_id'", _s("l_partkey"),
            "'cart_price'", _s("CAST(l_extendedprice AS DECIMAL(16,2))"),
            "'sku_num'", _s(num_sql),
            "'source_type'", "concat('240', CAST(1 + l_partkey % 4 AS STRING))",
            "'create_time'", _fmt(ts),
        )

    old_num = _map("'sku_num'", _s(qty))
    inserts = lineitem.filter("l_orderkey % 4 IN (1, 2, 3)").selectExpr(
        *_envelope("cart_info", "'insert'", _data(qty), _NULL_MAP, ts)
    )
    ups = lineitem.filter("l_orderkey % 4 = 2").selectExpr(
        *_envelope("cart_info", "'update'", _data(f"{qty} + 1"), old_num, f"({ts} + 60)")
    )
    downs = lineitem.filter(f"l_orderkey % 4 = 3 AND {qty} > 1").selectExpr(
        *_envelope("cart_info", "'update'", _data(f"{qty} - 1"), old_num, f"({ts} + 60)")
    )
    return inserts.unionByName(ups).unionByName(downs)


def favor_info_cdc(lineitem: DataFrame) -> DataFrame:
    """favor_info inserts + cancel-undo/cancel updates (P11 filter food).

    - l_orderkey%6==1 -> insert (kept by DwdInteractionFavorAdd)
    - l_orderkey%6==4 -> cancel-undo update (old.is_cancel=1 -> 0, KEPT)
    - l_orderkey%6==5 -> cancel update (0 -> 1, must be DROPPED)
    """
    ts = _DETAIL_TS

    def _data(is_cancel: str) -> str:
        return _map(
            "'id'", _s("l_orderkey * 8 + l_linenumber"),
            "'user_id'", _s("l_suppkey % 500"),
            "'sku_id'", _s("l_partkey"),
            "'is_cancel'", f"'{is_cancel}'",
            "'create_time'", _fmt(ts),
        )

    inserts = lineitem.filter("l_orderkey % 6 = 1").selectExpr(
        *_envelope("favor_info", "'insert'", _data("0"), _NULL_MAP, ts)
    )
    undo = lineitem.filter("l_orderkey % 6 = 4").selectExpr(
        *_envelope(
            "favor_info", "'update'", _data("0"),
            _map("'is_cancel'", "'1'"), f"({ts} + 120)",
        )
    )
    cancel = lineitem.filter("l_orderkey % 6 = 5").selectExpr(
        *_envelope(
            "favor_info", "'update'", _data("1"),
            _map("'is_cancel'", "'0'"), f"({ts} + 120)",
        )
    )
    return inserts.unionByName(undo).unionByName(cancel)


def comment_info_cdc(lineitem: DataFrame) -> DataFrame:
    """comment_info inserts (appraise code 120x, looked up in base_dic)."""
    ts = f"({_DETAIL_TS} + 600)"
    data = _map(
        "'id'", _s("l_orderkey * 8 + l_linenumber"),
        "'user_id'", _s("l_suppkey % 500"),
        "'sku_id'", _s("l_partkey"),
        "'order_id'", _s("l_orderkey"),
        "'appraise'", "concat('120', CAST(1 + l_partkey % 4 AS STRING))",
        "'create_time'", _fmt(ts),
    )
    return lineitem.filter("l_orderkey % 9 = 0").selectExpr(
        *_envelope("comment_info", "'insert'", data, _NULL_MAP, ts)
    )


def coupon_use_cdc(orders: DataFrame) -> DataFrame:
    """coupon_use lifecycle: get (insert) -> order (using_time update) ->
    pay (used_time update).

    The updates carry the touched key in ``old`` so the P8
    ``array_contains(map_keys(old), 'using_time'/'used_time')``
    change-detection idiom has something to detect:
    - o_orderkey%4==1  -> insert (coupon get)
    - o_orderkey%8==1  -> + update with using_time (coupon order)
    - o_orderkey%16==1 -> + update with used_time (coupon pay)
    """
    base = f"({_ORDER_TS} + 300)"

    def _data(extra: list[str]) -> str:
        return _map(
            "'id'", _s("o_orderkey"),
            "'coupon_id'", _s("1 + o_orderkey % 4"),
            "'user_id'", _s("o_custkey"),
            "'order_id'", _s("o_orderkey"),
            "'get_time'", _fmt(base),
            *extra,
        )

    gets = orders.filter("o_orderkey % 4 = 1").selectExpr(
        *_envelope("coupon_use", "'insert'", _data([]), _NULL_MAP, base)
    )
    uses = orders.filter("o_orderkey % 8 = 1").selectExpr(
        *_envelope(
            "coupon_use", "'update'",
            _data(["'using_time'", _fmt(f"({base} + 600)")]),
            _map("'using_time'", "''"),
            f"({base} + 600)",
        )
    )
    pays = orders.filter("o_orderkey % 16 = 1").selectExpr(
        *_envelope(
            "coupon_use", "'update'",
            _data(
                [
                    "'using_time'", _fmt(f"({base} + 600)"),
                    "'used_time'", _fmt(f"({base} + 1200)"),
                ]
            ),
            _map("'used_time'", "''"),
            f"({base} + 1200)",
        )
    )
    return gets.unionByName(uses).unionByName(pays)


# epoch('1995-01-01') — fixed base so Spark and DuckDB agree without
# consulting the session timezone
_USER_EPOCH = 788918400


def user_info_cdc(customer: DataFrame) -> DataFrame:
    """user_info inserts (registrations spread over 30 synthetic days)
    plus account deletions (every 50th customer, one hour later) so the
    DIM tombstone path has real delete envelopes to resolve."""
    ts = f"({_USER_EPOCH} + (c_custkey % 30) * 86400 + (c_custkey * 13) % 86400)"
    data = _map(
        "'id'", _s("c_custkey"),
        "'name'", "c_name",
        "'create_time'", _fmt(ts),
    )
    inserts = customer.selectExpr(
        *_envelope("user_info", "'insert'", data, _NULL_MAP, ts)
    )
    # Maxwell-style delete: ``data`` carries the deleted row's image
    deletes = customer.filter("c_custkey % 50 = 0").selectExpr(
        *_envelope("user_info", "'delete'", data, _NULL_MAP, f"({ts} + 3600)")
    )
    return inserts.unionByName(deletes)


def topic_db(
    orders: DataFrame, lineitem: DataFrame, customer: DataFrame | None = None
) -> DataFrame:
    """The full synthetic ``topic_db`` CDC stream (union of all tables)."""
    parts = [
        order_info_cdc(orders),
        order_detail_cdc(lineitem),
        order_detail_activity_cdc(lineitem),
        order_detail_coupon_cdc(lineitem),
        payment_info_cdc(orders),
        order_refund_info_cdc(orders),
        cart_info_cdc(lineitem),
        favor_info_cdc(lineitem),
        comment_info_cdc(lineitem),
        coupon_use_cdc(orders),
    ]
    if customer is not None:
        parts.append(user_info_cdc(customer))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
