"""Deterministic CDC-envelope derivation from the driver's tables.

FIXTURES.md §1: the reference's ODS layer is a Kafka topic ``topic_db``
of Maxwell CDC envelopes ``{database, table, type, data, old, ts}``
(ref utils/MyKafkaUtil.java:91-100). The driver provides TPC-H-ish
parquet instead, so this module derives reference-shaped CDC rows from
``orders``/``lineitem`` with pure Column expressions — deterministic,
seedless, and reproducible in ANSI SQL for the DuckDB oracle.

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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DB = "gmall"

# o_orderstatus -> reference order_status codes
# 'O' (open) -> 1001 unpaid, 'P' (pending) -> 1002 paid, 'F' (finished) -> 1004 done
_STATUS = {"O": "1001", "P": "1002", "F": "1004"}


def _status_col() -> Column:
    c = F.col("o_orderstatus")
    return (
        F.when(c == "O", F.lit("1001"))
        .when(c == "P", F.lit("1002"))
        .otherwise(F.lit("1004"))
    )


def _order_ts() -> Column:
    return F.unix_timestamp("o_orderdate") + F.col("o_orderkey") % 86400


def _detail_ts() -> Column:
    return (
        F.unix_timestamp("l_shipdate")
        + (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 86400
    )


def _envelope(table: str, typ: Column | str, data: Column, old: Column, ts: Column):
    typ_col = F.lit(typ) if isinstance(typ, str) else typ
    return [
        F.lit(DB).alias("database"),
        F.lit(table).alias("table"),
        typ_col.alias("type"),
        data.alias("data"),
        old.alias("old"),
        ts.cast("long").alias("ts"),
    ]


def _null_map() -> Column:
    return F.lit(None).cast("map<string,string>")


def _fmt_time(ts_seconds: Column) -> Column:
    return F.from_unixtime(ts_seconds, "yyyy-MM-dd HH:mm:ss")


def order_info_cdc(orders: DataFrame) -> DataFrame:
    """order_info inserts + cancel/refund status updates."""
    ts = _order_ts()
    base_data = F.create_map(
        F.lit("id"), F.col("o_orderkey").cast("string"),
        F.lit("user_id"), F.col("o_custkey").cast("string"),
        F.lit("province_id"), (F.col("o_custkey") % 25).cast("string"),
        F.lit("order_status"), _status_col(),
        F.lit("original_total_amount"),
        F.col("o_totalprice").cast("decimal(16,2)").cast("string"),
        F.lit("create_time"), _fmt_time(ts),
    )
    inserts = orders.select(*_envelope("order_info", "insert", base_data, _null_map(), ts))

    def _update(pred: Column, new_status: str, delay: int) -> DataFrame:
        uts = ts + delay
        data = F.create_map(
            F.lit("id"), F.col("o_orderkey").cast("string"),
            F.lit("user_id"), F.col("o_custkey").cast("string"),
            F.lit("province_id"), (F.col("o_custkey") % 25).cast("string"),
            F.lit("order_status"), F.lit(new_status),
            F.lit("original_total_amount"),
            F.col("o_totalprice").cast("decimal(16,2)").cast("string"),
            F.lit("create_time"), _fmt_time(ts),
            F.lit("operate_time"), _fmt_time(uts),
        )
        old = F.create_map(F.lit("order_status"), _status_col())
        return orders.filter(pred).select(
            *_envelope("order_info", "update", data, old, uts)
        )

    cancels = _update(F.col("o_orderkey") % 10 == 0, "1003", 3600)
    refunds = _update(F.col("o_orderkey") % 10 == 5, "1005", 7200)
    return inserts.unionByName(cancels).unionByName(refunds)


def order_detail_cdc(lineitem: DataFrame) -> DataFrame:
    """order_detail inserts (one per lineitem; id = orderkey*8+linenumber)."""
    ts = _detail_ts()
    data = F.create_map(
        F.lit("id"), (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string"),
        F.lit("order_id"), F.col("l_orderkey").cast("string"),
        F.lit("sku_id"), F.col("l_partkey").cast("string"),
        F.lit("sku_num"), F.col("l_quantity").cast("int").cast("string"),
        F.lit("order_price"),
        F.col("l_extendedprice").cast("decimal(16,2)").cast("string"),
        F.lit("split_total_amount"),
        (
            F.col("l_extendedprice").cast("decimal(16,2)")
            * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
        )
        .cast("decimal(18,4)")
        .cast("string"),
        F.lit("split_activity_amount"),
        F.when(
            F.col("l_orderkey") % 5 == 0,
            (
                F.col("l_extendedprice").cast("decimal(16,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            ).cast("decimal(18,4)"),
        ).cast("string"),
        F.lit("split_coupon_amount"),
        F.when(
            F.col("l_orderkey") % 7 == 0,
            (
                F.col("l_extendedprice").cast("decimal(16,2)")
                * F.col("l_tax").cast("decimal(4,2)")
            ).cast("decimal(18,4)"),
        ).cast("string"),
        F.lit("source_type"), F.concat(F.lit("240"), (1 + F.col("l_partkey") % 4).cast("string")),
        F.lit("create_time"), _fmt_time(ts),
    )
    return lineitem.select(*_envelope("order_detail", "insert", data, _null_map(), ts))


def order_detail_activity_cdc(lineitem: DataFrame) -> DataFrame:
    ts = _detail_ts()
    rows = lineitem.filter(F.col("l_orderkey") % 5 == 0)
    data = F.create_map(
        F.lit("order_detail_id"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string"),
        F.lit("order_id"), F.col("l_orderkey").cast("string"),
        F.lit("activity_id"), (1 + F.col("l_orderkey") % 3).cast("string"),
        F.lit("activity_rule_id"), (1 + F.col("l_orderkey") % 6).cast("string"),
        F.lit("create_time"), _fmt_time(ts),
    )
    return rows.select(*_envelope("order_detail_activity", "insert", data, _null_map(), ts))


def order_detail_coupon_cdc(lineitem: DataFrame) -> DataFrame:
    ts = _detail_ts()
    rows = lineitem.filter(F.col("l_orderkey") % 7 == 0)
    data = F.create_map(
        F.lit("order_detail_id"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string"),
        F.lit("order_id"), F.col("l_orderkey").cast("string"),
        F.lit("coupon_id"), (1 + F.col("l_orderkey") % 4).cast("string"),
        F.lit("create_time"), _fmt_time(ts),
    )
    return rows.select(*_envelope("order_detail_coupon", "insert", data, _null_map(), ts))


def payment_info_cdc(orders: DataFrame) -> DataFrame:
    """payment_info pay-success updates (payment_status 1602, old set)."""
    ts = _order_ts() + 1800
    rows = orders.filter(F.col("o_orderkey") % 3 == 0)
    data = F.create_map(
        F.lit("order_id"), F.col("o_orderkey").cast("string"),
        F.lit("user_id"), F.col("o_custkey").cast("string"),
        F.lit("payment_type"), F.concat(F.lit("110"), (1 + F.col("o_orderkey") % 3).cast("string")),
        F.lit("payment_status"), F.lit("1602"),
        F.lit("callback_time"), _fmt_time(ts),
        F.lit("total_amount"),
        F.col("o_totalprice").cast("decimal(16,2)").cast("string"),
    )
    old = F.create_map(F.lit("payment_status"), F.lit("1601"))
    return rows.select(*_envelope("payment_info", "update", data, old, ts))


def order_refund_info_cdc(orders: DataFrame) -> DataFrame:
    ts = _order_ts() + 7200
    rows = orders.filter(F.col("o_orderkey") % 10 == 5)
    data = F.create_map(
        F.lit("id"), F.col("o_orderkey").cast("string"),
        F.lit("user_id"), F.col("o_custkey").cast("string"),
        F.lit("order_id"), F.col("o_orderkey").cast("string"),
        F.lit("sku_id"), (F.col("o_orderkey") % 2000).cast("string"),
        F.lit("refund_type"), F.concat(F.lit("150"), (1 + F.col("o_orderkey") % 2).cast("string")),
        F.lit("refund_num"), F.lit("1"),
        F.lit("refund_amount"),
        F.col("o_totalprice").cast("decimal(16,2)").cast("string"),
        F.lit("create_time"), _fmt_time(ts),
    )
    return rows.select(*_envelope("order_refund_info", "insert", data, _null_map(), ts))


def cart_info_cdc(lineitem: DataFrame) -> DataFrame:
    """cart_info inserts + sku_num up/down updates (P4 delta rule)."""
    ts = _detail_ts()
    mod = F.col("l_orderkey") % 4
    qty = F.col("l_quantity").cast("int")
    _id = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string")

    def _data(num: Column) -> Column:
        return F.create_map(
            F.lit("id"), _id,
            F.lit("user_id"), (F.col("l_suppkey") % 500).cast("string"),
            F.lit("sku_id"), F.col("l_partkey").cast("string"),
            F.lit("cart_price"),
            F.col("l_extendedprice").cast("decimal(16,2)").cast("string"),
            F.lit("sku_num"), num.cast("string"),
            F.lit("source_type"),
            F.concat(F.lit("240"), (1 + F.col("l_partkey") % 4).cast("string")),
            F.lit("create_time"), _fmt_time(ts),
        )

    inserts = lineitem.filter(mod.isin(1, 2, 3)).select(
        *_envelope("cart_info", "insert", _data(qty), _null_map(), ts)
    )
    ups = lineitem.filter(mod == 2).select(
        *_envelope(
            "cart_info",
            "update",
            _data(qty + 1),
            F.create_map(F.lit("sku_num"), qty.cast("string")),
            ts + 60,
        )
    )
    downs = lineitem.filter((mod == 3) & (qty > 1)).select(
        *_envelope(
            "cart_info",
            "update",
            _data(qty - 1),
            F.create_map(F.lit("sku_num"), qty.cast("string")),
            ts + 60,
        )
    )
    return inserts.unionByName(ups).unionByName(downs)


def favor_info_cdc(lineitem: DataFrame) -> DataFrame:
    """favor_info inserts + cancel-undo/cancel updates (P11 filter food).

    - l_orderkey%6==1 -> insert (kept by DwdInteractionFavorAdd)
    - l_orderkey%6==4 -> cancel-undo update (old.is_cancel=1 -> 0, KEPT)
    - l_orderkey%6==5 -> cancel update (0 -> 1, must be DROPPED)
    """
    ts = _detail_ts()
    _id = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string")
    mod = F.col("l_orderkey") % 6

    def _data(is_cancel: str) -> Column:
        return F.create_map(
            F.lit("id"), _id,
            F.lit("user_id"), (F.col("l_suppkey") % 500).cast("string"),
            F.lit("sku_id"), F.col("l_partkey").cast("string"),
            F.lit("is_cancel"), F.lit(is_cancel),
            F.lit("create_time"), _fmt_time(ts),
        )

    inserts = lineitem.filter(mod == 1).select(
        *_envelope("favor_info", "insert", _data("0"), _null_map(), ts)
    )
    undo = lineitem.filter(mod == 4).select(
        *_envelope(
            "favor_info", "update", _data("0"),
            F.create_map(F.lit("is_cancel"), F.lit("1")), ts + 120,
        )
    )
    cancel = lineitem.filter(mod == 5).select(
        *_envelope(
            "favor_info", "update", _data("1"),
            F.create_map(F.lit("is_cancel"), F.lit("0")), ts + 120,
        )
    )
    return inserts.unionByName(undo).unionByName(cancel)


def comment_info_cdc(lineitem: DataFrame) -> DataFrame:
    """comment_info inserts (appraise code 120x, looked up in base_dic)."""
    ts = _detail_ts() + 600
    rows = lineitem.filter(F.col("l_orderkey") % 9 == 0)
    data = F.create_map(
        F.lit("id"), (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string"),
        F.lit("user_id"), (F.col("l_suppkey") % 500).cast("string"),
        F.lit("sku_id"), F.col("l_partkey").cast("string"),
        F.lit("order_id"), F.col("l_orderkey").cast("string"),
        F.lit("appraise"), F.concat(F.lit("120"), (1 + F.col("l_partkey") % 4).cast("string")),
        F.lit("create_time"), _fmt_time(ts),
    )
    return rows.select(*_envelope("comment_info", "insert", data, _null_map(), ts))


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
    base_ts = _order_ts() + 300
    _id = F.col("o_orderkey").cast("string")
    coupon_id = (1 + F.col("o_orderkey") % 4).cast("string")
    user_id = F.col("o_custkey").cast("string")

    def _data(extra: list[Column]) -> Column:
        return F.create_map(
            F.lit("id"), _id,
            F.lit("coupon_id"), coupon_id,
            F.lit("user_id"), user_id,
            F.lit("order_id"), F.col("o_orderkey").cast("string"),
            F.lit("get_time"), _fmt_time(base_ts),
            *extra,
        )

    gets = orders.filter(F.col("o_orderkey") % 4 == 1).select(
        *_envelope("coupon_use", "insert", _data([]), _null_map(), base_ts)
    )
    uses = orders.filter(F.col("o_orderkey") % 8 == 1).select(
        *_envelope(
            "coupon_use", "update",
            _data([F.lit("using_time"), _fmt_time(base_ts + 600)]),
            F.create_map(F.lit("using_time"), F.lit("")),
            base_ts + 600,
        )
    )
    pays = orders.filter(F.col("o_orderkey") % 16 == 1).select(
        *_envelope(
            "coupon_use", "update",
            _data(
                [
                    F.lit("using_time"), _fmt_time(base_ts + 600),
                    F.lit("used_time"), _fmt_time(base_ts + 1200),
                ]
            ),
            F.create_map(F.lit("used_time"), F.lit("")),
            base_ts + 1200,
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
    ts = (
        F.lit(_USER_EPOCH)
        + (F.col("c_custkey") % 30) * 86400
        + (F.col("c_custkey") * 13) % 86400
    )
    data = F.create_map(
        F.lit("id"), F.col("c_custkey").cast("string"),
        F.lit("name"), F.col("c_name"),
        F.lit("create_time"), _fmt_time(ts),
    )
    inserts = customer.select(
        *_envelope("user_info", "insert", data, _null_map(), ts)
    )
    # Maxwell-style delete: ``data`` carries the deleted row's image
    deletes = customer.filter(F.col("c_custkey") % 50 == 0).select(
        *_envelope("user_info", "delete", data, _null_map(), ts + 3600)
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
