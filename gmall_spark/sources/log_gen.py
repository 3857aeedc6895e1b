"""Deterministic log-envelope derivation from the driver's ``events``
table (FIXTURES.md §2).

The reference's ODS ``topic_log`` is a Kafka topic of JSON clickstream
envelopes (BaseLogApp.java:117-172). Here the envelope is derived from
``events`` with pure Column expressions, serialized to real JSON
strings (with ~1% deliberately-malformed lines), then parsed back with
``from_json`` — so the DWD log pipeline exercises the reference's
parse + dirty-data side-output semantics (P1) on actual JSON.

Derivation (mirrored exactly by oracles.SQL_PAGE_LOG):

- mid = 'mid_'||user_id; vc = 'v3.'||user_id%3; ar = user_id%10
- ch = [appstore,xiaomi,huawei,oppo,web][user_id%5]
- is_new = '1' iff event_id%4==0 (deliberately wrong on later days —
  repaired by operators.uv.repair_is_new, ref BaseLogApp.java:64-101)
- page_id: view->good_detail, click->home, purchase->trade,
  signup->register, error->mine; click & event_id%3==0 is a keyword
  search: page_id=good_list, last_page_id='search',
  item='brand<i> kw<j>', item_type='keyword'
- last_page_id: previous page of the same user if within 30 min,
  else NULL (session start)
- during_time = round(value*1000) ms
- displays: two promoted-sku entries on view rows (explode target)
- malformed wire rows: event_id%97==0
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANNELS = ["appstore", "xiaomi", "huawei", "oppo", "web"]
SESSION_GAP_US = 1_800_000_000  # 30 min
DIRTY_MOD = 97

LOG_WIRE = T.StructType(
    [
        T.StructField(
            "common",
            T.StructType(
                [
                    T.StructField("mid", T.StringType()),
                    T.StructField("uid", T.LongType()),
                    T.StructField("vc", T.StringType()),
                    T.StructField("ch", T.StringType()),
                    T.StructField("ar", T.StringType()),
                    T.StructField("is_new", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "page",
            T.StructType(
                [
                    T.StructField("page_id", T.StringType()),
                    T.StructField("last_page_id", T.StringType()),
                    T.StructField("item", T.StringType()),
                    T.StructField("item_type", T.StringType()),
                    T.StructField("during_time", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "displays",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("item", T.StringType()),
                        T.StructField("item_type", T.StringType()),
                        T.StructField("pos_id", T.LongType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "actions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("action_id", T.StringType()),
                        T.StructField("item", T.StringType()),
                        T.StructField("item_type", T.StringType()),
                        T.StructField("ts", T.LongType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "start",
            T.StructType(
                [
                    T.StructField("entry", T.StringType()),
                    T.StructField("loading_time", T.LongType()),
                    T.StructField("open_ad_id", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "err",
            T.StructType(
                [
                    T.StructField("error_code", T.LongType()),
                    T.StructField("msg", T.StringType()),
                ]
            ),
        ),
        T.StructField("ts", T.LongType()),  # epoch millis (reference shape)
        T.StructField("ts_us", T.LongType()),  # micros (exact event time)
        T.StructField("event_id", T.LongType()),
    ]
)


def _page_id() -> Column:
    is_search = (F.col("event_type") == "click") & (F.col("event_id") % 3 == 0)
    return (
        F.when(is_search, F.lit("good_list"))
        .when(F.col("event_type") == "view", F.lit("good_detail"))
        .when(F.col("event_type") == "click", F.lit("home"))
        .when(F.col("event_type") == "purchase", F.lit("trade"))
        .when(F.col("event_type") == "signup", F.lit("register"))
        .otherwise(F.lit("mine"))
    )


def _enriched(events: DataFrame) -> DataFrame:
    is_search = (F.col("event_type") == "click") & (F.col("event_id") % 3 == 0)
    df = events.select(
        "event_id",
        F.col("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.concat(F.lit("mid_"), F.col("user_id").cast("string")).alias("mid"),
        F.concat(F.lit("v3."), (F.col("user_id") % 3).cast("string")).alias("vc"),
        F.element_at(
            F.array(*[F.lit(c) for c in CHANNELS]),
            (1 + F.col("user_id") % 5).cast("int"),
        ).alias("ch"),
        (F.col("user_id") % 10).cast("string").alias("ar"),
        F.when(F.col("event_id") % 4 == 0, F.lit("1")).otherwise(F.lit("0")).alias("is_new"),
        _page_id().alias("page_id"),
        F.when(
            is_search,
            F.concat(
                F.lit("brand"),
                (F.col("event_id") % 4).cast("string"),
                F.lit(" kw"),
                (F.col("event_id") % 8).cast("string"),
            ),
        ).alias("item"),
        F.when(is_search, F.lit("keyword")).alias("item_type"),
        F.round(F.col("value") * 1000).cast("long").alias("during_time"),
        is_search.alias("is_search"),
        (F.col("event_type") == "view").alias("is_view"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev_page = F.lag("page_id").over(w)
    prev_ts = F.lag("ts_us").over(w)
    last_page = (
        F.when(F.col("is_search"), F.lit("search"))
        .when(prev_ts.isNull() | (F.col("ts_us") - prev_ts > SESSION_GAP_US), F.lit(None))
        .otherwise(prev_page)
    )
    return df.withColumn("last_page_id", last_page)


def raw_topic_log(events: DataFrame) -> DataFrame:
    """Wire-format JSON strings, ~1/97 malformed (dirty-data fixture)."""
    e = _enriched(events)
    displays = F.when(
        F.col("is_view"),
        F.array(
            F.struct(
                F.concat(F.lit("sku"), (F.col("event_id") % 100).cast("string")).alias("item"),
                F.lit("sku_id").alias("item_type"),
                F.lit(1).cast("long").alias("pos_id"),
            ),
            F.struct(
                F.concat(F.lit("sku"), ((F.col("event_id") * 7) % 100).cast("string")).alias("item"),
                F.lit("sku_id").alias("item_type"),
                F.lit(2).cast("long").alias("pos_id"),
            ),
        ),
    )
    is_action = (F.col("page_id") == "home") & ~F.col("is_search")
    actions = F.when(
        is_action,
        F.array(
            F.struct(
                F.element_at(
                    F.array(F.lit("cart_add"), F.lit("favor_add")),
                    (1 + F.col("event_id") % 2).cast("int"),
                ).alias("action_id"),
                F.concat(F.lit("sku"), (F.col("event_id") % 100).cast("string")).alias("item"),
                F.lit("sku_id").alias("item_type"),
                ((F.col("ts_us") / 1000).cast("long") + F.col("during_time") / 2).cast(
                    "long"
                ).alias("ts"),
            )
        ),
    )
    start = F.when(
        F.col("last_page_id").isNull(),
        F.struct(
            F.element_at(
                F.array(F.lit("icon"), F.lit("notice"), F.lit("install")),
                (1 + F.col("event_id") % 3).cast("int"),
            ).alias("entry"),
            (F.col("event_id") % 2000).alias("loading_time"),
            (F.col("event_id") % 10).alias("open_ad_id"),
        ),
    )
    err = F.when(
        F.col("event_id") % 31 == 0,
        F.struct(
            (2001 + F.col("event_id") % 5).alias("error_code"),
            F.concat(F.lit("err_"), (F.col("event_id") % 7).cast("string")).alias("msg"),
        ),
    )
    wire = e.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.col("mid"),
                    F.col("user_id").alias("uid"),
                    F.col("vc"),
                    F.col("ch"),
                    F.col("ar"),
                    F.col("is_new"),
                ).alias("common"),
                F.struct(
                    F.col("page_id"),
                    F.col("last_page_id"),
                    F.col("item"),
                    F.col("item_type"),
                    F.col("during_time"),
                ).alias("page"),
                displays.alias("displays"),
                actions.alias("actions"),
                start.alias("start"),
                err.alias("err"),
                (F.col("ts_us") / 1000).cast("long").alias("ts"),
                F.col("ts_us"),
                F.col("event_id"),
            )
        ).alias("value"),
        F.col("event_id").alias("__eid"),
    )
    return wire.select(
        F.when(
            F.col("__eid") % DIRTY_MOD == 0, F.concat(F.lit("{broken"), F.col("value"))
        )
        .otherwise(F.col("value"))
        .alias("value")
    )


def parse_topic_log(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean page-level rows, dirty raw lines) — ref BaseLogApp.java:41-62.

    One ``from_json`` pass; the clean and dirty outputs are two filters
    of the same parsed DataFrame (Spark's analog of the side output).
    """
    parsed = raw.select(
        F.col("value"), F.from_json("value", LOG_WIRE).alias("j")
    )
    dirty = parsed.filter(F.col("j").isNull() | F.col("j.common").isNull()).select("value")
    clean = (
        parsed.filter(F.col("j").isNotNull() & F.col("j.common").isNotNull())
        .select(
            F.col("j.event_id").alias("event_id"),
            F.col("j.common.uid").alias("user_id"),
            F.col("j.common.mid").alias("mid"),
            F.col("j.common.vc").alias("vc"),
            F.col("j.common.ch").alias("ch"),
            F.col("j.common.ar").alias("ar"),
            F.col("j.common.is_new").alias("is_new"),
            F.col("j.page.page_id").alias("page_id"),
            F.col("j.page.last_page_id").alias("last_page_id"),
            F.col("j.page.item").alias("item"),
            F.col("j.page.item_type").alias("item_type"),
            F.col("j.page.during_time").alias("during_time"),
            F.col("j.displays").alias("displays"),
            F.col("j.actions").alias("actions"),
            F.col("j.start").alias("start"),
            F.col("j.err").alias("err"),
            F.col("j.ts_us").alias("ts_us"),
        )
        .withColumn("dt", F.date_format(F.timestamp_micros(F.col("ts_us")), "yyyy-MM-dd"))
        .withColumn(
            "is_session_start",
            F.when(F.col("last_page_id").isNull(), F.lit(1)).otherwise(F.lit(0)),
        )
    )
    return clean, dirty


def page_log(events: DataFrame) -> DataFrame:
    """events -> wire JSON -> parsed clean page log (the DWD log base)."""
    clean, _ = parse_topic_log(raw_topic_log(events))
    return clean
