"""Traffic (clickstream) DWD/DWS pipelines.

Re-expresses the reference's BaseLogApp split + traffic DWS jobs over
the parsed page log (sources/log_gen.page_log):

- BaseLogApp 5-way split w/ explode        (P10)  -> display_log
- unique-visitor detail (per-day UV)       (A5)   -> operators.uv
- user-jump (bounce) CEP                   (T5)   -> operators.sessionize
- vc/ch/ar/is_new page-view window         (A1)
- source-keyword window w/ tokenizer UDTF  (A3/F1)
- home/good_detail UV window               (A2)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_spark.operators.sessionize import detect_jumps
from gmall_spark.operators.uv import first_of_day_flag, repair_is_new
from gmall_spark.operators.windows import tumble_agg

PAGE_COLS = [
    "mid",
    "user_id",
    "vc",
    "ch",
    "ar",
    "is_new",
    "page_id",
    "last_page_id",
    "item",
    "item_type",
    "during_time",
    "ts_us",
    "dt",
    "is_session_start",
    "event_id",
]


def dwd_traffic_page_log(page_log: DataFrame) -> DataFrame:
    """The page branch of the BaseLogApp split (displays dropped)."""
    return page_log.select(*PAGE_COLS)


def dwd_traffic_display_log(page_log: DataFrame) -> DataFrame:
    """Display branch: explode displays[], enrich with page context.

    Ref BaseLogApp.java:143-153 (SURVEY P10): each display element
    becomes a row carrying page_id + ts.
    """
    return (
        page_log.filter(F.col("displays").isNotNull())
        .select(
            "mid",
            "page_id",
            "ts_us",
            F.explode("displays").alias("d"),
        )
        .select(
            "mid",
            "page_id",
            F.col("d.item").alias("display_item"),
            F.col("d.item_type").alias("display_item_type"),
            F.col("d.pos_id").alias("pos_id"),
            "ts_us",
        )
    )


def dwd_traffic_action_log(page_log: DataFrame) -> DataFrame:
    """Action branch: explode actions[], enrich with page context.

    Ref BaseLogApp.java:154-166 (SURVEY P10): each action element
    becomes a row carrying page_id + its own action ts.
    """
    return (
        page_log.filter(F.col("actions").isNotNull())
        .select("mid", "page_id", F.explode("actions").alias("a"))
        .select(
            "mid",
            "page_id",
            F.col("a.action_id").alias("action_id"),
            F.col("a.item").alias("action_item"),
            F.col("a.item_type").alias("action_item_type"),
            F.col("a.ts").alias("action_ts"),
        )
    )


def dwd_traffic_start_log(page_log: DataFrame) -> DataFrame:
    """Start (app-launch) branch — ref BaseLogApp.java:126-136 (P10)."""
    return page_log.filter(F.col("start").isNotNull()).select(
        "mid",
        "vc",
        "ch",
        "ar",
        F.col("start.entry").alias("entry"),
        F.col("start.loading_time").alias("loading_time"),
        F.col("start.open_ad_id").alias("open_ad_id"),
        "ts_us",
    )


def dwd_traffic_error_log(page_log: DataFrame) -> DataFrame:
    """Error branch — ref BaseLogApp.java:109-125 (P10)."""
    return page_log.filter(F.col("err").isNotNull()).select(
        "mid",
        "page_id",
        F.col("err.error_code").alias("error_code"),
        F.col("err.msg").alias("msg"),
        "ts_us",
    )


def dwd_traffic_unique_visitor_detail(page_log: DataFrame) -> DataFrame:
    """First page view of each mid per day (ref
    DwdTrafficUniqueVisitorDetail.java:55-87, SURVEY A5)."""
    flagged = first_of_day_flag(
        page_log, "mid", "dt", ["ts_us", "event_id"], "is_first_of_day"
    )
    return flagged.filter(F.col("is_first_of_day") == 1).select(*PAGE_COLS)


def dwd_traffic_user_jump_detail(page_log: DataFrame) -> DataFrame:
    """Bounce rows (ref DwdTrafficUserJumpDetail.java:62-101, SURVEY T5)."""
    return detect_jumps(page_log, key="mid", ts_us_col="ts_us").select(*PAGE_COLS)


def _with_flags(page_log: DataFrame) -> DataFrame:
    """Repair is_new (P9) and attach uv/sv/uj row flags in one pass.

    The reference unions three derived streams (uv detail, page
    stream, jump detail) before windowing (SURVEY U1); computing all
    flags as window functions over one scan yields the identical
    aggregate without re-reading the page log three times — at 100 TB
    that saves two full scans and a 3-way union shuffle. All window
    specs hash-partition by ``mid``, so Catalyst reuses one exchange.
    """
    from pyspark.sql import Window

    w_mid = Window.partitionBy("mid").orderBy("ts_us", "event_id")
    nxt_ts = F.lead("ts_us").over(w_mid)
    nxt_start = F.lead("is_session_start").over(w_mid)
    uj = (
        (F.col("is_session_start") == 1)
        & (
            nxt_ts.isNull()
            | (nxt_ts - F.col("ts_us") > 10_000_000)
            | (nxt_start == 1)
        )
    ).cast("int")
    # uv flag via lag(dt) over the same (mid) partitioning as the jump
    # lead() and the is_new-repair min() — Catalyst plans one exchange
    prev_dt = F.lag("dt").over(w_mid)
    repaired = repair_is_new(page_log, "mid", "dt", "is_new")
    return repaired.withColumn(
        "uv_flag", (prev_dt.isNull() | (prev_dt != F.col("dt"))).cast("int")
    ).withColumn("uj_flag", uj)


def dws_traffic_vc_ch_ar_isnew_page_view_window(page_log: DataFrame) -> DataFrame:
    """10 s window per (vc, ch, ar, is_new): uv/sv/pv/dur/uj counters.

    Ref DwsTrafficVcChArIsNewPageViewWindow.java:115-184 (A1 + U1).
    """
    flagged = _with_flags(page_log).withColumn(
        "rt", F.timestamp_micros(F.col("ts_us"))
    )
    return tumble_agg(
        flagged,
        "rt",
        10,
        keys=["vc", "ch", "ar", "is_new"],
        aggs=[
            F.sum("uv_flag").cast("bigint").alias("uv_ct"),
            F.sum("is_session_start").cast("bigint").alias("sv_ct"),
            F.count(F.lit(1)).cast("bigint").alias("pv_ct"),
            F.sum("during_time").cast("bigint").alias("dur_sum"),
            F.sum("uj_flag").cast("bigint").alias("uj_ct"),
        ],
    )


def dws_traffic_source_keyword_page_view_window(page_log: DataFrame) -> DataFrame:
    """10 s window per search keyword: tokenize + explode + count.

    Ref DwsTrafficSourceKeywordPageViewWindow.java:48-88 — the IK
    Chinese tokenizer UDTF (SplitFunction.java:12-28, SURVEY F1)
    becomes :func:`gmall_spark.functions.text.segment_keywords`:
    non-CJK runs whole (identical to the old ``split('\\s+')`` on
    ASCII input), CJK runs as deterministic character bigrams — all
    JVM exprs inside codegen, no Python UDF; dictionary byte-parity
    with IK is a declared non-goal (SURVEY §7.3).
    """
    from gmall_spark.functions.text import segment_keywords

    searches = page_log.filter(
        (F.col("item_type") == "keyword")
        & (F.col("last_page_id") == "search")
        & F.col("item").isNotNull()
    )
    words = searches.select(
        F.explode(segment_keywords(F.col("item"))).alias("keyword"),
        F.timestamp_micros(F.col("ts_us")).alias("rt"),
    ).filter(F.length("keyword") > 0)
    return tumble_agg(
        words,
        "rt",
        10,
        keys=["keyword"],
        aggs=[F.count(F.lit(1)).cast("bigint").alias("keyword_count")],
    )


def dws_traffic_page_view_window(page_log: DataFrame) -> DataFrame:
    """Global 10 s window: home / good_detail per-day UV counts.

    Ref DwsTrafficPageViewWindow.java:64-185 (A2 windowAll + two keyed
    ValueStates): a row counts if it is the mid's first home (resp.
    good_detail) view of the day.
    """
    from pyspark.sql import Window

    pages = page_log.filter(F.col("page_id").isin("home", "good_detail"))
    # per-page first-of-day: rank within (mid, dt, page_id)
    w = Window.partitionBy("mid", "dt", "page_id").orderBy("ts_us", "event_id")
    per_page = pages.withColumn("rn", F.row_number().over(w)).withColumn(
        "rt", F.timestamp_micros(F.col("ts_us"))
    )
    return tumble_agg(
        per_page,
        "rt",
        10,
        keys=[],
        aggs=[
            F.sum(
                F.when((F.col("page_id") == "home") & (F.col("rn") == 1), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("home_uv_ct"),
            F.sum(
                F.when(
                    (F.col("page_id") == "good_detail") & (F.col("rn") == 1), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("good_detail_uv_ct"),
        ],
    )
