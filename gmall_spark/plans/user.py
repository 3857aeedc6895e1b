"""User-domain DWS pipelines (login / register windows)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_spark.operators.uv import first_of_day_flag, returning_flag
from gmall_spark.operators.windows import tumble_agg


def dws_user_user_login_window(page_log: DataFrame) -> DataFrame:
    """Global 10 s window: unique logins + returning (>= 8 day) users.

    Ref DwsUserUserLoginWindow.java:83-163 (SURVEY A6): a login is a
    session-start row with a uid; ``uu_ct`` counts each uid once per
    day; ``back_ct`` counts uids whose previous active day is >= 8
    days earlier (last-visit-date ValueState in the reference; a
    lag() over per-day first rows here).
    """
    logins = page_log.filter(
        (F.col("is_session_start") == 1) & F.col("user_id").isNotNull()
    )
    uu = first_of_day_flag(
        logins, "user_id", "dt", ["ts_us", "event_id"], "uu_flag"
    ).filter(F.col("uu_flag") == 1)
    flagged = returning_flag(uu, "user_id", "dt", 8, "back_flag").withColumn(
        "rt", F.timestamp_micros(F.col("ts_us"))
    )
    return tumble_agg(
        flagged,
        "rt",
        10,
        keys=[],
        aggs=[
            F.count(F.lit(1)).cast("bigint").alias("uu_ct"),
            F.sum("back_flag").cast("bigint").alias("back_ct"),
        ],
    )


def dws_user_user_register_window(page_log: DataFrame) -> DataFrame:
    """Global 10 s window: registration count.

    Ref DwsUserUserRegisterWindow.java:68-92 (SURVEY A2) — DwdUserRegister
    filters user_info inserts; here register-page views stand in.
    """
    regs = page_log.filter(F.col("page_id") == "register").withColumn(
        "rt", F.timestamp_micros(F.col("ts_us"))
    )
    return tumble_agg(
        regs,
        "rt",
        10,
        keys=[],
        aggs=[F.count(F.lit(1)).cast("bigint").alias("register_ct")],
    )
