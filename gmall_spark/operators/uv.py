"""Per-day UV / new-user / returning-user extraction (batch formulations).

The reference keeps keyed ValueState (last-seen date, TTL 1 day) and
emits a record only when the state says "first of day" / "first ever" /
"returned after >= 8 days":

- per-day UV:      DwdTrafficUniqueVisitorDetail.java:55-87   (SURVEY A5)
- returning user:  DwsUserUserLoginWindow.java:83-135         (SURVEY A6)
- first-ever user: DwsTradeOrderWindow.java:74-127            (SURVEY A7)
- is_new repair:   BaseLogApp.java:64-101                     (SURVEY P9)

Batch-core: window functions over (key, date) express the same
semantics with one shuffle and no state bookkeeping; the streaming
twins (applyInPandasWithState / dropDuplicates+watermark) live in
gmall_spark.streaming.stateful.

Scale: all of these shuffle once on the entity key (mid/uid) — the
natural partitioning; row_number/lag then run in-partition. At 100 TB
the per-key row counts are small (events per user), so no skew beyond
what AQE handles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_of_day_flag(
    df: DataFrame,
    key: str,
    date_col: str,
    ts_order: list[str],
    flag_name: str = "is_first_of_day",
) -> DataFrame:
    """1 for each key's first row of each day (per-day UV row), else 0.

    Semantically ``row_number() over (partition by key, date order by
    ts) = 1``, but computed as a lag() over a single (key) partition
    ordered by (date, ts): the first row of a day is the one whose
    predecessor has a different date. Equivalent because date is a
    monotone function of the ts ordering — and it shares the (key)
    hash partitioning with ``first_ever_flag``/``returning_flag``, so
    chaining them costs ONE shuffle instead of one per partitioning
    (at 100 TB the (key, date) exchange was pure waste).
    """
    w = Window.partitionBy(key).orderBy(
        F.col(date_col), *[F.col(c) for c in ts_order]
    )
    prev_dt = F.lag(date_col).over(w)
    return df.withColumn(
        flag_name,
        F.when(prev_dt.isNull() | (prev_dt != F.col(date_col)), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )


def first_ever_flag(
    df: DataFrame,
    key: str,
    date_col: str,
    flag_name: str = "is_first_ever",
) -> DataFrame:
    """1 on rows of a key's first-ever day (new-user rows), else 0.

    Combine with :func:`first_of_day_flag` to count each new user once.
    """
    w = Window.partitionBy(key)
    return df.withColumn(
        flag_name,
        F.when(F.min(date_col).over(w) == F.col(date_col), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )


def returning_flag(
    uu_rows: DataFrame,
    key: str,
    date_col: str,
    min_gap_days: int = 8,
    flag_name: str = "is_returning",
) -> DataFrame:
    """1 on a key's first row of a day that comes >= min_gap_days after
    the key's previous active day (ref rule: back if gap >= 8 days,
    DwsUserUserLoginWindow.java:117-121). Input must already be one row
    per (key, day) — i.e. rows with is_first_of_day = 1.
    """
    w = Window.partitionBy(key).orderBy(date_col)
    prev = F.lag(date_col).over(w)
    return uu_rows.withColumn(
        flag_name,
        F.when(
            prev.isNotNull()
            & (F.datediff(F.to_date(date_col), F.to_date(prev)) >= min_gap_days),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def repair_is_new(
    df: DataFrame,
    key: str,
    date_col: str,
    is_new_col: str = "is_new",
) -> DataFrame:
    """Fix wrongly-set ``is_new='1'`` flags against the key's first-seen
    date (ref BaseLogApp.java:64-101: a mid claiming new on a later day
    than its first visit is repaired to '0'; '0' flags are trusted).
    """
    w = Window.partitionBy(key)
    first_date = F.min(date_col).over(w)
    return df.withColumn(
        is_new_col,
        F.when(
            (F.col(is_new_col) == "1") & (F.col(date_col) != first_date), F.lit("0")
        ).otherwise(F.col(is_new_col)),
    )
