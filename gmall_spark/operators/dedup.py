"""Key-based deduplication operators.

The reference resolves duplicate/changelog rows with keyed state +
timers:

- first-one-wins w/ 5 s TTL (DwsTradePaymentSucWindow.java:74-102,
  DwsTradeTrademarkCategoryUserRefundWindow.java:71-99)
- last-one-wins w/ 2 s processing timer, resolving the upsert-kafka
  changelog to one row per order_detail_id
  (app/func/OrderDetailFilterFunction.java:42-81)

Spark-first: a window-rank is a shuffle + in-partition sort — fully
distributed, no timers, no TTL bookkeeping. At 100 TB the shuffle is
hash-partitioned by the dedup key, so each key's rows co-locate once;
AQE handles skewed keys. For streaming, `dropDuplicates` + watermark
gives first-one-wins with bounded state (see streaming/).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _one_per_key(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_first(
    df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: Sequence[str] = ()
) -> DataFrame:
    """Keep the earliest row per key (first-one-wins).

    ``tiebreak`` columns make the pick deterministic when ``ts_col``
    ties (the reference relies on arrival order; a distributed engine
    must not).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    return _one_per_key(df, keys, order)


def dedup_last(
    df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: Sequence[str] = ()
) -> DataFrame:
    """Keep the latest row per key (last-one-wins / changelog resolve)."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    return _one_per_key(df, keys, order)


def latest_by_key(
    df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: Sequence[str] = ()
) -> DataFrame:
    """Changelog -> current-state view: latest row per primary key.

    Replaces the reference's upsert-kafka PK tables
    (utils/MyKafkaUtil.java:80-89) consumed downstream as deduplicated
    (SURVEY S4/T4): Kafka log compaction's "latest value per key"
    becomes an explicit operator.
    """
    return dedup_last(df, keys, ts_col, tiebreak)


def exact_dedup(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal (hash-groupBy semantics).

    ``dropDuplicates`` compiles to a hash aggregate on the dedup
    columns — one shuffle, map-side partial dedup first, so at scale
    the shuffle carries only distinct rows per mapper.
    """
    return df.dropDuplicates(list(cols) if cols else None)
