"""Scale-out physical-layout helpers: bucketed co-located joins.

The reference runs joins with Flink keyed state co-partitioning (its
Kafka topics are hash-partitioned by key, so a rebalance is implicit
in the topic layout). The Spark-native equivalent for the 100 TB
batch/lakehouse side is BUCKETING: persist both fact tables bucketed
by the join key, and every subsequent equi-join on that key is
exchange-free — the scan itself delivers co-partitioned splits
(``tests/test_scale.py`` asserts the join plan contains NO Exchange).

At 100 TB this is the difference between re-shuffling multi-TB fact
tables on every join and shuffling them exactly once at write time:

- bucket count should target ~128-512 MB per bucket file; it must
  match on both sides (Spark joins bucketed tables exchange-free when
  bucket counts are equal or integer multiples).
- bucketed tables also accelerate ``groupBy`` on the bucket key
  (no exchange before the aggregate) and window functions partitioned
  by it.
- writes go through ``saveAsTable`` (bucket metadata lives in the
  catalog); ``spark.sql.sources.bucketing.enabled`` is on by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets additionally removes the Sort below a
    SortMergeJoin, leaving a pure zip-merge of pre-sorted splits.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog,
    so joins/aggregates on the bucket key skip their exchange)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hive-partitioned by ``partition_cols`` (the
    standard lakehouse date/source layout). A filter on a partition
    column then prunes whole directories at PLANNING time — at 100 TB
    a one-day query against a date-partitioned table reads 1/365th of
    the files, before any row is touched
    (``tests/test_scale.py::test_partition_pruned_scan`` pins this).
    Partition columns should be low-cardinality (date, source, lang);
    high-cardinality keys belong in bucketing instead (small-files
    explosion otherwise)."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)
