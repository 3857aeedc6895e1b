"""SparkSession factory.

Replaces the per-job ``StreamExecutionEnvironment`` boilerplate of the
reference (e.g. gmall-realtime/src/main/java/com/atguigu/app/dwd/log/
BaseLogApp.java:29-36): one factory, scale-aware defaults.

Design notes for the 100 TB deployment (tested on local[32]):

- AQE on: runtime partition coalescing, skew-join splitting and
  dynamic join-strategy switching replace the reference's hand-pinned
  parallelism (1–4, tied to Kafka partition counts).
- ``spark.sql.shuffle.partitions`` defaults to 2× local cores; on a
  real cluster this is the *initial* number only — AQE coalesces.
- Session timezone defaults to UTC so parquet timestamps compare
  byte-for-byte with the DuckDB oracle; the reference pins GMT+8
  (DwdTradePayDetailSuc.java:24) — pass ``tz="GMT+8"`` to reproduce.
- Arrow enabled for every Pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "gmall_spark",
    master: str | None = None,
    tz: str = "UTC",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with scale-aware defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", tz)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # At 100 TB: ~128 MB split targets keep scan tasks balanced.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load the driver-provided parquet tables as a dict of DataFrames."""
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
