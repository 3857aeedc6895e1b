"""DIM layer: config-driven dimension routing (SURVEY T6/S8/P13).

The reference consumes a MySQL ``table_process`` config table via CDC,
broadcasts it, and routes matching ``topic_db`` rows into per-table
Phoenix sinks with config-listed columns and a dynamic DDL
(app/dim/DimApp.java:58-78, app/func/TableProcessFunction.java:21-163,
app/func/DimSinkFunction.java:28-75, bean/TableProcess.java:11-17).

Spark-first replacement: the config is a tiny driver-side list (or a
per-micro-batch JDBC re-read in streaming — T6's broadcast state is
unnecessary because ``foreachBatch`` re-evaluates the plan anyway).
Routing is one filtered/pruned DataFrame per sink table; the Phoenix
"upsert" semantics are the shared latest-per-PK resolution. At scale
each routed table is an independent write with its own partitioning —
no fan-out operator state at all.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_spark.operators.dedup import latest_by_key

# CDC row kinds that upsert a dim row (TableProcessFunction.java:129:
# insert | update | bootstrap-insert). Deletes participate in the
# latest-per-PK resolution as tombstones: a key whose LATEST change is a
# delete is dropped, matching the reference DIM sink executing the
# delete against Phoenix (DimSinkFunction.java:28-75).
_DIM_TYPES = ("insert", "update", "bootstrap-insert")
_DELETE = "delete"


@dataclass(frozen=True)
class TableProcess:
    """One row of the reference's ``table_process`` config
    (bean/TableProcess.java:11-17)."""

    source_table: str
    sink_table: str
    sink_columns: tuple[str, ...]
    sink_pk: str


DEFAULT_CONFIG: tuple[TableProcess, ...] = (
    TableProcess("user_info", "dim_user_info", ("id", "name", "create_time"), "id"),
    TableProcess(
        "coupon_use",
        "dim_coupon_use",
        ("id", "coupon_id", "user_id", "get_time", "using_time", "used_time"),
        "id",
    ),
)


def _routed_changelog(topic_db: DataFrame, cfg: TableProcess) -> DataFrame:
    """One source table's pruned changelog rows (upserts + tombstones)."""
    return topic_db.filter(
        (F.col("table") == cfg.source_table)
        & F.col("type").isin(*_DIM_TYPES, _DELETE)
    ).select(
        *[F.col("data").getItem(c).alias(c) for c in cfg.sink_columns],
        F.col("type").alias("__op"),
        F.col("ts"),
    )


def _resolve_current(rows: DataFrame, cfg: TableProcess) -> DataFrame:
    """Latest-per-PK resolution with tombstone semantics: the delete
    row rides through the resolution; keys whose latest change is a
    delete disappear from the current-state view."""
    non_pk = [c for c in cfg.sink_columns if c != cfg.sink_pk]
    latest = latest_by_key(rows, [cfg.sink_pk], "ts", tiebreak=[*non_pk, "__op"])
    return latest.filter(F.col("__op") != _DELETE).drop("__op")


def route_dim_table(topic_db: DataFrame, cfg: TableProcess) -> DataFrame:
    """Filter + prune one source table per the config row.

    The reference's sinkColumns pruning (TableProcessFunction.java:
    149-163) is a dynamic ``select`` here — Catalyst then pushes the
    column pruning into the scan. Upsert-to-Phoenix semantics =
    latest row per PK (ties broken on row payload for determinism),
    with CDC deletes applied as tombstones.
    """
    return _resolve_current(_routed_changelog(topic_db, cfg), cfg)


def route_all(
    topic_db: DataFrame, config: tuple[TableProcess, ...] = DEFAULT_CONFIG
) -> dict[str, DataFrame]:
    """The full DIM fan-out: sink_table -> routed DataFrame."""
    return {cfg.sink_table: route_dim_table(topic_db, cfg) for cfg in config}


def foreach_batch_dim_writer(out_dir: str, config: tuple[TableProcess, ...] = DEFAULT_CONFIG):
    """Streaming deployment of the DIM fan-out (T6 + S8).

    Returns a ``foreachBatch`` function: each micro-batch of topic_db
    rows is routed per config and APPENDED to one parquet dir per sink
    table (the Phoenix upsert analog — appends resolve to latest-per-PK
    on read via ``read_dim``). Re-evaluating the config each batch is
    the Spark answer to the reference's broadcast config stream: the
    plan is rebuilt per micro-batch anyway, so dynamic routing needs no
    operator state.
    """

    def _process(batch_df, epoch_id: int) -> None:
        for cfg in config:
            # append the pruned CHANGELOG (upserts and tombstones):
            # resolving per batch would let a later batch's delete miss
            # rows already appended; read_dim resolves across batches
            routed = _routed_changelog(batch_df, cfg)
            routed.write.mode("append").parquet(f"{out_dir}/{cfg.sink_table}")

    return _process


def read_dim(spark, out_dir: str, cfg: TableProcess):
    """Current-state view of a streamed dim table (latest per PK,
    tombstones applied across all appended micro-batches)."""
    rows = spark.read.parquet(f"{out_dir}/{cfg.sink_table}")
    return _resolve_current(rows, cfg)
