"""Incremental group-aware train/val/test split with retroactive moves.

The streaming twin of X210 (queries_llm.llm_split_by_group) — and the
op where incremental dedup gets OPERATIONALLY interesting: a split
hashed on the near-dup GROUP representative is leak-free by
construction, but groups are not frozen under ingest. A later arrival
can bridge two previously-separate groups (the transitive chain), the
merged group gets a new representative, and every member's split
assignment is RE-DERIVED — a document that was serving in `train` can
retroactively move to `val`. Shipping that move (instead of silently
keeping the stale assignment) is the entire point: the stale split is
exactly the leakage X189 measures. This is the X185/X198 re-derive
class — the maintained state (verified pairs) is mergeable, the
derived artifact (splits) is not, and the twin is honest about which
is which.

Per batch: run the X4 incremental dedup (band store probe + verify —
the pair set after any batch split equals the batch pipeline's, the
proven incremental_dedup theorem), then re-close the transitive
groups over ALL pairs emitted so far (the pairs table is duplicate-
density-bounded, never corpus-sized), re-derive every seen doc's
split with the IDENTICAL md5 expression the batch query uses, diff
against the previous assignment snapshot, and append the new snapshot
(versioned by batch) plus the move log.

Batch-equals-streaming: the final snapshot equals the batch X210
output on the full corpus — same pairs => same components => same
group keys => same md5 split. Moves are the DIFF trail between
snapshots; the final state carries no memory of them (asserted by
tests/test_streaming.py, with a planted chain-merge forcing a real
train->val move).

Scale shape: group re-closure runs on the pair graph (bounded by
duplicate density); the assignment join is group-table-broadcast vs
one pass over seen doc ids; snapshots append (batch_id, doc_id,
group_key, split) — at 100 TB the snapshot is a partitioned table and
the diff joins the last two partitions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_spark.operators import components
from gmall_spark.streaming import incremental_dedup

_ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("group_key", T.LongType()),
        T.StructField("split", T.StringType()),
    ]
)


def _assign(spark: SparkSession, store_dir: str) -> DataFrame:
    return incremental_dedup._read_or_empty(
        spark, f"{store_dir}/assign", _ASSIGN_SCHEMA
    )


def current_assignment(spark: SparkSession, store_dir: str) -> DataFrame:
    """The latest snapshot: (doc_id, group_key, split) rows of the
    max batch_id (the two-column read a partitioned table serves from
    its last partition)."""
    a = _assign(spark, store_dir)
    last = a.agg(F.max("batch_id").alias("b"))
    return (
        a.join(F.broadcast(last), a.batch_id == last.b)
        .select("doc_id", "group_key", "split")
    )


def moves(spark: SparkSession, store_dir: str) -> DataFrame:
    """The retroactive-move log accumulated across batches."""
    return spark.read.parquet(f"{store_dir}/moves")


def process_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    store_dir: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ingest one micro-batch: dedup it against the store, re-derive
    every seen doc's group-aware split, log the docs whose split
    MOVED since the previous snapshot, append the new snapshot.
    Returns the move log rows for this batch (doc_id, old_split,
    new_split, old_group_key, new_group_key)."""
    from gmall_spark.queries_llm import NEAR_DUP_THRESHOLD, _SPLIT_SQL_SPARK

    store = incremental_dedup.ParquetStore(store_dir)
    incremental_dedup.process_batch(
        spark,
        batch_docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("text"),
        ),
        store,
        NEAR_DUP_THRESHOLD,
    )

    # Re-close groups over ALL pairs so far (duplicate-density-bounded)
    # and re-derive the split for every doc seen so far — the exact
    # X210 expressions (group rep hash; singletons keep the doc hash).
    pairs = store.pairs(spark).select("doc_a", "doc_b")
    groups = components.connected_components(pairs)
    seen = store.shingles(spark).select("doc_id")
    grp_split = _SPLIT_SQL_SPARK.replace("doc_id", "group_key")
    new = (
        seen.join(F.broadcast(groups), "doc_id", "left")
        .selectExpr("doc_id", "coalesce(group_id, doc_id) AS group_key")
        .selectExpr("doc_id", "group_key", f"{grp_split} AS split")
        .persist()
    )

    prev = current_assignment(spark, store_dir)
    moved = (
        new.alias("n")
        .join(prev.alias("p"), "doc_id")
        .filter("n.split <> p.split OR n.group_key <> p.group_key")
        .selectExpr(
            f"cast({batch_id} as long) AS batch_id",
            "doc_id",
            "p.split AS old_split",
            "n.split AS new_split",
            "p.group_key AS old_group_key",
            "n.group_key AS new_group_key",
        )
        .persist()
    )
    moved.write.mode("append").parquet(f"{store_dir}/moves")
    new.selectExpr(
        f"cast({batch_id} as long) AS batch_id", "doc_id", "group_key", "split"
    ).write.mode("append").parquet(f"{store_dir}/assign")
    new.unpersist()
    moved.unpersist()
    # return the WRITTEN rows, not the live plan: the lazy plan reads
    # current_assignment(), which this batch's append just changed —
    # re-evaluating it later would silently diff against the wrong
    # snapshot. The parquet read is immutable.
    return moves(spark, store_dir).filter(F.col("batch_id") == batch_id)
