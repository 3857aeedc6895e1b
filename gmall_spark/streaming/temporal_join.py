"""Incremental (streaming) backward as-of join — the event-time
temporal join (Flink's ``FOR SYSTEM_TIME AS OF``, ref
``DwdTradeOrderDetail``'s lookup-join family at event-time grain;
SURVEY J3/X34 streaming twin).

Each micro-batch of LEFT (probe) rows is as-of joined against the
union of this batch's RIGHT (build/version) rows and a PERSISTED
right-history store, then the batch's right rows are appended to the
store. A probe therefore sees every version that arrived in or
before its own micro-batch — processing-time-bounded completeness,
the same contract Flink's temporal join has under a perfect
watermark when versions do not arrive after probes of later event
time (the condition the batch-equality test constructs by splitting
the input in event-time order).

Store layout at scale: append-only parquet keyed by the join key;
compact with ``operators.scale.write_bucketed`` (bucket by the key)
so the per-batch probe join is exchange-free on the store side —
identical reasoning to incremental_dedup.BucketedStore. The store
holds FULL version history (needed for late probes); a TTL compaction
dropping versions older than the watermark minus the maximum probe
lateness bounds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gmall_spark.operators.relational import asof_join_backward


class VersionStore:
    """Append-only right-side version history."""

    def __init__(self, store_dir: str, schema: T.StructType):
        self.store_dir = store_dir
        self.schema = schema

    def read(self, spark: SparkSession) -> DataFrame:
        from gmall_spark.streaming.incremental_dedup import _read_or_empty

        return _read_or_empty(spark, f"{self.store_dir}/versions", self.schema)

    def append(self, versions: DataFrame) -> None:
        versions.write.mode("append").parquet(f"{self.store_dir}/versions")


def process_batch(
    spark: SparkSession,
    left_batch: DataFrame,
    right_batch: DataFrame,
    store: VersionStore,
    key: str,
    ts: str,
) -> DataFrame:
    """As-of join one micro-batch: probe ``left_batch`` against
    store ∪ ``right_batch``, then append ``right_batch`` to the
    store. Returns the joined rows for this batch (the caller sinks
    them). Deterministic: ties resolve exactly as the batch operator
    (max ts, then greatest payload)."""
    right_all = store.read(spark).unionByName(
        right_batch.select(*[f.name for f in store.schema.fields])
    )
    out = asof_join_backward(left_batch, right_all, key, ts)
    # materialize BEFORE the append mutates the store this plan reads
    out = out.localCheckpoint(eager=True)
    store.append(right_batch.select(*[f.name for f in store.schema.fields]))
    return out
