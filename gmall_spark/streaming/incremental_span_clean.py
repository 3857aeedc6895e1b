"""Incremental (streaming) C4-style span clean: continuous corpus
cleaning as documents arrive.

Extends operators/llm_dedup.span_dedup_clean (SURVEY X104) the way
incremental_dedup extends the batch MinHash pipeline (X19): each
micro-batch's spans are checked keep-first WITHIN the batch (one
span-hash window) and against the persisted claimed-hash store (one
left join), per-doc cleaned rows are appended to a results store, and
the batch's newly-claimed hashes are appended to the hash store. With
batches arriving in doc_id order, the union of emitted rows after ANY
batch split is row-identical to the batch operator over the whole
corpus (asserted by tests/test_streaming.py).

Store layout: the hash store is APPEND-ONLY, one subdirectory per
batch (``hashes/b<epoch>``), so a batch's write target is never a
path its own plan reads — the read side enumerates the existing
subdirectories at plan-construction time. State is O(distinct spans):
inherent to exact global dedup (the bit-capped Bloom inversion does
not apply — membership must be exact or a false positive DELETES
content). At 100 TB the store becomes hash-bucketed files probed with
a bucket-pruned join, exactly the incremental_dedup.BucketedStore
recipe; the append-only per-batch layout carries over unchanged.

Wire :func:`process_batch` into ``runner.run_foreach_batch``; a Kafka
document topic swaps in upstream unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_spark.operators import llm_dedup

_HASH_SCHEMA = "h string"
_OUT_SCHEMA = (
    "doc_id long, n_spans bigint, removed_spans bigint, clean_md5 string"
)


def _hash_dirs(root: str, exclude_batch: int | None = None) -> list[str]:
    hdir = os.path.join(root, "hashes")
    try:
        return sorted(
            os.path.join(hdir, d)
            for d in os.listdir(hdir)
            if exclude_batch is None or d != f"b{exclude_batch}"
        )
    except FileNotFoundError:
        return []


def claimed_hashes(
    spark: SparkSession, store_root: str, exclude_batch: int | None = None
) -> DataFrame:
    """Every span hash claimed by batches processed so far.

    ``exclude_batch`` is the replay guard: a RETRIED micro-batch must
    not see the hashes its failed attempt already claimed, or every
    kept span would flip to removed on the second run."""
    dirs = _hash_dirs(store_root, exclude_batch)
    if not dirs:
        return spark.createDataFrame([], _HASH_SCHEMA)
    return spark.read.schema(_HASH_SCHEMA).parquet(*dirs)


def process_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    store_root: str,
    batch_id: int,
    span_w: int = 10,
) -> None:
    """Clean one micro-batch against the claimed-hash store; append
    the per-doc cleaned rows and the batch's newly-claimed hashes.

    Replay-safe under foreachBatch retries: the read side excludes
    this batch's own hash subdir (a failed attempt may have written
    it), the hash write is an idempotent overwrite, and the doc rows
    a retry re-appends are byte-identical — ``emitted_docs``
    deduplicates on doc_id."""
    seen = claimed_hashes(spark, store_root, exclude_batch=batch_id).withColumn(
        "__seen", F.lit(1)
    )
    w = Window.partitionBy("h").orderBy("doc_id", "idx")
    flagged = (
        llm_dedup.span_rows(batch_docs, span_w)
        .withColumn("rn", F.row_number().over(w))
        .join(seen, "h", "left")  # AQE broadcasts small stores; at
        # scale this is the bucket-pruned probe (module docstring)
        .withColumn(
            "kept", (F.col("rn") == 1) & F.col("__seen").isNull()
        )
        .persist()
    )
    try:
        llm_dedup.span_doc_rollup(flagged).write.mode("append").parquet(
            os.path.join(store_root, "docs")
        )
        # newly-claimed hashes: exactly the kept spans (rn==1 makes
        # them unique within the batch); written to a FRESH subdir so
        # the plan never reads its own write target
        flagged.filter("kept").select("h").write.mode("overwrite").parquet(
            os.path.join(store_root, "hashes", f"b{batch_id}")
        )
    finally:
        flagged.unpersist()


def emitted_docs(spark: SparkSession, store_root: str) -> DataFrame:
    """All per-doc cleaned rows emitted so far. dropDuplicates
    absorbs replayed batches: a retry's rows are byte-identical
    (its hash-store view excludes its own failed attempt)."""
    return (
        spark.read.schema(_OUT_SCHEMA)
        .parquet(os.path.join(store_root, "docs"))
        .dropDuplicates(["doc_id"])
    )
