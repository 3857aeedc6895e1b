"""Record-deletion propagation across persisted pipeline state.

A takedown / right-to-be-forgotten request must remove a document
from EVERY derived store, not just the corpus table — the
incremental-dedup band and shingle stores, verified-pair outputs,
the ANN index — or the deleted text keeps influencing dedup
decisions (and keeps being re-derivable from shingles). This is the
GDPR-article-17 pass every production corpus pipeline carries.

Mechanics: each parquet store is rewritten through a broadcast
ANTI-join on its id column (the delete set is small by nature) with
the single-atomic-pointer swap the incremental stores use
(:mod:`gmall_spark.streaming.store`, ADVICE r4) — a concurrent
reader sees the old or the new store, never a torn or missing one,
and a crash mid-swap is recoverable. At 100 TB the rewrite cost is one linear pass per
store; batching many takedown requests into one purge amortizes it,
and a list_id/bucket-partitioned store only rewrites the partitions
that contain deleted rows (pushdown on the partition column).

Bloom filters CANNOT delete (bits are shared — unsetting one would
create false negatives for other keys): the bloom store must be
REBUILT from the retained keys, which :func:`purge_doc_ids` does NOT
automate — callers re-run ``incremental_bloom.process_batch`` over
the retained reference corpus. Count-min cells could subtract
exactly, but the rebuild path is the safe default there too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_spark.streaming.store import swap_write as _swap_write


def purge_doc_ids(
    spark: SparkSession,
    doc_ids: list[int],
    stores: dict[str, list[str]],
) -> dict[str, int]:
    """Remove every row referencing a deleted id from each store.

    ``stores`` maps a parquet dir to the id COLUMNS to purge on (a
    pair store purges on both ``doc_a`` and ``doc_b``). Returns the
    number of rows removed per store."""
    ids = spark.createDataFrame(
        [(int(i),) for i in doc_ids], "___purge_id bigint"
    )
    removed: dict[str, int] = {}
    for path, id_cols in stores.items():
        df = spark.read.parquet(path)
        before = df.count()
        kept = df
        for c in id_cols:
            kept = kept.join(
                F.broadcast(ids),
                kept[c] == ids["___purge_id"],
                "left_anti",
            )
        # localCheckpoint: the rewrite must not lazily re-read the
        # directory it is about to replace
        kept = kept.localCheckpoint()
        removed[path] = before - kept.count()
        _swap_write(kept, path)
    return removed
