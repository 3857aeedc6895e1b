"""Incremental (streaming) co-purchase mining — the X151 statistic as
a continuous pipeline (the relational sibling of
incremental_containment's postings-store pattern).

The subtlety a naive per-batch pair count gets WRONG: an order's
lines can SPAN micro-batches (the order header arrives, more lines
trickle in), and a pair only exists once both parts are in the
basket — so pair deltas are not sum-mergeable. State is therefore
the append-only DISTINCT (order, part) MEMBERSHIP postings, written
per batch (idempotent overwrite, replay-safe), and the pair table
re-derives from the merged postings through the EXACT batch core
(operators/relational.copurchase_pairs, shared by refactor). Two
consequences the tests pin:

- **streaming == batch** after any split, including baskets split
  across batches;
- **retroactive pair appearance**: a pair (and every lift in the
  table — N and the marginals move too) updates when a later batch
  completes a basket.

Scale shape: state is one row per (order, part) — the minimum any
co-occurrence statistic needs; the re-derivation cost is the batch
operator's own (basket-bounded self-join). At 100 TB the postings
store becomes a bucketed table on the order key and the pair rollup
a scheduled job — the layout carries over unchanged.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_spark.operators.relational import COPURCHASE_TOP, copurchase_pairs

_OP_SCHEMA = "o long, p long"
_BATCH_DIR_RE = _re.compile(r"^b\d+$")


def _op_dirs(root: str) -> list[str]:
    base = os.path.join(root, "op")
    try:
        return sorted(
            os.path.join(base, d)
            for d in os.listdir(base)
            if _BATCH_DIR_RE.match(d)
        )
    except FileNotFoundError:
        return []


def process_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_root: str,
    batch_id: int,
    order_col: str = "o",
    part_col: str = "p",
) -> None:
    """Append one micro-batch's distinct (order, part) memberships to
    the batch's own subdir (idempotent overwrite, replay-safe)."""
    batch.select(
        F.col(order_col).cast("long").alias("o"),
        F.col(part_col).cast("long").alias("p"),
    ).distinct().write.mode("overwrite").parquet(
        os.path.join(store_root, "op", f"b{batch_id}")
    )


def stored_memberships(spark: SparkSession, store_root: str) -> DataFrame:
    """Every (order, part) membership ingested so far, deduped across
    batches (the same line replayed into two batch ids must not
    double-count a pair)."""
    dirs = _op_dirs(store_root)
    if not dirs:
        return spark.createDataFrame([], _OP_SCHEMA)
    return spark.read.schema(_OP_SCHEMA).parquet(*dirs).distinct()


def current_pairs(
    spark: SparkSession, store_root: str, top: int = COPURCHASE_TOP
) -> DataFrame:
    """Current top co-purchase pairs over ALL baskets seen so far —
    identical to the batch operator on the same membership relation,
    so split baskets complete retroactively."""
    return copurchase_pairs(stored_memberships(spark, store_root), top=top)
