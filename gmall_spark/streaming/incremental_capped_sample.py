"""Incremental cluster-capped sampling — X199's streaming twin (the
X185 re-derive class, with the X140 frozen-at-ingest discipline).

Cluster ASSIGNMENTS freeze at ingest under the frozen coarse
quantizer (the deployment shape: the centroids artifact is trained
once and shipped; re-training on every batch would make yesterday's
assignment depend on tomorrow's data). The SELECTION is re-derived
from the merged assignment store through the exact batch operator, so
streaming == batch after any split — including the two retroactive
effects the test pins:

- the CAP MOVES as n grows (cap = ceil(ceil(n*pct/100)/n_lists)), so
  an early pick can fall out when the budget share shrinks relative
  to its cluster, and
- the md5 rank is global, so a later arrival with a smaller md5 can
  DISPLACE an earlier pick at the cap boundary.

Idempotence comes from the per-batch-subdir overwrite. At 100 TB the
store is the (vec_id, list_id)-partitioned index table the IVF path
already maintains, and current_sample is a scheduled selection pass.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession

from gmall_spark.operators import ivf, semdedup

_ASSIGN_SCHEMA = "vec_id long, list_id int"
_BATCH_DIR_RE = _re.compile(r"^b\d+$")


def _dirs(root: str) -> list[str]:
    base = os.path.join(root, "assign")
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
    batch_emb: DataFrame,
    store_root: str,
    batch_id: int,
    centroids: list[list[float]],
) -> None:
    """Assign one micro-batch of (vec_id, embedding) rows under the
    FROZEN centroids and write the assignments to the batch's own
    subdir (idempotent overwrite — assignment is deterministic)."""
    ivf.build_index(batch_emb, centroids).select(
        "vec_id", "list_id"
    ).write.mode("overwrite").parquet(
        os.path.join(store_root, "assign", f"b{batch_id}")
    )


def stored_assignments(spark: SparkSession, store_root: str) -> DataFrame:
    dirs = _dirs(store_root)
    if not dirs:
        return spark.createDataFrame([], _ASSIGN_SCHEMA)
    return spark.read.schema(_ASSIGN_SCHEMA).parquet(*dirs)


def current_sample(
    spark: SparkSession,
    store_root: str,
    n_lists: int,
    pct: int,
) -> DataFrame:
    """The diversity-capped selection over every vector seen so far —
    identical to the batch operator on the merged assignments
    (streaming == batch after any split, retroactive displacement
    included)."""
    return semdedup.cluster_capped_sample(
        stored_assignments(spark, store_root), n_lists=n_lists, pct=pct
    )
