"""Incremental (streaming) DCT-pHash near-dup grouping — X177's
streaming twin, the same deployment shape as incremental_image_dedup
(X140): fingerprints are FROZEN at ingest (pHash is deterministic
through the real decode -> canvas-normalize -> DCT path), each
micro-batch overwrites its own store subdir idempotently, and the
GROUP structure is re-derived from the merged fingerprint store
through the exact batch operator — so any batch split is
row-identical to one big batch, including retroactive rep_id
re-labeling when a smaller doc_id arrives late.

State is one 64-bit fingerprint row per document; the grouping's
quadratic term is bounded by DISTINCT fingerprints per band value.
At 100 TB the fps store becomes a date-partitioned table and
current_groups a scheduled rollup, unchanged.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession

from gmall_spark.operators import multimodal

_FP_SCHEMA = (
    "doc_id long, decode_ok boolean, phash_hex string, phash_bytes array<int>"
)
_BATCH_DIR_RE = _re.compile(r"^b\d+$")


def _fp_dirs(root: str) -> list[str]:
    base = os.path.join(root, "fps")
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
    batch_blobs: DataFrame,
    store_root: str,
    batch_id: int,
) -> None:
    """pHash one micro-batch of (doc_id, blob) rows through the real
    decode/DCT path and write the fingerprints to the batch's own
    subdir. Replay-safe: hashing is deterministic and the write is a
    per-batch-subdir overwrite."""
    multimodal.image_phash(batch_blobs).select(
        "doc_id", "decode_ok", "phash_hex", "phash_bytes"
    ).write.mode("overwrite").parquet(
        os.path.join(store_root, "fps", f"b{batch_id}")
    )


def stored_fingerprints(spark: SparkSession, store_root: str) -> DataFrame:
    """Every fingerprint ingested so far."""
    dirs = _fp_dirs(store_root)
    if not dirs:
        return spark.createDataFrame([], _FP_SCHEMA)
    return spark.read.schema(_FP_SCHEMA).parquet(*dirs)


def current_groups(
    spark: SparkSession, store_root: str, max_hamming: int = 2
) -> DataFrame:
    """Current pHash near-dup assignment over ALL documents seen so
    far — identical to the batch operator on the same fingerprint
    relation (streaming == batch after any split)."""
    return multimodal.image_phash_near_dup_groups(
        stored_fingerprints(spark, store_root), max_hamming=max_hamming
    )
