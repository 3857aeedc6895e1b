"""Incremental (streaming) audio-fingerprint near-dup grouping —
X197's streaming twin, the incremental_image_phash (X177) deployment
shape: landmark fingerprints are FROZEN at ingest (the decode ->
rfft -> pair-hash chain is deterministic), each micro-batch
overwrites its own store subdir idempotently, and the GROUP structure
is re-derived from the merged fingerprint store through the exact
batch operator — so any batch split is row-identical to one big
batch, including retroactive rep_id re-labeling when a smaller
doc_id arrives late.

State is O(frames) integers per document; the grouping's quadratic
term is bounded by distinct FINGERPRINTS per pair-hash value. At
100 TB the store becomes a date-partitioned table and current_groups
a scheduled rollup, unchanged.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession

from gmall_spark.operators import multimodal

_FP_SCHEMA = (
    "doc_id long, decode_ok boolean, n_frames long, "
    "pair_hashes array<long>, fp_hex string"
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
    """Fingerprint one micro-batch of (doc_id, blob) rows through the
    real decode/FFT path and write the landmarks to the batch's own
    subdir. Replay-safe: hashing is deterministic and the write is a
    per-batch-subdir overwrite."""
    multimodal.wav_peak_pair_fingerprints(batch_blobs).select(
        "doc_id", "decode_ok", "n_frames", "pair_hashes", "fp_hex"
    ).write.mode("overwrite").parquet(
        os.path.join(store_root, "fps", f"b{batch_id}")
    )


def stored_fingerprints(spark: SparkSession, store_root: str) -> DataFrame:
    """Every fingerprint ingested so far."""
    dirs = _fp_dirs(store_root)
    if not dirs:
        return spark.createDataFrame([], _FP_SCHEMA)
    return spark.read.schema(_FP_SCHEMA).parquet(*dirs)


def current_groups(spark: SparkSession, store_root: str) -> DataFrame:
    """Current near-dup assignment over ALL audio seen so far —
    identical to the batch operator on the same fingerprint relation
    (streaming == batch after any split)."""
    return multimodal.audio_near_dup_groups(
        stored_fingerprints(spark, store_root)
    )
