"""Incremental (streaming) image near-dup grouping — the X136 policy
as a continuous pipeline (the image twin of incremental_dedup's text
tier, same deployment shape as incremental_ppl / incremental_dsir).

Fingerprints are FROZEN at ingest: dHash is deterministic through the
real codec path (operators/multimodal.image_hashes), so a document's
fingerprint never changes after its batch — per-batch idempotent
overwrite, replay-safe under foreachBatch retries. What DOES change
is the GROUP structure: a later arrival can join an existing group
(growing its size) or bridge two fingerprints within Hamming range —
and with representative = min doc_id, an arrival carrying a smaller
id retroactively re-labels every earlier member of its group.
Re-grouping is append-only re-derivation, never a retraction of
ingested data.

Per micro-batch:

1. hash the batch's image blobs through the REAL decode path;
2. write (doc_id, decode_ok, dhash_hex, dhash_bytes) to the batch's
   own store subdir (``fps/b<id>`` — an idempotent overwrite).

:func:`current_groups` derives the group assignment from the MERGED
fingerprint store through the exact batch operator
(multimodal.image_near_dup_groups), so after ANY batch split the
result is row-identical to hashing-and-grouping all documents seen so
far in one batch — asserted by tests, including a planted fixture
where batch 2 shrinks an earlier doc's rep_id and grows its group.

Scale shape: state is ONE row per document (64-bit fingerprint +
bytes) — the minimum any grouping needs; the exact tier collapses
identical fingerprints in a groupBy before any join, and the banded
near tier is quadratic only in DISTINCT fingerprints per band value
(the batch operator's own bound). At 100 TB the fps store becomes a
date-partitioned table and current_groups a scheduled rollup — the
layout carries over unchanged.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession

from gmall_spark.operators import multimodal

_FP_SCHEMA = (
    "doc_id long, decode_ok boolean, dhash_hex string, dhash_bytes array<int>"
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
    """Hash one micro-batch of (doc_id, blob) rows through the real
    decode path and append the fingerprints to the batch's own
    subdir. Replay-safe: hashing is deterministic and the write is a
    per-batch-subdir overwrite."""
    multimodal.image_hashes(batch_blobs).select(
        "doc_id", "decode_ok", "dhash_hex", "dhash_bytes"
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
    """Current near-dup group assignment over ALL documents seen so
    far — identical to the batch operator on the same fingerprint
    relation, so a two-batch split and a single batch agree row for
    row (reps and sizes see the same merged corpus either way)."""
    return multimodal.image_near_dup_groups(
        stored_fingerprints(spark, store_root), max_hamming=max_hamming
    )
