"""Incremental (streaming) Bloom filter: a continuously-maintained
decontamination pre-filter.

Extends operators/bloom.py (SURVEY X71) the way incremental_dedup
extends the batch MinHash pipeline (X19): as reference/benchmark
documents keep arriving, each micro-batch's keys are hashed into
(word_idx, word) bit rows and OR-merged into a persisted word store —
``bit_or`` is associative and commutative, so after ANY batch split
the store is bit-for-bit identical to ``bloom_build`` over the union
of all batches (asserted by tests/test_streaming.py). Training
pipelines then probe the current store with ``bloom_probe``
unchanged.

The store is rewritten wholesale each batch — deliberately: the
filter is CAPPED at bits/32 rows (2048 at the default 65536 bits)
regardless of how much has been ingested, so the rewrite is O(bits),
never O(corpus). That inversion is the whole point of the Bloom
layout — the corpus-sized state lives in the bit pattern, not in
rows. The swap is a single atomic pointer rename
(:mod:`gmall_spark.streaming.store`), so a concurrent probe reads
either the old or the new filter, never a torn or missing one, and a
crash mid-swap is recoverable instead of silently resetting the
filter (ADVICE r4).

Wire :func:`process_batch` into ``runner.run_foreach_batch`` exactly
like incremental_dedup; a Kafka source swaps in upstream unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_spark.operators import bloom
from gmall_spark.streaming import store as _store

_STORE_SCHEMA = T.StructType(
    [
        T.StructField("word_idx", T.LongType()),
        T.StructField("word", T.LongType()),
    ]
)


def process_batch(
    spark: SparkSession,
    batch: DataFrame,
    key_col: str,
    store_dir: str,
    n_hashes: int = bloom.BLOOM_HASHES,
    bits: int = bloom.BLOOM_BITS,
) -> None:
    """OR-merge one micro-batch of keys into the persisted filter."""
    delta = bloom.bloom_build(batch, key_col, n_hashes, bits)
    merged = (
        _store.read_or_empty(spark, store_dir, _STORE_SCHEMA)
        .unionByName(delta)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    _store.swap_write(merged, store_dir)


def current_filter(spark: SparkSession, store_dir: str) -> DataFrame:
    """The filter as of the last completed batch — feed straight into
    ``bloom.bloom_probe``."""
    return _store.read_or_empty(spark, store_dir, _STORE_SCHEMA)
