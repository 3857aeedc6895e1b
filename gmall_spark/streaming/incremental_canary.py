"""Incremental memorization-canary scan.

The streaming twin of X213 (queries_llm.llm_canary_scan) — the
easiest twin class in the registry (X179/X200 SUM-merge equality):
per-canary (docs_hit, total_hits) are plain sums over docs, so the
maintained state is the running per-canary count pair and a batch
merges by ADDITION — streaming equals batch EXACTLY after any split,
no re-derivation, no retroactivity. The operational shape: the canary
alarm must fire DURING ingest (the batch where the secret first
appears), not at the next full-corpus sweep.

State: one tiny parquet table (canary, docs_hit, total_hits) per
batch version; the current view sums versions (append-only, the
X191 fingerprint discipline — integer addition commutes, so the
merged view is independent of batch order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def batch_counts(batch_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The X213 projection over one batch — the IDENTICAL stack
    expression the batch query runs (one pass, all canaries)."""
    from gmall_spark.queries_llm import CANARY_PHRASES

    stack_args = ", ".join(
        f"'{c}', (length({text_col}) - length(replace({text_col}, '{c}', '')))"
        f" div length('{c}')"
        for c in CANARY_PHRASES
    )
    return (
        batch_docs.selectExpr(
            f"stack({len(CANARY_PHRASES)}, {stack_args}) AS (canary, n)"
        )
        .groupBy("canary")
        .agg(
            F.sum(F.when(F.col("n") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_hit"),
            F.sum("n").cast("bigint").alias("total_hits"),
        )
    )


def process_batch(
    spark: SparkSession, batch_docs: DataFrame, store_dir: str
) -> DataFrame:
    """Scan one micro-batch and append its per-canary counts; returns
    the batch's counts (the alarm view: a canary with total_hits > 0
    in THIS batch just leaked)."""
    counts = batch_counts(batch_docs)
    counts.write.mode("append").parquet(f"{store_dir}/canary_counts")
    return counts


def current_counts(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged corpus-so-far view: per canary, the SUM over all
    batch versions — bit-equal to the batch query on the union of
    everything ingested (integer addition, order-free)."""
    return (
        spark.read.parquet(f"{store_dir}/canary_counts")
        .groupBy("canary")
        .agg(
            F.sum("docs_hit").cast("bigint").alias("docs_hit"),
            F.sum("total_hits").cast("bigint").alias("total_hits"),
        )
    )
