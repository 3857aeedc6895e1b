"""Incremental mojibake census.

The streaming twin of X230 (queries_llm.text_mojibake_rollup) — the
X213 SUM-merge equality class: per-pattern (docs_hit, total_hits)
are plain sums over docs, state is the running pair per pattern, a
batch merges by ADDITION, so streaming equals batch EXACTLY after
any ingest split. Operationally: a feed that starts shipping
double-encoded text is visible in the batch where it lands (its
patterns' counts jump), not at the next full-corpus sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_spark.operators import mojibake


def batch_counts(batch_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The X230 projection over one batch — the IDENTICAL stack
    expression the batch query runs (one pass, all patterns)."""
    stack_args = ", ".join(
        f"'{bad}', (length({text_col}) - length(replace({text_col}, '{bad}', '')))"
        f" div length('{bad}')"
        for bad, _ in mojibake.PATTERNS
    )
    return (
        batch_docs.selectExpr(
            f"stack({len(mojibake.PATTERNS)}, {stack_args}) AS (pattern, n)"
        )
        .groupBy("pattern")
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
    """Scan one micro-batch (already-corrupted text arrives on the
    wire; the synth step belongs to the test harness) and append its
    per-pattern counts; returns the batch's counts (the alarm view)."""
    counts = batch_counts(batch_docs)
    counts.write.mode("append").parquet(f"{store_dir}/mojibake_counts")
    return counts


def current_counts(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged corpus-so-far census: per pattern, the SUM over all
    batch versions — bit-equal to the batch query on everything
    ingested (integer addition, order-free)."""
    return (
        spark.read.parquet(f"{store_dir}/mojibake_counts")
        .groupBy("pattern")
        .agg(
            F.sum("docs_hit").cast("bigint").alias("docs_hit"),
            F.sum("total_hits").cast("bigint").alias("total_hits"),
        )
    )
