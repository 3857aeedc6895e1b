"""Incremental HTML-extraction acceptance rollup.

The streaming twin of X216 (queries_llm.text_html_extract_rollup) —
the X179/X213 SUM-merge equality class with a MIN/MAX twist: doc and
char totals merge by integer addition, and the per-doc text-share
envelope merges by min/max (both order-free), so the corpus-so-far
view after any batch split is EXACTLY the batch rollup. The
operational shape: a WET ingest job publishes the running extraction
report per batch instead of re-scanning the crawl.

State: one tiny parquet row per batch (n_docs, total_raw_chars,
total_text_chars, min_share_raw, max_share_raw) — shares ride RAW
(un-rounded is impossible here: the per-row share is already a
deterministic double both engines compute identically from exact
integers; we store the per-batch min/max of those and re-round only
in the merged view, exactly as the batch query rounds its min/max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_spark.operators import markup


def batch_rollup(batch_docs: DataFrame) -> DataFrame:
    """The X216 aggregation over one batch — the IDENTICAL extraction
    expressions the batch query runs."""
    ext = markup.html_extract(markup.synth_html(batch_docs))
    share = F.col("n_text_chars").cast("double") / F.col("n_raw_chars").cast(
        "double"
    )
    return ext.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_raw_chars").cast("bigint").alias("total_raw_chars"),
        F.sum("n_text_chars").cast("bigint").alias("total_text_chars"),
        F.min(share).alias("min_share_raw"),
        F.max(share).alias("max_share_raw"),
    )


def process_batch(
    spark: SparkSession, batch_docs: DataFrame, store_dir: str
) -> DataFrame:
    """Extract one micro-batch and append its rollup row."""
    roll = batch_rollup(batch_docs)
    roll.write.mode("append").parquet(f"{store_dir}/html_rollup")
    return roll


def current_rollup(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged corpus-so-far view — column-identical to the batch
    X216 output on the union of everything ingested (sums add, the
    envelope is min-of-mins / max-of-maxes, the share divides once
    at the end)."""
    return (
        spark.read.parquet(f"{store_dir}/html_rollup")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_raw_chars").cast("bigint").alias("total_raw_chars"),
            F.sum("total_text_chars").cast("bigint").alias("total_text_chars"),
            F.min("min_share_raw").alias("mn"),
            F.max("max_share_raw").alias("mx"),
        )
        .select(
            "n_docs",
            "total_raw_chars",
            "total_text_chars",
            F.round(
                F.col("total_text_chars").cast("double")
                / F.col("total_raw_chars").cast("double"),
                6,
            ).alias("corpus_text_share"),
            F.round(F.col("mn"), 6).alias("min_text_share"),
            F.round(F.col("mx"), 6).alias("max_text_share"),
        )
    )
