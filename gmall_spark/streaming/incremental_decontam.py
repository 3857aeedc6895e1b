"""Incremental semantic decontamination against a FROZEN reference.

The streaming twin of X220 (queries_llm.llm_semantic_decontam) — the
embarrassingly-incremental class (X209's stateless cousin): the
reference index (centroids + reference vectors by list) is FROZEN at
deployment (the benchmark set does not grow with the corpus), so a
corpus vector's verdict depends only on itself and the frozen index —
each arriving batch assigns to lists, meets the reference inside its
list, exact-cosine verifies, and appends its flags. The merged view
is plain union: streaming equals batch EXACTLY after any split, and
the alarm (this batch shipped contaminated docs) fires in the batch
where the doc ARRIVES — the operational point; a post-hoc corpus
sweep is exactly what this replaces at 100 TB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_spark.operators import ivf
from gmall_spark.operators.similarity import _verify_pairs


def reference_index(
    ref_emb: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """(id_b, list_id): the frozen reference side, built once at
    deployment (broadcast-sized — the benchmark set)."""
    return (
        ivf.build_index(ref_emb, centroids)
        .select(F.col("vec_id").alias("id_b"), "list_id")
    )


def batch_flags(
    batch_emb: DataFrame,
    ref_emb: DataFrame,
    ref_index: DataFrame,
    centroids: list[list[float]],
    threshold: float,
) -> DataFrame:
    """The X220 projection over one batch: assign, meet the reference
    in-list, verify — identical expressions to the batch query."""
    cand = (
        ivf.build_index(batch_emb, centroids)
        .select(F.col("vec_id").alias("id_a"), "list_id")
        .join(F.broadcast(ref_index), "list_id")
        .select("id_a", "id_b")
    )
    both = batch_emb.unionByName(ref_emb)
    hits = _verify_pairs(cand, both, threshold, "vec_id", "embedding")
    best = F.max(F.struct(F.col("cos_sim"), (-F.col("id_b")).alias("nr")))
    return (
        hits.groupBy(F.col("id_a").alias("doc_id"))
        .agg(best.alias("b"), F.count(F.lit(1)).cast("bigint").alias("n_ref_hits"))
        .select(
            "doc_id",
            (-F.col("b.nr")).cast("bigint").alias("ref_id"),
            F.col("b.cos_sim").alias("cos_sim"),
            "n_ref_hits",
        )
    )


def process_batch(
    spark: SparkSession,
    batch_emb: DataFrame,
    ref_emb: DataFrame,
    ref_index: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    store_dir: str,
) -> DataFrame:
    """Flag one micro-batch against the frozen reference and append;
    returns the batch's flags (the arrival-time alarm)."""
    flags = batch_flags(batch_emb, ref_emb, ref_index, centroids, threshold)
    flags.write.mode("append").parquet(f"{store_dir}/decontam_flags")
    return flags


def current_flags(spark: SparkSession, store_dir: str) -> DataFrame:
    """Union of everything flagged so far — row-identical to the
    batch X220 on the arrivals (per-doc verdicts are independent
    under a frozen reference)."""
    return spark.read.parquet(f"{store_dir}/decontam_flags")
