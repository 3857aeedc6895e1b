"""Incremental prompt-dedup keeper with retroactive displacement.

The streaming twin of X233 (queries_llm.sft_prompt_dedup) — the
MAX-merge class: the maintained state is the per-prompt candidate
table (prompt, doc_id, asst_len), which is append-mergeable, while
the derived artifact (the keeper) is an argmax over it — a later
arrival with a RICHER response DISPLACES the current keeper, and the
twin ships that move instead of silently keeping the stale pick
(the X210 re-derive honesty: state merges, artifacts re-derive).

Per batch: derive the batch's conversations with the IDENTICAL
turns/fold expressions the batch query uses, reduce to per-prompt
batch candidates, diff the keeper view before vs after the append,
and return the displacement log (prompt, old/new keeper + lengths).
Batch-equals-streaming: the keeper view after any ingest split is
row-identical to the batch query on the full corpus — argmax with
the (asst_len DESC, doc_id ASC) total order is associative over any
partition of the rows.

Scale shape: state appends at prompt grain (bounded by distinct
prompts per batch); the keeper view is one prompt-keyed window; the
diff joins the before/after keeper tables on prompt only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_spark.operators import sft
from gmall_spark.streaming.incremental_dedup import _read_or_empty

_CAND_SCHEMA = T.StructType(
    [
        T.StructField("prompt", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("asst_len", T.LongType()),
    ]
)


def batch_candidates(batch_docs: DataFrame) -> DataFrame:
    """One batch's (prompt, doc_id, asst_len) rows — the identical
    derivation the batch query runs."""
    t = sft.turns(batch_docs)
    return t.select(
        F.col("turns").getItem(0)["txt"].alias("prompt"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.aggregate(
            F.col("turns"),
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.when(
                x["role"] == "assistant", F.length(x["txt"])
            ).otherwise(F.lit(0)),
        ).alias("asst_len"),
    )


def _keepers(cands: DataFrame) -> DataFrame:
    w = Window.partitionBy("prompt")
    return (
        cands.select(
            "*",
            F.count(F.lit(1)).over(w).alias("n_convs"),
            F.row_number()
            .over(w.orderBy(F.col("asst_len").desc(), F.col("doc_id")))
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("prompt", "doc_id", "asst_len", "n_convs")
    )


def current_keepers(spark: SparkSession, store_dir: str) -> DataFrame:
    """The corpus-so-far keeper view: argmax over all appended
    candidates — row-identical (for prompts with n_convs >= 2) to the
    batch X233 on everything ingested."""
    return _keepers(
        _read_or_empty(spark, f"{store_dir}/sft_candidates", _CAND_SCHEMA)
    )


def process_batch(
    spark: SparkSession, batch_docs: DataFrame, store_dir: str
) -> DataFrame:
    """Ingest one micro-batch; returns the DISPLACEMENT log: prompts
    whose keeper changed (a richer response arrived — old_keeper's
    rows should leave the training set, new_keeper's enter)."""
    path = f"{store_dir}/sft_candidates"
    # materialize the BEFORE snapshot eagerly: the scan is lazy, and a
    # plan executed after the append below would re-list the path and
    # see the new files — before would silently equal after and the
    # displacement log would always be empty
    before = (
        _keepers(_read_or_empty(spark, path, _CAND_SCHEMA))
        .select(
            "prompt",
            F.col("doc_id").alias("old_keeper"),
            F.col("asst_len").alias("old_asst_len"),
        )
        .localCheckpoint(eager=True)
    )
    cands = batch_candidates(batch_docs)
    cands.write.mode("append").parquet(path)
    after = _keepers(spark.read.schema(_CAND_SCHEMA).parquet(path)).select(
        "prompt",
        F.col("doc_id").alias("new_keeper"),
        F.col("asst_len").alias("new_asst_len"),
    )
    moves = (
        after.join(before, "prompt", "left")
        .filter(
            F.col("old_keeper").isNotNull()
            & (F.col("old_keeper") != F.col("new_keeper"))
        )
        .select(
            F.md5("prompt").alias("prompt_md5"),
            "old_keeper",
            "new_keeper",
            "old_asst_len",
            "new_asst_len",
        )
    )
    return moves
