"""Incremental (streaming) edit-distance near-dup verification.

The streaming twin of the X207 batch tier
(queries_llm.dedup_edit_distance_verify): each micro-batch of new
documents is shingled, signed and banded exactly like the batch path,
probed against the persisted band store (the incremental_dedup
layout), and every candidate pair is verified with LEVENSHTEIN
against the stored raw text — the X207 integer verdict
(100·lev ≤ EDIT_SIM_MAX_PCT·max_len), every candidate emitted with
its flag, true or false (the X173 discipline the batch tier pins).

Batch-equals-streaming: identical argument to incremental_dedup —
a candidate pair always has at least one member from the current
batch (never seen before), so a pair is discovered exactly once, in
the batch where its LATER member arrives; within-batch pairs come
from the batch's self join; pairs are canonical doc_a < doc_b. The
union of emitted rows after ANY batch split therefore equals the
single-batch X207 output on the full corpus (levenshtein is a pure
function of the two stored texts — no order dependence anywhere).
Asserted by tests/test_streaming.py.

Store layout (ParquetStore shape): ``bands`` as in incremental_dedup
plus ``texts`` (doc_id, text) — the edit tier verifies against raw
text, not shingle arrays, so the store keeps the text column the
verify needs. At 100 TB the texts table is the corpus itself (no
amplification — it replaces, not duplicates, the shingle store) and
the probe join is the same bucketed-band equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_spark.operators import llm_dedup
from gmall_spark.streaming.incremental_dedup import (
    _BANDS_SCHEMA,
    _read_or_empty,
    probe_candidates,
)

_TEXTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


class EditVerifyStore:
    """Append-only parquet store: bands + raw texts + emitted rows."""

    def __init__(self, store_dir: str):
        self.store_dir = store_dir

    def bands(self, spark: SparkSession) -> DataFrame:
        return _read_or_empty(spark, f"{self.store_dir}/bands", _BANDS_SCHEMA)

    def texts(self, spark: SparkSession) -> DataFrame:
        return _read_or_empty(spark, f"{self.store_dir}/texts", _TEXTS_SCHEMA)

    def pairs(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(f"{self.store_dir}/pairs")

    def append(self, pairs: DataFrame, bands: DataFrame, texts: DataFrame) -> None:
        pairs.write.mode("append").parquet(f"{self.store_dir}/pairs")
        bands.write.mode("append").parquet(f"{self.store_dir}/bands")
        texts.write.mode("append").parquet(f"{self.store_dir}/texts")


def edit_verify_rows(cand: DataFrame, texts: DataFrame, max_pct: int) -> DataFrame:
    """The X207 verify projection: candidates x texts -> flagged rows
    (the EXACT selectExpr of the batch query, so twin and batch can
    never drift on the verdict)."""
    return (
        F.broadcast(cand)
        .join(
            texts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "text", "text_a"
            ),
            "doc_a",
        )
        .join(
            texts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "text", "text_b"
            ),
            "doc_b",
        )
        .selectExpr(
            "doc_a",
            "doc_b",
            "cast(levenshtein(text_a, text_b) as bigint) AS lev",
            "cast(greatest(length(text_a), length(text_b)) as bigint)"
            " AS max_len",
            "round(1.0D - cast(levenshtein(text_a, text_b) as double)"
            " / greatest(length(text_a), length(text_b)), 6) AS edit_sim",
            f"100 * levenshtein(text_a, text_b)"
            f" <= {max_pct} * greatest(length(text_a), length(text_b))"
            f" AS is_near_dup",
        )
    )


def process_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    store: str | EditVerifyStore,
    max_pct: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = llm_dedup.NGRAM_N,
    k: int = llm_dedup.MINHASH_K,
    bands: int = llm_dedup.LSH_BANDS,
) -> DataFrame:
    """Verify one micro-batch against the store; append the new rows
    and the batch's bands/texts; return the new rows (same schema as
    the X207 batch query: doc_a, doc_b, lev, max_len, edit_sim,
    is_near_dup)."""
    if max_pct is None:
        from gmall_spark.queries_llm import EDIT_SIM_MAX_PCT

        max_pct = EDIT_SIM_MAX_PCT
    if isinstance(store, str):
        store = EditVerifyStore(store)
    txt = batch_docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    ).persist()
    sh = txt.select(
        "doc_id", F.explode(llm_dedup.shingle_array("text", n)).alias("shingle")
    )
    new_bands = llm_dedup.band_signatures(
        llm_dedup.minhash_signatures(sh, k), bands, k
    ).persist()

    cand = (
        probe_candidates(new_bands, new_bands)
        .unionByName(probe_candidates(new_bands, store.bands(spark)))
        .distinct()
    )
    rows = edit_verify_rows(cand, store.texts(spark).unionByName(txt), max_pct)

    store.append(rows, new_bands, txt)
    txt.unpersist()
    new_bands.unpersist()
    return rows


def emitted_rows(spark: SparkSession, store: str | EditVerifyStore) -> DataFrame:
    """All rows emitted so far (union over processed batches)."""
    if isinstance(store, str):
        store = EditVerifyStore(store)
    return store.pairs(spark)
