"""Incremental (streaming) MinHash+LSH near-dup detection.

Extends the batch pipeline (operators.llm_dedup.minhash_lsh_dedup,
SURVEY X4) into the shape a continuously-ingesting corpus needs: each
micro-batch of new documents is shingled, signed and banded exactly
like the batch path, then joined against a PERSISTED signature store
holding every previously-seen document's band hashes — so a new doc
is checked against the whole corpus-so-far without ever rescanning
it. The store is three append-only parquet tables:

- ``bands``:    (doc_id, band_idx, band_hash) — the LSH index
- ``shingles``: (doc_id, shingles)            — for exact verification
- ``pairs``:    (doc_a, doc_b, inter, jaccard) — verified output

Per batch the work is: sign the batch (per-row, no shuffle), one
equi-join of the batch's bands against the store's on
(band_idx, band_hash) — at 100 TB the store is laid out partitioned/
bucketed by band_hash so this join co-locates without shuffling the
store — plus exact-Jaccard verification of the (tiny) candidate set.

Batch-equals-streaming: a pair is discovered in the batch where its
LATER member arrives (within-batch pairs come from the batch's self
join), and pairs are canonicalized doc_a < doc_b, so the union of
emitted pairs after any batch split equals the single-batch
``minhash_lsh_dedup`` output on the full corpus. The equality is
asserted by tests/test_streaming.py.

Deployment: wire :func:`process_batch` into
``runner.run_foreach_batch`` (the same micro-batch shell every other
foreachBatch pipeline here uses); a Kafka source swaps in upstream of
it unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_spark.operators import llm_dedup

_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("band_hash", T.StringType()),
    ]
)
_SHINGLES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shingles", T.ArrayType(T.StringType())),
    ]
)


def _read_or_empty(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read a store table, treating ONLY a missing path as 'first
    batch: store not created yet'. Any other failure (permissions, a
    corrupt footer) must surface — swallowing it would silently treat
    the store as empty and permanently drop cross-batch duplicate
    pairs (ADVICE r3)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], schema)
        raise


def process_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    store_dir: str,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = llm_dedup.NGRAM_N,
    k: int = llm_dedup.MINHASH_K,
    bands: int = llm_dedup.LSH_BANDS,
) -> DataFrame:
    """Dedup one micro-batch against the signature store; append the
    verified new pairs and the batch's signatures/shingles; return the
    new pairs (same schema as the batch operator: doc_a, doc_b, inter,
    jaccard)."""
    with_arr = batch_docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        llm_dedup.shingle_array(text_col, n).alias("shingles"),
    ).persist()
    sh = with_arr.select("doc_id", F.explode("shingles").alias("shingle"))
    new_bands = llm_dedup.band_signatures(
        llm_dedup.minhash_signatures(sh, k), bands, k
    ).persist()

    old_bands = _read_or_empty(spark, f"{store_dir}/bands", _BANDS_SCHEMA)
    all_bands = old_bands.unionByName(new_bands)
    # candidates: each NEW doc against everything seen so far
    # (including this batch — within-batch pairs), canonical a < b
    other = all_bands.select(
        F.col("doc_id").alias("doc_o"), "band_idx", "band_hash"
    )
    cand = (
        new_bands.join(other, ["band_idx", "band_hash"])
        .filter(F.col("doc_id") != F.col("doc_o"))
        .select(
            F.least("doc_id", "doc_o").alias("doc_a"),
            F.greatest("doc_id", "doc_o").alias("doc_b"),
        )
        .distinct()
    )
    # No re-emission across batches: every candidate has at least one
    # member from THIS batch (never seen before), so a pair can only
    # be generated in the batch where its later member arrives; the
    # distinct above collapses multi-band collisions within it.
    old_shingles = _read_or_empty(spark, f"{store_dir}/shingles", _SHINGLES_SCHEMA)
    all_arr = old_shingles.unionByName(with_arr)
    pairs = llm_dedup.jaccard_for_arrays(cand, all_arr, threshold)

    pairs.write.mode("append").parquet(f"{store_dir}/pairs")
    new_bands.write.mode("append").parquet(f"{store_dir}/bands")
    with_arr.write.mode("append").parquet(f"{store_dir}/shingles")
    with_arr.unpersist()
    new_bands.unpersist()
    return pairs


def emitted_pairs(spark: SparkSession, store_dir: str) -> DataFrame:
    """All pairs emitted so far (union over processed batches)."""
    return spark.read.parquet(f"{store_dir}/pairs")
