"""X220-X221 planted paraphrase fixture: contamination whose
embedding sits in the reference vector's neighborhood while its TEXT
shares (almost) no shingles — the case the shingle-LSH clean (X47)
ships and the semantic detector must catch."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_spark.operators import ivf, llm_dedup
from gmall_spark.operators.similarity import _verify_pairs

THRESHOLD = 0.4

# doc 0 is the held-out reference item (id % 20 == 0); doc 1 is its
# PARAPHRASE (same meaning, different words → high cosine, low
# Jaccard); doc 21 is unrelated.
DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "a speedy tan vulpine leaps across one sleepy hound beside that stream edge now"),
    (21, "spark shuffles partition data across executors during wide transformations"),
]
EMB = [
    (0, [1.0, 0.05, 0.0, 0.0]),
    (1, [0.97, 0.12, 0.05, 0.0]),   # paraphrase: cos vs ref ≈ 0.99
    (21, [0.0, 0.1, 1.0, 0.2]),     # unrelated: cos vs ref ≈ 0.02
]
CENTROIDS = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]


def _semantic_flags(spark):
    emb = spark.createDataFrame(EMB, "vec_id long, embedding array<float>")
    index = ivf.build_index(emb, CENTROIDS).select("vec_id", "list_id")
    ref = index.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("id_b"), "list_id"
    )
    cand = (
        index.filter(F.col("vec_id") % 20 != 0)
        .select(F.col("vec_id").alias("id_a"), "list_id")
        .join(ref, "list_id")
        .select("id_a", "id_b")
    )
    return {
        r.id_a
        for r in _verify_pairs(cand, emb, THRESHOLD, "vec_id", "embedding").collect()
    }


def test_semantic_catches_paraphrase_lsh_does_not(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    lsh_flags = {
        r.doc_id
        for r in llm_dedup.cross_corpus_near_dups(
            docs.filter(F.col("doc_id") % 20 != 0),
            docs.filter(F.col("doc_id") % 20 == 0),
            THRESHOLD,
        ).collect()
    }
    sem_flags = _semantic_flags(spark)
    # the paraphrase is exactly the semantic_only cell of the X221 audit
    assert sem_flags == {1}, sem_flags
    assert 1 not in lsh_flags, lsh_flags
    # and the unrelated doc is flagged by neither
    assert 21 not in sem_flags and 21 not in lsh_flags


def test_semantic_blocking_requires_shared_list(spark):
    """The production path is IVF-blocked: a contaminated vector in a
    DIFFERENT list than every reference vector is missed — the
    declared SemDeDup trade (boundary pairs), pinned so the blocking
    is provably doing the bounding, not silently running all-pairs."""
    emb = spark.createDataFrame(
        EMB + [(41, [0.05, 0.0, 0.97, 0.0])],  # near list-1, no ref there
        "vec_id long, embedding array<float>",
    )
    index = ivf.build_index(emb, CENTROIDS).select("vec_id", "list_id")
    lists = {r.vec_id: r.list_id for r in index.collect()}
    assert lists[41] == 1 and lists[0] == 0  # planted in the ref-free list
    ref = index.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("id_b"), "list_id"
    )
    cand = (
        index.filter(F.col("vec_id") % 20 != 0)
        .select(F.col("vec_id").alias("id_a"), "list_id")
        .join(ref, "list_id")
        .select("id_a", "id_b")
    )
    assert {r.id_a for r in cand.collect()} == {1}
