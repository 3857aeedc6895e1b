"""Similarity search over embedding columns (array<float>).

Tiers (BASELINE extension mandate), scale-ordered:

- brute-force cosine top-k: exact baseline. The query set is
  broadcast; each partition scores its vectors locally, then a single
  top-k-per-query window runs on (query, score). No all-to-all.
- LSH-bucketed ANN (multi-probe): deterministic hyperplane signatures
  bucket the corpus; queries probe their own bucket plus every
  1-bit-flip neighbor. The scale path: each query touches
  ~(n_planes+1)/2^n_planes of the corpus in expectation.
- multi-table LSH near-dup: L independent hyperplane tables, per-
  bucket pair expansion (no self-join), exact-cosine verification of
  candidates. Pair cost tracks duplicate density, not corpus².

Hyperplanes are md5-derived constants (no RNG): plane p's component d
is +1/-1 from a bit of md5(f"{salt}{p}:{d}"), computed driver-side
into literal arrays so the per-row work is ONE zip_with fold per
plane instead of `dim` chained expression terms. Reproducible across
runs and engines without storing plane matrices.

Ranking ties are broken by vec_id so results are deterministic; the
score is rounded before ranking so Spark's and the oracle's float
folds agree.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gmall_spark.functions.vectors import cosine

ANN_PLANES = 4
ANN_TABLES = 8
NEAR_DUP_TABLES = 32
NEAR_DUP_PLANES_PER_TABLE = 3


def infer_dim(embeddings: DataFrame, vec_col: str = "embedding") -> int:
    """Embedding width from the data (metadata-scale action: one row)."""
    row = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from column {vec_col!r}")
    return int(row["d"])


def _plane_coefs(n_planes: int, dim: int, salt: str = "") -> list[list[float]]:
    """+1/-1 coefficients for n_planes deterministic hyperplanes.

    Bit rule: first hex nibble of md5(f"{salt}{p}:{d}") odd -> +1.
    (Same rule the r1 expression version used, kept for stability.)
    """
    return [
        [
            1.0 if int(hashlib.md5(f"{salt}{p}:{d}".encode()).hexdigest()[0], 16) % 2 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_signature(
    vec: Column, n_planes: int, dim: int, salt: str = ""
) -> Column:
    """Deterministic random-hyperplane LSH signature (int bucket id).

    sign(dot(vec, plane_p)) per plane -> n_planes-bit bucket. The
    coefficients are plan-time literal arrays; each plane costs one
    codegen'd zip_with/aggregate fold over the vector.
    """
    sig = F.lit(0)
    dvec = F.transform(vec, lambda x: x.cast("double"))
    for p, row in enumerate(_plane_coefs(n_planes, dim, salt)):
        plane = F.array(*[F.lit(c) for c in row])
        proj = F.aggregate(
            F.zip_with(dvec, plane, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return sig.cast("bigint")


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is small -> broadcast cross join; cosine runs as a
    codegen'd higher-order function; row_number picks k per query.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            "cos_sim",
        )
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = ANN_PLANES,
    n_tables: int = ANN_TABLES,
    dim: int | None = None,
    multi_probe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: score only corpus vectors sharing a probe bucket with the
    query in ANY of ``n_tables`` independent hyperplane tables.

    Multi-probe: in each table the query probes its own bucket plus
    the n_planes buckets one bit-flip away (the most-likely-miss
    neighbors). A neighbor at plane-agreement p is found with
    P = 1 - (1 - (p^b + b·p^(b-1)(1-p)))^L — ~0.998 at cos 0.4 with
    the defaults (b=4, L=8), vs ~p^b = 0.16 for the r1 single-table
    single-probe version. Candidate (query, neighbor) pairs are
    deduped BEFORE vectors are re-attached and scored, so each
    survivor is scored exactly once.

    Bucket count 2^b must grow with the corpus (b ≈ log2(n) - log2(
    target bucket size)); on isotropic random vectors high-recall ANN
    degenerates toward linear scan (curse of dimensionality) — the
    win at 100 TB comes from real embedding corpora being clustered,
    which concentrates true neighbors in probed buckets.
    """
    dim = dim or infer_dim(embeddings, vec_col)
    c_tables = [
        F.struct(
            F.lit(t).alias("tbl"),
            hyperplane_signature(
                F.col(vec_col), n_planes, dim, salt=f"t{t}:"
            ).alias("bucket"),
        )
        for t in range(n_tables)
    ]
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(F.array(*c_tables)).alias("b"),
    ).select("neighbor_id", F.col("b.tbl").alias("tbl"), F.col("b.bucket").alias("bucket"))
    q_probes = []
    for t in range(n_tables):
        sig = hyperplane_signature(F.col(vec_col), n_planes, dim, salt=f"t{t}:")
        probes = [sig] + (
            [sig.bitwiseXOR(F.lit(2**p)) for p in range(n_planes)] if multi_probe else []
        )
        q_probes.extend(
            F.struct(F.lit(t).alias("tbl"), pr.alias("bucket")) for pr in probes
        )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.array(*q_probes)).alias("b"),
    ).select("query_id", F.col("b.tbl").alias("tbl"), F.col("b.bucket").alias("bucket"))
    cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    nv = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            "cos_sim",
        )
    )


def _verify_pairs(
    cand: DataFrame, embeddings: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    """Exact-cosine verification of (id_a, id_b) candidate pairs."""
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float,
    n_tables: int = NEAR_DUP_TABLES,
    planes_per_table: int = NEAR_DUP_PLANES_PER_TABLE,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via multi-table hyperplane LSH — the
    100 TB path (registered operator; the all-pairs scan below is the
    test oracle).

    L independent tables of b hyperplanes each: a pair colliding in
    ANY table becomes a candidate (band-OR), then exact cosine
    verifies — so false positives are impossible and the only error
    mode is a missed pair, P(miss) = (1 - p^b)^L with p =
    1 - theta/pi. Defaults (L=32, b=3) put P(miss) ~ 6e-5 at
    cos=0.4 and < 1e-8 at cos=0.6; a corpus deduped at a stricter
    threshold (0.8+) should raise b (more selective buckets) and
    can drop L. Candidates come from per-bucket pair expansion
    (groupBy bucket -> sorted ids -> i<j array expansion), the same
    no-self-join shape as the MinHash LSH — one shuffle to bucket,
    one to dedup candidates, never corpus².
    """
    dim = dim or infer_dim(embeddings, vec_col)
    e = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    tables = [
        F.struct(
            F.lit(t).alias("tbl"),
            hyperplane_signature(
                F.col("vec"), planes_per_table, dim, salt=f"t{t}:"
            ).alias("bucket"),
        )
        for t in range(n_tables)
    ]
    banded = e.select("vid", F.explode(F.array(*tables)).alias("b")).select(
        "vid", F.col("b.tbl").alias("tbl"), F.col("b.bucket").alias("bucket")
    )
    buckets = (
        banded.groupBy("tbl", "bucket")
        .agg(F.array_sort(F.collect_set("vid")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> transform("
        "slice(ids, i + 2, size(ids) - i - 1), "
        "y -> named_struct('id_a', x, 'id_b', y))))"
    )
    cand = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    return _verify_pairs(cand, embeddings, threshold, id_col, vec_col)


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos_sim >= threshold).

    Exact all-pairs formulation: self cross join blocked to the upper
    triangle (id_a < id_b halves the work); cosine runs as a codegen'd
    higher-order fold, the filter prunes before any wide row is built.
    O(n²) — this is the correctness oracle for ``embedding_near_dup_
    lsh``, which is the operator to run at scale.
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
