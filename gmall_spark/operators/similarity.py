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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

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


def bucket_signatures(
    n_tables: int, n_planes: int, dim: int, salt_fmt: str = "t{t}:"
):
    """All ``n_tables`` hyperplane buckets of a vector in ONE pass —
    an Arrow-batched pandas UDF doing a single float64 matrix multiply
    against the constant (n_tables*n_planes, dim) plane matrix.

    The pure-expression :func:`hyperplane_signature` builds ~dim
    literal nodes per plane; at 32 tables x 3 planes x 64 dims that is
    a ~20k-node interpreted expression evaluated per row (measured
    ~34 ms/row at sf0.01 — the analysis+interpretation cost, not the
    flops). The same arithmetic as one BLAS gemm per Arrow batch is
    >100x faster and is exactly the "vectorized pandas UDF where
    built-ins can't express it efficiently" escape hatch. Same
    md5-derived coefficients, float64 math, deterministic across
    runs; signatures only steer candidate RECALL — exact verification
    downstream stays codegen'd JVM arithmetic, so a last-ulp sign
    difference versus the sequential fold cannot produce a wrong
    result, only (negligibly, multi-table redundancy) a missed
    candidate.
    """
    mat = np.array(
        [
            row
            for t in range(n_tables)
            for row in _plane_coefs(n_planes, dim, salt=salt_fmt.format(t=t))
        ],
        dtype=np.float64,
    )  # (n_tables*n_planes, dim)
    pows = (2 ** np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        v = np.array(vs.tolist(), dtype=np.float64)  # (n, dim)
        proj = v @ mat.T  # (n, n_tables*n_planes)
        bits = (proj > 0).reshape(len(v), n_tables, n_planes)
        buckets = (bits * pows).sum(axis=2)  # (n, n_tables)
        return pd.Series(list(buckets))

    return _sig


def _table_buckets(
    df: DataFrame,
    out_id: str,
    n_tables: int,
    n_planes: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, tbl, bucket) rows for every table, via one UDF call."""
    sig = bucket_signatures(n_tables, n_planes, dim)
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(sig(F.col(vec_col))).alias("tbl", "bucket"),
    )


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
            F.round(cosine("qvec", "nvec"), 6).alias("cos_sim"),
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
    c = _table_buckets(
        embeddings, "neighbor_id", n_tables, n_planes, dim, id_col, vec_col
    )
    q_base = _table_buckets(
        queries, "query_id", n_tables, n_planes, dim, id_col, vec_col
    )
    if multi_probe:
        # own bucket + every 1-bit-flip neighbor, expanded JVM-side
        flips = F.concat(
            F.array(F.col("bucket")),
            F.array(
                *[
                    F.col("bucket").bitwiseXOR(F.lit(2**p))
                    for p in range(n_planes)
                ]
            ),
        )
        q = q_base.select(
            "query_id", "tbl", F.explode(flips).alias("bucket")
        )
    else:
        q = q_base
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
            F.round(cosine("qvec", "nvec"), 6).alias("cos_sim"),
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


def _cos_pairs_udf():
    """Row-wise cosine over two vector columns, one numpy pass per
    Arrow batch. Used on the candidate-verification hot path, where
    the interpreted zip_with/aggregate fold was the dominant cost
    (the baseline/oracle-exact queries keep the JVM fold). Built
    lazily: pandas_udf registration needs an active session."""

    @F.pandas_udf("double")
    def _cos_pairs(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        a = np.array(va.tolist(), dtype=np.float64)
        b = np.array(vb.tolist(), dtype=np.float64)
        num = (a * b).sum(axis=1)
        den = np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
        return pd.Series(num / den)

    return _cos_pairs


def _verify_pairs(
    cand: DataFrame, embeddings: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    """Exact-cosine verification of (id_a, id_b) candidate pairs
    (vectorized: candidates can approach all-pairs density when the
    corpus is isotropic at a low threshold, so the per-pair cost must
    be a few flops, not an interpreted fold).

    Tolerance assumption (ADVICE r2): ``cos_sim`` is rounded to 6
    decimals *before* the threshold filter, and numpy's pairwise
    summation can differ from a sequential SQL SUM in the last ulp —
    a pair whose cosine lands exactly on a 5e-7 rounding boundary
    could in principle flip versus the oracle. The parity gates
    compare floats with 1e-9 relative tolerance (tests/oracle.py),
    so only a boundary-straddling *threshold* decision could diverge;
    on real-valued embeddings the probability is ~1e-10 per pair and
    the fixed fixtures are verified green."""
    va = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(_cos_pairs_udf()(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
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
    max_bucket: int | None = None,
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
    from gmall_spark import persist

    dim = dim or infer_dim(embeddings, vec_col)
    banded = persist.register(
        _table_buckets(
            embeddings, "vid", n_tables, planes_per_table, dim, id_col, vec_col
        ).persist()
    )
    # Dense-regime candidate generation: at a LOW threshold (the
    # fixture's true pairs sit at cos 0.4-0.5, p1 ~ 0.64/plane) high
    # recall forces coarse buckets, so collisions approach all-pairs
    # density and the per-bucket array expansion (collect_set ->
    # nested transform, interpreted, ~|bucket|^2 structs per row) is
    # the wrong shape. A plain codegen'd self-join on (tbl, bucket)
    # streams the same pairs; distinct dedups the (narrow) pair keys
    # before vectors are attached. At a production dedup threshold
    # (0.8+) buckets are sparse and either shape is cheap.
    #
    # ``max_bucket`` (opt-in) bounds the self-join density: buckets
    # wider than it emit hop-1 + hop-2 links over the sorted ids
    # (linear, 2n-3 pairs) via window leads instead of the quadratic
    # self-join stream — the hop-2 links keep the verified subgraph
    # connected through any ISOLATED link that fails the exact-cosine
    # verify (VERDICT r4 item 5; same layout as
    # llm_dedup._bucket_pair_expr). Off by default because at a LOW
    # threshold wide buckets are *expected* and chaining them would
    # under-report pairs (the registered query's oracle is the exact
    # all-pairs scan); a production dedup at threshold 0.8+ (sparse
    # buckets, where a wide bucket really is a mega-group of
    # near-identical vectors) should set it.
    if max_bucket is None:
        b2 = banded.select(
            F.col("vid").alias("vid2"), F.col("tbl"), F.col("bucket")
        )
        cand = (
            banded.join(b2, ["tbl", "bucket"])
            .filter(F.col("vid") < F.col("vid2"))
            .select(F.col("vid").alias("id_a"), F.col("vid2").alias("id_b"))
            .distinct()
        )
    else:
        counts = banded.groupBy("tbl", "bucket").agg(
            F.count(F.lit(1)).alias("__n")
        )
        bn = banded.join(counts, ["tbl", "bucket"])
        small = bn.filter(F.col("__n") <= max_bucket)
        s2 = small.select(F.col("vid").alias("vid2"), "tbl", "bucket")
        small_pairs = (
            small.join(s2, ["tbl", "bucket"])
            .filter(F.col("vid") < F.col("vid2"))
            .select(F.col("vid").alias("id_a"), F.col("vid2").alias("id_b"))
        )
        w = Window.partitionBy("tbl", "bucket").orderBy("vid")
        big = (
            bn.filter(F.col("__n") > max_bucket)
            .withColumn("__next", F.lead("vid").over(w))
            .withColumn("__skip", F.lead("vid", 2).over(w))
        )
        big_pairs = (
            big.filter(F.col("__next").isNotNull())
            .select(F.col("vid").alias("id_a"), F.col("__next").alias("id_b"))
            .unionByName(
                big.filter(F.col("__skip").isNotNull()).select(
                    F.col("vid").alias("id_a"), F.col("__skip").alias("id_b")
                )
            )
        )
        cand = small_pairs.unionByName(big_pairs).distinct()
    return _verify_pairs(cand, embeddings, threshold, id_col, vec_col)


# All-pairs guard (VERDICT r4 item 6): 20k vectors is already 200M
# candidate pairs — far above the driver's SFs (2k at sf0.1), far
# below any production corpus.
ALL_PAIRS_MAX_VECTORS = 20_000


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_vectors: int | None = ALL_PAIRS_MAX_VECTORS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos_sim >= threshold).

    Exact all-pairs formulation: self cross join blocked to the upper
    triangle (id_a < id_b halves the work); cosine is the vectorized
    Arrow batch pass (n² pairs make the per-pair cost the whole
    budget). O(n²) — this is the correctness oracle for
    ``embedding_near_dup_lsh``, which is the operator to run at
    scale; ``max_vectors`` refuses a larger-than-intended corpus
    loudly (one count) instead of silently going quadratic.
    """
    if max_vectors is not None:
        n = embeddings.count()
        if n > max_vectors:
            raise RuntimeError(
                f"embedding_near_dup: corpus has {n} vectors, above "
                f"the all-pairs guard ({max_vectors}). This operator "
                "is the quadratic oracle baseline; at this size run "
                "embedding_near_dup_lsh (X8) instead, or pass an "
                "explicit higher bound / None to force it."
            )
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_cos_pairs_udf()(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def hard_negatives(
    embeddings: DataFrame,
    k: int = 3,
    lo: float = 0.2,
    hi: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training data (the ANCE /
    DPR in-batch-negative upgrade, cf. Xiong et al. 2021,
    arXiv:2007.00808): for each anchor, the top-``k`` neighbors whose
    cosine falls in the hard band [``lo``, ``hi``) — similar enough
    to be informative negatives, below the near-duplicate threshold
    so no positive leaks in as a negative (``hi`` defaults to the X7
    near-dup cut). Returns (anchor_id, negative_id, rank, cos_sim),
    rank 1 = hardest; ties break on negative_id like every ANN
    operator here.

    Scale shape: scoring is the X9 brute-force baseline relation
    (declared quadratic oracle tier); at 100 TB the candidate
    generation swaps to the IVF multi-probe scan (X11) with the band
    filter applied post-ADC — the band/top-k algebra is unchanged.
    The hard band keeps the OUTPUT corpus-linear (k rows per anchor).
    Scoring runs on the blocked-GEMM self-join (gemm_allpairs_topk —
    BLAS arithmetic, proven row-identical to the HOF fold); the band
    filter applies to the round-6 score before ranking either way.
    """
    return gemm_allpairs_topk(
        embeddings, k=k, lo=lo, hi=hi, id_col=id_col, vec_col=vec_col
    ).select(
        F.col("query_id").alias("anchor_id"),
        F.col("neighbor_id").alias("negative_id"),
        "rank",
        "cos_sim",
    )


GEMM_BLOCKS = 16  # self-join block grid side (GEMM_BLOCKS² block pairs)


def _pack_blocks(
    embeddings: DataFrame,
    nblocks: int,
    id_col: str,
    vec_col: str,
    prefix: str,
) -> DataFrame:
    """Pack the corpus into ``nblocks`` dense row-major float64
    matrices, one row per block: (blk, ids, mat bytes, n, d). Arrow
    moves each block once; vectors never reach the driver."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        return pd.DataFrame(
            {
                f"{prefix}blk": [int(pdf["blk"].iloc[0])],
                f"{prefix}ids": [pdf["id"].tolist()],
                f"{prefix}mat": [mat.tobytes()],
                f"{prefix}n": [mat.shape[0]],
                f"{prefix}d": [mat.shape[1]],
            }
        )

    return (
        embeddings.select(
            F.pmod(F.col(id_col), F.lit(nblocks)).cast("int").alias("blk"),
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
        )
        .groupBy("blk")
        .applyInPandas(
            pack,
            f"{prefix}blk int, {prefix}ids array<long>, {prefix}mat binary,"
            f" {prefix}n int, {prefix}d int",
        )
    )


def gemm_allpairs_topk(
    embeddings: DataFrame,
    k: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nblocks: int = GEMM_BLOCKS,
    cblocks: int = 1,
) -> DataFrame:
    """Exact all-pairs cosine top-k over the corpus against itself —
    the blocked-GEMM form of ``brute_force_topk(emb, emb, k)``, for
    the self-join uses (kNN graph build, hard-negative mining) where
    the per-pair HOF fold dominates wall clock: the corpus is packed
    into a block grid, every block PAIR computes one vectorized
    numpy gemm inside mapInPandas (Arrow batches, nothing on the
    driver), each pair emits its local per-query top-k, and one final
    window reduces nblocks candidate sets per query to the global
    top-k. Identical output contract to brute_force_topk (round-6
    cosine, ties by neighbor id); optional [lo, hi) band filter
    applied on the ROUNDED score before ranking (hard_negatives).

    Still the declared quadratic tier — n²/(nblocks·cblocks) gemms —
    but the arithmetic runs at BLAS speed instead of one lambda per
    element. With the default ``cblocks=1`` the whole candidate
    matrix rides in ONE broadcast block (8 bytes · n · d — ~1 MB per
    million dims·vectors), every query block's local top-k is already
    global, and the final merge window disappears; raise ``cblocks``
    when the corpus matrix outgrows a broadcast (the merge window
    comes back automatically). Scale swap stays IVF.
    """
    q = _pack_blocks(embeddings, nblocks, id_col, vec_col, "q_")
    c = _pack_blocks(embeddings, cblocks, id_col, vec_col, "c_")
    paired = q.crossJoin(F.broadcast(c))

    def score(batches):
        for pdf in batches:
            out_q, out_n, out_s, out_r = [], [], [], []
            for row in pdf.itertuples(index=False):
                qids = np.asarray(row.q_ids, dtype=np.int64)
                cids = np.asarray(row.c_ids, dtype=np.int64)
                Q = np.frombuffer(row.q_mat, dtype=np.float64).reshape(
                    row.q_n, row.q_d
                )
                C = np.frombuffer(row.c_mat, dtype=np.float64).reshape(
                    row.c_n, row.c_d
                )
                Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
                Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
                S = np.round(Qn @ Cn.T, 6)
                S[qids[:, None] == cids[None, :]] = np.nan  # self
                if lo is not None:
                    S[S < lo] = np.nan
                if hi is not None:
                    S[S >= hi] = np.nan
                for qi in range(len(qids)):
                    srow = S[qi]
                    valid = np.flatnonzero(~np.isnan(srow))
                    if not len(valid):
                        continue
                    # local top-k with the global tie rule
                    order = valid[np.lexsort((cids[valid], -srow[valid]))][:k]
                    out_q.extend([qids[qi]] * len(order))
                    out_n.extend(cids[order].tolist())
                    out_s.extend(srow[order].tolist())
                    out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "cos_sim": pd.Series(out_s, dtype="float64"),
                    "rank": pd.Series(out_r, dtype="int64"),
                }
            )

    local = paired.mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double, rank long"
    )
    if cblocks == 1:
        # each query meets exactly one candidate block: local order IS
        # the global order, no merge window needed
        return local.select("query_id", "neighbor_id", "rank", "cos_sim")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            "cos_sim",
        )
    )


# ---------------------------------------------------------------------------
# Margin-based bitext mining (X148; Artetxe & Schwenk 2019,
# arXiv:1811.01136 §3 "ratio" margin): cross-lingual parallel-sentence
# candidates scored by cos(x, y) relative to BOTH sides' nearest-
# neighborhood averages — absolute cosine thresholds fail because some
# sentences live in dense regions; the margin normalizes that out.
# ---------------------------------------------------------------------------

BITEXT_NN_K = 4

# All-pairs guard for the exact bitext pass (VERDICT r7 item 2): the
# cross join scores |src| x |tgt| pairs AND broadcasts the whole
# target side — 200M pairs is already far above the driver's SFs and
# far below any production lang pair. At scale run
# ``bitext_margin_top1_ann`` (IVF candidate generation feeding the
# same margin fold) instead.
BITEXT_MAX_PAIRS = 200_000_000

# Persist ceiling for the scored pair relation (ADVICE r13): at ~24
# narrow bytes/row, 20M rows is ~0.5 GB of executor storage — a cheap
# trade for skipping two cross-join re-evaluations. Near the 200M
# all-pairs guard it would be multiple GB, so larger pair sets stream.
BITEXT_PERSIST_MAX_PAIRS = 20_000_000


def bitext_margin_top1(
    src: DataFrame,
    tgt: DataFrame,
    k: int = BITEXT_NN_K,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    max_pairs: int | None = BITEXT_MAX_PAIRS,
    side_counts: tuple[int, int] | None = None,
) -> DataFrame:
    """Per source doc, the best-margin target doc:
    margin = 2·cos(x,y) / (avg_k(x→tgt) + avg_k(y→src)).

    Cross-engine float discipline: cosines round to 6 dp first, and
    each side's top-k neighborhood SUM folds over a SORTED array
    (aggregate HOF / list_reduce) — a plain SUM() aggregates in
    shuffle order and its last-ulp noise would flip rounded margins.
    The division happens once, on bit-identical doubles.

    Scale shape: the cross join is lang-pair-bounded here (the
    registered corpus) and swaps for IVF/LSH candidate generation
    (X8/X11) at 100 TB — margins only need each candidate's top-k
    neighborhood, which the index returns anyway.

    Domain: the ratio margin assumes a mostly POSITIVE similarity
    range (LASER-style sentence embeddings); if a neighborhood sum
    goes negative the ratio flips sign and the score is meaningless —
    pinned by the planted-fixture test.

    Returns (src_id, tgt_id, cos_sim, margin)."""
    if max_pairs is not None:
        # side_counts lets callers that already know (or memoize) the
        # side cardinalities skip the two guard-only Spark jobs — the
        # bench's min-of-3 repeats paid them 3x per invocation
        # (ADVICE r8 item 3).
        n_src, n_tgt = side_counts or (src.count(), tgt.count())
        if n_src * n_tgt > max_pairs:
            raise RuntimeError(
                f"bitext_margin_top1: {n_src} x {n_tgt} = "
                f"{n_src * n_tgt} candidate pairs, above the all-pairs "
                f"guard ({max_pairs}). This operator is the quadratic "
                "oracle baseline (it also BROADCASTS the whole target "
                "side); at this size run bitext_margin_top1_ann "
                "instead, or pass an explicit higher bound / None to "
                "force it."
            )
    from pyspark import StorageLevel

    from gmall_spark import persist as _persist

    s = src.select(F.col(id_col).alias("src_id"), F.col(vec_col).alias("sv"))
    t = tgt.select(F.col(id_col).alias("tgt_id"), F.col(vec_col).alias("tv"))
    # persisted (r13): the scored pair relation feeds THREE subtrees
    # (both topk_sum neighborhoods and the final margin join) — each
    # re-ran the cross join + cosine without it. r14 (ADVICE r13): the
    # persist is sized off the known pair count — near the 200M guard
    # it would materialize multiple GB of executor storage/disk where
    # the pre-r13 shape streamed, so above BITEXT_PERSIST_MAX_PAIRS
    # (or when the caller forced max_pairs=None and the count is
    # unknown) the pair relation streams through each consumer again:
    # 3x the compute, none of the storage.
    scored = s.crossJoin(F.broadcast(t)).select(
        "src_id",
        "tgt_id",
        F.round(cosine("sv", "tv"), 6).alias("cos6"),
    )
    if max_pairs is not None and n_src * n_tgt <= BITEXT_PERSIST_MAX_PAIRS:
        pairs = _persist.register(scored.persist(StorageLevel.MEMORY_AND_DISK))
    else:
        pairs = scored

    def topk_sum(df, key, other):
        # deterministic order: (-cos, other-id) ascending, fold in order
        return (
            df.groupBy(key)
            .agg(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct((-F.col("cos6")).alias("nc"), F.col(other))
                        )
                    ),
                    1,
                    k,
                ).alias("top")
            )
            .select(
                key,
                F.aggregate(
                    "top", F.lit(0.0), lambda a, x: a - x["nc"]
                ).alias("nn_sum"),
                F.size("top").alias("nn_k"),
            )
        )

    sx = topk_sum(pairs, "src_id", "tgt_id").withColumnRenamed(
        "nn_sum", "sum_x"
    ).withColumnRenamed("nn_k", "k_x")
    sy = topk_sum(pairs, "tgt_id", "src_id").withColumnRenamed(
        "nn_sum", "sum_y"
    ).withColumnRenamed("nn_k", "k_y")
    scored = (
        pairs.join(F.broadcast(sx), "src_id")
        .join(F.broadcast(sy), "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.col("cos6").alias("cos_sim"),
            F.round(
                2.0
                * F.col("cos6")
                / (F.col("sum_x") / F.col("k_x") + F.col("sum_y") / F.col("k_y")),
                6,
            ).alias("margin"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(
        F.desc("margin"), F.desc("cos_sim"), F.asc("tgt_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def bitext_margin_top1_ann(
    src: DataFrame,
    tgt: DataFrame,
    centroids: list[list[float]],
    k: int = BITEXT_NN_K,
    nprobe: int | None = None,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index-backed bitext mining: the exact pass's scale path
    (VERDICT r7 item 2). Candidate generation is IVF (X11) in BOTH
    directions — each language side probes its nprobe nearest
    inverted lists of the OTHER side's index — and the ratio margin
    folds over exactly the approximate top-k neighborhoods the index
    returns (Artetxe & Schwenk 2019 §3: margins only ever need each
    candidate's k-nearest neighborhood, which CCMatrix also takes
    from an IVF index rather than exact search).

    Scale shape: no cross join, no corpus broadcast — the probe
    joins shuffle on ``list_id`` (the partitioning an IVF index is
    stored under), candidate volume is nprobe/n_lists of the exact
    pass's |src| x |tgt|, and every downstream fold is per-key
    bounded by k. The centroids are the caller's trained coarse
    quantizer (a bounded broadcast literal, shared with the other
    IVF consumers).

    Float discipline matches the exact pass: cosines round to 6 dp
    inside ``ivf_topk``; each neighborhood sum folds in rank order
    (cos desc, id asc — deterministic, oracle-replayable); the
    margin divides once on bit-identical doubles. Pairs whose target
    side found no src-probe candidates (so has no neighborhood) drop
    out — margins need both sides' neighborhoods.

    Returns (src_id, tgt_id, cos_sim, margin) — top-1 margin per src.
    """
    from pyspark import StorageLevel

    from gmall_spark import persist as _persist
    from gmall_spark.operators import ivf as _ivf

    if nprobe is None:
        nprobe = _ivf.IVF_NPROBE

    # Each side is BOTH an index (top-1 list assignment) and a probe
    # set (top-nprobe lists) — one centroid-ranking UDF pass per side
    # serves both roles (lists[0] IS the assignment: same gemm, same
    # stable-argsort tie rule), and the persisted ranked relation
    # keeps the docs-join subtree from re-evaluating once per role
    # (4 evaluations -> 2 builds; measured 5.1 -> ~2 s at sf0.1).
    def _ranked(side: DataFrame) -> DataFrame:
        return _persist.register(
            side.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                _ivf._nearest_lists_udf(centroids, nprobe)(
                    F.col(vec_col)
                ).alias("lists"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )

    rs, rt = _ranked(src), _ranked(tgt)

    def _index(r: DataFrame) -> DataFrame:
        return r.select(
            "vec_id", "embedding", F.element_at("lists", 1).alias("list_id")
        )

    def _probes(r: DataFrame) -> DataFrame:
        return r.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
            F.explode("lists").alias("list_id"),
        )

    def _topk(index: DataFrame, probes: DataFrame) -> DataFrame:
        scored = index.join(probes, "list_id").select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine("qvec", "embedding"), 6).alias("cos_sim"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    # x -> tgt top-k: these pairs ARE the candidate set, and x's
    # neighborhood; y -> src top-k supplies y's neighborhood. cand is
    # persisted (r13): it feeds BOTH the sx neighborhood fold and the
    # final margin join — each re-ran the probe-join + scoring +
    # window without it (back has a single consumer).
    cand = _persist.register(
        _topk(_index(rt), _probes(rs)).persist(StorageLevel.MEMORY_AND_DISK)
    )
    back = _topk(_index(rs), _probes(rt))

    def _nn_sum(topk: DataFrame, out_id: str, out_sum: str, out_k: str) -> DataFrame:
        # fold in rank order (struct sorts on its first field; ranks
        # are unique per query): 0.0 + c1 + c2 + ... bit-matches the
        # oracle's list_reduce over the same ordering
        return topk.groupBy(F.col("query_id").alias(out_id)).agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("rank", "cos_sim"))),
                F.lit(0.0),
                lambda a, x: a + x["cos_sim"],
            ).alias(out_sum),
            F.count(F.lit(1)).alias(out_k),
        )

    sx = _nn_sum(cand, "src_id", "sum_x", "k_x")
    sy = _nn_sum(back, "tgt_id", "sum_y", "k_y")
    scored = (
        cand.select(
            F.col("query_id").alias("src_id"),
            F.col("neighbor_id").alias("tgt_id"),
            F.col("cos_sim").alias("cos6"),
        )
        .join(sx, "src_id")
        .join(sy, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.col("cos6").alias("cos_sim"),
            F.round(
                2.0
                * F.col("cos6")
                / (F.col("sum_x") / F.col("k_x") + F.col("sum_y") / F.col("k_y")),
                6,
            ).alias("margin"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(
        F.desc("margin"), F.desc("cos_sim"), F.asc("tgt_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
