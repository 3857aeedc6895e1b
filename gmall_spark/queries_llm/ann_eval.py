"""ANN evaluation harnesses: LSH band planning, embedding dimension truncation, JL random-projection recall/two-stage retrieval evals.

Split from queries_llm.py (r11) verbatim; registry semantics
unchanged — every @query body and oracle string is byte-identical
to the monolith it moved from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from gmall_spark.operators import (
    similarity,
)
from gmall_spark.queries import _t, query
from gmall_spark.queries_llm.prelude import _emb, _oracle_dim_check

# --- LSH band planning (X137) ----------------------------------------------

BAND_PLAN_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))


def _pow_chain(e: str, n: int) -> str:
    """x^n as an explicit parenthesized product (exponentiation by
    squaring). The SAME text parses in Spark SQL and DuckDB and every
    step is one IEEE-754 multiply — bit-identical doubles cross-engine,
    where pow() could drift an ulp between libms."""
    assert n >= 1
    if n == 1:
        return e
    half = _pow_chain(e, n // 2)
    sq = f"({half}*{half})"
    return sq if n % 2 == 0 else f"({sq}*{e})"


def _band_plan_p_case() -> str:
    """P(candidate | jaccard s) = 1 - (1 - s^r)^b per (b, r) config,
    as ONE CASE expression shared verbatim by both engines."""
    arms = []
    for b, r in BAND_PLAN_CONFIGS:
        miss = _pow_chain(f"(1.0 - {_pow_chain('s', r)})", b)
        arms.append(
            f"WHEN n_bands = {b} AND rows_per_band = {r} THEN 1.0 - {miss}"
        )
    return "CASE " + " ".join(arms) + " END"


def _band_plan_oracle() -> str:
    cfg = ",".join(f"({b},{r})" for b, r in BAND_PLAN_CONFIGS)
    return f"""
WITH cfg(n_bands, rows_per_band) AS (VALUES {cfg}),
sg AS (SELECT unnest(range(1, 20)) * 5 AS s_pct),
g AS (SELECT n_bands, rows_per_band, s_pct, s_pct / 100.0 AS s FROM cfg, sg),
p AS (
  SELECT n_bands, rows_per_band, s_pct, {_band_plan_p_case()} AS p_raw FROM g
)
SELECT CAST(n_bands AS BIGINT) AS n_bands,
       CAST(rows_per_band AS BIGINT) AS rows_per_band,
       CAST(s_pct AS BIGINT) AS s_pct,
       round(p_raw, 6) AS p_candidate,
       CAST(min(CASE WHEN p_raw >= 0.5 THEN s_pct END)
              OVER (PARTITION BY n_bands, rows_per_band) AS BIGINT) AS s50_pct
FROM p
"""


@query("dedup_lsh_band_plan", _band_plan_oracle())
def q_dedup_lsh_band_plan(spark, sf_dir):
    """MinHash-LSH band planning made executable (X137; MMDS ch.3
    S-curve): for every (bands, rows/band) factorization of the
    repo's 16-permutation signature, the candidate probability
    1-(1-s^r)^b over a Jaccard grid, plus the s50 crossover each
    config puts its detection threshold at — the design table that
    justifies the shipped (4,4) layout (s50 at 55%: tuned for the
    0.8 near-dup gate with slack for signature noise, where (16,1)
    floods candidates at s=20% and (1,16) misses most true pairs at
    s=80%). Powers evaluate as explicit IEEE multiply chains (the
    exact same expression text in both engines), never libm pow."""
    cfg = spark.createDataFrame(
        list(BAND_PLAN_CONFIGS), "n_bands int, rows_per_band int"
    )
    grid = (
        cfg.crossJoin(
            spark.range(1, 20).select((F.col("id") * 5).alias("s_pct"))
        )
        .withColumn("s", F.col("s_pct") / F.lit(100.0))
        .withColumn("p_raw", F.expr(_band_plan_p_case()))
    )
    w = Window.partitionBy("n_bands", "rows_per_band")
    return grid.select(
        F.col("n_bands").cast("bigint").alias("n_bands"),
        F.col("rows_per_band").cast("bigint").alias("rows_per_band"),
        F.col("s_pct").cast("bigint").alias("s_pct"),
        F.round("p_raw", 6).alias("p_candidate"),
        F.min(F.when(F.col("p_raw") >= 0.5, F.col("s_pct")))
        .over(w)
        .cast("bigint")
        .alias("s50_pct"),
    )


# --- embedding dimension-truncation eval (X138) -----------------------------

TRUNC_DIMS = (32, 16, 8)


def _trunc_bf_oracle(d: int | None) -> str:
    """Brute-force cosine top-10 oracle at the first ``d`` dims (the
    proven unnest-zip idiom from similarity_topk_cosine); full width
    when d is None."""
    sl = f"[1:{d}]" if d is not None else ""
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding{sl} AS qvec FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, embedding{sl} AS nvec FROM embeddings
), pairs AS (
  SELECT query_id, neighbor_id,
         unnest(qvec)::DOUBLE AS qx, unnest(nvec)::DOUBLE AS nx
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
), scored AS (
  SELECT query_id, neighbor_id,
         round(SUM(qx * nx) / (sqrt(SUM(qx * qx)) * sqrt(SUM(nx * nx))), 6) AS cos_sim
  FROM pairs GROUP BY query_id, neighbor_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id FROM ranked WHERE rank <= 10
"""


def _trunc_eval_oracle() -> str:
    withs = ",\n".join(
        f"a{d} AS (SELECT query_id, neighbor_id FROM ({_trunc_bf_oracle(d)}))"
        for d in TRUNC_DIMS
    )
    arms = "\nUNION ALL\n".join(
        f"""SELECT CAST({d} AS BIGINT) AS dims,
       CAST((SELECT count(*) FROM bf) AS BIGINT) AS bf_pairs,
       CAST((SELECT count(*) FROM bf JOIN a{d} USING (query_id, neighbor_id)) AS BIGINT) AS hits,
       round(CAST((SELECT count(*) FROM bf JOIN a{d} USING (query_id, neighbor_id)) AS DOUBLE)
             / (SELECT count(*) FROM bf), 6) AS recall_at_10"""
        for d in TRUNC_DIMS
    )
    return (
        f"WITH bf AS MATERIALIZED (SELECT query_id, neighbor_id FROM "
        f"({_trunc_bf_oracle(None)})),\n{withs}\n{arms}"
    )


@query("similarity_eval_dim_truncation", _trunc_eval_oracle())
def q_similarity_eval_dim_truncation(spark, sf_dir):
    """Matryoshka-style dimension-truncation evaluation (X138;
    Kusupati et al. 2022, arXiv:2205.13147): recall@10 of brute-force
    cosine over the FIRST 32/16/8 dims against the full-64-dim ground
    truth — the acceptance table a pipeline reads before shrinking
    its vector index (a truncated index costs d/64 of the scan bytes
    and the table says what recall that buys). Same harness shape as
    the ANN recall eval; every arm reuses the registered brute-force
    operator on sliced vectors."""
    from pyspark import StorageLevel

    from gmall_spark import persist as _persist

    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < 5)
    # bf (the full-width ground truth, ≤ 5·k rows) feeds every arm's
    # left join — persist it so the cross-join+window subtree runs
    # once, not once per arm (r13; guide §2.4 "share one computation")
    bf = _persist.register(
        similarity.brute_force_topk(emb, qs, k=10)
        .select("query_id", "neighbor_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    arms = []
    for d in TRUNC_DIMS:
        te = emb.select("vec_id", F.slice("embedding", 1, d).alias("embedding"))
        tq = qs.select("vec_id", F.slice("embedding", 1, d).alias("embedding"))
        arm = similarity.brute_force_topk(te, tq, k=10).select(
            "query_id", "neighbor_id", F.lit(1).alias("hit")
        )
        # both sides are ≤ 5·k rows; broadcast the arm so the join
        # never sort-merge-shuffles two 50-row relations (r13)
        j = bf.join(F.broadcast(arm), ["query_id", "neighbor_id"], "left")
        arms.append(
            j.agg(
                F.lit(d).cast("bigint").alias("dims"),
                F.count(F.lit(1)).cast("bigint").alias("bf_pairs"),
                F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("hits"),
                F.round(
                    F.coalesce(F.sum("hit"), F.lit(0)) / F.count(F.lit(1)), 6
                ).alias("recall_at_10"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


# --- JL random-projection recall eval (X190) ----------------------------------

JL_DIMS = (32, 16)


# Column memo for the JL select list (r14, guide §7.3 driver work /
# §1.2 step 1): building the d projected-coordinate folds Column-op by
# Column-op cost ~2,500 py4j round-trips per call (d × dim F.lit sign
# literals + HOF lambda machinery) — ~1.3 s of pure DRIVER time at any
# scale, measured as the top single plan-builder in the sf0.001
# cProfile (32 s cumulative / 6 calls under profile), paid once per
# bench repeat by both JL queries. The sign rows are md5-derived
# constants, so the select list is a pure function of (d, dim): each
# coordinate is now ONE SQL string parsed server-side (F.expr — the
# JVM parser costs microseconds where the same tree via py4j costs
# milliseconds), and the built Column objects are memoized per
# (applicationId, d, dim) — immutable expression trees, the _T_PLANS
# argument at expression grain; no data cached. Cleared by
# queries.clear_cache.
_JL_EXPRS: dict[tuple[str, int, int], list] = {}


def _jl_project_exprs(d: int, dim: int) -> list:
    """``d`` projected coordinates as sequential zip_with folds over
    md5-derived +/-1 sign rows (similarity._plane_coefs, salt 'jl:').
    Sequential fold order == DuckDB's list_dot_product order, so the
    projected doubles are BIT-IDENTICAL cross-engine — no pairwise-
    vs-sequential ulp drift reaches the rounded cosine ranking.
    (r13: an unrolled multiply-add-chain variant was measured and
    rejected — identical executor time, but the d·dim-node expression
    trees blew up Catalyst analysis; see functions/vectors.py note.
    r14: the SAME fold is now built as one parsed SQL string per
    coordinate and memoized — see _JL_EXPRS above. The parsed
    expression is the identical sequential fold: same transform/
    zip_with/aggregate, same casts, same fold order.)"""
    from pyspark.sql import SparkSession

    tok = SparkSession.getActiveSession().sparkContext.applicationId
    key = (tok, d, dim)
    cached = _JL_EXPRS.get(key)
    if cached is None:
        cached = []
        for j, row in enumerate(similarity._plane_coefs(d, dim, salt="jl:")):
            arr = "array(" + ", ".join(f"{float(c)!r}D" for c in row) + ")"
            cached.append(
                F.expr(
                    "aggregate(zip_with(transform(embedding,"
                    f" x -> CAST(x AS DOUBLE)), {arr}, (x, c) -> x * c),"
                    " 0.0D, (a, x) -> a + x)"
                ).alias(f"p{j}")
            )
        _JL_EXPRS[key] = cached
    return cached


def _jl_bf_oracle(d: int | None, dim: int, k: int = 10) -> str:
    """Brute-force cosine top-``k`` over the JL-projected vectors
    (sign rows baked as literal arrays, list_dot_product per
    coordinate); full-width when d is None."""
    if d is None:
        vec = "list_transform(embedding, (x) -> CAST(x AS DOUBLE))"
    else:
        coords = []
        for row in similarity._plane_coefs(d, dim, salt="jl:"):
            arr = "[" + ", ".join(str(float(c)) for c in row) + "]::DOUBLE[]"
            coords.append(
                f"list_dot_product(list_transform(embedding,"
                f" (x) -> CAST(x AS DOUBLE)), {arr})"
            )
        vec = "[" + ", ".join(coords) + "]"
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, {vec} AS qvec FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, {vec} AS nvec FROM embeddings
), pairs AS (
  SELECT query_id, neighbor_id,
         unnest(qvec)::DOUBLE AS qx, unnest(nvec)::DOUBLE AS nx
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
), scored AS (
  SELECT query_id, neighbor_id,
         round(SUM(qx * nx) / (sqrt(SUM(qx * qx)) * sqrt(SUM(nx * nx))), 6) AS cos_sim
  FROM pairs GROUP BY query_id, neighbor_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id FROM ranked WHERE rank <= {k}
"""


def _jl_eval_oracle() -> str:
    from gmall_spark.ann_oracles import EMBED_DIM as _DIM

    withs = ",\n".join(
        f"a{d} AS (SELECT query_id, neighbor_id FROM ({_jl_bf_oracle(d, _DIM)}))"
        for d in JL_DIMS
    )
    arms = "\nUNION ALL\n".join(
        f"""SELECT CAST({d} AS BIGINT) AS dims,
       CAST((SELECT count(*) FROM bf) AS BIGINT) AS bf_pairs,
       CAST((SELECT count(*) FROM bf JOIN a{d} USING (query_id, neighbor_id)) AS BIGINT) AS hits,
       round(CAST((SELECT count(*) FROM bf JOIN a{d} USING (query_id, neighbor_id)) AS DOUBLE)
             / (SELECT count(*) FROM bf), 6) AS recall_at_10"""
        for d in JL_DIMS
    )
    return (
        f"WITH bf AS MATERIALIZED (SELECT query_id, neighbor_id FROM "
        f"({_jl_bf_oracle(None, _DIM)})),\n{withs}\n{arms}"
    )


@query("similarity_eval_jl_projection", _jl_eval_oracle())
def q_similarity_eval_jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random-projection evaluation (X190;
    Achlioptas 2003's database-friendly +/-1 projections): recall@10
    of brute-force cosine over md5-derived sign projections to 32/16
    dims against the full-width ground truth — the OTHER way to
    shrink a vector index (X138 truncates assuming Matryoshka
    training; JL needs no such property, at the cost of a dense
    gemm per vector). Same acceptance-table harness as X138. Sign
    rows are plan-time literals; each projected coordinate is one
    sequential zip_with fold, bit-identical to the oracle's
    list_dot_product, so the rounded cosine ranking can't drift
    cross-engine."""
    from pyspark import StorageLevel

    from gmall_spark import persist as _persist

    emb = _emb(spark, sf_dir)
    dim = _oracle_dim_check(spark, sf_dir)
    # bf (≤ 5·k rows) feeds both arms' left joins — persist it so the
    # full-width cross-join+window subtree runs once, not per arm (r13)
    bf = _persist.register(
        similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
        .select("query_id", "neighbor_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # plane row j is md5(f"jl:{j}:{d}") regardless of the projection
    # width, so the 16-dim projection IS the 32-dim one's prefix: one
    # persisted widest-projection pass serves every arm via slice
    # (3.7 -> ~2 s: the gemm-free fold runs once, not per arm)
    wide = max(JL_DIMS)
    proj_wide = _persist.register(
        emb.select("vec_id", *_jl_project_exprs(wide, dim))
        .select(
            "vec_id",
            F.array(*[F.col(f"p{j}") for j in range(wide)]).alias("embedding"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    arms = []
    for d in JL_DIMS:
        proj = (
            proj_wide
            if d == wide
            else proj_wide.select(
                "vec_id", F.slice("embedding", 1, d).alias("embedding")
            )
        )
        arm = similarity.brute_force_topk(
            proj, proj.filter(F.col("vec_id") < 5), k=10
        ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
        j = bf.join(F.broadcast(arm), ["query_id", "neighbor_id"], "left")
        arms.append(
            j.agg(
                F.lit(d).cast("bigint").alias("dims"),
                F.count(F.lit(1)).cast("bigint").alias("bf_pairs"),
                F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("hits"),
                F.round(
                    F.coalesce(F.sum("hit"), F.lit(0)) / F.count(F.lit(1)), 6
                ).alias("recall_at_10"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


# --- JL two-stage retrieval eval (X204) ---------------------------------------

JL_RERANK_DIM = 32
JL_RERANK_DEPTHS = (20, 50)


def _jl_rerank_oracle() -> str:
    from gmall_spark.ann_oracles import EMBED_DIM as _DIM

    exact_scored = f"""
  SELECT query_id, neighbor_id,
         round(SUM(qx * nx) / (sqrt(SUM(qx * qx)) * sqrt(SUM(nx * nx))), 6)
           AS cos_sim
  FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           unnest(q.embedding)::DOUBLE AS qx, unnest(c.embedding)::DOUBLE AS nx
    FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
    CROSS JOIN embeddings c WHERE q.vec_id <> c.vec_id
  ) GROUP BY query_id, neighbor_id
"""
    withs = [
        f"bf AS MATERIALIZED (SELECT query_id, neighbor_id FROM"
        f" ({_jl_bf_oracle(None, _DIM)}))",
        f"exact AS MATERIALIZED ({exact_scored})",
    ]
    arms = []
    for c in JL_RERANK_DEPTHS:
        withs.append(
            f"cand{c} AS (SELECT query_id, neighbor_id FROM"
            f" ({_jl_bf_oracle(JL_RERANK_DIM, _DIM, k=c)}))"
        )
        withs.append(
            f"""rr{c} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT d.query_id, d.neighbor_id,
           row_number() OVER (PARTITION BY d.query_id
                              ORDER BY e.cos_sim DESC, d.neighbor_id ASC)
             AS rank
    FROM cand{c} d JOIN exact e
      ON e.query_id = d.query_id AND e.neighbor_id = d.neighbor_id
  ) WHERE rank <= 10
)"""
        )
        arms.append(
            f"""SELECT CAST({c} AS BIGINT) AS cand_depth,
       CAST((SELECT count(*) FROM bf) AS BIGINT) AS bf_pairs,
       CAST((SELECT count(*) FROM bf JOIN rr{c} USING (query_id, neighbor_id))
            AS BIGINT) AS hits,
       round(CAST((SELECT count(*) FROM bf JOIN rr{c}
                   USING (query_id, neighbor_id)) AS DOUBLE)
             / (SELECT count(*) FROM bf), 6) AS recall_at_10"""
        )
    return "WITH " + ",\n".join(withs) + "\n" + "\nUNION ALL\n".join(arms)


@query("similarity_eval_jl_rerank", _jl_rerank_oracle())
def q_similarity_eval_jl_rerank(spark, sf_dir):
    """Two-stage retrieval eval over the JL projection (X204): X190's
    honest finding is that RAW 32-dim JL ranking recalls poorly; the
    standard production answer is candidate generation in the cheap
    projected space followed by EXACT full-width rerank of the top-C
    — this table says what recall each candidate depth buys, the
    acceptance report for a two-stage (filter-then-rerank) vector
    serving stack. Candidates come from the same persisted wide
    projection as X190 (prefix-slice discipline); the rerank scores
    ONLY C candidates per query with the registered exact-cosine
    shape. Scale: stage 1 scans d/64 of the bytes, stage 2 is
    O(C·queries) — the whole point of the architecture."""
    from pyspark import StorageLevel

    from gmall_spark import persist as _persist
    from gmall_spark.functions.vectors import cosine as _cos

    emb = _emb(spark, sf_dir)
    dim = _oracle_dim_check(spark, sf_dir)
    # bf (≤ 5·k rows) feeds both depth arms' left joins — persist it
    # so the full-width cross-join+window subtree runs once (r13)
    bf = _persist.register(
        similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
        .select("query_id", "neighbor_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    proj = _persist.register(
        emb.select("vec_id", *_jl_project_exprs(JL_RERANK_DIM, dim))
        .select(
            "vec_id",
            F.array(*[F.col(f"p{j}") for j in range(JL_RERANK_DIM)]).alias(
                "embedding"
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    qv = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nvec")
    )
    arms = []
    for c in JL_RERANK_DEPTHS:
        cand = similarity.brute_force_topk(
            proj, proj.filter(F.col("vec_id") < 5), k=c
        ).select("query_id", "neighbor_id")
        rerank = (
            cand.join(F.broadcast(qv), "query_id")
            .join(nv, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    _cos(
                        F.transform("qvec", lambda x: x.cast("double")),
                        F.transform("nvec", lambda x: x.cast("double")),
                    ),
                    6,
                ).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        rr = (
            rerank.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
        )
        j = bf.join(rr, ["query_id", "neighbor_id"], "left")
        arms.append(
            j.agg(
                F.lit(c).cast("bigint").alias("cand_depth"),
                F.count(F.lit(1)).cast("bigint").alias("bf_pairs"),
                F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("hits"),
                F.round(
                    F.coalesce(F.sum("hit"), F.lit(0)) / F.count(F.lit(1)), 6
                ).alias("recall_at_10"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


