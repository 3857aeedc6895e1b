"""Semantic (in-context) packing: order documents so RELATED docs
land in the same training row (X244-X245; VERDICT r10 item 1).

The in-context-pretraining data-prep step (Shi et al. 2023,
arXiv:2310.10638): instead of packing documents into fixed training
rows in random order, traverse the document similarity graph so each
row's members are mutual nearest neighbors — the model then sees
related context across doc boundaries inside one attention window.
Both halves already existed in the repo: the kNN edge fixture
(X67/X146, the shared GEMM build) and the sequence packer/offset
discipline (X175/X238). This module adds the deterministic ordering
pass between them and the affinity report that proves the order
earns its keep against the X128-style random epoch order.

Ordering (integer-exact tie rules, per IVF cluster):
  - start at the cluster's smallest vec_id;
  - repeatedly hop to the highest-similarity UNVISITED kNN
    out-neighbor of the current doc (round-6 cosine; ties broken by
    smaller vec_id);
  - when the current doc has no unvisited neighbor, jump to the
    smallest unvisited vec_id (chain restart).
Packing is next-fit along the chain (fill the current row until the
next doc would overflow SEQ_PACK_CAP, then open a new row) — unlike
FFD this PRESERVES chain adjacency, which is the entire point.

Scale: clusters come from the shared IVF k-means fixture, and K
grows with the corpus (the IVF/SemDeDup discipline), so per-cluster
work is bounded and clusters process in parallel — the chain walk is
one Arrow-batched applyInPandas over (cluster) groups reading each
doc's precollected neighbor list; the only shuffles are the
neighbor-list groupBy and the cluster groupBy. The walk is the one
genuinely sequential step (greedy traversal state), which is exactly
the case the repo's codec discipline reserves applyInPandas for.

The DuckDB oracle replays the identical walk as recursive CTEs whose
ENTIRE state rides LIST values (the repo's fold-state discipline):
the ordered remaining-member list, the current doc's out-edge list,
and the next-fit pack counters fold one step per recursion level,
with the pick a pure list expression (argmax-sim over candidates,
min-dst on ties, head-of-ordered-list fallback) — deliberately no
lateral scan and no correlated subquery, because that formulation
was observed intermittently nondeterministic under DuckDB's
multi-threaded scheduler (_walk_cte docstring), which a correctness
oracle cannot tolerate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_spark import fixtures_audit
from gmall_spark.operators import ivf
from gmall_spark.queries import query
from gmall_spark.queries_llm.ann_topk import PR_KNN_K
from gmall_spark.queries_llm.packing_release import SEQ_PACK_CAP, _PACK_LEN_SQL
from gmall_spark.queries_llm.prelude import (
    _docs,
    _emb,
    _knn_edges,
    _oracle_dim_check,
    _session_token,
    _trained_centroids,
)

_SEM_CHAIN: dict[tuple[str, str], DataFrame] = {}

_CHAIN_SCHEMA = (
    "list_id long, ordering string, chain_pos long, doc_id long, "
    "n_tok long, pack_row long, tok_start long, tok_end long"
)


def _walk_cluster(pdf):
    """Greedy nearest-neighbor chain + next-fit pack for ONE cluster,
    emitted under BOTH orderings (semantic chain and the md5 random
    epoch order) so the affinity report compares like with like.
    Bounded by the cluster size; all tie rules integer-exact."""
    import hashlib

    import pandas as pd

    ids = sorted(int(v) for v in pdf["vec_id"])
    ntok = {int(r.vec_id): int(r.n_tok) for r in pdf.itertuples()}
    nbrs: dict[int, dict[int, float]] = {}
    for r in pdf.itertuples():
        # Arrow hands a list<struct> column to pandas as a numpy
        # object array of dicts (None when the left join missed)
        arr = r.nbrs
        if arr is not None and len(arr) > 0:
            nbrs[int(r.vec_id)] = {
                int(e["dst"]): float(e["cos_sim"]) for e in arr
            }
    list_id = int(pdf["list_id"].iloc[0])

    def chain_semantic():
        # O(c^2) in cluster size c: every hop scans all unvisited
        # members for the argmin (most hops resolve through the
        # bounded kNN neighbor map, but the fallback/tie scan is
        # linear). Fine under the IVF discipline — K grows with the
        # corpus so clusters stay bounded — but if cluster caps ever
        # loosen, switch to a heap keyed on (-sim, id) per frontier.
        unvisited = set(ids)
        cur = ids[0]
        out = [cur]
        unvisited.discard(cur)
        while unvisited:
            sims = nbrs.get(cur, {})
            cur = min(unvisited, key=lambda v: (-sims.get(v, -2.0), v))
            out.append(cur)
            unvisited.discard(cur)
        return out

    def chain_random():
        return sorted(
            ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
        )

    rows = []
    for ordering, chain in (
        ("semantic", chain_semantic()),
        ("random", chain_random()),
    ):
        pack_row, fill = 0, 0
        for pos, vid in enumerate(chain, start=1):
            n = ntok[vid]
            if fill + n > SEQ_PACK_CAP and fill > 0:
                pack_row, fill = pack_row + 1, 0
            rows.append(
                (list_id, ordering, pos, vid, n, pack_row, fill, fill + n)
            )
            fill += n
    return pd.DataFrame(
        rows,
        columns=[
            "list_id",
            "ordering",
            "chain_pos",
            "doc_id",
            "n_tok",
            "pack_row",
            "tok_start",
            "tok_end",
        ],
    )


def chain_pack(
    docs: DataFrame,
    emb: DataFrame,
    centroids: list[list[float]],
    knn: DataFrame,
) -> DataFrame:
    """The X244 assembly as a PURE function of its four inputs
    (documents, embeddings, trained centroids, kNN edge table with
    cos_sim) — the registered query binds the shared fixtures; the
    streaming twin binds its merged stores. The chain table is a pure
    function of (cluster membership, member lengths, member
    out-edges), which is the invariant the twin's churn test pins."""
    idx = ivf.build_index(emb, centroids).select("vec_id", "list_id")
    lens = docs.selectExpr(
        "doc_id AS len_doc_id",
        rf"least(greatest(size(filter(split(text, '\\s+'),"
        rf" x -> x != '')), 1), {SEQ_PACK_CAP}) AS n_tok",
    )
    nbrs = knn.groupBy("src").agg(
        F.collect_list(F.struct("dst", "cos_sim")).alias("nbrs")
    )
    base = (
        idx.join(lens, idx["vec_id"] == lens["len_doc_id"])
        .drop("len_doc_id")
        .join(nbrs, idx["vec_id"] == nbrs["src"], "left")
        .drop("src")
    )
    return base.groupBy("list_id").applyInPandas(
        _walk_cluster, schema=_CHAIN_SCHEMA
    )


def _sem_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (session, sf_dir): the chained+packed table under both
    orderings — feeds the X244 packing query and the X245 affinity
    report (two consumers, one walk; the _LM_SCORES fixture
    lifecycle)."""
    key = (_session_token(spark), sf_dir)
    if key not in _SEM_CHAIN:
        with fixtures_audit.timed("sem_chain"):
            emb = _emb(spark, sf_dir)
            _oracle_dim_check(spark, sf_dir)
            _SEM_CHAIN[key] = chain_pack(
                _docs(spark, sf_dir),
                emb,
                _trained_centroids(spark, sf_dir),
                _knn_edges(spark, sf_dir, PR_KNN_K),
            ).localCheckpoint(eager=True)
    return _SEM_CHAIN[key]


# --- oracle ---------------------------------------------------------------


def _members_prefix() -> str:
    """Shared oracle prefix: the IVF assignment (idx), the exact kNN
    edge set with round-6 sims, clamped doc lengths, and the
    (cluster, doc, n_tok) member relation. The k-means CTE chain is
    the registered trainer's (ann_oracles._kmeans_ctes), re-headed
    WITH RECURSIVE so the walk CTEs can follow it."""
    from gmall_spark.ann_oracles import EMBED_DIM, _kmeans_ctes
    from gmall_spark.operators.ivf import IVF_ITERS, IVF_LISTS, IVF_SAMPLE

    km = _kmeans_ctes(IVF_LISTS, IVF_ITERS, IVF_SAMPLE, EMBED_DIM)
    head = "\nWITH e AS ("
    assert km.startswith(head)
    return (
        "\nWITH RECURSIVE e AS (" + km[len(head):]
        + f""", pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         unnest(a.embedding)::DOUBLE AS qx, unnest(b.embedding)::DOUBLE AS nx
  FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id
), pscored AS (
  SELECT src, dst,
         round(SUM(qx * nx) / (sqrt(SUM(qx * qx)) * sqrt(SUM(nx * nx))), 6)
           AS sim
  FROM pairs GROUP BY src, dst
), kedges AS MATERIALIZED (
  SELECT src, dst, sim
  FROM (SELECT *, row_number() OVER (PARTITION BY src
          ORDER BY sim DESC, dst ASC) AS rnk FROM pscored)
  WHERE rnk <= {PR_KNN_K}
), lens AS (
  SELECT doc_id, {_PACK_LEN_SQL} AS n_tok FROM documents
), members AS MATERIALIZED (
  SELECT i.list_id, i.vec_id, l.n_tok, COALESCE(ne.edges, []) AS edges
  FROM idx i
  JOIN lens l ON l.doc_id = i.vec_id
  LEFT JOIN (SELECT src, list(struct_pack(dst := dst, sim := sim)) AS edges
             FROM kedges GROUP BY src) ne ON ne.src = i.vec_id
), mem_s AS MATERIALIZED (
  SELECT list_id,
         list(struct_pack(vec_id := vec_id, n_tok := n_tok, edges := edges)
              ORDER BY vec_id) AS mem
  FROM members GROUP BY list_id
), mem_r AS MATERIALIZED (
  SELECT list_id,
         list(struct_pack(vec_id := vec_id, n_tok := n_tok, edges := edges)
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS mem
  FROM members GROUP BY list_id
)"""
    )


def _walk_cte(name: str, mem_cte: str, pick: str) -> str:
    """One recursive chain walk whose ENTIRE state rides list values
    (the repo's DuckDB fold-state discipline): remaining members as
    an ordered LIST of (vec_id, n_tok, edges) structs, the pick a
    pure list expression over it — no lateral table scan, no
    correlated subquery, so repeated evaluation of the CTE is
    bit-identical by construction (the first lateral+scalar-subquery
    formulation was observed to be intermittently nondeterministic
    under DuckDB's 32-thread scheduler, which a correctness oracle
    cannot tolerate). Emits one row per (cluster, step); next-fit
    pack state folds along."""
    cap = SEQ_PACK_CAP
    return f"""{name} AS (
  SELECT list_id, mem[1].vec_id AS last_v, mem[1].edges AS cur_edges,
         mem[2:] AS remaining,
         1 AS pos, 0 AS pack_row, mem[1].n_tok AS fill, mem[1].n_tok AS n_tok
  FROM {mem_cte}
  UNION ALL
  SELECT w.list_id, w.nxt.vec_id, w.nxt.edges,
         list_filter(w.remaining, m -> m.vec_id <> w.nxt.vec_id),
         w.pos + 1,
         CASE WHEN w.fill + w.nxt.n_tok > {cap} AND w.fill > 0
              THEN w.pack_row + 1 ELSE w.pack_row END,
         CASE WHEN w.fill + w.nxt.n_tok > {cap} AND w.fill > 0
              THEN w.nxt.n_tok ELSE w.fill + w.nxt.n_tok END,
         w.nxt.n_tok
  FROM (
    SELECT w2.*, {pick} AS nxt
    FROM (
      SELECT w3.*,
             list_filter(COALESCE(w3.cur_edges, []),
               c -> list_contains(
                 list_transform(w3.remaining, m -> m.vec_id), c.dst)) AS cands
      FROM {name} w3
      WHERE len(w3.remaining) > 0
    ) w2
  ) w
)"""


# semantic pick: the unvisited kNN out-neighbor of the current doc
# with the highest sim (min dst on ties); fallback = head of the
# vec_id-ordered remaining list (= smallest unvisited id). list_filter
# preserves order, so remaining[1] stays the rule's minimum forever.
_SEM_PICK = """CASE WHEN len(w2.cands) > 0 THEN
      list_filter(w2.remaining, m -> m.vec_id =
        list_min(list_transform(
          list_filter(w2.cands,
            c -> c.sim = list_max(list_transform(w2.cands, c2 -> c2.sim))),
          c -> c.dst)))[1]
    ELSE w2.remaining[1] END"""

# random pick: the md5 epoch order IS the mem_r list order
_RND_PICK = "w2.remaining[1]"


@query(
    "llm_semantic_packing",
    _members_prefix()
    + ", "
    + _walk_cte("walk", "mem_s", _SEM_PICK)
    + """
SELECT CAST(list_id AS BIGINT) AS list_id,
       CAST(pos AS BIGINT) AS chain_pos,
       CAST(last_v AS BIGINT) AS doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(pack_row AS BIGINT) AS pack_row,
       CAST(fill - n_tok AS BIGINT) AS tok_start,
       CAST(fill AS BIGINT) AS tok_end
FROM walk
""",
)
def q_llm_semantic_packing(spark, sf_dir):
    """Semantic in-context packing (X244): every embedded document's
    position in the greedy nearest-neighbor chain of its IVF
    cluster, its next-fit training row, and its [tok_start, tok_end)
    offsets inside that row (the X238 offset discipline over the
    chain order). The chain rule and its exact recursive-CTE twin
    are in the module docstring; the offsets satisfy the same
    contiguity/cap theorems as X238 (pinned in tests/test_llm_ops)."""
    return _sem_chain(spark, sf_dir).filter(
        F.col("ordering") == "semantic"
    ).select(
        "list_id",
        "chain_pos",
        "doc_id",
        "n_tok",
        "pack_row",
        "tok_start",
        "tok_end",
    )


@query(
    "llm_semantic_packing_affinity",
    _members_prefix()
    + ", "
    + _walk_cte("walk_s", "mem_s", _SEM_PICK)
    + ", "
    + _walk_cte("walk_r", "mem_r", _RND_PICK)
    + """
, ordrows AS (
  SELECT 'semantic' AS ordering, list_id, pos, last_v AS doc_id, pack_row
  FROM walk_s
  UNION ALL
  SELECT 'random' AS ordering, list_id, pos, last_v AS doc_id, pack_row
  FROM walk_r
), adj AS (
  SELECT a.ordering, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ordrows a
  JOIN ordrows b ON b.ordering = a.ordering AND b.list_id = a.list_id
             AND b.pos = a.pos + 1 AND b.pack_row = a.pack_row
), flagged AS (
  SELECT ordering,
         CASE WHEN EXISTS (SELECT 1 FROM kedges e
                           WHERE (e.src = doc_a AND e.dst = doc_b)
                              OR (e.src = doc_b AND e.dst = doc_a))
              THEN 1 ELSE 0 END AS is_knn
  FROM adj
)
SELECT o.ordering,
       (SELECT CAST(count(*) AS BIGINT) FROM ordrows b
        WHERE b.ordering = o.ordering) AS n_docs,
       (SELECT CAST(count(DISTINCT (list_id, pack_row)) AS BIGINT)
        FROM ordrows b WHERE b.ordering = o.ordering) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_adjacent,
       CAST(sum(is_knn) AS BIGINT) AS n_knn_adjacent,
       round(sum(is_knn) / CAST(count(*) AS DOUBLE), 6) AS affinity
FROM flagged f
JOIN (SELECT DISTINCT ordering FROM ordrows) o ON o.ordering = f.ordering
GROUP BY o.ordering
""",
)
def q_llm_semantic_packing_affinity(spark, sf_dir):
    """Within-row neighbor affinity report (X245): of the ADJACENT
    doc pairs that share a packed training row, what fraction are
    genuine kNN neighbors — under the X244 semantic chain versus the
    md5 random epoch order (the X128/X199 deterministic-shuffle
    discipline), both packed by the identical next-fit rule so the
    ONLY difference is the ordering. The gap is the measured value
    of in-context packing; a random-order affinity near the
    semantic one would honestly report the chain buys nothing.
    Scale: two window/lag passes over the chain table + one
    broadcast edge probe; the report is two rows."""
    ch = _sem_chain(spark, sf_dir)
    w = Window.partitionBy("ordering", "list_id").orderBy("chain_pos")
    adj = (
        ch.select(
            "ordering",
            "list_id",
            "pack_row",
            F.col("doc_id").alias("doc_a"),
            F.lead("doc_id").over(w).alias("doc_b"),
            F.lead("pack_row").over(w).alias("next_row"),
        )
        .filter(F.col("doc_b").isNotNull() & (F.col("next_row") == F.col("pack_row")))
        .select("ordering", "doc_a", "doc_b")
    )
    edges = _knn_edges(spark, sf_dir, PR_KNN_K).select("src", "dst")
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    flagged = adj.join(
        F.broadcast(sym.withColumn("is_knn", F.lit(1))),
        (adj["doc_a"] == sym["src"]) & (adj["doc_b"] == sym["dst"]),
        "left",
    ).select("ordering", F.coalesce("is_knn", F.lit(0)).alias("is_knn"))
    totals = ch.groupBy("ordering").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("list_id", "pack_row").cast("bigint").alias("n_rows"),
    )
    rep = flagged.groupBy("ordering").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_adjacent"),
        F.sum("is_knn").cast("bigint").alias("n_knn_adjacent"),
        F.round(
            F.sum("is_knn") / F.count(F.lit(1)).cast("double"), 6
        ).alias("affinity"),
    )
    return totals.join(rep, "ordering").select(
        "ordering",
        "n_docs",
        "n_rows",
        "n_adjacent",
        "n_knn_adjacent",
        "affinity",
    )


# --- interleaved multimodal sample assembly (X246) ----------------------------

# placeholder width every image occupies in a packed row (the
# fixed-resolution vision-encoder token count a multimodal collator
# reserves; 32 = an 8x8 patch grid at 2 tokens/patch — the constant is
# frozen so the oracle states the same arithmetic)
IMG_TOK = 32

# deterministic image-attach rule: every third document carries its
# image from the X135 corpus (the synth-closed-form discipline: the
# rate is stated, not sampled, so the oracle and the planted tests
# know exactly which docs interleave)
_HAS_IMG_SQL = "doc_id % 3 = 0"


def _interleave_oracle() -> str:
    from gmall_spark.queries_llm.packing_release import _ffd_pack_cte

    cap = SEQ_PACK_CAP
    lens = (
        f"SELECT doc_id, least({_PACK_LEN_SQL} + "
        f"CASE WHEN {_HAS_IMG_SQL} THEN {IMG_TOK} ELSE 0 END, {cap}) AS n_tok"
        " FROM documents"
    )
    return (
        _ffd_pack_cte(lens)
        + f"""
, pk AS (
  SELECT doc_id, n_tok, bucket_len, pack_no,
         sum(n_tok) OVER win2 - n_tok AS seq_start,
         CASE WHEN {_HAS_IMG_SQL} THEN 1 ELSE 0 END AS has_img
  FROM a
  WINDOW win2 AS (PARTITION BY bucket_len, pack_no
                  ORDER BY n_tok DESC, doc_id ASC)
), entries AS (
  SELECT doc_id, bucket_len, pack_no, 'image' AS kind,
         doc_id AS image_id, seq_start AS tok_start,
         seq_start + {IMG_TOK} AS tok_end
  FROM pk WHERE has_img = 1
  UNION ALL
  SELECT doc_id, bucket_len, pack_no, 'text' AS kind,
         NULL AS image_id, seq_start + has_img * {IMG_TOK} AS tok_start,
         seq_start + n_tok AS tok_end
  FROM pk
)
SELECT bucket_len::VARCHAR || '_' || pack_no::VARCHAR AS pack_id,
       CAST(row_number() OVER (PARTITION BY bucket_len, pack_no
                               ORDER BY tok_start) AS BIGINT) AS entry_idx,
       kind, doc_id, CAST(image_id AS BIGINT) AS image_id,
       CAST(tok_start AS BIGINT) AS tok_start,
       CAST(tok_end AS BIGINT) AS tok_end
FROM entries
"""
    )


@query("llm_multimodal_interleave", _interleave_oracle())
def q_llm_multimodal_interleave(spark, sf_dir):
    """Interleaved multimodal sample assembly (X246; VERDICT r10
    item 2) — the multimodal collator's input: packed training rows
    whose offset map carries BOTH text spans and image placeholders.
    Every third document attaches its X135-corpus image (image_id
    keys the blob store the codec tier reads); an attached image
    reserves IMG_TOK placeholder tokens IMMEDIATELY BEFORE its
    document's text span (caption order), and the X175 packer packs
    by each doc's TOTAL width (text + placeholder, clamped to the
    cap) so a row can never overflow once placeholders are real.
    Offsets are the X238 discipline — closed-form prefix sums inside
    one (pack_id)-keyed window, never a search over the concatenated
    row — and the per-row entry list is contiguous, non-overlapping,
    and cap-bounded BY CONSTRUCTION (theorems pinned in
    tests/test_incontext.py). Scale: the X175 bucket exchange + two
    pack_id-keyed windows; the image attach is a per-row modular
    predicate, zero joins."""
    cap = SEQ_PACK_CAP
    from gmall_spark.queries_llm.packing_release import pack_rows

    d = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        rf"least(greatest(size(filter(split(text, '\\s+'), x -> x != '')), 1)"
        rf" + CASE WHEN {_HAS_IMG_SQL} THEN {IMG_TOK} ELSE 0 END, {cap})"
        rf" AS n_tok",
    )
    # has_img is a pure function of doc_id, so it re-derives per row
    # on the far side of the packer — no join back, no second subtree
    # (an earlier join+union shape re-ran the whole pack pipeline per
    # entry kind: 8 exchanges instead of 4)
    win2 = Window.partitionBy("pack_id").orderBy(
        F.desc("n_tok"), F.asc("doc_id")
    )
    pk = pack_rows(d, cap).select(
        "doc_id",
        "pack_id",
        "n_tok",
        F.expr(f"CASE WHEN {_HAS_IMG_SQL} THEN 1 ELSE 0 END").alias("has_img"),
        (F.sum("n_tok").over(win2) - F.col("n_tok")).alias("seq_start"),
    )
    entry = F.struct(
        F.col("kind"), F.col("image_id"), F.col("tok_start"), F.col("tok_end")
    )
    img = F.struct(
        F.lit("image").alias("kind"),
        F.col("doc_id").cast("bigint").alias("image_id"),
        F.col("seq_start").cast("bigint").alias("tok_start"),
        (F.col("seq_start") + IMG_TOK).cast("bigint").alias("tok_end"),
    )
    txt = F.struct(
        F.lit("text").alias("kind"),
        F.lit(None).cast("bigint").alias("image_id"),
        (F.col("seq_start") + F.col("has_img") * IMG_TOK)
        .cast("bigint")
        .alias("tok_start"),
        (F.col("seq_start") + F.col("n_tok")).cast("bigint").alias("tok_end"),
    )
    entries = pk.select(
        "pack_id",
        "doc_id",
        F.explode(
            F.when(F.col("has_img") == 1, F.array(img, txt)).otherwise(
                F.array(txt)
            )
        ).alias("e"),
    )
    return entries.select(
        "pack_id",
        F.row_number()
        .over(Window.partitionBy("pack_id").orderBy("e.tok_start"))
        .cast("bigint")
        .alias("entry_idx"),
        F.col("e.kind").alias("kind"),
        "doc_id",
        F.col("e.image_id").alias("image_id"),
        F.col("e.tok_start").alias("tok_start"),
        F.col("e.tok_end").alias("tok_end"),
    )


# --- packing utilization trade-off report (X247) ------------------------------


def _utilization_oracle() -> str:
    from gmall_spark.queries_llm.packing_release import _ffd_pack_cte

    cap = SEQ_PACK_CAP
    ffd_lens = (
        f"SELECT d.doc_id, {_PACK_LEN_SQL} AS n_tok"
        " FROM documents d JOIN embeddings em ON em.vec_id = d.doc_id"
    )
    return (
        _members_prefix()
        + ", "
        + _walk_cte("walk", "mem_s", _SEM_PICK)
        + f"""
, sem AS (
  SELECT 'semantic_nextfit' AS packer,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT (list_id, pack_row)) AS BIGINT) AS n_rows,
         CAST(sum(n_tok) AS BIGINT) AS total_tok
  FROM walk
), ffd AS (
  SELECT 'ffd' AS packer,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT (bucket_len, pack_no)) AS BIGINT) AS n_rows,
         CAST(sum(n_tok) AS BIGINT) AS total_tok
  FROM (
    {_ffd_pack_cte(ffd_lens)}
    SELECT * FROM a
  )
)
SELECT packer, n_docs, n_rows, total_tok,
       round(total_tok / (n_rows * {cap}.0), 6) AS utilization
FROM (SELECT * FROM sem UNION ALL SELECT * FROM ffd)
"""
    )


@query("llm_semantic_packing_utilization", _utilization_oracle())
def q_llm_semantic_packing_utilization(spark, sf_dir):
    """Packing utilization trade-off report (X247): what preserving
    semantic adjacency COSTS in row efficiency — the X244 next-fit
    rows (cluster-local, chain-order-preserving) versus the X175 FFD
    packer over the IDENTICAL (doc, n_tok) multiset (the embedded
    corpus), each as (docs, rows, useful tokens, utilization =
    tokens / (rows x cap)). FFD reorders freely so it packs denser;
    the semantic packer pays rows for adjacency — the no-silent-caps
    discipline applied to the ordering itself: the X245 affinity gain
    and this utilization cost are BOTH first-class reports, so the
    in-context decision is made on stated numbers. One aggregate per
    packer; the FFD side replays the registered X175 closed form on
    the chain table's own lengths."""
    cap = SEQ_PACK_CAP
    from gmall_spark.queries_llm.packing_release import pack_rows

    sem_rows = _sem_chain(spark, sf_dir).filter(
        F.col("ordering") == "semantic"
    )
    sem = sem_rows.agg(
        F.lit("semantic_nextfit").alias("packer"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("list_id", "pack_row").cast("bigint").alias("n_rows"),
        F.sum("n_tok").cast("bigint").alias("total_tok"),
    )
    ffd = pack_rows(sem_rows.select("doc_id", "n_tok"), cap).agg(
        F.lit("ffd").alias("packer"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("pack_id").cast("bigint").alias("n_rows"),
        F.sum("n_tok").cast("bigint").alias("total_tok"),
    )
    return sem.unionByName(ffd).select(
        "packer",
        "n_docs",
        "n_rows",
        "total_tok",
        F.round(
            F.col("total_tok") / (F.col("n_rows") * F.lit(float(cap))), 6
        ).alias("utilization"),
    )


# --- long-context needle placement map (X248) ---------------------------------


@query(
    "llm_needle_eval_rows",
    _members_prefix()
    + ", "
    + _walk_cte("walk", "mem_s", _SEM_PICK)
    + """
, rows_g AS (
  SELECT list_id, pack_row,
         CAST(count(*) AS BIGINT) AS n_members,
         CAST(max(fill) AS BIGINT) AS row_tok,
         arg_min(last_v, md5(CAST(last_v AS VARCHAR))) AS needle_doc_id,
         CAST(arg_min(fill - n_tok, md5(CAST(last_v AS VARCHAR))) AS BIGINT)
           AS needle_tok_start,
         CAST(arg_min(fill, md5(CAST(last_v AS VARCHAR))) AS BIGINT)
           AS needle_tok_end
  FROM walk GROUP BY list_id, pack_row
)
SELECT CAST(g.list_id AS BIGINT) AS list_id,
       CAST(g.pack_row AS BIGINT) AS pack_row,
       g.n_members, g.row_tok,
       CAST(g.needle_doc_id AS BIGINT) AS needle_doc_id,
       g.needle_tok_start, g.needle_tok_end,
       round(g.needle_tok_start / CAST(g.row_tok AS DOUBLE), 6)
         AS needle_depth,
       md5(d.text) AS needle_text_md5
FROM rows_g g JOIN documents d ON d.doc_id = g.needle_doc_id
""",
)
def q_llm_needle_eval_rows(spark, sf_dir):
    """Long-context needle placement map (X248) — the data-prep half
    of a needle-in-a-haystack evaluation (Kamradt 2023; RULER, Hsieh
    et al. 2024 arXiv:2404.06654): for every packed training row, ONE
    member document is deterministically designated the needle
    (min-md5(doc_id), the repo's deterministic-'random' idiom) and
    emitted with its exact [tok_start, tok_end) placement, the row's
    total tokens, and the DEPTH FRACTION the NIAH grid sweeps —
    plus md5(needle text) so the harness can verify retrieval without
    re-reading the corpus. Composed entirely from the X244 chain
    table (offsets by construction, never by searching the packed
    row — the X238 discipline). Scale: one (cluster, row)-keyed
    aggregate over the chain checkpoint + a doc_id join for the
    answer key; rows are corpus/cap-bounded."""
    ch = _sem_chain(spark, sf_dir).filter(F.col("ordering") == "semantic")
    h = F.md5(F.col("doc_id").cast("string"))
    g = ch.groupBy("list_id", "pack_row").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max("tok_end").cast("bigint").alias("row_tok"),
        F.min_by("doc_id", h).cast("bigint").alias("needle_doc_id"),
        F.min_by("tok_start", h).cast("bigint").alias("needle_tok_start"),
        F.min_by("tok_end", h).cast("bigint").alias("needle_tok_end"),
    )
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("needle_doc_id"), F.md5("text").alias("needle_text_md5")
    )
    return g.join(docs, "needle_doc_id").select(
        "list_id",
        "pack_row",
        "n_members",
        "row_tok",
        "needle_doc_id",
        "needle_tok_start",
        "needle_tok_end",
        F.round(
            F.col("needle_tok_start") / F.col("row_tok").cast("double"), 6
        ).alias("needle_depth"),
        "needle_text_md5",
    )
