"""Near-duplicate detection for the training-data pipeline.

Four strategies, scale-ordered (SURVEY/BASELINE extension mandate):

- exact: hash-groupBy on a canonical text hash (one shuffle carrying
  only (hash, id) pairs after map-side partial dedup)
- n-gram Jaccard: word shingles -> shared-shingle equi-join ->
  intersection/union per pair. Exact but quadratic in docs-per-
  shingle; right when the shingle space is large vs the corpus.
- MinHash + LSH: k md5-min signatures -> banded bucket join. At
  100 TB this is the scale path: the bucket join only pairs docs
  sharing a band hash, so cost tracks true-duplicate density, not
  corpus size². Candidates are verified with exact Jaccard.
- SimHash: 16-bit fingerprint; hamming-close fingerprints flag
  near-dups (fingerprint equality used here; multi-probe at scale).

Everything is md5-based on purpose: engine-native hashes (Spark
murmur3, DuckDB's hash()) differ, so md5 keeps the DuckDB oracle
bit-identical. For production speed, swap HASH_FN to xxhash64 — the
operator shape is unchanged.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from gmall_spark import persist
from gmall_spark.functions.text import canonical_hash

NGRAM_N = 5
MINHASH_K = 16
LSH_BANDS = 4  # 4 bands x 4 rows

# Numeric MinHash family: each shingle is md5'd ONCE; lane i applies a
# 2-universal-style mix  (A_i*h1 + B_i*h2 + i) mod P  to the two 32-bit
# halves of the digest. P = largest prime < 2^32; the multipliers are
# deterministic 28-bit odd constants (derived from md5 of the lane
# index so any k works), keeping A*h1 + B*h2 + i far inside int64.
# Versus one md5 per (lane, shingle) this cuts the dominant expression
# cost of signing k-fold (k=16), and numeric mins beat string mins.
MINHASH_P = 4294967291


def _lane_const(tag: str, i: int) -> int:
    """Deterministic 28-bit odd multiplier for lane ``i`` (no RNG, so
    the Python-built oracle SQL bakes in identical literals)."""
    return int(hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:7], 16) | 1


def lane_expr_sql(i: int, h1: str = "h1", h2: str = "h2") -> str:
    """The lane-i mix as engine-portable SQL text over two bigint
    halves — shared verbatim by the Spark plan and the DuckDB oracle."""
    a, b = _lane_const("a", i), _lane_const("b", i)
    return f"({a} * {h1} + {b} * {h2} + {i}) % {MINHASH_P}"


def exact_dedup_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group ids by canonical text hash; keeper = min id per group."""
    return (
        docs.select(
            canonical_hash(F.col(text_col)).alias("text_hash"), F.col(id_col)
        )
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("doc_count"),
            F.min(id_col).cast("bigint").alias("keeper_id"),
        )
    )


def shingle_array(text_col: str, n: int = NGRAM_N) -> Column:
    """Distinct word n-gram shingles of a text column, as an array.

    Pure higher-order-function expression (split -> transform/slice ->
    array_distinct): computed per ROW with no exchange at all. The
    previous formulation (posexplode -> window lead -> distinct) cost
    two shuffles of every token before any real work; at 100 TB those
    were the dominant cost of every text-dedup pipeline.
    """
    return F.expr(
        f"""
        CASE WHEN size(split({text_col}, '\\\\s+')) >= {n}
             THEN array_distinct(transform(
                    sequence(1, size(split({text_col}, '\\\\s+')) - {n - 1}),
                    i -> concat_ws(' ', slice(split({text_col}, '\\\\s+'), i, {n}))))
             ELSE array()
        END
        """
    )


def word_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = NGRAM_N
) -> DataFrame:
    """Distinct (doc_id, shingle) rows — explode of ``shingle_array``
    (distinctness is per-document, established before the explode)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingle_array(text_col, n)).alias("shingle"),
    )


# Guard for the all-pairs oracle baselines (VERDICT r4 item 6): the
# shared-shingle join is quadratic in duplicate-dense corpora, so it
# must not silently run on a larger-than-intended input. Far above
# the driver's SFs (5k docs at sf0.1), far below anything production.
ALL_PAIRS_MAX_DOCS = 50_000


def _guard_all_pairs(n: int, bound: int | None, what: str, alternative: str) -> None:
    if bound is not None and n > bound:
        raise RuntimeError(
            f"{what}: corpus has {n} rows, above the all-pairs guard "
            f"({bound}). This operator is the quadratic oracle "
            f"baseline; at this size run {alternative} instead, or "
            "pass an explicit higher bound / None to force it."
        )


def jaccard_pairs(
    shingles: DataFrame,
    threshold: float,
    max_docs: int | None = ALL_PAIRS_MAX_DOCS,
) -> DataFrame:
    """Exact pairwise Jaccard over a (doc_id, shingle) relation.

    Shared-shingle equi-join -> per-pair intersection count; sizes
    broadcast back in. One shuffle on shingle, one on the pair key.

    Quadratic in duplicate density — this is the ORACLE BASELINE for
    :func:`minhash_lsh_dedup` (the banded 100 TB path); ``max_docs``
    refuses larger-than-intended corpora loudly (one extra count of
    the doc-size aggregate, trivial next to the join it guards).
    """
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if max_docs is not None:
        _guard_all_pairs(
            sizes.count(), max_docs, "jaccard_pairs", "minhash_lsh_dedup (X4)"
        )
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.col("inter").cast("bigint").alias("inter"), "jaccard")
    )


def minhash_signatures(shingles: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k-column MinHash signature from a (doc_id, shingle) relation:
    sig_i = min over shingles of the lane-i mix of md5(shingle).

    Shuffle-based alternative to :func:`minhash_signatures_from_array`
    (one exchange on doc_id, map-side partial mins) for inputs that
    are already exploded. Same hash family, identical signatures.
    """
    h1 = F.expr("cast(conv(substring(md5(shingle), 1, 8), 16, 10) as bigint)")
    h2 = F.expr("cast(conv(substring(md5(shingle), 9, 8), 16, 10) as bigint)")
    base = shingles.select("doc_id", h1.alias("h1"), h2.alias("h2"))
    aggs = [
        F.min(F.expr(lane_expr_sql(i))).alias(f"sig_{i}") for i in range(k)
    ]
    return base.groupBy("doc_id").agg(*aggs)


def minhash_signatures_from_array(
    docs_with_shingles: DataFrame, k: int = MINHASH_K, arr_col: str = "shingles"
) -> DataFrame:
    """MinHash signature computed per ROW from the shingle array.

    ``array_min(transform(...))`` replaces a groupBy aggregate: no
    exchange — the signature computation is embarrassingly parallel,
    so the first shuffle of the whole MinHash+LSH pipeline is the
    (tiny) band-bucket join, not the full shingle relation.

    Each shingle is hashed ONCE into two 32-bit halves (a projection
    the k lane transforms then reuse); the per-lane work is three
    int64 ops, not an md5. An earlier one-md5-per-lane variant spent
    k md5 calls per shingle — 16× the hashing — and its
    ``lambda s, i=i`` default-arg capture had arity 2, which PySpark's
    ``transform`` interprets as an (element, index) lambda; the index
    lambda-variable Column shadowed the default and was stringified
    into the literal with a session-global counter, making signatures
    valid-but-different hash families per plan build (the root cause
    of the r1 26/28-pair "AQE" flakiness).
    """
    hp = F.expr(
        f"transform({arr_col}, s -> named_struct("
        "'h1', cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint), "
        "'h2', cast(conv(substring(md5(s), 9, 8), 16, 10) as bigint)))"
    )
    base = docs_with_shingles.select("doc_id", hp.alias("__hp"))
    lanes = [
        F.array_min(
            F.expr(f"transform(__hp, p -> {lane_expr_sql(i, 'p.h1', 'p.h2')})")
        ).alias(f"sig_{i}")
        for i in range(k)
    ]
    return base.select("doc_id", *lanes)


# Opt-in bucket-width cap: buckets wider than this switch from
# all-pairs expansion (quadratic) to a chain-plus-skip layout
# (linear: hop-1 AND hop-2 links over the sorted ids, 2n-3 pairs).
# A band bucket only exceeds this when its members are near-identical
# (same band hash), so the links CONNECT the whole duplicate group
# for connected-components dedup (operators/components.py). A chain
# pair can still fail exact-Jaccard verification when only one band
# agrees; with the hop-2 links the verified subgraph survives any
# ISOLATED failed link (the group fragments only when two CONSECUTIVE
# members both fail against their neighbors — VERDICT r4 item 5;
# tests/test_llm_ops.py plants exactly the single-failure case).
# Residual loss is observable, not silent: capped_bucket_stats()
# reports which buckets were capped and how wide they were. The cap
# is OFF by default (ADVICE r3): the registered queries run uncapped,
# bit-matching their all-pairs oracles, and a boilerplate-heavy
# 100 TB corpus opts in explicitly.
DEFAULT_MAX_BUCKET = 1024

# i<j all-pairs expansion over a bucket's sorted member ids
_ALL_PAIRS_EXPR = (
    "flatten(transform(ids, (x, i) -> transform("
    "slice(ids, i + 2, size(ids) - i - 1), "
    "y -> named_struct('doc_a', x, 'doc_b', y))))"
)
# hop-1 + hop-2 links: (ids[i], ids[i+1]) and (ids[i], ids[i+2])
_CHAIN_SKIP_EXPR = (
    "concat("
    "transform(slice(ids, 1, size(ids) - 1), "
    "(x, i) -> named_struct('doc_a', x, 'doc_b', ids[i + 1])), "
    "transform(slice(ids, 1, size(ids) - 2), "
    "(x, i) -> named_struct('doc_a', x, 'doc_b', ids[i + 2])))"
)


def _bucket_pair_expr(max_bucket: int | None):
    """Pair-expansion expression over a bucket row's ``ids`` array:
    all-pairs, or chain+skip once the bucket exceeds ``max_bucket``."""
    if max_bucket is None:
        return F.expr(_ALL_PAIRS_EXPR)
    return F.expr(
        f"CASE WHEN size(ids) > {int(max_bucket)} THEN {_CHAIN_SKIP_EXPR} "
        f"ELSE {_ALL_PAIRS_EXPR} END"
    )


# Column memo (r14, guide §7.3 driver work): the banded explode
# column is a pure function of (bands, k) but cost ~300 py4j calls
# per build (bands × rows_per_band casts/lits/structs), 24 calls per
# bench run. Immutable expression tree, memoized per (applicationId,
# bands, k); no data cached.
_BAND_COLS: dict[tuple[str, int, int], Column] = {}


def band_signatures(
    signatures: DataFrame, bands: int = LSH_BANDS, k: int = MINHASH_K
) -> DataFrame:
    """(doc_id, band_idx, band_hash) rows from a k-column signature.

    ':'-joined decimal sigs via null-PROPAGATING concat (concat_ws
    would turn an all-null signature row into '' and bucket every
    shingle-less doc together); F.concat and DuckDB's || both return
    NULL when any sig is NULL, and the filter drops those. Shared by
    the batch candidate generation and the incremental (streaming)
    signature store.
    """
    ckey = (
        signatures.sparkSession.sparkContext.applicationId,
        bands,
        k,
    )
    ecol = _BAND_COLS.get(ckey)
    if ecol is None:
        rows_per_band = k // bands
        band_cols = []
        for bi in range(bands):
            parts: list[Column] = []
            for r in range(rows_per_band):
                if r:
                    parts.append(F.lit(":"))
                parts.append(
                    F.col(f"sig_{bi * rows_per_band + r}").cast("string")
                )
            band_cols.append(
                F.struct(
                    F.lit(bi).alias("band_idx"),
                    F.concat(*parts).alias("band_hash"),
                )
            )
        ecol = F.explode(F.array(*band_cols)).alias("b")
        _BAND_COLS[ckey] = ecol
    return (
        signatures.select("doc_id", ecol)
        .select(
            "doc_id",
            F.col("b.band_idx").alias("band_idx"),
            F.col("b.band_hash").alias("band_hash"),
        )
        .filter(F.col("band_hash").isNotNull())
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = LSH_BANDS,
    k: int = MINHASH_K,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signature and emit candidate pairs per band bucket.

    explode(bands) -> groupBy (band_idx, band_hash) collecting the
    sorted member ids -> per-row i<j pair expansion (array exprs) ->
    distinct. This is the 100 TB path: no all-pairs comparison ever
    happens, and pair count tracks duplicate density, not corpus².

    Deliberately NOT a self-join: grouping buckets costs ONE shuffle
    (the self-join shuffled both sides plus a distinct), and a
    banded-with-banded self-join returned silently wrong results
    under AQE stage reuse in a warmed Spark 4.1.2 session (26/28
    pairs) — the bucket-grouping lineage has a single exchange and no
    plan-reuse ambiguity. Bucket width is bounded by duplicate
    density; a boilerplate-heavy corpus that produces mega-buckets
    would want a size cap before the pair expansion.

    Null band hashes (docs shorter than one shingle) are dropped,
    matching the join semantics where NULL never equi-matches.

    ``max_bucket`` bounds the per-bucket expansion: buckets wider
    than it (a boilerplate-heavy corpus can put millions of
    near-identical docs in one band bucket — quadratic pairs) emit
    hop-1 + hop-2 links over the sorted ids instead (2n-3 pairs; an
    isolated verify-failed link no longer fragments the group — see
    DEFAULT_MAX_BUCKET). Off (``None``) by default so the output
    matches the uncapped all-pairs oracle exactly; pass e.g.
    ``DEFAULT_MAX_BUCKET`` at scale, and report the capped buckets
    with :func:`capped_bucket_stats` (no silent caps).
    """
    banded = band_signatures(signatures, bands, k)
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        buckets.select(F.explode(_bucket_pair_expr(max_bucket)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def capped_bucket_stats(
    signatures: DataFrame,
    bands: int = LSH_BANDS,
    k: int = MINHASH_K,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """(band_idx, band_hash, bucket_size) for every bucket the cap
    would switch to chain+skip expansion — the observability
    companion to ``max_bucket`` (log or sink this next to a capped
    run so the recall trade is recorded, never silent)."""
    banded = band_signatures(signatures, bands, k)
    return (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bucket_size"))
        .filter(F.col("bucket_size") > int(max_bucket))
    )


def jaccard_for_arrays(
    pairs: DataFrame, with_arr: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs against per-doc
    DISTINCT shingle arrays, via ``array_intersect``.

    The pair set joins twice against the corpus; no broadcast HINT —
    AQE converts each join to broadcast at runtime when the candidate
    side is actually small (the common case: candidates track
    duplicate density), but a duplicate-dense 100 TB corpus whose
    pair set exceeds broadcast limits degrades gracefully to a
    shuffle join instead of OOMing the driver. The intersection is
    one codegen'd array op per surviving pair; cost tracks
    |candidates| x shingles-per-doc, never corpus²."""
    va = with_arr.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("__arr_a"))
    vb = with_arr.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("__arr_b"))
    joined = pairs.join(va, "doc_a")
    joined = joined.join(vb, "doc_b")
    out = joined.select(
        "doc_a",
        "doc_b",
        F.size(F.array_intersect("__arr_a", "__arr_b")).cast("bigint").alias("inter"),
        F.size("__arr_a").alias("__sz_a"),
        F.size("__arr_b").alias("__sz_b"),
    ).withColumn(
        "jaccard",
        F.round(
            F.col("inter").cast("double")
            / (F.col("__sz_a") + F.col("__sz_b") - F.col("inter")).cast("double"),
            6,
        ),
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "inter", "jaccard"
    )


def jaccard_for_pairs(
    pairs: DataFrame, shingles: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard verification restricted to the given pairs.

    Cost tracks |candidates| x shingles-per-doc, never corpus² — this
    is what makes LSH the scale path.
    """
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shingles.select(
        F.col("doc_id").alias("doc_b_r"), F.col("shingle").alias("shingle_b")
    )
    inter = (
        pairs.join(sa, "doc_a")
        .join(
            sb,
            (F.col("doc_b") == F.col("doc_b_r"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.col("inter").cast("bigint").alias("inter"), "jaccard"
    )


SIMHASH_BITS = 16
SIMHASH_CHUNKS = 4  # pigeonhole: hamming <= chunks-1 -> some chunk equal


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    chunks: int = SIMHASH_CHUNKS,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs by hamming distance — the Manku et al.
    WWW'07 web-dedup algorithm: split the fingerprint into ``chunks``
    equal bit ranges; any pair within hamming ``chunks - 1`` must
    agree on at least one chunk (pigeonhole), so candidates come from
    per-(chunk_idx, chunk_value) buckets and are verified with one
    integer ``bit_count(xor)`` — no text ever re-read.

    Shape: per-row fingerprints (zero shuffles), ONE bucket-groupBy
    exchange, bounded i<j expansion (same no-self-join lineage as the
    MinHash LSH; ``max_bucket`` caps mega-buckets identically), then
    an integer verify against the (doc_id, simhash) relation — AQE
    broadcasts it when small. At 100 TB raise SIMHASH_BITS to 64 (the
    16-bit demo keeps the DuckDB oracle enumerable): bucket width
    tracks corpus / 2^(bits/chunks), so wider fingerprints keep the
    buckets sparse exactly as Manku's 64-bit tables do.
    """
    from gmall_spark.functions.text import simhash_fingerprints

    assert SIMHASH_BITS % chunks == 0
    bits_per = SIMHASH_BITS // chunks
    mask = (1 << bits_per) - 1
    fp = persist.register(
        simhash_fingerprints(docs, id_col, text_col)
        .select("doc_id", "simhash")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    chunk_structs = [
        F.struct(
            F.lit(i).alias("band_idx"),
            F.expr(f"(simhash >> {i * bits_per}) & {mask}").cast("string").alias(
                "band_hash"
            ),
        )
        for i in range(chunks)
    ]
    banded = fp.select(
        "doc_id", F.explode(F.array(*chunk_structs)).alias("b")
    ).select("doc_id", "b.band_idx", "b.band_hash")
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cand = (
        buckets.select(F.explode(_bucket_pair_expr(max_bucket)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("__fa"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("__fb"))
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn(
            "hamming", F.expr("bit_count(__fa ^ __fb)").cast("bigint")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def span_dedup_clean(
    docs: DataFrame,
    span_w: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style global span dedup as a TRANSFORM: the corpus-cleaning
    write path, not just a signal (Raffel et al. 2020 §2.2 dedup
    three-sentence spans corpus-wide keeping one occurrence; the
    span analog here is non-overlapping ``span_w``-word windows since
    the corpus has no sentence boundaries). A span's content is kept
    ONLY by its first occurrence in global (doc_id, span_idx) order;
    every later occurrence is dropped, and each document is
    reassembled from its kept spans.

    Returns (doc_id, n_spans, removed_spans, clean_md5) — the md5 of
    the reassembled text keeps the output compact and cross-engine
    hash-comparable; a production pipeline would emit the text.

    Scale shape: span extraction is a per-row HOF (zero shuffles);
    keep-first is ONE window over the span-hash partitioning (the
    only content-keyed exchange — boilerplate mega-spans make hot
    keys, which is a WindowGroupLimit-free single pass, not a join);
    reassembly is one doc_id shuffle. Corpus-linear, like the
    ExactSubstr signal (dedup_repeated_ngram_spans) whose REPORT this
    operator turns into the cleaned corpus.
    """
    flagged = span_rows(docs, span_w, id_col, text_col).withColumn(
        "kept", F.row_number().over(Window.partitionBy("h").orderBy(id_col, "idx")) == 1
    )
    return span_doc_rollup(flagged)


def span_rows(
    docs: DataFrame,
    span_w: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, idx, span, h): each doc's non-overlapping span_w-word
    windows with their md5 — the shared front of the batch and
    incremental span-clean passes. Pure per-row HOF, zero shuffles."""
    spans = F.expr(
        f"""
        transform(
          sequence(0, cast(ceil(size(split({text_col}, '\\\\s+')) / {span_w}.0) as int) - 1),
          i -> struct(i AS idx,
                      concat_ws(' ', slice(split({text_col}, '\\\\s+'),
                                           i * {span_w} + 1, {span_w})) AS span))
        """
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(spans).alias("s"))
        .select("doc_id", F.col("s.idx").alias("idx"), F.col("s.span").alias("span"))
        .withColumn("h", F.md5("span"))
    )


def span_doc_rollup(flagged: DataFrame) -> DataFrame:
    """Reassemble (doc_id, n_spans, removed_spans, clean_md5) from
    span rows carrying a boolean ``kept`` column — one doc_id
    shuffle."""
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum((~F.col("kept")).cast("int")).cast("bigint").alias(
                "removed_spans"
            ),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("kept"), F.struct("idx", "span"))
                            )
                        ),
                        lambda x: x["span"],
                    ),
                    " ",
                )
            ).alias("clean_md5"),
        )
    )


def simhash64_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """64-bit SimHash near-dup pairs — the production width of
    :func:`simhash_near_dup_pairs` (Manku et al. WWW'07 ran 64-bit
    tables; the 16-bit variant stays registered as the oracle-
    enumerable demo and the X98 harness measures the precision gap).

    Same pigeonhole shape: 4 chunks of 16 bits (two per 32-bit
    half), so any pair within hamming ``chunks - 1 = 3`` shares at
    least one chunk; candidates come from ONE bucket-groupBy
    exchange and verification is two integer ``bit_count(xor)``
    terms over the halves. Bucket width now tracks corpus / 2^16
    per chunk instead of corpus / 2^4 — the whole point at scale:
    buckets stay sparse, the i<j expansion stays near-linear.
    """
    from gmall_spark.functions.text import simhash64_fingerprints

    fp = persist.register(
        simhash64_fingerprints(docs, id_col, text_col)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    chunk_structs = [
        F.struct(
            F.lit(i).alias("band_idx"),
            F.expr(
                f"({'sim_lo' if i < 2 else 'sim_hi'} >> {(i % 2) * 16}) & 65535"
            ).cast("string").alias("band_hash"),
        )
        for i in range(4)
    ]
    banded = fp.select(
        "doc_id", F.explode(F.array(*chunk_structs)).alias("b")
    ).select("doc_id", "b.band_idx", "b.band_hash")
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cand = (
        buckets.select(F.explode(_bucket_pair_expr(max_bucket)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    fa = fp.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sim_lo").alias("__la"),
        F.col("sim_hi").alias("__ha"),
    )
    fb = fp.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sim_lo").alias("__lb"),
        F.col("sim_hi").alias("__hb"),
    )
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn(
            "hamming",
            F.expr("bit_count(__la ^ __lb) + bit_count(__ha ^ __hb)").cast("bigint"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


WINNOW_K = 3  # words per k-gram
WINNOW_W = 4  # k-gram hashes per winnowing window


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash selection, as in
    the MOSS plagiarism detector): hash every k-gram, slide a window
    of w consecutive hashes, keep the min of each window, emit the
    distinct selected hashes.

    Guarantees every shared substring of length >= k+w-1 words
    contributes a common fingerprint, while storing ~2/(w+1) of the
    k-gram hashes. Entirely per-row array expressions (split ->
    k-gram md5 transform -> sliding array_min -> array_distinct ->
    explode): ZERO shuffles — the previous window-function version
    shuffled and sorted every token twice.
    """
    gh = F.expr(
        f"""
        CASE WHEN size(__w) >= {k}
             THEN transform(sequence(1, size(__w) - {k - 1}),
                            i -> md5(concat_ws(' ', slice(__w, i, {k}))))
             ELSE array()
        END
        """
    )
    fps = F.expr(
        f"""
        CASE WHEN size(__gh) >= {w}
             THEN array_distinct(transform(sequence(1, size(__gh) - {w - 1}),
                                           j -> array_min(slice(__gh, j, {w}))))
             ELSE array()
        END
        """
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), r"\s+").alias("__w"),
        )
        .withColumn("__gh", gh)
        .select("doc_id", F.explode(fps).alias("fp"))
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = NGRAM_N,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    max_bucket: int | None = None,
) -> DataFrame:
    """Full MinHash+LSH pipeline: shingle -> sign -> band -> verify.

    Shingling is a per-row array expression, computed ONCE and
    persisted (memory-and-disk) because three downstream passes need
    it: the signature aggregate and the two verify joins. Signatures
    are a hash aggregate over the exploded shingles (explode is
    shuffle-free, the partial min combines map-side, so the exchange
    carries ONE row per doc per input partition — corpus size never
    shuffles). The groupBy formulation is deliberate: the per-row
    ``array_min(transform(...))`` lanes are interpreted (no codegen)
    and Catalyst's CollapseProject inlines the shared md5 projection
    into every lane, recomputing the digest k-fold — measured 5x
    slower end-to-end than this aggregate at sf0.1 (56 s vs 9 s cold).
    Verification broadcasts the tiny candidate set against the per-doc
    shingle arrays (``jaccard_for_arrays``), so the corpus is never
    shuffled at any stage of the pipeline. Call
    :func:`release_persisted` (or ``queries.clear_cache``) to free the
    cached shingle relation in a long-lived session.
    """
    with_arr = persist.register(
        docs.select(
            F.col(id_col).alias("doc_id"), shingle_array(text_col, n).alias("shingles")
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    sh = with_arr.select("doc_id", F.explode("shingles").alias("shingle"))
    sigs = minhash_signatures(sh, k)
    cand = lsh_candidate_pairs(sigs, bands, k, max_bucket)
    return jaccard_for_arrays(cand, with_arr, threshold)


def cross_corpus_near_dups(
    corpus: DataFrame,
    ref: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = NGRAM_N,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Near-dup DECONTAMINATION: probe ``corpus`` docs against a
    (small) reference set — held-out benchmarks, eval prompts, a
    previous dump — and emit (doc_id, ref_id, inter, jaccard) for
    every corpus doc whose shingle Jaccard with some reference doc
    meets ``threshold``. The n-gram-EXACT contamination check
    (queries_llm llm_contamination_check) catches verbatim overlap;
    this catches paraphrased/whitespace-mangled leakage the same way
    the in-corpus MinHash dedup catches near-dups.

    Scale shape: the corpus side is signed per-row and banded exactly
    like minhash_lsh_dedup (signature aggregate, map-side combined);
    the reference side is tiny, so its banded hashes BROADCAST into
    the candidate join — the corpus is never shuffled. Verification
    cost tracks candidate count.

    Id spaces of the two inputs must be disjoint (the verification
    unions their shingle tables on doc_id).
    """

    def _prep(df):
        arr = persist.register(
            df.select(
                F.col(id_col).alias("doc_id"),
                shingle_array(text_col, n).alias("shingles"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
        )
        sh = arr.select("doc_id", F.explode("shingles").alias("shingle"))
        return arr, band_signatures(minhash_signatures(sh, k), bands, k)

    corpus_arr, corpus_banded = _prep(corpus)
    ref_arr, ref_banded = _prep(ref)
    cand = (
        corpus_banded.join(
            F.broadcast(
                ref_banded.select(
                    F.col("doc_id").alias("doc_b"), "band_idx", "band_hash"
                )
            ),
            ["band_idx", "band_hash"],
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    # verify against the persisted per-doc shingle ARRAYS (broadcast
    # candidate joins + one array_intersect per pair) — the
    # jaccard_for_pairs form re-shuffled the corpus-sized exploded
    # shingle relation on the verify key, which made this the single
    # most expensive plan inside the curation compositions (~8 s at
    # sf0.1 vs ~1.3 s for the self-dedup pipeline this now mirrors)
    verified = jaccard_for_arrays(
        cand, corpus_arr.unionByName(ref_arr), threshold
    )
    return verified.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("ref_id"),
        "inter",
        "jaccard",
    )


BOILER_DOC_FREQ = 3


def boilerplate_span_clean(
    docs: DataFrame,
    span_w: int = 10,
    min_doc_freq: int = BOILER_DOC_FREQ,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate removal by CORPUS frequency
    (Wenzek et al. 2020 §3.1 hashed-paragraph dedup; Penedo et al.
    2023 line-wise filtering): a span whose content occurs in >=
    ``min_doc_freq`` DISTINCT documents is boilerplate and is removed
    from EVERY document — including the first occurrence, which is
    the semantic difference from :func:`span_dedup_clean` (C4
    keep-first: one copy survives). Headers, footers, cookie banners
    repeat across many pages; no single copy is canonical.

    Returns (doc_id, n_spans, removed_spans, clean_md5) — the same
    rollup schema as the keep-first transform so the two cleaning
    policies are directly comparable.

    Scale shape: span extraction is a per-row HOF (zero shuffles);
    the doc-frequency pass is ONE span-hash shuffle whose partials
    combine map-side (count_distinct over (h, doc_id)); the frequent
    set is tiny by construction — boilerplate is few DISTINCT strings
    repeated massively — so it broadcasts back over the span rows
    (no second content-keyed exchange, unlike keep-first's window);
    reassembly is one doc_id shuffle. Corpus-linear.
    """
    spans = span_rows(docs, span_w, id_col, text_col)
    boiler = (
        spans.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("dfreq"))
        .filter(F.col("dfreq") >= min_doc_freq)
        .select("h", F.lit(True).alias("is_boiler"))
    )
    flagged = spans.join(F.broadcast(boiler), "h", "left").withColumn(
        "kept", F.col("is_boiler").isNull()
    )
    return span_doc_rollup(flagged.drop("is_boiler"))


# Rare-shingle blocking bounds: candidates come only from shingles
# shared by 2..max_df documents, so each blocking shingle contributes
# at most max_df*(max_df-1)/2 pairs — the candidate set is linear in
# the number of rare shared shingles, never corpus².
CONTAIN_MAX_DF = 5
# containment >= 4/5, compared integer-exactly (den*inter >= num*min_sz)
CONTAIN_NUM = 4
CONTAIN_DEN = 5


def containment_pairs_rare_blocking(
    docs: DataFrame,
    n: int = NGRAM_N,
    max_df: int = CONTAIN_MAX_DF,
    num: int = CONTAIN_NUM,
    den: int = CONTAIN_DEN,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Asymmetric near-duplicate CONTAINMENT pairs (Broder 1997 §4:
    containment(A,B) = |A∩B| / min(|A|,|B|)) via rare-shingle
    blocking. A short document quoted inside a long one has high
    containment but LOW Jaccard, so MinHash-LSH — whose band
    collision probability tracks Jaccard — structurally misses it;
    this is the complementary detector for subset/quote duplication.

    Candidates: pairs sharing at least one shingle whose corpus
    document-frequency is in [2, ``max_df``] (entity-resolution-style
    rare-token blocking). Rare shingles are discriminative — any two
    docs sharing one are worth verifying — and the df cap bounds the
    self-join fanout to max_df²/2 pairs per blocking shingle, keeping
    candidate volume linear in corpus size. Verification computes the
    EXACT intersection on candidates only, with the keep test done in
    integer arithmetic (den*inter >= num*min_sz) so the oracle
    comparison never touches float rounding.

    Returns (doc_a, doc_b, inter, containment, jaccard) — jaccard is
    reported alongside to show the asymmetry the pair was caught by.

    Scale shape: one shingle-hash shuffle for document frequencies
    (map-side combine), one bounded self-join on the rare postings,
    exact verify bounded by |candidates| x shingles-per-doc. The df
    cap is the knob: at 100 TB raise it only with a per-shingle
    pair budget, exactly like the capped LSH buckets (X4).

    The distinct (doc_id, shingle) relation feeds six consumers
    (document frequencies, postings x2, verify x2, sizes), so it is
    computed once and persisted — the same pattern as
    :func:`minhash_lsh_dedup`'s shingle arrays; ``clear_cache()``
    frees it in long-lived sessions.
    """
    sh = persist.register(
        word_shingles(docs, id_col, text_col, n).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    return containment_pairs_from_shingles(sh, max_df=max_df, num=num, den=den)


def containment_pairs_from_shingles(
    sh: DataFrame,
    max_df: int = CONTAIN_MAX_DF,
    num: int = CONTAIN_NUM,
    den: int = CONTAIN_DEN,
) -> DataFrame:
    """The blocking + verify core of
    :func:`containment_pairs_rare_blocking`, over an already-built
    distinct ``(doc_id, shingle)`` relation — shared by the batch
    front door (which builds + persists the shingles) and the
    incremental twin (which reads them from the append-only postings
    store, so two-batch == one-batch by construction)."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
        .select("shingle")
    )
    postings = sh.join(rare, "shingle")
    a = postings.alias("a")
    b = postings.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(
        F.col("doc_id").alias("doc_b_r"), F.col("shingle").alias("shingle_b")
    )
    inter = (
        cand.join(sa, "doc_a")
        .join(
            sb,
            (F.col("doc_b") == F.col("doc_b_r"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")),
            "doc_b",
        )
        .filter(
            F.lit(den) * F.col("inter") >= F.lit(num) * F.least("sz_a", "sz_b")
        )
    )
    return out.select(
        "doc_a",
        "doc_b",
        F.col("inter").cast("bigint").alias("inter"),
        F.col("sz_a").cast("bigint").alias("sz_a"),
        F.col("sz_b").cast("bigint").alias("sz_b"),
        F.round(
            F.col("inter").cast("double") / F.least("sz_a", "sz_b").cast("double"),
            6,
        ).alias("containment"),
        F.round(
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
            6,
        ).alias("jaccard"),
    )


def release_persisted() -> None:
    """Back-compat alias for :func:`gmall_spark.persist.release_all`."""
    persist.release_all()
