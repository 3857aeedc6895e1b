"""Packing + release families: image perceptual hashing, l-diversity gate, length-bucket padding, FFD sequence packing, gibberish scoring, curation funnel/fingerprint, duplicate attribution, split leakage, curation v4 manifest, embedding health.

Split from queries_llm.py (r11) verbatim; registry semantics
unchanged — every @query body and oracle string is byte-identical
to the monolith it moved from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from gmall_spark.operators import (
    multimodal,
)
from gmall_spark import fixtures_audit
from gmall_spark.queries import _t, query
from gmall_spark.operators import unigram as _uni
from gmall_spark.queries import ORACLES as _OR
from gmall_spark.queries_llm.prelude import (
    SQL_MINHASH,
    _CURATION_V4,
    _SQL_GROUP_CTES,
    _docs,
    _emb,
    _session_token,
    _transitive_groups,
)
from gmall_spark.queries_llm.curation import (
    q_llm_corpus_curation,
    q_llm_corpus_curation_v2,
    q_llm_corpus_curation_v3,
)
from gmall_spark.queries_llm.tok_frozen import (
    q_llm_unigram_encode_frozen,
)

# --- image perceptual hashing (X135/X136) ---------------------------------


@query(
    "multimodal_image_ahash",
    """
WITH q AS (SELECT doc_id, doc_id % 64 AS q FROM documents),
rws AS (SELECT doc_id, q, unnest(range(0, 8)) AS r FROM q),
byt AS (
  SELECT doc_id, q, r,
         CASE WHEN q - 8*r <= 0 THEN 0
              WHEN q - 8*r >= 8 THEN 255
              ELSE 256 - (1 << (8 - (q - 8*r))) END AS bv
  FROM rws
)
SELECT doc_id,
       CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       round(q * 255.0 / 64, 6) AS gray_mean,
       string_agg(printf('%02x', bv), '' ORDER BY r) AS ahash_hex
FROM byt GROUP BY doc_id, q
""",
)
def q_multimodal_image_ahash(spark, sf_dir):
    """Image average-hash end to end (X135): a deterministic synthetic
    BMP corpus (8x8 grayscale, first doc_id%64 pixels white in
    top-down row-major order, REAL bottom-up 24-bit encoding) rides
    the genuine codec path — encode -> _parse_bmp -> grayscale ->
    aHash (bit = gray > grid mean, MSB-first row bytes) — and the
    oracle states the CLOSED FORM the round trip must reproduce: the
    hash is the q-bit prefix mask (row byte = 256 - 2^(8-k) for the
    k white pixels the row holds), gray_mean = 255q/64 exactly
    (dyadic — bit-identical cross-engine). A flip/stride/threshold
    bug anywhere in the path breaks the hash
    (operators/multimodal.image_hashes)."""
    blobs = multimodal.synth_bmp_blobs(_docs(spark, sf_dir), mode="fill")
    return multimodal.image_hashes(blobs).select(
        "doc_id", "width", "height", "gray_mean", "ahash_hex"
    )


def _image_dhash_oracle() -> str:
    """Oracle twin of q_dedup_image_dhash_groups: the 97 seed-class
    dHashes computed CLOSED-FORM in pure Python (straight from the
    md5 gray formula — never through the BMP codec the Spark side
    must round-trip), group structure stated analytically (same seed
    => identical fingerprint; min cross-seed Hamming is 16, so no
    near pair survives max_hamming=2)."""
    import hashlib

    def hex_for(seed: int) -> str:
        out = []
        for r in range(8):
            byte = 0
            for x in range(8):
                g0 = hashlib.md5(f"{seed}:{x}:{r}".encode()).digest()[0]
                g1 = hashlib.md5(f"{seed}:{x + 1}:{r}".encode()).digest()[0]
                byte = (byte << 1) | (1 if g1 > g0 else 0)
            out.append(byte)
        return "".join(f"{v:02x}" for v in out)

    values = ",".join(f"({s},'{hex_for(s)}')" for s in range(97))
    return f"""
WITH fp(seed, dhash_hex) AS (VALUES {values}),
g AS (SELECT doc_id, doc_id % 97 AS seed FROM documents),
r AS (SELECT seed, min(doc_id) AS rep_id, count(*) AS group_size
      FROM g GROUP BY seed)
SELECT g.doc_id, fp.dhash_hex,
       CAST(r.rep_id AS BIGINT) AS rep_id,
       CAST(r.group_size AS BIGINT) AS group_size
FROM g JOIN r USING (seed) JOIN fp USING (seed)
"""


@query("dedup_image_dhash_groups", _image_dhash_oracle())
def q_dedup_image_dhash_groups(spark, sf_dir):
    """Perceptual-hash image near-dup grouping (X136), the image twin
    of the SimHash text tier: the seeded synthetic BMP corpus (9x8,
    md5-gray pixels, 97 seed classes, stride-padding path) rides
    encode -> REAL decode -> dHash -> exact-tier groupBy on the
    fingerprint -> 16-bit banding over DISTINCT fingerprints ->
    JVM-side Hamming verify (bit_count over xor). Scale shape: the
    quadratic term is bounded by distinct IMAGES per band value, not
    documents — identical re-encodes never reach a join
    (operators/multimodal.image_near_dup_groups)."""
    blobs = multimodal.synth_bmp_blobs(_docs(spark, sf_dir), mode="seeded")
    return multimodal.image_near_dup_groups(
        multimodal.image_hashes(blobs), max_hamming=2
    )


def _image_phash_oracle() -> str:
    """Oracle twin of q_dedup_image_phash_groups: each of the 29
    classes' 64-bit DCT sign hashes stated CLOSED-FORM straight from
    the planted sign formula (multimodal.phash_hex_for_class — never
    through the codec/DCT the Spark side must round-trip; amplitude
    24 vs a worst-case quantization error ~13 keeps every sign
    stable, measured min margin 23.1). Groups are the class
    partition: all three variants (base, brightness +24, 2x upscale)
    hash bit-identically, and the min cross-class Hamming is 20, so
    nothing else survives max_hamming = 2."""
    values = ",".join(
        f"({c},'{multimodal.phash_hex_for_class(c)}')"
        for c in range(multimodal.PHASH_CLASSES)
    )
    return f"""
WITH fp(cls, phash_hex) AS (VALUES {values}),
g AS (SELECT doc_id, doc_id % {multimodal.PHASH_CLASSES} AS cls FROM documents),
r AS (SELECT cls, min(doc_id) AS rep_id, count(*) AS group_size
      FROM g GROUP BY cls)
SELECT g.doc_id, fp.phash_hex,
       CAST(r.rep_id AS BIGINT) AS rep_id,
       CAST(r.group_size AS BIGINT) AS group_size
FROM g JOIN r USING (cls) JOIN fp USING (cls)
"""


@query("dedup_image_phash_groups", _image_phash_oracle())
def q_dedup_image_phash_groups(spark, sf_dir):
    """DCT perceptual-hash near-dup grouping (X177, VERDICT r7 item
    7) — the tier above aHash/dHash (X135/X136): pixel-domain hashes
    are blind to geometry, so the corpus plants exactly the variants
    they miss — per class, a base 32x32 image built FROM planted DCT
    basis signs, a brightness-shifted copy (+24: only the EXCLUDED DC
    coefficient moves) and a 2x block-replicated upscale (the
    block-mean canvas normalization recovers the base pixels exactly,
    while dHash reads a completely different top-left pixel grid).
    The chain is encode -> REAL BMP decode -> float64 block-mean
    downscale -> 2-D DCT-II -> sign of the 8x8 low-frequency block ->
    the X136 exact-tier/4-band grouping unchanged (same 8-byte
    layout). X141's discipline makes it oracle-checkable: planted
    amplitude 24 against a worst-case uint8-quantization coefficient
    error bound keeps every sign provably stable, so the oracle
    states each class's hash in closed form
    (operators/multimodal.image_phash, synth_phash_bmp_blobs)."""
    blobs = multimodal.synth_phash_bmp_blobs(_docs(spark, sf_dir))
    return multimodal.image_phash_near_dup_groups(
        multimodal.image_phash(blobs), max_hamming=2
    )


# --- l-diversity release gate (X142) ----------------------------------------

L_DIVERSITY = 3


@query(
    "events_l_diversity",
    f"""
SELECT event_type,
       CAST(extract(hour FROM ts) AS BIGINT) AS hr,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT CAST(floor(value / 100) AS BIGINT)) AS BIGINT)
         AS distinct_sensitive
FROM events
GROUP BY 1, 2
HAVING count(DISTINCT CAST(floor(value / 100) AS BIGINT)) < {L_DIVERSITY}
""",
)
def q_events_l_diversity(spark, sf_dir):
    """l-diversity release gate (X142; Machanavajjhala et al. 2007) —
    the attack k-anonymity misses: a quasi-identifier class can hold
    many rows (k-anonymous) yet expose everyone in it if they all
    share ONE sensitive value. Same QI grid as X131 minus the value
    bucket, which is now the SENSITIVE attribute: report every
    (event_type, hour) class carrying fewer than L distinct value
    buckets — a release coarsens or suppresses exactly these. ONE
    hash aggregate (the distinct rides the same exchange as a partial
    Expand); output bounded by the QI grid, not the corpus."""
    e = _t(spark, sf_dir, "events")
    b = F.floor(F.col("value") / 100).cast("bigint")
    return (
        e.groupBy("event_type", F.hour("ts").cast("bigint").alias("hr"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct(b).cast("bigint").alias("distinct_sensitive"),
        )
        .filter(F.col("distinct_sensitive") < L_DIVERSITY)
    )


# --- length-bucketed batching padding report (X143) --------------------------


@query(
    "llm_length_bucket_padding",
    r"""
WITH lens AS (
  SELECT greatest(len(list_filter(string_split_regex(text, '\s+'),
                                  x -> x <> '')), 1) AS n
  FROM documents
), bucketed AS (
  SELECT ((n + 63) // 64) * 64 AS bucket_len, n FROM lens
)
SELECT CAST(bucket_len AS BIGINT) AS bucket_len,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS sum_tokens,
       CAST(count(*) * bucket_len AS BIGINT) AS padded_tokens,
       round(1.0 - sum(n) * 1.0 / (count(*) * bucket_len), 6) AS waste_frac
FROM bucketed GROUP BY bucket_len
""",
)
def q_llm_length_bucket_padding(spark, sf_dir):
    """Length-bucketed batching padding report (X143): documents
    batch by 64-token length buckets (every sequence pads to its
    bucket cap), and the table says what fraction of the compute each
    bucket wastes on pad tokens — the serving/training-efficiency
    twin of the X26 packing pass (packing eliminates padding by
    concatenation; bucketing keeps document boundaries and pays the
    reported waste; padding to the single corpus max is the
    degenerate one-bucket case). Empty docs occupy one slot
    (greatest(n,1)); all arithmetic integer-exact, one hash aggregate
    bounded by the bucket grid."""
    return (
        _docs(spark, sf_dir)
        .selectExpr(
            r"greatest(size(filter(split(text, '\\s+'), x -> x != '')), 1)"
            " AS n"
        )
        .selectExpr("((n + 63) div 64) * 64 AS bucket_len", "n")
        .groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("sum_tokens"),
            (F.count(F.lit(1)) * F.col("bucket_len"))
            .cast("bigint")
            .alias("padded_tokens"),
            F.round(
                1.0
                - F.sum("n") * 1.0 / (F.count(F.lit(1)) * F.col("bucket_len")),
                6,
            ).alias("waste_frac"),
        )
        .select(
            F.col("bucket_len").cast("bigint").alias("bucket_len"),
            "n_docs",
            "sum_tokens",
            "padded_tokens",
            "waste_frac",
        )
    )


# --- fixed-row sequence packing (X175) ---------------------------------------

SEQ_PACK_CAP = 2048

# token-length expression shared by the packing oracles: whitespace
# words clamped to [1, cap]
_PACK_LEN_SQL = (
    r"least(greatest(len(list_filter(string_split_regex(text, '\s+'),"
    rf" x -> x <> '')), 1), {SEQ_PACK_CAP})"
)


def _ffd_pack_cte(lens_cte: str) -> str:
    """The X175 FFD assignment CTE chain (ending at ``a``) over
    ``lens_cte``, a CTE body producing (doc_id, n_tok) with n_tok in
    [1, cap] — parameterized so compositions (X188 curation v4, X238
    boundaries) replay the identical packer; callers write the final
    SELECT."""
    cap = SEQ_PACK_CAP
    return f"""
WITH lens AS ({lens_cte}), b AS (
  SELECT doc_id, n_tok, ((n_tok + 63) // 64) * 64 AS bucket_len FROM lens
), w AS (
  SELECT doc_id, n_tok, bucket_len,
         row_number() OVER win AS rn,
         sum(n_tok) OVER win - n_tok AS start_tok,
         count(*) OVER (PARTITION BY bucket_len) AS cnt,
         sum(n_tok) OVER (PARTITION BY bucket_len) AS btot
  FROM b
  WINDOW win AS (PARTITION BY bucket_len ORDER BY n_tok DESC, doc_id ASC)
), m AS (
  SELECT *,
         {cap} - bucket_len + 1 AS cp,
         {cap} // bucket_len AS slots
  FROM w
), a AS (
  SELECT doc_id, n_tok, bucket_len,
         CASE WHEN (cnt + slots - 1) // slots
                   <= (btot + cp - 1) // cp
              THEN (rn - 1) // slots
              ELSE start_tok // cp END AS pack_no
  FROM m
)"""


def _ffd_pack_oracle(lens_cte: str) -> str:
    """The X175 packed table: the CTE chain plus its standard final
    SELECT."""
    return (
        _ffd_pack_cte(lens_cte)
        + """
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(bucket_len AS BIGINT) AS bucket_len,
       bucket_len::VARCHAR || '_' || pack_no::VARCHAR AS pack_id,
       CAST(sum(n_tok) OVER (PARTITION BY bucket_len, pack_no) AS BIGINT)
         AS pack_fill
FROM a
"""
    )


@query(
    "llm_sequence_packing_ffd",
    _ffd_pack_oracle(f"SELECT doc_id, {_PACK_LEN_SQL} AS n_tok FROM documents"),
)
def q_llm_sequence_packing_ffd(spark, sf_dir):
    """Fixed-row sequence packing (X175, VERDICT r7 item 5): the
    executable companion of the X143 padding report — assign every
    (truncated-to-cap) document to a {SEQ_PACK_CAP}-token training
    row, the packed table a pretraining loader actually consumes
    (docs in one row are concatenated under an attention mask, so a
    row's cost is the cap and its useful tokens are pack_fill).

    Deterministic closed form, no sequential bin state (the X146
    pairing idiom taken one step further): within each 64-token
    length bucket, docs sort (n_tok desc, doc_id) and the bucket
    picks whichever of two assignment rules yields fewer packs —
    - slot: pack = (rn-1) div (cap div bucket_len) — exactly fits
      the worst case, best for LARGE buckets (2 x <=1024 always
      fits);
    - cumsum-chop: pack = exclusive-prefix-sum div (cap - bucket_len
      + 1) — consecutive docs chopped at the largest boundary that
      PROVABLY respects the cap (a pack's sum is at most the chop
      width plus one straddling doc < bucket_len), best for SMALL
      buckets where actual sums pack ~cap/bucket-fold denser than
      slots.
    Both rules are pure window arithmetic: one shuffle on
    bucket_len, integer-exact everywhere, and the cap is a THEOREM
    of the assignment (property-tested vs a Python reference packer
    and hypothesis-random lengths), not a hope. Measured utilization
    0.88-0.91 vs the X143 bucketed-padding bound 0.61 on the driver
    corpus (gated in-suite); exact greedy would reach ~0.95 but
    needs sequential bin state — the closed form keeps the planner
    one degenerate-free SQL statement at any scale."""
    cap = SEQ_PACK_CAP
    d = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        rf"least(greatest(size(filter(split(text, '\\s+'), x -> x != '')), 1),"
        rf" {cap}) AS n_tok",
    )
    return pack_rows(d, cap)


def _unigram_pack_lens_sql() -> str:
    """(doc_id, n_tok) under the FROZEN unigram tokenizer — the real
    per-doc piece counts from the registered X194 oracle text, clamped
    to [1, cap] (zero-word docs pack as 1 token, never vanish from the
    manifest)."""
    return (
        f"SELECT doc_id, least(greatest(n_pieces, 1), {SEQ_PACK_CAP}) AS n_tok"
        f" FROM ({_uni.encode_oracle_sql()}) enc"
    )


@query(
    "llm_sequence_packing_unigram",
    None,  # oracle attached below (composes the X175 CTE chain)
)
def q_llm_sequence_packing_unigram(spark, sf_dir):
    """Tokenizer-aware sequence packing (X201): the X175 FFD packer
    driven by the REAL frozen-unigram piece counts (X194) instead of
    the whitespace proxy — what a loader actually packs once a
    tokenizer is chosen; whitespace lengths undercount fragmenting
    tokenizers and a cap-fit by proxy can overflow the real row. Pure
    composition of registered stages (the X188 discipline): the lens
    relation is the X194 encode output clamped to [1, cap]
    (zero-word docs pack as 1 token, never dropped), and the oracle
    replays the identical packer via the shared parameterized CTE
    chain over the registered encode oracle text."""
    cap = SEQ_PACK_CAP
    lens = q_llm_unigram_encode_frozen(spark, sf_dir).selectExpr(
        "doc_id", f"least(greatest(n_pieces, 1L), {cap}) AS n_tok"
    )
    return pack_rows(lens, cap)


def pack_rows(d: DataFrame, cap: int = SEQ_PACK_CAP) -> DataFrame:
    """The X175 assignment over a (doc_id, n_tok) relation; n_tok must
    already be clamped to [1, cap]. Factored out so the hypothesis
    suite can drive it with adversarial length distributions."""
    d = d.selectExpr("doc_id", "n_tok", "((n_tok + 63) div 64) * 64 AS bucket_len")
    win = Window.partitionBy("bucket_len").orderBy(
        F.desc("n_tok"), F.asc("doc_id")
    )
    bucket = Window.partitionBy("bucket_len")
    m = d.select(
        "doc_id",
        "n_tok",
        "bucket_len",
        F.row_number().over(win).alias("rn"),
        (F.sum("n_tok").over(win) - F.col("n_tok")).alias("start_tok"),
        F.count(F.lit(1)).over(bucket).alias("cnt"),
        F.sum("n_tok").over(bucket).alias("btot"),
        (F.lit(cap) - F.col("bucket_len") + 1).alias("cp"),
        F.floor(F.lit(cap) / F.col("bucket_len")).alias("slots"),
    )
    a = m.select(
        "doc_id",
        "n_tok",
        "bucket_len",
        F.when(
            F.floor((F.col("cnt") + F.col("slots") - 1) / F.col("slots"))
            <= F.floor((F.col("btot") + F.col("cp") - 1) / F.col("cp")),
            F.floor((F.col("rn") - 1) / F.col("slots")),
        )
        .otherwise(F.floor(F.col("start_tok") / F.col("cp")))
        .alias("pack_no"),
    )
    return a.select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        F.col("bucket_len").cast("bigint").alias("bucket_len"),
        F.concat_ws(
            "_", F.col("bucket_len").cast("string"), F.col("pack_no").cast("string")
        ).alias("pack_id"),
        F.sum("n_tok")
        .over(Window.partitionBy("bucket_len", "pack_no"))
        .cast("bigint")
        .alias("pack_fill"),
    )


# --- per-doc char-distribution gibberish score (X187) ---------------------------

GIBBERISH_CHI2 = 100.0  # df=35; far beyond any natural-text quantile


@query(
    "text_char_chisq_gibberish",
    f"""
WITH ch AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), ''),
                                    c -> regexp_matches(c, '^[a-z0-9]$'))) AS c
  FROM documents
), dc AS (
  SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c
), corp AS (
  SELECT c, count(*) AS corp_c FROM ch GROUP BY c
), tot AS (
  SELECT sum(corp_c) AS corp_t FROM corp
), dl AS (
  SELECT doc_id, sum(cnt) AS n_chars FROM dc GROUP BY doc_id
), terms AS (
  SELECT d.doc_id, d.c,
         (d.cnt - (co.corp_c + 1.0) * dl.n_chars / (t.corp_t + 36.0))
         * (d.cnt - (co.corp_c + 1.0) * dl.n_chars / (t.corp_t + 36.0))
         / ((co.corp_c + 1.0) * dl.n_chars / (t.corp_t + 36.0)) AS term
  FROM dc d JOIN corp co USING (c) JOIN dl USING (doc_id), tot t
)
SELECT doc_id,
       CAST(min(dl.n_chars) AS BIGINT) AS n_chars,
       round(list_reduce(list(term ORDER BY c), (x, y) -> x + y), 6) AS chi2,
       list_reduce(list(term ORDER BY c), (x, y) -> x + y)
         > {GIBBERISH_CHI2} AS is_gibberish
FROM terms JOIN dl USING (doc_id)
GROUP BY doc_id
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT) AS n_chars,
       CAST(NULL AS DOUBLE) AS chi2, true AS is_gibberish
FROM documents WHERE NOT regexp_matches(lower(text), '[a-z0-9]')
""",
)
def q_text_char_chisq_gibberish(spark, sf_dir):
    """Per-document character-distribution gibberish score (X187):
    chi-square of the doc's [a-z0-9] char counts against the corpus
    distribution — the encoding-corruption / keyboard-mash detector a
    quality gate runs beside the X38 LM score (which needs a trained
    model; this needs only the corpus itself). Chi-square again
    because it needs NO logarithm (the X183 discipline): expected
    counts are add-one-smoothed corpus proportions scaled to doc
    length, one double expression tree both engines evaluate
    identically, and the per-doc total folds over char-SORTED terms
    (a plain SUM order-flips last ulps across shuffles — the memory'd
    X-discipline). Every doc emitted with its flag — including docs
    with ZERO [a-z0-9] characters (pure punctuation / binary
    garbage, arguably the most gibberish): the chi-square is
    undefined for them (no observed counts), so they carry a NULL
    chi2 and a forced is_gibberish=true in both engines (ADVICE r8
    item 2 — they used to vanish from the report). Scale shape:
    per-doc char counts are a PER-ROW projection (one replace-diff
    per alphabet char — no char-grain explode, so no corpus-of-chars
    relation ever shuffles, and no subtree computes twice); the only
    aggregates are the 36-row corpus rollup and the per-doc fold.
    3.0 -> ~1 s at sf0.1 vs the explode formulation."""
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    alpha_arr = "array(" + ", ".join(f"'{c}'" for c in alphabet) + ")"
    dc = (
        _docs(spark, sf_dir)
        .selectExpr("doc_id", "lower(text) AS t")
        .selectExpr(
            "doc_id",
            f"""transform({alpha_arr}, ch ->
                  struct(ch AS c,
                         length(t) - length(replace(t, ch, '')) AS cnt))
                AS counts""",
        )
        .select(
            "doc_id",
            F.aggregate(
                "counts", F.lit(0).cast("long"), lambda a, x: a + x["cnt"]
            ).alias("n_chars"),
            F.explode("counts").alias("kv"),
        )
        .filter(F.col("kv.cnt") > 0)
        .select("doc_id", "n_chars", F.col("kv.c").alias("c"), F.col("kv.cnt").alias("cnt"))
    )
    # dc feeds the corpus rollup AND the term join — persist so the
    # 36-replace counting projection runs once, not per consumer
    from pyspark import StorageLevel

    from gmall_spark import persist as _persist

    dc = _persist.register(dc.persist(StorageLevel.MEMORY_AND_DISK))
    corp = dc.groupBy("c").agg(F.sum("cnt").alias("corp_c"))
    tot = corp.agg(F.sum("corp_c").alias("corp_t"))
    exp = (
        (F.col("corp_c") + 1.0)
        * F.col("n_chars")
        / (F.col("corp_t") + 36.0)
    )
    terms = (
        dc.join(F.broadcast(corp), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_chars",
            "c",
            ((F.col("cnt") - exp) * (F.col("cnt") - exp) / exp).alias("term"),
        )
    )
    chi = F.aggregate(
        F.array_sort(F.collect_list(F.struct("c", "term"))),
        F.lit(0.0),
        lambda a, x: a + x["term"],
    )
    scored = (
        terms.groupBy("doc_id")
        .agg(
            F.min("n_chars").cast("bigint").alias("n_chars"),
            chi.alias("chi2_raw"),
        )
        .select(
            "doc_id",
            "n_chars",
            F.round("chi2_raw", 6).alias("chi2"),
            (F.col("chi2_raw") > GIBBERISH_CHI2).alias("is_gibberish"),
        )
    )
    # zero-char docs (no [a-z0-9] at all) have no rows in dc — emit
    # them with NULL chi2 + forced is_gibberish=true so the audit is
    # never blind to exactly the worst garbage (ADVICE r8 item 2);
    # one regex scan per doc, no shuffle, no extra exchange
    zero = (
        _docs(spark, sf_dir)
        .filter(~F.lower(F.col("text")).rlike("[a-z0-9]"))
        .select(
            "doc_id",
            F.lit(0).cast("bigint").alias("n_chars"),
            F.lit(None).cast("double").alias("chi2"),
            F.lit(True).alias("is_gibberish"),
        )
    )
    return scored.unionByName(zero)


# --- curation funnel (X193) ----------------------------------------------------------


def _curation_funnel_oracle(v5_sql: str | None = None) -> str:
    """The funnel oracle over the registered stage oracles. The v5
    governance stage is spliced in by governance.py AFTER the v5
    oracle exists (this module imports before it); the v5-less text
    attached here at import is overwritten before the registry
    finalizes."""
    from gmall_spark.queries import ORACLES as _OR

    s5_cte = (
        f",\ns5 AS MATERIALIZED (SELECT doc_id FROM ({v5_sql}))"
        if v5_sql
        else ""
    )
    s5_row = (
        " UNION ALL\n  SELECT 5, 'v5_governance_keeper',"
        " (SELECT count(*) FROM s5)"
        if v5_sql
        else ""
    )
    return f"""
WITH s0 AS (SELECT doc_id FROM documents),
s1 AS MATERIALIZED (SELECT doc_id FROM ({_OR["llm_corpus_curation"]})),
s2 AS MATERIALIZED (SELECT doc_id FROM ({_OR["llm_corpus_curation_v2"]})),
s3 AS MATERIALIZED (SELECT doc_id FROM ({_OR["llm_corpus_curation_v3"]})),
s4 AS MATERIALIZED (SELECT doc_id FROM ({_OR["llm_corpus_curation_v4"]})){s5_cte},
counts(stage_no, stage, n_kept) AS (
  SELECT 0, 'raw', (SELECT count(*) FROM s0) UNION ALL
  SELECT 1, 'v1_quality', (SELECT count(*) FROM s1) UNION ALL
  SELECT 2, 'v2_decontam_holdout', (SELECT count(*) FROM s2) UNION ALL
  SELECT 3, 'v3_containment_ppl', (SELECT count(*) FROM s3) UNION ALL
  SELECT 4, 'v4_gibberish_packed', (SELECT count(*) FROM s4){s5_row}
)
SELECT CAST(stage_no AS BIGINT) AS stage_no, stage,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(lag(n_kept) OVER (ORDER BY stage_no) - n_kept AS BIGINT)
         AS n_dropped,
       round(n_kept * 1.0 / first_value(n_kept) OVER (ORDER BY stage_no), 6)
         AS keep_rate
FROM counts
"""


@query("llm_curation_funnel", None)  # oracle attached post-registration
def q_llm_curation_funnel(spark, sf_dir):
    """Curation funnel (X193): the stage-by-stage survival table of
    the whole curation chain (raw -> v1 quality filters -> v2
    decontam + holdout split -> v3 containment/perplexity cut -> v4
    gibberish gate + packing) — the headline chart of every dataset
    release report, and the regression canary: a filter change shows
    up as a moved stage count before any downstream metric moves.
    Every stage is the REGISTERED operator's own output (v1-v3 read
    their shared stage fixtures), so the funnel can't drift from the
    pipeline it describes; the oracle composes the registered oracle
    texts the same way. Stage 5 (r12) is the governance-aware v5 —
    NOT a subset of v4 (a re-elected mirror can RE-ENTER), so its
    n_dropped can legitimately go negative: a restore reads as a
    negative drop, which is exactly the story the keeper re-election
    tells."""
    from gmall_spark.queries_llm.governance import q_llm_corpus_curation_v5

    d = _docs(spark, sf_dir).select("doc_id")
    stages = [
        ("raw", d),
        ("v1_quality", q_llm_corpus_curation(spark, sf_dir).select("doc_id")),
        ("v2_decontam_holdout", q_llm_corpus_curation_v2(spark, sf_dir).select("doc_id")),
        ("v3_containment_ppl", q_llm_corpus_curation_v3(spark, sf_dir).select("doc_id")),
        ("v4_gibberish_packed", q_llm_corpus_curation_v4(spark, sf_dir).select("doc_id")),
        ("v5_governance_keeper", q_llm_corpus_curation_v5(spark, sf_dir).select("doc_id")),
    ]
    rows = None
    for i, (name, df) in enumerate(stages):
        one = df.agg(F.count(F.lit(1)).alias("n_kept")).select(
            F.lit(i).cast("bigint").alias("stage_no"),
            F.lit(name).alias("stage"),
            F.col("n_kept").cast("bigint"),
        )
        rows = one if rows is None else rows.unionByName(one)
    w = Window.orderBy("stage_no")
    return rows.select(
        "stage_no",
        "stage",
        "n_kept",
        (F.lag("n_kept").over(w) - F.col("n_kept")).cast("bigint").alias("n_dropped"),
        F.round(
            F.col("n_kept") * 1.0 / F.first("n_kept").over(w), 6
        ).alias("keep_rate"),
    )


# (funnel oracle attached after the v4 oracle exists — see the
# _OR4 block below the v4 definition)


# --- corpus release fingerprint (X191) ---------------------------------------------


@query(
    "llm_corpus_fingerprint",
    """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(sum(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15)
                     AS BIGINT)) AS DECIMAL(38, 0)) AS content_sum,
       CAST(sum(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                     AS BIGINT)) AS DECIMAL(38, 0)) AS id_sum
FROM documents
""",
)
def q_llm_corpus_fingerprint(spark, sf_dir):
    """Corpus release fingerprint (X191): the one-row
    reproducibility stamp a dataset card carries — doc count, char
    volume, and ORDER-INDEPENDENT content/id checksums (plain SUM of
    per-row 60-bit md5 hashes, held in DECIMAL(38,0) so the integer
    sum is exact at any corpus size — integer addition commutes, so
    shuffle order can't flip a digit, unlike a float fold; XOR would
    also work but Spark ships no bit_xor aggregate). Two corpora
    agree on this row iff they agree on every (doc_id, text) pair
    with overwhelming probability — the cheap 'same data?' check
    before any cross-run regression hunt. One scan, one aggregate."""
    return _docs(spark, sf_dir).selectExpr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), ':', text)), 1, 15), 16, 10) as decimal(38,0)) AS ch",
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as decimal(38,0)) AS ih",
        "length(text) AS len",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("len").cast("bigint").alias("n_chars"),
        F.sum("ch").cast("decimal(38,0)").alias("content_sum"),
        F.sum("ih").cast("decimal(38,0)").alias("id_sum"),
    )


# --- cross-source duplicate attribution (X192) --------------------------------------


@query(
    "dedup_source_attribution",
    SQL_MINHASH.replace("WITH ws", "WITH RECURSIVE ws", 1)
    + _SQL_GROUP_CTES
    + """
, gs AS (
  SELECT g.group_id, d.source
  FROM grp g JOIN documents d USING (doc_id)
), pairs AS (
  SELECT a.group_id,
         least(a.source, b.source) AS source_a,
         greatest(a.source, b.source) AS source_b
  FROM gs a JOIN gs b ON b.group_id = a.group_id
  WHERE a.source < b.source
)
SELECT source_a, source_b,
       CAST(count(DISTINCT group_id) AS BIGINT) AS n_groups
FROM pairs GROUP BY source_a, source_b
""",
)
def q_dedup_source_attribution(spark, sf_dir):
    """Cross-source duplicate attribution (X192): WHERE the
    redundancy comes from — for every pair of sources, how many
    transitive near-dup groups span both (the governance table that
    decides which feed to dedup against which; CommonCrawl-vs-books
    overlap is the classic instance). Composes the shared X6
    components fixture; the within-group source pairing is bounded
    by group sizes (duplicate structure), never the corpus. Source
    pairs are canonicalized (lo, hi) so each spanning group counts
    once per pair."""
    groups = _transitive_groups(spark, sf_dir)
    src = _docs(spark, sf_dir).select("doc_id", "source")
    gs = groups.join(src, "doc_id").select("group_id", "source").distinct()
    a = gs.select("group_id", F.col("source").alias("source_a"))
    b = gs.select(F.col("group_id").alias("gid"), F.col("source").alias("source_b"))
    return (
        a.join(b, (F.col("gid") == F.col("group_id")) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.countDistinct("group_id").cast("bigint").alias("n_groups"))
    )


# --- split leakage audit (X189) ---------------------------------------------------

# 3 md5 hex chars -> 0..4095: ~1% val, ~1% test, 98% train
SPLIT_VAL_HI, SPLIT_TEST_HI = 41, 82

_SPLIT_SQL_SPARK = (
    "CASE WHEN cast(conv(substring(md5(cast(doc_id as string)), 1, 3), 16, 10)"
    f" as int) < {SPLIT_VAL_HI} THEN 'val' "
    "WHEN cast(conv(substring(md5(cast(doc_id as string)), 1, 3), 16, 10)"
    f" as int) < {SPLIT_TEST_HI} THEN 'test' ELSE 'train' END"
)
_SPLIT_SQL_DUCK = (
    "CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) AS BIGINT)"
    f" < {SPLIT_VAL_HI} THEN 'val' "
    "WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) AS BIGINT)"
    f" < {SPLIT_TEST_HI} THEN 'test' ELSE 'train' END"
)


@query(
    "llm_split_leakage_audit",
    SQL_MINHASH.replace("WITH ws", "WITH RECURSIVE ws", 1)
    + _SQL_GROUP_CTES
    + f"""
, sp AS (
  SELECT g.doc_id, g.group_id, {_SPLIT_SQL_DUCK} AS split
  FROM grp g JOIN documents USING (doc_id)
)
SELECT group_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
       array_to_string(list(DISTINCT split ORDER BY split), ',') AS splits,
       count(DISTINCT split) > 1 AS is_leaked
FROM sp GROUP BY group_id
""",
)
def q_llm_split_leakage_audit(spark, sf_dir):
    """Train/val/test split leakage audit (X189) — the
    eval-contamination check a dedup-aware splitter runs before any
    benchmark number is trusted: documents split 98/1/1 by a
    deterministic md5 hash, then every TRANSITIVE near-dup group
    (the shared X6 components fixture) is checked for spanning more
    than one split — a val doc whose near-duplicate sits in train IS
    leakage, however the split was randomized (the reason production
    pipelines split by GROUP, not by document). Every group emitted
    with its flag (X173: alarm-only tables are vacuously green); the
    oracle replays the identical pipeline and closes the pair graph
    with the registered recursive min-label CTE."""
    groups = _transitive_groups(spark, sf_dir)
    sp = groups.selectExpr(
        "doc_id", "group_id", f"{_SPLIT_SQL_SPARK} AS split"
    )
    return sp.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("split").cast("bigint").alias("n_splits"),
        F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
        (F.countDistinct("split") > 1).alias("is_leaked"),
    )


# --- curation v4: gated release manifest, packed (X188) --------------------------


def _curation_v4_oracle() -> str:
    """Composes the registered v3 and gibberish oracles (the X155
    discipline: compositions wrap already-registered oracle texts so
    the stages stay in lockstep by construction), then replays the
    X175 packer on the kept set via the shared parameterized CTE
    chain."""
    from gmall_spark.queries import ORACLES as _OR

    lens = f"""
  SELECT d.doc_id, {_PACK_LEN_SQL} AS n_tok
  FROM documents d
  JOIN (SELECT doc_id FROM ({_OR["llm_corpus_curation_v3"]})) v3
    ON v3.doc_id = d.doc_id
  WHERE d.doc_id NOT IN (
    SELECT doc_id FROM ({_OR["text_char_chisq_gibberish"]}) WHERE is_gibberish)
"""
    return f"""
WITH packed AS MATERIALIZED ({_ffd_pack_oracle(lens)})
SELECT p.doc_id, v.lang_pred, v.bucket, p.n_tok, p.pack_id, p.pack_fill
FROM packed p
JOIN ({_OR["llm_corpus_curation_v3"]}) v ON v.doc_id = p.doc_id
"""


@query("llm_corpus_curation_v4", None)  # oracle attached below
def q_llm_corpus_curation_v4(spark, sf_dir):
    """Corpus curation v4 (X188): the r8 capstone composition — the
    v3 release set additionally gated by the X187 gibberish
    chi-square, then handed to the X175 FFD packer, emitting the
    per-document TRAINING-ROW MANIFEST (doc -> pack assignment with
    the doc's language and perplexity bucket riding along) a
    pretraining loader consumes directly. Same composition discipline
    as v3/the datasheet: every stage is the registered operator (v3
    reads its shared stage fixture; the packer is the identical
    closed form on the kept lengths), and the oracle wraps the
    registered oracle texts so Spark and DuckDB compose the same
    stages by construction. The OUTPUT is a per-(session, sf_dir)
    stage fixture like v2/v3's: the funnel (X193) composes it, and a
    release manifest is materialized once in any real pipeline; the
    build is line-itemed in the bench fixtures map."""
    key = (_session_token(spark), sf_dir)
    if key not in _CURATION_V4:
        with fixtures_audit.timed("curation_v4"):
            kept = q_llm_corpus_curation_v3(spark, sf_dir).select(
                "doc_id", "lang_pred", "bucket"
            )
            gib = (
                q_text_char_chisq_gibberish(spark, sf_dir)
                .filter("is_gibberish")
                .select("doc_id")
            )
            cap = SEQ_PACK_CAP
            lens = (
                _docs(spark, sf_dir)
                .selectExpr(
                    "doc_id",
                    rf"least(greatest(size(filter(split(text, '\\s+'), x -> x != '')), 1),"
                    rf" {cap}) AS n_tok",
                )
                .join(kept.select("doc_id"), "doc_id")
                .join(gib, "doc_id", "anti")
            )
            _CURATION_V4[key] = (
                pack_rows(lens, cap)
                .join(kept, "doc_id")
                .select(
                    "doc_id", "lang_pred", "bucket", "n_tok", "pack_id", "pack_fill"
                )
                .localCheckpoint(eager=True)
            )
    return _CURATION_V4[key]


from gmall_spark.queries import ORACLES as _OR4  # noqa: E402

_OR4["llm_corpus_curation_v4"] = _curation_v4_oracle()
_OR4["llm_curation_funnel"] = _curation_funnel_oracle()
# X201: the packer CTE chain over the registered X194 encode oracle —
# attached here because _ffd_pack_oracle is defined below the X201
# query body (file order matters for post-registration attaches)
_OR4["llm_sequence_packing_unigram"] = _ffd_pack_oracle(
    _unigram_pack_lens_sql()
)


# --- embedding health audit (X186) ----------------------------------------------


@query(
    "embedding_health_audit",
    """
WITH e AS (
  SELECT vec_id, embedding,
         len(embedding) AS width,
         list_aggregate(list_transform(embedding,
                        x -> CASE WHEN isnan(CAST(x AS DOUBLE)) THEN 1 ELSE 0 END),
                        'sum') AS nan_ct,
         list_aggregate(list_transform(embedding,
                        x -> CASE WHEN CAST(x AS DOUBLE) = 0.0 THEN 0 ELSE 1 END),
                        'sum') AS nonzero_ct
  FROM embeddings
), dims AS (
  SELECT unnest(range(1, len(embedding) + 1)) AS dim,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
  FROM embeddings
), per_dim AS (
  SELECT CAST(dim AS BIGINT) AS dim, min(x) AS dim_min, max(x) AS dim_max,
         CAST(SUM(CASE WHEN x = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
  FROM dims GROUP BY dim
), corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(count(DISTINCT width) AS BIGINT) AS n_widths,
         CAST(SUM(CASE WHEN nan_ct > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nan_vectors,
         CAST(SUM(CASE WHEN nonzero_ct = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zero_vectors
  FROM e
)
SELECT p.dim, p.dim_min, p.dim_max, p.zeros,
       c.n_vectors, c.n_widths, c.nan_vectors, c.zero_vectors
FROM per_dim p, corpus c
""",
)
def q_embedding_health_audit(spark, sf_dir):
    """Embedding-table health audit (X186): the QA pass a vector
    pipeline runs before building any index — per-dimension min/max
    envelope and zero counts (a dead dimension = an upstream encoder
    bug), plus corpus-level NaN-vector / all-zero-vector / mixed-width
    counts (each of which silently poisons cosine math downstream).
    Determinism by construction: ONLY order-independent statistics
    (min / max / integer counts — never a float SUM, whose
    shuffle-order last-ulp noise the oracle could disagree with).
    Scale shape: one dim-explode aggregate (64x vectors, grouped on a
    64-row grid) + one per-vector fold aggregate; the 1-row corpus
    stats broadcast onto the grid."""
    emb = _emb(spark, sf_dir)
    e = emb.select(
        F.size("embedding").alias("width"),
        F.aggregate(
            F.transform("embedding", lambda x: F.when(F.isnan(x.cast("double")), 1).otherwise(0)),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("nan_ct"),
        F.aggregate(
            F.transform("embedding", lambda x: F.when(x.cast("double") == 0.0, 0).otherwise(1)),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("nonzero_ct"),
    )
    corpus = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.countDistinct("width").cast("bigint").alias("n_widths"),
        F.sum(F.when(F.col("nan_ct") > 0, 1).otherwise(0)).cast("bigint").alias("nan_vectors"),
        F.sum(F.when(F.col("nonzero_ct") == 0, 1).otherwise(0)).cast("bigint").alias("zero_vectors"),
    )
    dims = emb.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim0", "x"
        )
    ).select((F.col("dim0") + 1).cast("bigint").alias("dim"), "x")
    per_dim = dims.groupBy("dim").agg(
        F.min("x").alias("dim_min"),
        F.max("x").alias("dim_max"),
        F.sum(F.when(F.col("x") == 0.0, 1).otherwise(0)).cast("bigint").alias("zeros"),
    )
    return per_dim.crossJoin(F.broadcast(corpus)).select(
        "dim", "dim_min", "dim_max", "zeros",
        "n_vectors", "n_widths", "nan_vectors", "zero_vectors",
    )


