"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), the hashed-n-gram variant the paper ships.

DSIR picks raw-corpus documents that look like a TARGET distribution
(curated reference text): featurize every document as a bag of hashed
word n-grams, fit two multinomial bag models — target p and raw q —
and weight each raw document by its log importance ratio
``Σ_f count_f · (ln p_f − ln q_f)``; resampling by that weight yields
a corpus distributed like the target. This is the data-SELECTION
complement of the quality-FILTER family (X38/X57/X105): instead of
dropping bad documents by rule, it up-weights documents that match
where you want the distribution to go.

Determinism/portability choices (same contracts as the LM operator):

- features are word unigrams + bigrams hashed into ``N_BUCKETS``
  buckets via the repo's engine-portable md5 bucket (first 8 md5 hex
  digits as an int), so Spark and the DuckDB oracle compute identical
  features — no engine-private hash;
- both models use add-one smoothing over the FIXED bucket space
  (``(c_f + 1) / (total + N_BUCKETS)``), so a bucket unseen in the
  target still has defined mass and the ratio never divides by zero;
- the emitted weight is the per-feature MEAN log ratio rounded to
  6 dp: the mean removes the document-length bias the paper notes
  (long documents otherwise dominate any top-k), and the rounding
  absorbs float-sum ordering drift for cross-engine comparison.

Scale shape: featurization is a per-row HOF + explode; both models
are hash aggregates on a key space bounded by ``N_BUCKETS`` (map-side
combine collapses the exploded stream before the exchange); the
ratio table is ≤ N_BUCKETS rows and BROADCASTS into the scoring
join; the per-doc reduce is one partial-agg shuffle. No corpus-wide
sort, no driver state — the same 100 TB shape as operators/lm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 8192  # hashed feature space (paper uses 10k; power of 2)

# engine-portable bucket: first 8 md5 hex digits -> bigint -> mod B.
# Spark text; the oracle twin is CAST(('0x' || substr(md5(g),1,8)) AS
# BIGINT) % B (same value: 8 hex digits < 2^63, both non-negative).
_BUCKET_SQL = (
    f"cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint) % {N_BUCKETS}"
)


def _feature_col(text_col: str):
    """array<string> of word unigrams + bigrams (with multiplicity —
    the models are multinomial). Tokenization matches the shingle
    pipeline: whitespace split, no case folding."""
    words = f"split({text_col}, '\\\\s+')"
    # the size guard matters: sequence(1, 0) DESCENDS in Spark (the
    # lm._bigram_col lesson) and element_at(_, 0) throws
    bigrams = (
        f"case when size({words}) >= 2 then"
        f" transform(sequence(1, size({words}) - 1),"
        f" i -> concat(element_at({words}, i), ' ',"
        f" element_at({words}, i + 1)))"
        f" else array() end"
    )
    return F.expr(f"concat({words}, {bigrams})")


def feature_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, f): one row per feature OCCURRENCE, bucketed."""
    return docs.select(
        F.col(id_col),
        F.explode(_feature_col(text_col)).alias("g"),
    ).select(id_col, F.expr(_BUCKET_SQL).alias("f"))


def _bag_model_row(feats: DataFrame) -> DataFrame:
    """ONE row: (m: map<f → count>, total). The single-row map form
    (same trick as operators/lm.score_with_model) keeps the model
    subtree evaluated ONCE however many consumers read it — a
    (counts ⨯ totals) relational form makes Spark re-run the whole
    explode+agg pipeline once per consumer. The map is bounded by
    N_BUCKETS entries — broadcast-sized at any corpus size."""
    return (
        feats.groupBy("f")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy()
        .agg(
            F.map_from_entries(F.collect_list(F.struct("f", "c"))).alias("m"),
            F.sum("c").alias("total"),
        )
    )


def importance_weights_under(
    docs: DataFrame,
    target_docs: DataFrame,
    raw_model_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document of ``docs``: (doc_id, n_feats, dsir_logratio) —
    the mean hashed-n-gram log importance ratio ln p(f) − ln q(f),
    with the target model p fit on ``target_docs`` and the raw model
    q fit on ``raw_model_docs``. The FROZEN-model form (q on a
    representative raw sample) is the streaming deployment
    (streaming/incremental_dsir); the batch operator passes
    ``raw_model_docs = docs``. The ratio table is materialized for
    the ENTIRE bucket grid (a sequence explode over the two
    single-row model maps — N_BUCKETS rows, broadcast), so features
    unseen in either model take their add-one floor symmetrically and
    the scoring join never misses."""
    feats = feature_buckets(docs, id_col, text_col)
    q_row = _bag_model_row(
        feature_buckets(raw_model_docs, id_col, text_col)
    ).withColumnsRenamed({"m": "qm", "total": "qt"})
    p_row = _bag_model_row(
        feature_buckets(target_docs, id_col, text_col)
    ).withColumnsRenamed({"m": "pm", "total": "pt"})
    ratio = (
        q_row.crossJoin(F.broadcast(p_row))
        .select(
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(N_BUCKETS - 1).cast("long")
                )
            ).alias("f"),
            "qm",
            "qt",
            "pm",
            "pt",
        )
        .select(
            "f",
            (
                F.log(
                    (F.coalesce(F.element_at("pm", F.col("f")), F.lit(0))
                     + F.lit(1.0))
                    / (F.col("pt") + F.lit(float(N_BUCKETS)))
                )
                - F.log(
                    (F.coalesce(F.element_at("qm", F.col("f")), F.lit(0))
                     + F.lit(1.0))
                    / (F.col("qt") + F.lit(float(N_BUCKETS)))
                )
            ).alias("lr"),
        )
    )
    return (
        feats.join(F.broadcast(ratio), "f")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.round(F.sum("lr") / F.count(F.lit(1)), 6).alias("dsir_logratio"),
        )
    )


def importance_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per raw document: (doc_id, n_feats, dsir_logratio) — the mean
    hashed-n-gram log importance ratio ln p_target(f) − ln q_raw(f)
    under add-one-smoothed bag models, q fit on the scored corpus
    itself (the batch DSIR form). Higher = more target-like."""
    return importance_weights_under(
        raw_docs, target_docs, raw_docs, id_col, text_col
    )


def resample_top_fraction(
    weights: DataFrame, n_tiers: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """The resampling step, deterministic: cut the weight ranking into
    ``n_tiers`` equal-population tiers over the (rounded-weight)
    HISTOGRAM — the X108 machinery, global instead of per-language —
    and keep tier 1 (the most target-like 1/n_tiers of the corpus).
    Ties share a tier, so the cut is reproducible cross-engine at any
    corpus size without a corpus-wide sort."""
    hist = weights.groupBy("dsir_logratio").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy(F.col("dsir_logratio").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    cuts = (
        hist.withColumn("cum_prev", F.coalesce(F.sum("c").over(w_cum), F.lit(0)))
        .withColumn("n_docs", F.sum("c").over(w_all))
        .withColumn(
            "tier",
            F.least(
                F.lit(n_tiers),
                F.lit(1)
                + F.expr(f"({n_tiers} * cum_prev) div n_docs").cast("int"),
            ).cast("bigint"),
        )
        .select("dsir_logratio", "tier")
    )
    return (
        weights.join(F.broadcast(cuts), "dsir_logratio")
        .filter(F.col("tier") == 1)
        .select(id_col, "n_feats", "dsir_logratio")
    )
