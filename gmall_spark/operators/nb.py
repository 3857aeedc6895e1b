"""Trained hashed-feature Naive Bayes text classifier (X127) — the
fastText-style supervised bag-of-n-grams shape (Joulin et al. 2017,
arXiv:1607.01759; multinomial NB per McCallum & Nigam 1998), sharing
the DSIR featurizer (word unigrams+bigrams, engine-portable md5
bucket into ``dsir.N_BUCKETS``).

This is the TRAINED complement of the rule-based classifiers: X12's
lang-ID is a fixed marker heuristic and X27 ships the inference
plumbing with a stub model — here the model is actually FIT on a
labeled split and applied to the rest, end to end inside the engine.

Model: one row per class ``(label, m: map<f → count>, total,
n_docs)`` — the single-row-map trick (operators/lm.score_with_model)
so the training subtree evaluates once however many consumers score
under it; bounded by |classes| rows of ≤ N_BUCKETS entries, broadcast
at any corpus size. Scoring materializes the FULL (class × bucket)
log-likelihood grid (add-one smoothing over the fixed bucket space,
so unseen features take their floor and the join never misses),
broadcasts it, and reduces per (doc, class) with one partial-agg
shuffle — the operators/dsir.py scale shape, one grid per class.

Determinism: per-(doc, class) scores are ROUNDED to 6 dp before the
argmax and ties break by label ascending, so the prediction is
reproducible cross-engine (near-ties within the rounding quantum are
the accepted float-boundary class; exact ties are deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gmall_spark.operators import dsir


def train(
    docs: DataFrame, label_col: str = "label", text_col: str = "text"
) -> DataFrame:
    """Fit the multinomial NB model: one row per class —
    (label, m: map<f → count>, total, n_docs)."""
    feats = docs.select(
        F.col(label_col).alias("label"),
        F.explode(dsir._feature_col(text_col)).alias("g"),
    ).select("label", F.expr(dsir._BUCKET_SQL).alias("f"))
    counts = feats.groupBy("label", "f").agg(F.count(F.lit(1)).alias("c"))
    model = counts.groupBy("label").agg(
        F.map_from_entries(F.collect_list(F.struct("f", "c"))).alias("m"),
        F.sum("c").alias("total"),
    )
    priors = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return model.join(priors, "label")


def _grid(model: DataFrame) -> DataFrame:
    """(label, prior_ln, f, lp) for the ENTIRE bucket space —
    |classes| × N_BUCKETS rows, broadcast-sized."""
    return model.select(
        "label",
        F.log(F.col("n_docs").cast("double")).alias("prior_ln"),
        "m",
        "total",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(dsir.N_BUCKETS - 1).cast("long"))
        ).alias("f"),
    ).select(
        "label",
        "prior_ln",
        "f",
        F.log(
            (F.coalesce(F.element_at("m", F.col("f")), F.lit(0)) + F.lit(1.0))
            / (F.col("total") + F.lit(float(dsir.N_BUCKETS)))
        ).alias("lp"),
    )


def predict(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: (doc_id, pred_label, score) — the argmax class
    under ``ln n_c + Σ_f count_f · ln p_c(f)`` (the shared ln n_train
    denominator cancels in the argmax and is dropped)."""
    feats = dsir.feature_buckets(docs, id_col, text_col)
    scores = (
        feats.join(F.broadcast(_grid(model)), "f")
        .groupBy(id_col, "label")
        .agg(F.round(F.first("prior_ln") + F.sum("lp"), 6).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("label").alias("pred_label"), "score")
    )
