"""Character-bigram language-model scoring (CCNet-style quality
signal, cf. Wenzek et al., arXiv:1911.00359).

CCNet filters pretraining text by language-model perplexity. The
container has no KenLM, so the same signal is built from first
principles as a corpus-trained character-bigram model: per language,
P(bigram) = (count + 1) / (total + V) with add-one smoothing over
the observed bigram vocabulary V, and each document scores the mean
log-probability of its bigrams. Low scores mark improbable character
sequences (mojibake, binary spill, wrong-language text) — the
perplexity-bucket signal data pipelines cut on.

Scale design (100 TB): bigram extraction is a per-row higher-order
function; the model is a hash aggregate on a BOUNDED key space
(|charset|² per language), so map-side combine collapses the
exploded stream before any exchange; scoring re-joins the model
(small, broadcast) against the exploded bigrams and reduces per
doc_id — partial aggregation again collapses each partition's rows
before the shuffle. No driver-side state, no RNG.

Float caveat (same class as operators/similarity.py:295): the
per-doc mean log-prob sums ~10³ doubles whose addition order differs
between Spark's partial aggregates and DuckDB's sequential scan; the
score is rounded to 6 dp, which absorbs the last-ulp drift except on
a ~1e-9-probability rounding-boundary coincidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigram_col(text_col: str):
    """array<string> of character bigrams of lower(text) (empty when
    the text is shorter than 2 chars — guarded because sequence(1, 0)
    would DESCEND, not return empty)."""
    return F.when(
        F.length(F.col(text_col)) >= 2,
        F.expr(
            f"transform(sequence(1, length(lower({text_col})) - 1),"
            f" i -> substring(lower({text_col}), i, 2))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def bigram_model(
    docs: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """(lang, bigram, c, total, v): corpus bigram counts plus the
    per-language total and vocabulary size the smoothing needs."""
    bg = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(_bigram_col(text_col)).alias("b"),
    )
    counts = bg.groupBy("lang", "b").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("lang").agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")
    )
    return counts.join(F.broadcast(totals), "lang")


def bigram_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-document mean bigram log-probability under that language's
    corpus model: (doc_id, lang, n_bigrams, bigram_logprob)."""
    model = bigram_model(docs, text_col, lang_col)
    bg = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.explode(_bigram_col(text_col)).alias("b"),
    )
    lp = F.log((F.col("c") + F.lit(1.0)) / (F.col("total") + F.col("v")))
    return (
        bg.join(F.broadcast(model), ["lang", "b"])
        .groupBy(id_col, "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.sum(lp) / F.count(F.lit(1)), 6).alias("bigram_logprob"),
        )
    )
