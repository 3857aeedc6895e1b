"""BM25 keyword ranking over a document corpus.

The retrieval-side complement of the embedding ANN operators
(operators/similarity.py): score documents against a FIXED small term
set with Okapi BM25 and return the global top-k. Used for corpus
triage (find the docs most about X) and as the lexical arm of a
hybrid lexical+vector retrieval stack.

Scale design (100 TB): no inverted index and no explode — for a
fixed query-term set the term frequencies are per-row JVM
higher-order-function expressions over the tokenized text (zero
shuffle), the corpus statistics (N, Σdl, per-term document
frequencies) are ONE single-row aggregate with map-side partials,
broadcast back via a literal cross join, and the top-k is Spark's
TakeOrderedAndProject (per-partition heaps, no global sort). The
whole plan has no wide exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def _toks(text_col):
    return F.filter(
        F.split(F.lower(text_col), TOKEN_SPLIT), lambda x: x != F.lit("")
    )


def _tf(text_col, term: str):
    # helper, not an inline two-arg lambda: F.filter treats a 2-arg
    # lambda as the (element, index) variant
    return F.size(F.filter(_toks(text_col), lambda x: x == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` docs by Okapi BM25 score for ``terms``.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))            (Robertson)
    score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl))

    Output: (id_col, bm25) — bm25 rounded to 6 dp; selection order is
    the unrounded score desc, then id_col (deterministic)."""
    t = docs.select(
        F.col(id_col),
        F.size(_toks(F.col(text_col))).alias("dl"),
        *[
            _tf(F.col(text_col), tm).alias(f"tf_{i}")
            for i, tm in enumerate(terms)
        ],
    )
    stats = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = t.crossJoin(F.broadcast(stats))
    avgdl = F.col("sdl").cast("double") / F.col("n")
    score = None
    for i in range(len(terms)):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(F.lit(1.0) + (F.col("n") - df + 0.5) / (df + 0.5))
        term = idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * F.col("dl") / avgdl)
        )
        score = term if score is None else score + term
    matched = sum(F.col(f"tf_{i}") for i in range(len(terms))) > 0
    return (
        scored.filter(matched)
        .select(F.col(id_col), score.alias("raw"))
        .orderBy(F.col("raw").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("raw", 6).alias("bm25"))
    )
