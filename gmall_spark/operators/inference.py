"""Batch model-inference plumbing for corpus scoring.

The training-data pipeline pattern where a learned quality classifier
(fastText, a small transformer, an LLM-as-judge distillate) scores
every document: the model is broadcast to executors once and applied
per Arrow batch through ``mapInPandas`` — the same contract real
inference uses (model loaded per task, vectorized over the batch,
typed output schema), independent of which model fills the hole.

No ML runtime ships in this container, so the model here is a
deterministic STUB: a fixed-weight logistic over two cheap features
(whitespace token count, alpha-character ratio). The stub is exactly
reproducible in SQL, which gives the query a DuckDB oracle — the
Spark-side plumbing (Arrow batching, schema, per-batch vectorization)
is the real, tested part, exactly like the multimodal decode stubs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MODEL_VERSION = "stub-logistic-v1"
# fixed "model weights": logit = W_WC * token_count + W_ALPHA * alpha_ratio + BIAS
W_WC = 0.02
W_ALPHA = 2.0
BIAS = -2.0


def score_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, model_score, model_version) per document via one
    vectorized pass per Arrow batch."""

    def _score(batches):
        for pdf in batches:
            text = pdf[text_col].astype(str)
            # token count with the same '\s+' split semantics the SQL
            # twin uses (re.split keeps a leading empty token)
            wc = text.str.split(r"\s+", regex=True).str.len().astype("float64")
            alpha = text.str.count(r"[A-Za-z]").astype("float64")
            n = text.str.len().clip(lower=1).astype("float64")
            logit = W_WC * wc + W_ALPHA * (alpha / n) + BIAS
            score = 1.0 / (1.0 + np.exp(-logit))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "model_score": np.round(score, 6),
                    "model_version": MODEL_VERSION,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _score, "doc_id long, model_score double, model_version string"
    )


def score_oracle_sql() -> str:
    """The stub model replayed in SQL (engine-portable arithmetic)."""
    return f"""
WITH f AS (
  SELECT doc_id,
         CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS wc,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
         CAST(greatest(length(text), 1) AS DOUBLE) AS n
  FROM documents
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-({W_WC} * wc + {W_ALPHA} * (alpha / n) + {BIAS}))), 6) AS model_score,
       '{MODEL_VERSION}' AS model_version
FROM f
"""
