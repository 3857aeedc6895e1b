"""Session-scoped registry of persisted DataFrames.

Operators that persist an intermediate relation (the MinHash shingle
arrays, the embedding LSH bands) register it here so long-lived
sessions can free executor storage with one call —
``queries.clear_cache()`` drains this registry alongside the DWD
materialization cache. Tests and the bench run fine without draining:
the session dies with the process.

(Extracted from a module-global inside ``operators.llm_dedup`` that
``similarity`` reached into privately — ADVICE r2.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def register(df: DataFrame) -> DataFrame:
    """Track an already-persisted DataFrame for later release."""
    _PERSISTED.append(df)
    return df


def release_all() -> None:
    """Unpersist every registered DataFrame (idempotent; safe after
    session stop)."""
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
        except Exception:
            pass
