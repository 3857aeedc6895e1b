"""Mergeable-sketch aggregation: HyperLogLog distinct counting.

The exact `count_distinct` UV queries (plans/ads.py, A9) shuffle
every distinct key once per grain. At 100 TB the standard dashboard
answer is a DataSketches HLL sketch per grain: constant-size partial
state that map-side combines, merges ACROSS grains without rescanning
(day sketches → month estimate via `hll_union_agg`), and re-estimates
at query time. Spark ships the Apache DataSketches implementation as
first-class aggregates (`hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`), so the whole path is JVM-side.

No DuckDB oracle: HLL estimates are implementation-defined (DuckDB's
own approx_count_distinct uses different parameters/hashing), so this
family is gated by tests instead — estimate-vs-exact relative error
and the sketch-merge identity (union of per-day sketches must equal
the one-pass whole-period sketch EXACTLY, since both are the same
deterministic sketch of the same key set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LG_K = 12  # 2^12 buckets: ~1.6% relative standard error, 4 KiB state


def uv_sketch(df: DataFrame, grain: Column | str, key: str, lg_k: int = LG_K) -> DataFrame:
    """(grain, uv_sketch): one HLL sketch of ``key`` per grain value."""
    g = F.col(grain) if isinstance(grain, str) else grain
    return df.groupBy(g.alias("grain")).agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("uv_sketch")
    )


def estimate(sketched: DataFrame) -> DataFrame:
    """(grain, uv_approx) from a ``uv_sketch`` table."""
    return sketched.select(
        "grain",
        F.hll_sketch_estimate("uv_sketch").cast("bigint").alias("uv_approx"),
    )


def merged_estimate(sketched: DataFrame, lg_k: int = LG_K) -> DataFrame:
    """Single-row (uv_approx) for the UNION of all grains — merges the
    stored sketches; never rescans the base table."""
    return sketched.agg(
        F.hll_sketch_estimate(F.hll_union_agg("uv_sketch", F.lit(False)))
        .cast("bigint")
        .alias("uv_approx")
    )
