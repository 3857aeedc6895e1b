"""Deterministic Bloom-filter membership: the broadcast-sized
set-membership pre-filter for decontamination probes.

llm_contamination_check / llm_cross_corpus_decontam broadcast the
reference side's gram/band SETS — exact, but the broadcast payload
grows with the reference corpus. A Bloom filter caps that payload at
``BLOOM_BITS`` regardless of reference size (the classic Spark
join-pre-filter: runtime row-level filtering uses the same idea),
at the price of a bounded false-positive rate; the exact check then
runs only on the (tiny) bloom-positive subset. At 100 TB: build is
one hash-agg of (word_idx, word) pairs — map-side bit_or partials —
and the probe side never shuffles (the ≤ BLOOM_BITS/32-row word
table broadcasts).

Determinism contract: positions come from the repo's md5 two-half
lane-mix family (operators/llm_dedup._lane_const — the SAME
deterministic constants are baked into the Spark plan and the DuckDB
oracle), words are 32-bit (stored in BIGINT: DuckDB raises on
``1::BIGINT << 63``, and 0..31 shifts are overflow-free in both
engines), so build and probe are bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_spark.operators.llm_dedup import _lane_const

BLOOM_BITS = 1 << 16  # 65536 bits = 2048 x 32-bit words, ~16 bits/key at 4k keys
BLOOM_HASHES = 7
_WORD = 32


def bloom_pos_sql(i: int, h1: str = "h1", h2: str = "h2", bits: int = BLOOM_BITS) -> str:
    """Position of hash lane ``i`` as engine-portable SQL text over
    the two md5 halves (non-negative: both halves are 32-bit)."""
    a, b = _lane_const("a", i), _lane_const("b", i)
    return f"({a} * {h1} + {b} * {h2} + {i}) % {bits}"


def _halves(key: Column) -> list[Column]:
    md = F.md5(key)
    return [
        F.conv(F.substring(md, 1, 8), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring(md, 9, 8), 16, 10).cast("bigint").alias("h2"),
    ]


def _positions(n_hashes: int, bits: int) -> Column:
    return F.explode(
        F.array(*[F.expr(bloom_pos_sql(i, bits=bits)) for i in range(n_hashes)])
    ).alias("pos")


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_hashes: int = BLOOM_HASHES,
    bits: int = BLOOM_BITS,
) -> DataFrame:
    """(word_idx, word) rows of the filter — at most ``bits/32`` of
    them; words for never-set indices are absent (probe treats an
    absent word as all-zero)."""
    h = keys.select(*_halves(F.col(key_col)))
    pos = h.select(_positions(n_hashes, bits))
    return (
        pos.select(
            (F.col("pos") / _WORD).cast("bigint").alias("word_idx"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(pos % {_WORD} as int))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    id_cols: str | list[str],
    n_hashes: int = BLOOM_HASHES,
    bits: int = BLOOM_BITS,
) -> DataFrame:
    """(*id_cols, bloom_hit): hit iff EVERY hash position's bit is
    set. The word table broadcasts (≤ bits/32 rows at any corpus
    size); the probe side is never shuffled — per probe key the
    ``n_hashes`` exploded rows aggregate back by id with one
    map-side-combining count."""
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    h = probes.select(*[F.col(c) for c in ids], *_halves(F.col(key_col)))
    pos = h.select(*ids, _positions(n_hashes, bits))
    checked = (
        pos.select(
            *ids,
            (F.col("pos") / _WORD).cast("bigint").alias("word_idx"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(pos % {_WORD} as int))").alias(
                "mask"
            ),
        )
        .join(F.broadcast(bloom), "word_idx", "left")
        .select(
            *ids,
            (
                F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
            ).cast("int").alias("hit"),
        )
    )
    # min(hit) == 1 is multiplicity-insensitive: a probe id appearing
    # on several input rows still reports a member as hit (sum(hit) ==
    # n_hashes would double-count to 2*n_hashes and report a FALSE
    # NEGATIVE, violating the Bloom contract — ADVICE r4).
    return checked.groupBy(*ids).agg((F.min("hit") == 1).alias("bloom_hit"))
