"""Vector functions over embedding columns (array<float>).

Built-in higher-order functions (F.aggregate / F.zip_with) keep the
arithmetic JVM-side; elements are cast to double before accumulating
so both engines fold in the same order with the same width.

r14 (guide §7.3 driver work): the fold builders are hot DRIVER code —
the sf0.001 cProfile measured cosine/dot/norm at ~27 s cumulative
(≈7 s real) of pure py4j expression-tree chatter per bench run
(~100 round-trips per cosine, 63 calls). When callers pass COLUMN
NAMES (every registered call site does), the identical fold is now
built as ONE SQL string parsed server-side (F.expr) and the Column
object memoized per (applicationId, names) — immutable expression
trees, the queries._T_PLANS argument at expression grain; no data
cached. Column arguments still take the original HOF-builder path.
The parsed SQL is the IDENTICAL sequential fold (same transform/
zip_with/aggregate, same casts, same fold order), so results are
bit-identical (pinned in tests/test_ann_width.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_FOLD_COLS: dict[tuple, Column] = {}


def _tok() -> str:
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession().sparkContext.applicationId


def _dbl(name: str) -> str:
    return f"transform({name}, x -> CAST(x AS DOUBLE))"


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({_dbl(a)}, {_dbl(b)}, (x, y) -> x * y),"
        " 0.0D, (acc, x) -> acc + x)"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt(aggregate({_dbl(a)}, 0.0D, (acc, x) -> acc + x * x))"


def _named(kind: str, sql: str, *names: str) -> Column:
    key = (_tok(), kind) + names
    c = _FOLD_COLS.get(key)
    if c is None:
        c = F.expr(sql)
        _FOLD_COLS[key] = c
    return c


def _d(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str) and a.isidentifier() and b.isidentifier():
        return _named("dot", _dot_sql(a, b), a, b)
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    if isinstance(a, str) and a.isidentifier():
        return _named("norm", _norm_sql(a), a)
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str) and a.isidentifier() and b.isidentifier():
        return _named(
            "cos",
            f"({_dot_sql(a, b)}) / (({_norm_sql(a)}) * ({_norm_sql(b)}))",
            a,
            b,
        )
    return dot(a, b) / (norm(a) * norm(b))


# r13 note: an unrolled fixed-width variant (element_at multiply-add
# chains instead of the HOF fold) was measured and REJECTED — executor
# time was identical at these pair volumes (the fold is interpreted
# but the per-element work is trivial), while the ~200-node expression
# trees, duplicated through window/join/union subtrees, multiplied
# Catalyst analysis/optimization time (similarity_topk_cosine ~1.0 →
# 1.6 s, similarity_eval_jl_projection ~4 → 18 s driver-bound). The
# HOF fold keeps plans small; at real scale the per-pair arithmetic
# rides the GEMM paths (operators/similarity.gemm_allpairs_topk).
