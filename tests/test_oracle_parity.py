"""Every registered query must match its DuckDB oracle at sf0.001
(the driver's t2 gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from gmall_spark import queries as q
from tests.oracle import compare


def _names():
    return sorted(q.ORACLES.keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    df = q.QUERIES[name](spark, sf_dir)
    problems = compare(df, q.ORACLES[name], sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_have_callables():
    for name in q.ORACLES:
        assert name in q.QUERIES


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
