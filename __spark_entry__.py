"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (DWS province order window)
on sf0.001; ``queries()``/``oracle_sql()`` expose the full registry
from :mod:`gmall_spark.queries` (one entry per implemented operator
from SURVEY.md §2, each with a DuckDB-oracle SQL twin).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmall_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["dws_trade_province_order_window"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
