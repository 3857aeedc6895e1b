"""Bucketed co-located join: the 100 TB layout strategy, asserted on
the physical plan (no Exchange in a join of two bucketed tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_spark.operators.scale import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        ["o_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # disable size-based broadcast: at the test SF the dim side is tiny
    # and Spark would (correctly) broadcast instead of exercising the
    # bucketed co-location this test asserts — at 100 TB both sides are
    # far over any broadcast threshold.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_bucketed(spark, t1)
        b = read_bucketed(spark, t2)
        joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").agg(
            F.sum("l_quantity").alias("qty")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must be exchange-free; the only exchange
        # allowed is the one feeding the final (non-bucket-key) agg
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, join_part
        got = {r["o_orderstatus"]: r["qty"] for r in joined.collect()}
        assert got and all(v > 0 for v in got.values())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    t1, _ = bucketed_tables
    a = read_bucketed(spark, t1)
    agg = a.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
