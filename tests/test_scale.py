"""Bucketed co-located join: the 100 TB layout strategy, asserted on
the physical plan (no Exchange in a join of two bucketed tables)."""

from __future__ import annotations

import pytest
import re
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


def test_aqe_splits_skewed_join(spark):
    """Synthetic-skew smoke (SURVEY scale mandate): one key holding
    half the fact rows must trigger AQE's skew-join split once the
    thresholds are scaled down to test-data sizes — evidence the
    session config actually engages OptimizeSkewedJoin, which is the
    production answer for a hot order_id at 100 TB."""
    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    # coalescing tiny neighbors first can mask the split at test sizes
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        fact = spark.range(2_000_000).select(
            F.when(F.col("id") < 1_000_000, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            # pad so the skewed map partition clears the (compressed)
            # size threshold
            F.concat(
                F.lit("padpadpadpadpadpadpadpad_"),
                (F.col("id") % 97).cast("string"),
            ).alias("v"),
        )
        dim = spark.range(0, 2_000_000, 7).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("w")
        )
        joined = fact.join(dim, "k")
        # collect() (not count()) so the inspected DataFrame's own
        # QueryExecution runs and its adaptive plan finalizes
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:1000]
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_minhash_pair_cost_tracks_duplicate_density(spark):
    """Structural linearity smoke for the MinHash pipeline: tiling a
    corpus T times (duplicates only WITHIN a tile — each tile gets a
    distinguishing token) must scale verified pairs and candidate
    pairs exactly T times. A super-linear blowup would mean bucket
    collisions across unrelated tiles — the failure mode that turns
    LSH quadratic at 100 TB."""
    from gmall_spark.operators import llm_dedup

    def corpus(tiles: int):
        rows = []
        for t in range(tiles):
            for g in range(5):  # 5 near-dup groups per tile
                base = " ".join(
                    f"tile{t} grp{g} tok{(g * 13 + j) % 31} word{j}"
                    for j in range(12)
                )
                rows.append((t * 100 + g * 2, base))
                rows.append((t * 100 + g * 2 + 1, base + " tail"))
            for u in range(10):  # unique filler (tile-qualified tokens)
                rows.append(
                    (t * 100 + 50 + u, f"tile{t} unique{u} " + " ".join(
                        f"solo{t}_{u}_{j}" for j in range(12)
                    ))
                )
        return spark.createDataFrame(rows, "doc_id long, text string")

    def counts(tiles: int):
        docs = corpus(tiles)
        sigs = llm_dedup.minhash_signatures(
            llm_dedup.word_shingles(docs)
        )
        cand = llm_dedup.lsh_candidate_pairs(sigs).count()
        pairs = llm_dedup.minhash_lsh_dedup(docs, 0.5).count()
        return cand, pairs

    c1, p1 = counts(1)
    c4, p4 = counts(4)
    assert p1 > 0 and c1 > 0
    assert p4 == 4 * p1, (p1, p4)
    assert c4 == 4 * c1, (c1, c4)



def test_partition_pruned_scan(spark, sf_dir, tmp_path_factory):
    """A filter on the partition column must be consumed by PLANNING-
    time partition pruning: it appears under the scan's
    PartitionFilters (whole directories skipped before any row is
    read), NOT as a post-scan data Filter, and the pruned result is
    exactly that day's rows."""
    from gmall_spark.operators.scale import write_partitioned
    from gmall_spark.queries import _events

    tmp = str(tmp_path_factory.mktemp("part_events"))
    ev = _events(spark, sf_dir).withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    write_partitioned(ev, tmp, ["dt"])

    back = spark.read.parquet(tmp)
    one_day = ev.select("dt").distinct().orderBy("dt").limit(1).collect()[0][0]
    pruned = back.filter(F.col("dt") == one_day)

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and one_day in pf.group(1), plan[:1500]
    # the predicate is fully consumed by pruning: no residual Filter
    # node re-checks dt row-by-row
    assert not re.search(r"\+- \*?\(?\d*\)? ?Filter .*dt", plan), plan[:1500]
    assert pruned.count() == ev.filter(F.col("dt") == one_day).count()


def test_salted_join_matches_plain_join_and_spreads_hot_key(spark):
    """salted_join must be row-identical to the plain join on a
    skewed fixture (one key holds 80% of the rows) and must execute
    as a SortMergeJoin on the salted composite key — not a broadcast
    (which would hide the exchange shape salting exists to fix)."""
    from gmall_spark.operators.scale import salted_join

    big = spark.createDataFrame(
        [(1 if i % 10 < 8 else i % 100, float(i)) for i in range(2000)],
        "k bigint, v double",
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(100)], "dk bigint, name string"
    )
    salted = salted_join(big, dim, "k", "dk", salt=8)
    plain = big.join(dim, big.k == dim.dk)

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "BroadcastHashJoin" not in plan, plan[:2000]

    got = sorted((r.k, r.v, r.name) for r in salted.collect())
    want = sorted((r.k, r.v, r.name) for r in plain.collect())
    assert got == want
    # determinism across re-evaluation (hash salt, no rand())
    again = sorted((r.k, r.v, r.name) for r in salted.collect())
    assert again == got


def test_zorder_layout_prunes_2d_boxes(spark, sf_dir, tmp_path_factory):
    """Z-order vs 1-D sort: for a 2-D box predicate, far fewer files'
    (a, b) bounding boxes intersect the box under the Morton layout —
    the min/max pruning a lakehouse scan performs. Also: the layout
    must not lose or duplicate rows."""
    from gmall_spark.operators.scale import morton_key, write_zordered

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo = ev.agg(
        F.min("user_id").alias("u0"),
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t0"),
    ).collect()[0]
    # quantize both dims to 16 bits
    q = ev.select(
        ((F.col("user_id") - lo.u0) % 65536).cast("bigint").alias("a"),
        (
            ((F.unix_micros(F.col("ts").cast("timestamp")) - lo.t0) / 60_000_000).cast("bigint")
            % 65536
        ).alias("b"),
    )
    n = q.count()
    base = tmp_path_factory.mktemp("zorder")
    z_dir, lin_dir = str(base / "z"), str(base / "lin")
    write_zordered(q, z_dir, "a", "b", n_files=32)
    # 1-D comparison layout: same file count, sorted by a alone
    q.repartitionByRange(32, "a").sortWithinPartitions("a").write.mode(
        "overwrite"
    ).parquet(lin_dir)

    def hit_fraction(path, a0, a1, b0, b1):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("a").alias("amn"), F.max("a").alias("amx"),
                F.min("b").alias("bmn"), F.max("b").alias("bmx"),
            )
        ).collect()
        hits = sum(
            1 for r in per_file
            if r.amx >= a0 and r.amn <= a1 and r.bmx >= b0 and r.bmn <= b1
        )
        return hits / len(per_file)

    # a box ~1/8 wide in each dimension
    amax, bmax = q.agg(F.max("a"), F.max("b")).collect()[0]
    box = (0, amax // 8, 0, bmax // 8)
    z_frac, lin_frac = hit_fraction(z_dir, *box), hit_fraction(lin_dir, *box)
    # 1-D layout: the b-restriction prunes nothing inside the matching
    # a-range files; z-order tiles both dimensions
    assert z_frac < lin_frac, (z_frac, lin_frac)
    assert z_frac <= 0.5, z_frac
    assert spark.read.parquet(z_dir).count() == n
    # the morton key itself is deterministic pure-integer arithmetic
    k = q.select(morton_key("a", "b").alias("z")).agg(F.sum("z")).collect()[0][0]
    k2 = q.select(morton_key("a", "b").alias("z")).agg(F.sum("z")).collect()[0][0]
    assert k == k2


def test_overwrite_day_partition_repairs_only_target_days(spark, tmp_path_factory):
    """Dynamic partition overwrite: rewriting one day's rows must not
    touch the other days (static mode would truncate everything)."""
    from gmall_spark.operators.scale import overwrite_day_partition

    out = str(tmp_path_factory.mktemp("repair") / "t")
    full = spark.createDataFrame(
        [(d, i, float(i)) for d in ("2024-01-01", "2024-01-02", "2024-01-03")
         for i in range(10)],
        "dt string, k int, v double",
    )
    overwrite_day_partition(full, out)
    # repair day 2 with corrected values (and fewer rows)
    fixed = spark.createDataFrame(
        [("2024-01-02", i, float(i) * 100) for i in range(5)],
        "dt string, k int, v double",
    )
    overwrite_day_partition(fixed, out)
    got = spark.read.parquet(out)
    assert got.filter(F.col("dt") != "2024-01-02").count() == 20  # untouched
    d2 = {r.k: r.v for r in got.filter(F.col("dt") == "2024-01-02").collect()}
    assert d2 == {i: float(i) * 100 for i in range(5)}
    # conf restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") in ("static", "STATIC")
