"""Unit tests for the generic relational operators: backward as-of
join, gap sessionization, BM25 ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_spark.operators.ranking import bm25_topk
from gmall_spark.operators.relational import asof_join_backward, sessionize_gap


def test_asof_join_backward_fixture(spark):
    """Hand fixture: <= semantics, tie-break by max payload, NULL on
    no-prior-match, later right rows ignored."""
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 50, "p2"), (2, 10, "p3"), (1, 200, "p4")],
        "k bigint, ts bigint, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, 50, "v_at_50"),     # equal-ts: visible to p2
            (1, 90, "v_at_90a"),
            (1, 90, "v_at_90b"),    # tie at ts=90: max payload wins
            (1, 150, "v_at_150"),
            (2, 20, "v_late"),      # after p3: not visible
        ],
        "k bigint, ts bigint, vid string",
    )
    out = {
        r["pid"]: (r["vid"], r["ts_right"])
        for r in asof_join_backward(left, right, "k", "ts").collect()
    }
    assert out["p1"] == ("v_at_90b", 90)
    assert out["p2"] == ("v_at_50", 50)
    assert out["p3"] == (None, None)
    assert out["p4"] == ("v_at_150", 150)


def test_asof_join_rejects_ambiguous_columns(spark):
    df = spark.createDataFrame([(1, 1, "x")], "k bigint, ts bigint, a string")
    try:
        asof_join_backward(df, df, "k", "ts")
    except ValueError as e:
        assert "ambiguous" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_sessionize_gap_matches_native_session_window(spark, sf_dir):
    """Cross-validate the lag/cumsum islands operator against Spark's
    native session_window on real event data: identical session
    boundaries (count, min ts, max ts per session)."""
    from gmall_spark import queries as q

    ev = q._events(spark, sf_dir).select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("ts_us")
    )
    gap_us = 30 * 60 * 1_000_000

    ours = (
        sessionize_gap(ev, "user_id", "ts_us", gap_us, "event_id")
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts_us").alias("stt"),
            F.max("ts_us").alias("edt"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("user_id", "stt", "edt", "n")
    )
    native = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("stt"),
            (F.unix_micros("session_window.end") - gap_us).alias("edt"),
            "n",
        )
    )
    assert ours.exceptAll(native).count() == 0
    assert native.exceptAll(ours).count() == 0


def test_sessionize_gap_boundary_is_new_session(spark):
    """An event at exactly prev + gap starts a NEW session (session
    windows are half-open)."""
    ev = spark.createDataFrame(
        [(1, 1, 0), (1, 2, 500), (1, 3, 1500), (1, 4, 1600)],
        "k bigint, eid bigint, ts bigint",
    )
    out = {
        r["eid"]: r["session_seq"]
        for r in sessionize_gap(ev, "k", "ts", 1000, "eid").collect()
    }
    # 1500 is exactly 500 + gap: the [500, 1500) window excludes it
    assert out == {1: 1, 2: 1, 3: 2, 4: 2}


def test_bm25_ranks_relevant_doc_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "vector vector vector hash"),
            (2, "vector table scan"),
            (3, "table scan join filter"),
            (4, "merge merge vector hash hash"),
        ],
        "doc_id bigint, text string",
    )
    rows = bm25_topk(docs, ("vector", "hash"), k=10).collect()
    ids = [r["doc_id"] for r in rows]
    # doc 3 matches nothing -> excluded; heaviest matches rank first
    assert 3 not in ids
    assert set(ids) == {1, 2, 4}
    assert ids[0] in (1, 4)
    scores = {r["doc_id"]: r["bm25"] for r in rows}
    assert scores[2] < scores[1] and scores[2] < scores[4]


def test_hll_sketch_accuracy_and_merge_identity(spark):
    """HLL UV sketches: <=5% relative error at 200k cardinality at
    lg_k=12 (~1.6% RSE), and the union of per-group sketches equals
    the one-pass whole-set sketch EXACTLY (same deterministic sketch
    of the same key set) — the property that lets day sketches roll
    up to months without rescanning."""
    from gmall_spark.operators import sketches

    df = spark.range(200_000).select(
        (F.col("id") % 10).alias("g"), F.col("id").alias("k")
    )
    sk = sketches.uv_sketch(df, "g", "k")
    per_group = {r.grain: r.uv_approx for r in sketches.estimate(sk).collect()}
    for g, est in per_group.items():
        assert abs(est - 20_000) / 20_000 <= 0.05, (g, est)
    merged = sketches.merged_estimate(sk).collect()[0][0]
    direct = df.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("k", F.lit(sketches.LG_K))
        ).cast("bigint")
    ).collect()[0][0]
    assert merged == direct
    assert abs(merged - 200_000) / 200_000 <= 0.05


def test_uv_sketch_exact_at_low_cardinality(spark, sf_dir):
    """At cardinalities far below 2^lg_k the sketch estimate must be
    exact — pin it against count_distinct on the events table."""
    from gmall_spark import queries as q
    from gmall_spark.operators import sketches

    ev = q._events(spark, sf_dir)
    sk = sketches.uv_sketch(ev, F.date_format("ts", "yyyy-MM-dd"), "user_id")
    est = {r.grain: r.uv_approx for r in sketches.estimate(sk).collect()}
    exact = {
        r.grain: r.uv
        for r in ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("grain"))
        .agg(F.count_distinct("user_id").alias("uv"))
        .collect()
    }
    assert est == exact



def test_approx_quantiles_rank_accuracy(spark, sf_dir):
    """percentile_approx returns an ACTUAL data value (no
    interpolation); at accuracy 10000 its rank must be within
    max(1, n/10000) of the target rank per event type."""
    from bisect import bisect_left, bisect_right

    from gmall_spark import queries as q

    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in q.QUERIES["events_value_quantiles_approx"](spark, sf_dir).collect()
    }
    vals: dict = {}
    for r in q._events(spark, sf_dir).select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    assert set(approx) == set(vals)
    for et, xs in vals.items():
        xs.sort()
        n = len(xs)
        for p, a in zip((0.5, 0.9, 0.99), approx[et]):
            lo, hi = bisect_left(xs, a), bisect_right(xs, a) - 1
            assert lo <= hi, f"{et}: approx {a} not an actual value"
            target = p * (n - 1)
            tol = max(1.0, n / 10_000)
            assert lo - tol <= target <= hi + tol, (et, p, a, lo, hi, target)


def test_asof_join_null_keys_and_ts_never_match(spark):
    """SQL join semantics: NULL key/ts on the right never matches;
    NULL key/ts on the left yields NULL right columns."""
    left = spark.createDataFrame(
        [(1, 100, "ok"), (None, 100, "nullkey"), (1, None, "nullts")],
        "k bigint, ts bigint, pid string",
    )
    right = spark.createDataFrame(
        [(1, 50, "v1"), (None, 10, "vnullkey"), (1, None, "vnullts")],
        "k bigint, ts bigint, vid string",
    )
    from gmall_spark.operators.relational import asof_join_backward

    out = {r["pid"]: r["vid"] for r in
           asof_join_backward(left, right, "k", "ts").collect()}
    assert out == {"ok": "v1", "nullkey": None, "nullts": None}


def test_scd2_history_chains_versions(spark):
    from gmall_spark.operators.dedup import scd2_history

    ch = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "x")],
        "id bigint, ts bigint, v string",
    )
    got = {
        (r.id, r.v): (r.valid_to, r.is_current)
        for r in scd2_history(ch, ["id"], "ts", ["v"]).collect()
    }
    assert got == {
        (1, "a"): (20, False),
        (1, "b"): (30, False),
        (1, "c"): (None, True),
        (2, "x"): (None, True),
    }



def test_funnel_requires_stage_order(spark):
    """A click BEFORE the first view must not count as a completed
    view->click prefix (the funnel is ordered, not set-membership)."""
    from gmall_spark.operators.relational import funnel_ordered

    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),  # full
        (2, "click", 50), (2, "view", 100),                          # out of order
        (3, "view", 10),                                             # view only
        (4, "purchase", 5),                                          # no view
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_type string, us bigint"
    ).select("user_id", "event_type", F.timestamp_micros("us").alias("ts"))
    row = funnel_ordered(ev, ("view", "click", "purchase")).collect()[0]
    assert (row.n_users, row.stage_0_ct, row.stage_1_ct, row.stage_2_ct) == (4, 3, 1, 1)
