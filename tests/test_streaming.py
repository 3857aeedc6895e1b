"""Streaming-equals-batch tests (SURVEY §5: incremental-equals-batch).

Each test materializes a small input to parquet, runs the streaming
formulation with an availableNow trigger into a memory sink, and
asserts equality with the batch-core formulation on the same rows.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from gmall_spark.operators.dedup import dedup_first
from gmall_spark.operators.uv import first_of_day_flag
from gmall_spark.operators.windows import tumble_agg
from gmall_spark.sources import log_gen
from gmall_spark.streaming import runner, stateful


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="gmall_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _page_log_parquet(spark, sf_dir, tmpdir):
    path = f"{tmpdir}/page_log"
    pl = log_gen.page_log(_events(spark, sf_dir))
    pl.drop("displays").write.mode("overwrite").parquet(path)
    return path, spark.read.parquet(path)


def _run_to_memory(stream_df, name, checkpoint, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_window_agg_equals_batch(spark, sf_dir, tmpdir):
    path, batch_df = _page_log_parquet(spark, sf_dir, tmpdir)
    stream = runner.stream_from_parquet(spark, path, batch_df.schema).withColumn(
        "rt", F.timestamp_micros(F.col("ts_us"))
    )
    agg = runner.windowed_agg_stream(
        stream, "rt", "2 seconds", 10, ["ch"], [F.count(F.lit(1)).alias("pv_ct")]
    )
    _run_to_memory(agg, "win_out", f"{tmpdir}/ckpt_win")
    got = {
        (r.stt, r.ch): r.pv_ct for r in spark.sql("SELECT * FROM win_out").collect()
    }
    expected_df = tumble_agg(
        batch_df.withColumn("rt", F.timestamp_micros(F.col("ts_us"))),
        "rt",
        10,
        ["ch"],
        [F.count(F.lit(1)).alias("pv_ct")],
    )
    expected = {(r.stt, r.ch): r.pv_ct for r in expected_df.collect()}
    # append mode only emits windows the final watermark passed; all
    # emitted windows must match the batch result exactly
    assert got, "streaming produced no windows"
    for k, v in got.items():
        assert expected.get(k) == v, f"window {k}: stream {v} != batch {expected.get(k)}"
    missing = set(expected) - set(got)
    # only the tail windows (within watermark of max ts) may be unemitted
    assert len(missing) < 5, f"{len(missing)} windows missing from append output"


def test_streaming_dedup_equals_batch(spark, sf_dir, tmpdir):
    path, batch_df = _page_log_parquet(spark, sf_dir, tmpdir)
    stream = runner.stream_from_parquet(spark, path, batch_df.schema).withColumn(
        "rt", F.timestamp_micros(F.col("ts_us"))
    )
    dd = runner.streaming_dedup(stream, ["mid", "dt"], "rt", "2 seconds")
    _run_to_memory(dd, "dedup_out", f"{tmpdir}/ckpt_dedup")
    got = spark.sql("SELECT mid, dt FROM dedup_out").collect()
    got_keys = {(r.mid, r.dt) for r in got}
    expected_keys = {
        (r.mid, r.dt)
        for r in dedup_first(batch_df, ["mid", "dt"], "ts_us").select("mid", "dt").collect()
    }
    # dropDuplicates keeps an arbitrary first-seen row, but the KEY SET
    # must match the batch dedup exactly, with no duplicates emitted
    assert len(got) == len(got_keys), "streaming dedup emitted duplicate keys"
    assert got_keys == expected_keys


def test_stateful_uv_equals_batch(spark, sf_dir, tmpdir):
    path, batch_df = _page_log_parquet(spark, sf_dir, tmpdir)
    stream = runner.stream_from_parquet(spark, path, batch_df.schema)
    uv = stateful.streaming_unique_visitor(stream)
    _run_to_memory(uv, "uv_out", f"{tmpdir}/ckpt_uv")
    got = {(r.mid, r.dt) for r in spark.sql("SELECT * FROM uv_out").collect()}
    expected = {
        (r.mid, r.dt)
        for r in first_of_day_flag(batch_df, "mid", "dt", ["ts_us", "event_id"], "f")
        .filter(F.col("f") == 1)
        .select("mid", "dt")
        .collect()
    }
    assert got == expected
