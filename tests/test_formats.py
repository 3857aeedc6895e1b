"""Round-trip tests for the generic batch file-format connectors."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gmall_spark.sources.formats import SUPPORTED, read_table, write_table


def _events(spark, sf_dir):
    from gmall_spark.queries import _events as q_events

    return q_events(spark, sf_dir)


@pytest.mark.parametrize("fmt", SUPPORTED)
def test_format_round_trip(spark, sf_dir, fmt, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp(f"fmt_{fmt}"))
    ev = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    write_table(ev, f"{tmp}/t", fmt)
    back = read_table(spark, f"{tmp}/t", fmt, ev.schema)
    assert back.schema == ev.schema
    assert back.count() == ev.count()
    # value-level equality both directions
    assert ev.exceptAll(back).count() == 0
    assert back.exceptAll(ev).count() == 0


def test_csv_rejects_nested_and_binary(spark):
    df = spark.range(1).select(F.array(F.lit(1)).alias("a"))
    with pytest.raises(ValueError, match="csv cannot round-trip"):
        write_table(df, "/tmp/never_written", "csv")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "/tmp/x", "avro", spark.range(1).schema)
