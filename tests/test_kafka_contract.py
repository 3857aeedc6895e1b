"""Kafka adapter contract tests — no broker required (VERDICT r3 #4).

The sandbox has no Kafka broker or connector jar, so S1-S4 run through
file-source twins everywhere else. These tests pin the parts that
WOULD hit the wire: the exact option dicts (a typo'd option key is
silently ignored by the connector — wrong behavior, no error) and the
record payload contract (key/value column names+types the kafka sink
requires; value JSON that the source's parse stage round-trips against
the shared schemas). Ref utils/MyKafkaUtil.java:24-89.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from gmall_spark import schemas
from gmall_spark.streaming import runner


def test_kafka_source_option_contract():
    got = runner.kafka_source_options("broker1:9092,broker2:9092", "topic_db")
    assert got == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "topic_db",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
    }
    # offset override passes through verbatim (e.g. "earliest" or a
    # per-partition JSON dict)
    assert (
        runner.kafka_source_options("b:9092", "t", "earliest")["startingOffsets"]
        == "earliest"
    )


def test_kafka_sink_option_contract():
    got = runner.kafka_sink_options("b:9092", "dwd_trade_order_detail", "/ckpt/x")
    assert got == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "dwd_trade_order_detail",
        "checkpointLocation": "/ckpt/x",
    }


def test_kafka_payload_schema_is_sink_compatible(spark):
    """The kafka sink requires 'value' (and optional 'key') as string
    or binary columns with exactly those names; anything else fails at
    start() on a real cluster."""
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    keyed = runner.kafka_payload(df, key_col="id")
    assert keyed.columns == ["key", "value"]
    assert dict(keyed.dtypes) == {"key": "string", "value": "string"}
    unkeyed = runner.kafka_payload(df)
    assert unkeyed.columns == ["value"]
    assert dict(unkeyed.dtypes) == {"value": "string"}


def test_cdc_envelope_round_trips_through_wire_schema(spark):
    """Sink payload -> Kafka wire shape (key/value BINARY, like the
    connector delivers) -> source parse stage must recover the CDC
    envelope exactly, including map columns and null 'old'."""
    rows = [
        (
            "gmall",
            "order_info",
            "update",
            {"id": "7", "order_status": "1002", "total_amount": "99.50"},
            {"order_status": "1001"},
            1654000000,
        ),
        ("gmall", "cart_info", "insert", {"id": "8", "sku_num": "2"}, None, 1654000001),
    ]
    df = spark.createDataFrame(rows, schemas.CDC_ENVELOPE)
    wire = runner.kafka_payload(df, key_col="table").select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.current_timestamp().alias("timestamp"),
    )
    parsed = runner.parse_kafka_value(wire, schemas.CDC_ENVELOPE)
    assert parsed.columns == [f.name for f in schemas.CDC_ENVELOPE.fields] + [
        "timestamp"
    ]
    back = {
        r["data"]["id"]: r for r in parsed.collect()
    }
    assert back["7"]["type"] == "update" and back["7"]["old"] == {
        "order_status": "1001"
    }
    assert back["8"]["old"] is None and back["8"]["ts"] == 1654000001
    # key bytes are the PK string, utf-8 — what upsert-kafka compaction
    # and keyed consumers see (S4)
    keys = {bytes(r["key"]).decode() for r in wire.collect()}
    assert keys == {"order_info", "cart_info"}


def test_log_envelope_round_trips_through_wire_schema(spark):
    """The clickstream envelope (nested structs + arrays + maps) must
    survive sink payload -> wire -> source parse unchanged."""
    line = {
        "common": {
            "mid": "mid_1",
            "uid": "42",
            "vc": "v2.1",
            "ch": "huawei",
            "ar": "110000",
            "is_new": "1",
        },
        "page": {
            "page_id": "good_detail",
            "last_page_id": "home",
            "item": "35",
            "item_type": "sku_id",
            "during_time": 12000,
        },
        "displays": [
            {"item": "1", "item_type": "sku_id", "pos_id": "2"},
            {"item": "9", "item_type": "sku_id", "pos_id": "5"},
        ],
        "actions": [
            {"action_id": "cart_add", "item": "35", "item_type": "sku_id", "ts": 165}
        ],
        "start": None,
        "err": {"error_code": "1203"},
        "ts": 1654000123456,
    }
    raw = spark.createDataFrame([(json.dumps(line),)], "value string")
    env = raw.select(
        F.from_json("value", schemas.LOG_ENVELOPE).alias("j")
    ).select("j.*")
    wire = runner.kafka_payload(env).select(
        F.col("value").cast("binary").alias("value"),
        F.current_timestamp().alias("timestamp"),
    )
    r = runner.parse_kafka_value(wire, schemas.LOG_ENVELOPE).collect()[0]
    assert r["common"]["mid"] == "mid_1" and r["common"]["is_new"] == "1"
    assert r["page"]["during_time"] == 12000
    assert [d["pos_id"] for d in r["displays"]] == ["2", "5"]
    assert r["actions"][0]["action_id"] == "cart_add"
    assert r["start"] is None and r["err"] == {"error_code": "1203"}
    assert r["ts"] == 1654000123456


def test_parse_kafka_value_bad_json_yields_null_struct(spark):
    """P1 dirty side-output contract: a corrupt value must not kill
    the stream — it parses to an all-null row callers filter out."""
    wire = spark.createDataFrame(
        [(b"{broken json!!",), (b'{"database":"gmall","table":"t1"}',)],
        "value binary",
    ).withColumn("timestamp", F.current_timestamp())
    parsed = runner.parse_kafka_value(wire, schemas.CDC_ENVELOPE)
    rows = parsed.collect()
    assert len(rows) == 2
    by_table = {r["table"] for r in rows}
    assert by_table == {None, "t1"}


def test_kafka_payload_key_extraction_matches_reference_upsert(spark):
    """S4 upsert-kafka analog: the key column is the stringified PK so
    latest-per-key compaction reconstructs the changelog; every value
    must parse back to a row whose PK equals its key."""
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (1, "a2", 30)], "id long, v string, ts long"
    )
    wire = runner.kafka_payload(df, key_col="id")
    back = wire.select(
        "key", F.from_json("value", "id long, v string, ts long").alias("j")
    )
    for r in back.collect():
        assert r["key"] == str(r["j"]["id"])
