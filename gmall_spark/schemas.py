"""Central schema registry.

The reference scatters schemas across Flink SQL DDL strings and POJOs
(gmall-realtime/.../utils/MyKafkaUtil.java:91-100 ``topic_db`` CDC
envelope; .../app/dwd/log/BaseLogApp.java:117-172 log envelope). Here
they are explicit ``StructType``s shared by batch and streaming paths.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- ODS: CDC envelope (Maxwell format), ref MyKafkaUtil.java:91-100 ---
# {database, table, type, data:{col->val}, old:{col->val}, ts}
CDC_ENVELOPE = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),  # insert|update|delete|bootstrap-insert
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        T.StructField("old", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ts", T.LongType()),  # epoch seconds
    ]
)

# --- ODS: clickstream log envelope, ref BaseLogApp.java:117-172 ---
LOG_COMMON = T.StructType(
    [
        T.StructField("mid", T.StringType()),
        T.StructField("uid", T.StringType()),
        T.StructField("vc", T.StringType()),
        T.StructField("ch", T.StringType()),
        T.StructField("ar", T.StringType()),
        T.StructField("is_new", T.StringType()),
    ]
)
LOG_PAGE = T.StructType(
    [
        T.StructField("page_id", T.StringType()),
        T.StructField("last_page_id", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("item_type", T.StringType()),
        T.StructField("during_time", T.LongType()),
    ]
)
LOG_DISPLAY = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("item_type", T.StringType()),
        T.StructField("pos_id", T.StringType()),
    ]
)
LOG_ACTION = T.StructType(
    [
        T.StructField("action_id", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("item_type", T.StringType()),
        T.StructField("ts", T.LongType()),
    ]
)
LOG_ENVELOPE = T.StructType(
    [
        T.StructField("common", LOG_COMMON),
        T.StructField("page", LOG_PAGE),
        T.StructField("displays", T.ArrayType(LOG_DISPLAY)),
        T.StructField("actions", T.ArrayType(LOG_ACTION)),
        T.StructField("start", T.MapType(T.StringType(), T.StringType())),
        T.StructField("err", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ts", T.LongType()),  # epoch millis
    ]
)

# --- config routing table, ref bean/TableProcess.java:11-17 ---
TABLE_PROCESS = T.StructType(
    [
        T.StructField("source_table", T.StringType()),
        T.StructField("sink_table", T.StringType()),
        T.StructField("sink_columns", T.StringType()),
        T.StructField("sink_pk", T.StringType()),
        T.StructField("sink_extend", T.StringType()),
    ]
)

DECIMAL_MONEY = T.DecimalType(16, 2)
