"""Warehouse layers as pure DataFrame->DataFrame functions.

dwd: cleaned fact streams; dws: windowed aggregates; ads: dashboard
queries. Every function is batch/streaming agnostic (batch-core,
streaming-shell) — see gmall_spark.streaming for the streaming wrappers.
"""
