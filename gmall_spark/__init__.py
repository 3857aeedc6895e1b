"""gmall_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the reference
real-time e-commerce warehouse (whb-bigdata/gmall-211027-flink-master,
Flink 1.13 DataStream + Flink SQL + ClickHouse SQL) as an idiomatic
Spark engine:

- **Batch-core, streaming-shell**: every pipeline is a pure function
  ``f(dict[str, DataFrame]) -> DataFrame`` over static DataFrames, then
  wrapped unchanged in Structured Streaming (``readStream`` →
  ``foreachBatch``) for the streaming deployment. This keeps every
  operator testable against a DuckDB oracle while preserving the
  reference's streaming semantics.
- **Catalyst-first**: predicate pushdown, column pruning, broadcast
  joins, AQE and whole-stage codegen replace the reference's hand-built
  caches, async dim lookups and lookup-join machinery.
- Layers mirror the reference warehouse: DWD (cleaned facts), DWS
  (windowed aggregates), ADS (dashboard queries) in ``plans/``;
  reusable operators in ``operators/``; scalar/text/vector functions in
  ``functions/``; Structured Streaming wrappers in ``streaming/``.
"""

__version__ = "0.1.0"

from gmall_spark.session import get_session  # noqa: F401
