"""Source adapters: parquet tables, synthetic CDC/log envelope derivation,
Kafka/JDBC connectors (thin, swappable)."""
