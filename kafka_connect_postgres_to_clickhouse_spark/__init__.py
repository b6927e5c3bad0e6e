"""PySpark-native analytics engine with the capabilities of the
``iman-sandbox/kafka-connect-postgres-to-clickhouse`` reference pipeline.

The reference (see /root/repo/SURVEY.md) is a configuration-driven CDC
ETL pipeline: PostgreSQL -> Debezium -> Kafka -> ClickHouse
(ReplacingMergeTree).  This package re-expresses its observable
semantics Spark-first:

- ``sources``    parquet/changelog loaders, catalog reader fixtures
- ``operators``  envelope parse/unwrap, LWW upsert/dedup, relational
                 query surface, event-time windows, EXT analytics
- ``functions``  scalar helpers (vector math, text analysis)
- ``plans``      query registry (queries + DuckDB oracle SQL), DDL
                 generation / type mapping
- ``streaming``  Structured Streaming wrappers (readStream ->
                 foreachBatch upsert with checkpointing)

Everything is public PySpark DataFrame / SQL API; no RDDs, no custom
Catalyst rules (SURVEY.md section 4 shows none are needed).
"""

__version__ = "0.1.0"
