"""Contract tests for the live-system adapters (VERDICT r1 item 7).

No Postgres/Kafka/ClickHouse exists in the sandbox, so the connection
itself cannot be exercised; these tests pin down everything decidable
WITHOUT a connection — reader/writer option dicts, the empty-table
bounds fallback, catalog SQL strings — so a regression in the adapter
surface is caught by pytest rather than in production.

Reference parity: setup.sh:92 (snapshot), :29-30,50-52 (catalog),
:116-137 (sink), :117,144 (topic subscription / offset reset).
"""

from __future__ import annotations

from kafka_connect_postgres_to_clickhouse_spark.sources.jdbc import (
    CH_DRIVER,
    PG_DRIVER,
    bounds_query,
    catalog_queries,
    clickhouse_writer_options,
    snapshot_reader_options,
)
from kafka_connect_postgres_to_clickhouse_spark.streaming.pipeline import (
    kafka_reader_options,
)

PG_URL = "jdbc:postgresql://postgres:5432/iman"
CH_URL = "jdbc:clickhouse://clickhouse:8123/iman"


def test_snapshot_options_partitioned():
    opts = snapshot_reader_options(
        PG_URL, "users", key="user_id", lo=1, hi=999, num_partitions=16
    )
    assert opts == {
        "url": PG_URL,
        "dbtable": "users",
        "driver": PG_DRIVER,
        "partitionColumn": "user_id",
        "lowerBound": "1",
        "upperBound": "999",
        "numPartitions": "16",
    }


def test_snapshot_options_empty_table_falls_back_unpartitioned():
    # a NULL min/max (empty table) must NOT emit partition options —
    # Spark would receive lowerBound="None" and fail at plan time
    for lo, hi in [(None, None), (1, None), (None, 9)]:
        opts = snapshot_reader_options(PG_URL, "users", key="user_id", lo=lo, hi=hi)
        assert "partitionColumn" not in opts
        assert "lowerBound" not in opts
        assert opts["dbtable"] == "users"


def test_snapshot_options_no_key_and_extra_properties():
    opts = snapshot_reader_options(
        PG_URL, "users", properties={"fetchsize": "5000", "user": "iman"}
    )
    assert opts["fetchsize"] == "5000"
    assert opts["user"] == "iman"
    assert "numPartitions" not in opts


def test_bounds_query_shape():
    assert bounds_query("user_id", "users") == (
        "SELECT min(user_id) lo, max(user_id) hi FROM users"
    )


def test_catalog_queries_match_reference_probes():
    tables, columns = catalog_queries("iman")
    assert "information_schema.tables" in tables
    assert "table_schema = 'iman'" in tables
    assert "information_schema.columns" in columns
    # ordinal order is what the DDL generator and bootstrap rely on
    assert "ORDER BY table_name, ordinal_position" in columns
    # every column the typemap/bootstrap consumes is projected
    for col in ("column_name", "ordinal_position", "data_type", "is_nullable"):
        assert col in columns


def test_clickhouse_writer_options():
    opts = clickhouse_writer_options(CH_URL, "users")
    assert opts == {
        "url": CH_URL,
        "dbtable": "users",
        "driver": CH_DRIVER,
        "batchsize": "10000",
        "isolationLevel": "NONE",
    }


def test_kafka_reader_options():
    opts = kafka_reader_options("kafka:9092", "postgres_cdc.iman.users")
    assert opts == {
        "kafka.bootstrap.servers": "kafka:9092",
        "subscribe": "postgres_cdc.iman.users",
        # setup.sh:144 consumer.override.auto.offset.reset=earliest
        "startingOffsets": "earliest",
    }
