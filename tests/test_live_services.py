"""Live-services integration: first-class execution of the JDBC/Kafka/
ClickHouse adapters the day real services exist.

The sandbox ships no Postgres, Kafka broker, or ClickHouse, so the
adapters (sources/jdbc.py, streaming/pipeline.py kafka_source) are
contract-tested on their option surfaces in test_adapters.py.  These
tests close the remaining gap: point the SAME code paths at live
endpoints when the environment provides them, and skip cleanly when it
does not.  Enable with:

    PG_URL="jdbc:postgresql://host:5432/db?user=u&password=p"
    PG_SCHEMA="iman"                (optional, default iman)
    PG_TABLE="iman.users"          (optional, default <schema>.users)
    KAFKA_BOOTSTRAP="host:9092"
    KAFKA_TOPICS="postgres_cdc.iman.users"  (optional)
    CLICKHOUSE_URL="jdbc:clickhouse://host:8123/default"

JDBC runs additionally need the driver jars on the session classpath
(e.g. spark.jars.packages=org.postgresql:postgresql:42.7.3,
com.clickhouse:clickhouse-jdbc:0.6.0) — the option builders already
name the driver classes (sources/jdbc.py:26-27).
"""

from __future__ import annotations

import os

import pytest

PG_URL = os.environ.get("PG_URL")
PG_SCHEMA = os.environ.get("PG_SCHEMA", "iman")
PG_TABLE = os.environ.get("PG_TABLE", f"{PG_SCHEMA}.users")
KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")
KAFKA_TOPICS = os.environ.get("KAFKA_TOPICS", f"postgres_cdc.{PG_SCHEMA}.users")
CLICKHOUSE_URL = os.environ.get("CLICKHOUSE_URL")

needs_pg = pytest.mark.skipif(
    not PG_URL, reason="PG_URL not set — no live Postgres in this environment"
)
needs_kafka = pytest.mark.skipif(
    not KAFKA_BOOTSTRAP,
    reason="KAFKA_BOOTSTRAP not set — no live broker in this environment",
)
needs_ch = pytest.mark.skipif(
    not CLICKHOUSE_URL,
    reason="CLICKHOUSE_URL not set — no live ClickHouse in this environment",
)


@needs_pg
def test_live_catalog_discovery(spark):
    """read_catalog against live information_schema (setup.sh:29-30,
    50-52): base tables exist and every table has ordered columns."""
    from kafka_connect_postgres_to_clickhouse_spark.sources.jdbc import read_catalog

    tables_df, columns_df = read_catalog(spark, PG_URL, schema=PG_SCHEMA)
    tables = {r.table_name for r in tables_df.collect()}
    assert tables, f"no tables discovered in schema {PG_SCHEMA!r}"
    cols = columns_df.collect()
    assert {r.table_name for r in cols} >= tables
    assert all(r.ordinal_position >= 1 for r in cols)


@needs_pg
def test_live_snapshot_read(spark):
    """read_snapshot (snapshot.mode=initial twin, setup.sh:92): the
    partitioned key-range scan returns the same rows as a plain read."""
    from kafka_connect_postgres_to_clickhouse_spark.sources.jdbc import read_snapshot

    plain = read_snapshot(spark, PG_URL, PG_TABLE)
    assert plain.columns, "snapshot returned no schema"
    n = plain.count()
    key_cols = [c for c in plain.columns if c.endswith("_id")]
    if key_cols and n:
        ranged = read_snapshot(
            spark, PG_URL, PG_TABLE, key=key_cols[0], num_partitions=4
        )
        assert ranged.count() == n


@needs_pg
def test_live_ddl_generation(spark):
    """Catalog -> ClickHouse DDL (plans/ddl.py twin of setup.sh's
    generated ReplacingMergeTree DDL) runs against the live catalog."""
    from kafka_connect_postgres_to_clickhouse_spark.plans.ddl import generate_ddl
    from kafka_connect_postgres_to_clickhouse_spark.sources.jdbc import read_catalog

    _, columns_df = read_catalog(spark, PG_URL, schema=PG_SCHEMA)
    rows = generate_ddl(columns_df).collect()
    assert rows, "no DDL generated from live catalog"
    assert all("ReplacingMergeTree" in r.ddl for r in rows)


@needs_kafka
def test_live_kafka_source_drains(spark, tmp_path):
    """kafka_source (setup.sh:117 topic subscription) drains at least
    zero records through a real availableNow micro-batch — proves the
    option surface, wire schema projection, and broker connectivity."""
    from kafka_connect_postgres_to_clickhouse_spark.streaming.pipeline import (
        kafka_source,
    )

    stream = kafka_source(spark, KAFKA_BOOTSTRAP, KAFKA_TOPICS)
    out = tmp_path / "kafka_sink"
    (
        stream.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(str(out))
    assert set(got.columns) == {"_seq", "topic", "op", "value"}


@needs_ch
def test_live_clickhouse_roundtrip(spark):
    """write_clickhouse (setup.sh:116-137 sink twin) lands an LWW-
    deduped batch in a live table."""
    from kafka_connect_postgres_to_clickhouse_spark.sources.jdbc import (
        clickhouse_writer_options,
        write_clickhouse,
    )

    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "user_id long, ver long, val string"
    )
    write_clickhouse(df, CLICKHOUSE_URL, "kcptc_live_test", ["user_id"], ["ver"])
    back = (
        spark.read.format("jdbc")
        .options(**clickhouse_writer_options(CLICKHOUSE_URL, "kcptc_live_test"))
        .load()
    )
    rows = {r.user_id: r.val for r in back.collect()}
    assert rows.get(1) == "b" and rows.get(2) == "c"


@needs_pg
@needs_kafka
def test_live_bootstrap_pipeline_end_to_end(spark, tmp_path):
    """Entry point A against real services: live catalog discovery ->
    per-table schemas -> keyed CDC pipeline consuming the live broker
    (bootstrap_pipeline, the setup.sh bootstrap twin)."""
    from kafka_connect_postgres_to_clickhouse_spark.sources.jdbc import read_catalog
    from kafka_connect_postgres_to_clickhouse_spark.streaming.pipeline import (
        bootstrap_pipeline,
        kafka_source,
        read_state,
    )

    tables_df, columns_df = read_catalog(spark, PG_URL, schema=PG_SCHEMA)
    stream = kafka_source(spark, KAFKA_BOOTSTRAP, KAFKA_TOPICS)
    schemas = bootstrap_pipeline(
        tables_df,
        columns_df,
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        version_cols=["updated_at"],
        schema=PG_SCHEMA,
    )
    assert schemas, "bootstrap discovered no tables"
    for t in schemas:
        state = read_state(spark, str(tmp_path / "state" / t))
        assert state is None or state.count() >= 0
