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
@needs_ch
def test_live_golden_sequence_reference_replay(spark, tmp_path):
    """The reference's exact end-to-end demo (setup.sh:150-207) against
    live services, with the assertions the reference only prints:

    1. three INSERTs (user1/Bronze, user2/Silver, user3/Gold,
       setup.sh:156-161) -> mirrored state equals the golden TSV the
       reference asserts (setup.sh:183-189);
    2. DELETE user_id=1 (setup.sh:194) -> the row PERSISTS in the sink
       — the documented drop-deletes semantic (tombstones.on.delete=
       false + drop.tombstones, SURVEY.md section 0); the reference's
       own 'DELETE sync test' only prints this (setup.sh:195-197);
    3. INSERT 999 then UPDATE to 'updated_user' (setup.sh:202-205) ->
       LWW upsert lands the updated row;
    4. the final state writes to live ClickHouse and reads back equal
       (the setup.sh:177-189 sink leg).

    Requires the Debezium source connector feeding KAFKA_TOPICS from
    PG_TABLE (the reference's postgres-connect service).  DML goes
    through the JVM's own JDBC driver (already on the classpath for
    the Spark JDBC reads), so no Python Postgres client is needed."""
    import time

    from pyspark.sql import types as T

    from kafka_connect_postgres_to_clickhouse_spark.sources.jdbc import (
        clickhouse_writer_options,
        write_clickhouse,
    )
    from kafka_connect_postgres_to_clickhouse_spark.streaming.pipeline import (
        kafka_source,
        read_state,
        run_cdc_pipeline,
    )

    users_schema = T.StructType(
        [
            T.StructField("user_id", T.IntegerType(), False),
            T.StructField("username", T.StringType()),
            T.StructField("account_type", T.StringType()),
            T.StructField("updated_at", T.TimestampType()),
        ]
    )
    state_dir, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    conn = spark._jvm.java.sql.DriverManager.getConnection(PG_URL)
    try:
        def sql(stmt: str) -> None:
            s = conn.createStatement()
            try:
                s.execute(stmt)
            finally:
                s.close()

        def drain_until(pred, timeout_s: float = 90.0):
            """availableNow drains + state read until pred(state map)."""
            deadline = time.time() + timeout_s
            state = {}
            while time.time() < deadline:
                run_cdc_pipeline(
                    kafka_source(spark, KAFKA_BOOTSTRAP, KAFKA_TOPICS),
                    users_schema, state_dir, ckpt,
                    ["user_id"], ["updated_at"],
                )
                df = read_state(spark, state_dir)
                state = (
                    {}
                    if df is None
                    else {
                        r.user_id: (r.username, r.account_type)
                        for r in df.select(
                            "user_id", "username", "account_type"
                        ).collect()
                    }
                )
                if pred(state):
                    return state
                time.sleep(2)
            raise AssertionError(f"timed out waiting for sync; state={state}")

        # fresh replay slate (reference assumes a fresh DB); the DELETEs
        # emit op='d' events which the pipeline drops by design, and the
        # state dir is fresh, so nothing stale leaks into assertions
        sql(f"DELETE FROM {PG_TABLE} WHERE user_id IN (1, 2, 3, 999)")

        # 1. the reference's three INSERTs (setup.sh:156-161)
        sql(
            f"INSERT INTO {PG_TABLE} (user_id, username, account_type,"
            " updated_at, created_at) VALUES"
            " (1, 'user1', 'Bronze', now(), now()),"
            " (2, 'user2', 'Silver', now(), now()),"
            " (3, 'user3', 'Gold', now(), now())"
        )
        golden = {1: ("user1", "Bronze"), 2: ("user2", "Silver"), 3: ("user3", "Gold")}
        state = drain_until(lambda s: {k: s.get(k) for k in golden} == golden)

        # 2. DELETE does NOT propagate (setup.sh:191-197 semantic)
        sql(f"DELETE FROM {PG_TABLE} WHERE user_id = 1")
        time.sleep(5)
        state = drain_until(lambda s: s.get(1) == ("user1", "Bronze"))

        # 3. INSERT then UPDATE (setup.sh:199-205): LWW lands the update
        sql(
            f"INSERT INTO {PG_TABLE} (user_id, username, account_type,"
            " updated_at, created_at) VALUES (999, 'test_user', 'Test', now(), now())"
        )
        sql(
            f"UPDATE {PG_TABLE} SET username = 'updated_user',"
            " updated_at = now() WHERE user_id = 999"
        )
        state = drain_until(lambda s: s.get(999) == ("updated_user", "Test"))
        for k, v in golden.items():
            assert state[k] == v

        # 4. ClickHouse sink leg: mirror the state, read it back equal
        final = read_state(spark, state_dir).select(
            "user_id", "username", "account_type", "updated_at"
        )
        write_clickhouse(
            final, CLICKHOUSE_URL, "kcptc_golden_users", ["user_id"], ["updated_at"]
        )
        back = (
            spark.read.format("jdbc")
            .options(**clickhouse_writer_options(CLICKHOUSE_URL, "kcptc_golden_users"))
            .load()
        )
        mirrored = {
            r.user_id: (r.username, r.account_type)
            for r in back.select("user_id", "username", "account_type").collect()
        }
        assert {k: mirrored.get(k) for k in state} == state
    finally:
        conn.close()


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
