"""Unit layer: envelope serde fidelity, type map arms, DDL golden string."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_postgres_to_clickhouse_spark.operators.envelope import (
    build_envelope_json,
    parse_envelope,
)
from kafka_connect_postgres_to_clickhouse_spark.plans.ddl import generate_ddl
from kafka_connect_postgres_to_clickhouse_spark.plans.typemap import (
    pg_to_clickhouse,
    pg_to_spark,
)
from kafka_connect_postgres_to_clickhouse_spark.sources.catalog import (
    catalog_columns_df,
)
from kafka_connect_postgres_to_clickhouse_spark.sources.changelog import (
    reference_scenario_changelog,
)

GOLDEN_DDL = (
    "CREATE TABLE IF NOT EXISTS iman.users (user_id UInt32, username String, "
    "account_type String, updated_at DateTime64(6), created_at DateTime64(6)) "
    "ENGINE = ReplacingMergeTree() ORDER BY user_id;"
)


def test_typemap_every_arm():
    # one assert per CASE arm of reference setup.sh:40-49
    assert pg_to_clickhouse("integer") == "UInt32"
    assert pg_to_clickhouse("bigint") == "UInt64"
    assert pg_to_clickhouse("numeric") == "Decimal(18,2)"
    assert pg_to_clickhouse("text") == "String"
    assert pg_to_clickhouse("character varying") == "String"
    assert pg_to_clickhouse("timestamp without time zone") == "DateTime64(6)"
    assert pg_to_clickhouse("uuid") == "UUID"
    assert pg_to_clickhouse("jsonb") == "String"  # fallback setup.sh:48
    assert pg_to_spark("integer") == T.IntegerType()
    assert pg_to_spark("timestamp without time zone") == T.TimestampType()


def test_ddl_matches_reference_golden(spark):
    """README.md:108 golden DDL string, byte for byte."""
    out = {
        r.table_name: r.ddl
        for r in generate_ddl(catalog_columns_df(spark)).collect()
    }
    assert out["users"] == GOLDEN_DDL


def test_envelope_roundtrip_and_shape(spark):
    log = reference_scenario_changelog(spark)
    payload = log.select("user_id", "username", "account_type", "updated_at")
    wire = log.select(
        "_seq",
        build_envelope_json(payload.schema, "postgres_cdc.iman.users.Value").alias(
            "value"
        ),
    )
    raw = json.loads(wire.filter(F.col("_seq") == 1).collect()[0].value)
    # envelope shape of README.md:127-129
    assert set(raw) == {"schema", "payload"}
    assert raw["schema"]["name"] == "postgres_cdc.iman.users.Value"
    fields = {f["field"]: f for f in raw["schema"]["fields"]}
    assert fields["user_id"]["type"] == "int32"
    assert fields["updated_at"]["name"] == "io.debezium.time.MicroTimestamp"
    assert isinstance(raw["payload"]["updated_at"], int)  # epoch micros

    parsed = parse_envelope(wire, payload.schema)
    back = parsed.filter(F.col("_seq") == 1).collect()[0]
    orig = log.filter(F.col("_seq") == 1).collect()[0]
    assert back.user_id == orig.user_id
    assert back.updated_at == orig.updated_at  # microsecond-exact
    assert not back._corrupt


def test_corrupt_record_routed_not_fatal(spark):
    log = reference_scenario_changelog(spark)
    payload = log.select("user_id", "username", "account_type", "updated_at")
    wire = log.select(
        "_seq",
        build_envelope_json(payload.schema, "x").alias("value"),
    ).withColumn(
        "value",
        F.when(F.col("_seq") == 2, F.lit('{"schema": {"broken'))
        .otherwise(F.col("value")),
    )
    parsed = parse_envelope(wire, payload.schema)
    assert parsed.filter(F.col("_corrupt")).count() == 1
    assert parsed.filter(~F.col("_corrupt")).count() == 5
