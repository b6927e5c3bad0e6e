"""Production source/sink adapters: PostgreSQL over JDBC, ClickHouse sink.

These are the live-system twins of the fixture-backed paths used by the
correctness gate (no Postgres/ClickHouse/Kafka in the test container,
so nothing here is exercised by t2 — it is kept thin, declarative, and
documented against the reference configs for parity review).

Reference parity map:
- snapshot read           <- snapshot.mode=initial      (setup.sh:92)
- catalog discovery       <- information_schema queries (setup.sh:29-30,50-52)
- partitioned parallel read <- tasks.max (setup.sh:148), generalized:
  Spark reads N key ranges concurrently instead of one task
- ClickHouse sink         <- HTTP batch insert (setup.sh:128-132) via
  the ClickHouse JDBC driver; LWW dedup before write replaces
  ReplacingMergeTree's lazy merge with an eager, deterministic one
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import lww_dedup

PG_DRIVER = "org.postgresql.Driver"
CH_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def read_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    key: str | None = None,
    num_partitions: int = 32,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Initial snapshot scan (setup.sh:92) with key-range parallelism.

    With ``key`` given, Spark issues ``num_partitions`` bounded-range
    queries concurrently — the scalable form of the reference's single
    snapshot task.  Predicate/column pushdown into Postgres is free.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", PG_DRIVER)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if key is not None:
        bounds = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", PG_DRIVER)
            .option("query", f"SELECT min({key}) lo, max({key}) hi FROM {table}")
            .load()
            .collect()[0]
        )
        # an empty table yields NULL bounds — fall back to a single
        # unpartitioned read instead of passing "None" to the reader
        if bounds.lo is not None and bounds.hi is not None:
            reader = (
                reader.option("partitionColumn", key)
                .option("lowerBound", str(bounds.lo))
                .option("upperBound", str(bounds.hi))
                .option("numPartitions", str(num_partitions))
            )
    return reader.load()


def read_catalog(
    spark: SparkSession, url: str, schema: str = "iman"
) -> tuple[DataFrame, DataFrame]:
    """Live twins of q_scan_catalog/q_scan_columns (setup.sh:29-30,50-52)."""
    def q(sql: str) -> DataFrame:
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", PG_DRIVER)
            .option("query", sql)
            .load()
        )

    tables = q(
        "SELECT table_schema, table_name, table_type FROM information_schema.tables "
        f"WHERE table_schema = '{schema}'"
    )
    columns = q(
        "SELECT table_schema, table_name, column_name, ordinal_position, data_type, "
        "is_nullable FROM information_schema.columns "
        f"WHERE table_schema = '{schema}' ORDER BY table_name, ordinal_position"
    )
    return tables, columns


def write_clickhouse(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    version_cols: Sequence[str],
    mode: str = "append",
) -> None:
    """Batched insert into ClickHouse (reference sink, setup.sh:116-137).

    The reference relies on ReplacingMergeTree to collapse duplicates
    lazily; we dedup eagerly (deterministic LWW) so every batch lands
    clean — re-delivery still converges because inserts are idempotent
    under the table's ORDER BY key after merges.
    """
    deduped = lww_dedup(df, keys, version_cols)
    (
        deduped.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", CH_DRIVER)
        .option("batchsize", "10000")
        .option("isolationLevel", "NONE")
        .mode(mode)
        .save()
    )
