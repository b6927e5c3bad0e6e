"""PG -> ClickHouse -> Spark type mapping.

Mirrors the DDL generator CASE in the reference (setup.sh:40-49), one
arm per row.  Divergence (documented, SURVEY.md 1.2): the reference
maps signed PG ints to *unsigned* UInt32/UInt64; Spark has no unsigned
types, so we keep signed Integer/Long.
"""

from __future__ import annotations

from pyspark.sql import types as T

# pg data_type -> clickhouse type (reference setup.sh:40-49)
PG_TO_CLICKHOUSE: dict[str, str] = {
    "integer": "UInt32",                          # setup.sh:41
    "bigint": "UInt64",                           # setup.sh:42
    "numeric": "Decimal(18,2)",                   # setup.sh:43
    "text": "String",                             # setup.sh:44
    "character varying": "String",                # setup.sh:45
    "timestamp without time zone": "DateTime64(6)",  # setup.sh:46
    "uuid": "UUID",                               # setup.sh:47
}
CLICKHOUSE_FALLBACK = "String"                    # setup.sh:48 catch-all

PG_TO_SPARK: dict[str, T.DataType] = {
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "numeric": T.DecimalType(18, 2),
    "text": T.StringType(),
    "character varying": T.StringType(),
    "timestamp without time zone": T.TimestampType(),
    "uuid": T.StringType(),
}
SPARK_FALLBACK = T.StringType()


def pg_to_clickhouse(pg_type: str) -> str:
    return PG_TO_CLICKHOUSE.get(pg_type, CLICKHOUSE_FALLBACK)


def pg_to_spark(pg_type: str) -> T.DataType:
    return PG_TO_SPARK.get(pg_type, SPARK_FALLBACK)


def struct_type_from_catalog(columns: list[tuple[str, str, str]]) -> T.StructType:
    """(column_name, data_type, is_nullable) rows -> StructType."""
    return T.StructType(
        [
            T.StructField(name, pg_to_spark(dt), nullable=(nullable == "YES"))
            for name, dt, nullable in columns
        ]
    )
