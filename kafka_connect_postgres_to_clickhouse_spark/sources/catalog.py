"""Catalog fixture: a PG ``information_schema`` snapshot as DataFrames.

The reference discovers schema dynamically by querying
``information_schema.tables`` / ``information_schema.columns``
(reference setup.sh:29-30, 50-52) and feeds it to the DDL generator.
In production our engine would do the same over JDBC
(``spark.read.format("jdbc").option("query", ...)``); for the
correctness gate we materialize the catalog the reference would see for
its one source table ``iman.users`` (postgres-init/init.sql:5-11) as an
inline fixture so the identical rows can be declared VALUES-style in
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (table_schema, table_name, table_type)
CATALOG_TABLES = [
    ("iman", "users", "BASE TABLE"),
    ("iman", "_migrations", "VIEW"),  # exercised only to prove filtering
]

# (table_schema, table_name, column_name, ordinal_position, data_type, is_nullable)
CATALOG_COLUMNS = [
    ("iman", "users", "user_id", 1, "integer", "NO"),
    ("iman", "users", "username", 2, "character varying", "YES"),
    ("iman", "users", "account_type", 3, "character varying", "YES"),
    ("iman", "users", "updated_at", 4, "timestamp without time zone", "YES"),
    ("iman", "users", "created_at", 5, "timestamp without time zone", "YES"),
]


def catalog_tables_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        CATALOG_TABLES, "table_schema string, table_name string, table_type string"
    )


def catalog_columns_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        CATALOG_COLUMNS,
        "table_schema string, table_name string, column_name string, "
        "ordinal_position int, data_type string, is_nullable string",
    )


def _values_sql(rows: list[tuple], columns: list[str]) -> str:
    def lit(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    values = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    cols = ", ".join(columns)
    return f"(SELECT * FROM (VALUES {values}) AS t({cols}))"


CATALOG_TABLES_SQL = _values_sql(
    CATALOG_TABLES, ["table_schema", "table_name", "table_type"]
)
CATALOG_COLUMNS_SQL = _values_sql(
    CATALOG_COLUMNS,
    [
        "table_schema",
        "table_name",
        "column_name",
        "ordinal_position",
        "data_type",
        "is_nullable",
    ],
)
