"""Schema translation: PG catalog rows -> ClickHouse DDL strings.

Re-expresses the reference's DDL generator (setup.sh:36-66) — which is
a SQL query building a SQL string — as a Spark aggregation over a
catalog DataFrame: ``when/otherwise`` for the type CASE (setup.sh:40-49),
``array_join(collect-by-ordinal)`` for ``string_agg(..., ', ' ORDER BY
ordinal_position)`` (setup.sh:62), and the PK heuristic "column named
``<singular(table)>_id`` else first column" (setup.sh:54-59,64 pins
``user_id`` with a COALESCE fallback to the first column).

Golden output (README.md:108):
``CREATE TABLE IF NOT EXISTS iman.users (user_id UInt32, username
String, account_type String, updated_at DateTime64(6), created_at
DateTime64(6)) ENGINE = ReplacingMergeTree() ORDER BY user_id;``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .typemap import CLICKHOUSE_FALLBACK, PG_TO_CLICKHOUSE


def clickhouse_type_col(data_type: Column) -> Column:
    """The setup.sh:40-49 CASE as a Catalyst expression chain."""
    expr = None
    for pg, ch in PG_TO_CLICKHOUSE.items():
        cond = data_type == F.lit(pg)
        expr = F.when(cond, F.lit(ch)) if expr is None else expr.when(cond, F.lit(ch))
    return expr.otherwise(F.lit(CLICKHOUSE_FALLBACK))


def generate_ddl(catalog_columns: DataFrame) -> DataFrame:
    """catalog columns -> one row per table: (table_schema, table_name, ddl).

    Scale note: a pure two-level aggregation keyed by table — partial
    aggregation map-side, no window, no collect to the driver.  Catalog
    cardinality is tables x columns, so this is never a bottleneck, but
    the same plan shape would survive a million-table catalog.
    """
    cols = catalog_columns.select(
        "table_schema",
        "table_name",
        "column_name",
        "ordinal_position",
        clickhouse_type_col(F.col("data_type")).alias("ch_type"),
    )
    per_col = cols.withColumn(
        "decl", F.concat(F.col("column_name"), F.lit(" "), F.col("ch_type"))
    )
    agg = per_col.groupBy("table_schema", "table_name").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ordinal_position", "decl", "column_name"))
                ),
                lambda s: s["decl"],
            ),
            ", ",
        ).alias("columns_sql"),
        # PK heuristic (setup.sh:54-59,64 approximation): FIRST column
        # ending '_id' by ordinal, else the first column — the SAME
        # rule bootstrap_pipeline uses for the state merge key, so the
        # sink's ReplacingMergeTree ORDER BY and the pipeline's LWW
        # key can never diverge for one table.  (min of an
        # ordinal-tagged string = arg-min; tag stripped below.)
        F.min_by("column_name", "ordinal_position").alias("first_column"),
        F.min(
            F.when(
                F.col("column_name").endswith("_id"),
                F.concat(
                    F.lpad(F.col("ordinal_position").cast("string"), 6, "0"),
                    F.lit(":"),
                    F.col("column_name"),
                ),
            )
        ).alias("pk_tagged"),
    )
    return agg.select(
        "table_schema",
        "table_name",
        F.concat(
            F.lit("CREATE TABLE IF NOT EXISTS "),
            F.col("table_schema"),
            F.lit("."),
            F.col("table_name"),
            F.lit(" ("),
            F.col("columns_sql"),
            F.lit(") ENGINE = ReplacingMergeTree() ORDER BY "),
            F.coalesce(
                F.substring(F.col("pk_tagged"), 8, 1_000_000),
                F.col("first_column"),
            ),
            F.lit(";"),
        ).alias("ddl"),
    )
