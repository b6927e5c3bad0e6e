"""Parquet fixture loaders.

The driver fixtures (/root/testdata/sf*/, see TESTDATA.md) stand in for
the reference's sources: the TPC-H-ish star schema plays the mirrored
relational tables (reference: PostgreSQL ``iman.users``,
postgres-init/init.sql:5-11), ``events`` plays the change stream, and
``documents``/``embeddings`` back the EXT analytics surface.

Scale note: `spark.read.parquet` gives partition-parallel, column-pruned,
predicate-pushdown scans out of the box; at 100 TB the same call reads a
partitioned table directory and Catalyst prunes partitions from filters.
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@lru_cache(maxsize=None)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    schema = pq.read_schema(path)
    return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing TIMESTAMP(NANOS) columns.

    Spark has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` those columns arrive as
    int64 nanos and we truncate to microsecond timestamps — exactly
    what DuckDB does when it reads the same files, so oracle compares
    stay exact.  Integer division (``div``) avoids the double-precision
    loss a ``/ 1000`` would introduce on epoch-nanos magnitudes.
    """
    path = f"{sf_dir}/{name}.parquet"
    # Self-sufficient under a caller-owned session (the driver builds
    # its own SparkSession): this legacy conf is runtime-settable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in _nanos_ts_columns(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
