"""SparkSession construction for tests / bench.

The driver passes its own session into ``__spark_entry__.entry``; this
builder is for pytest and bench.py.  Config choices are scale-minded:
AQE on (runtime re-planning, skew-join handling), UTC session timezone
(matches the DuckDB oracle, which reads parquet timestamps naively),
Arrow enabled for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kcptc-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def tune(spark: SparkSession) -> SparkSession:
    """Apply session-level conf we rely on to a driver-provided session."""
    for key, value in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        # runtime split of skewed shuffle partitions: the CDC hot path
        # (LWW dedup + upsert join) keys by table PK, and a hot key —
        # one entity receiving a large share of the changelog — would
        # otherwise pin its whole partition on one task
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # Python DataSource pushFilters raises at plan time if this is
        # off; register_changelog_gen also sets it (belt and braces)
        ("spark.sql.python.filterPushdown.enabled", "true"),
    ]:
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf may be static
            pass
    return spark
