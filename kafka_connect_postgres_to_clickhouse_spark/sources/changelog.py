"""Changelog (CDC stream) fixtures.

Two changelog sources:

1. ``reference_scenario_changelog`` — the reference's own end-to-end
   test sequence (reference setup.sh:155-207): 3 inserts, 1 delete,
   1 insert + 1 update.  Used by pytest for semantic parity checks.

2. ``users_changelog`` — a scaled changelog derived deterministically
   from the ``events`` fixture (FIXTURES.md section 2: key=user_id,
   version=ts, seq=event_id).  This is the flagship input for
   ``q_changelog_replay``: it exercises the reference's entire data
   plane (SURVEY.md section 3.2) in batch form at any scale factor.

Deterministic derivation rule (mirrored 1:1 in the DuckDB oracle SQL):

- ``_seq``        = event_id      (monotonic changelog position; plays
                                   the role of Kafka (partition, offset))
- key             = user_id
- ``username``    = 'user_' || user_id
- ``account_type``= event_type
- ``updated_at``  = ts
- ``op``          = 'd' when event_type = 'error' else 'u'
                    ('error' events play DELETEs, which the reference
                    pipeline *drops* — setup.sh:94,105-107)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPIC = "postgres_cdc.iman.users"  # reference setup.sh:88,117

USERS_SCHEMA = T.StructType(
    [
        # reference postgres-init/init.sql:5-11 via typemap (SURVEY.md 1.2)
        T.StructField("user_id", T.IntegerType(), nullable=False),
        T.StructField("username", T.StringType(), nullable=True),
        T.StructField("account_type", T.StringType(), nullable=True),
        T.StructField("updated_at", T.TimestampType(), nullable=True),
        T.StructField("created_at", T.TimestampType(), nullable=True),
    ]
)


def users_changelog(events: DataFrame) -> DataFrame:
    """Derive the scaled ``users`` changelog from the events fixture."""
    return events.select(
        F.col("event_id").alias("_seq"),
        F.lit(TOPIC).alias("topic"),
        F.when(F.col("event_type") == "error", F.lit("d")).otherwise(F.lit("u")).alias("op"),
        F.col("user_id").cast("int").alias("user_id"),
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("username"),
        F.col("event_type").alias("account_type"),
        F.col("ts").alias("updated_at"),
    )


# DuckDB rendering of users_changelog, for oracle SQL composition.
USERS_CHANGELOG_SQL = """
    SELECT event_id AS _seq,
           'postgres_cdc.iman.users' AS topic,
           CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
           CAST(user_id AS INTEGER) AS user_id,
           'user_' || CAST(user_id AS VARCHAR) AS username,
           event_type AS account_type,
           ts AS updated_at
    FROM events
"""


def reference_scenario_changelog(spark: SparkSession) -> DataFrame:
    """The exact event sequence of the reference's end-to-end test.

    seq 1-3: inserts of (1,user1,Bronze) (2,user2,Silver) (3,user3,Gold)
             (setup.sh:155-161)
    seq 4:   DELETE user_id=1 (setup.sh:193) — pipeline drops it
    seq 5:   insert (999,test_user,Test)     (setup.sh:201)
    seq 6:   update 999.username -> updated_user (setup.sh:203)
    """
    t0 = "2025-08-02 17:30:42.030174"  # README.md:120 golden timestamp
    rows = [
        (1, "c", 1, "user1", "Bronze", t0, t0),
        (2, "c", 2, "user2", "Silver", t0, t0),
        (3, "c", 3, "user3", "Gold", t0, t0),
        (4, "d", 1, "user1", "Bronze", t0, t0),
        (5, "c", 999, "test_user", "Test", "2025-08-02 17:31:00.000000", t0),
        (6, "u", 999, "updated_user", "Test", "2025-08-02 17:31:05.000000", t0),
    ]
    schema = T.StructType(
        [
            T.StructField("_seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("user_id", T.IntegerType()),
            T.StructField("username", T.StringType()),
            T.StructField("account_type", T.StringType()),
            T.StructField("updated_at", T.StringType()),
            T.StructField("created_at", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    return df.select(
        "_seq",
        F.lit(TOPIC).alias("topic"),
        "op",
        "user_id",
        "username",
        "account_type",
        F.to_timestamp("updated_at").alias("updated_at"),
        F.to_timestamp("created_at").alias("created_at"),
    )
