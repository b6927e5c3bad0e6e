"""Registry wave 3: event-time windows (SURVEY.md section 2.6).

The reference is a continuous CDC pipeline but delegates all time
semantics to Kafka/ClickHouse; for capability parity we implement
Spark's event-time windowing on the ``events`` fixture.  These are the
batch-checkable twins of the streaming versions in ``streaming/``
(same expressions work under ``readStream`` + watermark).

Value sums use the integer-cents trick (see relational_queries.py) so
the DuckDB hash compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


_SUM_CENTS = "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100"


@register(
    "q_win_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           COUNT(*) AS n_events,
           {_SUM_CENTS} AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1 h window aggregate — groupBy(window(ts)) shuffles once
    on the bucket; identical code runs under Structured Streaming with
    a watermark."""
    e = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents).cast("double") / 100).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value", "n_users")
    )


@register(
    "q_win_sliding",
    oracle=f"""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
               AS window_start,
             value
      FROM events
      CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) ks
    )
    SELECT window_start, COUNT(*) AS n_events, {_SUM_CENTS} AS sum_value
    FROM expanded GROUP BY 1
    """,
)
def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 1 h / slide 15 min: each event lands in 4 windows.

    Spark's window() does the 4x expansion before the shuffle — the
    oracle mirrors it with an explicit bucket expansion.
    """
    e = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents).cast("double") / 100).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "q_win_session",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             -- >= (not >): Spark's session_window merges only strictly
             -- overlapping [ts, ts+gap) windows, so an event exactly
             -- `gap` after its predecessor STARTS A NEW session
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    numbered AS (
      -- the running sum must use the SAME (ts, event_id) tie-broken
      -- order as the lag above, or tied timestamps at a session
      -- boundary could be numbered nondeterministically
      SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           {_SUM_CENTS} AS sum_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30 min gap) per user via session_window() — the
    oracle reproduces it with gaps-and-islands SQL.  Session end is
    last event + gap, matching Spark's semantics."""
    e = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents).cast("double") / 100).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
