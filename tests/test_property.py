"""Property-based tests (hypothesis): the LWW upsert core must agree
with a trivially-correct pure-Python reference on ARBITRARY changelogs,
not just the fixtures — catching tie-break and delete-handling edges
the example-based tests can't enumerate (duplicate versions, deletes
first/last, single-key storms, interleavings).
"""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_postgres_to_clickhouse_spark.operators.upsert import (  # noqa: E402
    apply_changelog,
)

# an event: (seq, key, op, version_ts_seconds, payload_tag)
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # key
        st.sampled_from(["u", "u", "u", "d"]),  # op (deletes rarer)
        st.integers(min_value=0, max_value=5),  # coarse ts -> forced ties
        st.integers(min_value=0, max_value=99),  # payload tag
    ),
    min_size=0,
    max_size=30,
)


def _reference_lww(rows):
    """Pure-Python LWW with (updated_at, _seq) ordering, deletes DROPPED
    (reference semantics, SURVEY.md section 0)."""
    state = {}
    for seq, (key, op, ts, tag) in enumerate(rows):
        if op == "d":
            continue  # the pipeline drops deletes before the upsert
        cur = state.get(key)
        if cur is None or (ts, seq) >= (cur[0], cur[1]):
            state[key] = (ts, seq, tag)
    return {k: (v[0], v[1], v[2]) for k, v in state.items()}


@settings(
    max_examples=25,
    deadline=None,
    # one shared SparkSession across examples is intentional (it is
    # stateless between createDataFrame calls)
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_events)
def test_lww_upsert_matches_reference_semantics(spark_session, rows):
    import pyspark.sql.functions as F

    spark = spark_session
    if not rows:
        return
    data = [
        (seq, key, op, ts, tag)
        for seq, (key, op, ts, tag) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "_seq long, user_id int, op string, ts_i long, tag int"
    ).select(
        "_seq",
        "user_id",
        "op",
        F.timestamp_seconds(F.col("ts_i")).alias("updated_at"),
        "tag",
    )
    kept = df.filter(F.col("op") != "d")
    state = apply_changelog(kept, keys=["user_id"], version_cols=["updated_at", "_seq"])
    got = {
        r.user_id: (int(r.updated_at.timestamp()), r._seq, r.tag)
        for r in state.collect()
    }
    assert got == _reference_lww(rows)


# hypothesis drives many examples through one SparkSession: reuse the
# session-scoped fixture under a function-scoped alias so @given's
# repeated calls don't collide with fixture scoping rules
import pytest  # noqa: E402


@pytest.fixture()
def spark_session(spark):
    return spark


_payloads = st.lists(
    st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),  # user_id
        st.one_of(st.none(), st.text(alphabet=st.characters(
            codec="utf-8", exclude_characters='"\\\x00'), max_size=40)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=2**52)),  # epoch micros
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_payloads)
def test_envelope_roundtrip_identity(spark_session, rows):
    """build_envelope_json then parse_envelope must be the identity on
    ARBITRARY payloads — including NULLs in optional fields, negative
    keys, unicode text, and extreme-but-valid micro timestamps — the
    serde contract the whole wire path stands on (reference envelope,
    README.md:127-129)."""
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from kafka_connect_postgres_to_clickhouse_spark.operators.envelope import (
        build_envelope_json,
        parse_envelope,
    )

    spark = spark_session
    schema = T.StructType(
        [
            T.StructField("user_id", T.IntegerType(), False),
            T.StructField("username", T.StringType(), True),
            T.StructField("updated_at", T.TimestampType(), True),
        ]
    )
    data = [
        (i, uid, name, micros)
        for i, (uid, name, micros) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "_seq long, user_id int, username string, micros long"
    ).select(
        "_seq", "user_id", "username", F.timestamp_micros(F.col("micros")).alias("updated_at")
    )
    wire = df.select(
        "_seq", build_envelope_json(schema, "postgres_cdc.iman.users.Value").alias("value")
    )
    back = parse_envelope(wire, schema)
    orig = {
        r._seq: (r.user_id, r.username, r.updated_at) for r in df.collect()
    }
    got = {
        r._seq: (r.user_id, r.username, r.updated_at)
        for r in back.filter(~F.col("_corrupt")).collect()
    }
    assert got == orig
