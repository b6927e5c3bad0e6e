"""Round-7 operator invariants + Python DataSource filter pushdown.

The oracle gate (tools/check_oracle.py) proves value equality vs
DuckDB; these tests pin the SEMANTIC invariants that equality alone
would not catch if both engines drifted together, plus the Spark 4.1
`pushFilters` behavior of the changelog_gen source (reference basis:
a Debezium connector's offset-range resume, setup.sh:76-107 — the
source must be able to skip history it was told to skip, not re-read
and discard it).
"""

from __future__ import annotations

import pytest

from kafka_connect_postgres_to_clickhouse_spark.sources.pydatasource import (
    ChangelogGenReader,
    register_changelog_gen,
)

SF = "/root/testdata/sf0.01"


def _q(name):
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )

    return load_all_queries()[name].fn


# --- Python DataSource filter pushdown --------------------------------------


def test_pushdown_unit_prunes_partitions_and_consumes_filters():
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    r = ChangelogGenReader({"rows": "1000", "partitions": "4"})
    remaining = list(
        r.pushFilters(
            [GreaterThanOrEqual(("seq",), 500), EqualTo(("op",), "U")]
        )
    )
    # seq filter consumed, op filter returned to Spark
    assert [type(f).__name__ for f in remaining] == ["EqualTo"]
    assert len(r.pushed) == 1
    # rows 500..999 live in partitions 2 and 3 of 4
    assert [p.value for p in r.partitions()] == [2, 3]

    r2 = ChangelogGenReader({"rows": "1000", "partitions": "4"})
    list(r2.pushFilters([LessThan(("seq",), 0)]))
    # fully pruned scan still returns one (empty) partition per the API
    parts = r2.partitions()
    assert len(parts) == 1 and list(r2.read(parts[0])) == []


def test_pushdown_end_to_end_matches_unpushed(spark):
    register_changelog_gen(spark)
    df = (
        spark.read.format("changelog_gen")
        .option("rows", "1000")
        .option("partitions", "4")
        .load()
    )
    pushed = df.filter("seq >= 950 AND seq < 980")
    assert pushed.count() == 30
    # same rows as generating everything and filtering in Spark
    full = [r.seq for r in df.collect() if 950 <= r.seq < 980]
    assert sorted(r.seq for r in pushed.collect()) == sorted(full)
    # residual (non-seq) predicates still evaluate correctly post-scan
    assert (
        df.filter("seq >= 950 AND op = 'D'").count()
        == sum(1 for s in range(950, 1000) if s % 10 == 0)
    )


# --- round-7 operator invariants ---------------------------------------------


def test_dlq_replay_closes_the_gap(spark):
    rep = _q("q_dlq_replay")(spark, SF).collect()
    # the injection really quarantined wire messages...
    from kafka_connect_postgres_to_clickhouse_spark.operators.pipeline_queries import (
        _changelog,
    )

    n_log = _changelog(spark, SF).count()
    n_clean = _q("q_corrupt_tolerate")(spark, SF).count()
    assert n_clean < n_log  # poison rows exist and were dropped pre-replay
    # ...and the post-replay fold is exactly the never-corrupted flagship fold
    flagship = _q("q_changelog_replay")(spark, SF)
    per_type = {
        r.account_type: r.n
        for r in flagship.groupBy("account_type").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert {r.account_type: r.n_final for r in rep} == per_type


def test_weighted_median_bounds_and_weights(spark):
    rows = _q("q_weighted_median")(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    import pyspark.sql.functions as F

    bounds = {
        r["flag"]: (r["lo"], r["hi"])
        for r in li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            (F.min("l_extendedprice") * 100).alias("lo"),
            (F.max("l_extendedprice") * 100).alias("hi"),
        )
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r.flag]
        assert lo - 1 <= r.wmedian_cents <= hi + 1
        assert r.total_weight > 0


def test_merkle_repair_flags_exactly_the_divergent_buckets(spark):
    rows = _q("q_merkle_repair")(spark, SF).collect()
    dirty = [r for r in rows if r.needs_repair == 1]
    assert dirty, "a 3/4 replica must diverge somewhere"
    # every bucket with differing key counts must be flagged
    for r in rows:
        if r.n_keys_stale != r.n_keys_full:
            assert r.needs_repair == 1
    # repair is targeted: clean buckets exist (the protocol's point)
    assert any(r.needs_repair == 0 for r in rows)


def test_linked_sample_is_referentially_closed(spark):
    r = _q("q_linked_sample")(spark, SF).collect()[0]
    assert 0 < r.n_users_sampled < r.n_users_total
    assert 0 < r.n_events_kept < r.n_events_total
    # ~20% of users by hash (51/256 = 19.9%); wide tolerance band
    assert 1000 <= r.user_share_bp <= 3000


def test_equidepth_monotone_and_exhaustive(spark):
    rows = sorted(_q("q_equidepth_hist")(spark, SF).collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert a.ub_cents <= b.ub_cents
        assert a.rows_le <= b.rows_le
    assert rows[-1].rows_le == rows[-1].n_total  # decile 10 covers everything


def test_late_dim_and_leakage_account_for_every_fact(spark):
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    facts = _q("q_late_dim_facts")(spark, SF).collect()
    assert sum(r.n_facts for r in facts) == n_events
    leak = _q("q_dim_leakage")(spark, SF).collect()
    assert sum(r.n_facts for r in leak) == n_events
    assert any(r.is_leak == 1 and r.n_facts > 0 for r in leak)


def test_sweeps_are_monotone(spark):
    # more lenient watermark -> fewer drops; larger gap -> fewer sessions
    lat = {
        (r.event_type, r.delay_min): r.n_dropped
        for r in _q("q_lateness_sweep")(spark, SF).collect()
    }
    types = {t for t, _ in lat}
    for t in types:
        drops = [lat[(t, d)] for d in (1, 5, 10, 30, 60)]
        assert drops == sorted(drops, reverse=True)
    ses = {r.gap_min: r.n_sessions for r in _q("q_session_gap_sweep")(spark, SF).collect()}
    vals = [ses[g] for g in (5, 15, 30, 60)]
    assert vals == sorted(vals, reverse=True)
    ttl = {r.ttl_h: r.max_state_rows for r in _q("q_state_ttl_sweep")(spark, SF).collect()}
    assert ttl[1] <= ttl[6] <= ttl[24]


def test_bloom_fpr_decreases_with_m(spark):
    rows = {r.m_bits: r for r in _q("q_bloom_fpr_sweep")(spark, SF).collect()}
    assert set(rows) == {256, 4096, 65536}
    assert rows[256].n_false_positives >= rows[4096].n_false_positives
    assert rows[4096].n_false_positives >= rows[65536].n_false_positives
    for r in rows.values():  # FPs only, never FNs by construction
        assert r.n_false_positives <= r.n_nonmembers


def test_abc_classes_partition_the_catalog(spark):
    rows = {r.abc: r for r in _q("q_abc_classes")(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    shares = {k: r.revenue_share_bp for k, r in rows.items()}
    assert shares["A"] >= shares["B"] >= shares["C"]
    assert 9998 <= sum(shares.values()) <= 10000  # integer-floor rounding
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r.n_items for r in rows.values()) == n_parts


@pytest.mark.parametrize("key", ["q_entropy_bound", "q_gorilla_ts_bits"])
def test_compression_never_beats_entropy_or_raw(spark, key):
    rows = _q(key)(spark, SF).collect()
    if key == "q_entropy_bound":
        for r in rows:
            assert 0 < r.bound_bytes < r.raw_bytes
    else:
        total_g = sum(r.gorilla_bits for r in rows)
        total_raw = sum(r.raw_bits for r in rows)
        assert total_g < total_raw  # timestamps are regular enough to win


def test_decimate_pcm_integer_grid_and_guards():
    import io
    import wave

    import numpy as np

    from kafka_connect_postgres_to_clickhouse_spark.streaming.multimodal import (
        decimate_pcm,
        decode_wav,
        encode_wav,
    )

    sig = np.zeros(11)
    sig[::2] = 100 / 128.0  # odd length: trailing partial group drops
    res = decimate_pcm(encode_wav(sig, rate=16000), factor=2)
    samples, rate = decode_wav(res)
    assert rate == 8000 and len(samples) == 5
    q = round((100 / 128.0) * 32767)
    assert int(round(float(samples.max()) * 32768.0)) == q // 2

    # negative samples: floor (not truncate-toward-zero) semantics
    neg = decimate_pcm(encode_wav(np.full(4, -0.5), rate=16000), factor=2)
    s2, _ = decode_wav(neg)
    v = round(-0.5 * 32767)  # -16384 (away from zero)
    assert int(round(float(s2[0]) * 32768.0)) == (2 * v) // 2 == v

    # guards: stereo / 8-bit payloads are rejected, not mis-decoded
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x00" * 8)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decimate_pcm(buf.getvalue())
