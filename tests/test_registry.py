"""Registry self-rotation: driver CORRECTNESS artifacts steer ordering."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (  # noqa: E402
    _driver_green_keys,
    load_all_queries,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_green_keys_reflect_recorded_rounds():
    green = _driver_green_keys()
    r1_path = os.path.join(ROOT, "CORRECTNESS_r01.json")
    r1 = json.load(open(r1_path))
    for key, row in r1.items():
        if row.get("hash_match") is True:
            assert key in green, f"{key} was driver-green in r1"
    # r1 hash failures must NOT count as proven (they re-front until a
    # later round records them green)
    for key, row in r1.items():
        later_rounds = [
            p for p in os.listdir(ROOT)
            if p.startswith("CORRECTNESS_r") and p != "CORRECTNESS_r01.json"
        ]
        if row.get("hash_match") is False and not later_rounds:
            assert key not in green


def test_unproven_keys_lead_the_registry():
    q = list(load_all_queries())
    green = _driver_green_keys()
    seen_proven = False
    for k in q:
        if k in green:
            seen_proven = True
        else:
            assert not seen_proven, (
                f"unproven key {k} ordered after a proven key — the driver's "
                "bounded CORRECTNESS window would miss it"
            )


def test_registry_complete_and_aliased():
    q = load_all_queries()
    assert len(q) >= 160
    # every oracle-bearing spec is a non-empty SQL string
    for k, spec in q.items():
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), k


def test_every_registry_query_executes(spark):
    """Whole-registry smoke in ONE shared session at sf0.001: every
    key must plan and execute (count) without error, in registry
    order — catching cross-query session interactions (memoized
    intermediates, temp views, conf mutations) that the per-query
    oracle gate, which also shares a session but may run subsets,
    could order differently."""
    failures = []
    for name, spec in load_all_queries().items():
        try:
            spec.fn(spark, "/root/testdata/sf0.001").count()
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {exc}")
    assert not failures, "\n".join(failures[:5])
