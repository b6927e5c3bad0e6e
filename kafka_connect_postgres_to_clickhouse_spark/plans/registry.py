"""Query registry: the single source of truth for the driver contract.

Every operator from SURVEY.md section 2 registers here with a Spark
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a
DuckDB oracle SQL string over the pre-registered fixture views.
``__spark_entry__.py`` exposes the registry as ``queries()`` /
``oracle_sql()``.

Contract reminders (driver t2):
- compare = row-count + schema + order-insensitive value hash with
  columns sorted by name -> alias every computed column identically in
  Spark and SQL;
- float aggregation order differs between engines -> aggregate money
  columns as DECIMAL (exact, order-independent) or round consistently.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check


REGISTRY: dict[str, QuerySpec] = {}

# Keys whose SEMANTICS or ORACLE materially changed this round: they
# re-enter the driver-priority front even though a past round proved
# the old behavior (the "unproven-keys-lead" window-rotation rule,
# VERDICT r12 next-round #8).  Clear at the start of each round, add
# as keys change.  r13: the PQ axis moved from untrained 4-entry
# codebooks to Lloyd-trained 8-entry codebooks (_pq_lloyd_train) —
# both keys compute different values than their driver-green r12
# entries, so the r12 verdicts no longer attest the current code.
REFRONT: set[str] = {"q_pq_codes", "q_simsearch_pq"}

# Ordered so that the analytics + window queries register FIRST: the
# round-1 driver wrote CORRECTNESS entries for only the first 50 registry
# keys, leaving the entire back half (analytics/window) unverified by the
# hard signal.  The pipeline/relational front half is proven stable
# (47/50 driver-green in r1) and cheap to re-verify locally via
# tools/check_oracle.py, so it can safely ride in the back.
_QUERY_MODULES = [
    "kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries",
    "kafka_connect_postgres_to_clickhouse_spark.operators.window_queries",
    "kafka_connect_postgres_to_clickhouse_spark.operators.pipeline_queries",
    "kafka_connect_postgres_to_clickhouse_spark.operators.relational_queries",
    # wave-3 extensions register last: new keys wait behind the
    # driver-priority prefix until the current front is driver-proven
    "kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries",
]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle)
        return fn

    return deco


# Proof tiers a driver CORRECTNESS entry can award a key, strongest
# first.  Only these two tiers count as "proven" for rotation purposes:
#   PROOF_HASH      — row count + schema + order-insensitive value hash
#                     all matched the DuckDB oracle (the full contract).
#   PROOF_ROWS_ONLY — the key has no oracle BY DESIGN (approx sketches
#                     like q_agg_approx_distinct); the driver recorded a
#                     successful rows-only execution.  Valid only while
#                     the key still has no oracle: if a later round
#                     grows one, the key re-fronts for a hash verdict.
PROOF_HASH = "hash"
PROOF_ROWS_ONLY = "rows_only"


def _proof_tier(key: str, row: dict) -> str | None:
    """Tier a single driver CORRECTNESS row awards ``key`` (None = red)."""
    if row.get("hash_match") is True:
        return PROOF_HASH
    if (
        row.get("err") == "no_oracle"
        and row.get("spark_rows") is not None
        and (key not in REGISTRY or REGISTRY[key].oracle is None)
    ):
        return PROOF_ROWS_ONLY
    return None


def _driver_green_keys() -> set[str]:
    """Keys already proven (any tier) by a PAST driver round.

    The driver writes CORRECTNESS_r{N}.json into the repo root each
    round but covers only a bounded registry prefix per round, so the
    registry self-rotates: keys with a recorded green entry yield the
    front of the ordering to keys still awaiting one.  (A key that
    regressed to hash_match=false re-enters the priority front
    automatically.)
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    green: set[str] = set()
    red: set[str] = set()

    def round_no(path: str) -> int:
        m = re.search(r"r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1

    # numeric round order: later rounds override earlier verdicts (a
    # lexicographic sort would put r100 before r11 and resurrect stale
    # verdicts)
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")), key=round_no):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            if _proof_tier(key, row) is not None:
                green.add(key)
                red.discard(key)
            else:
                red.add(key)
                green.discard(key)
    return green - red


def load_all_queries() -> dict[str, QuerySpec]:
    """Registry in driver-priority order: unproven keys first.

    Within each half the original registration order is kept (stable,
    documented in SURVEY.md section 2.8); across rounds the front
    shrinks as CORRECTNESS artifacts accumulate, giving every key a
    driver-green entry after ceil(N / window) rounds regardless of the
    driver's per-round coverage cap.
    """
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    proven = _driver_green_keys() - REFRONT
    unproven = [k for k in REGISTRY if k not in proven]
    ordered = unproven + [k for k in REGISTRY if k in proven]
    return {k: REGISTRY[k] for k in ordered}
