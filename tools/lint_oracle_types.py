"""Lint every registry oracle's DuckDB result schema for hash-unsafe types.

The driver's t2 compare hashes cell values with dtype-sensitive pandas
canonicalization: DuckDB HUGEINT (int128, from SUM over BIGINT/INT)
lands as pandas ``object`` and hash-diverges from Spark's int64, and
LIST/STRUCT/MAP cells are unhashable entirely.  Round 2 lost 6 keys to
exactly this.  This lint runs plan-only (``relation.types`` — no query
execution) so it covers all registry oracles in seconds.

Usage: python tools/lint_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import TABLES, duck_con  # noqa: E402

BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "STRUCT", "MAP", "UNION")
# LIST types print as e.g. BIGINT[]
BAD_SUFFIX = ("[]",)


def unsafe_columns(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    rel = con.sql(sql)
    out = []
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(t.startswith(b) for b in BAD_TYPES) or any(
            t.endswith(s) for s in BAD_SUFFIX
        ):
            out.append((name, t))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )

    registry = load_all_queries()
    con = duck_con(sf_dir)
    bad = {}
    for name, spec in registry.items():
        if spec.oracle is None:
            continue
        try:
            cols = unsafe_columns(con, spec.oracle)
        except Exception as e:  # oracle itself broken — report loudly
            bad[name] = [("<error>", str(e).split("\n")[0])]
            continue
        if cols:
            bad[name] = cols
    for name, cols in bad.items():
        print(f"UNSAFE {name}: " + ", ".join(f"{c}:{t}" for c, t in cols))
    print(f"\n{len(bad)} unsafe of {len(registry)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
