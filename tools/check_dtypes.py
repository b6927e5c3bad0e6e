"""Cross-engine pandas dtype parity check.

The driver's value hash canonicalizes pandas cells, so a dtype split
between the Spark result (``toPandas()``) and the DuckDB oracle result
(``.df()``) is a hash risk even when the values are equal — round 2's
HUGEINT→object failures were exactly this.  This tool executes every
oracle-bearing registry query at the given sf dir and reports any
column whose pandas dtype differs between the two engines.

Usage: python tools/check_dtypes.py [sf_dir] [keys...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import duck_con  # noqa: E402


def dtype_mismatches(sp_df, du_df) -> list[tuple[str, str, str]]:
    out = []
    for col in sorted(set(sp_df.columns) & set(du_df.columns)):
        s, d = str(sp_df[col].dtype), str(du_df[col].dtype)
        if s != d:
            out.append((col, s, d))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )
    from kafka_connect_postgres_to_clickhouse_spark.session import get_spark

    registry = load_all_queries()
    spark = get_spark("check-dtypes")
    con = duck_con(sf_dir)
    bad = {}
    for name, spec in registry.items():
        if spec.oracle is None or (only and name not in only):
            continue
        try:
            sp = spec.fn(spark, sf_dir).toPandas()
            du = con.sql(spec.oracle).df()
        except Exception:
            bad[name] = [("<error>", traceback.format_exc(limit=3).strip()[-200:], "")]
            continue
        mm = dtype_mismatches(sp, du)
        if mm:
            bad[name] = mm
    for name, mm in bad.items():
        print(
            f"DTYPE {name}: "
            + ", ".join(f"{c}: spark={s} duck={d}" for c, s, d in mm)
        )
    n_checked = len([n for n, s in registry.items() if s.oracle and (not only or n in only)])
    print(f"\n{len(bad)} dtype-mismatched of {n_checked}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
