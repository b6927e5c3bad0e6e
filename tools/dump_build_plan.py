"""Dump the BUILD plan of a `_materialize:<name>` bench line.

The trigger functions return the post-spill parquet scan, so a plain
explain on them shows only the read.  This intercepts `_materialize`
to capture the unexecuted build DataFrame and prints its formatted
plan — the artifact plans/r13/ claims are checked against.

Usage: python tools/dump_build_plan.py <name> <sf_dir> [out_path]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries as aq  # noqa: E402
from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (  # noqa: E402
    load_all_queries,
)
from kafka_connect_postgres_to_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    target = sys.argv[1]
    sf_dir = sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else None

    load_all_queries()  # populate MATERIALIZATION_TRIGGERS
    captured: dict = {}
    orig = aq._materialize

    def spy(spark, sf, name, build):
        if name == target and name not in captured:
            captured[name] = build()
        return orig(spark, sf, name, build)

    aq._materialize = spy
    spark = get_spark("kcptc-plan-dump")
    aq.MATERIALIZATION_TRIGGERS[target](spark, sf_dir)
    df = captured[target]
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    if out:
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out}")
    else:
        print(plan)


if __name__ == "__main__":
    main()
