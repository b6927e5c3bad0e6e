"""Per-line profiler for the r13 optimization round.

Times selected bench lines exactly the way bench.py bills them
(min-of-3 with per-query memo eviction, warm triggers), but ALSO
separates the pieces bench.py lumps together:

- ``construct``: Python call + DataFrame build (driver-side plan
  construction, includes any driver-side collects the operator does)
- ``runs``: the three timed ``.count()`` executions
- optionally dumps ``explain("formatted")`` per line into plans/r13/

Usage:
  python tools/profile_lines.py [--top N] [--keys k1,k2] [--plans SUFFIX]
                                [--sf DIR] [--noop]

``--noop`` times ``df.write.format("noop")`` instead of ``.count()``
(guide section 1.4) to check whether count-pruning hides work.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (  # noqa: E402
    _MATERIALIZED,
    MATERIALIZATION_TRIGGERS,
)
from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (  # noqa: E402
    load_all_queries,
)
from kafka_connect_postgres_to_clickhouse_spark.session import get_spark  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--keys", default="")
    ap.add_argument("--plans", default="", help="dump plans/<round>/<key>_<SUFFIX>.txt")
    ap.add_argument("--plans-dir", default="r14", help="subdir of plans/ for dumps")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    registry = load_all_queries()
    jobs: dict = {
        f"_materialize:{m}": (lambda s, d, t=trig: t(s, d))
        for m, trig in MATERIALIZATION_TRIGGERS.items()
    }
    for name, spec in registry.items():
        jobs[name] = spec.fn

    if args.keys:
        keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    elif args.top:
        with open(os.path.join(_REPO, "BENCH_FULL.json")) as f:
            q = json.load(f)["queries"]
        keys = [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[: args.top]]
    else:
        keys = list(jobs)

    spark = get_spark("kcptc-profile")
    sf_dir = args.sf
    # same warm-up bench.py does
    registry["q_changelog_replay"].fn(spark, sf_dir).count()
    # warm ALL triggers (bench runs them first; consumers are timed warm)
    t0 = time.time()
    for m, trig in MATERIALIZATION_TRIGGERS.items():
        trig(spark, sf_dir).count()
    print(f"# trigger warm: {time.time() - t0:.1f}s", file=sys.stderr)

    def act(df) -> None:
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    results: dict[str, dict] = {}
    for name in keys:
        fn = jobs[name]
        spark.sparkContext.setJobDescription(name)
        pre_keys = set(_MATERIALIZED)
        tc0 = time.time()
        df = fn(spark, sf_dir)
        construct = time.time() - tc0
        t0 = time.time()
        act(df)
        runs = [round(time.time() - t0, 4)]
        for _ in range(2):
            for k in list(_MATERIALIZED):
                if k not in pre_keys:
                    del _MATERIALIZED[k]
            tc0 = time.time()
            df = fn(spark, sf_dir)
            construct = min(construct, time.time() - tc0)
            t0 = time.time()
            act(df)
            runs.append(round(time.time() - t0, 4))
            gc.collect()
        results[name] = {
            "construct": round(construct, 4),
            "runs": runs,
            "min": min(runs),
            "billed_like_bench": round(min(construct + r for r in runs), 4),
        }
        if args.plans:
            safe = name.replace(":", "_")
            pdir = os.path.join(_REPO, "plans", args.plans_dir)
            os.makedirs(pdir, exist_ok=True)
            path = os.path.join(pdir, f"{safe}_{args.plans}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(f"{name:45s} construct={construct:7.3f} min={min(runs):7.3f} runs={runs}",
              flush=True)
        spark.sparkContext.setJobDescription(None)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
