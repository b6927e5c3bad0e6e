"""Core-count scaling receipt at the 10x (sf1-equivalent) corpus.

The r13 verdict's scaling block showed every sf0.1 top-20 ratio ≈ 1
(8-core ≈ 32-core): at that scale the surviving lines are bounded by
driver/plan/stage-barrier fixed costs, so the bench cannot demonstrate
data-plane parallelism — and the "session scan floors are a no-op once
splits ≫ cores" argument stayed unfalsified.  This tool produces the
receipt (VERDICT r13 next-round #8): build the closed-regime 10x
corpus (the scale_stress construction — sf1-equivalent documents +
embeddings), run the heavy document/embedding-driven keys COLD at 32
and at 8 cores in FRESH child processes (own JVM each, the driver's
own low-core methodology), min-of-2 per cell, and record the
32-vs-8-core speedup per key.

Keys are restricted to document/embedding consumers because the
replicated corpus ships only those two tables (the star-schema tables
are not replicated by the scale_stress construction).

Run: python tools/core_scaling.py [BASE_SF_DIR] [OUT_JSON]
Child: python tools/core_scaling.py --child CPUS SF_DIR OUT_PART
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = [
    "q_neardup_jaccard",    # postings + shingle_arrays + PPJoin build
    "q_dup_ranges",         # dup_windows digest index + islands
    "q_label_prop",         # pair graph + LPA fold
    "q_kn_trigram",         # trigram LM type tables
    "q_simsearch_graph",    # emb_norms + ann_graph + beam search
    "q_graph_ann_filtered",
    "q_audio_fp_neardup",   # per-doc FLAC/WAV decode (honest compute)
    "q_video_phash_neardup",
    "q_editdist_neardup",   # PassJoin segment index
    "q_greedy_coverage",
]
CORES = [32, 8]


def child(cpus: str, sf_dir: str, out_part: str) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (
        _MATERIALIZED,
    )
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )
    from kafka_connect_postgres_to_clickhouse_spark.session import get_spark

    spark = get_spark("kcptc-core-scaling")
    registry = load_all_queries()
    registry["q_changelog_replay"].fn(spark, "/root/testdata/sf0.01").count()  # warm JVM
    cells: dict[str, dict] = {}
    for key in KEYS:
        runs = []
        nrows = None
        for _ in range(3):
            pre = set(_MATERIALIZED)
            t0 = time.time()
            nrows = registry[key].fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
            for mk in list(_MATERIALIZED):
                if mk not in pre:
                    del _MATERIALIZED[mk]
        cells[key] = {"rows": nrows, "sec": min(runs), "runs": runs}
        print(f"[{cpus} cores] {key}: rows={nrows} sec={runs}", flush=True)
    with open(out_part, "w") as f:
        json.dump(cells, f)


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        child(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORE_SCALING_r14.json",
    )
    work = os.environ.get(
        "SPARK_GRAFT_STRESS_DIR",
        os.path.join(os.path.dirname(out_json), ".scale_stress"),
    )
    rep_dir = os.path.join(work, "closed_x10")
    if not os.path.exists(os.path.join(rep_dir, "documents.parquet")):
        from scale_stress import build_corpus  # noqa: PLC0415

        build_corpus(base, rep_dir, 10, "closed")
    parts: dict[int, dict] = {}
    for c in CORES:
        out_part = os.path.join(work, f".core_scaling_{c}.json")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(c),
             rep_dir, out_part],
            check=True,
        )
        with open(out_part) as f:
            parts[c] = json.load(f)
        os.unlink(out_part)
    per_key = {
        k: {
            "sec_32": parts[32][k]["sec"],
            "sec_8": parts[8][k]["sec"],
            "runs_32": parts[32][k]["runs"],
            "runs_8": parts[8][k]["runs"],
            "rows": parts[32][k]["rows"],
            "speedup_32_over_8": round(parts[32][k]["sec"] and
                                       parts[8][k]["sec"] / parts[32][k]["sec"], 3),
        }
        for k in KEYS
    }
    payload = {
        "base_sf_dir": base,
        "corpus": "closed-regime 10x replication (sf1-equivalent documents"
                  " + embeddings; scale_stress construction)",
        "protocol": "fresh child process per core count; cold per run"
                    " (created memo entries evicted); min of 3",
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "cores": CORES,
        "per_key": per_key,
        "total_sec_32": round(sum(v["sec_32"] for v in per_key.values()), 3),
        "total_sec_8": round(sum(v["sec_8"] for v in per_key.values()), 3),
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v["speedup_32_over_8"] for k, v in per_key.items()}))


if __name__ == "__main__":
    main()
