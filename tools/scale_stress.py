"""Scale-stress harness: EMPIRICAL growth exponents for the near-dup /
ANN candidate-generation joins at 1x / 3x / 10x of the sf0.1 corpus.

The 100 TB claim for the dedup/ANN family is that every pair generator
is an equi-join on bounded keys, so candidates and wall time grow
~linearly in the corpus — an argued bound until now.  This tool proves
it empirically: it synthesizes 3x and 10x corpora from sf0.1 (so the
10x point is an sf1-equivalent corpus), runs the six candidate
generators cold at each scale, and records rows/seconds/growth
exponents to SCALE_STRESS_r09-style JSON; tests/test_r9_ops.py asserts
the exponents stay far below quadratic.

## Corpus construction (why it is a fair 10x)

A fair Nx corpus must look like an Nx crawl of the SAME distribution:
(a) per-replica duplicate structure identical to the base (the corpus
builder in analytics_queries._corpus plants exact + near dups per
doc_id arithmetic, which replica-stride id salting preserves), and
(b) NO accidental cross-replica near-dups (verbatim replication would
give every doc 10 twins and measure the quadratic blowup the test
exists to refute), while (c) keeping the global token-frequency
profile — hot shingle buckets must keep growing linearly, because hot
buckets are exactly where a candidate join goes quadratic.

Documents — TWO regimes, because real crawls have two growth facts
at once (head tokens grow linearly AND tail vocabulary grows,
Heaps' law), and a 31-word fixture vocabulary cannot express both in
one corpus:

- "closed" (adversarial saturation): replica k remaps tokens through
  a vocabulary ROTATION (rotating the 30 non-marker words by k
  preserves the frequency profile, is a bijection on shingle space —
  within-replica structure EXACTLY preserved — and makes
  cross-replica token/shingle/prefix/char overlap that of unrelated
  docs).  The shingle SPACE stays fixed, so every shingle's document
  frequency grows linearly — the WORST case for prefix/posting-based
  exact joins ("rarest" tokens stop being rare).  Near-dup OUTPUTS
  must still grow linearly here; candidate-stage wall time for
  prefix joins degrades and the artifact records by how much.
- "open" (Heaps-faithful): replica k suffixes every non-marker token
  with the replica number — vocabulary grows 10x with the corpus,
  per-shingle document frequency stays constant (what a real crawl's
  tail looks like), and ALL generators must stay ~linear in both
  rows and time.

The 'dup' marker token maps to itself in both regimes so planted
exact-substring structure stays per-replica.  doc_id' = doc_id +
k*10_000_000 (the _corpus +1M/+2M twin offsets stay inside a stride).

Embeddings: replica k rotates every vector's DIMENSIONS by k — norms
and all within-replica pairwise dots are exactly preserved (the
planted 1.1x twins included), while cross-replica cosines fall to
unrelated-pair levels.  vec_id' = vec_id + k*10_000_000 (the
operator's +1M twin offset stays inside a stride; the %20 twin
selection is stride-invariant since 10M % 20 == 0).

## Measurement protocol

Each (key, scale) cell is timed COLD: memo entries the run creates in
analytics_queries._MATERIALIZED are evicted between runs so shared
projections (postings, jaccard pair table) are re-billed every time —
the generators' real cost includes their candidate-structure build.
Two cold runs per cell, min billed (bench.py's steady-state
estimator; ambient host swings are documented at ~14-20%).

Run:  python tools/scale_stress.py [BASE_SF_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (  # noqa: E402
    load_all_queries,
)
from kafka_connect_postgres_to_clickhouse_spark.session import get_spark  # noqa: E402

KEYS = [
    "q_neardup_minhash",
    "q_neardup_jaccard",
    "q_simhash_neardup",
    "q_fuzzy_dedup",
    "q_editdist_neardup",
    "q_semantic_dedup",
    "q_neardup_cascade",
    # r12: image near-dup — payloads derive from doc_id alone, so the
    # replicated corpus scales the decode+band-join path directly (the
    # closed/open text modes don't change its input; both are kept for
    # run-protocol uniformity)
    "q_phash_neardup",
    # r13 (VERDICT r12 #5): the ANN lifecycle keys, so the O(batch) /
    # bounded-probe claims are MEASURED at 10x rather than argued —
    # PQ ADC search streams stored codes once against a broadcast LUT
    # (expect ~linear in corpus), filtered graph search is
    # beam-bounded per query (query count is fixed, so expect
    # ~index-build-bound), compaction is O(affected cells) where the
    # flood fixture's affected-cell count is corpus-fraction-stable.
    # All three ride stored _materialize layouts whose build cost is
    # INCLUDED by the cold protocol (memo evicted between runs).
    "q_simsearch_pq",
    "q_graph_ann_filtered",
    "q_graph_ann_compact",
    # r13 wave 2: the new ANN tiers (IVFADC composes prune+ADC over
    # stored layouts; BQ is a 2-longs-per-vector full scan + bounded
    # rerank — both expect ~linear in corpus), the perceptual
    # near-dup family extended to video/audio (payloads derive from
    # doc_id, so replication scales the decode+band-join path), LPA
    # on the duplicate graph (edge-grain rounds), and EM linkage —
    # the key with the two-level blocking guard whose closed-regime
    # saturation exponent (1.065 pairs) this artifact MEASURES.
    "q_simsearch_ivfpq",
    "q_simsearch_bq",
    "q_video_phash_neardup",
    "q_audio_fp_neardup",
    "q_label_prop",
    "q_linkage_em",
]
SCALES = [1, 3, 10]
STRIDE = 10_000_000
MARKER = "dup"  # planted exact-substring marker: never remapped


def build_corpus(base_dir: str, out_dir: str, n_replicas: int, mode: str) -> None:
    """Write SINGLE-FILE parquet tables (load_table reads fixture
    files, not Spark part-file directories) via DuckDB/pandas."""
    import duckdb
    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT * FROM '{os.path.join(base_dir, 'documents.parquet')}'"
    ).df()
    vocab = sorted(
        {w for t in docs["text"] for w in t.split()} - {MARKER}
    )
    n = len(vocab)
    parts = []
    for k in range(n_replicas):
        if mode == "closed":
            mapping = {w: vocab[(i + k) % n] for i, w in enumerate(vocab)}
        else:  # open: fresh tail vocabulary per replica (Heaps-faithful)
            mapping = {w: (w if k == 0 else f"{w}{k}") for w in vocab}
        mapping[MARKER] = MARKER
        p = docs.copy()
        p["doc_id"] = p["doc_id"] + k * STRIDE
        if k:
            p["text"] = [
                " ".join(mapping[w] for w in t.split()) for t in docs["text"]
            ]
            p["n_chars"] = [len(t) for t in p["text"]]
        parts.append(p)
    alldocs = pd.concat(parts, ignore_index=True)  # noqa: F841
    con.sql(
        "COPY (SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,"
        " CAST(n_chars AS BIGINT) AS n_chars FROM alldocs) TO "
        f"'{os.path.join(out_dir, 'documents.parquet')}' (FORMAT PARQUET)"
    )

    emb = con.sql(
        f"SELECT * FROM '{os.path.join(base_dir, 'embeddings.parquet')}'"
    ).df()
    mat = np.stack(emb["embedding"].to_numpy())
    eparts = []
    for k in range(n_replicas):
        p = emb.copy()
        p["vec_id"] = p["vec_id"] + k * STRIDE
        if k:
            p["embedding"] = list(np.roll(mat, k, axis=1))
        eparts.append(p)
    allemb = pd.concat(eparts, ignore_index=True)  # noqa: F841
    extra = [c for c in emb.columns if c not in ("vec_id", "embedding")]
    cols = ", ".join(["CAST(vec_id AS BIGINT) AS vec_id",
                      "CAST(embedding AS FLOAT[]) AS embedding", *extra])
    con.sql(
        f"COPY (SELECT {cols} FROM allemb) TO "
        f"'{os.path.join(out_dir, 'embeddings.parquet')}' (FORMAT PARQUET)"
    )


def shingle_skew_main() -> None:
    """Hot-shingle skew stress for the _shingle_array_table build (r14,
    VERDICT r13 next-round #2): plant a universal trigram — prepend
    'hot hot hot hot' to EVERY document, giving the 'hot hot hot'
    shingle df == corpus size — then scale 1x/3x/10x in the closed
    regime (dfs also grow linearly) and time the shingle-array spill
    build cold.  The r13 single-collect_list shape put the hot
    shingle's ENTIRE posting list in one aggregation row (a single
    task's buffer, unsplittable by AQE); the r14 salted shape bounds
    every aggregation row at ~df/16 and leaves the hot key to a
    skew-splittable join.  Receipt: build secs + output rows + growth
    exponents, plus the hottest shingle's df per scale.

    Run: python tools/scale_stress.py --shingle-skew [BASE] [OUT_JSON]
    """
    import math

    argv = [a for a in sys.argv[1:] if a != "--shingle-skew"]
    base = argv[0] if argv else "/root/testdata/sf0.1"
    out_json = argv[1] if len(argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_STRESS_SHINGLE_r14.json",
    )
    work = os.environ.get(
        "SPARK_GRAFT_STRESS_DIR",
        os.path.join(os.path.dirname(out_json), ".scale_stress"),
    )
    spark = get_spark("kcptc-shingle-skew")
    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (
        _MATERIALIZED,
        _corpus_shingles,
        _materialize,
        _shingle_array_table,
    )

    import duckdb
    import pandas as pd  # noqa: F401

    def hotify(src_dir: str, dst_dir: str) -> None:
        os.makedirs(dst_dir, exist_ok=True)
        con = duckdb.connect()
        con.sql(
            "COPY (SELECT CAST(doc_id AS BIGINT) AS doc_id,"
            " 'hot hot hot hot ' || text AS text, lang, source,"
            " CAST(n_chars + 16 AS BIGINT) AS n_chars"
            f" FROM '{os.path.join(src_dir, 'documents.parquet')}')"
            f" TO '{os.path.join(dst_dir, 'documents.parquet')}' (FORMAT PARQUET)"
        )
        for t in ("embeddings",):
            con.sql(
                f"COPY (SELECT * FROM '{os.path.join(src_dir, t)}.parquet')"
                f" TO '{os.path.join(dst_dir, t)}.parquet' (FORMAT PARQUET)"
            )

    def exp(v1: float, v10: float) -> float:
        return round(math.log10(max(v10, 1e-9) / max(v1, 1e-9)), 3)

    cells: dict[str, dict] = {}
    for s in SCALES:
        if s == 1:
            rep_dir = base
        else:
            rep_dir = os.path.join(work, f"closed_x{s}")
            if not os.path.exists(os.path.join(rep_dir, "documents.parquet")):
                build_corpus(base, rep_dir, s, "closed")
        d = os.path.join(work, f"skew_hot_x{s}")
        hotify(rep_dir, d)
        runs = []
        nrows = None
        hot_df = None
        for _ in range(2):
            pre = set(_MATERIALIZED)
            t0 = time.time()
            nrows = _shingle_array_table(spark, d).count()
            runs.append(round(time.time() - t0, 3))
            for mk in list(_MATERIALIZED):
                if mk not in pre:
                    del _MATERIALIZED[mk]
        # hottest shingle df, read off the postings (cold rebuild evicted)
        from pyspark.sql import functions as F

        hot_df = (
            _materialize(spark, d, "postings", lambda: _corpus_shingles(spark, d))
            .groupBy("sh").count().agg(F.max("count")).collect()[0][0]
        )
        for mk in list(_MATERIALIZED):
            del _MATERIALIZED[mk]
        cells[str(s)] = {"rows": nrows, "sec": min(runs), "runs": runs,
                         "max_shingle_df": hot_df}
        print(f"[skew] {s}x: rows={nrows} sec={runs} max_df={hot_df}", flush=True)

    payload = {
        "base_sf_dir": base,
        "scales": SCALES,
        "protocol": "cold per run (created memo entries evicted), min of 2",
        "what": "_shingle_array_table build under a planted universal "
                "trigram (df == corpus docs) at 1x/3x/10x closed-regime",
        "cells": cells,
        "exp_sec": exp(cells["1"]["sec"], cells["10"]["sec"]),
        "exp_rows": exp(cells["1"]["rows"], cells["10"]["rows"]),
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"exp_sec": payload["exp_sec"],
                      "exp_rows": payload["exp_rows"]}))


def main() -> None:
    if "--shingle-skew" in sys.argv:
        shingle_skew_main()
        return
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_STRESS_r10.json",
    )
    work = os.environ.get(
        "SPARK_GRAFT_STRESS_DIR",
        os.path.join(os.path.dirname(out_json), ".scale_stress"),
    )
    spark = get_spark("kcptc-scale-stress")
    registry = load_all_queries()

    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (
        _MATERIALIZED,
    )

    import math

    def exp(v1: float, v10: float) -> float:
        return round(math.log10(max(v10, 1e-9) / max(v1, 1e-9)), 3)

    regimes: dict[str, dict] = {}
    for mode in ("closed", "open"):
        dirs: dict[int, str] = {}
        sizes: dict[int, dict[str, int]] = {}
        for s in SCALES:
            if s == 1:
                dirs[s] = base
            else:
                d = os.path.join(work, f"{mode}_x{s}")
                build_corpus(base, d, s, mode)
                dirs[s] = d
            sizes[s] = {
                "documents": spark.read.parquet(
                    os.path.join(dirs[s], "documents.parquet")
                ).count(),
                "embeddings": spark.read.parquet(
                    os.path.join(dirs[s], "embeddings.parquet")
                ).count(),
            }
            print(f"[{mode}] scale {s}x: {sizes[s]}", flush=True)

        per_key: dict[str, dict] = {}
        for key in KEYS:
            rows: dict[str, int] = {}
            secs: dict[str, float] = {}
            for s in SCALES:
                runs = []
                nrows = None
                for _ in range(2):
                    pre = set(_MATERIALIZED)
                    t0 = time.time()
                    nrows = registry[key].fn(spark, dirs[s]).count()
                    runs.append(round(time.time() - t0, 3))
                    for mk in list(_MATERIALIZED):
                        if mk not in pre:
                            del _MATERIALIZED[mk]
                rows[str(s)] = nrows
                secs[str(s)] = min(runs)
                print(f"[{mode}] {key} @ {s}x: rows={nrows} sec={runs}", flush=True)
            per_key[key] = {
                "rows": rows,
                "sec": secs,
                # growth exponent e such that metric ~ scale^e, from
                # the 1x -> 10x endpoints (log10 of the ratio);
                # linear = 1.0, quadratic = 2.0
                "exp_rows": exp(rows["1"], rows["10"]),
                "exp_sec": exp(secs["1"], secs["10"]),
            }
        regimes[mode] = {"corpus_sizes": sizes, "per_key": per_key}

    payload = {
        "base_sf_dir": base,
        "scales": SCALES,
        "protocol": "cold per run (created memo entries evicted), min of 2",
        "billing": "min2",
        "notes": {
            "open": "Heaps-faithful regime (vocabulary grows with the"
            " corpus): ALL generators must be ~linear in rows and time;"
            " this is the regime that models a real 10x crawl tail.",
            "closed": "adversarial saturation regime (fixed shingle"
            " space, per-shingle df grows linearly): exact-join OUTPUTS"
            " must stay linear; prefix-join (jaccard PPJoin, PassJoin)"
            " candidate time degrades because 'rarest' prefixes stop"
            " being rare — the known saturation mode whose production"
            " mitigation is the sketch-first cascade (minhash candidates"
            " -> exact verify) this engine also provides;"
            " q_neardup_minhash's CANDIDATE rows grow with the"
            " truly-similar-pair mass (the LSH S-curve firing on"
            " moderate-jaccard pairs, which is itself quadratic when"
            " every doc resembles every doc) while its wall time stays"
            " sublinear.",
        },
        "regimes": regimes,
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1)
    print(
        json.dumps(
            {
                mode: {k: (v["exp_rows"], v["exp_sec"]) for k, v in r["per_key"].items()}
                for mode, r in regimes.items()
            }
        )
    )


if __name__ == "__main__":
    main()
