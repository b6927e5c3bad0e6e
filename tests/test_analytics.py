"""Analytics operators that are approximate by design (no DuckDB
oracle): recall against the exact answer, and exactness of the
prefix-filtered Jaccard join against a brute-force Spark computation.

Everything here is deterministic (MD5-derived hyperplanes/minhashes,
fixed fixtures), so recall values are exactly reproducible; thresholds
sit below the measured values only to survive fixture regeneration.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (
    _corpus_shingle_arrays,
)
from kafka_connect_postgres_to_clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_lsh_recall_vs_exact(spark, queries):
    exact = {(r.query_id, r.vec_id) for r in queries["q_simsearch_topk"](spark, SF).collect()}
    got = {(r.query_id, r.vec_id) for r in queries["q_simsearch_lsh"](spark, SF).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"multi-table LSH recall degraded: {recall:.3f}"


def test_ivf_recall_vs_exact(spark, queries):
    exact = {(r.query_id, r.vec_id) for r in queries["q_simsearch_topk"](spark, SF).collect()}
    got = {(r.query_id, r.vec_id) for r in queries["q_simsearch_ivf"](spark, SF).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"IVF nprobe=4 recall degraded: {recall:.3f}"


def test_minhash_finds_all_planted_duplicates(spark, queries):
    """Exact copies share every minhash (recall 1.0 guaranteed); the
    planted near-dups (one trailing token dropped) must also collide in
    at least one band on this fixture."""
    mh = _pairs(queries["q_neardup_minhash"](spark, SF))
    ids = [r.doc_id for r in load_table(spark, SF, "documents").select("doc_id").collect()]
    exact_pairs = {(i, i + 2_000_000) for i in ids}
    near_pairs = {(i, i + 1_000_000) for i in ids if i % 10 == 0}
    assert exact_pairs <= mh
    assert near_pairs <= mh


def test_jaccard_prefix_join_equals_bruteforce(spark, queries):
    """The PPJoin prefix/length/positional filters must not lose a
    single pair: compare against the unfiltered all-pairs join."""
    fast = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in queries["q_neardup_jaccard"](spark, SF).collect()
    }
    arrays = _corpus_shingle_arrays(spark, SF).filter(F.size("sh_arr") > 0)
    a = arrays.select(F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a"))
    b = arrays.select(F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b"))
    c = F.size(F.array_intersect("arr_a", "arr_b"))
    jac = c.cast("double") / (F.size("arr_a") + F.size("arr_b") - c)
    brute = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert fast == brute


def test_containment_prefix_join_equals_bruteforce(spark, queries):
    """The one-sided rare-first prefix filter of the containment join
    (smaller doc indexes only its nb - ceil(0.8*nb) + 1 rarest
    shingles) must not lose a single pair: the pigeonhole argument is
    checked against the unfiltered all-pairs join at the same 0.8
    overlap-coefficient threshold."""
    fast = {
        (r.doc_a, r.doc_b, r.n_common, r.containment_bp)
        for r in queries["q_containment"](spark, SF).collect()
    }
    arrays = _corpus_shingle_arrays(spark, SF).filter(F.size("sh_arr") > 0)
    a = arrays.select(F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a"))
    b = arrays.select(F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b"))
    c = F.size(F.array_intersect("arr_a", "arr_b"))
    brute = {
        (r.doc_a, r.doc_b, r.n_common, r.containment_bp)
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            c.alias("c"),
            F.size("arr_a").alias("na"),
            F.size("arr_b").alias("nb"),
        )
        .filter(10000 * F.col("c") >= 8000 * F.least("na", "nb"))
        .select(
            "doc_a",
            "doc_b",
            F.col("c").cast("long").alias("n_common"),
            F.expr("(10000 * c) div LEAST(na, nb)").alias("containment_bp"),
        )
        .collect()
    }
    assert fast and fast == brute


def test_dedup_clusters_consistent_with_pairs(spark, queries):
    """Cluster assignment must be the exact connected components of the
    Jaccard pair graph: both endpoints of every pair share a cluster,
    every cluster id is its component's min, and exactly one doc per
    cluster is kept.  (The fixture corpus contains organic near-dups
    between distinct originals, so the planted {x, x+1M, x+2M} shape is
    a subset, not the whole graph.)"""
    rows = queries["q_dedup_clusters"](spark, SF).collect()
    cluster_of = {r.doc_id: r.cluster_id for r in rows}
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
        assert r.keep == (r.doc_id == r.cluster_id)
    assert sum(1 for r in rows if r.keep) == len(by_cluster)
    pair_rows = queries["q_neardup_jaccard"](spark, SF).collect()
    assert pair_rows, "fixture must contain near-dup pairs"
    for p in pair_rows:
        assert cluster_of[p.doc_a] == cluster_of[p.doc_b]
    assert set(cluster_of) == {x for p in pair_rows for x in (p.doc_a, p.doc_b)}
    for cid, members in by_cluster.items():
        assert cid == min(members)
        # planted exact dup is always in its original's component
        if cid < 1_000_000:
            assert cid + 2_000_000 in cluster_of
            assert cluster_of[cid + 2_000_000] == cluster_of[cid]


def test_materialized_intermediates_spill_to_parquet(spark, queries):
    """Shared heavy intermediates (shingle postings, verified pair
    table) must be parquet temp tables, not executor-memory-pinned
    checkpoint blocks: a consumer's physical plan shows a parquet scan
    of the spill directory, so at cluster scale the reuse is bounded
    by disk, survives executor loss, and keeps column pruning."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (
        _materialize_root,
    )

    df = queries["q_neardup_jaccard"](spark, SF)
    df.count()  # force the first consumer to build + spill
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_materialized" in plan and "parquet" in plan.lower(), plan[:2000]
    assert _materialize_root() in plan or "_materialized" in plan


def test_materialize_root_outside_package_tree(spark, monkeypatch, tmp_path):
    """The spill directory must never live under the installed package
    or source tree (read-only installs, packaging hygiene): the default
    is a tmp path, SPARK_GRAFT_MATERIALIZE_DIR overrides it, and a real
    spill through the override leaves the package directory untouched."""
    import os

    import kafka_connect_postgres_to_clickhouse_spark as pkg
    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (
        _MATERIALIZED,
        MATERIALIZATION_TRIGGERS,
        _materialize_root,
    )

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    repo_dir = os.path.dirname(pkg_dir)

    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE_DIR", raising=False)
    default_root = os.path.abspath(_materialize_root())
    assert not default_root.startswith(pkg_dir + os.sep)
    assert not default_root.startswith(os.path.join(repo_dir, "kafka_connect"))

    override = str(tmp_path / "spill")
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_DIR", override)
    assert _materialize_root() == override

    def tree(d):
        return {
            os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs
        }

    before = tree(pkg_dir)
    saved = dict(_MATERIALIZED)
    _MATERIALIZED.clear()
    try:
        MATERIALIZATION_TRIGGERS["emb_norms"](spark, SF).count()
        spilled = tree(override)
        assert any(f.endswith(".parquet") for f in spilled), spilled
    finally:
        _MATERIALIZED.clear()
        _MATERIALIZED.update(saved)
    assert tree(pkg_dir) == before, "materialize wrote under the package tree"


def test_pair_graph_broadcast_config_flip(spark, queries):
    """spark.kcptc.broadcastPairGraph=false must flip the pair-graph
    joins to shuffle joins without changing results — the documented
    escape hatch for duplicate graphs too big to broadcast."""
    key = "spark.kcptc.broadcastPairGraph"
    base = {
        tuple(r) for r in queries["q_cross_source_dups"](spark, SF).collect()
    }
    spark.conf.set(key, "false")
    try:
        flipped = {
            tuple(r) for r in queries["q_cross_source_dups"](spark, SF).collect()
        }
        clusters = {
            (r.doc_id, r.cluster_id)
            for r in queries["q_dedup_clusters"](spark, SF).collect()
        }
    finally:
        spark.conf.set(key, "true")
    assert flipped == base
    assert clusters  # propagation converged without broadcasts
