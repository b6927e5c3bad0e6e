"""Round-10 operator invariants: the saturation guards.

The oracle gate proves value equality on natural corpora where the
guards never fire; these tests FORCE each guard to fire on planted
pathological fixtures and pin its contract:

- q_editdist_neardup's symmetric-delete route is EXACT — on a corpus
  with a >529-df shared segment the result must still equal brute
  force, including pairs whose only intact segment is the hot one
  (invisible to the capped equi-join by construction).
- q_neardup_jaccard's hot route is a sketch (LSH S-curve recall), so
  the pin is precision-1 + guaranteed recall of exact-duplicate pairs
  (P(candidate | J=1) = 1), plus proof the fixture actually saturates
  the cap.
"""

from __future__ import annotations

import itertools

import pandas as pd

SF = "/root/testdata/sf0.01"


def _q(name):
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )

    return load_all_queries()[name].fn


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": "en",
            "source": "hot",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)


def test_editdist_d2_route_equals_brute_force(spark, tmp_path):
    """Force the per-key df crossover (EDITDIST_HOT_DF = 529): 560
    base docs share an identical first segment, so after _corpus's
    +1M/+2M augmentation its (i=0) posting df is far past 529 and the
    hot keys leave the equi-join.  The planted twin pairs differ by
    ONE edit in segment 1 and ONE in segment 2 — their only intact
    segment is the hot one, so the capped join alone CANNOT see them;
    only the symmetric-delete band can.  Result must equal pure-Python
    brute force exactly (the route is exact, not a sketch)."""
    head = "qqqqqqqqqqq"  # 11 chars: segment 0 of every 32-char prefix
    texts = []
    for i in range(260):
        # 21-char unique tail -> total 32; tails differ pairwise by
        # their embedded index digits (distance > 2 between families)
        tail = f"u{i:04d}" + "abcdefghijklmnop"
        s = head + tail
        texts.append(s)
        if i % 13 == 0:
            # twin: substitute one char inside segment 1 (pos ~14) and
            # one inside segment 2 (pos ~27) -> ed == 2, only segment
            # 0 intact
            t = list(s)
            t[14] = "x" if t[14] != "x" else "y"
            t[27] = "x" if t[27] != "x" else "y"
            texts.append("".join(t))
    _write_docs(tmp_path, texts)

    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (  # noqa: E501
        _corpus,
    )
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (  # noqa: E501
        EDITDIST_HOT_DF,
    )

    prefixes = {
        r["doc_id"]: r["s"]
        for r in _corpus(spark, str(tmp_path))
        .selectExpr("doc_id", "substring(lower(text), 1, 32) AS s")
        .filter("length(s) >= 3")
        .collect()
    }
    # the fixture must actually cross the route threshold
    seg0_df = sum(1 for s in prefixes.values() if s[:10] == head[:10].lower())
    assert seg0_df > EDITDIST_HOT_DF, seg0_df

    truth = {
        (a, b, _lev(prefixes[a], prefixes[b]))
        for a, b in itertools.combinations(sorted(prefixes), 2)
        if abs(len(prefixes[a]) - len(prefixes[b])) <= 2
        and _lev(prefixes[a], prefixes[b]) <= 2
    }
    got = {
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in _q("q_editdist_neardup")(spark, str(tmp_path)).collect()
    }
    assert got == truth
    # and the planted hot-only twins are non-trivially present
    assert any(d == 2 for _, _, d in truth)


def test_editdist_d2_route_covers_cross_length_pairs(spark, tmp_path):
    """The r11 hole (ADVICE r10): a missed pair's witness keys carry
    the SHORTER doc's length, so the LONGER end touches hot keys only
    through its PROBE rows.  An idx-side-only hot band dropped such
    pairs from BOTH routes.  Fixture: a 560-strong 30-char hot family
    (shared segment 0 -> key (0, 30, head) goes hot) plus cross-length
    twins b = a with two chars INSERTED inside segments 1 and 2 —
    b is 32 chars, its own idx keys (i, 32, ...) are cold, and a's
    seg1/seg2 are split by the insertions so the ONLY witness key is
    the hot one.  The result must still equal brute force, including
    every planted cross-length twin."""
    head = "qqqqqqqqqqq"  # 11 chars: covers segment 0 ([0:10]) at L=30
    texts, planted = [], []
    for i in range(280):
        tail = f"u{i:04d}" + "abcdefghijklmn"  # 19 chars -> total 30
        a = head + tail
        texts.append(a)
        if i % 14 == 0:
            # insert inside seg1 span [10,20) and seg2 span [20,30):
            # ed == 2, a's seg1/seg2 no longer substrings of b, b's own
            # length-32 segment keys stay cold
            b = a[:15] + "z" + a[15:25] + "z" + a[25:]
            assert len(b) == 32 and _lev(a, b) == 2
            planted.append((len(texts), len(texts) + 1))
            texts.append(b)
    _write_docs(tmp_path, texts)

    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (  # noqa: E501
        _corpus,
    )
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (  # noqa: E501
        EDITDIST_HOT_DF,
    )

    prefixes = {
        r["doc_id"]: r["s"]
        for r in _corpus(spark, str(tmp_path))
        .selectExpr("doc_id", "substring(lower(text), 1, 32) AS s")
        .filter("length(s) >= 3")
        .collect()
    }
    # the 30-char family's (i=0, la=30) key must actually cross the cap
    seg0_df = sum(
        1 for s in prefixes.values() if len(s) == 30 and s[:10] == head[:10]
    )
    assert seg0_df > EDITDIST_HOT_DF, seg0_df

    truth = {
        (a, b, _lev(prefixes[a], prefixes[b]))
        for a, b in itertools.combinations(sorted(prefixes), 2)
        if abs(len(prefixes[a]) - len(prefixes[b])) <= 2
        and _lev(prefixes[a], prefixes[b]) <= 2
    }
    got = {
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in _q("q_editdist_neardup")(spark, str(tmp_path)).collect()
    }
    assert got == truth
    # and the planted cross-length twins are present, not vacuous
    for a, b in planted:
        assert (a, b, 2) in got, (a, b)


def test_jaccard_cap_engages_with_precision_and_exact_dup_recall(
    spark, tmp_path
):
    """Force JACCARD_HOT_DF: a 5-word vocabulary over 220 docs makes
    every 3-gram shingle's global df cross the cap, so the PPJoin
    drops all hot postings and the minhash hot route carries the
    pairs.  Pins: (a) the fixture saturates (max prefix df > cap);
    (b) precision 1.0 — every reported pair verifies at true Jaccard
    >= 0.5 (exact verify is shared by both routes); (c) recall 1.0 on
    exact-duplicate pairs (identical shingle sets collide in every
    minhash band)."""
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = []
    for i in range(110):
        body = " ".join(words[(i + j) % 5] for j in range(12))
        texts.append(body)
        texts.append(body)  # exact duplicate -> J = 1.0 pair
    _write_docs(tmp_path, texts)

    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (  # noqa: E501
        JACCARD_HOT_DF,
        _corpus,
        shingles,
    )
    from pyspark.sql import functions as F

    grams = {
        r["doc_id"]: frozenset(r["g"])
        for r in _corpus(spark, str(tmp_path))
        .select("doc_id", shingles(F.lower(F.col("text")), 3).alias("g"))
        .collect()
    }
    # (a) saturation: some shingle df crosses the cap
    from collections import Counter

    df_counts = Counter(sh for g in grams.values() for sh in g)
    assert max(df_counts.values()) > JACCARD_HOT_DF

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _q("q_neardup_jaccard")(spark, str(tmp_path)).collect()
    }

    def jac(a, b):
        ga, gb = grams[a], grams[b]
        return len(ga & gb) / len(ga | gb) if ga | gb else 0.0

    # (b) precision 1.0
    for (a, b), j in got.items():
        assert a < b
        assert abs(jac(a, b) - j) < 1e-12
        assert j >= 0.5
    # (c) exact-duplicate recall 1.0
    for a, b in itertools.combinations(sorted(grams), 2):
        if grams[a] and grams[a] == grams[b]:
            assert (a, b) in got, (a, b)


def test_graph_ann_insert_equals_full_rebuild(spark):
    """Splice == rebuild, in Spark (the DuckDB oracle already proves
    it cross-engine): (1) a full re-assignment of the augmented corpus
    against the stored codebook moves NO base vector (centroids are
    immutable under insert, so stored cell membership stays valid);
    (2) per-new-vector edge stats derived from a from-scratch rebuild
    (fresh assignment -> fresh cell edges) equal the operator's
    spliced output row for row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_connect_postgres_to_clickhouse_spark.functions.vectors import (
        norm2_scaled,
    )
    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (  # noqa: E501
        _emb_norms,
        _ivf_assign_table,
        _ivf_cell_scores,
        _ivf_cents,
    )
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (  # noqa: E501
        _cell_topk_edges,
    )
    from kafka_connect_postgres_to_clickhouse_spark.sources.tables import (
        load_table,
    )

    norms = _emb_norms(spark, SF).select("vec_id", "embedding", "n2")
    cents = _ivf_cents(norms)
    newv = (
        load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") % 16 == 1)
        .select(
            (F.col("vec_id") + 3_000_000).alias("vec_id"),
            F.reverse("embedding").alias("embedding"),
        )
        .withColumn("n2", norm2_scaled(F.col("embedding")))
    )
    aug = norms.unionByName(newv)
    w_v = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cent_id"))
    fresh = (
        _ivf_cell_scores(aug, cents)
        .withColumn("rn", F.row_number().over(w_v))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id")
    )
    # (1) no base vector changes cells
    stored = {
        (r.vec_id, r.cent_id) for r in _ivf_assign_table(spark, SF).collect()
    }
    fresh_base = {
        (r.vec_id, r.cent_id)
        for r in fresh.filter(F.col("vec_id") < 3_000_000).collect()
    }
    assert fresh_base == stored

    # (2) from-scratch rebuild stats == spliced operator output
    edges = (
        fresh.join(aug, "vec_id")
        .groupBy("cent_id")
        .applyInPandas(_cell_topk_edges, "src long, dst long")
        .localCheckpoint(eager=True)
    )
    rebuilt = {}
    new_cells = {
        r.vec_id: r.cent_id
        for r in fresh.filter(F.col("vec_id") >= 3_000_000).collect()
    }
    erows = edges.collect()
    for v, cell in new_cells.items():
        od = sum(1 for e in erows if e.src == v)
        ig = sum(1 for e in erows if e.dst == v and e.src < 3_000_000)
        rebuilt[v] = (cell, od, ig)
    got = {
        r.vec_id: (r.cent_id, r.out_degree, r.in_from_old)
        for r in _q("q_graph_ann_insert")(spark, SF).collect()
    }
    assert got == rebuilt
    assert got, "batch must be non-empty"
    assert any(v[1] > 0 for v in got.values())  # some new vector linked


def test_graph_ann_delete_cell_accounting(spark):
    """Post-delete cell invariants: every affected cell actually lost
    members; remaining counts are consistent with the stored
    assignment; recomputed edges respect the top-8 degree bound
    (n_left*(min(8, n_left-1)) exactly, since in-cell kNN is total)."""
    rows = _q("q_graph_ann_delete")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_removed"] >= 1
        assert r["edges_after"] == r["n_left"] * min(8, max(r["n_left"] - 1, 0))


def test_simsearch_filtered_respects_predicate_and_overscan(spark):
    """Every filtered hit shares the query's label (predicate safety),
    ranks are dense top-4, and — the overscan rationale — the
    filtered result is NOT simply the label-filtered unfiltered
    top-10 (deeper probes reach vectors the 4-cell probe never
    scored), or when it is, it at least fills all 4 slots."""
    from kafka_connect_postgres_to_clickhouse_spark.sources.tables import (
        load_table,
    )

    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF, "embeddings").select("vec_id", "label").collect()
    }
    rows = _q("q_simsearch_filtered")(spark, SF).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert labels[r["vec_id"]] == labels[r["query_id"]]
        by_q.setdefault(r["query_id"], []).append(r["cos_sim"])
    for q, sims in by_q.items():
        assert len(sims) == 4, (q, sims)
        assert all(-1.0 <= s <= 1.0 + 1e-9 for s in sims)


def test_ann_graph_spill_is_built_once_per_session(spark):
    """The r10 perf win (q_graph_ann_calibration 9.6s -> ~2s) rests on
    the graph index being a session-memoized spill: both search keys
    and both widths must resolve to the SAME _MATERIALIZED entry, not
    rebuild per consumer.  Guards the regression class where a key
    accidentally forks its own build (the exact bug this round fixed)."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (  # noqa: E501
        _MATERIALIZED,
    )
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (  # noqa: E501
        _ann_graph_table,
    )

    _q("q_simsearch_graph")(spark, SF).count()
    keys_after_first = {k for k in _MATERIALIZED if "ann_graph" in str(k)}
    assert len(keys_after_first) == 1, keys_after_first
    _q("q_graph_ann_calibration")(spark, SF).count()
    keys_after_both = {k for k in _MATERIALIZED if "ann_graph" in str(k)}
    assert keys_after_both == keys_after_first
    # and the helper returns the spilled frame, not a fresh build
    df = _ann_graph_table(spark, SF)
    assert df.columns == ["src", "dst"]
    assert keys_after_both == {k for k in _MATERIALIZED if "ann_graph" in str(k)}


def test_bpe_apply_consistency(spark):
    """q_bpe_apply invariants: fertility >= 1.0 (a word is >= 1
    subword), subtoken totals consistent with the trained vocabulary,
    and the corpus-wide token count strictly above the whitespace
    baseline only if some word is longer than its merges collapse."""
    rows = _q("q_bpe_apply")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_words"] >= 1
        assert r["n_subtokens"] >= r["n_words"]
        assert r["fertility_micro"] == (1_000_000 * r["n_subtokens"]) // r["n_words"]
        assert r["fertility_micro"] >= 1_000_000
