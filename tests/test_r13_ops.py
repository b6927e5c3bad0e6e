"""Round-13 operator tests.

PQ codebook training (Lloyd per subspace, VERDICT r12 next-round #1)
first; the other r13 keys (video/audio perceptual near-dup, MP2
synthesis, snapshot interleave) pin their invariants in the sections
below as they land.
"""

from __future__ import annotations

SF0001 = "/root/testdata/sf0.001"


def test_pq_lloyd_distortion_monotone(spark):
    """Lloyd's invariant on the PQ training loop: total scaled-integer
    distortion of the assignment pass is monotone NON-INCREASING per
    iteration (update step never hurts for fixed assignment,
    re-assignment never hurts for fixed centroids), and training
    strictly beats the untrained init codebook (measured sf0.001:
    611.0B -> 421.2B -> 412.6B, a 31% distortion cut in 2 updates)."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        _pq_lloyd_train,
    )

    _, dists = _pq_lloyd_train(spark, SF0001, n_iters=3)
    assert len(dists) == 3
    assert dists[0] >= dists[1] >= dists[2], dists
    assert dists[1] < 0.8 * dists[0], dists  # training genuinely moves


def test_video_sig_invariance_and_separation():
    """The q_video_phash_neardup fixture contract, over EVERY group
    (53 fixed scene sets — corpus-size-independent): the four
    byte/frame-diverse variants (8-frame GIF, BMP-strip re-encode,
    frame-dropped 4-frame GIF, brightness-shifted strip) of a group
    share ONE video signature, and the 53 signatures are pairwise
    separated far beyond the hd<=3 join threshold (measured min 16)."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        VPHASH_GROUPS,
        _video_payload,
    )
    from kafka_connect_postgres_to_clickhouse_spark.streaming.multimodal import (
        decode_bmp,
        decode_gif,
        phash64,
        split_bmp_stream,
        video_sig,
    )

    def sig(did: int) -> int:
        p = _video_payload(did)
        frames = (
            decode_gif(p)
            if p[:4] == b"GIF8"
            else [decode_bmp(c) for c in split_bmp_stream(p)]
        )
        return video_sig(phash64(f) for f in frames)

    sigs = []
    for g in range(VPHASH_GROUPS):
        variants = {sig(g + v * VPHASH_GROUPS) for v in range(4)}
        assert len(variants) == 1, f"group {g} variants diverge: {variants}"
        sigs.append(variants.pop())
    assert len(set(sigs)) == VPHASH_GROUPS
    min_hd = min(
        bin(a ^ b).count("1")
        for i, a in enumerate(sigs)
        for b in sigs[i + 1 :]
    )
    assert min_hd >= 10, min_hd  # measured 16; join threshold is 3


def test_audio_fp_invariance_and_separation():
    """The q_audio_fp_neardup fixture contract, over EVERY group (61
    fixed waveforms): the four variants (WAV, FLAC re-encode — exact
    by losslessness, DC-level-shifted WAV, 2x sample-repeated FLAC)
    share ONE fingerprint, and the 61 fingerprints separate far
    beyond hd<=3 (measured min 18)."""
    import numpy as np

    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        AFP_GROUPS,
        _audio_payload,
    )
    from kafka_connect_postgres_to_clickhouse_spark.streaming.multimodal import (
        audiofp64,
        decode_flac,
        decode_wav,
    )

    def fp(did: int) -> int:
        p = _audio_payload(did)
        if p[:4] == b"RIFF":
            xs = np.asarray(decode_wav(p)[0]) * 32768.0
        else:
            xs = decode_flac(p).astype(np.float64)
        return audiofp64(xs)

    fps = []
    for g in range(AFP_GROUPS):
        variants = {fp(g + v * AFP_GROUPS) for v in range(4)}
        assert len(variants) == 1, f"group {g} variants diverge: {variants}"
        fps.append(variants.pop())
    assert len(set(fps)) == AFP_GROUPS
    min_hd = min(
        bin(a ^ b).count("1") for i, a in enumerate(fps) for b in fps[i + 1 :]
    )
    assert min_hd >= 10, min_hd  # measured 18; join threshold is 3


def test_audiofp_hostile_inputs():
    """audiofp64 rejects non-multiple-of-1024 streams and empty input
    with its own diagnostic; video_sig rejects an empty hash set."""
    import numpy as np
    import pytest

    from kafka_connect_postgres_to_clickhouse_spark.streaming.multimodal import (
        audiofp64,
        video_sig,
    )

    with pytest.raises(ValueError, match="multiple of 1024"):
        audiofp64(np.zeros(1000))
    with pytest.raises(ValueError, match="multiple of 1024"):
        audiofp64(np.zeros(0))
    with pytest.raises(ValueError, match="at least one frame"):
        video_sig([])


def test_snapshot_interleave_watermark_is_load_bearing(spark):
    """The DBLog act's three behaviors must all be REAL on the
    fixture, and the watermark dedup must be load-bearing:

    (a) provenance mix — some keys finalize via a chunk (snapshot)
        row, some via a log event;
    (b) with the dedup ON, the interleaved state equals the direct
        apply-deletes replay exactly (the registry oracle re-proves
        this cross-engine; here it's the negative control's baseline);
    (c) with the dedup OFF, a stale chunk row clobbers at least one
        key whose last update landed inside the watermark window —
        the exact failure mode DBLog's watermarks exist to prevent."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        _snapshot_interleave_state,
    )
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )

    good = _snapshot_interleave_state(spark, SF0001)
    via = {r["_via"] for r in good.select("_via").distinct().collect()}
    assert via == {"r", "u"}, via  # (a)

    replay = load_all_queries()["q_delete_apply"].fn(spark, SF0001)
    as_map = lambda df: {  # noqa: E731
        r.user_id: (r.username, r.account_type, r.last_seq)
        for r in df.collect()
    }
    g, o = as_map(good), as_map(replay)
    assert g == o  # (b)

    bad = _snapshot_interleave_state(spark, SF0001, dedup_window=False)
    b = as_map(bad)
    assert b != o  # (c): the watermark dedup is what makes (b) true
    clobbered = {k for k in o if b.get(k) != o[k]}
    assert clobbered, "negative control produced no stale clobbers"
    # the clobbered keys' wrong values are STALE versions (older
    # last_seq), the signature of a snapshot row applied too late
    for k in clobbered:
        assert b[k][2] < o[k][2], (k, b[k], o[k])


def test_pq_train_cells_match_code_table(spark):
    """q_pq_train's (m, cid) cells are exactly the stored code table
    unpivoted: per-subspace member counts sum to the corpus size and
    distortions sum to the code table's total qerr."""
    from pyspark.sql import functions as F

    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        _pq_code_table,
        q_pq_train,
    )

    t = _pq_code_table(spark, SF0001)
    n = t.count()
    total_qerr = t.agg(F.sum("qerr_scaled")).collect()[0][0]
    stats = q_pq_train(spark, SF0001).collect()
    for m in range(4):
        assert sum(r.n_vecs for r in stats if r.m == m) == n
    assert sum(r.distortion_scaled for r in stats) == total_qerr


def test_ivfpq_composite(spark):
    """q_simsearch_ivfpq invariants at sf0.001 (the IVFADC composite):

    (a) PRUNING IS REAL — every scored candidate's stored IVF cell is
        one of its query's 4 probed cells (~200 of 499 candidates per
        query reach scoring; cell pruning = join pruning);
    (b) residual-codebook training obeys Lloyd (distortion monotone
        non-increasing; measured sf0.001 697.5B -> 566.3B, a 19% cut
        over the residual init);
    (c) the production shortlist property vs the ATTAINABLE target —
        exact top-10 WITHIN the probed cells (the coarse quantizer
        caps recall at the probe ceiling, 0.62 mean here, so grading
        the ADC stage against the global top-10 would conflate the
        two approximations): measured means 0.22 / 0.54 / 0.64 at
        K = 10/50/100, monotone in K; floors pinned at mean@100 >=
        0.5, per-query@100 >= 0.3, mean@50 >= 0.4."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (
        _emb_norms,
        _ivf_assign_table,
        _ivf_cell_scores,
        _ivf_cents,
    )
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        _ivfpq_adc_scores,
        _ivfpq_resid_vecs,
        _pq_lloyd_train,
    )
    from kafka_connect_postgres_to_clickhouse_spark.sources.tables import load_table

    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist_scaled"), F.asc("vec_id")
    )
    ranked = (
        _ivfpq_adc_scores(spark, SF0001)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .toPandas()
    )
    norms = _emb_norms(spark, SF0001).select("vec_id", "embedding", "n2")
    cents = _ivf_cents(norms)
    wn = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cent_id"))
    probes = (
        _ivf_cell_scores(norms.filter(F.col("vec_id") < 5), cents)
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") <= 4)
        .select(F.col("vec_id").alias("q"), "cent_id")
        .toPandas()
    )
    assign = _ivf_assign_table(spark, SF0001).toPandas()
    cell = dict(zip(assign.vec_id, assign.cent_id))

    # (a) every candidate lives in a probed cell
    for q in range(5):
        pc = set(probes[probes.q == q].cent_id)
        cand = ranked[ranked.query_id == q].vec_id
        assert all(cell[v] in pc for v in cand), f"unpruned candidate, query {q}"

    # (b) residual Lloyd distortion monotone, training genuinely moves
    _, dists = _pq_lloyd_train(
        spark, SF0001, vecs=_ivfpq_resid_vecs(spark, SF0001).select("vec_id", "embedding")
    )
    assert all(dists[i + 1] <= dists[i] for i in range(len(dists) - 1)), dists
    assert dists[-1] < 0.9 * dists[0], dists

    # (c) shortlist floors vs in-probe exact top-10
    emb = load_table(spark, SF0001, "embeddings").select("vec_id", "embedding").toPandas()
    M = np.stack([np.asarray(v, dtype=float) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    stats = {k: [] for k in (10, 50, 100)}
    for q in range(5):
        qi = np.where(ids == q)[0][0]
        d2 = ((M - M[qi]) ** 2).sum(axis=1)
        pc = set(probes[probes.q == q].cent_id)
        mask = np.array([cell[v] in pc and v != q for v in ids])
        d2p = np.where(mask, d2, np.inf)
        target = set(ids[np.lexsort((ids, d2p))[: min(10, int(mask.sum()))]])
        rq = ranked[ranked.query_id == q].sort_values("rn")
        for k in stats:
            stats[k].append(len(target & set(rq.head(k).vec_id)) / len(target))
    means = {k: sum(v) / len(v) for k, v in stats.items()}
    assert means[10] <= means[50] + 1e-9 and means[50] <= means[100] + 1e-9, means
    assert means[100] >= 0.5, means
    assert min(stats[100]) >= 0.3, stats[100]
    assert means[50] >= 0.4, means


def test_ivm_counting_merge_drops_zero_groups(spark):
    """The counting merge on handcrafted view states: a group whose
    support reaches exactly zero LEAVES the view (naive SUM
    maintenance keeps a ghost row), a partially-reduced group keeps
    correct sums, and a delta-only group enters."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        _ivm_counting_merge,
    )

    base = spark.createDataFrame(
        [(1, "A", 2, 100), (1, "B", 3, 300), (2, "A", 1, 50)],
        "ym int, ret_flag string, n long, cents long",
    )
    delta = spark.createDataFrame(
        [(1, "A", -2, -100), (1, "B", -1, -120), (3, "C", 4, 400)],
        "ym int, ret_flag string, n long, cents long",
    )
    out = {
        (r.ym, r.ret_flag): (r.n, r.cents)
        for r in _ivm_counting_merge(
            [base, delta], keys=["ym", "ret_flag"], count_col="n"
        ).collect()
    }
    assert (1, "A") not in out, out  # full delete -> group leaves
    assert out[(1, "B")] == (2, 180)
    assert out[(2, "A")] == (1, 50)
    assert out[(3, "C")] == (4, 400)  # delta-only group enters


def test_ivm_antijoin_flips_both_ways(spark):
    """The negation view's non-monotonic flips on the real fixture:
    deleting urgent orders ADDS customers to the view, inserting
    urgent orders REMOVES them (sf0.001: 24 members pre-batch, 23
    post — both directions flip).  Membership equals the direct
    recount of surviving urgent support."""
    from pyspark.sql import functions as F

    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        q_ivm_antijoin,
    )
    from kafka_connect_postgres_to_clickhouse_spark.sources.tables import load_table

    o = load_table(spark, SF0001, "orders").toPandas()
    urgent = o[o.o_orderpriority == "1-URGENT"]
    custs = set(load_table(spark, SF0001, "customer").toPandas().c_custkey)
    pre = custs - set(urgent[urgent.o_orderkey % 10 != 7].o_custkey)
    post_expect = custs - set(urgent[urgent.o_orderkey % 10 != 3].o_custkey)
    post = set(q_ivm_antijoin(spark, SF0001).toPandas().c_custkey)
    assert post == post_expect
    assert post - pre, "no customer entered via deletes"
    assert pre - post, "no customer left via inserts"
    assert len(pre) == 24 and len(post) == 23, (len(pre), len(post))


def test_ivm_join_matches_bruteforce(spark):
    """q_ivm_join (incremental path) equals a brute-force in-Spark
    recompute of the view over the NEW base state — the in-engine
    twin of the DuckDB oracle proof."""
    from pyspark.sql import functions as F

    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        _ivm_grain,
        q_ivm_join,
    )
    from kafka_connect_postgres_to_clickhouse_spark.sources.tables import load_table

    o = load_table(spark, SF0001, "orders").filter("o_orderkey % 10 <> 3")
    li = load_table(spark, SF0001, "lineitem").filter(
        "l_orderkey % 10 <> 3 AND NOT (l_orderkey % 10 = 5 AND l_linenumber = 2)"
    )
    brute = {
        (r.ym, r.ret_flag): (r.n, r.cents)
        for r in _ivm_grain(
            o.join(li, F.col("l_orderkey") == F.col("o_orderkey")), F.lit(1)
        )
        .groupBy("ym", "ret_flag")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        .collect()
    }
    got = {
        (r.ym, r.ret_flag): (r.n_lines, int(round(r.revenue * 100)))
        for r in q_ivm_join(spark, SF0001).collect()
    }
    assert got == brute


def test_bq_recall_and_rerank_exactness(spark):
    """q_simsearch_bq at sf0.001: (a) returned d2_scaled equals the
    exact scaled-integer L2 recomputed in numpy (the rerank stage is
    EXACT — only the shortlist is approximate); (b) recall@10 vs the
    exact top-10 (measured mean 0.62, min 0.4 — sign bits + exact
    rerank beat the PQ code paths) pinned at mean >= 0.5, per-query
    >= 0.3."""
    import numpy as np

    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        q_simsearch_bq,
    )
    from kafka_connect_postgres_to_clickhouse_spark.sources.tables import load_table

    res = q_simsearch_bq(spark, SF0001).toPandas()
    emb = load_table(spark, SF0001, "embeddings").select("vec_id", "embedding").toPandas()
    M = np.stack([np.asarray(v, dtype=float) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    idx = {v: i for i, v in enumerate(ids)}

    def d2_scaled(a: int, b: int) -> int:
        d = M[idx[a]] - M[idx[b]]
        prods = d * d * 1e9
        return int(np.where(prods >= 0, np.floor(prods + 0.5), np.ceil(prods - 0.5)).astype(np.int64).sum())

    recs = []
    for q in range(5):
        rq = res[res.query_id == q]
        for r in rq.itertuples():
            assert r.d2_scaled == d2_scaled(q, r.vec_id), (q, r.vec_id)
        d2 = ((M - M[idx[q]]) ** 2).sum(axis=1)
        d2[idx[q]] = np.inf
        exact = set(ids[np.lexsort((ids, d2))[:10]])
        recs.append(len(exact & set(rq.vec_id)) / 10)
    assert sum(recs) / len(recs) >= 0.5, recs
    assert min(recs) >= 0.3, recs


def test_label_prop_refines_components(spark):
    """Synchronous LPA labels can only flow along edges, so every LPA
    community lies INSIDE one connected component of the pair graph
    (the partition refines q_dedup_clusters'), and the community
    count is >= the component count; dense planted dup groups
    (cliques) still collapse to a single community."""
    import pandas as pd

    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (
        q_dedup_clusters,
    )
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        q_label_prop,
    )

    lpa = q_label_prop(spark, SF0001).toPandas()
    cc = q_dedup_clusters(spark, SF0001).toPandas()[["doc_id", "cluster_id"]]
    j = lpa.merge(cc, on="doc_id")
    assert len(j) == len(lpa)  # same node set: the pair-graph docs
    per_comm = j.groupby("community")["cluster_id"].nunique()
    assert (per_comm == 1).all(), per_comm[per_comm > 1]
    assert lpa.community.nunique() >= cc.cluster_id.nunique()
    # at least one multi-member community exists (planted dup groups)
    sizes = lpa.groupby("community").size()
    assert (sizes > 1).any()


def test_linkage_em_learns_separation(spark):
    """Fellegi-Sunter EM on the blocked corpus pairs at sf0.001: the
    learned model must (a) separate m from u on every field
    (m_j > u_j — agreement is likelier under match), (b) put the
    all-agree pattern (1,1,1) — all 504 exact twins — in the LINK
    zone and the truncated-twin pattern (1,1,0) in the CLERICAL
    (possible) zone: last-token disagreement is strong
    counter-evidence under the learned m3, the exact case the
    Fellegi-Sunter three-zone decision rule exists for, (c) put the
    low-evidence patterns ((0,0,0), (0,1,0), (1,0,0)) in non-link,
    (d) give monotone posteriors along each single-field axis from
    (0,0,0)."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        _linkage_pattern_table,
        _lk_em,
        q_linkage_em,
    )

    rows = sorted(
        _linkage_pattern_table(spark, SF0001).collect(),
        key=lambda r: (r.g1, r.g2, r.g3),
    )
    scored, params = _lk_em([((r.g1, r.g2, r.g3), int(r.n)) for r in rows])
    for j in range(3):
        assert params["m9"][j] > params["u9"][j], params
    res = {
        (r.g1, r.g2, r.g3): (r.n_pairs, r.w_scaled, r.zone)
        for r in q_linkage_em(spark, SF0001).collect()
    }
    assert res[(1, 1, 1)][2] == "link", res
    assert res[(1, 1, 0)][2] == "possible", res
    for g in ((0, 0, 0), (0, 1, 0), (1, 0, 0)):
        assert res[g][2] == "non_link", (g, res)
    assert res[(1, 1, 1)][0] == 504
    # posterior grows as any single field flips 0 -> 1
    for flip in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
        if flip in res:
            assert res[flip][1] > res[(0, 0, 0)][1], (flip, res)
