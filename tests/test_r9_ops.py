"""Round-9 operator invariants.

The oracle gate proves value equality vs DuckDB; these pin semantic
invariants equality alone would not catch if both engines drifted
together: Avro varint wire-format conformance against the stdlib-free
reference encoding, ADPCM codec round-trip fidelity + hostile-stream
rejection, graph-ANN recall vs exact search, and trigram-KN fluency
ordering.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _q(name):
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )

    return load_all_queries()[name].fn


# ---------------------------------------------------------------------------
# q_avro_wire


def _ref_avro_long(v: int) -> bytes:
    """Independent reference encoder: Avro zigzag varint (spec text,
    not sharing any arithmetic with the query's SQL expressions)."""
    z = (v << 1) ^ (v >> 63)  # arithmetic shift sign-extends
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_avro_wire_bytes_match_reference_encoder(spark):
    """The query's expression-built wire bytes must equal a from-spec
    Python Avro body encoding of the same record, field by field.

    Epoch micros are computed Spark-side (unix_micros) rather than from
    the collected datetime: non-Arrow collect converts timestamps via
    the driver OS timezone, so interpreting the naive datetime as UTC
    fails spuriously on a non-UTC host."""
    from pyspark.sql import functions as F

    rows = (
        _q("q_avro_wire")(spark, SF)
        .withColumn("_upd_us", F.unix_micros("updated_at"))
        .orderBy("_seq")
        .limit(20)
        .collect()
    )
    assert rows
    for r in rows:
        upd_us = r["_upd_us"]
        uname = r["username"].encode()
        atype = r["account_type"].encode()
        expected = (
            _ref_avro_long(r["user_id"])
            + _ref_avro_long(len(uname))
            + uname
            + _ref_avro_long(len(atype))
            + atype
            + _ref_avro_long(upd_us)
        )
        assert bytes.fromhex(r["wire_hex"]) == expected, r["_seq"]
        assert r["n_bytes"] == len(expected)


def test_avro_varint_negative_arm():
    """The zigzag SQL CASE has a negative arm no fixture row exercises
    (ids and micros are non-negative); pin it against the spec encoder
    so the arm can't rot silently."""
    for v in (-1, -64, -65, -1234567890123):
        z = (v << 1) ^ (v >> 63)
        assert z == (2 * v if v >= 0 else -2 * v - 1)
        assert _ref_avro_long(v)  # well-formed for negatives too


# ---------------------------------------------------------------------------
# q_media_decode_adpcm


def test_adpcm_roundtrip_tracks_waveform():
    """Reconstruction must TRACK the target waveform: once the step
    size adapts (first samples slew-rate-limit from the seed), each
    reconstructed sample stays within one max-step of its target."""
    import numpy as np

    from kafka_connect_postgres_to_clickhouse_spark.streaming.multimodal import (
        decode_adpcm,
        encode_adpcm,
    )

    rng = np.linspace(-6000, 6000, 64).astype(np.int64)
    payload = encode_adpcm(rng, 0, 40)
    dec = decode_adpcm(payload)
    assert len(dec) == 65
    # after adaptation the error is bounded by ~2 steps of the final
    # step size; a broken quantizer diverges by orders of magnitude
    tail_err = np.abs(dec[33:] - rng[32:])
    assert tail_err.max() < 2000, tail_err.max()


def test_adpcm_hostile_streams():
    """Hostile-bitstream contract (the decoder-CVE shapes): truncated
    header and out-of-range step index must raise, not read OOB; a
    truncated BODY decodes the nibbles that exist (stream cut mid-
    transfer is valid ADPCM prefix)."""
    import numpy as np

    from kafka_connect_postgres_to_clickhouse_spark.streaming.multimodal import (
        decode_adpcm,
        encode_adpcm,
    )

    with pytest.raises(ValueError, match="truncated"):
        decode_adpcm(b"\x00\x01")
    with pytest.raises(ValueError, match="out of"):
        decode_adpcm(b"\x00\x00\x59\x00" + b"\x11" * 4)  # idx 89
    with pytest.raises(ValueError, match="out of"):
        encode_adpcm(np.zeros(4, dtype=np.int64), 0, 89)
    with pytest.raises(ValueError, match="int16"):
        encode_adpcm(np.zeros(4, dtype=np.int64), 40000, 0)
    with pytest.raises(ValueError, match="even"):
        encode_adpcm(np.zeros(3, dtype=np.int64), 0, 0)
    full = encode_adpcm(np.arange(8, dtype=np.int64) * 100, 0, 10)
    cut = decode_adpcm(full[:-2])
    assert len(cut) == 5  # header sample + 2 bytes x 2 nibbles
    assert (cut == decode_adpcm(full)[:5]).all()


# ---------------------------------------------------------------------------
# q_simsearch_graph


def test_graph_ann_recall_vs_exact(spark):
    """Recall@4 vs exact brute force, pooled over the 5 fixture
    queries — deterministic (fixed fixtures, fixed tie-breaks), floor
    matches the house LSH/IVF standard (test_analytics.py: >= 0.5)."""
    from collections import defaultdict

    got = defaultdict(set)
    for r in _q("q_simsearch_graph")(spark, SF).collect():
        got[r.query_id].add(r.vec_id)
    exact = defaultdict(list)
    rows = _q("q_simsearch_topk")(spark, SF).collect()
    for r in sorted(rows, key=lambda r: (r.query_id, -r.cos_sim, r.vec_id)):
        exact[r.query_id].append(r.vec_id)
    hits = sum(len(set(ids[:4]) & got[q]) for q, ids in exact.items())
    denom = 4 * len(exact)
    assert denom == 20
    assert hits / denom >= 0.5, f"graph-ANN recall@4 degraded: {hits}/{denom}"


def test_graph_ann_beam_shape(spark):
    """Each query's final beam is exactly 8 nodes ranked 1..8 with
    non-increasing cosine, never containing the query itself (the
    beam-search contract the oracle hash can't state on its own)."""
    from collections import defaultdict

    beams = defaultdict(list)
    for r in _q("q_simsearch_graph")(spark, SF).collect():
        beams[r.query_id].append(r)
        assert r.vec_id != r.query_id
    assert sorted(beams) == [0, 1, 2, 3, 4]
    for q, rs in beams.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, 9))
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)


# ---------------------------------------------------------------------------
# q_kn_trigram


def test_kn_trigram_separates_fluent_from_rotated(spark):
    """The trigram KN model must assign rotated (trigram-structure-
    destroying, token-preserving) text fewer seen trigrams than real
    text — the r8 bigram test shape one order up — and its per-doc
    NLLs must be positive (probabilities < 1)."""
    import pyspark.sql.functions as F

    from kafka_connect_postgres_to_clickhouse_spark.functions.text import (
        shingles,
    )
    from kafka_connect_postgres_to_clickhouse_spark.sources.tables import (
        load_table,
    )

    kn = _q("q_kn_trigram")(spark, SF)
    agg = kn.agg(
        F.min("nll_micro").alias("mn"), F.sum("n_trigrams").alias("n")
    ).collect()[0]
    assert agg["mn"] > 0 and agg["n"] > 0

    d = load_table(spark, SF, "documents")
    rot = d.select(
        F.expr(
            "array_join(concat(slice(split(lower(text), ' '), 2, 1000000),"
            " slice(split(lower(text), ' '), 1, 1)), ' ')"
        ).alias("text")
    )
    seen = (
        d.select(F.explode(shingles(F.col("text"), 3)).alias("tg"))
        .groupBy("tg")
        .count()
    )
    n_real = (
        d.select(F.explode(shingles(F.col("text"), 3)).alias("tg"))
        .join(seen, "tg")
        .count()
    )
    n_rot = (
        rot.select(F.explode(shingles(F.col("text"), 3)).alias("tg"))
        .join(seen, "tg")
        .count()
    )
    assert n_rot < n_real


def test_kn_trigram_sharper_than_bigram(spark):
    """Higher order = more context = lower corpus mean NLL on text
    both models saw (the reason to pay for the extra type table): the
    trigram model's corpus-mean per-gram NLL must beat the bigram
    model's on the same fixture."""
    import pyspark.sql.functions as F

    tri = _q("q_kn_trigram")(spark, SF).agg(
        (F.sum("nll_micro") / F.sum("n_trigrams")).alias("m")
    ).collect()[0]["m"]
    bi = _q("q_kneser_ney_lm")(spark, SF).agg(
        (F.sum("nll_micro") / F.sum("n_bigrams")).alias("m")
    ).collect()[0]["m"]
    assert tri < bi, (tri, bi)


# ---------------------------------------------------------------------------
# SCALE_STRESS_r09: empirical growth exponents for the candidate joins


def _stress():
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(__file__))
    paths = glob.glob(os.path.join(root, "SCALE_STRESS_r*.json"))
    assert paths, "no scale-stress artifact"

    def rnd(p):
        m = re.search(r"r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    newest = max(paths, key=rnd)
    with open(newest) as f:  # newest round's artifact
        return json.load(f), rnd(newest)


STRESS_KEYS = {
    "q_neardup_minhash",
    "q_neardup_jaccard",
    "q_simhash_neardup",
    "q_fuzzy_dedup",
    "q_editdist_neardup",
    "q_semantic_dedup",
    "q_neardup_cascade",
    "q_phash_neardup",  # r12: image near-dup joined the stressed set
}

# keys that joined the stressed set in a given round: an artifact from
# an earlier round is complete WITHOUT them (the generator list grows
# round-over-round; the newest artifact must always cover its round's
# full set)
STRESS_KEYS_JOINED = {
    13: {  # ANN lifecycle (VERDICT r12 #5): measured at 10x, not argued
        "q_simsearch_pq",
        "q_graph_ann_filtered",
        "q_graph_ann_compact",
        # r13 wave 2: new ANN tiers, video/audio near-dup, LPA, EM linkage
        "q_simsearch_ivfpq",
        "q_simsearch_bq",
        "q_video_phash_neardup",
        "q_audio_fp_neardup",
        "q_label_prop",
        "q_linkage_em",
    },
}


def _expected_keys(artifact_round: int) -> set:
    exp = set(STRESS_KEYS)
    for joined_round, keys in STRESS_KEYS_JOINED.items():
        if artifact_round >= joined_round:
            exp |= keys
    return exp


def test_scale_stress_artifact_shape():
    """The artifact must cover all six generators at a true 10x of the
    sf0.1 corpus in BOTH regimes (open = Heaps-faithful, closed =
    adversarial shingle-space saturation)."""
    d, artifact_round = _stress()
    assert set(d["regimes"]) == {"open", "closed"}
    for r in d["regimes"].values():
        assert set(r["per_key"]) == _expected_keys(artifact_round)
        assert r["corpus_sizes"]["10"]["documents"] == 10 * r["corpus_sizes"]["1"]["documents"]
        assert r["corpus_sizes"]["10"]["embeddings"] == 10 * r["corpus_sizes"]["1"]["embeddings"]


def test_scale_stress_open_regime_all_linear():
    """Heaps-faithful 10x: every generator's verified-output rows AND
    wall time must grow ~linearly (exponent 1.0 = linear, 2.0 =
    quadratic; time gets headroom for the documented ~20% ambient
    host noise, which is worth ~0.08 of exponent)."""
    per_key = _stress()[0]["regimes"]["open"]["per_key"]
    for k, v in per_key.items():
        assert v["exp_rows"] <= 1.05, (k, v["exp_rows"])
        assert v["exp_sec"] <= 1.1, (k, v["exp_sec"])


def test_scale_stress_closed_regime_bounds():
    """Adversarial saturation 10x: verified OUTPUTS stay exactly
    linear for every exact join; wall time stays sublinear for the
    sketch/banded joins (minhash, simhash, fuzzy, semantic) and —
    since the r10 saturation guards (df-capped PPJoin with the
    minhash hot route; PassJoin orientation + budget pruning + the
    529-crossover symmetric-delete band) — strictly below LINEAR
    growth for the prefix joins too (r9 shipped them at exp 1.43 /
    1.14; the guards' whole point is exp < 1.0 here)."""
    per_key = _stress()[0]["regimes"]["closed"]["per_key"]
    for k, v in per_key.items():
        if k != "q_neardup_minhash":
            assert v["exp_rows"] <= 1.05, (k, v["exp_rows"])
    # minhash CANDIDATE output follows the LSH S-curve mass (see
    # artifact notes) but the engine must still process it sublinearly
    assert per_key["q_neardup_minhash"]["exp_sec"] <= 0.8
    for k in ("q_simhash_neardup", "q_fuzzy_dedup", "q_semantic_dedup",
              "q_neardup_cascade"):
        assert per_key[k]["exp_sec"] <= 0.8, (k, per_key[k]["exp_sec"])
    for k in ("q_neardup_jaccard", "q_editdist_neardup"):
        assert per_key[k]["exp_sec"] < 1.0, (k, per_key[k]["exp_sec"])


# ---------------------------------------------------------------------------
# q_neardup_cascade


def test_cascade_recall_and_precision_vs_exact(spark):
    """The cascade's verify predicate equals the exact join's, so
    every cascade pair must appear in q_neardup_jaccard (precision
    1.0 by construction — any miss is a bug in candidate plumbing),
    and recall vs the full exact join must clear the LSH S-curve
    floor (P(candidate | J=0.5) = 1-(1-J^2)^4 = 0.68; planted twins
    have much higher J, so the fixture floor is far above it)."""
    cas = {(r.doc_a, r.doc_b) for r in _q("q_neardup_cascade")(spark, SF).collect()}
    full = {(r.doc_a, r.doc_b) for r in _q("q_neardup_jaccard")(spark, SF).collect()}
    assert cas <= full, f"cascade emitted non-exact pairs: {sorted(cas - full)[:5]}"
    assert len(cas) / len(full) >= 0.9, (len(cas), len(full))


# ---------------------------------------------------------------------------
# q_bpe_train


def test_bpe_train_merge_invariants(spark):
    """Classic-BPE invariants: 5 steps; pair counts monotonically
    non-increasing (a new pair created by a merge is bounded by that
    merge's count, and old pairs only lose occurrences); merged token
    is the concatenation; no merge repeats (an (a,b) adjacency can
    never be re-created once fused)."""
    rows = sorted(_q("q_bpe_train")(spark, SF).collect(), key=lambda r: r.step)
    assert [r.step for r in rows] == [1, 2, 3, 4, 5]
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    assert all(r.merged == r.sym_a + r.sym_b for r in rows)
    assert len({(r.sym_a, r.sym_b) for r in rows}) == 5
    assert all(r.pair_count > 0 for r in rows)


# ---------------------------------------------------------------------------
# q_graph_ann_calibration / q_avro_framing


def test_graph_calibration_monotone_in_width(spark):
    """Wider beam => candidate set only grows => recall@4 must be
    monotonically non-decreasing, and the width-8 row must agree with
    the recall the width-8 operator itself achieves."""
    rows = {r.beam_width: r for r in _q("q_graph_ann_calibration")(spark, SF).collect()}
    assert set(rows) == {2, 8}
    assert all(r.n_possible == 20 for r in rows.values())
    assert rows[2].n_hits <= rows[8].n_hits
    assert rows[8].recall_bp >= 5000  # the house ANN floor, in bp
    for r in rows.values():
        assert r.recall_bp == (10000 * r.n_hits) // r.n_possible


def test_avro_framing_matches_reference_layout(spark):
    """Frame bytes must be exactly magic 0x00 + 4-byte BE schema id 7
    + the spec-encoded Avro body (reference encoder, field by field
    against the q_avro_wire body proof)."""
    frames = {
        r["_seq"]: r
        for r in _q("q_avro_framing")(spark, SF).orderBy("_seq").limit(10).collect()
    }
    bodies = {
        r["_seq"]: r["wire_hex"]
        for r in _q("q_avro_wire")(spark, SF).orderBy("_seq").limit(10).collect()
    }
    for seq, r in frames.items():
        raw = bytes.fromhex(r["frame_hex"])
        assert raw[0] == 0
        assert int.from_bytes(raw[1:5], "big") == 7 == r["schema_id"]
        assert r["magic_ok"] is True
        assert raw[5:] == bytes.fromhex(bodies[seq])
        assert r["n_bytes"] == len(raw)
