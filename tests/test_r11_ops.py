"""Round-11 operator invariants.

- q_bpe_apply's OOV fallback: tokenization must be TOTAL — words
  absent from the trained vocabulary fall back to greedy char-level
  merge replay.  Exercised for real by planting a vocabulary trained
  on corpus A into the materialization memo under corpus B's key (the
  production shape: a stale tokenizer applied to fresh documents) and
  comparing every doc against a pure-Python greedy BPE reference.
  The same comparison pins fallback == vocab-cache on trained words
  (both are the identical merge surgery).
"""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.01"


def _q(name):
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )

    return load_all_queries()[name].fn


def _write_docs(path, texts):
    path.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": "en",
            "source": "r11",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(path / "documents.parquet", index=False)


def test_graph_ann_filtered_recall_and_traversal(spark):
    """q_graph_ann_filtered pins: (a) predicate safety — every hit
    shares its query's label, ranks dense 1..4; (b) recall floor vs
    brute-force label-constrained truth (deterministic fixture:
    per-query >= 0.25, mean >= 0.5 at ~10% selectivity); (c) the
    traverse-through rationale — for EVERY query it returns strictly
    more label-matching hits than post-filtering the unfiltered beam's
    top-8 does (the naive alternative the operator exists to beat)."""
    import numpy as np

    from kafka_connect_postgres_to_clickhouse_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", "label", "embedding"
    ).toPandas()
    E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    labels = dict(zip(emb["vec_id"], emb["label"]))
    nrm = np.sqrt((E * E).sum(axis=1))

    rows = _q("q_graph_ann_filtered")(spark, SF).collect()
    assert rows
    got: dict = {}
    for r in rows:
        # (a) predicate safety
        assert labels[r["vec_id"]] == labels[r["query_id"]]
        got.setdefault(r["query_id"], []).append((r["rnk"], r["vec_id"]))
    recalls = []
    for q, hits in got.items():
        assert sorted(rk for rk, _ in hits) == [1, 2, 3, 4], (q, hits)
        qi = int(np.where(ids == q)[0][0])
        cs = E @ E[qi] / (nrm * nrm[qi])
        mask = np.array([labels[v] == labels[q] and v != q for v in ids])
        order = np.lexsort((ids, -cs))
        truth = set([ids[i] for i in order if mask[i]][:4])
        r4 = len({v for _, v in hits} & truth) / 4
        assert r4 >= 0.25, (q, r4)
        recalls.append(r4)
    assert sum(recalls) / len(recalls) >= 0.5, recalls

    # (c) strictly beats post-filtering the unfiltered top-8
    post = {q: 0 for q in got}
    for r in _q("q_simsearch_graph")(spark, SF).collect():
        if labels[r["vec_id"]] == labels[r["query_id"]]:
            post[r["query_id"]] += 1
    for q, hits in got.items():
        assert len(hits) > post[q], (q, len(hits), post[q])


def test_ann_rebuild_advisor_accounting(spark):
    """q_ann_rebuild_advisor invariants, cross-checked against the
    insert key it audits: one report row; n_inserted equals
    q_graph_ann_insert's batch row count and n_cells its distinct
    target cells; populations reconcile (after = before + inserted,
    via the skew denominators); drift is exactly before - after; the
    decision column is a pure function of the published metrics and
    the documented policy constants."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (  # noqa: E501
        ANN_REBUILD_DRIFT_MICRO,
        ANN_REBUILD_SKEW_DELTA_BP,
    )

    rows = _q("q_ann_rebuild_advisor")(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    ins = _q("q_graph_ann_insert")(spark, SF).collect()
    assert r["n_inserted"] == len(ins)
    assert r["n_cells"] == len({x["cent_id"] for x in ins})
    assert r["max_cell_after"] >= r["max_cell_before"]
    assert r["drift_micro"] == r["mean_cs_before_micro"] - r["mean_cs_after_micro"]
    assert -1_000_000 <= r["mean_cs_after_micro"] <= 1_000_000
    assert r["skew_bp_before"] >= 10_000 and r["skew_bp_after"] >= 10_000
    assert r["rebuild"] == (
        r["drift_micro"] > ANN_REBUILD_DRIFT_MICRO
        or r["skew_bp_after"] - r["skew_bp_before"] > ANN_REBUILD_SKEW_DELTA_BP
    )


def test_bpe_apply_oov_fallback(spark, tmp_path):
    """Train on corpus A, apply to corpus B ⊃ A with planted unseen
    words.  The old inner join silently dropped them from the token
    counts; the r11 left-join + char-level merge-replay fallback must
    tokenize every word, matching the pure-Python greedy BPE reference
    doc for doc (which simultaneously proves cache == replay for the
    trained words)."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.analytics_queries import (  # noqa: E501
        _MATERIALIZED,
    )
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (  # noqa: E501
        _bpe_train_run,
    )

    train_texts = [
        "the cat sat on the mat",
        "the hat and the rat sat",
        "that cat that sat there",
        "chat with the cat at the mat",
    ]
    oov_doc = "zzgreat unseenword qcatq"
    a_dir, b_dir = tmp_path / "train", tmp_path / "apply"
    _write_docs(a_dir, train_texts)
    _write_docs(b_dir, train_texts + [oov_doc])

    out, vocab = _bpe_train_run(spark, str(a_dir))
    merges = [(r[1], r[2]) for r in out]
    assert len(merges) == 5
    vocab_words = {r["word"] for r in vocab.select("word").collect()}
    assert all(w not in vocab_words for w in oov_doc.split(" "))

    app = spark.sparkContext.applicationId
    mdf = spark.createDataFrame(
        out, "step long, sym_a string, sym_b string, merged string, pair_count long"
    )
    keys = [(app, str(b_dir), "bpe_merges"), (app, str(b_dir), "bpe_vocab")]
    _MATERIALIZED[keys[0]], _MATERIALIZED[keys[1]] = mdf, vocab
    try:
        rows = _q("q_bpe_apply")(spark, str(b_dir)).collect()
    finally:
        for k in keys:
            _MATERIALIZED.pop(k, None)

    def ref_nt(word: str) -> int:
        syms = list(word)
        for a, b in merges:
            nxt, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            syms = nxt
        return len(syms)

    got = {
        r["doc_id"]: (r["n_words"], r["n_subtokens"], r["fertility_micro"])
        for r in rows
    }
    for doc_id, text in enumerate(train_texts + [oov_doc], 1):
        ws = text.split(" ")
        nts = sum(ref_nt(w) for w in ws)
        assert got[doc_id] == (
            len(ws),
            nts,
            (1_000_000 * nts) // len(ws),
        ), (doc_id, got[doc_id])
    # the OOV doc's subword count exceeds its word count (multi-char
    # unseen words really were segmented, not dropped or counted as 1)
    n_oov = len(oov_doc.split(" "))
    assert got[len(train_texts) + 1][1] > n_oov


def test_flac_codec_contract():
    """FLAC codec pins beyond the oracle's decode(encode(x)) == x:
    subframe selection (constant / fixed / LPC / verbatim), real
    compression on predictable signals, hostile-stream raises (marker,
    truncation, CRC-16, MD5-bearing corruption, multichannel seam),
    and — via a hand-built frame — the decoder's Rice partition and
    escape paths the subset encoder never emits."""
    import numpy as np
    import pytest

    from kafka_connect_postgres_to_clickhouse_spark.streaming import (
        multimodal as mm,
    )

    # fixture-family round trip
    k = np.arange(1, 65, dtype=np.int64)
    x = (7 * 131 + k * 2477) % 16001 - 8000
    p = mm.encode_flac(x)
    assert (mm.decode_flac(p) == x).all()

    # constant
    const = np.full(64, -123)
    pc = mm.encode_flac(const)
    assert mm._flac_best_subframe([-123] * 64)[0] == "constant"
    assert (mm.decode_flac(pc) == const).all()
    assert len(pc) < 60  # 64 samples in a handful of bytes

    # incompressible -> verbatim, still exact
    rng = np.random.RandomState(3)
    noisy = rng.randint(-30000, 30000, 64)
    assert mm._flac_best_subframe([int(v) for v in noisy])[0] == "verbatim"
    assert (mm.decode_flac(mm.encode_flac(noisy)) == noisy).all()

    # near-unit-circle AR(2) resonator: the optimum predictor is
    # non-integer, so quantized LPC must beat every fixed order
    r, th = 0.999, 0.2
    a, b = 2 * r * np.cos(th), -r * r
    ar = [8000, int(8000 * np.cos(th))]
    for _ in range(254):
        ar.append(int(round(a * ar[-1] + b * ar[-2])))
    assert max(abs(v) for v in ar) < 32768
    assert mm._flac_best_subframe(ar)[0] == "lpc"
    par = mm.encode_flac(np.array(ar))
    assert (mm.decode_flac(par) == np.array(ar)).all()
    assert len(par) < 2 * len(ar) // 2  # < half the raw PCM size

    # smooth ramp compresses well below raw PCM
    ramp = np.array([(5 + i * 7) % 1501 - 750 for i in range(256)])
    pr = mm.encode_flac(ramp)
    assert (mm.decode_flac(pr) == ramp).all()
    assert len(pr) < 512 // 2

    # hostile streams
    with pytest.raises(ValueError, match="marker"):
        mm.decode_flac(b"fLaX" + p[4:])
    with pytest.raises(ValueError):
        mm.decode_flac(p[:-3])  # truncated frame
    bad = bytearray(p)
    bad[-1] ^= 0xFF  # CRC-16 field
    with pytest.raises(ValueError, match="CRC-16"):
        mm.decode_flac(bytes(bad))
    bad = bytearray(p)
    bad[-6] ^= 0x10  # residual bits -> CRC-16 catches before MD5
    with pytest.raises(ValueError):
        mm.decode_flac(bytes(bad))
    bad = bytearray(p)
    bad[8 + 12] |= 0b010  # STREAMINFO channels-1 -> stereo
    with pytest.raises(NotImplementedError, match="channels"):
        mm.decode_flac(bytes(bad))
    hdr_off = 4 + 4 + 34
    bad = bytearray(p)
    bad[hdr_off] ^= 0x01  # break the 14-bit sync code
    with pytest.raises(ValueError, match="sync"):
        mm.decode_flac(bytes(bad))

    # decoder-only surface: hand-built frame with Rice partition order
    # 1 and an ESCAPE second partition (the subset encoder emits
    # neither); streaminfo/MD5 reused from a real encode of the same
    # samples so only the frame differs
    xs = [10, -3, 5, 0, 700, -800, 900, -1000]
    base = mm.encode_flac(np.array(xs))
    prefix = base[: 4 + 4 + 34]  # marker + block header + STREAMINFO
    h = mm._FlacBitWriter()
    h.write(0x3FFE, 14)
    h.write(0, 2)
    h.write(0b0110, 4)  # 8-bit block size follows
    h.write(0b0100, 4)  # 8 kHz
    h.write(0, 4)  # mono
    h.write(0b100, 3)  # 16-bit
    h.write(0, 1)
    header = h.data() + mm._flac_utf8_encode(0) + bytes([len(xs) - 1])
    header += bytes([mm._crc8_flac(header)])
    sf = mm._FlacBitWriter()
    sf.write(0, 1)
    sf.write(0b001000, 6)  # fixed order 0: residuals = samples
    sf.write(0, 1)
    sf.write(0b00, 2)  # 4-bit Rice params
    sf.write(1, 4)  # partition order 1 -> two partitions of 4
    sf.write(3, 4)  # partition 0: rice k=3
    for e in xs[:4]:
        m = (e << 1) ^ (e >> 63)
        sf.write_unary(m >> 3)
        sf.write(m & 7, 3)
    sf.write(15, 4)  # partition 1: escape
    sf.write(11, 5)  # raw 11-bit signed residuals
    for e in xs[4:]:
        sf.write(e & 0x7FF, 11)
    sf.align()
    frame = header + sf.data()
    frame += mm._crc16_flac(frame).to_bytes(2, "big")
    assert (mm.decode_flac(prefix + frame) == np.array(xs)).all()
