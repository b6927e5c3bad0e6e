"""Round-12 operator tests.

Covers the ADVICE-r11 FLAC edges first (spec-valid STREAMINFO block
sizes, explicit wasted-bits diagnostic, 65536-sample rejection); the
r12 operator keys (PQ ADC search, perceptual-hash image near-dup,
graph-ANN compaction, MPEG-1 Layer II decode) pin their invariants in
the sections below as they land.
"""

from __future__ import annotations


def test_flac_streaminfo_block_size_spec_valid():
    """ADVICE r11: STREAMINFO min/max block size must land in the
    spec-valid [16, 65535] range even for short single-frame streams
    (a final block smaller than the declared minimum is legal), and
    65536 samples — frame-encodable but not STREAMINFO-expressible —
    must be rejected up front."""
    import numpy as np
    import pytest

    from kafka_connect_postgres_to_clickhouse_spark.streaming import (
        multimodal as mm,
    )

    xs = np.array([10, -3, 5, 0, 700, -800, 900, -1000])  # n=8 < 16
    p = mm.encode_flac(xs)
    si = p[8 : 8 + 34]  # marker(4) + block header(4) + STREAMINFO(34)
    assert int.from_bytes(si[0:2], "big") == 16  # min block clamped up
    assert int.from_bytes(si[2:4], "big") == 16  # max block clamped up
    assert (mm.decode_flac(p) == xs).all()  # round-trip unaffected

    n300 = np.arange(300) % 100 - 50  # 16 <= n <= 65535: written as-is
    p300 = mm.encode_flac(n300)
    si = p300[8 : 8 + 34]
    assert int.from_bytes(si[0:2], "big") == 300
    assert int.from_bytes(si[2:4], "big") == 300
    assert (mm.decode_flac(p300) == n300).all()

    with pytest.raises(ValueError, match="block size out of range"):
        mm.encode_flac(np.zeros(65536, dtype=np.int64))


def test_flac_wasted_bits_exceeding_width_is_diagnosed():
    """ADVICE r11: a hostile stream claiming >= 16 wasted bits must
    raise the deliberate diagnostic, not an incidental negative-shift
    ValueError from read_signed."""
    import numpy as np
    import pytest

    from kafka_connect_postgres_to_clickhouse_spark.streaming import (
        multimodal as mm,
    )

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
    sf.write(0, 1)  # padding bit
    sf.write(0, 6)  # constant subframe
    sf.write(1, 1)  # wasted-bits flag
    sf.write(1, 16)  # unary 15 -> wasted = 16 == sample width
    sf.write(0, 16)  # would-be constant value (never reached)
    sf.align()
    frame = header + sf.data()
    frame += mm._crc16_flac(frame).to_bytes(2, "big")
    with pytest.raises(ValueError, match="wasted bits exceed"):
        mm.decode_flac(prefix + frame)


def test_pq_adc_recall_floor(spark):
    """q_simsearch_pq recall floors vs the exact-L2 baseline at
    sf0.001 (r12 untrained books: recall@10 mean 0.26, shortlist@50
    0.54, shortlist@100 0.70; r13 Lloyd-trained k=8 books: 0.22 /
    0.70 / 0.90 — random baseline is 10/499 ≈ 0.02).  Pins (a) top-10
    recall ≥ 0.2 mean, (b) the production shortlist property at the
    RAISED r13 floors (ADC top-100 holds ≥ 80% of the exact top-10
    mean, ≥ 70% per query), and (c) shortlist recall is monotone
    non-decreasing in K."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        _pq_adc_scores,
    )
    from kafka_connect_postgres_to_clickhouse_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist_scaled"), F.asc("vec_id")
    )
    ranked = (
        _pq_adc_scores(spark, sf)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .toPandas()
    )
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding").toPandas()
    M = np.array([np.array(v, dtype=float) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()

    def exact_top10(q: int) -> set:
        qi = np.where(ids == q)[0][0]
        d2 = ((M - M[qi]) ** 2).sum(axis=1)
        d2[qi] = np.inf
        return set(ids[np.lexsort((ids, d2))[:10]])

    recalls = {k: [] for k in (10, 50, 100)}
    for q in range(5):
        exact = exact_top10(q)
        rq = ranked[ranked.query_id == q].sort_values("rn")
        for k in recalls:
            got = set(rq.head(k).vec_id)
            recalls[k].append(len(exact & got) / 10)
    means = {k: sum(v) / len(v) for k, v in recalls.items()}
    mins = {k: min(v) for k, v in recalls.items()}
    # r13 floors (Lloyd-trained k=8 books, _pq_lloyd_train): measured
    # mean 0.22/0.70/0.90 min 0.10/0.50/0.80 — the shortlist property
    # jumped from the r12 untrained 0.54/0.70 means; the r12 floors
    # (0.2/0.55) stay as the regression line for recall@10.
    assert means[10] >= 0.2, means
    assert means[50] >= 0.6, means
    assert means[100] >= 0.8, means
    assert mins[50] >= 0.4, mins
    assert mins[100] >= 0.7, mins
    assert means[10] <= means[50] <= means[100], means


def test_phash_invariance_and_separation():
    """The q_phash_neardup fixture contract, over EVERY group (97
    fixed patterns — corpus-size-independent, so this single check
    covers all SFs): the four byte-diverse variants (BMP, PNG
    re-encode, 2x-resized PNG, brightness-shifted BMP) of a group
    share ONE pHash, and the 97 group hashes are pairwise separated
    by far more than the hd<=3 join threshold (measured min 18)."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        PHASH_GROUPS,
        PHASH_HD_MAX,
        _phash_payload,
    )
    from kafka_connect_postgres_to_clickhouse_spark.streaming.multimodal import (
        decode_bmp,
        decode_png,
        phash64,
    )

    def ph(did: int) -> int:
        p = _phash_payload(did)
        return phash64(decode_bmp(p) if p[:2] == b"BM" else decode_png(p))

    hashes = []
    for g in range(PHASH_GROUPS):
        variants = {ph(g + v * PHASH_GROUPS) for v in range(4)}
        assert len(variants) == 1, f"group {g} variants diverge: {variants}"
        hashes.append(variants.pop())
    assert len(set(hashes)) == PHASH_GROUPS
    min_hd = min(
        bin(hashes[i] ^ hashes[j]).count("1")
        for i in range(len(hashes))
        for j in range(i + 1, len(hashes))
    )
    assert min_hd > 2 * PHASH_HD_MAX, min_hd  # wide margin over threshold


def test_phash_brightness_moves_only_dc():
    """Direct pin of the invariance argument: a uniform brightness
    shift changes the decoded pixels but not one pHash bit, while a
    LOCAL edit (one tile flipped) does move the hash — pHash is
    brightness-blind, not content-blind."""
    import numpy as np

    from kafka_connect_postgres_to_clickhouse_spark.streaming.multimodal import (
        phash64,
    )

    rng = np.random.RandomState(7)
    tile = rng.choice([60, 200], size=(8, 8)).astype(np.uint8)
    img = np.repeat(np.repeat(tile, 4, 0), 4, 1)
    rgb = np.stack([img] * 3, axis=2)
    assert phash64(rgb + 5) == phash64(rgb)
    edited = tile.copy()
    edited[3, 4] = 60 if edited[3, 4] == 200 else 200
    img2 = np.repeat(np.repeat(edited, 4, 0), 4, 1)
    rgb2 = np.stack([img2] * 3, axis=2)
    assert phash64(rgb2) != phash64(rgb)


def test_graph_ann_compact_resets_drift(spark):
    """VERDICT r11 #6 done-criterion: compaction brings every
    compacted cell's residual drift back UNDER the advisor's rebuild
    threshold, the split genuinely separates the cell (both sub-cells
    populated, each strictly smaller than the spliced cell), its
    edges are rebuilt, and cells under both policy triggers keep
    their spliced rows verbatim."""
    from kafka_connect_postgres_to_clickhouse_spark.operators.extended_queries import (
        ANN_REBUILD_DRIFT_MICRO,
        ANN_REBUILD_SKEW_DELTA_BP,
    )
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )

    reg = load_all_queries()
    rows = reg["q_graph_ann_compact"].fn(spark, "/root/testdata/sf0.001").toPandas()
    assert len(rows) > 1
    comp = rows[rows.compacted]
    kept = rows[~rows.compacted]
    assert len(comp) >= 1  # the flood cell trips a trigger
    assert len(kept) >= 1  # the benign family stays under both
    for r in comp.itertuples():
        # the advisor's metrics, recomputed post-compaction
        mean_b = r.mean_cs_spliced_micro + r.drift_micro_cell
        residual_drift = mean_b - r.mean_cs_compacted_micro
        assert residual_drift <= ANN_REBUILD_DRIFT_MICRO, r
        # the split separates: both sub-cells populated and strictly
        # smaller than the spliced cell
        total = r.pop_stay + r.pop_moved
        assert r.pop_moved >= 1 and r.pop_stay >= 1
        assert max(r.pop_stay, r.pop_moved) < total
        assert r.split_vec_id >= 3_000_000  # seeded from the insert batch
        assert r.edges_rebuilt > 0
        # compaction can only improve the mean (per-member max)
        assert r.mean_cs_compacted_micro >= r.mean_cs_spliced_micro
    for r in kept.itertuples():
        assert r.drift_micro_cell <= ANN_REBUILD_DRIFT_MICRO
        assert r.skew_delta_bp <= ANN_REBUILD_SKEW_DELTA_BP
        assert r.split_vec_id == -1
        assert r.edges_rebuilt == 0 and r.pop_moved == 0
        assert r.pop_stay == r.pop_before + r.n_inserted
        assert r.mean_cs_compacted_micro == r.mean_cs_spliced_micro


def test_mp2_round_trip_and_hostile_streams():
    """Layer II codec surface: exact round-trip through every scfsi
    pattern and both grouped/plain code paths; every subset boundary
    raises NotImplementedError (the declared codec seam) and every
    malformed field raises ValueError."""
    import numpy as np
    import pytest

    from kafka_connect_postgres_to_clickhouse_spark.streaming import (
        multimodal as mm,
    )

    d = 5
    alloc = [((d + sb) % 5) + 1 for sb in range(12)]
    scfsi = [(d + sb) % 4 for sb in range(12)]
    sft = [[3 * ((d + sb + 2 * j) % 10) for j in range(3)] for sb in range(12)]
    codes = [
        [
            [(d * 7 + sb * 13 + gr * 5 + k * 3) % mm.MP2_CLASSES[alloc[sb]]
             for k in range(3)]
            for gr in range(12)
        ]
        for sb in range(12)
    ]
    p = mm.encode_mp2(alloc, scfsi, sft, codes)
    assert len(p) == mm.MP2_FRAME_BYTES
    m = mm.decode_mp2(p)
    assert m.shape == (36, 12)
    for sb in range(12):  # closed-form equality at every position
        n = mm.MP2_CLASSES[alloc[sb]]
        eff = mm._mp2_effective_sf(scfsi[sb], sft[sb])
        for gr in range(12):
            for k in range(3):
                c = codes[sb][gr][k]
                want = (2 * c - n + 1) / n * 2.0 * 2.0 ** (-eff[gr // 4] / 3.0)
                assert m[gr * 3 + k, sb] == want

    def hdr(b1=0xFD, b2=0x48, b3=0xC0):
        return bytes([0xFF, b1, b2, b3]) + p[4:]

    with pytest.raises(ValueError, match="sync"):
        mm.decode_mp2(b"\x00" + p[1:])
    with pytest.raises(NotImplementedError, match="Layer I"):
        mm.decode_mp2(hdr(b1=0xFF))
    with pytest.raises(NotImplementedError, match="Huffman"):
        mm.decode_mp2(hdr(b1=0xFB))  # Layer III -> the MP3 seam
    with pytest.raises(ValueError, match="reserved layer"):
        mm.decode_mp2(hdr(b1=0xF9))
    with pytest.raises(NotImplementedError, match="LSF"):
        mm.decode_mp2(hdr(b1=0xF5))
    with pytest.raises(NotImplementedError, match="free-format"):
        mm.decode_mp2(hdr(b2=0x08))
    with pytest.raises(ValueError, match="forbidden bitrate"):
        mm.decode_mp2(hdr(b2=0xF8))
    with pytest.raises(ValueError, match="sampling-frequency"):
        mm.decode_mp2(hdr(b2=0x4C))
    with pytest.raises(NotImplementedError, match="32 kHz"):
        mm.decode_mp2(hdr(b2=0x40))
    with pytest.raises(NotImplementedError, match="mono"):
        mm.decode_mp2(hdr(b3=0x00))
    bad = bytearray(p)
    bad[4] |= 0xF0  # first allocation nibble -> reserved 15
    with pytest.raises(ValueError, match="allocation"):
        mm.decode_mp2(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_mp2(p[:100])
    with pytest.raises(NotImplementedError, match="synthesis window"):
        mm.synthesize_mp2(m)

    # hand-built minimal frames: reserved scale factor / overflowing codes
    def minimal(alloc0, sf0, code_bits, code_vals):
        w = mm._FlacBitWriter()
        for sb in range(12):
            w.write(alloc0 if sb == 0 else 0, 4)
        w.write(2, 2)  # scfsi 2: one scale factor
        w.write(sf0, 6)
        for _ in range(12):
            for v in code_vals:
                w.write(v, code_bits)
        w.align()
        body = b"\xff\xfd\x48\xc0" + w.data()
        return body + b"\x00" * (mm.MP2_FRAME_BYTES - len(body))

    with pytest.raises(ValueError, match="scale factor index 63"):
        mm.decode_mp2(minimal(1, 63, 5, [0]))
    # ADVICE r12: over-allocated frame (all-14 needs ~742 bytes of
    # sample data vs the fixed 288-byte frame) must fail the explicit
    # MP2 bit-budget check, not the shared reader's FLAC-family
    # exhaustion message.
    w14 = mm._FlacBitWriter()
    for _ in range(12):
        w14.write(14, 4)  # alloc 14 -> 8191 levels, 13 bits/sample
    for _ in range(12):
        w14.write(2, 2)  # scfsi 2: one scale factor each
    for _ in range(12):
        w14.write(0, 6)
    w14.align()
    body14 = b"\xff\xfd\x48\xc0" + w14.data()
    over = body14 + b"\x00" * (mm.MP2_FRAME_BYTES - len(body14))
    with pytest.raises(ValueError, match="MP2 frame truncated: declared"):
        mm.decode_mp2(over)
    with pytest.raises(ValueError, match="n\\^3"):
        mm.decode_mp2(minimal(1, 0, 5, [27]))  # 3 levels: grouped max 26
    with pytest.raises(ValueError, match="exceeds quantizer"):
        mm.decode_mp2(minimal(3, 0, 3, [7, 0, 0]))  # 7 levels, code 7

    # encoder guards
    with pytest.raises(ValueError, match="allocation index"):
        mm.encode_mp2([15] + [0] * 11, scfsi, sft, codes)
    with pytest.raises(ValueError, match="scale factor index"):
        bad_sft = [[63, 0, 0]] + sft[1:]
        mm.encode_mp2(alloc, scfsi, bad_sft, codes)
