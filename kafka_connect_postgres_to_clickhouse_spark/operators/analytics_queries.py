"""Registry wave 4: EXT analytics — the training-data-pipeline surface
(driver north star; SURVEY.md section 2.7).

Families: exact + near deduplication (hash / MinHash-LSH / n-gram
Jaccard / SimHash / embedding-cosine), similarity search (brute-force
cosine + LSH-bucketed ANN), text analysis (tokens, quality, lang-id,
BPE-ish token counting, fingerprinting), multimodal column plumbing.

Duplicate-free fixtures can't exercise dedup, so dedup queries run on
an augmented corpus derived deterministically from ``documents``:
every doc re-ingested verbatim (doc_id + 2,000,000 — exact dups) and
every 10th doc with its last token dropped (doc_id + 1,000,000 — near
dups).  The DuckDB oracle builds the identical corpus.

Scale discipline: every dedup/search operator here is a candidate-
generation + verify pipeline (band join / bucket join / inverted
index), never an all-pairs comparison; hashing is engine-neutral MD5
(see functions/text.py) so results hash-match the oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens
from ..functions.vectors import SCALE, cosine, dot_scaled, norm2_scaled
from ..plans.registry import register
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# corpus (documents + exact dups + near dups), Spark and DuckDB twins


_MATERIALIZED: dict = {}

# name -> (spark, sf_dir) -> DataFrame: forces the named _materialize
# spill to exist and returns it.  bench.py runs these first, under
# labeled `_materialize:<name>` lines, so the build cost of a shared
# intermediate is billed once and explicitly instead of landing on
# whichever consumer query happens to run first (round-2/3 benches had
# the jaccard pair-table bill teleport between q_dup_graph_degree and
# q_graph_triangles).  Populated at import time by each operator module
# that owns a spill.
MATERIALIZATION_TRIGGERS: dict = {}


_SPILL_ROOT: str | None = None


def _materialize_root() -> str:
    """Spill directory for materialized intermediates.

    ``SPARK_GRAFT_MATERIALIZE_DIR`` wins when set (on a cluster this is
    the shared-filesystem / object-store temp-table prefix every
    executor can reach; also the knob for hosts whose tmpfiles reaper
    ages /tmp out from under long-lived sessions); the default is a
    PRIVATE per-process ``mkdtemp`` root, removed at interpreter exit.

    mkdtemp on purpose, not a predictable shared path: spills are
    keyed by Spark application id, so nothing is ever reused across
    processes anyway, and a predictable /tmp name is a symlink-plant /
    TOCTOU surface (another local user swaps the directory between the
    ownership check and a later ``spark.read.parquet`` round-trip).
    An unpredictable 0700 root owned by this process closes that
    class entirely and needs no idle-reaper for other sessions'
    leftovers — each process cleans up after itself."""
    import atexit
    import os
    import shutil
    import tempfile

    env = os.environ.get("SPARK_GRAFT_MATERIALIZE_DIR")
    if env:
        return env
    global _SPILL_ROOT
    if _SPILL_ROOT is not None:
        return _SPILL_ROOT
    _SPILL_ROOT = tempfile.mkdtemp(prefix="spark_graft_materialized-")
    atexit.register(shutil.rmtree, _SPILL_ROOT, ignore_errors=True)
    return _SPILL_ROOT


def _materialize(spark, sf_dir: str, name: str, build) -> DataFrame:
    """Session-scoped materialized intermediate as a parquet temp table.

    Several registry operators consume the same heavy intermediates —
    the exploded shingle postings and the verified near-dup pair table
    (q_neardup_jaccard feeds q_dedup_clusters verbatim).  On a cluster
    these live as temp tables on shared storage that every downstream
    job scans instead of recomputing the shingle pipeline per query;
    here the same reuse is a memo keyed by (Spark application, sf_dir,
    name) backed by parquet under spark-warehouse.  The first consumer
    pays build + write; later consumers in the same session scan the
    parquet.

    Parquet (not localCheckpoint) on purpose: checkpoint blocks pin
    the pair/posting tables in executor block-manager memory, an
    executor-RAM ceiling at cluster scale; a parquet spill is bounded
    by disk, survives executor loss, and downstream scans still get
    column pruning + predicate pushdown.  Correctness is unaffected: a
    fresh session rebuilds from scratch, and the key isolates scale
    factors and restarted contexts.
    """
    import os
    import re

    app = spark.sparkContext.applicationId
    root = _materialize_root()
    key = (app, sf_dir, name)
    df = _MATERIALIZED.get(key)
    if df is None:
        os.makedirs(os.path.join(root, app), exist_ok=True)
        sf_tag = re.sub(r"[^A-Za-z0-9_.-]", "_", sf_dir.strip("/"))
        path = os.path.join(root, app, f"{sf_tag}__{name}")
        built = build()
        built.write.mode("overwrite").parquet(path)
        # read back with the build's own schema: skips the ~100 ms
        # footer/schema re-inference on the file just written (r13-opt,
        # same rationale as sources/tables._SCHEMA_MEMO)
        df = spark.read.schema(built.schema).parquet(path)
        _MATERIALIZED[key] = df
    return df


def _local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Small driver-side result set as a DataFrame via the pandas/Arrow
    path (r14, guide §6 'Arrow for driver transfers').

    ``createDataFrame(list)`` wraps the rows in a PICKLED RDD split
    into defaultParallelism partitions — every action on the result
    then runs a 32-task Python-deserialization job (~0.3-0.4 s on a
    32-core session even for 40 rows, measured).  The pandas route
    converts driver-side through Arrow instead (~3.5x cheaper per
    action).  Values are exact both ways: ints ride int64, doubles
    float64 (bit-preserved), strings object->utf8.  Column names come
    positionally from the schema string."""
    import pandas as pd  # noqa: PLC0415

    if not rows:
        return spark.createDataFrame([], schema)
    names = [f.split()[0] for f in schema.split(",")]
    return spark.createDataFrame(pd.DataFrame(rows, columns=names), schema)


def _maybe_broadcast(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Broadcast hint for duplicate-graph-sized tables, as a CONFIG FLIP.

    The pair/label tables these operators join are sized by the
    duplicate graph, not the corpus — normally broadcastable.  A
    deployment whose duplicate graph outgrows executor memory sets
    ``spark.kcptc.broadcastPairGraph=false`` and every such join falls
    back to an ordinary shuffle hash join (same plan shape, still
    proportional to the duplicate graph, never the corpus) — no
    rewrite required.
    """
    if spark.conf.get("spark.kcptc.broadcastPairGraph", "true") == "true":
        return F.broadcast(df)
    return df


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    exact = docs.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    t = F.split(F.col("text"), " ")
    mut_text = F.array_join(F.slice(t, 1, F.size(t) - 1), " ")
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        mut_text.alias("text"),
        "lang",
        "source",
        F.length(mut_text).cast("long").alias("n_chars"),
    )
    return docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        exact
    ).unionByName(near)


CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 2000000, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         array_to_string(list_slice(t, 1, len(t) - 1), ' ') AS text,
         lang, source,
         CAST(length(array_to_string(list_slice(t, 1, len(t) - 1), ' ')) AS BIGINT) AS n_chars
  FROM (SELECT *, string_split(text, ' ') AS t FROM documents)
  WHERE doc_id % 10 = 0
)
"""

# 3-gram shingles of the corpus, one row per (doc_id, shingle), distinct
SHINGLES_SQL = f"""
WITH {CORPUS_SQL},
toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM corpus),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(t) >= 3
                     THEN list_transform(generate_series(1, len(t) - 2),
                                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                     ELSE [] END) AS sh
  FROM toks
)
"""


def _corpus_shingle_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per doc: (doc_id, sh_arr = DISTINCT 3-gram shingles).

    Computed without any shuffle (array_distinct on the per-row array);
    downstream operators explode it for inverted-index joins and read
    set sizes straight off the array.  r13-opt: the array is no longer
    array_sort-ed — both consumers are order-insensitive (the postings
    explode feeds groupBy/equi-joins; q_fingerprint takes array_min),
    so the per-doc n log n string sort was dead work (guide §1.2:
    don't compute things you throw away).
    """
    c = _corpus(spark, sf_dir)
    # The documents fixture is one small parquet file -> one input
    # partition; downstream pipelines expand it by orders of magnitude
    # (shingle explode x seeded hashes), so spread rows across the
    # cluster BEFORE the expansion.  At 100 TB the scan is already
    # partitioned and this is a no-op-sized shuffle.  shingles() uses
    # the zip-of-shifted-slices formulation — see functions/text.py for
    # why transform+element_at is quadratic here.
    c = c.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return c.select(
        "doc_id",
        F.array_distinct(shingles(F.col("text"), 3)).alias("sh_arr"),
    )


def _corpus_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _corpus_shingle_arrays(spark, sf_dir).select(
        "doc_id", F.explode("sh_arr").alias("sh")
    )


def _corpus_shingles_k(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Distinct k-gram shingles of the corpus, one (doc_id, sh) row."""
    c = _corpus(spark, sf_dir)
    c = c.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return c.select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("text"), k))).alias("sh")
    )


# ---------------------------------------------------------------------------
# deduplication


@register(
    "q_dedup_exact",
    oracle=f"""
    WITH {CORPUS_SQL}
    SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
    FROM corpus GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one canonical doc per hash.

    Scale: a single hash-partitioned groupBy — the 100 TB exact-dedup
    plan (hash is computed map-side; only (hash, min, count) shuffles).
    """
    c = _corpus(spark, sf_dir)
    return c.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies")
    )


@register(
    "q_neardup_minhash",
    oracle=f"""
    {SHINGLES_SQL},
    sigs AS (
      SELECT doc_id,
             {", ".join(f"MIN(substring(md5(sh), {4 * s + 1}, 4) || md5(sh)) AS minh{s}" for s in range(8))}
      FROM grams GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, band,
             CASE band {" ".join(f"WHEN {b} THEN minh{2*b} || ',' || minh{2*b+1}" for b in range(4))} END AS band_key
      FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bs
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def q_neardup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate candidate pairs.

    shingle -> 8 minhashes -> 4 bands x r=2 -> equi-join on
    (band, band_key).  The join is EQUI on the band key, so at
    100 TB it is an ordinary shuffle join whose output is only true
    candidates — never all-pairs.

    One-permutation-hashing style signature: ONE md5 per shingle, and
    the 8 minhash orderings are the 8 disjoint 4-hex-char (16-bit)
    slices of that digest (lexicographic MIN of a fixed-width hex
    slice == numeric min of the 16-bit value; engine-neutral).  The
    stored min VALUE is the slice CONCATENATED WITH THE FULL DIGEST:
    the slice still drives the permutation order (ties broken by the
    digest — a strictly finer, equally valid permutation), but the
    band key now identifies the argmin SHINGLE, not a truncated
    16-bit min.  This matters at scale: with bare 16-bit mins, two
    unrelated docs collide whenever their min VALUES tie — and mins
    of n draws concentrate near 0 (P ~ 1/1365 per slice), so
    accidental candidates grew ~quadratically (r9 scale stress
    measured growth exponent 1.49 on a 10x corpus).  With the digest
    in the key, a band collision requires the same min shingle in
    both slices — the true MinHash J^r guarantee — and the measured
    exponent drops to ~linear.  Map-side cost is still 1 digest per
    shingle; the shuffle carries 36-char mins (vs 4), a constant
    factor the collision fix dwarfs.

    Plan shape: md5 is computed once per shingle row in a projection
    BELOW the aggregate, all 8 minhashes are MIN aggregates in a
    SINGLE groupBy (partial agg map-side; no 8x row expansion), then
    the 4 band keys are derived per doc row and exploded — one tiny
    shuffle for signatures, one for the band join.
    """
    sh = _materialize(
        spark, sf_dir, "postings", lambda: _corpus_shingles(spark, sf_dir)
    ).select("doc_id", F.md5("sh").alias("h"))
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(F.concat(F.substring("h", 4 * s + 1, 4), F.col("h"))).alias(
                f"minh{s}"
            )
            for s in range(8)
        ]
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            F.col(f"minh{2 * b}"), F.lit(","), F.col(f"minh{2 * b + 1}")
                        ).alias("band_key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register(
    "q_neardup_jaccard",
    oracle=f"""
    {SHINGLES_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM grams a JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
    """,
)
def q_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard >= 0.5 via prefix-filtered set-similarity
    join (AllPairs/PPJoin family, Bayardo et al. 2007 — public).

    A naive inverted-index join explodes on hot shingles (every pair
    of docs sharing 'the fast key' meets).  Prefix filtering keeps
    exactness while only indexing each doc's ⌊n/2⌋+1 globally-rarest
    shingles: two docs with Jaccard >= 0.5 MUST share a prefix
    shingle (pigeonhole on the common global order), and rare-first
    ordering makes prefix postings short — candidate generation is an
    equi-join on rare tokens only.  Candidates are then verified
    EXACTLY on the full shingle sets.  This is the 100 TB-safe exact
    similarity join.

    Integer-domain execution: shingle strings are densely re-keyed to
    longs ordered by (document frequency, shingle) — a bijection, so
    every set operation downstream is EXACT, and:
    - the sorted int array IS the rare-first prefix order, so the
      prefix is a plain slice() — the per-doc rank window disappears;
    - the candidate equi-join compares longs, not ~25-char strings;
    - verification is array_intersect over long arrays.
    The re-keyed postings are locally checkpointed because THREE DAG
    branches consume them (at cluster scale: a cached/checkpointed
    intermediate table).

    Saturation guard (r10): prefix filtering assumes rare prefixes;
    on an adversarially saturated shingle space (fixed vocabulary,
    per-shingle df growing with the corpus) even the rarest prefixes
    go hot and candidate time turns superquadratic-ish
    (SCALE_STRESS_r09.json closed regime, exp_sec 1.43).  Prefix
    postings with df > JACCARD_HOT_DF are therefore excluded from the
    exact join and the affected doc population is routed through the
    banded-MinHash candidate stage + the SAME exact verify (the
    q_neardup_cascade path) — see _jaccard_pairs_build for the
    missed-pair containment argument.  The cap never fires on the
    natural test corpora (max observed prefix df 10 vs cap 32), so
    the oracle-exact guarantee is untouched there; under saturation
    wall time drops back to sketch-stage cost (exp < 1.0,
    SCALE_STRESS_r10.json) with hot-pair recall bounded by the LSH
    S-curve instead of 1.0.
    """
    # The verified pair table is itself a shared intermediate —
    # q_dedup_clusters consumes it verbatim — so the whole pipeline is
    # materialized once per session (see _materialize).
    return _materialize(
        spark, sf_dir, "jaccard_pairs", lambda: _jaccard_pairs_build(spark, sf_dir)
    )


def _shingle_array_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-keyed per-doc shingle-id arrays (doc_id, ids, dfs, n): every
    doc's DISTINCT 3-gram shingles as a sorted array of dense longs
    ordered rare-first by global (document frequency, shingle), plus
    the parallel global-df array (ascending, since id order IS df
    order) feeding the saturation cap.

    This is the shared physical input of the whole set-similarity
    family — the Jaccard PPJoin (prefix = a plain slice because the
    sorted int array IS the rare-first order), the containment overlap
    join, and the cluster pipeline riding on their pairs.  Spilled as a
    parquet ``_materialize`` because (a) several queries consume it and
    (b) ``monotonically_increasing_id`` must never be recomputed on a
    different partition layout — the spill freezes the bijection.

    The rekey has NO single-partition stage: range-partition the
    distinct-shingle table by (df, sh), sort within partitions, take
    monotonically_increasing_id — range partition ids are ordered, so
    the ids are an order-preserving bijection of the (df, sh) total
    order (density is not needed: downstream only uses id order +
    equality).

    r13-opt (guide §2.4): the posting lists ride the groupBy that
    counts df and fan back out with a map-side explode AFTER the id
    assignment, so the r12 shape's second full shuffle of the raw
    postings table (`postings JOIN ids ON sh`) and the ids
    localCheckpoint barrier disappear.

    r14 skew hardening (guide §2.5; r13 VERDICT next-round #2): the
    r13 spelling collected each shingle's FULL posting list in ONE
    aggregation row — at 100 TB a stop-shingle's df grows with the
    corpus and that single `collect_list` value blows a task (AQE can
    split skewed join partitions but never a single aggregation
    group).  The lists are now collected at (sh, salt-16) grain —
    deterministic salt `pmod(xxhash64(doc_id), 16)`, so every
    aggregation row is bounded at ~df/16 and re-runs deal rows
    identically (guide §2.5 on rand-derived keys) — df totals come
    from a tiny second-level count aggregate (partial-agg map-side,
    skew-free), and the id assignment joins back onto the salted
    list rows.  That join is size-gated: at fixture scale `ids` (one
    row per distinct shingle) broadcasts; past the broadcast
    threshold it is an equi-join on sh whose hot keys AQE skew-split
    CAN handle — rows per (sh, salt) stay bounded either way.
    Measured cost-neutral at sf0.1 (2.82 -> 2.95 s same-session noop
    A/B on the raw build).

    The id assignment itself is unchanged — range partition the
    per-shingle (df, sh) rows on (df, sh), sort within partitions,
    monotonically_increasing_id.  Range boundaries are re-sampled
    from the new (counts-only) input layout, so the concrete id
    VALUES may shift between shapes — but range-partition ids are
    order-preserving for ANY boundary placement, so the bijection
    stays an order-isomorphism of the (df, sh) total order, which is
    the only property any consumer uses (prefix slices, id equality,
    array_intersect; verified: the r13->r14 id mapping is strictly
    monotone over all 27,213 ids at sf0.1 and every consumer key
    stays hash-exact).  No checkpoint needed: within the single
    spill-write action the ids subtree has exactly one consumer, and
    range boundaries are driver-computed once before the reduce
    stage, so task retries cannot re-deal the ids."""
    def build() -> DataFrame:
        postings = _materialize(
            spark, sf_dir, "postings", lambda: _corpus_shingles(spark, sf_dir)
        )
        g1 = postings.groupBy(
            "sh", F.pmod(F.xxhash64("doc_id"), F.lit(16)).alias("_salt")
        ).agg(
            F.count("*").alias("df_p"), F.collect_list("doc_id").alias("docs_p")
        )
        counts = g1.groupBy("sh").agg(F.sum("df_p").cast("long").alias("df"))
        ids = (
            counts.repartitionByRange(32, F.asc("df"), F.asc("sh"))
            .sortWithinPartitions(F.asc("df"), F.asc("sh"))
            .select("sh", "df", F.monotonically_increasing_id().alias("sh_id"))
        )
        # dfs rides along, sorted WITH ids (id order == df order by
        # construction), so any prefix's max global df is a plain
        # element_at — the saturation statistic the PPJoin cap reads
        # without re-aggregating the postings (see _jaccard_pairs_build).
        z = F.sort_array(F.collect_list(F.struct("sh_id", "df")))
        return (
            g1.join(ids, "sh")
            .select("sh_id", "df", F.explode("docs_p").alias("doc_id"))
            .groupBy("doc_id")
            .agg(z.alias("z"))
            .select(
                "doc_id",
                F.col("z.sh_id").alias("ids"),
                F.col("z.df").alias("dfs"),
            )
            .withColumn("n", F.size("ids"))
        )

    return _materialize(spark, sf_dir, "shingle_arrays", build)


# Saturation guard for the PPJoin prefix stage: a prefix token whose
# GLOBAL document frequency exceeds this cap is "hot" — candidate
# pairs through it grow ~df^2, which is the measured closed-regime
# blowup (SCALE_STRESS_r09.json: exp_sec 1.43 when the shingle space
# saturates and "rarest" prefixes stop being rare).  Hot postings are
# excluded from the exact prefix join; the pairs that could ONLY meet
# through hot tokens are recovered by the banded-MinHash route (the
# q_neardup_cascade candidate stage) and then verified EXACTLY.  The
# cap is far above any natural-corpus PREFIX df (max observed global
# df at sf0.001/0.01/0.1 is 25, and prefix tokens sit well below even
# that), so on non-adversarial data the operator is the unmodified
# exact PPJoin; the saturation probe itself is a projection over the
# spilled arrays (dfs ascends with ids), costing one columnar scan.
JACCARD_HOT_DF = 32


def _jaccard_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    arrays = _shingle_array_table(spark, sf_dir)

    def prefix_frame(length: Column) -> DataFrame:
        return arrays.select(
            "doc_id",
            "n",
            F.posexplode(
                F.slice(F.arrays_zip("ids", "dfs"), 1, length.cast("int"))
            ).alias("pos0", "t"),
        ).select(
            "doc_id",
            "n",
            "pos0",
            F.col("t.ids").alias("sh_id"),
            F.col("t.dfs").alias("df"),
        )

    # Asymmetric PPJoin prefixes (Xiao et al. 2008, exact for t=0.5):
    # canonicalize each pair by the (n, doc_id) total order so side `a`
    # is the smaller record.  The joint-prefix lemma needs prefixes of
    # length |x| - alpha + 1 with alpha = ceil(t/(1+t)*(|x|+|y|)):
    # since |a| <= |b|, alpha >= ceil(2t/(1+t)*|a|) = ceil(2|a|/3) and
    # alpha >= ceil(t*|b|) = ceil(|b|/2), so `a` only needs its
    # INDEX prefix floor(|a|/3)+1 and `b` its PROBE prefix
    # floor(|b|/2)+1 — a third fewer exploded prefix tokens on the
    # indexed side than the r7 symmetric floor(n/2)+1 both-sides shape.
    # Measured at sf0.1: candidate COUNT is unchanged (547,696 — the
    # synthetic corpus's matches live in the rare region both schemes
    # keep), so local wall time is neutral; the gain is the 1/3
    # smaller indexed-side explode -> shuffle volume, which is what
    # the equi-join pays for at cluster scale.
    # Saturation statistic: a doc's probe prefix contains a hot token
    # iff the LAST df in the prefix exceeds the cap (dfs ascends with
    # ids) — a pure projection over the spilled arrays, no
    # re-aggregation.  Driver-side adaptive branch on ONE
    # aggregate-grain boolean (the AQE-skew-handling pattern): natural
    # corpora take the pure exact PPJoin plan with no sketch stage in
    # the DAG at all.
    probe_len = (F.floor(F.col("n") / 2) + 1).cast("int")
    doc_hot = F.element_at("dfs", F.least(probe_len, F.col("n"))) > JACCARD_HOT_DF
    saturated = not arrays.filter(doc_hot).isEmpty()

    a = prefix_frame(F.floor(F.col("n") / 3) + 1)
    b = prefix_frame(F.floor(F.col("n") / 2) + 1)
    if saturated:
        # per-row posting filter, not an anti-join: df travels in the
        # exploded prefix rows, so excluding hot postings is free
        a = a.filter(F.col("df") <= JACCARD_HOT_DF)
        b = b.filter(F.col("df") <= JACCARD_HOT_DF)
    a, b = a.alias("a"), b.alias("b")
    # Remaining PPJoin filters (exactness-preserving for t = 0.5):
    # - length: J >= t needs |a| * 2 >= |b| (a is the smaller side)
    # - positional: overlap upper bound 1 + min(na-posa, nb-posb) must
    #   reach the required overlap ceil(t/(1+t) * (na+nb)) = ceil((na+nb)/3)
    na, nb = F.col("a.n"), F.col("b.n")
    required = F.expr("CAST(ceil((a.n + b.n) / 3.0) AS INT)")
    ubound = 1 + F.least(na - (F.col("a.pos0") + 1), nb - (F.col("b.pos0") + 1))
    smaller_first = (na < nb) | (
        (na == nb) & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    cands = (
        a.join(
            b,
            (F.col("a.sh_id") == F.col("b.sh_id"))
            & smaller_first
            & (na * 2 >= nb)
            & (ubound >= required),
        )
        # output contract is doc_a < doc_b regardless of size order
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    if saturated:
        # Pairs whose EVERY shared prefix token is hot are invisible to
        # the capped join; any such pair has a hot token in both docs'
        # probe prefixes, so both ends live in H (docs carrying >= 1
        # hot probe-prefix token).  Recover them through the banded-
        # MinHash candidate stage restricted to H — the cascade route,
        # whose closed-regime wall time is sublinear (exp 0.56) — and
        # let the shared exact verify below keep precision at 1.0.
        # Recall on the hot route is the LSH S-curve (1 at J=1, 0.68 at
        # J=0.5) instead of PPJoin's guaranteed 1.0 — the documented
        # exactness/saturation trade, taken ONLY for hot-token pairs
        # under adversarial df inflation (rows stayed exactly equal to
        # the uncapped join at 1x/3x/10x in SCALE_STRESS_r10.json).
        h_docs = arrays.filter(doc_hot).select("doc_id")
        mh = q_neardup_minhash(spark, sf_dir)
        hot_cands = mh.join(
            h_docs.withColumnRenamed("doc_id", "doc_a"), "doc_a", "semi"
        ).join(h_docs.withColumnRenamed("doc_id", "doc_b"), "doc_b", "semi")
        cands = cands.unionByName(hot_cands.select("doc_a", "doc_b")).distinct()
    # exact verification on the full (bijectively re-keyed) sets.
    # r14 (guide §1.2 per-task work): the threshold test runs in the
    # INTEGER domain — 3c >= |a| + |b|  ⟺  c / (|a|+|b|-c) >= 0.5 for
    # positive ints (cross-multiply; no floats involved) — phrased as
    # withColumn + filter so the optimizer plans ONE array_intersect
    # per candidate in the filter and re-derives jaccard only for the
    # ~1% of survivors.  The r13 shape filtered on the DOUBLE jaccard
    # column, which Catalyst pushed into the join condition and
    # re-evaluated in the projection — ~2x the array_intersect work
    # (measured 2.06 s -> 1.18 s on the isolated verify at sf0.1).
    arr_a = arrays.select(F.col("doc_id").alias("doc_a"), F.col("ids").alias("arr_a"))
    arr_b = arrays.select(F.col("doc_id").alias("doc_b"), F.col("ids").alias("arr_b"))
    verified = cands.join(arr_a, "doc_a").join(arr_b, "doc_b")
    c = F.size(F.array_intersect("arr_a", "arr_b"))
    return (
        verified.withColumn("c", c)
        .filter(F.expr("3 * c >= size(arr_a) + size(arr_b)"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("c").cast("double")
                / (F.size("arr_a") + F.size("arr_b") - F.col("c"))
            ).alias("jaccard"),
        )
    )


@register(
    "q_simhash",
    oracle=f"""
    WITH {CORPUS_SQL},
    tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM corpus
    ),
    bits AS (
      SELECT doc_id, b.bit,
             SUM(CASE WHEN substring(md5(w), b.bit + 1, 1)
                           IN ('1','3','5','7','9','b','d','f')
                      THEN 1 ELSE -1 END) AS s
      FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bit) b
      GROUP BY doc_id, b.bit
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN CAST(POW(2, bit) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash document fingerprint (token multiset, MD5 bits).

    Bit b of the fingerprint is the sign of sum over tokens of +/-1
    by the parity of md5 hex char b.  Near-identical docs differ in
    few bits -> Hamming-ball lookup at scale.

    SimHash is a pure function of each doc's own tokens, so it is
    computed entirely per-row: ONE md5 per token inside a transform,
    then a single aggregate pass accumulating all 16 signed bit-sums
    into an array (zip_with over the 16-char hex prefix — the hash is
    a bound lambda variable, evaluated once per token).  Zero shuffles,
    zero joins — a narrow scan that trivially survives 100x scale.
    (r1 version exploded tokens and crossJoined a 16-row bit table:
    two shuffles of a 16x-expanded token stream for the same answer.)
    """
    c = _corpus(spark, sf_dir)
    odd = "('1','3','5','7','9','b','d','f')"
    bitsums = F.expr(
        f"""
        aggregate(
          transform(__toks, w -> substring(md5(w), 1, 16)),
          array_repeat(0, 16),
          (acc, h) -> zip_with(acc, sequence(1, 16),
            (a, p) -> a + IF(substring(h, p, 1) IN {odd}, 1, -1))
        )"""
    )
    simhash = F.expr(
        """
        aggregate(
          zip_with(__sums, sequence(0, 15),
            (s, b) -> IF(s > 0, shiftleft(CAST(1 AS BIGINT), b),
                         CAST(0 AS BIGINT))),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)"""
    )
    return (
        c.select("doc_id", tokens(F.col("text")).alias("__toks"))
        .select("doc_id", bitsums.alias("__sums"))
        .select("doc_id", simhash.alias("simhash"))
    )


# ---------------------------------------------------------------------------
# text analysis


@register(
    "q_text_tokens",
    oracle="""
    SELECT w AS word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
    GROUP BY w
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + corpus word count (UDTF shape: explode + groupBy)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "q_text_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS BIGINT) * 100 // COUNT(*) AS avg_chars_x100,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        # exact integer ratio (x100 floor-div on non-negative operands):
        # double division of aggregates is banned by the registry
        # discipline — DuckDB HUGEINT / engine-order float both break
        # the driver's dtype-sensitive value hash.
        F.expr("(sum(n_chars) * 100) div count(*)").alias("avg_chars_x100"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "q_text_quality",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
           CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
             / len(toks) AS stop_ratio,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
             / len(toks) AS mean_token_len
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token count, type-token ratio,
    stopword ratio, mean token length — all array expressions, zero
    shuffle, embarrassingly parallel at any scale."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    n = F.size(t)
    distinct_n = F.size(F.array_distinct(t))
    stop_n = F.size(F.filter(t, lambda x: x.isin("the", "a")))
    len_sum = F.aggregate(
        F.transform(t, lambda x: F.length(x)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        (distinct_n.cast("double") / n).alias("ttr"),
        (stop_n.cast("double") / n).alias("stop_ratio"),
        (len_sum.cast("double") / n).alias("mean_token_len"),
    )


@register(
    "q_lang_id",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    counts AS (SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY lang, w),
    prof AS (
      SELECT lang AS plang, w FROM (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rn
        FROM counts
      ) WHERE rn <= 10
    ),
    doctok AS (SELECT DISTINCT doc_id, lang, w FROM tok),
    hits AS (
      SELECT d.doc_id, d.lang, p.plang, COUNT(*) AS n_hits
      FROM doctok d JOIN prof p ON d.w = p.w
      GROUP BY d.doc_id, d.lang, p.plang
    )
    SELECT doc_id, lang, plang AS pred_lang, n_hits FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY n_hits DESC, plang) AS rn
      FROM hits
    ) WHERE rn = 1
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-driven language ID heuristic: per-language top-10 token
    profiles, predict the language with the most profile hits.

    Profiles are tiny (5 langs x 10 tokens) and broadcast; the doc-side
    work is one explode + two aggregations — linear at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("w"))
    counts = tok.groupBy("lang", "w").agg(F.count("*").alias("c"))
    w_rank = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("w"))
    prof = (
        counts.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 10)
        .select(F.col("lang").alias("plang"), "w")
    )
    # count DISTINCT profile words per (doc, candidate lang) — join
    # first so only profile-matching tokens reach the shuffle (the
    # naive plan distincts the ENTIRE exploded token table first)
    hits = (
        tok.join(F.broadcast(prof), "w")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.countDistinct("w").alias("n_hits"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("plang"))
    return (
        hits.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("plang").alias("pred_lang"), "n_hits")
    )


@register(
    "q_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_seen
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex
    (word / number / symbol classes) — the cheap proxy for LLM token
    budgeting.  Pure per-row expressions."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        ).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_seen"),
    )


@register(
    "q_fingerprint",
    oracle=f"""
    {SHINGLES_SQL}
    SELECT doc_id, MIN(md5(sh)) AS fingerprint FROM grams GROUP BY doc_id
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: minimum shingle hash (1-perm MinHash) —
    a rolling-hash-style content signature, stable under reordering of
    unrelated docs and usable as a cheap near-dup prefilter.

    Computed per-row as array_min(transform(md5)) — a pure map with NO
    explode and NO shuffle; at 100 TB this is a single scan."""
    arrays = _corpus_shingle_arrays(spark, sf_dir)
    return (
        arrays.filter(F.size("sh_arr") > 0)
        .select(
            "doc_id",
            F.array_min(F.transform("sh_arr", lambda x: F.md5(x))).alias("fingerprint"),
        )
    )


# ---------------------------------------------------------------------------
# similarity search


_EMB_NORM_SQL = """
norms AS (
  SELECT vec_id, embedding,
         (SELECT SUM(CAST(round((CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) * 1000000000) AS BIGINT))
          FROM unnest(generate_series(1, len(embedding))) AS t(i)) AS n2
  FROM embeddings
)
"""


def _emb_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (vec_id, label, embedding, n2) norms table for the whole
    ANN family (q_simsearch_topk/lsh/ivf, q_ann_margin, ...): the
    squared-norm fold is 64 multiply-round-sums per row, and five
    different indexes consuming it means five recomputes unless it is
    spilled once.  Parquet `_materialize` (not localCheckpoint) so on a
    cluster the table lives on shared storage, survives executor loss,
    and downstream scans column-prune — a consumer that only needs
    (vec_id, n2) never reads the 64-float vectors."""
    return _materialize(
        spark,
        sf_dir,
        "emb_norms",
        lambda: load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            "label",
            "embedding",
            norm2_scaled(F.col("embedding")).alias("n2"),
        ),
    )


# insertion order = bench build order: dependencies before dependents,
# so each labeled `_materialize:<name>` line bills only its own build
MATERIALIZATION_TRIGGERS["postings"] = lambda s, d: _materialize(
    s, d, "postings", lambda: _corpus_shingles(s, d)
)
MATERIALIZATION_TRIGGERS["shingle_arrays"] = _shingle_array_table
MATERIALIZATION_TRIGGERS["jaccard_pairs"] = lambda s, d: _materialize(
    s, d, "jaccard_pairs", lambda: _jaccard_pairs_build(s, d)
)
MATERIALIZATION_TRIGGERS["emb_norms"] = _emb_norms


@register(
    "q_simsearch_topk",
    oracle=f"""
    WITH {_EMB_NORM_SQL},
    dots AS (
      SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
             SUM(CAST(round((CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)) * 1000000000) AS BIGINT)) AS dot,
             any_value(q.n2) AS qn2, any_value(e.n2) AS en2
      FROM norms e
      CROSS JOIN norms q
      CROSS JOIN unnest(generate_series(1, 64)) AS t(i)
      WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
      GROUP BY q.vec_id, e.vec_id
    )
    SELECT query_id, vec_id, cos_sim FROM (
      SELECT query_id, vec_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(en2 AS DOUBLE))) AS cos_sim,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(en2 AS DOUBLE))) DESC,
                        vec_id) AS rn
      FROM dots
    ) WHERE rn <= 10
    """,
)
def q_simsearch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors — the exact ANN
    baseline.

    Scale design: queries broadcast (K rows), corpus streams through
    executors once, per-partition top-k via the rank window on the
    (small) K x N score set; dot products are JVM ``zip_with`` +
    integer ``aggregate`` — no Python, no shuffle of the corpus.
    """
    norms = _emb_norms(spark, sf_dir).select("vec_id", "embedding", "n2")
    q = norms.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
    ).filter(F.col("query_id") < 5)
    pairs = norms.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "vec_id",
        cosine(
            dot_scaled(F.col("embedding"), F.col("q_emb")), F.col("qn2"), F.col("n2")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", "cos_sim")
    )


def _hyperplanes(n_bits: int = 8, dim: int = 64) -> list[list[int]]:
    """Deterministic +/-1 hyperplanes from MD5 parity (public recipe:
    random-hyperplane LSH, Charikar 2002)."""
    planes = []
    for j in range(n_bits):
        row = []
        for k in range(dim):
            h = hashlib.md5(f"{j}|{k}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 else -1)
        planes.append(row)
    return planes


def _lsh_bucket(emb_col, planes: list[list[int]]):
    """Sign-pattern bucket id for one embedding column.

    Projections are UNROUNDED doubles: the bucket is a sign-only
    prefilter (never part of any oracle output), and per-term rounding
    at the SCALE grid injects up to dim/2 * 1e-9 of absolute error —
    enough to flip the sign of a near-zero projection between x and
    1.1x and silently drop a true near-dup pair.  Raw double error is
    ~1e-16 relative, eight orders safer."""
    bits = []
    for row in planes:
        w = F.array(*[F.lit(v) for v in row])
        proj = F.aggregate(
            F.zip_with(emb_col, w, lambda x, wv: x.cast("double") * wv),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _lsh_bucket_sql(planes: list[list[int]]) -> str:
    """DuckDB twin of _lsh_bucket: same sign bits from the same
    left-to-right fold.  The weights are +/-1, so every product is
    EXACT in IEEE doubles; list_reduce over a 0.0-prepended list
    replays Spark's F.aggregate accumulation order addition-for-
    addition, making the projection (and therefore the bucket) bit-
    identical cross-engine — which is what lets an APPROXIMATE index
    carry an exact value-level oracle."""
    bits = []
    for row in planes:
        w = "[" + ", ".join(str(v) for v in row) + "]"
        proj = (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list_transform(generate_series(1, 64), k -> "
            f"CAST(embedding[k] AS DOUBLE) * ({w})[k])), (acc, v) -> acc + v)"
        )
        bits.append(f"CASE WHEN {proj} > 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


def _lsh_sig_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed LSH signature table (vec_id, embedding, n2, tbl, bucket)
    — 6 tables x 4 sign bits, one row per (vector, table).

    Both join sides of q_simsearch_lsh (probe + broadcast query set)
    consume it; spilled as a parquet ``_materialize`` — not a
    localCheckpoint — so the 24-hyperplane bucket expressions evaluate
    (and their codegen compiles) exactly once, and on a cluster the
    index table lives on shared storage bounded by disk rather than
    pinned in executor block-manager memory.  Rides the shared
    emb_norms spill so the n2 fold also runs only once across the ANN
    family."""
    n_tables, bits = 6, 4
    planes = np.array(_hyperplanes(n_bits=n_tables * bits), dtype=np.float64)
    lut = np.array([format(i, f"0{bits}b") for i in range(1 << bits)])
    weights = 1 << np.arange(bits - 1, -1, -1)

    def sig(batches):
        # numpy build of the 24 projections: products are EXACT
        # (+/-1 weights) and the k-loop accumulates left-to-right,
        # replaying F.aggregate / DuckDB list_reduce addition-for-
        # addition, so every sign bit (and thus every candidate pair
        # the index yields) is identical to the JVM/SQL fold.  A
        # vectorized np.sum would pairwise-sum and could flip a
        # near-zero projection's sign.
        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = len(pdf)
            bits01 = np.empty((n, n_tables * bits), dtype=np.int64)
            for b in range(n_tables * bits):
                acc = np.zeros(n)
                w = planes[b]
                for k in range(emb.shape[1]):
                    acc = acc + emb[:, k] * w[k]
                bits01[:, b] = acc > 0
            buckets = np.empty((n, n_tables), dtype=object)
            for t in range(n_tables):
                codes = bits01[:, t * bits : (t + 1) * bits] @ weights
                buckets[:, t] = lut[codes]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_tables),
                    "embedding": np.repeat(pdf["embedding"].to_numpy(), n_tables),
                    "n2": np.repeat(pdf["n2"].to_numpy(), n_tables),
                    "tbl": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "bucket": buckets.ravel(),
                }
            )

    return _materialize(
        spark,
        sf_dir,
        "lsh_sig",
        lambda: _emb_norms(spark, sf_dir)
        .select("vec_id", "embedding", "n2")
        .mapInPandas(
            sig, "vec_id long, embedding array<float>, n2 long, tbl int, bucket string"
        ),
    )


MATERIALIZATION_TRIGGERS["lsh_sig"] = _lsh_sig_table

_LSH_PLANES = _hyperplanes(n_bits=24)
_LSH_BUCKETS_SQL = "\n".join(
    f"WHEN {t} THEN {_lsh_bucket_sql(_LSH_PLANES[t * 4:(t + 1) * 4])}"
    for t in range(6)
)


@register(
    "q_simsearch_lsh",
    oracle=f"""
    WITH {_EMB_NORM_SQL},
    buckets AS (
      SELECT vec_id, embedding, n2, t.tbl,
             CASE t.tbl
             {_LSH_BUCKETS_SQL}
             END AS bucket
      FROM norms, (SELECT unnest(generate_series(0, 5)) AS tbl) t
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS vec_id
      FROM buckets e JOIN buckets q
        ON e.tbl = q.tbl AND e.bucket = q.bucket
      WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
    ),
    dots AS (
      SELECT c.query_id, c.vec_id,
             SUM(CAST(round((CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)) * 1000000000) AS BIGINT)) AS dot,
             any_value(q.n2) AS qn2, any_value(e.n2) AS en2
      FROM cand c
      JOIN norms e ON e.vec_id = c.vec_id
      JOIN norms q ON q.vec_id = c.query_id
      CROSS JOIN unnest(generate_series(1, 64)) AS t(i)
      GROUP BY c.query_id, c.vec_id
    )
    SELECT query_id, vec_id, cos_sim FROM (
      SELECT query_id, vec_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(en2 AS DOUBLE))) AS cos_sim,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(en2 AS DOUBLE))) DESC,
                        vec_id) AS rn
      FROM dots
    ) WHERE rn <= 10
    """,
)
def q_simsearch_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH approximate top-k: 6 independent hash tables of
    4 random-hyperplane sign bits each; a vector is a candidate if it
    collides with the query in ANY table (the OR-of-ANDs construction
    that makes LSH recall tunable — one 8-bit table has ~2% recall on
    gaussian data, 6x4 measures ~5-10x higher at a bounded candidate
    fraction).

    The 100 TB path: (table_id, bucket) is an equi-join key, so
    candidate generation is a shuffle join instead of a KxN cross
    product.  APPROXIMATE yet exactly-oracled: the hyperplanes are
    deterministic (+/-1 md5 parity) and the bucket fold replays
    addition-for-addition in DuckDB (_lsh_bucket_sql), so the full
    candidate set — and therefore the top-k — hash-matches; pytest
    additionally asserts recall vs q_simsearch_topk and the
    candidate-fraction bound.
    """
    norms = _lsh_sig_table(spark, sf_dir)
    q = norms.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
        F.col("tbl").alias("q_tbl"),
        F.col("bucket").alias("q_bucket"),
    ).filter(F.col("query_id") < 5)
    cands = (
        norms.join(
            F.broadcast(q),
            (F.col("tbl") == F.col("q_tbl"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        # a pair colliding in several tables is scored once
        .select("query_id", "vec_id", "embedding", "q_emb", "qn2", "n2")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        cosine(
            dot_scaled(F.col("embedding"), F.col("q_emb")), F.col("qn2"), F.col("n2")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", "cos_sim")
    )


@register(
    "q_embed_dedup",
    oracle="""
    WITH sub AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.1 AS FLOAT))
      FROM embeddings WHERE vec_id % 20 = 0
    ),
    norms AS (
      SELECT vec_id, embedding,
             (SELECT SUM(CAST(round((CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) * 1000000000) AS BIGINT))
              FROM unnest(generate_series(1, len(embedding))) AS t(i)) AS n2
      FROM sub
    ),
    dots AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             SUM(CAST(round((CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) * 1000000000) AS BIGINT)) AS dot,
             any_value(a.n2) AS na, any_value(b.n2) AS nb
      FROM norms a JOIN norms b ON a.vec_id < b.vec_id
      CROSS JOIN unnest(generate_series(1, 64)) AS t(i)
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT vec_a, vec_b,
           CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cos_sim
    FROM dots
    WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) > 0.999
    """,
)
def q_embed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos > 0.999) on a corpus
    augmented with scaled copies (x * 1.1 — same direction).

    Spark side uses the LSH bucket as a prefilter (sign-pattern
    signatures are scale-invariant on exact reals) and verifies
    candidates exactly; the oracle brute-forces all pairs — the
    result sets agree because random 64-dim pairs never reach cos
    0.999.  Because a projection within float noise of zero could
    still flip sign between x and 1.1x, the candidate set is unioned
    with the deterministic (vec_id, vec_id+1000000) identity pairing —
    the planted near-dups are candidates BY CONSTRUCTION, so the
    oracle gate cannot flake; verification stays exact.  (At 100 TB
    the equivalent recall insurance is multi-table LSH as in
    q_simsearch_lsh.)  This is the candidate+verify shape that holds
    at 100 TB where all-pairs cannot.
    """
    planes = _hyperplanes()
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    scaled = e.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * 1.1).cast("float")
        ).alias("embedding"),
    )
    sub = e.select("vec_id", "embedding").unionByName(scaled)
    # four join branches (bucket a/b, planted a/b) consume this —
    # spill once (parquet _materialize, same rationale as _lsh_sig_table)
    # so the 8-plane projection and the n2 fold run once per row
    norms = _materialize(
        spark,
        sf_dir,
        "embdedup_sigs",
        lambda: sub.select(
            "vec_id",
            "embedding",
            norm2_scaled(F.col("embedding")).alias("n2"),
            _lsh_bucket(F.col("embedding"), planes).alias("bucket"),
        ),
    )
    a, b = norms.alias("a"), norms.alias("b")
    pair_cols = [
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.col("a.embedding").alias("emb_a"),
        F.col("b.embedding").alias("emb_b"),
        F.col("a.n2").alias("na"),
        F.col("b.n2").alias("nb"),
    ]
    bucket_pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(*pair_cols)
    planted_pairs = a.join(
        b, F.col("a.vec_id") + 1_000_000 == F.col("b.vec_id")
    ).select(*pair_cols)
    cands = bucket_pairs.unionByName(planted_pairs).dropDuplicates(["vec_a", "vec_b"])
    cos = cosine(dot_scaled(F.col("emb_a"), F.col("emb_b")), F.col("na"), F.col("nb"))
    return (
        cands.select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") > 0.999)
    )


# ---------------------------------------------------------------------------
# UDF surface + multimodal plumbing


@register(
    "q_udf_scalar",
    oracle="""
    WITH norms AS (
      SELECT vec_id, embedding,
             (SELECT SUM(CAST(round((CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) * 1000000000) AS BIGINT))
              FROM unnest(generate_series(1, len(embedding))) AS t(i)) AS n2
      FROM embeddings
    )
    SELECT vec_id,
           CAST(embedding[1] AS DOUBLE)
             / sqrt(CAST(n2 AS DOUBLE) / 1000000000) AS first_unit
    FROM norms
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Pandas UDF (Arrow-batched): first component of the
    unit-normalized embedding.  Demonstrates the sanctioned Python
    escape hatch — batch columnar transfer, numpy math, no per-row
    Python."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def first_unit(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="float64")
        from kafka_connect_postgres_to_clickhouse_spark.functions.vectors import (
            np_round_half_away,
        )

        # one (batch, dim) matrix per Arrow batch: embeddings are
        # fixed-dim, so the whole batch vectorizes — no per-element loop
        m = np.stack(emb.to_numpy()).astype(np.float64)
        n2 = np_round_half_away((m * m) * float(SCALE)).astype(np.int64).sum(axis=1)
        return pd.Series(m[:, 0] / np.sqrt(n2 / float(SCALE)))

    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", first_unit(F.col("embedding")).alias("first_unit"))


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
             AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(64 + doc_id % 512 AS INTEGER) AS width,
           CAST(64 + doc_id % 384 AS INTEGER) AS height
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing: opaque binary payload + typed
    metadata.

    The payload is the utf-8 encoding of ``text`` standing in for real
    image/audio bytes (real decode paths live in
    streaming/multimodal.py — BMP/WAV/PNG codecs, driver-gated by the
    q_media_decode_* keys); byte length, content hash, and metadata
    are first-class columns so partition pruning and predicate
    pushdown work on metadata without touching payload bytes.
    """
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        "doc_id",
        media.alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        (F.lit(64) + F.col("doc_id") % 512).cast("int").alias("width"),
        (F.lit(64) + F.col("doc_id") % 384).cast("int").alias("height"),
    )


# ---------------------------------------------------------------------------
# wave 5: more training-data pipeline surface


@register(
    "q_lateral_explode",
    oracle="""
    SELECT doc_id, CAST(s.i - 1 AS INTEGER) AS pos, t[s.i] AS w
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         unnest(generate_series(1, len(t))) AS s(i)
    """,
)
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral table generator with ordinality: posexplode gives each
    token its 0-based position (UDTF-shaped; the oracle is the SQL
    lateral-unnest-with-subscript form).  Pure map-side row expansion,
    no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "w"))


@register(
    "q_sample_hash",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
                THEN 'val' ELSE 'train' END AS split
    FROM documents
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val split by content-independent key hash
    (first hex nibble of md5(doc_id) < '4' -> 25% validation).

    The canonical 100 TB sampling primitive: stateless, reproducible
    across runs and engines, no shuffle, and stable under re-ingestion
    — unlike rand()-based sampling."""
    d = load_table(spark, sf_dir, "documents")
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return d.select(
        "doc_id", "lang",
        F.when(nibble < "4", F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


@register(
    "q_tfidf_rank",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
    df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w)
    SELECT doc_id, w, tf, df FROM (
      SELECT doc_id, w, tf, df,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tf DESC, df ASC, w) AS rn
      FROM tf JOIN df USING (w)
    ) WHERE rn <= 3
    """,
)
def q_tfidf_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive terms per document, ranked tf-idf-style by
    (term frequency DESC, document frequency ASC).  Ranking on the raw
    integer (tf, df) pair keeps the result exact across engines —
    an actual idf=ln(N/df) differs in the last bit between libm
    implementations and would not hash-match.

    Plan: one explode -> partial-agg tf -> df derived from tf (already
    one row per (doc, term)) -> broadcast-sized rank window per doc."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), F.asc("w"))
    return (
        tf.join(df, "w")
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "w", "tf", "df")
    )


@register(
    "q_bigrams",
    oracle="""
    WITH grams2 AS (
      SELECT doc_id, unnest(
        (SELECT coalesce(list_transform(generate_series(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i + 1]), [])
         FROM (SELECT string_split(lower(text), ' ') AS t))
      ) AS bg
      FROM documents
    )
    SELECT bg AS bigram, COUNT(*) AS n
    FROM grams2 GROUP BY bg ORDER BY n DESC, bigram LIMIT 20
    """,
)
def q_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigram counts (n-gram language profile
    building block).  Zip-slice shingling at k=2 (see
    functions/text.py), partial-agg count, TakeOrderedAndProject
    top-k with lexicographic tie-break."""
    d = load_table(spark, sf_dir, "documents")
    bg = d.select(F.explode(shingles(F.col("text"), k=2)).alias("bigram"))
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "q_decontaminate",
    oracle=f"""
    WITH {CORPUS_SQL},
    toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM corpus),
    g AS (
      SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(t) >= 5
                         THEN list_transform(generate_series(1, len(t) - 4),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])
                         ELSE [] END) AS sh
      FROM toks
    ),
    bench AS (SELECT doc_id, sh FROM g WHERE doc_id < 1000000 AND doc_id % 100 = 0),
    train AS (SELECT doc_id, sh FROM g WHERE doc_id >= 1000000)
    SELECT t.doc_id AS train_doc, COUNT(DISTINCT b.doc_id) AS n_benchmark_hits
    FROM train t JOIN bench b ON t.sh = b.sh
    GROUP BY t.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any 5-gram
    with a held-out benchmark set (the standard n-gram-overlap
    contamination check run before pretraining).

    Benchmark = every 100th original doc; training candidates = the
    re-ingested/augmented docs (doc_id >= 1M in the synthetic corpus).
    Inverted-index equi-join on the shingle — the benchmark side is a
    fixed small set, so at 100 TB it broadcasts and the check is one
    map-side join over the training scan, never a shuffle of the
    corpus.
    """
    g = _corpus_shingles_k(spark, sf_dir, 5)
    bench = g.filter((F.col("doc_id") < 1_000_000) & (F.col("doc_id") % 100 == 0))
    train = g.filter(F.col("doc_id") >= 1_000_000)
    return (
        train.join(F.broadcast(bench.withColumnRenamed("doc_id", "bench_doc")), "sh")
        .groupBy(F.col("doc_id").alias("train_doc"))
        .agg(F.countDistinct("bench_doc").alias("n_benchmark_hits"))
    )


def _ivf_cents(norms: DataFrame) -> DataFrame:
    """Deterministic coarse centroids: every 50th vector."""
    return norms.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("c_emb"),
        F.col("n2").alias("c_n2"),
    )


def _ivf_cell_scores(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Cosine of every vector against every (broadcast) centroid."""
    return vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cent_id",
        cosine(
            dot_scaled(F.col("embedding"), F.col("c_emb")), F.col("n2"), F.col("c_n2")
        ).alias("cs"),
    )


def _ivf_assign_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored IVF index: (vec_id, cent_id) nearest-centroid cell
    assignment, materialized as a parquet spill.

    The assignment pass is the expensive half of IVF — N x centroids
    scaled-integer dot products — and it is an INDEX BUILD, not query
    work: a production ANN index is built once (or incrementally) and
    probed by every query afterwards.  Spilling it makes the engine's
    cost model match that reality: bench bills the build under
    `_materialize:ivf_assign`, and q_simsearch_ivf (the query path)
    pays only probe selection + nprobe-pruned exact re-ranking.

    The scoring pass is a mapInPandas over the vector table with the
    coarse codebook as a closure constant — the centroid set is the
    index's codebook (fixed k in production; every-50th vector in this
    fixture), i.e. exactly the rows the previous plan broadcast, so
    collecting it once at build time is the same bounded transfer.
    Each Arrow batch computes all B x C scaled-integer dots as numpy
    matrix ops and emits the argmax directly: no B x C intermediate
    rows, no shuffle, one narrow pass.

    Exactness: per-element round(x*y*1e9) BIGINTs sum order-
    independently (functions/vectors.py discipline), so any evaluation
    order gives the oracle's integers; numpy replicates Spark/DuckDB
    round-half-away-from-zero via a boundary-corrected floor(|p|+0.5)
    (the bare +0.5 trick misrounds doubles within 1 ulp of .5, e.g.
    0.49999999999999994).  cs then divides identical ints by identical
    sqrt products — bit-identical IEEE sequence — and numpy argmax
    takes the FIRST max over ascending cent_ids, matching the
    (cs desc, cent_id asc) tie-break."""
    def build() -> DataFrame:
        norms = _emb_norms(spark, sf_dir).select("vec_id", "embedding", "n2")
        cents = _ivf_cents(norms).orderBy("cent_id").collect()
        cent_ids = np.array([r.cent_id for r in cents], dtype=np.int64)
        cmat = np.array([r.c_emb for r in cents], dtype=np.float64)
        c_sqrt = np.sqrt(np.array([r.c_n2 for r in cents], dtype=np.float64))

        def assign(batches):
            from kafka_connect_postgres_to_clickhouse_spark.functions.vectors import (  # noqa: PLC0415
                np_round_half_away,
            )

            for pdf in batches:
                if not len(pdf):
                    continue
                emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                v_sqrt = np.sqrt(pdf["n2"].to_numpy().astype(np.float64))
                dots = np.empty((len(pdf), len(cent_ids)), dtype=np.int64)
                for j in range(len(cent_ids)):
                    p = emb * cmat[j] * float(SCALE)
                    dots[:, j] = (
                        np_round_half_away(p).astype(np.int64).sum(axis=1)
                    )
                cs = dots.astype(np.float64) / (v_sqrt[:, None] * c_sqrt[None, :])
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "cent_id": cent_ids[cs.argmax(axis=1)],
                    }
                )

        return norms.mapInPandas(assign, "vec_id long, cent_id long")

    return _materialize(spark, sf_dir, "ivf_assign", build)


MATERIALIZATION_TRIGGERS["ivf_assign"] = _ivf_assign_table


_IVF_SCORE_SQL = """
cents AS (SELECT vec_id AS cent_id, embedding AS c_emb, n2 AS c_n2
          FROM norms WHERE vec_id % 50 = 0),
cpairs AS (
  SELECT n.vec_id, c.cent_id,
         SUM(CAST(round(CAST(n.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE) * 1000000000) AS BIGINT)) AS dot,
         any_value(n.n2) AS n2, any_value(c.c_n2) AS c_n2
  FROM norms n CROSS JOIN cents c
  CROSS JOIN unnest(generate_series(1, 64)) AS t(i)
  GROUP BY n.vec_id, c.cent_id
),
cscored AS (
  SELECT vec_id, cent_id,
         CAST(dot AS DOUBLE) / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(c_n2 AS DOUBLE))) AS cs
  FROM cpairs
)
"""


@register(
    "q_simsearch_ivf",
    oracle=f"""
    WITH {_EMB_NORM_SQL},
    {_IVF_SCORE_SQL},
    assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS rn
        FROM cscored
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cent_id FROM (
        SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS rn
        FROM cscored WHERE vec_id < 5
      ) WHERE rn <= 4
    ),
    cands AS (
      SELECT p.query_id, a.vec_id
      FROM probes p JOIN assign a ON a.cent_id = p.cent_id
      WHERE a.vec_id <> p.query_id
    ),
    qd AS (
      SELECT c.query_id, c.vec_id,
             SUM(CAST(round(CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE) * 1000000000) AS BIGINT)) AS dot,
             any_value(q.n2) AS qn2, any_value(e.n2) AS en2
      FROM cands c
      JOIN norms e ON e.vec_id = c.vec_id
      JOIN norms q ON q.vec_id = c.query_id
      CROSS JOIN unnest(generate_series(1, 64)) AS t(i)
      GROUP BY c.query_id, c.vec_id
    )
    SELECT query_id, vec_id, cos_sim FROM (
      SELECT query_id, vec_id,
             CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(en2 AS DOUBLE))) AS cos_sim,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(en2 AS DOUBLE))) DESC,
                        vec_id) AS rn
      FROM qd
    ) WHERE rn <= 10
    """,
)
def q_simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic coarse centroids (every 50th
    vector), each vector assigned to its nearest centroid cell, queries
    probe their 4 nearest cells and re-rank candidates exactly.

    The 100 TB similarity-search plan: the assignment (index build) is
    ONE linear scan with the (tiny) centroid table broadcast,
    materialized once as a stored table (_ivf_assign_table) that every
    query probes; the probe restricts scoring to nprobe cells — a
    partition-pruned fraction of the corpus — instead of the full
    cross product of q_simsearch_topk.  The oracle replicates the
    identical algorithm, so this approximate index is still
    value-exact across engines (same scaled-integer dot products, same
    tie-breaks).
    """
    norms = _emb_norms(spark, sf_dir).select("vec_id", "embedding", "n2")
    # the nearest-cell assignment is a STORED INDEX, not query work —
    # see _ivf_assign_table; the query path below only scores the 5
    # probe vectors against the centroids (5 x centroids rows) and
    # re-ranks the nprobe-pruned candidate set exactly
    assign = _ivf_assign_table(spark, sf_dir)
    w_near = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cent_id"))
    probes = (
        _ivf_cell_scores(norms.filter(F.col("vec_id") < 5), _ivf_cents(norms))
        .withColumn("rn", F.row_number().over(w_near))
        .filter(F.col("rn") <= 4)
        .select(F.col("vec_id").alias("query_id"), "cent_id")
    )
    cands = (
        probes.join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    qside = norms.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("qn2"),
    ).filter(F.col("query_id") < 5)
    scored = (
        cands.join(norms, "vec_id")
        .join(F.broadcast(qside), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine(
                dot_scaled(F.col("embedding"), F.col("q_emb")), F.col("qn2"), F.col("n2")
            ).alias("cos_sim"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", "cos_sim")
    )


@register(
    "q_training_mix",
    oracle=f"""
    WITH {CORPUS_SQL},
    canon AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
    kept AS (
      SELECT c.doc_id, c.lang, string_split(lower(c.text), ' ') AS toks
      FROM corpus c JOIN canon USING (doc_id)
    ),
    q AS (
      SELECT doc_id, lang, len(toks) AS n_tokens,
             CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
               / len(toks) AS stop_ratio
      FROM kept
    )
    SELECT lang,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
                THEN 'val' ELSE 'train' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM q
    WHERE n_tokens >= 5 AND stop_ratio <= 0.5
    GROUP BY lang, split
    """,
)
def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data mix report: exact dedup (canonical doc
    per content hash) -> quality gate (length + stopword ratio) ->
    deterministic train/val split -> docs and token budget per
    (lang, split).

    The composition pattern for a 100 TB curation run: the dedup
    groupBy is the ONLY corpus-wide shuffle, and it carries only
    (hash, lang, n_tokens, min-doc_id) — never text.  Every row of an
    md5(text) group shares identical text-derived values (same text)
    and lang, so the canonical doc's quality metrics equal any group
    member's: tokenize once per row map-side, push the quality gate
    BELOW the shuffle (filter-then-dedup == dedup-then-filter for
    group-constant predicates — shrinks the exchange), and collapse
    canon-select + metric-carry into one partial-agg'd groupBy
    (min(doc_id), first(lang), first(n_tokens)) instead of the r2
    agg + self-join that shuffled the corpus three times.  The split
    is a stateless hash of the canonical id; the final aggregate is
    partial-agg'd map-side into a handful of rows.
    """
    c = _corpus(spark, sf_dir)
    t = tokens(F.col("text"))
    n = F.size(t)
    stop_ratio = F.size(F.filter(t, lambda x: x.isin("the", "a"))).cast("double") / n
    per_row = c.select(
        F.md5("text").alias("h"),
        "doc_id",
        "lang",
        n.cast("long").alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
    ).filter((F.col("n_tokens") >= 5) & (F.col("stop_ratio") <= 0.5))
    canon = per_row.groupBy("h").agg(
        F.min("doc_id").alias("doc_id"),
        F.first("lang").alias("lang"),
        F.first("n_tokens").alias("n_tokens"),
    )
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        canon.select(
            "lang",
            F.when(nibble < "4", F.lit("val")).otherwise(F.lit("train")).alias("split"),
            "n_tokens",
        )
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
    )


@register(
    "q_redact",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS redacted,
           len(regexp_extract_all(text, '[0-9]+')) AS n_redactions
    FROM documents
    """,
)
def q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction pass: replace digit runs with a placeholder
    and count redactions per doc — the scrubbing step of a training
    pipeline.  Pure per-row regex expressions (JVM, no shuffle); the
    pattern is deliberately RE2-and-Java-compatible so the oracle
    matches byte-for-byte."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace("text", "[0-9]+", "<NUM>").alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("long").alias(
            "n_redactions"
        ),
    )


# ---------------------------------------------------------------------------
# dedup clustering: pairs -> connected components -> canonical doc

_PAIRS_SQL = f"""
{SHINGLES_SQL.replace("WITH ", "WITH RECURSIVE ", 1)},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM grams a JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
"""


@register(
    "q_dedup_clusters",
    oracle=f"""
    {_PAIRS_SQL}
    SELECT s AS doc_id,
           LEAST(s, MIN(d)) AS cluster_id,
           LEAST(s, MIN(d)) = s AS keep
    FROM reach GROUP BY s
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: connected components over the exact
    Jaccard >= 0.5 pair graph; canonical doc = min doc_id per component.

    The last stage of a real dedup pipeline: pairs alone do not say
    what to drop (A~B and B~C without A~C must still keep exactly ONE
    of {A,B,C}).  Components are computed by iterative min-label
    propagation — label(v) <- min(label(v), min of neighbor labels) —
    which converges in O(component diameter) rounds.  The edge list
    (with self-loops, so a node's own label rides the same join) is
    hash-partitioned ONCE on the source node; each round then
    broadcast-joins the current label table onto it — the broadcast
    hash join preserves the edge partitioning, so the per-round
    min-aggregation needs NO exchange and a round costs one tiny
    broadcast plus zero shuffles of the corpus.  The label table is
    pair-graph-sized (duplicates only), which is what makes broadcast
    safe; a 100 TB deployment with a duplicate graph too big to
    broadcast flips the join back to shuffle-on-key — same loop,
    and still proportional to the duplicate graph, never the corpus.
    Lineage is truncated per round with localCheckpoint (a cluster
    deployment would checkpoint to HDFS); the oracle computes the same
    components via a recursive-CTE transitive closure.  Docs with no
    near-dup pair are not emitted (they are their own singleton
    cluster by definition).

    Reference basis: dedup-on-key semantics of the sink engine
    (setup.sh:63 ReplacingMergeTree) generalized to similarity keys —
    SURVEY.md section 2.8; Kolesnikov large/small-star (public) is the
    scale-out variant of the same propagation.
    """
    # q_neardup_jaccard's result is session-materialized (see
    # _materialize), so the three DAG branches over `pairs` below read
    # checkpointed partitions — the Jaccard join never recomputes, and
    # when the pair query already ran this session it is free here.
    pairs = q_neardup_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    rev = pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    both = pairs.unionByName(rev).toDF("s", "d")
    self_loops = both.select("s").distinct().select("s", F.col("s").alias("d"))
    edges = (
        both.unionByName(self_loops)
        .repartition(4, "s")
        .localCheckpoint(eager=True)
    )
    # Self-loops make min-over-neighbors include the node itself, so
    # the initial labels are one exchange-free agg over the
    # pre-partitioned edges.
    labels = (
        edges.groupBy("s")
        .agg(F.min("d").alias("label"))
        .withColumnRenamed("s", "node")
        .localCheckpoint(eager=True)
    )
    # Labels are monotone non-increasing, so the label SUM is a
    # convergence certificate: unchanged sum <=> no label moved.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    # Min-label propagation converges in <= component-diameter rounds,
    # and diameter <= node count, so `n_nodes` rounds is a PROOF bound:
    # loop to convergence, never silently return early (a >20-diameter
    # chain would have gotten wrong labels under a fixed cap).
    max_rounds = max(20, labels.count())
    converged = False
    for _ in range(max_rounds):
        msgs = edges.join(
            _maybe_broadcast(spark, labels.withColumnRenamed("node", "d")), "d"
        ).select("s", "label")
        labels = (
            msgs.groupBy("s")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("s", "node")
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"q_dedup_clusters: label propagation did not converge in "
            f"{max_rounds} rounds — impossible for a finite graph; "
            f"indicates nondeterministic input"
        )
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# curation analytics: repetition, quality funnel, percentiles, stratified
# sampling


@register(
    "q_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_transform(generate_series(1, len(toks) - 2),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                  ELSE [] END AS grams
      FROM t
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           CASE WHEN len(grams) > 0
                THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                     / len(grams)
                ELSE CAST(0 AS DOUBLE) END AS dup_frac
    FROM g
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of duplicate 3-gram
    shingles per document (Rae et al. 2021 repetition filters, public).

    Pure per-row array expressions — no explode, no shuffle, linear in
    corpus size at any scale.  The ratio is a single per-row IEEE
    division, bit-identical across engines."""
    d = load_table(spark, sf_dir, "documents")
    g = shingles(F.col("text"), 3)
    n = F.size(g)
    nd = F.size(F.array_distinct(g))
    return d.select(
        "doc_id",
        n.cast("long").alias("n_grams"),
        nd.cast("long").alias("n_distinct"),
        F.when(n > 0, (n - nd).cast("double") / n)
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


@register(
    "q_quality_funnel",
    oracle="""
    WITH t AS (
      SELECT n_chars, string_split(lower(text), ' ') AS toks FROM documents
    ),
    f AS (
      SELECT COUNT(*) AS s0,
             COUNT(*) FILTER (n_chars >= 100) AS s1,
             COUNT(*) FILTER (n_chars >= 100 AND len(toks) >= 20) AS s2,
             COUNT(*) FILTER (n_chars >= 100 AND len(toks) >= 20
                              AND len(list_distinct(toks)) * 10 >= len(toks) * 3
                             ) AS s3
      FROM t
    )
    SELECT '0_total' AS stage, s0 AS survivors FROM f
    UNION ALL SELECT '1_min_chars', s1 FROM f
    UNION ALL SELECT '2_min_tokens', s2 FROM f
    UNION ALL SELECT '3_diversity', s3 FROM f
    """,
)
def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel report: survivors after each successive quality
    gate (min chars -> min tokens -> type-token diversity).

    ONE pass over the corpus: all gates are conditional aggregations in
    a single map-side-combined agg; the funnel reshape is a 4-row
    stack.  The diversity gate compares ratios in cross-multiplied
    integer form (no float threshold ambiguity across engines)."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    n_tok = F.size(t)
    n_uniq = F.size(F.array_distinct(t))
    g1 = F.col("n_chars") >= 100
    g2 = g1 & (n_tok >= 20)
    g3 = g2 & (n_uniq * 10 >= n_tok * 3)
    agg = d.agg(
        F.count("*").alias("s0"),
        F.sum(F.when(g1, 1).otherwise(0)).alias("s1"),
        F.sum(F.when(g2, 1).otherwise(0)).alias("s2"),
        F.sum(F.when(g3, 1).otherwise(0)).alias("s3"),
    )
    return agg.select(
        F.expr(
            "stack(4, '0_total', s0, '1_min_chars', s1,"
            " '2_min_tokens', s2, '3_diversity', s3)"
        ).alias("stage", "survivors")
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT lang,
           quantile_cont(n_chars, 0.5) AS p50,
           quantile_cont(n_chars, 0.9) AS p90,
           quantile_cont(n_chars, 0.99) AS p99
    FROM documents GROUP BY lang
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: exact interpolated p50/p90/p99 of doc
    length per language (the distribution report behind length
    filters).  Spark's percentile() and DuckDB's quantile_cont share
    the same lower+(upper-lower)*frac definition, so values match
    bit-for-bit (same pattern as q_median).  At 100 TB swap for
    percentile_approx with a fixed accuracy — noted, not silent."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("p50"),
        F.percentile("n_chars", F.lit(0.9)).alias("p90"),
        F.percentile("n_chars", F.lit(0.99)).alias("p99"),
    )


@register(
    "q_stratified_sample",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (
             CASE WHEN lang = 'en'
                  THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                  ELSE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
             END
           ) AS n_sampled
    FROM documents GROUP BY lang
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates (50%
    for 'en', 25% otherwise) decided by an md5 key-hash nibble — the
    reproducible, shuffle-free alternative to sampleBy()'s rand(),
    stable under re-ingestion and across engines.  Reported as a
    per-stratum audit (totals vs sampled)."""
    d = load_table(spark, sf_dir, "documents")
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    keep = F.when(F.col("lang") == "en", nibble < "8").otherwise(nibble < "4")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"),
    )


@register(
    "q_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - n_tokens AS BIGINT) AS start_off
      FROM t
    )
    SELECT doc_id, n_tokens, start_off,
           start_off // 512 AS first_seq,
           (start_off + n_tokens - 1) // 512 AS last_seq
    FROM o WHERE n_tokens > 0
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: concatenate the corpus in
    doc_id order and cut every 512 tokens — each doc's token offset
    and the training-sequence ids it lands in.

    The standard pretraining packing layout (GPT-style concat+chunk,
    public), computed WITHOUT a global single-partition window:
    range-partition by doc_id, run the prefix sum per partition, then
    collect the K per-partition token subtotals (K rows — a metadata
    round-trip, not a data collect), prefix-sum them on the driver and
    add each partition's base offset back as a map literal.  Every
    data-bearing stage is K-way parallel; the doc_id range exchange is
    the only shuffle.  (r14: the checkpoint-free literal-boundary
    fusion was measured on this family and NOT adopted — it re-computes
    the pre-window stages the checkpoint materializes; see
    q_lorenz_gini's r14 note.)"""
    d = load_table(spark, sf_dir, "documents")
    n = F.size(tokens(F.col("text"))).cast("long")
    t = (
        d.select("doc_id", n.alias("n_tokens"))
        .repartitionByRange(32, F.asc("doc_id"))
        .withColumn("pid", F.spark_partition_id())
    )
    wloc = Window.partitionBy("pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # checkpoint so pid/run are fixed before the two consumers (subtotal
    # collect + final projection) — and so the range layout can't be
    # re-sampled differently between them
    local = t.withColumn("run", F.sum("n_tokens").over(wloc)).localCheckpoint(eager=True)
    subtot = sorted(
        local.groupBy("pid").agg(F.max("run").alias("tot")).collect(),
        key=lambda r: r["pid"],
    )
    bases: dict[int, int] = {}
    acc = 0
    for r in subtot:
        bases[r["pid"]] = acc
        acc += r["tot"] or 0
    base_map = F.create_map(
        *[F.lit(x) for kv in bases.items() for x in kv]
    ) if bases else F.create_map()
    o = local.withColumn(
        "start_off",
        F.col("run") - F.col("n_tokens") + F.coalesce(
            F.element_at(base_map, F.col("pid")), F.lit(0)
        ).cast("long"),
    )
    return o.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        "start_off",
        F.expr("start_off div 512").alias("first_seq"),
        F.expr("(start_off + n_tokens - 1) div 512").alias("last_seq"),
    )


@register(
    "q_quantize",
    oracle="""
    WITH m AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM embeddings
    ),
    x AS (
      SELECT e.vec_id, m.mx, e.embedding,
             unnest(generate_series(1, len(e.embedding))) AS i
      FROM embeddings e JOIN m ON e.vec_id = m.vec_id
      WHERE m.mx > 0
    )
    SELECT vec_id, mx, CAST(i - 1 AS BIGINT) AS dim_idx,
           CAST(round(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 127.0 / mx)
                AS BIGINT) AS code
    FROM x
    """,
)
def q_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column: per-vector
    absmax scale, codes = round(x * 127 / absmax) — the storage/compute
    compression step before ANN indexing at scale (4x smaller, SIMD
    int8 dot products).

    Pure per-row array expressions, no shuffle.  Each code is one
    IEEE double multiply+divide then a half-up round — bit-identical
    across engines (same discipline as functions/vectors.py).
    Emitted as scalar (vec_id, dim_idx, code) rows — the driver's
    value hash cannot canonicalize ARRAY cells, and the long layout is
    also what an int8 ANN index ingests."""
    e = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    mx = F.array_max(xd)
    out = e.select("vec_id", mx.alias("mx"), "embedding").filter(F.col("mx") > 0)
    code = F.round(F.col("x").cast("double") * 127.0 / F.col("mx")).cast("long")
    return out.select(
        "vec_id", "mx", F.posexplode("embedding").alias("dim_idx", "x")
    ).select("vec_id", "mx", F.col("dim_idx").cast("long").alias("dim_idx"),
             code.alias("code"))


@register(
    "q_chunk_docs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, n, toks,
             CAST(unnest(generate_series(1, n, 48)) AS BIGINT) AS s
      FROM t WHERE n > 0
    )
    SELECT doc_id,
           CAST((s - 1) // 48 AS BIGINT) AS chunk_idx,
           s AS start_tok,
           CAST(least(64, n - s + 1) AS BIGINT) AS chunk_len,
           array_to_string(toks[CAST(s AS INTEGER):CAST(s + 63 AS INTEGER)], ' ')
             AS chunk_text
    FROM c
    """,
)
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: 64-token windows with stride 48
    (16-token overlap), one output row per (doc, chunk) with the chunk
    text and its token span.

    The retrieval-indexing companion to q_pack_sequences' training
    layout.  Pure per-row generation — tokens -> sequence(1, n, 48) ->
    posexplode -> slice/array_join — so the plan is a narrow map with
    NO shuffle; at 100 TB each task chunks its own parquet split and
    the output partitioning inherits the scan's."""
    d = load_table(spark, sf_dir, "documents")
    t = (
        d.select("doc_id", tokens(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks").cast("long"))
        .filter(F.col("n") > 0)
    )
    c = t.select(
        "doc_id",
        "n",
        "toks",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n"), F.lit(48).cast("long"))).alias("s"),
    )
    return c.select(
        "doc_id",
        ((F.col("s") - 1) / 48).cast("long").alias("chunk_idx"),
        F.col("s").alias("start_tok"),
        F.least(F.lit(64).cast("long"), F.col("n") - F.col("s") + 1).alias("chunk_len"),
        F.array_join(F.slice("toks", F.col("s").cast("int"), F.lit(64)), " ").alias("chunk_text"),
    )


@register(
    "q_vocab_oov",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    vocab AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY c DESC, w ASC) AS rn FROM cnt
      ) WHERE rn <= 1000
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY t.doc_id
    """,
)
def q_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary scoring: per-document token count and the
    fraction of tokens outside the corpus top-1000 vocabulary (count
    DESC, token ASC tie-break) — the classic LM-pipeline proxy for
    noisy / non-natural-language documents.

    Plan: one explode -> partial-agg token counts -> top-k vocab ->
    BROADCAST hash join back onto the token stream (vocab is tiny by
    construction) -> per-doc conditional agg.  The vocab top-1000 is
    orderBy+limit, which Catalyst plans as TakeOrderedAndProject:
    per-partition 1000-row heaps merged on the driver — no global
    sort, no single-partition window, scale-safe at any token count.
    oov_rate is ONE int/int IEEE division — bit-identical across
    engines (see tools/check_oracle.py discipline)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    cnt = tok.groupBy("w").agg(F.count("*").alias("c"))
    vocab = (
        cnt.orderBy(F.desc("c"), F.asc("w"))
        .limit(1000)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    joined = tok.join(F.broadcast(vocab), "w", "left")
    n_oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            n_oov.alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )
