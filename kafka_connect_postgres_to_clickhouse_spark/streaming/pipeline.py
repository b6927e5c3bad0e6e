"""Structured Streaming CDC pipeline — the continuous form of the
reference data plane (SURVEY.md section 3.2).

Reference topology: PG WAL -> Debezium -> Kafka topic -> sink ->
ClickHouse ReplacingMergeTree.  Spark topology: ``readStream`` (Kafka
in production; file/memory source in tests — the changelog IS the
source) -> envelope parse -> tombstone/delete filters ->
``foreachBatch`` LWW upsert into a keyed parquet state table, with
checkpointing standing in for Kafka Connect offset storage
(reference docker-compose.yml:88-90,133).

Delivery semantics mirror the reference: at-least-once transport +
idempotent keyed upsert (setup.sh:101-103,144 + ReplacingMergeTree
absorption).  Exactly-once to parquet is approximated by
deterministic LWW overwrite per micro-batch; a transactional table
format (Delta/Iceberg MERGE) is the drop-in production upgrade.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.envelope import parse_envelope
from ..operators.upsert import lww_dedup

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("_seq", T.LongType()),
        T.StructField("topic", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def changelog_file_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """JSON-lines changelog stream: (_seq, topic, op, value=envelope).

    Stands in for ``readStream.format("kafka")``; columns mirror the
    Kafka source's (offset, topic, value).
    """
    return spark.readStream.schema(WIRE_SCHEMA).json(source_dir)


def _current_marker(state_dir: str) -> str:
    return os.path.join(state_dir, "_CURRENT")


def _current_version(state_dir: str) -> int | None:
    try:
        with open(_current_marker(state_dir)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def _read_manifest(state_dir: str, version: int | None) -> dict | None:
    """Bucket manifest of a state version, or None for an unbucketed
    (monolithic-snapshot) version.  Shape:
    ``{"n_buckets": N, "buckets": {"<bucket>": <version holding it>}}``."""
    if version is None:
        return None
    import json

    try:
        with open(os.path.join(state_dir, f"v{version}", "_MANIFEST.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def prune_state_versions(state_dir: str, keep: int = 3) -> list[int]:
    """Bounded-disk retention for versioned state snapshots — the
    ClickHouse old-part cleanup analog (merged parts linger briefly for
    in-flight readers, then go).  Without it every micro-batch leaves a
    full snapshot behind and state disk grows linearly with BATCH COUNT
    forever — the one unbounded resource in the versioned-directory
    scheme at 100 TB.

    Deletes only versions <= current - keep: never the current version,
    never anything newer (a concurrent writer's in-flight v{N+1}), and
    ``keep`` committed versions stay so a reader that resolved
    ``_CURRENT`` just before a swap can still finish its scan.  Called
    AFTER the ``_CURRENT`` swap; a crash mid-prune just leaves extra
    old dirs for the next batch's prune — correctness never depends on
    pruning having run.  Returns the removed version numbers."""
    import re
    import shutil

    cur = _current_version(state_dir)
    if cur is None or keep < 1:
        return []
    # bucketed states reference buckets ACROSS versions (copy-on-write):
    # a version any RETAINED manifest points into is live regardless of
    # age — deleting it would tear holes in that snapshot.  The keep
    # window exists for readers that resolved _CURRENT just before the
    # swap, so the live set must union the manifests of every retained
    # version (cur-keep, cur], not just the current one: a bucket
    # untouched since v0 but rewritten by the newest batch drops out of
    # the current manifest while cur-1's manifest still needs v0.
    live: set[int] = set()
    for v in range(max(0, cur - keep + 1), cur + 1):
        manifest = _read_manifest(state_dir, v)
        if manifest:
            live.update(manifest["buckets"].values())
    removed = []
    try:
        names = os.listdir(state_dir)
    except OSError:
        return []
    for name in names:
        if not re.fullmatch(r"v\d+", name):
            continue
        v = int(name[1:])
        if v <= cur - keep and v not in live:
            path = os.path.join(state_dir, name)
            shutil.rmtree(path, ignore_errors=True)
            # a failed/partial rmtree must not be reported as removed
            if not os.path.exists(path):
                removed.append(v)
    return sorted(removed)


def read_state(
    spark: SparkSession, state_dir: str, include_tombstones: bool = False
) -> DataFrame | None:
    """Read the current state snapshot (versioned-directory scheme).

    Delete tombstones (op='d' LWW winners, kept so re-delivered older
    events cannot resurrect a deleted key) are hidden unless
    ``include_tombstones`` — the merge path reads them back, consumers
    don't see them.
    """
    v = _current_version(state_dir)
    if v is None:
        return None
    manifest = _read_manifest(state_dir, v)
    if manifest is None:
        df = spark.read.parquet(os.path.join(state_dir, f"v{v}"))
    else:
        bucketed = _read_buckets(
            spark, state_dir, manifest, [int(b) for b in manifest["buckets"]]
        )
        if bucketed is None:  # seeded from an empty snapshot: no buckets yet
            return None
        df = bucketed.drop("bkt")
    if not include_tombstones and "op" in df.columns:
        df = df.filter((F.col("op") != "d") | F.col("op").isNull())
    return df


def _read_buckets(
    spark: SparkSession, state_dir: str, manifest: dict, want: Sequence[int]
) -> DataFrame | None:
    """Read the requested buckets of a bucketed state through its
    manifest — each bucket from the VERSION that currently holds it
    (copy-on-write: untouched buckets still live in older version
    dirs).  Reads are per-bucket directory paths, so a merge that
    wants 3 of 64 buckets lists and scans exactly those 3 — the
    partition-pruning this layout exists for.  Schema differences
    across versions (evolution rewrote touched buckets only) merge
    via unionByName(allowMissingColumns=True).  Returns None when no
    requested bucket has any state yet."""
    held = manifest["buckets"]
    by_version: dict[int, list[int]] = {}
    for b in want:
        ver = held.get(str(b))
        if ver is not None:
            by_version.setdefault(int(ver), []).append(b)
    parts = []
    for ver, buckets in sorted(by_version.items()):
        vdir = os.path.join(state_dir, f"v{ver}")
        paths = [os.path.join(vdir, f"bkt={b}") for b in sorted(buckets)]
        parts.append(spark.read.option("basePath", vdir).parquet(*paths))
    if not parts:
        return None
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    return df


def run_cdc_pipeline(
    stream: DataFrame,
    payload_schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    version_cols: Sequence[str],
    apply_deletes: bool = False,
    dlq_dir: str | None = None,
    retain_versions: int = 3,
    n_buckets: int | None = None,
) -> None:
    """Run the full pipeline until no more input (Trigger.AvailableNow).

    ``n_buckets`` switches the state layout to bucket-level
    copy-on-write (``_merge_batch_bucketed``): per-batch merge work
    becomes O(batch + touched buckets) instead of O(state) — the
    setting for state that dwarfs its micro-batches.  Default keeps
    the monolithic snapshot (simplest, fine while state is
    batch-sized).

    Per micro-batch: parse envelope (PERMISSIVE — corrupt rows dropped,
    mirroring errors.tolerance=all), drop tombstones (null value,
    setup.sh:94,107), drop deletes (default, SURVEY.md section 0),
    then merge batch with existing state under LWW and publish a new
    state snapshot.

    ``dlq_dir`` routes corrupt wire records (parse failures) to an
    append-only dead-letter parquet — raw bytes preserved untouched
    with their offset and micro-batch id, so the DLQ is REPLAYABLE
    after a parser fix (the errors.deadletterqueue.* half of the
    reference's errors.tolerance=all story, setup.sh:145-147; without
    it tolerated rows vanish silently).  The q_dlq_stats classifier
    runs over exactly this output.

    State is a versioned directory (v0, v1, ...) with a ``_CURRENT``
    pointer flipped after the new snapshot is fully written — the same
    write-new-part-then-swap discipline ClickHouse merges use, so a
    mid-write crash never corrupts readable state, the merge never
    overwrites its own input, and nothing round-trips through the
    driver.  Re-running a batch after failure converges (LWW is
    idempotent); with a lakehouse table format the body becomes a
    single MERGE INTO keyed on ``keys``.
    """
    spark = stream.sparkSession

    def upsert(batch: DataFrame, batch_id: int) -> None:
        parsed = None
        if dlq_dir is not None:
            # parse ONCE: this parsed frame feeds both the corrupt DLQ
            # slice and (minus the raw bytes) the merge below — without
            # the share, every micro-batch paid two full envelope-parse
            # scans of the wire batch
            wire = batch.filter(F.col("value").isNotNull())
            parsed = parse_envelope(
                wire.withColumn("_raw", F.col("value")), payload_schema
            ).persist()
            corrupt = parsed.filter(F.col("_corrupt")).select(
                "_seq", F.col("_raw").alias("value")
            )
            # deterministic per-batch Hive-style subpath + overwrite,
            # NOT a flat append: foreachBatch is at-least-once, so a
            # micro-batch replayed after a crash (e.g. _merge_batch
            # throws after the DLQ write, or the crash lands before
            # the checkpoint commit) re-runs this write — overwriting
            # the same batch_id=N directory replaces its own previous
            # output instead of appending duplicates, which keeps the
            # DLQ directly replayable without consumer-side dedup.
            # Readers of dlq_dir recover the micro-batch id as the
            # `batch_id` partition column.
            corrupt.write.mode("overwrite").parquet(
                os.path.join(dlq_dir, f"batch_id={batch_id}")
            )
        try:
            pre = parsed.drop("_raw") if parsed is not None else None
            if n_buckets is not None:
                _merge_batch_bucketed(
                    spark, batch, payload_schema, state_dir, keys, version_cols,
                    apply_deletes, n_buckets, retain_versions, parsed=pre,
                )
            else:
                _merge_batch(
                    spark, batch, payload_schema, state_dir, keys, version_cols,
                    apply_deletes, retain_versions, parsed=pre,
                )
        finally:
            if parsed is not None:
                parsed.unpersist()

    (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _parse_clean(
    batch: DataFrame,
    payload_schema: T.StructType,
    apply_deletes: bool,
    parsed: DataFrame | None = None,
) -> DataFrame:
    """Wire micro-batch -> clean payload rows: tombstone drop, envelope
    parse (PERMISSIVE), corrupt drop, delete drop (default mode).
    NULL-safe on op: a source without an op column (e.g. the Kafka
    wrapper emits op=NULL) must pass everything through, not drop every
    row on a NULL predicate.  ``parsed`` accepts an already-parsed
    frame (the DLQ path shares one envelope parse between the corrupt
    slice and the merge) — the tombstone/corrupt/delete filters still
    apply."""
    if parsed is None:
        clean = batch.filter(F.col("value").isNotNull())
        parsed = parse_envelope(clean, payload_schema)
    rows = parsed.filter(~F.col("_corrupt")).drop("_corrupt")
    if not apply_deletes:
        rows = rows.filter((F.col("op") != "d") | F.col("op").isNull())
    return rows


def _merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    payload_schema: T.StructType,
    state_dir: str,
    keys: Sequence[str],
    version_cols: Sequence[str],
    apply_deletes: bool,
    retain_versions: int = 3,
    parsed: DataFrame | None = None,
) -> None:
    """One micro-batch of one table: parse, filter, LWW-merge, publish."""
    # symmetric twin of the bucketed path's guard: a monolithic merge
    # on bucketed state would silently read the whole state through the
    # manifest, rewrite it as a manifest-less snapshot (an O(|state|)
    # rewrite the bucket layout exists to avoid), and destroy the
    # copy-on-write layout — refuse instead of converting
    prev = _current_version(state_dir)
    if prev is not None and _read_manifest(state_dir, prev) is not None:
        raise ValueError(
            f"{state_dir} holds bucketed state; run with the same n_buckets "
            "instead of the monolithic merge (rebucketing requires an "
            "explicit rewrite)"
        )
    rows = _parse_clean(batch, payload_schema, apply_deletes, parsed=parsed)
    existing = read_state(spark, state_dir, include_tombstones=True)
    if existing is not None:
        rows = existing.unionByName(rows, allowMissingColumns=True)
    merged = lww_dedup(rows, keys, version_cols)
    # Deletes are KEPT in the persisted state as tombstone rows
    # (op='d' version winners).  Filtering them out here would let
    # a re-delivered older event in a later micro-batch win LWW
    # against an absent key and resurrect it; the tombstone must
    # stay to outrank re-deliveries.  read_state() hides them.
    prev = _current_version(state_dir)
    nxt = 0 if prev is None else prev + 1
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, f"v{nxt}"))
    os.makedirs(state_dir, exist_ok=True)
    tmp = _current_marker(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, _current_marker(state_dir))
    # after the swap: old snapshots beyond the retention window go —
    # without this, state disk grows linearly with micro-batch count
    prune_state_versions(state_dir, keep=retain_versions)


def _merge_batch_bucketed(
    spark: SparkSession,
    batch: DataFrame,
    payload_schema: T.StructType,
    state_dir: str,
    keys: Sequence[str],
    version_cols: Sequence[str],
    apply_deletes: bool,
    n_buckets: int,
    retain_versions: int = 3,
    parsed: DataFrame | None = None,
) -> None:
    """Incremental keyed merge with bucket-level copy-on-write — the
    scale path ``_merge_batch`` cannot be: the monolithic merge unions
    the WHOLE existing state into every micro-batch and rewrites all of
    it, O(|state|) work per batch, untenable once state dwarfs batches
    (a 100 TB mirror absorbing MB-sized batches).

    Layout: state rows are hash-bucketed by key
    (``pmod(xxhash64(keys), n_buckets)``, engine-stable), each version
    directory holds only the buckets ITS batch touched
    (``vN/bkt=i/``), and an underscore-hidden ``_MANIFEST.json`` maps
    every bucket to the version that currently holds it.  A micro-batch
    therefore: computes its touched buckets (bounded driver list,
    <= n_buckets), reads exactly those buckets through the manifest,
    LWW-merges them with the batch, writes only them into the new
    version, and publishes manifest+_CURRENT with the same
    write-then-swap discipline — per-batch work is
    O(|batch| + |touched buckets|), never O(|state|).  This is the
    parts-plus-manifest scheme of ReplacingMergeTree / lakehouse MERGE
    re-expressed on plain parquet; with Delta/Iceberg the manifest is
    the table format's job.  Schema evolution rides free: only touched
    buckets rewrite with the widened schema and the manifest read
    unionByName-fills the rest.

    Tombstone and replay semantics are identical to ``_merge_batch``
    (LWW is idempotent; re-delivered batches converge).  ``n_buckets``
    is fixed at state creation and enforced against the manifest —
    changing it requires a rebucketing rewrite, exactly like changing
    a table's bucket count."""
    rows = _parse_clean(batch, payload_schema, apply_deletes, parsed=parsed)
    prev = _current_version(state_dir)
    manifest = _read_manifest(state_dir, prev)
    if prev is not None and manifest is None:
        raise ValueError(
            f"{state_dir} holds unbucketed state; bucketed merge would corrupt it"
        )
    if manifest is not None and manifest["n_buckets"] != n_buckets:
        raise ValueError(
            f"state has n_buckets={manifest['n_buckets']}, merge asked {n_buckets}; "
            "rebucketing requires a full rewrite"
        )
    # persisted because TWO jobs consume the parsed batch: the touched-
    # bucket collect below and the merge write — without it the
    # envelope parse runs twice per micro-batch
    batch_rows = rows.withColumn("bkt", _bucket_col(keys, n_buckets)).persist()
    try:
        touched = sorted(r.bkt for r in batch_rows.select("bkt").distinct().collect())
        if not touched:
            return  # empty/corrupt-only batch: state and manifest stand
        merge_input = batch_rows
        if manifest is not None:
            existing = _read_buckets(spark, state_dir, manifest, touched)
            if existing is not None:
                merge_input = existing.unionByName(
                    batch_rows, allowMissingColumns=True
                )
        merged = lww_dedup(merge_input, keys, version_cols)
        nxt = 0 if prev is None else prev + 1
        vdir = os.path.join(state_dir, f"v{nxt}")
        merged.write.mode("overwrite").partitionBy("bkt").parquet(vdir)
    finally:
        batch_rows.unpersist()
    new_buckets = dict(manifest["buckets"]) if manifest is not None else {}
    new_buckets.update({str(b): nxt for b in touched})
    import json

    with open(os.path.join(vdir, "_MANIFEST.json"), "w") as f:
        json.dump({"n_buckets": n_buckets, "buckets": new_buckets}, f)
    os.makedirs(state_dir, exist_ok=True)
    tmp = _current_marker(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, _current_marker(state_dir))
    prune_state_versions(state_dir, keep=retain_versions)


def _bucket_col(keys: Sequence[str], n_buckets: int) -> F.Column:
    """Engine-stable bucket id for a key tuple."""
    return F.pmod(
        F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)
    ).cast("int")


def seed_state(
    spark: SparkSession,
    snapshot: DataFrame,
    state_dir: str,
    keys: Sequence[str],
    version_cols: Sequence[str],
    n_buckets: int | None = None,
) -> None:
    """``snapshot.mode=initial`` twin (reference setup.sh:92): publish
    a consistent initial table snapshot as the FIRST state version so
    the changelog stream starts from existing rows — Debezium reads the
    whole table (op='r') before tailing the WAL; here the batch
    snapshot (e.g. ``sources.jdbc.read_snapshot``) becomes v0 and the
    stream's LWW merges land on top.  Snapshot rows get ``op='r'`` and
    ``_seq=0`` when absent, so any changelog event (``_seq >= 1``)
    with an equal-or-newer version tuple outranks them — the handoff
    needs no coordination beyond per-key LWW (the q_snapshot_handoff
    registry query proves exactly this algebra in batch).  Passing
    ``n_buckets`` seeds the bucketed copy-on-write layout instead.
    Refuses a non-empty state dir: seeding is bootstrap, not merge."""
    if _current_version(state_dir) is not None:
        raise ValueError(f"{state_dir} already holds state; refusing to seed")
    rows = snapshot
    if "op" not in rows.columns:
        rows = rows.withColumn("op", F.lit("r"))
    if "_seq" not in rows.columns:
        rows = rows.withColumn("_seq", F.lit(0).cast("long"))
    # a snapshot re-read under load may carry per-key duplicates
    rows = lww_dedup(rows, keys, version_cols)
    vdir = os.path.join(state_dir, "v0")
    if n_buckets is not None:
        rows = rows.withColumn("bkt", _bucket_col(keys, n_buckets))
        rows.write.mode("overwrite").partitionBy("bkt").parquet(vdir)
        # the written partition dirs ARE the bucket list — a local
        # listing instead of recomputing the snapshot for a collect
        buckets = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(vdir)
            if d.startswith("bkt=")
        )
        import json

        with open(os.path.join(vdir, "_MANIFEST.json"), "w") as f:
            json.dump(
                {"n_buckets": n_buckets, "buckets": {str(b): 0 for b in buckets}}, f
            )
    else:
        rows.write.mode("overwrite").parquet(vdir)
    os.makedirs(state_dir, exist_ok=True)
    tmp = _current_marker(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write("0")
    os.replace(tmp, _current_marker(state_dir))


def compact_state(
    spark: SparkSession, state_dir: str, retain_versions: int = 3
) -> int | None:
    """Rewrite every live bucket into ONE fresh version — the
    ``OPTIMIZE TABLE ... FINAL`` analog for the bucketed layout.

    ``retain_versions`` defaults to the merge paths' keep window (3) so
    a reader that resolved ``_CURRENT`` just before the swap can still
    finish its scan; pass 1 for immediate reclaim ONLY when no
    concurrent readers exist (e.g. an offline maintenance window).

    Copy-on-write leaves dead bucket copies behind: a version dir must
    survive while ANY of its buckets is still referenced, so the stale
    siblings it wrote alongside that bucket stay on disk too (worst
    case ~2x state after every bucket of a full initial version has
    been rewritten once elsewhere).  Compaction reads the current state
    through the manifest, writes all buckets into a single new version
    with a self-contained manifest, swaps ``_CURRENT``, and lets the
    now-unreferenced old versions age out through the normal retention
    prune.  Same crash discipline as the merge: the swap is the commit
    point, a crash before it changes nothing.  No-op (returns None) on
    empty or unbucketed state; otherwise returns the new version."""
    prev = _current_version(state_dir)
    manifest = _read_manifest(state_dir, prev)
    if manifest is None:
        return None
    df = _read_buckets(
        spark, state_dir, manifest, [int(b) for b in manifest["buckets"]]
    )
    if df is None:
        return None
    nxt = prev + 1
    vdir = os.path.join(state_dir, f"v{nxt}")
    df.write.mode("overwrite").partitionBy("bkt").parquet(vdir)
    import json

    with open(os.path.join(vdir, "_MANIFEST.json"), "w") as f:
        json.dump(
            {
                "n_buckets": manifest["n_buckets"],
                "buckets": {b: nxt for b in manifest["buckets"]},
            },
            f,
        )
    tmp = _current_marker(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, _current_marker(state_dir))
    prune_state_versions(state_dir, keep=retain_versions)
    return nxt


TOPIC_TABLE_RE = r"^postgres_cdc\.iman\.(.*)$"  # RegexRouter, setup.sh:119-126


def run_multi_table_pipeline(
    stream: DataFrame,
    schemas: dict[str, T.StructType],
    keys: dict[str, Sequence[str]],
    state_root: str,
    checkpoint_dir: str,
    version_cols: Sequence[str],
    apply_deletes: bool = False,
    topic_re: str = TOPIC_TABLE_RE,
    retain_versions: int = 3,
    n_buckets: int | None = None,
) -> None:
    """N mirrored tables on ONE changelog stream — the reference's
    actual shape (all tables of the ``iman`` schema flow through the
    connector pair; RegexRouter maps topic -> table, setup.sh:119-126;
    dynamic discovery from the catalog, setup.sh:29-32).

    Each micro-batch is routed by topic into per-table slices, each
    LWW-merged into its own versioned state directory under
    ``state_root/<table>``.  The driver-side loop is over the handful
    of DISTINCT TABLES in the batch (not rows), so at 100 TB the only
    growth is one merge job per table — each internally parallel.
    """
    spark = stream.sparkSession

    def upsert(batch: DataFrame, batch_id: int) -> None:
        # persisted because 1 + |tables| jobs consume the routed batch
        # (the distinct-table collect plus one filtered slice per
        # table): without it every table's merge re-reads and
        # re-routes the SOURCE micro-batch — per-batch cost linear in
        # table count times batch scan cost (same reason the bucketed
        # merge persists its parsed batch)
        routed = batch.withColumn(
            "_table", F.regexp_extract("topic", topic_re, 1)
        ).persist()
        try:
            present = [
                r._table
                for r in routed.select("_table").distinct().collect()
                if r._table in schemas
            ]
            for t in present:
                slice_df = routed.filter(F.col("_table") == t).drop("_table")
                table_state = os.path.join(state_root, t)
                if n_buckets is not None:
                    _merge_batch_bucketed(
                        spark, slice_df, schemas[t], table_state, keys[t],
                        version_cols, apply_deletes, n_buckets, retain_versions,
                    )
                else:
                    _merge_batch(
                        spark, slice_df, schemas[t], table_state, keys[t],
                        version_cols, apply_deletes, retain_versions,
                    )
        finally:
            routed.unpersist()

    (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def windowed_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of q_win_tumbling: watermarked tumbling counts.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted — the knob the reference lacks
    (it "handles" lateness by sleeping, setup.sh:164).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def deduped_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful streaming dedup by event_id within the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def deduped_stream_within_watermark(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    evicts a key's state once the watermark passes its first-seen event
    time, so state size tracks the watermark interval — not the full
    key cardinality.  This is the 100 TB-safe variant of
    ``deduped_stream``: plain dropDuplicates on a key column keeps
    every key forever unless the event-time column is part of the key.
    Semantics: duplicates arriving within the watermark interval of the
    first occurrence are dropped; re-deliveries later than the
    watermark (already impossible for an in-order-ish source) re-emit.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "10 minutes",
    interval_minutes: int = 5,
) -> DataFrame:
    """Watermarked stream-stream inner join on user_id with an
    event-time interval bound: a right event joins a left event when it
    lands within [left.ts, left.ts + interval].

    The interval condition plus both-side watermarks is what makes the
    join's buffered state FINITE (Spark evicts each side once the other
    side's watermark passes the interval bound) — an unbounded-state
    stream-stream equi-join would OOM at 100 TB/day stream rates.  The
    join itself hash-shuffles both streams on user_id once.
    """
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"""
            l.user_id = r.user_id AND
            r.ts >= l.ts AND
            r.ts <= l.ts + INTERVAL {interval_minutes} MINUTES
            """
        ),
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("left_event_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.event_id").alias("right_event_id"),
        F.col("r.ts").alias("right_ts"),
    )


def sessionized_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "10 minutes"
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    sessionization with an event-time inactivity gap.

    This is the operator class Spark's built-ins can't express — the
    per-key state machine (``session_window`` covers the aggregate
    case; this shape generalizes to any custom fold).  State per user =
    ALL still-open sessions as parallel epoch-micros arrays (more than
    one can be open while out-of-order events within the watermark may
    still bridge or extend them).  Per batch: drop rows below the
    watermark, interval-merge batch events into the session list (a
    late event can extend a session backwards or merge two sessions),
    emit sessions whose ``last + gap`` the watermark has passed, keep
    the rest; the event-time timeout fires for the earliest open
    session when no new data arrives.

    Scale: state is hash-partitioned by user_id across executors and
    bounded by the watermark — the 100 TB sessionization plan.  Arrow
    moves rows to Python in batches (pandas per group), never per-row.
    """
    import pandas as pd  # noqa: PLC0415 — keep Arrow worker imports local

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = (
        "user_id bigint, session_start timestamp, "
        "session_end timestamp, n_events bigint"
    )
    state_schema = (
        "starts array<bigint>, lasts array<bigint>, ns array<bigint>"
    )

    def fn(key, pdf_iter, state):
        user_id = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000

        def to_row(s):
            return {
                "user_id": user_id,
                "session_start": pd.Timestamp(s[0], unit="us"),
                "session_end": pd.Timestamp(s[1], unit="us"),
                "n_events": s[2],
            }

        sessions = (
            [list(t) for t in zip(*state.get)] if state.exists else []
        )
        if not state.hasTimedOut:
            ts_us = sorted(
                int(t.value) // 1000
                for pdf in pdf_iter
                for t in pd.to_datetime(pdf["ts"])
                if int(t.value) // 1000 >= wm_us  # late data dropped
            )
            sessions.extend([t, t, 1] for t in ts_us)
            sessions.sort(key=lambda s: s[0])
            merged = []
            for s in sessions:
                if merged and s[0] - merged[-1][1] <= gap_us:
                    merged[-1][1] = max(merged[-1][1], s[1])
                    merged[-1][2] += s[2]
                else:
                    merged.append(s)
            sessions = merged

        closed = [s for s in sessions if s[1] + gap_us < wm_us]
        still_open = [s for s in sessions if s[1] + gap_us >= wm_us]
        if still_open:
            state.update(
                (
                    [s[0] for s in still_open],
                    [s[1] for s in still_open],
                    [s[2] for s in still_open],
                )
            )
            # earliest possible close; must sit strictly past the
            # current watermark for the runtime to accept it
            t_ms = max(
                min(s[1] for s in still_open) + gap_us, wm_us + 1000
            ) // 1000
            state.setTimeoutTimestamp(t_ms)
        elif state.exists:
            state.remove()
        yield pd.DataFrame([to_row(s) for s in closed])

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def stream_static_join(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static broadcast join: enrich the event stream with the
    customer dimension (re-read per micro-batch; no state)."""
    return events.join(
        F.broadcast(customer), events.user_id == customer.c_custkey, "inner"
    ).select("event_id", "ts", "user_id", "c_name", "c_mktsegment")


def kafka_reader_options(bootstrap: str, topics: str) -> dict[str, str]:
    """Kafka reader options (setup.sh:117,144) — pure, contract-tested
    (tests/test_adapters.py) since no broker exists in the sandbox."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topics,
        "startingOffsets": "earliest",  # consumer.override.auto.offset.reset
    }


def kafka_source(spark: SparkSession, bootstrap: str, topics: str) -> DataFrame:
    """Production source (reference topic subscription, setup.sh:117).

    Not exercised live in tests (no broker in the container) — the
    file stream above is column-compatible; the option surface is
    contract-tested.
    """
    return (
        spark.readStream.format("kafka")
        .options(**kafka_reader_options(bootstrap, topics))
        .load()
        .select(
            F.col("offset").alias("_seq"),
            "topic",
            F.lit(None).cast("string").alias("op"),
            F.col("value").cast("string").alias("value"),
        )
    )


def bootstrap_pipeline(
    tables_df: DataFrame,
    columns_df: DataFrame,
    stream: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    version_cols: Sequence[str],
    schema: str = "iman",
    apply_deletes: bool = False,
    n_buckets: int | None = None,
) -> dict[str, T.StructType]:
    """The reference's entry point A (setup.sh bootstrap) end-to-end:
    catalog discovery -> per-table Spark schemas -> keyed multi-table
    CDC pipeline.

    1. BASE TABLEs of the schema from the catalog (setup.sh:29-32);
    2. per-table ``StructType`` via the PG type map (setup.sh:40-49);
    3. primary key per the reference heuristic — a ``*_id`` column if
       present, else the first column (setup.sh:54-64's
       ``COALESCE(pk, first_column)``);
    4. ``run_multi_table_pipeline`` with one state dir per table.

    Returns the discovered ``{table: StructType}`` so callers can
    inspect or generate sink DDL (``plans.ddl``).
    """
    from ..plans.typemap import struct_type_from_catalog

    tables = [
        r.table_name
        for r in tables_df.filter(
            (F.col("table_schema") == schema) & (F.col("table_type") == "BASE TABLE")
        )
        .select("table_name")
        .collect()
    ]
    cols = columns_df.filter(F.col("table_schema") == schema).collect()
    schemas: dict[str, T.StructType] = {}
    keys: dict[str, Sequence[str]] = {}
    for t in tables:
        tcols = sorted(
            (r for r in cols if r.table_name == t), key=lambda r: r.ordinal_position
        )
        schemas[t] = struct_type_from_catalog(
            [(r.column_name, r.data_type, r.is_nullable) for r in tcols]
        )
        id_cols = [r.column_name for r in tcols if r.column_name.endswith("_id")]
        keys[t] = [id_cols[0] if id_cols else tcols[0].column_name]
    run_multi_table_pipeline(
        stream, schemas, keys, state_root, checkpoint_dir, version_cols,
        apply_deletes, n_buckets=n_buckets,
    )
    return schemas


def lww_compacted_stream(changes: DataFrame) -> DataFrame:
    """Streaming LWW compaction: per key, emit at most ONE row per
    micro-batch (the newest by the (ts_us, seq) LWW order of
    operators/upsert.py), and suppress any update that is not strictly
    newer than what was already emitted in ANY earlier batch.

    This is the streaming twin of q_dedup_lww / the sink's
    dedup-on-read view (reference: ClickHouse ReplacingMergeTree keeps
    the max version at merge time; setup.sh:177's FINAL read): a
    redelivered or out-of-order CDC update can never resurrect an
    older row downstream, because the per-key high-water mark
    (ts_us, seq) lives in checkpointed per-key state that survives
    batches and restarts.

    Implemented with ``applyInPandasWithState`` (state: one
    (ts_us, seq) tuple per key, hash-partitioned across executors;
    rows reach Python as Arrow batches).  ``lww_compacted_stream_tws``
    is the same operator on Spark 4's ``transformWithStateInPandas``
    successor API — preferred on clusters (RocksDB-backed state,
    per-state TTL) but requires the ``protobuf`` wheel for its
    state-server wire protocol, absent in this sandbox.
    """
    import pandas as pd  # noqa: PLC0415 — keep Arrow worker imports local

    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    def fn(key, pdf_iter, state):
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if pdf.empty:
            return
        best = pdf.sort_values(["ts_us", "seq"]).iloc[-1]
        cand = (int(best.ts_us), int(best.seq))
        prev = tuple(state.get) if state.exists else None
        if prev is None or cand > (int(prev[0]), int(prev[1])):
            state.update(cand)
            yield pd.DataFrame(
                [
                    {
                        "pk": int(key[0]),
                        "ts_us": cand[0],
                        "seq": cand[1],
                        "val": best.val,
                    }
                ]
            )

    return changes.groupBy("pk").applyInPandasWithState(
        fn,
        "pk bigint, ts_us bigint, seq bigint, val string",
        "ts_us bigint, seq bigint",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def lww_compacted_stream_tws(changes: DataFrame) -> DataFrame:
    """``lww_compacted_stream`` on the ``transformWithStateInPandas``
    API (Spark 4's arbitrary-state successor to
    ``applyInPandasWithState``): identical emit/suppress semantics,
    state in a named ValueState cell.

    Why a second implementation exists: on a real cluster this is the
    one to run — RocksDB state store (state >> executor heap),
    per-state-cell TTL (``getValueState(..., ttlDurationMs=...)``
    bounds an unbounded key domain the way
    ``dropDuplicatesWithinWatermark`` bounds its dedup set), and
    schema-evolvable state.  Its Python<->JVM state protocol needs the
    ``protobuf`` wheel, not installed in this sandbox, so tests verify
    the constructed streaming plan (operator node, grouping key,
    output schema) and the worker-side fold logic directly, not an
    end-to-end run — same seam policy as streaming/multimodal.py's
    decode backends.
    """
    import pandas as pd  # noqa: PLC0415 — keep Arrow worker imports local

    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LWWProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._latest = handle.getValueState("latest", "ts_us bigint, seq bigint")

        def handleInputRows(self, key, rows, timer_values):
            pdf = pd.concat(list(rows), ignore_index=True)
            if pdf.empty:
                return
            best = pdf.sort_values(["ts_us", "seq"]).iloc[-1]
            cand = (int(best.ts_us), int(best.seq))
            prev = self._latest.get()
            if prev is None or cand > (int(prev[0]), int(prev[1])):
                self._latest.update(cand)
                yield pd.DataFrame([best])

        def close(self) -> None:
            pass

    return changes.groupBy("pk").transformWithStateInPandas(
        LWWProcessor(),
        outputStructType="pk bigint, ts_us bigint, seq bigint, val string",
        outputMode="Append",
        timeMode="None",
    )


def run_slot_lag_monitor(
    stream: DataFrame, state_dir: str, checkpoint_dir: str
) -> None:
    """Streaming consumer-health monitor: the continuous twin of the
    batch q_slot_lag / q_heartbeat_staleness queries (reference
    setup.sh:90 ``slot.name`` — a live connector watches its slot's
    confirmed LSN advance, not a snapshot of it).

    Per micro-batch, each topic's partial (max offset acked, record
    count, latest event time) merges into the persisted per-topic
    state: confirmed_lsn and last_ts advance by MAX, n_records
    accumulates by SUM — all three merge functions are associative
    and commutative, so the monitor state is identical for ANY
    micro-batch partitioning of the stream (the property the parity
    test asserts).  State publishes through the same
    write-new-version-then-swap-_CURRENT scheme as the CDC state
    (run_cdc_pipeline) — atomic visibility, never overwrites its
    input — and each version records the batch_id it merged so an
    at-least-once REPLAY of the trailing micro-batch (crash between
    swap and checkpoint commit) is detected and skipped instead of
    SUM-merging n_records twice.

    100 TB plan: per-batch work is one topic-grain partial agg of the
    batch plus a merge against topic-cardinality state — independent
    of history size."""
    spark = stream.sparkSession

    def update(batch: DataFrame, batch_id: int) -> None:
        prev = _current_version(state_dir)
        # Replay guard: foreachBatch is at-least-once — a crash between
        # the _CURRENT swap below and Spark's checkpoint commit makes
        # the engine re-deliver the SAME batch_id on restart.  The MAX
        # merges (confirmed_lsn, last_ts) are idempotent but the SUM of
        # n_records is not, so re-merging would double-count.  Each
        # published version records the batch_id it merged (an
        # underscore-prefixed sidecar, invisible to parquet readers);
        # the swap makes state + marker visible atomically, and a
        # replayed batch whose id already sits in the current version
        # is a no-op.  Only the latest id is needed: the engine replays
        # at most the one uncommitted trailing batch.
        if prev is not None:
            marker = os.path.join(state_dir, f"v{prev}", "_BATCH_ID")
            try:
                with open(marker) as f:
                    if int(f.read().strip()) == batch_id:
                        return
            except (OSError, ValueError):
                pass
        agg = batch.groupBy("event_type").agg(
            F.max("event_id").cast("long").alias("confirmed_lsn"),
            F.count("*").cast("long").alias("n_records"),
            F.max("ts").alias("last_ts"),
        )
        existing = read_state(spark, state_dir)
        if existing is not None:
            agg = (
                existing.unionByName(agg)
                .groupBy("event_type")
                .agg(
                    F.max("confirmed_lsn").cast("long").alias("confirmed_lsn"),
                    F.sum("n_records").cast("long").alias("n_records"),
                    F.max("last_ts").alias("last_ts"),
                )
            )
        nxt = 0 if prev is None else prev + 1
        vdir = os.path.join(state_dir, f"v{nxt}")
        agg.write.mode("overwrite").parquet(vdir)
        with open(os.path.join(vdir, "_BATCH_ID"), "w") as f:
            f.write(str(batch_id))
        os.makedirs(state_dir, exist_ok=True)
        tmp = _current_marker(state_dir) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, _current_marker(state_dir))
        prune_state_versions(state_dir)

    (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
