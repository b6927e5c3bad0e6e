"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic CDC-changelog generator, batch and microbatch.

Why it exists: the reference's source side is a connector plugin
(Debezium inside Kafka Connect, setup.sh:76-107) — the Spark-4-native
analogue of "drop in a new source" is a Python DataSource subclass
registered at runtime, no JVM code.  This one generates the same
op/pk/seq/ts shape our changelog operators consume, so it doubles as a
load generator for pipeline tests at any row count.

Determinism contract (the DuckDB oracle of q_pysource_scan rebuilds it
relationally): row r of `rows` total ->
    op   = 'D' if r % 10 == 0 else 'I' if r % 10 == 1 else 'U'
    pk   = r % (rows // 20)        (20 versions per key on average)
    seq  = r
    ts_us= 1_700_000_000_000_000 + 1000 * r
    val  = 'v' || r
Partition i of `partitions` serves rows [i*rows/p, (i+1)*rows/p) —
generation is embarrassingly parallel and never touches the driver.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

EPOCH_US = 1_700_000_000_000_000


def _row(r: int, n_keys: int) -> tuple[str, int, int, int, str]:
    m = r % 10
    op = "D" if m == 0 else ("I" if m == 1 else "U")
    return (op, r % n_keys, r, EPOCH_US + 1000 * r, f"v{r}")


class ChangelogGenReader(DataSourceReader):
    """Batch reader with RANGE FILTER PUSHDOWN on the monotone `seq`
    column (Spark 4.1 `pushFilters`): because row r has seq == r by
    the determinism contract, a seq predicate translates directly
    into a generation-range clamp — pushed filters PRUNE whole
    partitions (a partition whose [lo, hi) range misses the bound is
    never scheduled) and bound the per-partition loop, the same
    offset-range pushdown a Kafka/JDBC connector does with
    startingOffsets / WHERE clauses.  Unsupported shapes (non-seq
    columns, OR trees — Spark pre-splits ANDs) are returned to Spark
    for post-scan evaluation, per the API contract."""

    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", "1000"))
        self.parts = int(options.get("partitions", "4"))
        self.n_keys = max(self.rows // 20, 1)
        # seq bounds as a half-open [seq_lo, seq_hi) generation range
        self.seq_lo = 0
        self.seq_hi = self.rows
        self.pushed: list = []  # introspection for tests

    def pushFilters(self, filters):  # noqa: N802 (API name)
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            val = getattr(f, "value", None)
            if attr == ("seq",) and isinstance(val, int):
                if isinstance(f, EqualTo):
                    self.seq_lo = max(self.seq_lo, val)
                    self.seq_hi = min(self.seq_hi, val + 1)
                elif isinstance(f, GreaterThan):
                    self.seq_lo = max(self.seq_lo, val + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.seq_lo = max(self.seq_lo, val)
                elif isinstance(f, LessThan):
                    self.seq_hi = min(self.seq_hi, val)
                elif isinstance(f, LessThanOrEqual):
                    self.seq_hi = min(self.seq_hi, val + 1)
                else:
                    yield f
                    continue
                self.pushed.append(f)
            else:
                yield f

    def _part_range(self, i: int) -> tuple[int, int]:
        lo = self.rows * i // self.parts
        hi = self.rows * (i + 1) // self.parts
        return max(lo, self.seq_lo), min(hi, self.seq_hi)

    def partitions(self) -> Sequence[InputPartition]:
        kept = [
            InputPartition(i)
            for i in range(self.parts)
            if self._part_range(i)[0] < self._part_range(i)[1]
        ]
        # the API requires at least one partition even for an empty scan
        return kept or [InputPartition(0)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = self._part_range(partition.value)
        for r in range(lo, hi):
            yield _row(r, self.n_keys)


class ChangelogGenStreamReader(DataSourceStreamReader):
    """Microbatch twin: each trigger serves `batch_rows` more rows of
    the same deterministic sequence; the offset IS the row index (same
    contract as a Kafka offset).

    Restart semantics: a real source's ``latestOffset`` queries a
    DURABLE system (the broker); this generator's pacing counter lives
    in the reader, so exact resume across a query restart requires the
    ``progress_path`` option — a sidecar file holding the high-water
    mark, re-read by the recreated reader (atomic replace, one query
    per path).  Without it a fresh reader restarts the pacing from 0
    and a checkpoint-resumed query would re-serve delivered rows; the
    ``partitions`` clamp below at least refuses to serve a regressed
    (start > end) plan.  Tests that run a single uninterrupted query
    need no path."""

    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", "1000"))
        self.batch_rows = int(options.get("batch_rows", "100"))
        self.n_keys = max(self.rows // 20, 1)
        self.progress_path = options.get("progress_path")
        self._latest = self._read_progress()

    def _read_progress(self) -> int:
        if not self.progress_path:
            return 0
        try:
            with open(self.progress_path) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return 0

    def _write_progress(self, row: int) -> None:
        if not self.progress_path:
            return
        import os

        tmp = f"{self.progress_path}.tmp"
        with open(tmp, "w") as f:
            f.write(str(row))
        os.replace(tmp, self.progress_path)

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # each poll advances one batch, capped at the configured total
        self._latest = min(self._latest + self.batch_rows, self.rows)
        self._write_progress(self._latest)
        return {"row": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # a restarted pacing counter can plan end < start (committed
        # checkpoint ahead of this reader's memory): adopt the
        # committed position and serve nothing rather than duplicating
        if start["row"] > self._latest:
            self._latest = start["row"]
            self._write_progress(self._latest)
        return [InputPartition((start["row"], max(end["row"], start["row"])))]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        for r in range(lo, hi):
            yield _row(r, self.n_keys)

    def commit(self, end: dict) -> None:
        if end["row"] > self._latest:
            self._latest = end["row"]
        self._write_progress(self._latest)


class ChangelogGenSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "changelog_gen"

    def schema(self) -> str:
        return "op string, pk bigint, seq bigint, ts_us bigint, val string"

    def reader(self, schema) -> ChangelogGenReader:
        return ChangelogGenReader(self.options)

    def streamReader(self, schema) -> ChangelogGenStreamReader:
        return ChangelogGenStreamReader(self.options)


def register_changelog_gen(spark) -> None:
    """Idempotent registration of the `changelog_gen` format.

    Also enables `spark.sql.python.filterPushdown.enabled` (a runtime
    SQL conf, default false in Spark 4.1): a reader that implements
    ``pushFilters`` raises at planning time when the conf is off, so
    registration and the conf are one unit — any session that can see
    the format can plan it, including the driver's vanilla session."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChangelogGenSource)
