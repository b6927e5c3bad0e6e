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
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", "1000"))
        self.parts = int(options.get("partitions", "4"))
        self.n_keys = max(self.rows // 20, 1)

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        lo = self.rows * i // self.parts
        hi = self.rows * (i + 1) // self.parts
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
    """Idempotent registration of the `changelog_gen` format."""
    spark.dataSource.register(ChangelogGenSource)
