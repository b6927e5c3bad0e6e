"""Custom Python DataSource SINK (Spark 4 `pyspark.sql.datasource`
writer API): a JSONL directory sink with a manifest-based commit
protocol, batch and streaming.

Why it exists: the reference's sink side is a connector plugin (the
ClickHouse sink connector, setup.sh:109-148) whose delivery contract is
at-least-once writes made effectively-once by idempotent apply.  The
Spark-4-native analogue of "drop in a new sink" is a Python
DataSourceWriter — no JVM code — and this one demonstrates the same
contract with files:

- ``write`` (executor, per task) streams rows to a TEMP file under the
  target directory and returns a commit message naming it; a task that
  never reaches ``commit`` leaves only an unreferenced temp file.
- ``commit`` (driver, once, after ALL tasks succeed) renames temp files
  to final part files and writes a ``_MANIFEST.json`` naming exactly
  the committed files + row counts.  Readers that trust only
  manifest-listed files get atomic all-or-nothing visibility — the
  file-level twin of the JDBC sink's transactional batch apply.
- ``abort`` removes the orphaned temp files.

The streaming writer commits per epoch to ``_MANIFEST-<epochId>.json``;
re-delivery of an epoch after a crash rewrites the SAME manifest
(last-writer-wins), so a manifest-trusting reader observes each epoch
exactly once — the checkpoint/redelivery contract `tests/test_streaming.py`
pins for the pipeline's foreachBatch sink, expressed at the DataSource
API level.

JSON serialization: values that are not JSON-native (timestamps,
decimals, bytes) are rendered via ``str`` — the sink's documented wire
format, deterministic for the fixture types.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    temp_name: str
    rows: int


def _write_task(path: str, iterator: Iterator) -> _FileCommit:
    """Executor-side task write: rows -> one temp JSONL file."""
    os.makedirs(path, exist_ok=True)
    temp_name = f"_tmp-{uuid.uuid4().hex}.jsonl"
    n = 0
    with open(os.path.join(path, temp_name), "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), default=str, sort_keys=True))
            f.write("\n")
            n += 1
    return _FileCommit(temp_name=temp_name, rows=n)


def _finalize(path: str, messages, manifest_name: str) -> None:
    """Driver-side commit: rename temp files, then write the manifest
    LAST (the manifest is the commit point — a crash before it leaves
    no visible data; rewriting it is idempotent)."""
    entries = []
    for i, m in enumerate(messages):
        if m is None:  # speculative/failed duplicate task slot
            continue
        final = f"part-{i:05d}-{m.temp_name[5:]}"
        src = os.path.join(path, m.temp_name)
        dst = os.path.join(path, final)
        if os.path.exists(src):  # re-commit of a replayed epoch: already moved
            os.replace(src, dst)
        if not os.path.exists(dst):
            # Fail AT COMMIT TIME, not later in read_committed: a retried
            # commit after file loss must not write a manifest that
            # references a missing part file.
            raise FileNotFoundError(
                f"commit aborted: part file missing for task {i}: {dst}")
        entries.append({"file": final, "rows": m.rows})
    manifest = {
        "files": entries,
        "total_rows": sum(e["rows"] for e in entries),
    }
    tmp_manifest = os.path.join(path, f"_tmp-manifest-{uuid.uuid4().hex}")
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp_manifest, os.path.join(path, manifest_name))


def _clean_aborted(path: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        try:
            os.remove(os.path.join(path, m.temp_name))
        except OSError:
            pass


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator: Iterator) -> _FileCommit:
        return _write_task(self.path, iterator)

    def commit(self, messages) -> None:
        _finalize(self.path, messages, "_MANIFEST.json")

    def abort(self, messages) -> None:
        _clean_aborted(self.path, messages)


class JsonlSinkStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator: Iterator) -> _FileCommit:
        return _write_task(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 - API name
        _finalize(self.path, messages, f"_MANIFEST-{batchId}.json")

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 - API name
        _clean_aborted(self.path, messages)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> JsonlSinkStreamWriter:
        return JsonlSinkStreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    """Idempotent registration of the `jsonl_sink` format."""
    spark.dataSource.register(JsonlSinkDataSource)


def read_committed(path: str, manifest: str = "_MANIFEST.json") -> list[dict]:
    """Manifest-trusting reader: returns rows from committed files ONLY
    (uncommitted temp files are invisible by construction)."""
    with open(os.path.join(path, manifest)) as f:
        meta = json.load(f)
    rows: list[dict] = []
    for entry in meta["files"]:
        with open(os.path.join(path, entry["file"])) as f:
            rows.extend(json.loads(line) for line in f)
    return rows
