"""A Spark 4 Python Data Source WRITER: manifest-committed JSONL sink
with exactly-once streaming semantics.

The write-side counterpart of `sources/pyds.py` (format "sensorgen"),
completing the modern extension-point story in both directions: the
reference's sink operator (R6, `/root/reference/README.md:132-155`)
achieves exactly-once with a keyed UPSERT; this sink achieves it the
FILE-SINK way — atomic manifest commit keyed by batch id:

- Each TASK writes its rows to a uniquely-named data file and returns
  a commit message naming the file (executor-side; never through the
  driver).
- The DRIVER's ``commit(messages, batchId)`` atomically REPLACES the
  manifest entry for that batch id with the file list. A crashed or
  replayed batch therefore converges: files from failed attempts are
  simply never manifested (abort also best-effort deletes them), and
  a replay OVERWRITES the batch's entry instead of appending — the
  same idempotence-by-key argument as the reference's UPSERT, with
  the batch id as the key.
- Readers go through :func:`read_manifested` which lists the manifest
  and reads ONLY committed files — uncommitted orphans are invisible.

Scale notes: data moves executor-side only; the driver handles one
small message per task and one manifest write per batch (the same
contract as Spark's built-in file-sink `_spark_metadata` log). The
manifest directory must be on storage the driver can write
(local FS here; object store / DBFS in production).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_manifest.json"


@dataclass
class FileCommit(WriterCommitMessage):
    path: str
    rows: int


def _write_rows(path: str, iterator) -> FileCommit:
    """Executor-side: stream rows into one uniquely-named JSONL file.
    ``default=str`` renders non-JSON-native cells (timestamp, date,
    Decimal, ...) via their string form so the sink accepts the same
    schemas the engine's typed frames carry."""
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"part-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(fname, "w") as f:
        for row in iterator:
            # recursive=True: Row.asDict is shallow by default, and a
            # nested struct cell would otherwise serialize as the
            # repr string "Row(...)" instead of a JSON object
            f.write(
                json.dumps(row.asDict(recursive=True), default=str) + "\n"
            )
            n += 1
    return FileCommit(path=fname, rows=n)


def _load_manifest(path: str) -> dict:
    try:
        with open(os.path.join(path, MANIFEST)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _store_manifest(path: str, manifest: dict) -> None:
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, MANIFEST))  # atomic on POSIX


def _drop_files(messages) -> None:
    for m in messages:
        if m is not None:
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonlBatchWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> FileCommit:
        return _write_rows(self.path, iterator)

    def commit(self, messages) -> None:
        old = _load_manifest(self.path)
        new = [
            {"path": m.path, "rows": m.rows} for m in messages if m is not None
        ]
        if self.overwrite:
            # mode('overwrite'): the new file set REPLACES the whole
            # manifest (streaming entries included). ORDER MATTERS:
            # write the new manifest FIRST, then delete the files it
            # no longer references — a crash between the two leaves
            # unreferenced-but-present old files (harmless orphans),
            # whereas deleting first would leave a manifest pointing
            # at removed files and break every reader.
            _store_manifest(self.path, {"batch": new})
            for entry in old.values():
                for e in entry:
                    try:
                        os.remove(e["path"])
                    except OSError:
                        pass
        else:
            old["batch"] = old.get("batch", []) + new
            _store_manifest(self.path, old)

    def abort(self, messages) -> None:
        _drop_files(messages)


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.path = options["path"]
        # chaos hook for the delivery tests: if the flag file exists,
        # the task fails AFTER writing its data file — leaving exactly
        # the orphaned-uncommitted-file crash state the manifest
        # protocol must make invisible
        self.fault_flag = options.get("fault_flag")

    def write(self, iterator) -> FileCommit:
        msg = _write_rows(self.path, iterator)
        if self.fault_flag and os.path.exists(self.fault_flag):
            raise RuntimeError("injected sink fault after data write")
        return msg

    def commit(self, messages, batchId: int) -> None:
        manifest = _load_manifest(self.path)
        # REPLACE, never append: a replayed batch id converges to one
        # committed file set — the exactly-once invariant
        manifest[str(batchId)] = [
            {"path": m.path, "rows": m.rows} for m in messages if m is not None
        ]
        _store_manifest(self.path, manifest)

    def abort(self, messages, batchId: int) -> None:
        _drop_files(messages)


class JsonlManifestSink(DataSource):
    """``format("jsonlsink")``: manifest-committed JSONL, batch + stream."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> JsonlBatchWriter:
        return JsonlBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(self.options)


def register_jsonl_sink(spark: SparkSession) -> None:
    """Idempotent registration of the jsonlsink format."""
    spark.dataSource.register(JsonlManifestSink)


def manifested_files(path: str) -> list[str]:
    """Committed data files only — orphans from failed attempts are
    invisible to readers."""
    manifest = _load_manifest(path)
    out: list[str] = []
    for entry in manifest.values():
        out.extend(e["path"] for e in entry)
    return sorted(out)


def read_manifested(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read back ONLY manifest-committed files."""
    files = manifested_files(path)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def vacuum_orphans(path: str, min_age_seconds: float = 3600.0) -> list[str]:
    """Delete data files NOT referenced by the manifest — the debris
    of crashed attempts (task failures after data write, aborted
    batches). Safe by the manifest protocol: readers only ever see
    manifested files, so removing unmanifested ones cannot change any
    result. ``min_age_seconds`` guards the race with an in-flight
    batch whose files are written but not yet committed (default: an
    hour — far beyond any micro-batch). Returns the removed paths."""
    import time

    # compare BASENAMES: part files are uuid-unique, and raw-string
    # path comparison would treat 'out' vs './out' vs an absolute
    # spelling as different files — deleting committed data a relative
    # writer manifested. A missing directory is an empty sink (the
    # same contract as read_manifested), not a crash.
    keep = {os.path.basename(p) for p in manifested_files(path)}
    removed: list[str] = []
    now = time.time()
    try:
        entries = os.listdir(path)
    except OSError:
        return removed
    for fname in entries:
        full = os.path.join(path, fname)
        if not fname.startswith("part-") or fname in keep:
            continue
        try:
            if now - os.path.getmtime(full) >= min_age_seconds:
                os.remove(full)
                removed.append(full)
        except OSError:
            pass
    return sorted(removed)
