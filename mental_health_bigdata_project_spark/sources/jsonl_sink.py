"""JSON-lines sink as a Spark 4 Python Data Source *writer* — the
engine-native replacement for the reference's JSON-file sink
(spark_jobs/kafka_consumer_simple.py:49-61,146), which rewrote one
global JSON array from the driver after every message.

Here each task streams its partition to its own ``part-*.jsonl`` file
(no driver funnel, no rewrite amplification), and the Data Source
writer API's two-phase commit makes the output transactional:

- ``write`` (executor): write to a ``.tmp`` file, atomically rename,
  return a :class:`WriterCommitMessage` carrying path + row count.
- ``commit`` (driver): runs only if EVERY task succeeded; writes a
  ``_MANIFEST.json`` recording the committed files and total rows —
  readers treat manifest-less directories as uncommitted garbage.
- ``abort`` (driver): on any task failure, removes the partial files
  listed in the surviving messages.

This completes the connector API story next to the batch/streaming
*reader* in sources/restpoll.py: the engine can both ingest from and
publish to systems Spark has no built-in connector for, with the same
task-parallel + transactional discipline as built-in sinks.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


def _epoch_manifest(batch_id: int) -> str:
    return f"_EPOCH-{batch_id:010d}.json"


@dataclass
class PartitionCommit(WriterCommitMessage):
    path: str
    count: int


class JsonlAuditWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        n = 0
        with open(out + ".tmp", "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        os.rename(out + ".tmp", out)  # atomic publish of this partition
        return PartitionCommit(path=out, count=n)

    def commit(self, messages):
        manifest = {
            "files": [{"path": m.path, "rows": m.count} for m in messages],
            "total_rows": sum(m.count for m in messages),
        }
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlAuditStreamWriter(DataSourceStreamWriter):
    """Per-epoch twin of the batch writer. File names are a pure function
    of ``(batchId, partitionId)``, so a replayed epoch (restart between
    task success and epoch commit) OVERWRITES its own files instead of
    duplicating rows — idempotent replay is what turns Structured
    Streaming's at-least-once task execution into exactly-once output,
    the same discipline built-in file sinks get from their _spark_metadata
    log. An epoch is visible to readers only once its ``_EPOCH-*.json``
    manifest exists."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        batch_id = ctx.getLocalProperty("streaming.sql.batchId")
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"epoch-{batch_id}-part-{pid:05d}.jsonl")
        n = 0
        with open(out + ".tmp", "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        os.rename(out + ".tmp", out)
        return PartitionCommit(path=out, count=n)

    def commit(self, messages, batchId: int) -> None:
        manifest = {
            "batch_id": batchId,
            "files": [{"path": m.path, "rows": m.count} for m in messages],
            "total_rows": sum(m.count for m in messages),
        }
        with open(os.path.join(self.path, _epoch_manifest(batchId)), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlAuditSink(DataSource):
    """``df.write.format("jsonl_audit").option("path", dir).save()`` and
    ``df.writeStream.format("jsonl_audit")`` (per-epoch manifests)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool):
        if overwrite:
            path = self.options["path"]
            if os.path.isdir(path):
                for f in os.listdir(path):
                    if f.endswith(".jsonl") or f == MANIFEST:
                        os.remove(os.path.join(path, f))
        return JsonlAuditWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return JsonlAuditStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonlAuditSink)


def read_manifest(path: str) -> dict:
    """Reader-side completeness check: a directory without a manifest
    was never committed."""
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def read_epoch_manifests(path: str) -> list[dict]:
    """All committed epochs, in batch order. Files not covered by any
    epoch manifest belong to uncommitted (in-flight or aborted) epochs
    and must be ignored by readers."""
    out = []
    for f in sorted(os.listdir(path)):
        if f.startswith("_EPOCH-") and f.endswith(".json"):
            with open(os.path.join(path, f)) as fh:
                out.append(json.load(fh))
    return out


def committed_files(path: str) -> list[str]:
    """Union of every committed manifest's file list (batch + epochs)."""
    files: list[str] = []
    if os.path.exists(os.path.join(path, MANIFEST)):
        files += [f["path"] for f in read_manifest(path)["files"]]
    for epoch in read_epoch_manifests(path):
        files += [f["path"] for f in epoch["files"]]
    return files


def read_committed(spark, path: str):
    """Manifest-gated scan: reads ONLY files some commit published, so
    in-flight or crashed-writer output is invisible to queries — the
    reader half of the sink's transactional contract (same idea as a
    table format's snapshot read).  Raises if nothing was ever
    committed rather than silently returning garbage."""
    files = committed_files(path)
    if not files:
        raise FileNotFoundError(f"no committed manifest under {path}")
    return spark.read.json(files)


def vacuum_uncommitted(path: str) -> list[str]:
    """Remove data files no manifest claims (crashed epochs, aborted
    tasks' leftovers, stray .tmp) — the maintenance pass that keeps a
    long-lived sink directory equal to its committed state.  Returns
    the removed paths.  Never touches manifest files themselves."""
    keep = {os.path.basename(p) for p in committed_files(path)}
    removed = []
    for f in sorted(os.listdir(path)):
        if (f.endswith(".jsonl") or f.endswith(".tmp")) and f not in keep:
            os.remove(os.path.join(path, f))
            removed.append(f)
    return removed
