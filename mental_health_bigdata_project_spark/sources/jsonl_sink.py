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
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


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


class JsonlAuditSink(DataSource):
    """``df.write.format("jsonl_audit").option("path", dir).save()``."""

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


def register(spark) -> None:
    spark.dataSource.register(JsonlAuditSink)


def read_manifest(path: str) -> dict:
    """Reader-side completeness check: a directory without a manifest
    was never committed."""
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)
