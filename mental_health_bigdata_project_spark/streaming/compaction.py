"""Offline compaction for the log-structured streaming indexes.

Every incremental sink in this package (chunk/span/near dedup, the
BM25 index) appends per-batch delta partitions ``batch_id=N`` forever;
probes stay hash joins, but at 100 TB the file count grows without
bound and the batch-pruning reads touch ever more partitions.  This
module is the promised maintenance path (SCALING.md §7): rewrite all
deltas through batch N into one consolidated store, atomically.

Snapshot layout (inside each table directory):

- ``batch_id=*/``          live delta partitions (written by the sinks;
                           the vector index nests them one level down
                           as ``cell=X/batch_id=N`` — discovery and GC
                           handle both layouts)
- ``_compacted_v{k}/``     consolidated rows for every batch <= through,
                           carrying a literal ``batch_id = through``
                           column; the underscore prefix makes Spark's
                           file index IGNORE these dirs, so the sinks'
                           plain ``read.parquet(table)`` delta reads
                           never double-count them
- ``_compaction.json``     the manifest: {"version": k, "dir":
                           "_compacted_v{k}", "through": N}; written
                           via tmp-file + os.replace (atomic on POSIX)

Readers (``neardup._read_index``, ``bm25index.bm25_query``) resolve
the live view as ``compacted ∪ deltas(batch_id > through)``.  Crash
safety falls out of the ordering: a crash after writing the compacted
dir but before the manifest leaves an orphan dir readers ignore; a
crash after the manifest but before garbage collection leaves stale
delta partitions readers filter out (batch_id <= through).  No state
is ever readable twice.

CONTRACT: only compact through batches the streaming checkpoint has
fully committed.  A compacted batch can no longer replay (its delta
partition is gone and its rows carry ``batch_id = through``), so
``_read_index`` refuses ``before_batch <= through`` loudly rather
than silently treating a replayed batch's own data as prior state.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, functions as F


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, "_compaction.json")


def _batch_dirs(table_path: str) -> list[str]:
    """Every ``batch_id=*`` partition directory of the table — at the
    root (chunk/span/BM25 layout) or nested one level below another
    partition column (the near-dup vector index is partitioned by
    ``(cell, batch_id)``, so its batch dirs live at
    ``cell=X/batch_id=N``).  Underscore-prefixed dirs (compacted
    stores) never match ``*=*`` and are skipped."""
    dirs = glob.glob(os.path.join(table_path, "batch_id=*"))
    for parent in glob.glob(os.path.join(table_path, "*=*")):
        if os.path.basename(parent).startswith("batch_id="):
            continue
        dirs.extend(glob.glob(os.path.join(parent, "batch_id=*")))
    return dirs


def _batch_id_of(d: str) -> int | None:
    try:
        return int(os.path.basename(d).split("=", 1)[1])
    except ValueError:
        return None


def load_manifest(table_path: str) -> dict | None:
    p = _manifest_path(table_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _read_deltas(spark, table_path: str, after_batch: int):
    """Delta partitions with batch_id > after_batch, or None when every
    delta partition has been garbage-collected (the table dir then
    holds only underscore-prefixed entries Spark cannot infer a schema
    from)."""
    from pyspark.errors import AnalysisException
    try:
        df = spark.read.parquet(table_path)
    except AnalysisException as e:
        msg = str(e)
        if "UNABLE_TO_INFER_SCHEMA" in msg or "Path does not exist" in msg \
                or "PATH_NOT_FOUND" in msg:
            return None
        raise
    return df.filter(F.col("batch_id") > F.lit(after_batch))


def read_live(spark, table_path: str,
              allow_missing_delta_columns: bool = False) -> DataFrame:
    """The manifest-aware live view of a delta-indexed table: the
    consolidated store (if any) unioned with the delta partitions it
    does not cover.  Without a manifest this is exactly
    ``spark.read.parquet(table_path)``.

    ``allow_missing_delta_columns`` reconciles a LAYOUT-DRIFTED store
    (deltas missing columns the consolidated store has, e.g. a
    half-migrated pre-bucketed setsim prefix index) by union-by-name
    with NULL backfill.  Off by default: an ordinary reader handed
    silent NULLs in a partition-pruning column would drop rows — only
    a caller that REPAIRS the missing columns afterwards (a
    ``compact_index`` transform recomputing them from content) may
    turn it on."""
    m = load_manifest(table_path)
    if m is None:
        return spark.read.parquet(table_path)
    comp = spark.read.parquet(os.path.join(table_path, m["dir"]))
    deltas = _read_deltas(spark, table_path, m["through"])
    if deltas is None:
        return comp
    if allow_missing_delta_columns:
        return comp.unionByName(deltas, allowMissingColumns=True)
    return comp.unionByName(deltas.select(*comp.columns))


def compact_index(spark, table_path: str, through: int,
                  partition_by: list[str] | None = None,
                  transform=None,
                  reconcile_schema: bool = False,
                  transform_keeps_batch: bool = False,
                  manifest_extra: dict | None = None) -> dict:
    """Consolidate every live row with batch_id <= ``through`` into a
    new ``_compacted_v{k}`` store, commit the manifest, then garbage-
    collect superseded delta partitions and older compacted versions.

    ``partition_by`` preserves intra-store partition pruning (e.g.
    ``["bucket"]`` for BM25 postings).  ``transform`` (DataFrame ->
    DataFrame, optional) folds the consolidated rows before writing —
    for MERGEABLE state like HLL registers, where deltas collapse by
    an associative combine (per-register max) instead of being
    preserved row-for-row; it must not depend on ``batch_id`` (the
    column is rewritten to ``through`` afterwards).
    ``transform_keeps_batch`` hands the transform the rows WITH their
    ``batch_id`` — for transforms whose row filter compares ingest
    position against external state (tombstone application needs
    "row batch <= tombstone horizon"); the output's batch_id is still
    rewritten to ``through``.  Re-compaction is
    supported: the previous compacted store (batch_id = old through <=
    new through) folds into the new one.  ``reconcile_schema`` reads
    the live view with NULL backfill for delta-missing columns (see
    ``read_live``) — pass it ONLY together with a ``transform`` that
    recomputes those columns from content, or the NULLs land in the
    consolidated store.  ``manifest_extra`` merges caller-owned keys
    into the committed manifest ATOMICALLY with the store flip (the
    setsim epoch pointer rides this: the prefix store's element order
    and the pointer to that order must never be readable separately).
    Returns the new manifest."""
    m = load_manifest(table_path)
    if m is not None and through < m["through"]:
        raise ValueError(
            f"through={through} precedes existing compaction horizon "
            f"{m['through']}")
    # the horizon must name an EXISTING batch: a horizon above the
    # newest live batch would make read_live skip deltas written later
    # with smaller ids (silent data loss), and a horizon below the
    # oldest would write an empty, schema-less snapshot that breaks
    # every subsequent read
    live_bids = []
    for d in _batch_dirs(table_path):
        bid = _batch_id_of(d)
        if bid is not None:
            live_bids.append(bid)
    if m is not None:
        live_bids.append(m["through"])
    if not live_bids:
        raise ValueError(f"{table_path} has no batches to compact")
    if through > max(live_bids):
        raise ValueError(
            f"through={through} exceeds newest live batch "
            f"{max(live_bids)}; later deltas would become invisible")
    if not any(b <= through for b in live_bids):
        raise ValueError(
            f"no batch at or below through={through} in {table_path}")
    version = (m["version"] + 1) if m else 1
    dest_name = f"_compacted_v{version}"

    live = read_live(
        spark, table_path,
        allow_missing_delta_columns=reconcile_schema).filter(
        F.col("batch_id") <= F.lit(through))
    if transform is not None:
        live = transform(live if transform_keeps_batch
                         else live.drop("batch_id"))
        if transform_keeps_batch and "batch_id" in live.columns:
            live = live.drop("batch_id")
    consolidated = live.withColumn("batch_id",
                                   F.lit(int(through)).cast("int"))
    if partition_by:
        # hash-cluster rows by the partition columns so each partition
        # value is written by exactly ONE task — without this, every
        # shuffle task holding rows of a dir writes its own file there
        # and the consolidated store keeps ~task-count files per dir
        # (measured: 514 -> 64 postings files at 48 batches).  A huge
        # single file per value is bounded by
        # spark.sql.files.maxRecordsPerFile if set.
        consolidated = consolidated.repartition(*partition_by)
    writer = consolidated.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(table_path, dest_name))

    manifest = {"version": version, "dir": dest_name, "through": through}
    if manifest_extra:
        manifest.update(manifest_extra)
    tmp = _manifest_path(table_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(table_path))  # the commit point

    # garbage collection — everything after the commit point is
    # invisible to readers already, so a crash here only leaves litter
    for d in _batch_dirs(table_path):
        bid = _batch_id_of(d)
        if bid is not None and bid <= through:
            shutil.rmtree(d, ignore_errors=True)
            parent = os.path.dirname(d)
            # a (cell, batch_id) layout can leave an empty cell=X shell
            # behind; drop it so partition discovery stays clean
            if (os.path.normpath(parent) != os.path.normpath(table_path)
                    and not os.listdir(parent)):
                shutil.rmtree(parent, ignore_errors=True)
    for d in glob.glob(os.path.join(table_path, "_compacted_v*")):
        if os.path.basename(d) != dest_name:
            shutil.rmtree(d, ignore_errors=True)
    return manifest


def compact_vector_index(spark, index_dir: str, through: int) -> dict:
    """Compact the streaming embedding-dedup vector index
    (``neardup.dedup_embeddings_against_index``'s ``vectors`` table).

    r10 stores are partitioned ``(batch_id, bucket)`` (fixed dir count
    — see ``neardup._vec_bucket``) and keep the ``bucket``
    partitioning through compaction so probe pruning survives.  A
    LEGACY ``(cell, batch_id)`` store stays cell-partitioned — a store
    NEVER changes layout (live deltas keep landing in the old layout,
    and a bucketed compacted dir beside cell-partitioned deltas would
    make every union read fail on the missing column, the half-
    migrated poison pill the setsim shim exists for; migrating a
    legacy vector store means rebuilding it).  Superseded nested
    ``cell=X/batch_id=N`` dirs and any emptied ``cell=X`` shells are
    garbage-collected."""
    path = os.path.join(index_dir, "vectors")
    legacy = bool(glob.glob(os.path.join(path, "cell=*"))
                  or glob.glob(os.path.join(path, "_compacted_v*",
                                            "cell=*")))
    return compact_index(spark, path, through,
                         partition_by=["cell"] if legacy else ["bucket"])


def compact_bm25_index(spark, index_dir: str, through: int,
                       through_deletes: int | None = None) -> dict:
    """Compact all three BM25 index tables; postings keep their bucket
    partitioning so probe-side partition pruning survives compaction.
    Tombstoned docs (bm25index.delete_docs_batch) are PHYSICALLY
    purged from postings/doclen; the stats/stats_neg partials keep
    cancelling after their independent sum-folds.  ``through_deletes``
    additionally compacts the delete-stream tables (their own batch
    counter).

    Purging with ALL tombstones — including delete batches the delete
    stream's checkpoint has not committed yet — is safe because
    ``delete_docs_batch`` short-circuits a replay whose own tombstone
    partition is committed: the replay can no longer recompute (and
    zero out) its stats_neg partial against the purged doclen."""
    from pyspark.sql import functions as F

    from .bm25index import _read_tombs

    tombs = _read_tombs(spark, index_dir)
    if tombs is not None:
        tombs = tombs.localCheckpoint(eager=True)  # pre-GC snapshot

    def purge(live):
        return (live if tombs is None
                else live.join(tombs, "doc_id", "left_anti"))

    out = {
        "postings": compact_index(spark,
                                  os.path.join(index_dir, "postings"),
                                  through, partition_by=["bucket"],
                                  transform=purge),
        "doclen": compact_index(spark, os.path.join(index_dir, "doclen"),
                                through, transform=purge),
        "stats": compact_index(
            spark, os.path.join(index_dir, "stats"), through,
            transform=lambda live: live.agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("sum_dl").cast("decimal(18,0)").alias("sum_dl"))),
    }
    if through_deletes is not None and tombs is not None:
        out["tombs"] = compact_index(
            spark, os.path.join(index_dir, "tombs"), through_deletes,
            transform=lambda live: live.distinct())
        neg_path = os.path.join(index_dir, "stats_neg")
        if os.path.isdir(neg_path):
            out["stats_neg"] = compact_index(
                spark, neg_path, through_deletes,
                transform=lambda live: live.agg(
                    F.sum("n_docs").cast("bigint").alias("n_docs"),
                    F.sum("sum_dl").cast("decimal(18,0)")
                    .alias("sum_dl")))
    return out
