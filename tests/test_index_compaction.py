"""Compaction of the log-structured streaming indexes
(streaming/compaction.py): served results are identical before and
after compaction, ingestion continues on top of a compacted store,
crash windows leave a consistent view, and the replay guard refuses
compacted batches."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans.retrieval import _BM25_QUERIES
from mental_health_bigdata_project_spark.sources import load_table
from mental_health_bigdata_project_spark.streaming.bm25index import (
    bm25_query, index_batch)
from mental_health_bigdata_project_spark.streaming.compaction import (

    compact_bm25_index, compact_index, load_manifest)

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow


def _rows(df):
    return sorted((r.query_id, r.doc_id, r.rank, r.score)
                  for r in df.collect())


def _build(spark, sf_dir, index_dir, batches):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for b in batches:
        part = docs.filter(F.pmod(F.col("doc_id"), 4) == b)
        index_batch(part, b, index_dir)
    return docs


def test_bm25_results_survive_compaction(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    _build(spark, sf_dir, idx, [0, 1, 2, 3])
    before = _rows(bm25_query(spark, idx, _BM25_QUERIES, k=10))

    compact_bm25_index(spark, idx, through=2)
    after = _rows(bm25_query(spark, idx, _BM25_QUERIES, k=10))
    assert after == before

    # superseded delta partitions are gone; newer ones remain
    left = {os.path.basename(d)
            for d in glob.glob(os.path.join(idx, "postings", "batch_id=*"))}
    assert left == {"batch_id=3"}
    m = load_manifest(os.path.join(idx, "postings"))
    assert m["through"] == 2 and m["dir"] == "_compacted_v1"


def test_ingestion_continues_after_compaction(spark, sf_dir, tmp_path):
    """Index batches 0-2, compact, ingest batch 3 on top — the served
    view must equal an uncompacted index of all four batches."""
    idx, ref = str(tmp_path / "idx"), str(tmp_path / "ref")
    docs = _build(spark, sf_dir, idx, [0, 1, 2])
    compact_bm25_index(spark, idx, through=2)
    index_batch(docs.filter(F.pmod(F.col("doc_id"), 4) == 3), 3, idx)
    _build(spark, sf_dir, ref, [0, 1, 2, 3])
    assert _rows(bm25_query(spark, idx, _BM25_QUERIES, k=10)) \
        == _rows(bm25_query(spark, ref, _BM25_QUERIES, k=10))


def test_recompaction_folds_previous_store(spark, sf_dir, tmp_path):
    idx, ref = str(tmp_path / "idx"), str(tmp_path / "ref")
    docs = _build(spark, sf_dir, idx, [0, 1])
    compact_bm25_index(spark, idx, through=1)
    index_batch(docs.filter(F.pmod(F.col("doc_id"), 4) == 2), 2, idx)
    index_batch(docs.filter(F.pmod(F.col("doc_id"), 4) == 3), 3, idx)
    compact_bm25_index(spark, idx, through=3)

    _build(spark, sf_dir, ref, [0, 1, 2, 3])
    assert _rows(bm25_query(spark, idx, _BM25_QUERIES, k=10)) \
        == _rows(bm25_query(spark, ref, _BM25_QUERIES, k=10))
    # v2 replaced v1, no deltas remain
    p = os.path.join(idx, "postings")
    assert load_manifest(p)["dir"] == "_compacted_v2"
    assert not glob.glob(os.path.join(p, "_compacted_v1"))
    assert not glob.glob(os.path.join(p, "batch_id=*"))


def test_orphan_compacted_dir_is_invisible(spark, sf_dir, tmp_path):
    """Crash after writing the consolidated store but BEFORE the
    manifest commit: readers must ignore the orphan (underscore
    prefix + no manifest), serving from deltas exactly as before."""
    idx = str(tmp_path / "idx")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for b in (0, 1):
        index_batch(docs.filter(F.pmod(F.col("doc_id"), 4) == b), b, idx)
    before = _rows(bm25_query(spark, idx, _BM25_QUERIES, k=10))

    # simulate the crash: write the consolidated dir by hand, no manifest
    p = os.path.join(idx, "postings")
    (spark.read.parquet(p).withColumn("batch_id", F.lit(1).cast("int"))
     .write.partitionBy("bucket").parquet(os.path.join(p, "_compacted_v1")))
    assert load_manifest(p) is None
    assert _rows(bm25_query(spark, idx, _BM25_QUERIES, k=10)) == before


def test_stale_deltas_after_manifest_are_filtered(spark, sf_dir, tmp_path):
    """Crash after the manifest commit but BEFORE garbage collection:
    stale delta partitions (batch_id <= through) coexist with the
    consolidated store and must not double-count."""
    idx = str(tmp_path / "idx")
    _build(spark, sf_dir, idx, [0, 1, 2, 3])
    before = _rows(bm25_query(spark, idx, _BM25_QUERIES, k=10))
    for table in ("postings", "doclen", "stats"):
        p = os.path.join(idx, table)
        pb = ["bucket"] if table == "postings" else None
        # replicate compact_index up to its commit point, skipping GC
        live = spark.read.parquet(p).filter(F.col("batch_id") <= 2)
        w = (live.withColumn("batch_id", F.lit(2).cast("int"))
             .write.mode("overwrite"))
        if pb:
            w = w.partitionBy(*pb)
        w.parquet(os.path.join(p, "_compacted_v1"))
        with open(os.path.join(p, "_compaction.json"), "w") as f:
            json.dump({"version": 1, "dir": "_compacted_v1", "through": 2},
                      f)
        assert glob.glob(os.path.join(p, "batch_id=0"))  # GC never ran
    assert _rows(bm25_query(spark, idx, _BM25_QUERIES, k=10)) == before


def test_replay_below_horizon_refuses(spark, sf_dir, tmp_path):
    """_read_index must raise for a replay at/below the compaction
    horizon instead of silently returning an empty prior view."""
    from mental_health_bigdata_project_spark.streaming.neardup import (
        _read_index)
    idx = str(tmp_path / "idx")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for b in (0, 1, 2):
        index_batch(docs.filter(F.pmod(F.col("doc_id"), 4) == b), b, idx)
    p = os.path.join(idx, "doclen")
    compact_index(spark, p, through=1)
    with pytest.raises(ValueError, match="compaction horizon"):
        _read_index(spark, p, ["doc_id"], before_batch=1)
    # batches above the horizon still read fine
    ok = _read_index(spark, p, ["doc_id"], before_batch=2)
    assert ok is not None and ok.count() > 0


def test_chunkdedup_index_compaction_end_to_end(spark, sf_dir, tmp_path):
    """The chunk-dedup sink keeps producing byte-identical rewrites
    when its fingerprint index is compacted mid-stream."""
    from mental_health_bigdata_project_spark.streaming.chunkdedup import (
        rewrite_batch_against_index)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(out, idxd, compact_after_1):
        for b in (0, 1, 2):
            part = docs.filter(F.pmod(F.col("doc_id"), 3) == b)
            rewrite_batch_against_index(part, b, out, idxd)
            if b == 1 and compact_after_1:
                compact_index(spark,
                              os.path.join(idxd, "chunk_fps"), through=1)
        acc = spark.read.parquet(os.path.join(out, "accepted"))
        return sorted((r.doc_id, r.text, r.n_kept) for r in acc.collect())

    plain = run(str(tmp_path / "o1"), str(tmp_path / "i1"), False)
    compacted = run(str(tmp_path / "o2"), str(tmp_path / "i2"), True)
    assert plain == compacted


def test_vector_index_compaction_end_to_end(spark, sf_dir, tmp_path):
    """The embedding-dedup sink's vector index lands its deltas as
    batch_id=N/bucket=B (fixed bucket count — r10 layout); compaction
    must discover them, keep the bucket partitioning in the
    consolidated store (probe pruning survives), GC the deltas, and
    leave accepted output byte-identical to an uncompacted run."""
    from mental_health_bigdata_project_spark.streaming.compaction import (
        compact_vector_index)
    from mental_health_bigdata_project_spark.streaming.neardup import (
        dedup_embeddings_against_index)
    vecs = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding")

    def run(out, idxd, compact_after_1):
        for b in (0, 1, 2):
            part = vecs.filter(F.pmod(F.col("vec_id"), 3) == b)
            dedup_embeddings_against_index(part, b, out, idxd,
                                           threshold=0.8)
            if b == 1 and compact_after_1:
                compact_vector_index(spark, idxd, through=1)
        acc = spark.read.parquet(os.path.join(out, "accepted"))
        return sorted(r.vec_id for r in acc.collect())

    plain = run(str(tmp_path / "o1"), str(tmp_path / "i1"), False)
    compacted = run(str(tmp_path / "o2"), str(tmp_path / "i2"), True)
    assert plain == compacted and len(plain) > 0

    p = os.path.join(str(tmp_path / "i2"), "vectors")
    # deltas <= 1 are gone, batch 2's remain, store is bucket-partitioned
    assert not glob.glob(os.path.join(p, "batch_id=0"))
    assert not glob.glob(os.path.join(p, "batch_id=1"))
    assert glob.glob(os.path.join(p, "batch_id=2", "bucket=*"))
    assert glob.glob(os.path.join(p, "_compacted_v1", "bucket=*"))
    assert load_manifest(p)["through"] == 1


def test_vector_index_legacy_cell_layout_stays_legacy(spark, tmp_path):
    """A vector store written under the pre-r10 (cell, batch_id)
    layout keeps working: batches read it (bucket derived from cell),
    keep writing legacy-layout deltas (mixed partition-column lists
    would break the root read), and compaction keeps the cell
    partitioning."""
    from pyspark.sql import functions as SF

    from mental_health_bigdata_project_spark.plans.similarity import (
        embedding_cell_expr)
    from mental_health_bigdata_project_spark.streaming.compaction import (
        compact_vector_index)
    from mental_health_bigdata_project_spark.streaming.neardup import (
        dedup_embeddings_against_index)

    va = [1.0, 0.5, -0.2, 0.8, -0.1, 0.3, 0.9, -0.4]
    vnear = [x * 1.01 for x in va]
    vfresh = [0.2, -0.9, 0.6, 0.1, -0.3, 0.7, -0.8, 0.5]

    def df(rows):
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>")

    out = str(tmp_path / "out")
    idxd = str(tmp_path / "idx")
    p = os.path.join(idxd, "vectors")
    # hand-write batch 0's delta in the LEGACY layout
    (df([(1, va)])
     .select(embedding_cell_expr("embedding").alias("cell"),
             SF.col("embedding").cast("array<double>").alias("_iemb"))
     .withColumn("batch_id", SF.lit(0))
     .write.partitionBy("cell", "batch_id").parquet(p))

    # batch 1 against the legacy store: near-copy dropped, fresh kept
    dedup_embeddings_against_index(df([(2, vnear), (3, vfresh)]),
                                   1, out, idxd)
    acc = {r.vec_id for r in
           spark.read.parquet(os.path.join(out, "accepted")).collect()}
    assert acc == {3}
    # the new delta landed in the LEGACY layout, and compaction keeps it
    assert glob.glob(os.path.join(p, "cell=*", "batch_id=1"))
    assert not glob.glob(os.path.join(p, "batch_id=*"))
    compact_vector_index(spark, idxd, through=1)
    assert glob.glob(os.path.join(p, "_compacted_v1", "cell=*"))
    # and a batch after compaction still reads/writes correctly
    dedup_embeddings_against_index(df([(4, vnear), (5, [-x for x in va])]),
                                   2, out, idxd)
    acc = {r.vec_id for r in
           spark.read.parquet(os.path.join(out, "accepted")).collect()}
    assert acc == {3, 5}


def test_horizon_must_name_an_existing_batch(spark, sf_dir, tmp_path):
    """A horizon above the newest live batch would hide later-written
    smaller-id deltas (read_live keeps only batch_id > through); one
    below the oldest would write an empty schema-less snapshot.  Both
    refuse."""
    idx = str(tmp_path / "idx")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for b in (2, 3):
        index_batch(docs.filter(F.pmod(F.col("doc_id"), 4) == b), b, idx)
    p = os.path.join(idx, "doclen")
    with pytest.raises(ValueError, match="exceeds newest live batch"):
        compact_index(spark, p, through=7)
    with pytest.raises(ValueError, match="no batch at or below"):
        compact_index(spark, p, through=1)
    with pytest.raises(ValueError, match="no batches to compact"):
        compact_index(spark, str(tmp_path / "doesnotexist"), through=1)
    # the newest live batch itself is a valid horizon
    compact_index(spark, p, through=3)
    assert load_manifest(p)["through"] == 3
