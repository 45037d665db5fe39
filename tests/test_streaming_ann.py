"""Incremental ANN (IVFADC) index: the streamed index serves the SAME
search results as the batch sim_ivfpq_topk over the ingested union
(hash-level: every distance value equal), replay is content-identical,
and compaction is cell-aware (codes store partitioned by cell, partial
tables folded to one row per key) while preserving answers."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.sources import load_table
from mental_health_bigdata_project_spark.streaming.annindex import (
    compact_ann_index, index_batch, run_incremental_ann, search_topk)

N_BATCHES = 4


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")


def _feed(spark, sf_dir, index_dir):
    e = _emb(spark, sf_dir)
    for b in range(N_BATCHES):
        index_batch(e.filter(F.pmod("vec_id", F.lit(N_BATCHES)) == b),
                    b, index_dir)
    return e


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_index_matches_batch_search(spark, sf_dir, tmp_path):
    index_dir = str(tmp_path / "ann")
    _feed(spark, sf_dir, index_dir)
    served = _rows(search_topk(spark, index_dir))
    batch = _rows(QUERIES["sim_ivfpq_topk"](spark, sf_dir))
    assert served == batch  # value-identical, not just same ids


def test_replay_is_content_identical(spark, sf_dir, tmp_path):
    index_dir = str(tmp_path / "ann")
    e = _feed(spark, sf_dir, index_dir)
    before = _rows(search_topk(spark, index_dir))
    index_batch(  # crash-retry of batch 2
        e.filter(F.pmod("vec_id", F.lit(N_BATCHES)) == 2), 2, index_dir)
    assert _rows(search_topk(spark, index_dir)) == before


def test_compaction_cell_partitioned_and_answer_preserving(
        spark, sf_dir, tmp_path):
    index_dir = str(tmp_path / "ann")
    _feed(spark, sf_dir, index_dir)
    before = _rows(search_topk(spark, index_dir))
    compact_ann_index(spark, index_dir, through=N_BATCHES - 1)
    assert _rows(search_topk(spark, index_dir)) == before
    codes = os.path.join(index_dir, "codes")
    # delta log gone; consolidated store is partitioned by cell so a
    # probe reads nprobe/k of it partition-pruned
    assert not glob.glob(f"{codes}/batch_id=*/*.parquet")
    cdirs = glob.glob(f"{codes}/_compacted_v*/cell=*")
    assert cdirs, "codes store must be cell-partitioned"
    # partial tables folded to one row per key
    cbook = spark.read.parquet(
        glob.glob(os.path.join(index_dir, "cbook", "_compacted_v*"))[0])
    assert (cbook.groupBy("sub", "code", "j").count()
            .filter("count > 1").count() == 0)


def test_available_now_runner(spark, sf_dir, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    e = _emb(spark, sf_dir)
    for half in (0, 1):
        (e.filter(F.pmod("vec_id", F.lit(2)) == half)
         .write.mode("overwrite")
         .parquet(str(in_dir / f"half={half}")))
    stream = (spark.readStream.schema(e.schema)
              .option("maxFilesPerTrigger", 100)
              .parquet(str(in_dir) + "/half=*"))
    index_dir = str(tmp_path / "ann")
    q = run_incremental_ann(stream, str(tmp_path / "ckpt"), index_dir)
    q.awaitTermination(180)
    served = _rows(search_topk(spark, index_dir))
    batch = _rows(QUERIES["sim_ivfpq_topk"](spark, sf_dir))
    assert served == batch
