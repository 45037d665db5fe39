"""transformWithStateInPandas top-k (streaming/topktws.py): parity
with the parquet-delta foreachBatch twin (topkstate) in the exact
regime, per-entry TTL expiry, and idle-group timer eviction."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans.textops import tokens_col
from mental_health_bigdata_project_spark.sources import load_table
from mental_health_bigdata_project_spark.streaming import topkstate
from mental_health_bigdata_project_spark.streaming.stateful import (
    transform_with_state_available)
from mental_health_bigdata_project_spark.streaming.topktws import (

    EVICTED_ITEM, topk_tokens_tws)

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow

BIG_K = 50_000   # >= any test-corpus vocabulary: both sides emit ALL
#                  items with exact counts, so parity is order-free


def _require_tws():
    if not transform_with_state_available():
        pytest.skip("google.protobuf not installed; "
                    "transformWithStateInPandas unavailable in this env")


@pytest.fixture
def rocksdb(spark):
    confs = {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        # under timeMode=ProcessingTime an availableNow drain otherwise
        # schedules ~100 EMPTY no-data micro-batches after input
        # exhaustion, each paying the full per-partition store commit
        # (the SCALING.md §15 finding) — expired timers still fire on
        # data-carrying batches, which is all these tests need
        "spark.sql.streaming.noDataMicroBatches.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _drain(spark, src, ckpt, name, **tws_kwargs):
    stream = spark.readStream.schema("source string, token string") \
        .parquet(src)
    q = (topk_tokens_tws(stream, **tws_kwargs)
         .writeStream.outputMode("update")
         .format("memory").queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)


def _drain_fb(spark, src, ckpt, out, **tws_kwargs):
    """Multi-drain variant: the memory sink refuses checkpoint
    recovery, so restartable tests append each batch's emissions to
    parquet via foreachBatch instead."""
    stream = spark.readStream.schema("source string, token string") \
        .parquet(src)

    def sink(bdf, bid):
        bdf.write.mode("append").parquet(out)

    q = (topk_tokens_tws(stream, **tws_kwargs)
         .writeStream.outputMode("update")
         .foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)


def test_tws_topk_matches_foreachbatch_twin(spark, sf_dir, tmp_path,
                                            rocksdb):
    """Exact-regime parity between the two streaming-state
    architectures: the state-store operator's emitted counts equal the
    parquet-delta sketch twin's served counts, item-for-item."""
    _require_tws()
    tokens = (load_table(spark, sf_dir, "documents")
              .select("source", F.explode(tokens_col()).alias("token")))
    src = str(tmp_path / "tokens_src")
    tokens.write.parquet(src)

    _drain(spark, src, str(tmp_path / "ckpt"), "tws_topk_out", k=BIG_K)
    got = {(r.source, r.item): r.n
           for r in spark.sql("SELECT * FROM tws_topk_out").collect()}

    idx = str(tmp_path / "idx")
    topkstate.accumulate_batch(tokens, 0, idx)
    twin = {(r.source, r.item): r.n
            for r in topkstate.read_topk(spark, idx, BIG_K,
                                         overall=False).collect()}
    assert got == twin
    # and both equal the exact batch aggregate (ground truth)
    exact = {(r.source, r.token): r.n
             for r in tokens.groupBy("source", "token")
             .agg(F.count("*").alias("n")).collect()}
    assert got == exact


def test_tws_topk_entry_ttl_expires_counts(spark, tmp_path, rocksdb):
    """A (token -> count) entry older than ttl_ms is gone: the second
    drain's count restarts at 1 instead of accumulating to 2."""
    _require_tws()
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.createDataFrame([("b", "x")], "source string, token string") \
        .write.mode("append").parquet(src)
    _drain_fb(spark, src, ckpt, out, k=5, ttl_ms=100)
    time.sleep(1.5)
    spark.createDataFrame([("b", "x")], "source string, token string") \
        .write.mode("append").parquet(src)
    _drain_fb(spark, src, ckpt, out, k=5, ttl_ms=100)
    emits = [(r.item, r.n) for r in spark.read.parquet(out)
             .filter("source = 'b'").collect()]
    assert emits.count(("x", 1)) == 2   # both drains saw a fresh count
    assert ("x", 2) not in emits


def test_tws_topk_idle_timer_evicts_group(spark, tmp_path, rocksdb):
    """A group idle past idle_timer_ms is evicted by its timer: the
    tombstone row is emitted, and the group's counts restart when it
    reappears."""
    _require_tws()
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def feed(rows):
        spark.createDataFrame(rows, "source string, token string") \
            .write.mode("append").parquet(src)

    kw = dict(k=5, idle_timer_ms=100)
    feed([("a", "x"), ("b", "y")])
    _drain_fb(spark, src, ckpt, out, **kw)
    time.sleep(1.5)
    feed([("a", "x")])                      # b idle -> timer fires
    _drain_fb(spark, src, ckpt, out, **kw)
    rows = spark.read.parquet(out).collect()
    assert any(r.source == "b" and r.item == EVICTED_ITEM and r.rnk == 0
               for r in rows)
    feed([("b", "y")])                      # b returns: counts restart
    _drain_fb(spark, src, ckpt, out, **kw)
    b_counts = [r.n for r in spark.read.parquet(out)
                .filter(f"source = 'b' AND item <> '{EVICTED_ITEM}'")
                .collect()]
    assert sorted(b_counts) == [1, 1]       # never accumulated to 2
