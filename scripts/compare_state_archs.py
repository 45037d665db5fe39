"""State-store vs parquet-delta maintenance cost for the SAME top-k
semantics (VERDICT r6 item 3's comparison note): the engine now
implements frequent-items twice — ``streaming/topkstate.py``
(foreachBatch -> mergeable sketch deltas in parquet) and
``streaming/topktws.py`` (transformWithStateInPandas -> per-token
counts in the RocksDB state store).  This harness feeds the SAME
N-batch token stream through both and reports, per architecture:

- maintenance wall (drain of all batches) and rows/s,
- serve wall (parquet-delta pays a combine at read; state-store emits
  results inline, so serve ~ 0),
- on-disk state bytes (parquet index vs RocksDB checkpoint).

Usage: python scripts/compare_state_archs.py [sf_dir] [n_batches]
Prints one JSON line; paste into SCALING.md §15.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def _du(path: str) -> int:
    total = 0
    for dirpath, _, names in os.walk(path):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(dirpath, n))
            except OSError:
                pass
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import SparkSession, functions as F

    from mental_health_bigdata_project_spark.plans.textops import tokens_col
    from mental_health_bigdata_project_spark.session import configure
    from mental_health_bigdata_project_spark.sources import load_table
    from mental_health_bigdata_project_spark.streaming import topkstate
    from mental_health_bigdata_project_spark.streaming.topktws import (
        topk_tokens_tws)

    spark = configure(SparkSession.builder.master("local[32]")) \
        .appName("compare-state-archs").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")

    tokens = (load_table(spark, sf_dir, "documents")
              .select("doc_id", "source",
                      F.explode(tokens_col()).alias("token"))
              .localCheckpoint(eager=True))
    n_rows = tokens.count()
    work = tempfile.mkdtemp(prefix="state_archs_")
    out: dict = {"sf_dir": sf_dir, "n_batches": n_batches,
                 "token_rows": n_rows}
    try:
        # ---- parquet-delta (foreachBatch + sketch deltas) ----------
        idx = os.path.join(work, "idx")
        t0 = time.perf_counter()
        for b in range(n_batches):
            topkstate.accumulate_batch(
                tokens.filter(F.pmod("doc_id", F.lit(n_batches)) == b)
                .select("source", "token"), b, idx)
        maint = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_served = topkstate.read_topk(spark, idx, 20,
                                       overall=False).count()
        serve = time.perf_counter() - t0
        out["parquet_delta"] = {
            "maintain_sec": round(maint, 2),
            "rows_per_sec": round(n_rows / maint),
            "serve_sec": round(serve, 2),
            "state_bytes": _du(idx),
            "served_rows": n_served,
        }

        # ---- state-store (transformWithStateInPandas) --------------
        # Two bounded, fully-terminating drains instead of an N-batch
        # stream: (a) the whole corpus as ONE batch (bulk per-row
        # cost), (b) a 1-row batch against the same checkpoint (the
        # per-batch FIXED cost: 32 state-store partitions initialize,
        # snapshot and commit regardless of input size — locally the
        # dominant term, and the honest contrast with the parquet
        # path's blind delta append).
        src = os.path.join(work, "src")
        tokens.select("source", "token").coalesce(1) \
            .write.mode("append").parquet(src)
        ckpt = os.path.join(work, "ckpt")

        tws_out = os.path.join(work, "tws_out")

        def drain() -> float:
            # foreachBatch parquet sink: the memory sink refuses
            # checkpoint recovery, and the tiny second drain must
            # resume the same state store
            stream = (spark.readStream
                      .schema("source string, token string").parquet(src))
            t0 = time.perf_counter()
            q = (topk_tokens_tws(stream, k=20)
                 .writeStream.outputMode("update")
                 .foreachBatch(lambda bdf, bid:
                               bdf.write.mode("append").parquet(tws_out))
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .start())
            if not q.awaitTermination(3600):   # never report truncated
                q.stop()
                raise RuntimeError("tws drain exceeded 3600s")
            return time.perf_counter() - t0

        bulk = drain()
        spark.createDataFrame([("tick", "x")],
                              "source string, token string") \
            .coalesce(1).write.mode("append").parquet(src)
        tiny = drain()
        emitted = spark.read.parquet(tws_out).count()
        out["state_store_tws"] = {
            "bulk_batch_sec": round(bulk, 2),
            "rows_per_sec": round(n_rows / bulk),
            "fixed_batch_sec": round(tiny, 2),
            "serve_sec": 0.0,   # results emitted inline per batch
            "state_bytes": _du(os.path.join(ckpt, "state")),
            "emitted_rows": emitted,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
