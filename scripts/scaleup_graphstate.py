"""Ingest/serve scaling of the incremental graph state
(streaming/graphstate.py): feed the sf events log as N time-ordered
micro-batches, record each batch's edge-maintenance wall, serve
PageRank at checkpoints, compact, serve again — the annindex-style
proof that per-batch cost is flat in stream depth (a batch touches
its own rows + the user frontier, never the accumulated corpus) and
that serving reads edge-relation-sized state.

Usage: python scripts/scaleup_graphstate.py [sf_dir] [n_batches] [factor]
``factor`` > 1 replicates the event log with shifted user_ids (same
graph shape, factor x rows and edge weights) — per-batch walls should
grow sub-linearly (the windowed pass is embarrassingly parallel by
user) and stay flat in depth.  Prints one JSON line; paste into
SCALING.md §16.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from pyspark.sql import SparkSession, functions as F
    from pyspark.sql.window import Window

    from mental_health_bigdata_project_spark.session import configure
    from mental_health_bigdata_project_spark.sources import load_table
    from mental_health_bigdata_project_spark.streaming import graphstate

    spark = configure(SparkSession.builder.master("local[32]")) \
        .appName("scaleup-graphstate").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    if factor > 1:
        shift = (ev.agg(F.max("user_id")).collect()[0][0] or 0) + 1
        eshift = (ev.agg(F.max("event_id")).collect()[0][0] or 0) + 1
        ev = ev.sparkSession.range(factor).crossJoin(ev).select(
            (F.col("user_id") + F.col("id") * shift).alias("user_id"),
            "ts",
            (F.col("event_id") + F.col("id") * eshift).alias("event_id"),
            "event_type")
    n_rows = ev.count()
    # time-ordered slices (the module's ordering contract)
    w = Window.orderBy("ts", "event_id")
    sliced = ev.withColumn("b", F.ntile(n_batches).over(w)) \
        .localCheckpoint(eager=True)

    work = tempfile.mkdtemp(prefix="graphstate_")
    out: dict = {"sf_dir": sf_dir, "n_batches": n_batches,
                 "factor": factor, "event_rows": n_rows,
                 "ingest_sec": [], "serve_sec": {}}
    try:
        for i in range(n_batches):
            part = sliced.filter(F.col("b") == i + 1).drop("b")
            t0 = time.perf_counter()
            graphstate.edges_batch(part, i, work)
            out["ingest_sec"].append(round(time.perf_counter() - t0, 2))
            if i + 1 in (n_batches // 4, n_batches // 2, n_batches):
                t0 = time.perf_counter()
                n = graphstate.read_pagerank(spark, work).count()
                out["serve_sec"][str(i + 1)] = round(
                    time.perf_counter() - t0, 2)
                out.setdefault("served_nodes", n)
        t0 = time.perf_counter()
        graphstate.compact_graph_index(spark, work, through=n_batches - 1)
        out["compact_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        graphstate.read_pagerank(spark, work).count()
        out["serve_post_compact_sec"] = round(time.perf_counter() - t0, 2)
        edges = graphstate.read_edges(spark, work)
        out["distinct_transitions"] = edges.count()
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
