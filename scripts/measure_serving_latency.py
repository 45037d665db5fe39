"""End-to-end serving latency: event written -> /api/stats payload
VISIBLE (VERDICT r7 item 4).

The reference's implicit envelope is a 10 s processing trigger plus a
5 s dashboard poll (preprocessing_streaming.py:169, dashboard.html:199)
— worst case ~15 s from event to visible number, and every poll
re-reads and re-aggregates the whole retained file (dashboard/
app.py:16-28).  Here the stats fold incrementally (streaming/
serving.py): per batch one #groups-sized merge + a tiny state swap,
so the trigger interval can drop to 1 s and the serve read is
O(#groups) at any corpus size.

Method: a writer thread emits one small JSONL file every ``emit_ms``
with each record carrying its wall-clock emit time; the stream runs a
processingTime trigger; the foreachBatch sink folds the partials into
the state parquet (the real serving.merge_stats path) and, AFTER the
swap — the moment a dashboard read would see the new numbers — stamps
every record in the batch with the visibility time.  Latency per
event = visible - emit; p50/p99 over all events.  A dashboard polling
at interval P adds uniform(0, P) on top — reported separately rather
than baked in, since the poll cadence is the consumer's choice.

Usage: python scripts/measure_serving_latency.py [seconds] [trigger_s]
Prints one JSON line; paste into SCALING.md §18.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    run_s = int(sys.argv[1]) if len(sys.argv) > 1 else 45
    trigger_s = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    emit_ms = 200

    from pyspark.sql import SparkSession

    from mental_health_bigdata_project_spark.session import configure
    from mental_health_bigdata_project_spark.streaming import serving

    spark = configure(SparkSession.builder.master("local[8]")) \
        .appName("serving-latency").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="servlat_")
    in_dir = os.path.join(work, "in")
    state_dir = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)

    stop = threading.Event()
    n_emitted = {"n": 0}

    def writer() -> None:
        i = 0
        subs = ["depression", "anxiety", "mentalhealth", "suicidewatch"]
        while not stop.is_set():
            rec = {"post_id": i, "subreddit": subs[i % 4],
                   "risk_score": (i * 7) % 45,
                   "emit_ns": time.time_ns()}
            tmp = os.path.join(in_dir, f".{i}.jsonl.tmp")
            with open(tmp, "w") as f:
                f.write(json.dumps(rec) + "\n")
            os.replace(tmp, os.path.join(in_dir, f"{i}.jsonl"))
            n_emitted["n"] = i = i + 1
            time.sleep(emit_ms / 1000.0)

    latencies: list[tuple[float, int]] = []   # (latency_s, emit_ns)

    def sink(batch_df, batch_id: int) -> None:
        rows = batch_df.collect()          # micro-batch: handful of rows
        if not rows:
            return
        partial = serving.batch_partial_stats(batch_df)
        try:
            existing = batch_df.sparkSession.read.parquet(
                f"{state_dir}/stats")
        except Exception:
            existing = None
        merged = serving.merge_stats(existing, partial).coalesce(1)
        merged.write.mode("overwrite").parquet(f"{state_dir}/stats_new")
        batch_df.sparkSession.read.parquet(f"{state_dir}/stats_new") \
            .write.mode("overwrite").parquet(f"{state_dir}/stats")
        visible_ns = time.time_ns()        # a poll NOW sees these rows
        latencies.extend(
            ((visible_ns - r.emit_ns) / 1e9, r.emit_ns) for r in rows)

    stream = (spark.readStream
              .schema("post_id long, subreddit string, risk_score long, "
                      "emit_ns long")
              .json(in_dir))
    t = threading.Thread(target=writer, daemon=True)
    t.start()
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime=f"{trigger_s} seconds")
         .start())
    time.sleep(run_s)
    stop.set()
    t.join()
    time.sleep(3 * trigger_s)              # drain the tail
    q.stop()

    # sanity: the final state must account for every drained event
    payload = serving.serve_stats(spark, state_dir)

    def pcts(vals):
        xs = sorted(vals)
        pct = lambda p: round(xs[min(len(xs) - 1,  # noqa: E731
                                     math.ceil(p * len(xs)) - 1)], 2)
        return {"p50": pct(0.50), "p90": pct(0.90), "p99": pct(0.99),
                "max": round(xs[-1], 2)}

    # steady-state = events emitted in the run's second half (the
    # first batches pay JVM/codegen warm-up the envelope claim should
    # not hide behind, so both splits are reported)
    emits = [e for _, e in latencies]
    mid = min(emits) + (max(emits) - min(emits)) // 2
    xs = [l for l, _ in latencies]
    print(json.dumps({
        "metric": "serving_event_to_visible_sec",
        "trigger_s": trigger_s, "emit_ms": emit_ms,
        "n_events": len(xs), "n_emitted": n_emitted["n"],
        "state_total_posts": payload["total_posts"],
        **pcts(xs),
        "steady_state": pcts([l for l, e in latencies if e >= mid]),
        "poll_adds_uniform_0_to_poll_interval": True,
        "reference_envelope_sec": 15.0,
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
