"""Batch-size sweep for the incremental streaming-dedup sidecar
(VERDICT r3 item 6): the sidecar's absolute rows/s at sf0.1 are
fixed-overhead-dominated lower bounds (~1-3 s of planning plus two
exactly-once parquet commits per micro-batch, against toy 5k-row
batches).  This sweep replicates the corpus FACTOR times so each of
the 4 micro-batches carries FACTOR x the rows, and reruns the exact
same foreachBatch bodies — if the amortization claim holds, rows/s
grows toward the batch path as batches fatten.

Replication recipe mirrors scripts/scaleup_dedup_chain.py: documents
get shifted ids and a per-copy token suffix (copies share no
fingerprints, so per-copy dedup structure — and the accepted/index
write volume per row — is IDENTICAL to the base corpus, keeping
rows/s comparable across factors).  Embeddings are replicated with
shifted ids and unchanged vectors (cross-copy near-dups: the honest
duplicate-heavy stream; noted in the output).  CDC events get shifted
seq and user_id (state grows linearly, buckets stay uniform).

Usage: python scripts/sweep_streaming_batchsize.py [sf_dir] [factors]
  e.g. python scripts/sweep_streaming_batchsize.py /root/testdata/sf0.1 1,10
Prints one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def build_scaled(spark, base_dir: str, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.sources import load_table

    docs = load_table(spark, base_dir, "documents")
    dshift = (docs.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    dcopies = None
    for k in range(factor):
        c = docs.select(
            (F.col("doc_id") + F.lit(k * dshift)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1x{k}").alias("text"),
            *[col for col in docs.columns if col not in ("doc_id", "text")])
        dcopies = c if dcopies is None else dcopies.unionByName(c)
    dcopies.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = load_table(spark, base_dir, "embeddings")
    eshift = (emb.agg(F.max("vec_id")).collect()[0][0] or 0) + 1
    ecopies = None
    for k in range(factor):
        c = emb.select((F.col("vec_id") + F.lit(k * eshift)).alias("vec_id"),
                       *[col for col in emb.columns if col != "vec_id"])
        ecopies = c if ecopies is None else ecopies.unionByName(c)
    ecopies.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    ev = load_table(spark, base_dir, "events")
    vshift = (ev.agg(F.max("event_id")).collect()[0][0] or 0) + 1
    ushift = (ev.agg(F.max("user_id")).collect()[0][0] or 0) + 1
    vcopies = None
    for k in range(factor):
        c = ev.select(
            (F.col("event_id") + F.lit(k * vshift)).alias("event_id"),
            (F.col("user_id") + F.lit(k * ushift)).alias("user_id"),
            *[col for col in ev.columns
              if col not in ("event_id", "user_id")])
        vcopies = c if vcopies is None else vcopies.unionByName(c)
    vcopies.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = ([int(x) for x in sys.argv[2].split(",")]
               if len(sys.argv) > 2 else [1, 10])

    from pyspark.sql import SparkSession

    from mental_health_bigdata_project_spark.session import configure
    from scripts.bench_streaming_dedup import run

    # local-mode default driver heap (1g) starves the 10x span path —
    # all 32 "executors" share the one driver JVM here, so size it the
    # way a real cluster sizes executor memory
    spark = configure(
        SparkSession.builder.appName("sweep-stream-batch")
        .master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false"),
        shuffle_partitions=32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    results = {"base_dir": base, "n_batches": 4, "factors": {}}
    for factor in factors:
        if factor == 1:
            results["factors"]["1"] = run(spark, base, n_batches=4)
            continue
        tmp = tempfile.mkdtemp(prefix=f"stream_sweep_{factor}x_")
        try:
            build_scaled(spark, base, tmp, factor)
            results["factors"][str(factor)] = run(spark, tmp, n_batches=4)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    # compact comparison: rows/s per path per factor
    results["rows_per_sec"] = {
        path: {f: results["factors"][f]["paths"][path]["rows_per_sec"]
               for f in results["factors"]}
        for path in next(iter(results["factors"].values()))["paths"]}
    print(json.dumps(results, separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
