"""Targeted query timing for the r10 optimization round: bench.py's
methodology (same session confs, scan + machinery warm-up, cold + warm
execution through the noop sink) over just the named queries, so an
old-vs-new comparison doesn't need two full 134-query bench runs.

Usage: python scripts/time_queries_r10.py <sf_dir> <qid> [qid ...]
Prints one JSON line {qid: {"cold": s, "warm": s}, "_calibration": s}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1]
    qids = sys.argv[2:]

    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("time-r10", master="local[32]", shuffle_partitions=32)
    qs = entry_mod.queries()

    spark.range(1000).count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
    wa = spark.range(10_000).select((F.col("id") % 7).alias("k"),
                                    F.col("id").cast("double").alias("v"))
    wa.groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
    (wa.join(F.broadcast(spark.range(7).withColumnRenamed("id", "k")), "k")
     .write.format("noop").mode("overwrite").save())

    def calibrate() -> float:
        c = (spark.range(30_000_000)
             .select((F.col("id") % 1009).alias("k"),
                     (F.col("id") * 2654435761 % 97).cast("double")
                     .alias("v"))
             .groupBy("k").agg(F.sum("v").alias("s"),
                               F.count("*").alias("n"))
             .groupBy((F.col("k") % 7).alias("g")).agg(F.sum("s"),
                                                       F.sum("n")))
        t0 = time.perf_counter()
        c.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    calibrate()
    cal = sorted(calibrate() for _ in range(3))[1]

    out: dict = {}
    for qid in qids:
        spark.sparkContext.setJobDescription(f"r10-time: {qid}")
        fn = qs[qid]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        out[qid] = {"cold": round(cold, 3), "warm": round(warm, 3)}
    out["_calibration"] = round(cal, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
