"""Host core-scaling ceiling probe (r11, VERDICT r10 item 2).

Times an embarrassingly-parallel CPU-bound kernel — md5 over
spark.range, no shuffle beyond a 1-row agg, no I/O — in ONE fresh JVM
at the given local[] core count.  Run it at 1/8/32 cores back-to-back
and the ratio t(1)/t(c) is the effective parallel capacity of the
sandbox: if t(32) is not materially below t(8), no query measurement
on this host can demonstrate >8-way scaling, and the bench's 8-vs-32
comparisons measure scheduler overhead, not the engine.

Usage: python scripts/probe_core_scaling.py <cores> [rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000_000

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def kernel() -> float:
        df = (spark.range(rows, numPartitions=max(cores * 4, 8))
              .select(F.md5(F.col("id").cast("string")).alias("h")))
        t0 = time.perf_counter()
        df.agg(F.max("h")).collect()
        return time.perf_counter() - t0

    kernel()  # codegen warm-up
    walls = sorted(kernel() for _ in range(3))
    print(json.dumps({"cores": cores, "rows": rows,
                      "wall_median": round(walls[1], 3),
                      "walls": [round(w, 3) for w in walls]}))
    spark.stop()


if __name__ == "__main__":
    main()
