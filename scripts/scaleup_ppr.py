"""Seeds-vs-wall scaling of the sparse seed-batched PPR core
(plans/advanced.ppr_sparse_ranks, VERDICT r7 item 3): on a synthetic
V-node weighted digraph, run the SAME k-pass iteration with growing
seed sets and record each wall plus the final nonzero-support size.

The claim under test: seeds are ROWS in shuffles that already exist
(one edge join + one dangling rollup per pass), so wall grows far
sub-linearly in seed count — versus re-running the single-seed walk
per seed, which is linear by construction.  The dense formulation the
r7 ADVICE flagged would carry seeds x V rows from iteration 0
regardless of reach; the sparse core carries only the k-hop support.

Usage: python scripts/scaleup_ppr.py [V] [out_degree] [iters]
Prints one JSON line; paste into SCALING.md §17.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    v_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import SparkSession, functions as F

    from mental_health_bigdata_project_spark.plans.advanced import (
        ppr_sparse_ranks)
    from mental_health_bigdata_project_spark.session import configure

    spark = configure(SparkSession.builder.master("local[32]")) \
        .config("spark.driver.memory", "24g") \
        .appName("scaleup-ppr").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic digraph: node i -> (i*m + j) mod V for
    # m-th multiplier hops, integer weights 1..3 — every node has
    # out_deg successors except a 5% dangling tail (successors
    # dropped) so the dangling path is exercised too
    edges = (spark.range(v_nodes).withColumnRenamed("id", "src")
             .crossJoin(spark.range(out_deg).withColumnRenamed("id", "m"))
             .select(F.col("src"),
                     ((F.col("src") * (F.col("m") * 2 + 3) + F.col("m") * 7)
                      % v_nodes).alias("dst"),
                     ((F.col("src") + F.col("m")) % 3 + 1)
                     .cast("double").alias("w"))
             .filter(F.col("src") % 20 != 0)          # dangling tail
             .groupBy("src", "dst").agg(F.sum("w").alias("w"))
             .localCheckpoint(eager=True))
    n_edges = edges.count()

    walls = {}
    supports = {}
    sizes = [s for s in (1, 10, 100, 1000, v_nodes) if s <= v_nodes]
    for n_seeds in sizes:
        seeds = (spark.range(n_seeds)
                 .select((F.col("id") * (v_nodes // n_seeds) + 1)
                         .alias("seed"))     # +1: skip the dangling
                 .localCheckpoint(eager=True))  # multiples of 20
        t0 = time.perf_counter()
        ranks = ppr_sparse_ranks(edges, seeds, iters=iters)
        supports[str(n_seeds)] = ranks.count()
        walls[str(n_seeds)] = round(time.perf_counter() - t0, 2)

    base = walls[str(sizes[0])]
    print(json.dumps({
        "metric": "ppr_seeds_vs_wall",
        "v_nodes": v_nodes, "n_edges": n_edges, "iters": iters,
        "wall_sec_by_seeds": walls,
        "support_rows_by_seeds": supports,
        "wall_ratio_max_vs_1": round(walls[str(sizes[-1])] / base, 2),
        "seed_ratio_max_vs_1": sizes[-1] // sizes[0],
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
