"""Per-batch wall sweep for the incremental exact-setsim stream
(VERDICT r4 item 2): feed N equal micro-batches of sf documents
through ``dedup_setsim_batch_against_index`` and record each batch's
wall clock.  The round-4 sweep showed walls GROWING (2.6 -> 4.9 s over
4 batches) because the prior-probe read the full persisted prefix
index; this script is the before/after harness for the bucketed-index
fix — run it on both code states (or use the phase timers to see
where a regression lives).

Usage: python scripts/sweep_setsim_probe.py [sf_dir] [n_batches] [factor]
                                            [compact_after] [reorder]
``factor`` > 1 replicates the corpus with shifted doc_ids and a
per-copy token suffix (copies share no shingles — the
sweep_streaming_batchsize recipe), so the persisted index grows
factor× deeper while per-copy dedup structure stays identical.
``compact_after`` >= 0 runs ``compact_setsim_index`` through that
batch right after it commits (full horizon at that point), with
``reorder`` (default 1) controlling the r11 rarest-first epoch
re-sort — the A/B for the post-compaction batch-wall curve.
Prints one JSON line; paste into SCALING.md §2.
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
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    compact_after = int(sys.argv[4]) if len(sys.argv) > 4 else -1
    reorder = bool(int(sys.argv[5])) if len(sys.argv) > 5 else True

    from pyspark.sql import SparkSession, functions as F

    from mental_health_bigdata_project_spark.session import configure
    from mental_health_bigdata_project_spark.sources import load_table
    from mental_health_bigdata_project_spark.streaming.setsimdedup import (
        compact_setsim_index, dedup_setsim_batch_against_index)

    spark = configure(SparkSession.builder.master("local[32]")) \
        .appName("sweep-setsim-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if factor > 1:
        shift = (base.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
        copies = [base.select(
            (F.col("doc_id") + F.lit(k * shift)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1x{k}").alias("text"))
            for k in range(factor)]
        d = copies[0]
        for c in copies[1:]:
            d = d.unionByName(c)
        base = d
    docs = base.localCheckpoint(eager=True)
    n_docs = docs.count()
    per_batch = n_docs // n_batches  # doc_ids are 0..N-1 and contiguous

    root = tempfile.mkdtemp(prefix="setsim_sweep_")
    walls = []
    try:
        for b in range(n_batches):
            # last batch takes the divisor remainder — without the
            # fold, n_docs % n_batches trailing docs were silently
            # never fed and the sweep measured a smaller corpus than
            # reported
            hi = n_docs if b == n_batches - 1 else (b + 1) * per_batch
            bdf = (docs.filter(
                (F.col("doc_id") >= b * per_batch)
                & (F.col("doc_id") < hi))
                .localCheckpoint(eager=True))
            n = bdf.count()
            t0 = time.monotonic()
            dedup_setsim_batch_against_index(
                bdf, b, f"{root}/out", f"{root}/idx")
            walls.append(round(time.monotonic() - t0, 3))
            if b == compact_after:
                t0 = time.monotonic()
                compact_setsim_index(spark, f"{root}/idx", through=b,
                                     reorder=reorder)
                compact_wall = round(time.monotonic() - t0, 3)
        accepted = spark.read.parquet(f"{root}/out/accepted").count()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    first, last = walls[0], walls[-1]
    print(json.dumps({
        "sf_dir": sf_dir, "n_batches": n_batches,
        "rows_per_batch": per_batch, "accepted_total": accepted,
        "walls_sec": walls,
        "compact_after": compact_after if compact_after >= 0 else None,
        "reorder": reorder if compact_after >= 0 else None,
        "compact_wall_sec": compact_wall if compact_after >= 0 else None,
        "growth_last_over_first": round(last / first, 2),
        "growth_last_over_second": round(last / walls[1], 2) if len(walls) > 1 else None,
    }))


if __name__ == "__main__":
    main()
