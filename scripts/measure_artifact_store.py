"""Cross-session artifact-store walls (VERDICT r6 item 2's "done"
criterion): phase `build` clears the store for the given sf_dir and
materializes every corpus artifact in a fresh session (the
write-once cost); phase `read` opens ANOTHER fresh session and
accesses the same artifacts — every wall should be a parquet read,
not a recompute, and the manifest versions must not move.

    python scripts/measure_artifact_store.py build [sf_dir]
    python scripts/measure_artifact_store.py read  [sf_dir]

Each phase prints one JSON line; paste the pair into SCALING.md §12.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    phase = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    from mental_health_bigdata_project_spark import artifacts

    # persistence is opt-in since round 10 (bench/oracle runs must
    # compute from parquet); this script MEASURES the store, so turn
    # it on explicitly for both phases
    os.environ.setdefault(artifacts._ARTIFACT_ENV, artifacts._DEFAULT_ROOT)
    from mental_health_bigdata_project_spark.plans import (QUERIES,
                                                           similarity,
                                                           textops)
    from mental_health_bigdata_project_spark.session import configure

    store = os.path.join(artifacts.artifact_root(),
                         artifacts._dataset_key(sf_dir))
    if phase == "build":
        shutil.rmtree(store, ignore_errors=True)

    spark = configure(SparkSession.builder.master("local[32]")) \
        .appName(f"artifact-{phase}").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    steps = [
        ("corpus_shingles", lambda: textops.corpus_shingles(spark, sf_dir)),
        ("corpus_setsim_index",
         lambda: textops.corpus_setsim_index(spark, sf_dir)),
        ("corpus_setsim_pairs",
         lambda: textops.corpus_setsim_pairs(spark, sf_dir)),
        ("corpus_ivf_cells",
         lambda: similarity.corpus_ivf_cells(spark, sf_dir)),
        ("corpus_pq_index",
         lambda: similarity.corpus_pq_index(spark, sf_dir)[0]),
        ("corpus_neardup_pairs",
         lambda: similarity.corpus_neardup_pairs(spark, sf_dir)),
        ("corpus_minhash_sigs",
         lambda: similarity.corpus_minhash_sigs(spark, sf_dir)),
        # round 8: the iterative-training artifacts (VERDICT r7 item 2)
        ("corpus_lloyd",
         lambda: similarity.corpus_lloyd(spark, sf_dir)[0]),
        ("semdedup_query",
         lambda: QUERIES["dedup_semdedup"](spark, sf_dir)),
    ]
    walls = {}
    rows = {}
    for name, fn in steps:
        t0 = time.perf_counter()
        rows[name] = fn().count()
        walls[name] = round(time.perf_counter() - t0, 2)

    versions = {}
    for name in os.listdir(store) if os.path.isdir(store) else []:
        m = artifacts._load_manifest(os.path.join(store, name))
        if m:
            versions[name] = m["version"]
    spark.stop()
    print(json.dumps({"phase": phase, "sf_dir": sf_dir, "walls": walls,
                      "total_sec": round(sum(walls.values()), 2),
                      "rows": rows, "manifest_versions": versions},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
