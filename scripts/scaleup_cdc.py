"""Volume scaling of content-defined chunking (dedup_cdc_chunks'
core, plans/textops.cdc_chunk_fps): replicate the sf corpus with
per-copy token suffixes (the SCALING §1 method — same doc shapes,
factor x volume, no cross-copy chunk collisions, so the dup structure
is held constant while rows grow) and measure the end-to-end
chunk-fingerprint wall at each factor.

The claim under test: the pipeline is two doc-partitioned windows
(lag + boundary prefix sum — embarrassingly parallel across docs) plus
one (doc, chunk) hash agg, so wall grows ~linearly in volume with no
superlinear shuffle term.

Usage: python scripts/scaleup_cdc.py [sf_dir] [factors...]
Prints one JSON line; paste into SCALING.md §19.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 4, 8]

    from pyspark.sql import SparkSession, functions as F

    from mental_health_bigdata_project_spark.plans.textops import (
        cdc_chunk_fps, tokens_col)
    from mental_health_bigdata_project_spark.session import configure
    from mental_health_bigdata_project_spark.sources import load_table

    spark = configure(SparkSession.builder.master("local[32]")) \
        .config("spark.driver.memory", "24g") \
        .appName("scaleup-cdc").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source", tokens_col().alias("toks"))
            .filter(F.size("toks") > 0))

    walls, chunks, rows = {}, {}, {}
    for f in factors:
        rep = (spark.range(f).crossJoin(docs)
               .select((F.col("doc_id") * f + F.col("id")).alias("doc_id"),
                       "source",
                       F.transform(
                           "toks",
                           lambda t: F.concat(t, F.lit("_"),
                                              F.col("id").cast("string")))
                       .alias("toks"))
               .localCheckpoint(eager=True))
        rows[str(f)] = rep.count()
        t0 = time.perf_counter()
        chunks[str(f)] = cdc_chunk_fps(rep).count()
        walls[str(f)] = round(time.perf_counter() - t0, 2)

    base = str(factors[0])
    top = str(factors[-1])
    print(json.dumps({
        "metric": "cdc_chunking_volume_scaling",
        "sf_dir": sf_dir,
        "docs_by_factor": rows,
        "chunks_by_factor": chunks,
        "wall_sec_by_factor": walls,
        "wall_ratio": round(walls[top] / walls[base], 2),
        "volume_ratio": factors[-1] // factors[0],
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
