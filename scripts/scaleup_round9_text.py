"""Volume scaling for the round-9 text/selection family: replicate the
documents table FACTOR times (per-copy token suffixes, so tokens AND
vocabulary both scale — the adversarial case for vocab-shaped plans)
and time text_heaps_law, sample_rho_excess_loss and
mixture_doremi_weights at each factor.

What each one stresses:
- text_heaps_law: the two-phase cumulative-curve shape (doc-grid range
  exchange) + a first-occurrence agg over a 10x vocabulary.
- sample_rho_excess_loss: (doc, word) agg + a 10x-vocab model join.
- mixture_doremi_weights: (lang, word) agg + word-marginal join.

Usage: python scripts/scaleup_round9_text.py [sf_dir] [factors]
Prints one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

QIDS = ["text_heaps_law", "sample_rho_excess_loss",
        "mixture_doremi_weights"]


def build_scaled_docs(spark, base_dir: str, out_dir: str,
                      factor: int) -> None:
    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.sources import load_table

    docs = load_table(spark, base_dir, "documents")
    shift = (docs.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    copies = None
    for k in range(factor):
        c = docs.select(
            (F.col("doc_id") + F.lit(k * shift)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1x{k}").alias("text"),
            *[col for col in docs.columns
              if col not in ("doc_id", "text")])
        copies = c if copies is None else copies.unionByName(c)
    copies.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def time_queries(spark, sf_dir: str) -> dict:
    from mental_health_bigdata_project_spark.plans import QUERIES

    out = {}
    for qid in QIDS:
        fn = QUERIES[qid]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[qid] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = ([int(x) for x in sys.argv[2].split(",")]
               if len(sys.argv) > 2 else [1, 10])

    from pyspark.sql import SparkSession

    from mental_health_bigdata_project_spark.session import configure

    spark = configure(
        SparkSession.builder.appName("scaleup-r9-text")
        .master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false"),
        shuffle_partitions=32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    results = {"base_dir": base, "factors": {}}
    for factor in factors:
        if factor == 1:
            results["factors"]["1"] = time_queries(spark, base)
            continue
        tmp = tempfile.mkdtemp(prefix=f"r9text_{factor}x_")
        try:
            build_scaled_docs(spark, base, tmp, factor)
            results["factors"][str(factor)] = time_queries(spark, tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    # ratio of the largest factor over the SMALLEST one run (ADVICE
    # r9: indexing factors['1'] raised KeyError after all timing work
    # when invoked as e.g. '10,100').  Note the asymmetry the ratio
    # carries when the smallest factor is 1: factor 1 times the
    # session-memoized base dir while scaled factors run from
    # non-memoized tmp dirs, so ratios vs 1 include that cache edge.
    lo, hi = str(min(factors)), str(max(factors))
    if lo != hi:
        results["wall_ratio_basis"] = {"lo": lo, "hi": hi,
                                       "lo_is_memoized_base": lo == "1"}
        results["wall_ratio"] = {
            q: round(results["factors"][hi][q]
                     / max(results["factors"][lo][q], 1e-9), 2)
            for q in QIDS}
    print(json.dumps(results, separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
