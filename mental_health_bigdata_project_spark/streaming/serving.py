"""Serving-layer maintenance (SURVEY.md §3.3 / build-plan M6).

The reference dashboard re-reads and re-aggregates the whole retained
file on every HTTP request (dashboard/app.py:16-28,93-97 — no caching).
Here the stats are maintained *incrementally*: each micro-batch folds
its partial aggregates into a tiny running-state parquet (per-group
counts/sums + bucket counts), and `serve_stats` assembles the
`/api/stats` payload from that state in O(#groups) — no rescan of the
data, at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import HIGH_RISK_THRESHOLD, risk_bucket


def batch_partial_stats(batch_df: DataFrame, group_col: str = "subreddit") -> DataFrame:
    """Per-group additive partials for one micro-batch: mergeable by
    simple summation (count/sum/high-risk/bucket counts)."""
    return batch_df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum("risk_score").cast("bigint").alias("risk_sum"),
        F.sum(F.when(F.col("risk_score") >= HIGH_RISK_THRESHOLD, 1).otherwise(0))
        .cast("bigint").alias("high_risk"),
        *[
            F.sum(F.when(risk_bucket("risk_score") == b, 1).otherwise(0))
            .cast("bigint").alias(f"bucket_{i}")
            for i, b in enumerate(["0-10", "10-20", "20-30", "30+"])
        ],
    )


def merge_stats(existing: DataFrame | None, partial: DataFrame,
                group_col: str = "subreddit") -> DataFrame:
    """Fold a batch partial into the running state (outer-merge + sum).
    Both sides are per-group single rows — this is metadata-sized."""
    if existing is None:
        return partial
    cols = [c for c in partial.columns if c != group_col]
    e = existing.select(group_col, *[F.col(c).alias(f"e_{c}") for c in cols])
    p = partial.select(group_col, *[F.col(c).alias(f"p_{c}") for c in cols])
    merged = e.join(p, group_col, "full")
    return merged.select(
        group_col,
        *[(F.coalesce(f"e_{c}", F.lit(0)) + F.coalesce(f"p_{c}", F.lit(0))).alias(c)
          for c in cols],
    )


def maintain_stats(stream: DataFrame, state_dir: str, checkpoint_dir: str,
                   group_col: str = "subreddit"):
    """foreachBatch: partial-aggregate the micro-batch, merge into the
    state parquet.  Stream-side cost per batch: one small hash agg +
    a #groups-sized join."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = batch_partial_stats(batch_df, group_col)
        try:
            existing = spark.read.parquet(f"{state_dir}/stats")
        except Exception:
            existing = None
        merged = merge_stats(existing, partial, group_col).coalesce(1)
        # write-then-swap (state is tiny; atomic enough for serving)
        merged.write.mode("overwrite").parquet(f"{state_dir}/stats_new")
        spark.read.parquet(f"{state_dir}/stats_new").write.mode("overwrite") \
            .parquet(f"{state_dir}/stats")

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def serve_stats(spark: SparkSession, state_dir: str,
                group_col: str = "subreddit") -> dict:
    """Assemble the /api/stats shape (dashboard/app.py:77-85) from the
    running state — O(#groups) read, no data rescan."""
    state = spark.read.parquet(f"{state_dir}/stats").collect()
    total = sum(r.n for r in state)
    risk_sum = sum(r.risk_sum for r in state)
    buckets = ["0-10", "10-20", "20-30", "30+"]
    return {
        "total_posts": total,
        "avg_risk_score": round(risk_sum / total, 2) if total else 0.0,
        "high_risk_count": sum(r.high_risk for r in state),
        "by_subreddit": {
            r[group_col]: {
                "count": r.n,
                "total_risk": r.risk_sum,
                "avg_risk": round(r.risk_sum / r.n, 2) if r.n else 0,
            } for r in state
        },
        "risk_distribution": {
            b: sum(r[f"bucket_{i}"] for r in state) for i, b in enumerate(buckets)
        },
    }
