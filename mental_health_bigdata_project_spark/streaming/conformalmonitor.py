"""Streaming conformal-coverage monitor: the serving face of
``plans/quality.stat_conformal_interval`` and the NINTH mergeable-
state member — the model-monitoring pair to the PSI drift gate
(driftgate.py watches the INPUT distribution; this watches whether
the model's uncertainty intervals still COVER).

``build_conformal_artifact`` freezes the fitted model (per-group mean
predictor + finite-sample-corrected 90% residual-cell quantile, via
the shared ``conformal_fit``, PLUS the pooled MARGINAL quantile via
``conformal_marginal_qhat`` — the fairness arm) — a #groups-row
reference table.  ``coverage_batch`` reduces each micro-batch to ONE
(grp, covered, covered_marginal, total) delta row per group
(sum-mergeable, exactly-once via batch_id partitions);
``serve_coverage`` folds the deltas, flags any group whose empirical
coverage has fallen materially below the nominal 90%, and reports the
per-group GROUP-vs-MARGINAL coverage gap — the streaming face of
``stat_conformal_group_gap``'s fairness audit, all from three
integers of state per group.

Parity is by construction: the same fit helpers and the same quantized
residual cell as the oracle-checked batch queries, pinned by test
(baseline = the query's train/calib splits, stream = its test split,
served coverage == the query's coverage column bit-for-bit, served
gap == stat_conformal_group_gap's columns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.quality import (conformal_cell, conformal_fit,
                             conformal_marginal_qhat)

COVERAGE_ALARM = 0.85   # nominal 0.9 minus slack for sampling noise


def build_conformal_artifact(train: DataFrame, calib: DataFrame,
                             artifact_dir: str) -> int:
    """Fit on (grp, value) train/calib relations and persist the
    model table — per-group quantiles plus the pooled marginal
    quantile as a constant column (the fairness-arm reference).
    Returns the number of groups fitted."""
    model = conformal_fit(train, calib).localCheckpoint(eager=True)
    model = model.crossJoin(
        F.broadcast(conformal_marginal_qhat(model, calib)))
    model.write.mode("overwrite").parquet(
        os.path.join(artifact_dir, "model"))
    return model.count()


def coverage_batch(batch_df: DataFrame, batch_id: int, index_dir: str,
                   artifact_dir: str, type_col: str = "event_type",
                   value_col: str = "value") -> None:
    """One micro-batch of coverage maintenance: per group, how many
    rows fell inside the frozen interval — two integers per group."""
    spark = batch_df.sparkSession
    model = spark.read.parquet(os.path.join(artifact_dir, "model"))
    if "qhat_marginal" not in model.columns:
        # a model artifact from before the fairness arm (r9) cannot
        # score covered_marginal — fail with the remedy instead of a
        # missing-column resolution error mid-plan (ADVICE r9)
        raise ValueError(
            f"conformal model at {artifact_dir} predates the marginal-"
            "quantile column (qhat_marginal); rebuild it with "
            "build_conformal_artifact before streaming coverage")
    delta = (batch_df.filter(F.col(value_col).isNotNull())
             .select(F.col(type_col).alias("grp"),
                     F.col(value_col).alias("value"))
             .join(F.broadcast(model), "grp")
             .groupBy("grp")
             .agg(F.sum(F.when(conformal_cell() <= F.col("qhat_cell"),
                               1).otherwise(0))
                  .cast("bigint").alias("covered"),
                  F.sum(F.when(conformal_cell()
                               <= F.col("qhat_marginal"), 1).otherwise(0))
                  .cast("bigint").alias("covered_marginal"),
                  F.count("*").cast("bigint").alias("total")))
    (delta.withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(os.path.join(index_dir, "coverage")))


def _tolerate_old_state(df: DataFrame) -> DataFrame:
    """Backward-compatible read of the coverage state (ADVICE r9): a
    state directory written before the fairness arm lacks
    ``covered_marginal`` (and ``total_marginal``, the marginal BASIS
    column compaction folds) — backfill them as NULL so the sums skip
    those batches instead of failing column resolution.  Marginal
    coverage is then reported over the batches that actually recorded
    it (NULL when none have).  Caveat: Spark's plain parquet read does
    not merge schemas, so a directory MIXING pre- and post-upgrade
    delta files should be compacted once at migration (the transform
    below writes the unified schema); the helper guarantees the
    all-old and all-new layouts read correctly either way."""
    for c in ("covered_marginal", "total_marginal"):
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("bigint"))
    return df


def _marginal_basis():
    """The rows' marginal-coverage denominator: the explicit folded
    column when present, else this delta's total iff it recorded
    marginal coverage at all."""
    return F.coalesce(
        F.col("total_marginal"),
        F.when(F.col("covered_marginal").isNotNull(), F.col("total")))


def serve_coverage(spark: SparkSession, artifact_dir: str,
                   index_dir: str) -> DataFrame:
    """(event_type, n_test, n_covered, coverage, alarm) over
    everything ingested so far."""
    from .compaction import read_live

    cur = (_tolerate_old_state(
               read_live(spark, os.path.join(index_dir, "coverage")))
           .groupBy("grp")
           .agg(F.sum("covered").cast("bigint").alias("n_covered"),
                F.sum("covered_marginal").cast("bigint")
                .alias("n_covered_marginal"),
                F.sum(_marginal_basis()).cast("bigint")
                .alias("n_test_marginal"),
                F.sum("total").cast("bigint").alias("n_test")))
    covg = F.col("n_covered").cast("double") / F.col("n_test")
    # marginal coverage only over batches that recorded it (pre-r9
    # deltas lack the column — ADVICE r9); NULL when none have
    covm = (F.col("n_covered_marginal").cast("double")
            / F.col("n_test_marginal"))
    return cur.select(
        F.col("grp").alias("event_type"), "n_test", "n_covered",
        F.round(covg, 6).alias("coverage"),
        F.round(covm, 6).alias("coverage_marginal"),
        F.round(covg - covm, 6).alias("coverage_gap"),
        (covg < COVERAGE_ALARM).cast("int").alias("alarm"))


def compact_coverage_state(spark: SparkSession, index_dir: str,
                           through: int) -> dict:
    """Sum-fold the per-batch coverage deltas — state stays one row
    per group forever.  Tolerates pre-fairness-arm deltas (ADVICE r9)
    and writes the unified schema, carrying the marginal BASIS so the
    served gap stays correct across mixed-era histories."""
    from .compaction import compact_index

    return compact_index(
        spark, os.path.join(index_dir, "coverage"), through,
        transform=lambda live: _tolerate_old_state(live).groupBy("grp")
        .agg(F.sum("covered").cast("bigint").alias("covered"),
             F.sum("covered_marginal").cast("bigint")
             .alias("covered_marginal"),
             F.sum(_marginal_basis()).cast("bigint")
             .alias("total_marginal"),
             F.sum("total").cast("bigint").alias("total")))


def run_coverage_monitor(stream: DataFrame, checkpoint_dir: str,
                         index_dir: str, artifact_dir: str):
    """Attach the coverage sink to an events stream (availableNow)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        coverage_batch(batch_df, batch_id, index_dir, artifact_dir)

    return (stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
