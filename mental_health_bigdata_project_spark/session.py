"""SparkSession factory tuned for this engine.

The reference builds its session at
spark_jobs/preprocessing_streaming.py:27-32 (local[*], 2g driver, Kafka
package).  Here we centralize session construction with scale-oriented
defaults: AQE on (runtime join re-planning + skew handling), Arrow
enabled for any pandas-UDF paths, UTC session time zone (deterministic
timestamp semantics against the DuckDB oracle), and nanos-as-long parquet
reads (the driver testdata's ``events.ts`` is TIMESTAMP(NANOS), which
Spark does not natively map).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "mental-health-bigdata-spark"


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return os.environ.get("SPARK_MASTER", f"local[{cpus}]")


def configure(builder: SparkSession.Builder, shuffle_partitions: int | None = None) -> SparkSession.Builder:
    """Apply this engine's session config to any builder (so the driver's
    own SparkSession, passed into ``__spark_entry__``, can be upgraded at
    runtime for the runtime-settable subset)."""
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        builder
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )


# SQL confs we must have even on an externally-built session (the driver
# hands us its own SparkSession).  All of these are runtime-settable.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # right-size shuffles for the local core count (the driver's plain
    # session defaults to 200 — 6x task overhead for zero parallelism
    # gain on local[32]; AQE coalescing still shrinks further at runtime)
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be locked
            pass
    return spark


def get_spark(app_name: str = DEFAULT_APP_NAME, master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    spark = configure(builder, shuffle_partitions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return ensure_runtime_confs(spark)
