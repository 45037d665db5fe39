"""Kafka source/sink builders — the reference's streaming topology
re-expressed (spark_jobs/preprocessing_streaming.py:91-97,164-170;
producer kafka_producer/reddit_collector_kafka.py:16-21,98-102).

No broker exists in this environment, so these only *build* unstarted
plans; the file-source harness in ``streaming.pipeline`` exercises the
identical transform chain end-to-end in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import POST_SCHEMA

DEFAULT_TOPIC = "reddit-posts"  # reference reddit_collector_kafka.py:15
DEFAULT_TRIGGER = "10 seconds"  # reference preprocessing_streaming.py:169


def parse_posts(raw: DataFrame) -> DataFrame:
    """The Kafka value-parse stage, source-independent: CAST(value AS
    STRING) -> from_json(schema) -> flatten (preprocessing_streaming
    .py:102-104).  Factored out of ``read_posts_stream`` so a
    broker-less environment can pipe ANY source with a Kafka-shaped
    ``value`` column (rate/file/memory twin) through the LITERAL same
    stage the Kafka path runs — plan equality by construction, pinned
    by tests/test_kafka_path.py."""
    return (
        raw.selectExpr("CAST(value AS STRING) AS json")
        .select(F.from_json("json", POST_SCHEMA).alias("data"))
        .select("data.*")
    )


def read_posts_stream(spark: SparkSession, bootstrap_servers: str,
                      topic: str = DEFAULT_TOPIC,
                      starting_offsets: str = "latest") -> DataFrame:
    """Kafka JSON post stream -> typed columns.

    Mirrors the reference source (subscribe, startingOffsets=latest at
    preprocessing_streaming.py:91-97) and its parse chain via
    ``parse_posts``."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_posts(raw)


def write_posts_kafka(df: DataFrame, bootstrap_servers: str, topic: str,
                      checkpoint_dir: str):
    """JSON-serialize every record back to Kafka (the producer's
    to-JSON publish, reddit_collector_kafka.py:18,98-102 — but batched
    and async instead of per-record sync acks)."""
    return (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )


def write_console(df: DataFrame, trigger: str = DEFAULT_TRIGGER):
    """Console sink, append mode, truncate=False, 10 s processing-time
    trigger (preprocessing_streaming.py:164-170)."""
    return (
        df.writeStream.outputMode("append")
        .format("console").option("truncate", "false")
        .trigger(processingTime=trigger)
    )
