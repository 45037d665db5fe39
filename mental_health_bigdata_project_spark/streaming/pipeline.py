"""Streaming assembly: file-source harness + foreachBatch sinks.

Replaces the reference's two sinks:
- console append sink (preprocessing_streaming.py:164-170) — available
  via streaming.kafka.write_console;
- the consumer's rewrite-the-whole-JSON-file-per-message ring buffer
  (kafka_consumer_simple.py:49-61,146) — replaced by a foreachBatch
  parquet append + bounded "latest-N" compaction (no O(N) write
  amplification; at scale the sink is a partitioned parquet/Delta table
  and the latest-N view is a query, not a file rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline import enrich_posts
from ..schemas import POST_SCHEMA


def read_posts_json_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    """JSON-lines file source with the declared post schema (streaming
    file sources require explicit schemas)."""
    return spark.readStream.schema(POST_SCHEMA).json(in_dir)


def enriched_stream(stream: DataFrame) -> DataFrame:
    """The same enrichment chain as batch (pipeline.enrich_posts) — one
    code path for both, which is the parity test's whole point."""
    return enrich_posts(stream, with_processed_at=False)


def run_to_parquet(stream: DataFrame, out_dir: str, checkpoint_dir: str,
                  latest_n: int | None = None, trigger_once: bool = False):
    """foreachBatch write to parquet; optionally maintain a compacted
    'latest N' side table per micro-batch (the ring-buffer replacement).
    Uses availableNow so tests drain the source and terminate.

    Exactly-once on replay: each micro-batch lands in its own
    ``batch_id=N`` partition via dynamic partition overwrite, so a batch
    retried after a partial write (worker crash between write and
    checkpoint commit) overwrites ITS OWN partition instead of
    appending duplicates — a plain mode("append") here is only
    at-least-once."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_dir}/all")
        )
        if latest_n:
            spark = batch_df.sparkSession
            latest = (
                spark.read.parquet(f"{out_dir}/all")
                .orderBy(F.desc("created_utc"), F.desc("id"))
                .limit(latest_n)
            )
            latest.write.mode("overwrite").parquet(f"{out_dir}/latest")

    writer = (
        stream.writeStream
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    # trigger_once: one micro-batch then stop — for unbounded sources
    # (e.g. the poll connector) where availableNow never drains.
    writer = (writer.trigger(once=True) if trigger_once
              else writer.trigger(availableNow=True))
    return writer.start()
