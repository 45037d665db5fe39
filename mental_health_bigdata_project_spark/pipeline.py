"""The post-enrichment pipeline, shared by batch and streaming plans.

Replaces both reference implementations of the same transform chain
(Spark UDF variant spark_jobs/preprocessing_streaming.py:106-134;
plain-Python twin kafka_consumer_simple.py:108-146) with one declarative
projection.  Ordering semantics from the golden file are preserved:
risk is scored on the FULL combined text, truncation happens afterwards
(kafka_consumer_simple.py:123-131; SURVEY.md §2.8 gotchas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .functions.text import clean_text, combined_text, risk_score
from .schemas import POST_DEFAULTS

# Consumer-variant truncation lengths (kafka_consumer_simple.py:131,138).
TEXT_TRUNC = 500
CLEANED_TRUNC = 200


def fill_post_defaults(df: DataFrame) -> DataFrame:
    """Reproduce the reference's null-tolerant `.get(k, default)` boundary
    semantics (reddit_collector_kafka.py:85-93) via na.fill — Spark-side
    nulls become the same defaults instead of propagating."""
    fills = {k: v for k, v in POST_DEFAULTS.items() if k in df.columns}
    return df.na.fill(fills)


def enrich_posts(df: DataFrame, truncate: bool = True,
                 with_processed_at: bool = True) -> DataFrame:
    """title+text -> combined_text -> cleaned_text + risk_score.

    Works identically on batch and streaming DataFrames (pure per-row
    projection — no shuffle, stays in whole-stage codegen, and at 100 TB
    scales linearly with input splits)."""
    combined = combined_text("title", "text")
    out = (
        df
        .withColumn("combined_text", combined)
        .withColumn("risk_score", risk_score(F.col("combined_text")))
        .withColumn("cleaned_text", clean_text(F.col("combined_text")))
    )
    if truncate:
        # Score-then-truncate ordering: risk_score above reads the full
        # combined text; only the *stored* columns are truncated.
        out = (
            out
            .withColumn("text", F.substring("text", 1, TEXT_TRUNC))
            .withColumn("cleaned_text", F.substring("cleaned_text", 1, CLEANED_TRUNC))
        )
    if with_processed_at:
        out = out.withColumn("processed_at", F.current_timestamp())
    return out
