"""Streaming window + stateful operators (SURVEY.md §2.9 [EXT]):
watermarked tumbling/sliding/session aggregations and bounded-state
dedup.  Batch twins (same window expressions, no watermark) live in
``plans.stream_windows`` and are the DuckDB-checked correctness anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.common import dsum

DEFAULT_WATERMARK = "10 minutes"


def tumbling_agg(events: DataFrame, ts_col: str = "ts",
                 width: str = "5 minutes",
                 watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Watermarked tumbling count/sum.  State per open window; windows
    older than the watermark are finalized and evicted (bounded state —
    late rows beyond it are dropped)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width).alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "n_events", "sum_value")
    )


def sliding_agg(events: DataFrame, ts_col: str = "ts",
                width: str = "10 minutes", slide: str = "5 minutes",
                watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "n_events", "sum_value")
    )


def session_agg(events: DataFrame, ts_col: str = "ts",
                gap: str = "30 minutes",
                watermark: str = "60 minutes") -> DataFrame:
    """Session windows: merged while consecutive events arrive within
    ``gap``; watermark closes sessions (the genuinely stateful op)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )


def watermarked_dedup(events: DataFrame, key_cols: list[str],
                      ts_col: str = "ts",
                      watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Bounded-state replacement for the reference's ever-growing
    ``seen_ids`` set (reddit_collector_kafka.py:48,81): dropDuplicates
    keyed state is evicted once older than the watermark."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def watermarked_dedup_within(events: DataFrame, key_cols: list[str],
                             ts_col: str = "ts",
                             watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """dropDuplicatesWithinWatermark: unlike plain dropDuplicates (which
    keys state on the exact event-time too unless excluded), this drops
    duplicates whose TIMESTAMPS DIFFER — the retry/replay case where the
    same logical event arrives again seconds later with a fresh ts —
    while still evicting state past the watermark."""
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))
