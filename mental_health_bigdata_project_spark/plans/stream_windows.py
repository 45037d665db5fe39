"""Batch twins of the streaming window operators (SURVEY.md §2.9 [EXT]).

The live Structured Streaming versions (watermarks + the same window
exprs) live in ``streaming.windows``; these batch twins run the
identical window semantics over the bounded ``events`` table so DuckDB
can oracle-check them (SURVEY.md §2.9: "Batch-mode twins of the
windowed aggs ... so they are DuckDB-oracle-checkable").
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources import load_table
from .common import dsum
from .registry import EVENTS_TS, dsum_sql, query

# Explicit epoch origin so Spark and DuckDB bucket identically.
_BUCKET5 = "time_bucket(INTERVAL '5 minutes', ts, TIMESTAMP '1970-01-01 00:00:00')"


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@query("stream_window_tumbling", f"""
    SELECT {_BUCKET5} AS window_start,
           {_BUCKET5} + INTERVAL '5 minutes' AS window_end,
           count(*) AS n_events,
           {dsum_sql('value', 'sum_value')}
    FROM {EVENTS_TS}
    GROUP BY 1
""")
def stream_window_tumbling(spark, sf_dir):
    """Tumbling 5-minute event-time windows.  Streaming twin:
    streaming.windows.tumbling_agg (same F.window expr + watermark)."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n_events", "sum_value")
    )


@query("stream_window_sliding", f"""
    WITH e AS (SELECT {_BUCKET5} AS b5, value FROM {EVENTS_TS} ev),
    w AS (
        SELECT b5 AS window_start, value FROM e
        UNION ALL
        SELECT b5 - INTERVAL '5 minutes' AS window_start, value FROM e
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           count(*) AS n_events,
           {dsum_sql('value', 'sum_value')}
    FROM w GROUP BY window_start
""")
def stream_window_sliding(spark, sf_dir):
    """Sliding windows (10-minute width, 5-minute slide): every event
    belongs to exactly two windows; the oracle materializes both bucket
    starts explicitly."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n_events", "sum_value")
    )


@query("stream_window_session", f"""
    WITH e AS (SELECT user_id, ts FROM {EVENTS_TS} ev),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM e),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
""")
def stream_window_session(spark, sf_dir):
    """Session windows (30-minute gap) per user.  Spark merges events
    whose [ts, ts+gap) windows overlap — i.e. a new session starts when
    the gap to the previous event is >= 30 minutes (strict overlap);
    the oracle reproduces that via gaps-and-islands."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events")
    )
