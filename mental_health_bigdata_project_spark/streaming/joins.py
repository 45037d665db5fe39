"""[EXT] Streaming joins (SURVEY.md §2.9 extension): stream-stream
interval joins and stream-static dimension enrichment.

The reference has no joins at all (SURVEY §2.3); these are the two
join modes Structured Streaming supports and a 100 TB event pipeline
needs: correlating two live streams within a time bound (state-stored,
watermark-evicted) and enriching a stream against a slowly-changing
dimension (re-read per micro-batch, broadcast when small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_stream_view_purchase(views: DataFrame, purchases: DataFrame,
                                within: str = "30 minutes",
                                watermark: str = "1 hour",
                                how: str = "inner") -> DataFrame:
    """Stream-stream join: purchases matched to a same-user view that
    happened up to ``within`` before.  Both sides carry watermarks and
    the join condition carries the time bound — that pair is what lets
    the state store evict rows older than watermark+bound instead of
    buffering both streams forever.

    ``how="left_outer"`` emits a view with NULL purchase columns once
    the watermark proves no purchase can still arrive for it — outer
    results are therefore watermark-delayed by construction."""
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"))
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"))
    return v.join(
        p,
        F.expr(f"""v_user = p_user
                   AND purchase_ts >= view_ts
                   AND purchase_ts <= view_ts + interval {within}"""),
        how,
    ).select("view_id", "purchase_id", F.col("v_user").alias("user_id"),
             "view_ts", "purchase_ts")


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         on: str) -> DataFrame:
    """Stream-static join: each micro-batch joins against the current
    snapshot of the static side (re-planned per batch, so a refreshed
    dimension table is picked up without restarting the query); small
    dims broadcast."""
    return stream.join(F.broadcast(dim), on, "left")
