"""[EXT] Grouped Arrow-batched transforms (applyInPandas) — the
custom-stateful-operator escape hatch SURVEY.md §2.8 plans, shown on a
real normalization workload and oracle-checked against the equivalent
window SQL.

applyInPandas is the right tool when per-group logic genuinely exceeds
expression semantics (iterative algorithms, model scoring per group);
here the per-user z-score keeps an oracle twin to prove the plumbing is
value-correct, and the docstring notes when NOT to use it (this exact
query is expressible as a window function — at 100 TB the native
window wins because it skips the Arrow round trip).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources import load_table
from .registry import EVENTS_TS, query


@query("grouped_zscore_by_user", f"""
    SELECT event_id, user_id, value,
           CASE WHEN count(*) OVER w > 1
                THEN round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 6)
           END AS zscore
    FROM {EVENTS_TS}
    WINDOW w AS (PARTITION BY user_id)
""")
def grouped_zscore_by_user(spark, sf_dir):
    """Per-user z-score normalization via applyInPandas (pandas
    mean/std(ddof=1) inside Arrow batches, one group per call).  Rounded
    to 6dp on both sides: pandas and DuckDB compute variance with
    different summation orders."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["value"].std(ddof=1)
        if len(pdf) > 1 and pd.notna(s) and s != 0:
            pdf["zscore"] = ((pdf["value"] - pdf["value"].mean()) / s).round(6)
        else:
            pdf["zscore"] = pd.NA
        return pdf[["event_id", "user_id", "value", "zscore"]]

    return ev.groupBy("user_id").applyInPandas(
        zscore, "event_id bigint, user_id bigint, value double, zscore double")


@query("cogroup_asof_enrich", f"""
    WITH e AS (SELECT * FROM {EVENTS_TS}),
    purchases AS (SELECT event_id, user_id, ts, value FROM e
                  WHERE event_type = 'purchase'),
    clicks AS (SELECT user_id, ts AS click_ts, value AS click_value FROM e
               WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, c.click_ts, c.click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.click_ts <= p.ts
""")
def cogroup_asof_enrich(spark, sf_dir):
    """Cogrouped-Arrow as-of merge: two keyed relations co-partitioned
    on user_id, each group pair handed to pandas ``merge_asof`` (the
    API for per-key logic that needs BOTH sides at once — beyond what
    one-input applyInPandas can express).  Same semantics as the native
    union-then-window join_asof_events; this exists to cover the
    cogroup surface, and the native variant remains the 100 TB default
    (cogroup pays two shuffles + Arrow transfer, but still streams one
    bounded group pair at a time — no driver collect)."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"))

    out_cols = ["event_id", "user_id", "ts", "click_ts", "click_value"]

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=out_cols)
        left = left.sort_values("ts")
        if right.empty:
            left["click_ts"] = pd.NaT
            left["click_value"] = pd.NA
            return left[out_cols]
        right = right.sort_values("click_ts")
        out = pd.merge_asof(left, right[["click_ts", "click_value"]],
                            left_on="ts", right_on="click_ts",
                            direction="backward")
        return out[out_cols]

    return purchases.groupBy("user_id").cogroup(
        clicks.groupBy("user_id")).applyInPandas(
        merge,
        "event_id bigint, user_id bigint, ts timestamp_ntz, "
        "click_ts timestamp_ntz, click_value double")
