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
