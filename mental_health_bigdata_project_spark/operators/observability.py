"""Zero-extra-pass pipeline metrics via ``Dataset.observe``.

At 100 TB, metric collection must ride the pass that does the work: a
separate ``df.count()`` / null-audit re-executes the whole plan (the
reference's dashboard re-aggregates its file per request —
dashboard/app.py:30-85 — the same anti-pattern at toy scale).
``observe`` attaches named aggregate expressions to a point IN the
plan; Spark evaluates them with accumulator semantics during the one
real execution, and the values arrive on the driver after the action
(batch: ``Observation.get``; streaming: each micro-batch's progress
event carries ``observedMetrics``).

Metrics must be aggregate expressions the optimizer cannot drop —
count/sum/min/max over the observed columns — and observation names
must be unique per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.observation import Observation


def observe_corpus_pass(docs: DataFrame, name: str = "corpus_pass"
                        ) -> tuple[DataFrame, Observation]:
    """Attach ingest-quality metrics to a documents pass: row count,
    empty-text count, total characters, and token-count extremes.
    Returns (observed_df, observation) — run ONE action on a plan
    built from observed_df, then ``observation.get`` holds the metrics
    with no second scan."""
    obs = Observation(name)
    n_toks = F.size(F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                             lambda x: x != ""))
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.coalesce(F.length("text"), F.lit(0)) == 0, 1)
              .otherwise(0)).alias("n_empty"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("total_chars"),
        F.min(n_toks).alias("min_tokens"),
        F.max(n_toks).alias("max_tokens"),
    )
    return observed, obs


def observe_stream_batches(stream: DataFrame, name: str = "stream_pass"
                           ) -> DataFrame:
    """Streaming variant: the same expressions attached to an unbounded
    DataFrame.  Each micro-batch's ``StreamingQueryProgress`` then
    carries ``observedMetrics[name]`` — per-batch row/empty counts with
    zero extra passes, the scalable replacement for a metrics sink that
    re-reads the output."""
    return stream.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.coalesce(F.length("text"), F.lit(0)) == 0, 1)
              .otherwise(0)).alias("n_empty"),
    )
