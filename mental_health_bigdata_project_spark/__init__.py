"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference `Rahma-jelassi/mental-health-bigdata-project`
(surveyed in SURVEY.md), re-expressed Spark-first:

- ``functions``  — native Column expressions (text cleaning, risk scoring,
  array/vector math).  Policy: no row-at-a-time Python UDFs; the two
  reference UDFs (reference spark_jobs/preprocessing_streaming.py:39-68)
  are re-expressed as Catalyst-optimizable expressions.
- ``sources``    — parquet/JSON/Kafka readers with schema handling.
- ``operators``  — composable DataFrame -> DataFrame query builders
  (dashboard analytics, joins, aggregates, windows, set ops, dedup,
  similarity, text analysis, multimodal plumbing).
- ``plans``      — the query registry wired into ``__spark_entry__.py``
  (each query id maps to a Spark builder + a DuckDB oracle SQL twin).
- ``streaming``  — Structured Streaming assembly (watermarks, windows,
  stateful dedup, foreachBatch sinks).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
