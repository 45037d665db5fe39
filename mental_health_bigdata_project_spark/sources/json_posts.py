"""JSON post-file source (SURVEY.md §2.1 source_json_file).

The reference re-reads and re-parses a whole JSON-array file per HTTP
request (dashboard/app.py:16-28, missing file -> empty).  Here it is a
schema-checked Spark read supporting both layouts (JSON-lines and the
reference's single-array file via multiLine), with the missing-file ->
empty-DataFrame semantics preserved.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import POST_SCHEMA


def read_posts_json(spark: SparkSession, path: str,
                    multi_line: bool = False) -> DataFrame:
    """Load a posts JSON file; missing path -> empty DataFrame with the
    full post schema (the reference's `[]` fallback, dashboard/app.py:24-28)."""
    if not os.path.exists(path):
        return spark.createDataFrame([], POST_SCHEMA)
    return spark.read.schema(POST_SCHEMA).option(
        "multiLine", "true" if multi_line else "false").json(path)
