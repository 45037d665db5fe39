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


def read_posts_json_strict(spark: SparkSession, path: str) -> DataFrame:
    """Malformed-input-aware read: PERMISSIVE mode with a
    `_corrupt_record` capture column, so bad lines are quarantined as
    rows instead of silently nulling fields or failing the job (at
    100 TB some corrupt records are a certainty; FAILFAST would kill a
    full pipeline run for one of them).  Filter `_corrupt_record IS NOT
    NULL` to route them to a dead-letter sink."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        POST_SCHEMA.fields + [StructField("_corrupt_record", StringType())])
    if not os.path.exists(path):
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
