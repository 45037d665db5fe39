"""Fixed schemas.

``POST_SCHEMA`` mirrors the reference's declared stream schema
(reference spark_jobs/preprocessing_streaming.py:75-86; producer dict
kafka_producer/reddit_collector_kafka.py:84-95).  The processed-record
column set is the union of the two reference output variants (SURVEY.md
§1.2).  Driver-testdata schemas are declared for schema-checked streaming
reads (Structured Streaming file sources require explicit schemas).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw Reddit-post record, exactly as the reference declares it.
POST_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("author", T.StringType()),
    T.StructField("subreddit", T.StringType()),
    T.StructField("created_utc", T.DoubleType()),
    T.StructField("score", T.IntegerType()),
    T.StructField("num_comments", T.IntegerType()),
    T.StructField("url", T.StringType()),
    T.StructField("timestamp", T.StringType()),
])

# Per-field defaults injected at every boundary in the reference
# (kafka_producer/reddit_collector_kafka.py:85-93,
#  spark_jobs/kafka_consumer_simple.py:113-119, dashboard/app.py:44-75).
POST_DEFAULTS = {
    "title": "",
    "text": "",
    "author": "N/A",
    "subreddit": "N/A",
    "score": 0,
    "num_comments": 0,
    "url": "",
}

# Processed-record columns: union of the Spark variant
# (preprocessing_streaming.py:124-134) and the consumer variant
# (kafka_consumer_simple.py:128-140).
PROCESSED_COLUMNS = [
    "id", "title", "text", "author", "subreddit", "score",
    "num_comments", "url", "timestamp", "cleaned_text", "risk_score",
    "processed_at",
]

# Driver testdata schemas (events.ts arrives as NANOS -> read via
# nanosAsLong and normalized to TIMESTAMP_NTZ by sources.tables).
EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])

# JSON schema of events.props (synthetic: {"k": <int>}).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])
