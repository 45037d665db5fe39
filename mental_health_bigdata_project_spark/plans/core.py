"""Core reference-surface queries (SURVEY.md §2.2, §2.4, §2.5) on the
driver testdata: ``documents`` stands in for the posts table (text ->
clean/risk; ``lang`` ~ ``subreddit``), ``events`` for the arrival-ordered
stream (SURVEY.md FIXTURES §5 mapping).

Every query here is a single declarative plan: parquet scan (pruned to
the referenced columns), native expressions, at most one shuffle for the
aggregations — the shape that survives a 100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    DISTRESS_KEYWORDS,
    HIGH_RISK_THRESHOLD,
    RISK_BUCKET_SQL,
    clean_text,
    clean_text_sql,
    risk_bucket,
    risk_score,
    risk_score_sql,
)
from ..sources import load_table
from .registry import EVENTS_TS, query

_RISK = risk_score_sql("text")
_CLEAN = clean_text_sql("text")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- projections / scalar pipeline (§2.2, §2.7, §2.8) --------------------

@query("project_processed", f"""
    SELECT doc_id,
           substring(text, 1, 500) AS text_stored,
           substring({_CLEAN}, 1, 200) AS cleaned_text,
           {_RISK} AS risk_score
    FROM documents
""")
def project_processed(spark, sf_dir):
    """The enrichment projection (reference preprocessing_streaming.py:
    106-134) on documents: score on FULL text, truncate stored columns
    after (kafka_consumer_simple.py:123-138 ordering)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.substring("text", 1, 500).alias("text_stored"),
        F.substring(clean_text(F.col("text")), 1, 200).alias("cleaned_text"),
        risk_score(F.col("text")).alias("risk_score"),
    )


@query("agg_keyword_hits", """
    SELECT doc_id, CAST({terms} AS INTEGER) AS n_hits
    FROM documents
""".format(terms=" + ".join(
    "(CASE WHEN contains(lower(text), '{k}') THEN 1 ELSE 0 END)".format(
        k=k.replace("'", "''")) for k in DISTRESS_KEYWORDS)))
def agg_keyword_hits(spark, sf_dir):
    """Uncapped keyword-hit count per document (the inner sum of
    preprocessing_streaming.py:59-66 before the x10/cap)."""
    lowered = F.lower(F.col("text"))
    hits = F.lit(0)
    for k in DISTRESS_KEYWORDS:
        hits = hits + F.when(lowered.contains(k), 1).otherwise(0)
    return _docs(spark, sf_dir).select("doc_id", hits.cast("int").alias("n_hits"))


@query("null_default_fill", """
    SELECT doc_id,
           COALESCE(lang, 'unknown') AS lang_filled,
           COALESCE(source, 'N/A') AS source_filled,
           COALESCE(text, '') AS text_filled
    FROM documents
""")
def null_default_fill(spark, sf_dir):
    """The reference's `.get(k, default)` boundary semantics
    (reddit_collector_kafka.py:85-93) as coalesce exprs."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.coalesce("lang", F.lit("unknown")).alias("lang_filled"),
        F.coalesce("source", F.lit("N/A")).alias("source_filled"),
        F.coalesce("text", F.lit("")).alias("text_filled"),
    )


@query("filter_nonempty_text", """
    SELECT doc_id, n_chars FROM documents
    WHERE text IS NOT NULL AND text <> ''
""")
def filter_nonempty_text(spark, sf_dir):
    """Empty/None-text guard (preprocessing_streaming.py:42-43) as a
    pushed-down predicate."""
    df = _docs(spark, sf_dir)
    return df.filter(F.col("text").isNotNull() & (F.col("text") != "")).select("doc_id", "n_chars")


@query("filter_high_risk", f"""
    SELECT doc_id, lang, {_RISK} AS risk_score
    FROM documents WHERE {_RISK} >= {HIGH_RISK_THRESHOLD}
""")
def filter_high_risk(spark, sf_dir):
    """risk_score >= 30 predicate (dashboard/app.py:45).  The synthetic
    documents contain no distress keywords, so this is empty at every
    scale — correct, and kept at the reference's threshold; risk_score
    VALUE coverage comes from the golden-record and property tests over
    real post fixtures (tests/test_text_functions.py)."""
    df = _docs(spark, sf_dir).select(
        "doc_id", "lang", risk_score(F.col("text")).alias("risk_score"))
    return df.filter(F.col("risk_score") >= HIGH_RISK_THRESHOLD)


@query("filter_risk_bucket", f"""
    SELECT doc_id, {RISK_BUCKET_SQL.format(c=_RISK)} AS bucket
    FROM documents
""")
def filter_risk_bucket(spark, sf_dir):
    """Range-bucket labelling (dashboard/app.py:64-72)."""
    # Two selects, not risk_bucket(risk_score(...)) inline: the bucket
    # CASE references the score 3x, and inlining would triplicate the
    # 16-term contains tree in codegen (~3x compile time; CollapseProject
    # keeps the boundary because the expression is non-cheap and multiply
    # referenced).
    return (
        _docs(spark, sf_dir)
        .select("doc_id", risk_score(F.col("text")).alias("risk"))
        .select("doc_id", risk_bucket(F.col("risk")).alias("bucket")))


# --- aggregations (§2.4) -------------------------------------------------

@query("agg_total_count", "SELECT count(*) AS total FROM documents")
def agg_total_count(spark, sf_dir):
    return _docs(spark, sf_dir).agg(F.count("*").alias("total"))


@query("agg_avg_risk", f"SELECT AVG({_RISK}) AS avg_risk FROM documents")
def agg_avg_risk(spark, sf_dir):
    """Global mean risk (dashboard/app.py:44).  Integer sum -> one double
    division: bit-identical across engines, no rounding games needed."""
    return _docs(spark, sf_dir).agg(
        F.avg(risk_score(F.col("text"))).alias("avg_risk"))


@query("agg_high_risk_count", f"""
    SELECT CAST(count(*) FILTER (WHERE {_RISK} >= {HIGH_RISK_THRESHOLD}) AS BIGINT) AS high_risk
    FROM documents
""")
def agg_high_risk_count(spark, sf_dir):
    return _docs(spark, sf_dir).agg(
        F.sum(F.when(risk_score(F.col("text")) >= HIGH_RISK_THRESHOLD, 1).otherwise(0))
        .cast("bigint").alias("high_risk"))


@query("groupby_subreddit", f"""
    SELECT lang,
           count(*) AS n_posts,
           CAST(SUM({_RISK}) AS BIGINT) AS total_risk,
           AVG({_RISK}) AS avg_risk
    FROM documents GROUP BY lang
""")
def groupby_subreddit(spark, sf_dir):
    """Per-group count/sum/avg (dashboard/app.py:48-59); ``lang`` is the
    subreddit analog.  One hash-agg shuffle with map-side partials."""
    return (
        _docs(spark, sf_dir)
        .select("lang", risk_score(F.col("text")).alias("r"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_posts"),
             F.sum("r").cast("bigint").alias("total_risk"),
             F.avg("r").alias("avg_risk"))
    )


@query("histogram_risk_buckets", f"""
    WITH buckets(bucket) AS (VALUES ('0-10'), ('10-20'), ('20-30'), ('30+')),
    counts AS (
        SELECT {RISK_BUCKET_SQL.format(c=_RISK)} AS bucket, count(*) AS c
        FROM documents GROUP BY 1
    )
    SELECT b.bucket, CAST(COALESCE(c.c, 0) AS BIGINT) AS n
    FROM buckets b LEFT JOIN counts c ON b.bucket = c.bucket
""")
def histogram_risk_buckets(spark, sf_dir):
    """Fixed-edge histogram incl. zero buckets (dashboard/app.py:62-72);
    the 4-row bucket table is broadcast."""
    from ..operators.analytics import RISK_BUCKETS
    df = (_docs(spark, sf_dir)
          .select(risk_score(F.col("text")).alias("risk"))
          .select(risk_bucket(F.col("risk")).alias("bucket")))  # split: see filter_risk_bucket
    counts = df.groupBy("bucket").agg(F.count("*").alias("c"))
    buckets = spark.createDataFrame([(b,) for b in RISK_BUCKETS], ["bucket"])
    return (
        counts.join(F.broadcast(buckets), "bucket", "right")
        .select("bucket", F.coalesce("c", F.lit(0)).cast("bigint").alias("n"))
    )


# --- sorts / limits / dedup over the event stream (§2.2, §2.5) -----------

@query("topk_recent", f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM {EVENTS_TS}
    ORDER BY ts DESC, event_id DESC LIMIT 10
""")
def topk_recent(spark, sf_dir):
    """Newest-10 (dashboard/app.py:75) with a deterministic tiebreak;
    compiles to TakeOrderedAndProject (per-partition top-k, no shuffle)."""
    return (
        _events(spark, sf_dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(10)
    )


@query("retain_last_n", f"""
    SELECT event_id, ts, user_id, event_type, value FROM (
        SELECT event_id, ts, user_id, event_type, value,
               row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rn
        FROM {EVENTS_TS}
    ) WHERE rn <= 100
""")
def retain_last_n(spark, sf_dir):
    """The consumer's 100-deep ring buffer (kafka_consumer_simple.py:14,
    104,143).  orderBy+limit compiles to TakeOrderedAndProject —
    per-partition top-100 merged on the driver — instead of the global
    row_number window that shuffled the whole table to one partition
    (VERDICT r1 weak #2)."""
    return (
        _events(spark, sf_dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
    )


@query("dedup_by_id", f"""
    SELECT user_id, event_id, ts FROM (
        SELECT user_id, event_id, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM {EVENTS_TS}
    ) WHERE rn = 1
""")
def dedup_by_id(spark, sf_dir):
    """First-seen-wins dedup (reference seen_ids set,
    reddit_collector_kafka.py:48,78-81) made deterministic: earliest
    (ts, event_id) per user.  dropDuplicates would be order-dependent;
    row_number pins the survivor.  Streaming twin:
    streaming.dedup.watermarked_dedup (bounded state)."""
    # earliest-(ts, event_id) survivor as a min(struct) aggregate —
    # map-side combinable, so a hot user_id (power users at corpus
    # scale) collapses per task instead of sorting in one window
    # partition
    return (
        _events(spark, sf_dir)
        .select("user_id", F.struct("ts", "event_id").alias("r"))
        .groupBy("user_id").agg(F.min("r").alias("r"))
        .select("user_id", "r.event_id", "r.ts")
    )


# --- json/map extraction (§2.7 [EXT]) ------------------------------------

@query("json_extract_path", """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
    FROM events
""")
def json_extract_path(spark, sf_dir):
    """get_json_object path extraction over events.props."""
    return _events(spark, sf_dir).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@query("map_props_extract", """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
""")
def map_props_extract(spark, sf_dir):
    """Typed from_json struct extraction (the schema-declared twin of
    json_extract_path; reference parses JSON this way at
    preprocessing_streaming.py:103)."""
    from ..schemas import EVENT_PROPS_SCHEMA
    return (
        _events(spark, sf_dir)
        .select("event_id", F.from_json("props", EVENT_PROPS_SCHEMA).alias("p"))
        .select("event_id", F.col("p.k").alias("k"))
    )
