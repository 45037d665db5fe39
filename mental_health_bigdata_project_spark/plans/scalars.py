"""Scalar-function surface (SURVEY.md §2.7) + the Kafka parse chain
(§2.2 cast_value_string / json_parse_struct / flatten_struct) as
oracle-checkable batch queries.

The streaming originals live in streaming.kafka.read_posts_stream
(CAST value AS STRING -> from_json -> data.*, mirroring reference
preprocessing_streaming.py:102-104); here the same expressions run over
the bounded ``events`` table so DuckDB can check them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..schemas import EVENT_PROPS_SCHEMA
from ..sources import load_table
from .registry import query


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query("cast_value_string", """
    SELECT event_id, decode(encode(props)) AS value_str FROM events
""")
def cast_value_string(spark, sf_dir):
    """binary -> string cast (the Kafka value decode,
    preprocessing_streaming.py:102): round-trips props through bytes."""
    return _events(spark, sf_dir).select(
        "event_id",
        F.encode("props", "utf-8").cast("string").alias("value_str"))


@query("json_parse_struct", """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
""")
def json_parse_struct(spark, sf_dir):
    """from_json with a declared StructType
    (preprocessing_streaming.py:103) — schema-checked JSON parse."""
    return _events(spark, sf_dir).select(
        "event_id",
        F.from_json("props", EVENT_PROPS_SCHEMA).alias("data"),
    ).select("event_id", F.col("data.k").alias("k"))


@query("flatten_struct", """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           event_type
    FROM events
""")
def flatten_struct(spark, sf_dir):
    """select("data.*") struct flattening (preprocessing_streaming.py:104)."""
    nested = _events(spark, sf_dir).select(
        "event_id", "event_type",
        F.from_json("props", EVENT_PROPS_SCHEMA).alias("data"))
    return nested.select("event_id", "data.*", "event_type")


@query("json_serialize", """
    SELECT doc_id,
           to_json(struct_pack(doc_id := doc_id, lang := lang, n_chars := n_chars))::VARCHAR AS payload
    FROM documents
""")
def json_serialize(spark, sf_dir):
    """dict -> JSON string (the producer's Kafka value serializer,
    reddit_collector_kafka.py:18) — both engines emit identical compact
    JSON for struct inputs."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("payload"))


@query("scalar_string_ops", """
    SELECT doc_id,
           lower(substring(text, 1, 50)) AS head_lower,
           upper(lang) AS lang_upper,
           concat(source, ':', lang) AS src_lang,
           CAST(length(text) AS INTEGER) AS text_len,
           trim('  ' || lang || '  ') AS lang_trim
    FROM documents
""")
def scalar_string_ops(spark, sf_dir):
    """§2.7 string surface: substr_truncate / str_lower / concat /
    length / trim as one projection."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.lower(F.substring("text", 1, 50)).alias("head_lower"),
        F.upper("lang").alias("lang_upper"),
        F.concat_ws(":", "source", "lang").alias("src_lang"),
        F.length("text").cast("int").alias("text_len"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("lang_trim"),
    )


@query("scalar_math_ops", """
    SELECT o_orderkey,
           LEAST(CAST(o_totalprice AS DECIMAL(12,2)), 100000.00)::DOUBLE AS capped_price,
           round(CAST(o_totalprice AS DECIMAL(12,2)), 0)::DOUBLE AS rounded_price,
           GREATEST(CAST(o_totalprice AS DECIMAL(12,2)) - 50000.00, 0.00)::DOUBLE AS over_50k,
           abs(CAST(o_totalprice AS DECIMAL(12,2)) - 100000.00)::DOUBLE AS dist_100k
    FROM orders
""")
def scalar_math_ops(spark, sf_dir):
    """§2.7 math surface: least/cap (math_min_cap), round (math_round2),
    greatest, abs — in the decimal domain for cross-engine determinism."""
    p = F.col("o_totalprice").cast("decimal(12,2)")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.least(p, F.lit(100000.00).cast("decimal(12,2)")).cast("double").alias("capped_price"),
        F.round(p, 0).cast("double").alias("rounded_price"),
        F.greatest(p - F.lit(50000.00).cast("decimal(12,2)"),
                   F.lit(0.00).cast("decimal(12,2)")).cast("double").alias("over_50k"),
        F.abs(p - F.lit(100000.00).cast("decimal(12,2)")).cast("double").alias("dist_100k"),
    )


@query("scalar_date_ops", """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(extract(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(extract(month FROM o_orderdate) AS INTEGER) AS order_mon,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_epoch_95
    FROM orders
""")
def scalar_date_ops(spark, sf_dir):
    """§2.7 date/time surface: truncation, extraction, interval
    arithmetic, day difference (ts_* ops minus the wall-clock ones,
    which are nondeterministic by design — SURVEY.md §5.2)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_mon"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.col("o_orderdate"),
                   F.lit("1995-01-01").cast("timestamp_ntz")).cast("int")
        .alias("days_since_epoch_95"),
    )


@query("groupby_collect_posts", """
    SELECT lang, array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM documents GROUP BY lang
""")
def groupby_collect_posts(spark, sf_dir):
    """The reference embeds each group's member posts in its stats
    payload (dashboard/app.py:50-55).  Sorted + serialized to one string
    so the value-hash is order-insensitive and type-stable."""
    sorted_ids = F.array_sort(F.collect_list("doc_id"))
    return _docs(spark, sf_dir).groupBy("lang").agg(
        F.array_join(F.transform(sorted_ids, lambda x: x.cast("string")), ",")
        .alias("doc_ids"))


@query("scalar_string_breadth", """
    SELECT doc_id,
           COALESCE(regexp_extract(lower(text), '([a-z]{4,})', 1), '') AS first_long_word,
           lpad(lang, 6, '_') AS lang_pad,
           translate(lang, 'aeiou', '@3!0u') AS lang_translated,
           CAST(levenshtein(lang, source) AS INTEGER) AS lang_src_dist,
           reverse(lang) AS lang_rev,
           repeat(lang, 2) AS lang_twice,
           split_part(text, ' ', 1) AS first_token,
           CAST(strpos(lower(text), 'the') AS INTEGER) AS the_pos
    FROM documents
""")
def scalar_string_breadth(spark, sf_dir):
    """§2.7 extended string surface: regexp_extract, pad, translate,
    levenshtein (fuzzy-match primitive for entity dedup), reverse,
    repeat, split_part, instr — each a direct JVM expression with an
    exact DuckDB twin (no initcap: capitalization locales differ)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract(F.lower("text"), r"([a-z]{4,})", 1).alias("first_long_word"),
        F.lpad("lang", 6, "_").alias("lang_pad"),
        F.translate("lang", "aeiou", "@3!0u").alias("lang_translated"),
        F.levenshtein("lang", "source").cast("int").alias("lang_src_dist"),
        F.reverse("lang").alias("lang_rev"),
        F.repeat("lang", 2).alias("lang_twice"),
        F.split(F.col("text"), " ").getItem(0).alias("first_token"),
        F.instr(F.lower("text"), "the").cast("int").alias("the_pos"),
    )


@query("scalar_date_breadth", """
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start
    FROM orders
""")
def scalar_date_breadth(spark, sf_dir):
    """§2.7 extended date surface: last_day, quarter, ISO day-of-week
    (Spark weekday() is Mon=0, DuckDB isodow is Mon=1 — aligned by +1),
    day-of-year, week truncation."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        (F.weekday("o_orderdate") + F.lit(1)).cast("int").alias("iso_dow"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
    )


@query("arr_explode_pos", r"""
    SELECT doc_id, u.pos, u.tok FROM (
      SELECT doc_id,
             unnest(list_transform(regexp_split_to_array(trim(lower(text)), '\s+'),
                    (x, i) -> {'pos': i - 1, 'tok': x})) AS u
      FROM documents WHERE length(trim(text)) > 0
    )
""")
def arr_explode_pos(spark, sf_dir):
    """posexplode: tokens with their 0-based position (the UDTF-shaped
    lateral view).  One Generate node per row batch — no shuffle; the
    DuckDB twin is unnest over an index-carrying struct list."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0)
    return (
        d.select("doc_id", F.posexplode(
            F.split(F.trim(F.lower("text")), r"\s+")).alias("pos", "tok"))
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "tok")
    )


@query("arr_explode_outer", r"""
    SELECT doc_id, u AS long_tok FROM (
      SELECT doc_id,
             unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS u
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                               x -> length(x) >= 12) AS l
            FROM documents)
    )
""")
def arr_explode_outer(spark, sf_dir):
    """explode_outer: rows with an empty array survive with a NULL
    element (plain explode would drop them — the left-join-shaped
    generate).  The DuckDB twin pads empty lists with [NULL]."""
    d = load_table(spark, sf_dir, "documents")
    long_toks = F.filter(
        F.split(F.trim(F.lower("text")), r"\s+"),
        lambda x: F.length(x) >= 12)
    return d.select(
        "doc_id", F.explode_outer(long_toks).alias("long_tok"))


@query("arr_set_ops", r"""
    WITH t AS (
      SELECT doc_id,
             list_sort(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))) AS toks
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.toks, b.toks)) AS n_common,
           len(list_distinct(list_concat(a.toks, b.toks))) AS n_union,
           len(list_filter(a.toks, x -> NOT list_contains(b.toks, x))) AS n_only_a
    FROM t a JOIN t b ON b.doc_id = a.doc_id + 1 AND a.doc_id < 50
""")
def arr_set_ops(spark, sf_dir):
    """Per-row array set algebra (intersect/union/except cardinalities
    between adjacent docs) — the vocabulary-overlap primitive under
    Jaccard.  Cardinalities, not arrays, cross the engine boundary:
    element order inside set results is engine-specific, sizes are not."""
    toks = F.array_sort(F.array_distinct(
        F.split(F.trim(F.lower("text")), r"\s+")))
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.length(F.trim("text")) > 0)
         .select("doc_id", toks.alias("toks")))
    a = d.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    return (
        a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("ta", "tb")).alias("n_common"),
            F.size(F.array_union("ta", "tb")).alias("n_union"),
            F.size(F.array_except("ta", "tb")).alias("n_only_a"))
    )


@query("scalar_try_ops", """
    SELECT event_id,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE value / CAST(event_id % 3 AS DOUBLE) END AS safe_ratio,
           TRY_CAST(CASE WHEN event_id % 2 = 0
                         THEN CAST(event_id % 100 AS VARCHAR)
                         ELSE event_type END AS INTEGER) AS et_int,
           CASE WHEN event_id = 0 THEN 9223372036854775807 END AS ovf
    FROM events
""")
def scalar_try_ops(spark, sf_dir):
    """ANSI-error-safe arithmetic (`try_divide` / `try_cast` /
    `try_add`): malformed rows yield NULL instead of failing the job —
    at 100 TB a single poisoned row must not kill a 6-hour pipeline
    (the reference gets this for free because plain Python `.get()`
    defaults swallow everything, kafka_consumer_simple.py:113-119; the
    engine needs it explicit).  The oracle expresses the same semantics
    with guards, pinning exactly which rows degrade to NULL."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.try_divide("value", (F.col("event_id") % 3).cast("double"))
        .alias("safe_ratio"),
        F.expr("try_cast(CASE WHEN event_id % 2 = 0 "
               "THEN CAST(event_id % 100 AS STRING) "
               "ELSE event_type END AS INT)").alias("et_int"),
        F.try_add(F.lit(9223372036854775807).cast("bigint"),
                  F.col("event_id")).alias("ovf"))


@query("agg_arg_extremes", """
    SELECT event_type,
           arg_max(event_id, value * 1e9 + event_id) AS top_event,
           arg_min(event_id, value * 1e9 + event_id) AS bottom_event,
           max(value) AS max_value
    FROM events GROUP BY event_type
""")
def agg_arg_extremes(spark, sf_dir):
    """`max_by` / `min_by`: which row holds the extreme, not just the
    extreme value (the dashboard's "top posts" question as a one-pass
    aggregate instead of a sort).  The selection key folds the row id
    into the value (`value*1e9 + event_id`) so ties are impossible and
    both engines pick the same row — bare max_by on a 2dp value would
    be nondeterministic under parallel merge whenever values collide."""
    ev = _events(spark, sf_dir)
    key = F.col("value") * F.lit(1e9) + F.col("event_id")
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", key).alias("top_event"),
        F.min_by("event_id", key).alias("bottom_event"),
        F.max("value").alias("max_value"))
