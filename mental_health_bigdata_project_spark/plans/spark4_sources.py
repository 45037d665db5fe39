"""Queries over the Python Data Source connector (sources/restpoll.py).

``source_rest_poll`` is the one SURVEY.md §2.1 row the engine previously
left as "ingestion outside the engine"; the Spark 4 Python Data Source
API lets it be a first-class connector instead.  The connector's fake
feed is pure integer formulas, so DuckDB can regenerate the *entire
source relation* with ``generate_series`` — the oracle checks the
connector end to end (schema, per-subreddit partitions, row content),
not just a downstream transform.
"""

from __future__ import annotations

from ..sources import restpoll
from .registry import query

# DuckDB twin of sources.restpoll._poll_rows for the default 3
# subreddits.  g = poll*step + i; the batch read concatenates polls.
_GEN_SQL = """
    WITH subs(s, sub) AS (
        VALUES (0, 'depression'), (1, 'Anxiety'), (2, 'mentalhealth')),
    polls AS (SELECT p FROM generate_series(0, {max_poll}) t(p)),
    idx AS (SELECT i FROM generate_series(0, {max_i}) t(i)),
    rows AS (
        SELECT s, sub, p * {step} + i AS g FROM subs, polls, idx)
    SELECT
      't3_' || (s * 1000000 + g) AS id,
      'post ' || g || ' in r/' || sub AS title,
      CASE g % 7 WHEN 0 THEN 'i feel hopeless and worthless'
                 WHEN 1 THEN 'had a great day today'
                 WHEN 2 THEN 'feeling anxious about tomorrow'
                 WHEN 3 THEN ''
                 WHEN 4 THEN 'so overwhelmed with panic'
                 WHEN 5 THEN 'just sharing some thoughts'
                 ELSE 'cant sleep lately' END AS text,
      'user_' || ((g * 31 + s * 7) % 97) AS author,
      sub AS subreddit,
      CAST(1700000000 + g * 30 AS DOUBLE) AS created_utc,
      CAST((s * 31 + g * 7) % 500 AS INTEGER) AS score,
      CAST((s * 13 + g * 3) % 50 AS INTEGER) AS num_comments,
      'https://reddit.com/r/' || sub || '/comments/t3_' ||
        (s * 1000000 + g) AS url,
      strftime(make_timestamp((1700000000 + g * 30) * 1000000),
               '%Y-%m-%dT%H:%M:%S') AS "timestamp"
    FROM rows
"""


@query("source_rest_poll",
       _GEN_SQL.format(max_poll=0, max_i=24, step=25))
def source_rest_poll(spark, sf_dir):
    """One poll cycle through the connector: 3 subreddits x 25 posts,
    read as one InputPartition per subreddit (parallel fetch vs the
    reference's serialized loop, reddit_collector_kafka.py:62-64).
    sf_dir is unused — the source *is* the relation under test."""
    restpoll.register(spark)
    return spark.read.format("reddit_poll").load()


@query("rest_poll_dedup", f"""
    WITH all_rows AS ({_GEN_SQL.format(max_poll=2, max_i=24, step=12)})
    SELECT subreddit, count(DISTINCT id) AS n_unique, count(*) AS n_raw
    FROM all_rows GROUP BY subreddit
""")
def rest_poll_dedup(spark, sf_dir):
    """Three overlapping polls (step 12 < limit 25: each poll re-lists
    13 posts the previous one already returned, like a real /new.json
    listing) then id-dedup — the engine twin of the producer's
    ``seen_ids`` set (reddit_collector_kafka.py:48,78-81), as a
    shuffle-once distinct count instead of unbounded driver memory.
    n_raw counts the duplicated feed (75/subreddit), n_unique the
    distinct posts (49)."""
    import pyspark.sql.functions as F
    restpoll.register(spark)
    raw = (spark.read.format("reddit_poll")
           .option("polls", 3).option("step", 12).load())
    return raw.groupBy("subreddit").agg(
        F.countDistinct("id").alias("n_unique"),
        F.count("*").alias("n_raw"))
