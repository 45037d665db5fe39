"""The reference's REST-poll ingest as a Spark 4 Python Data Source.

The reference polls ``https://www.reddit.com/r/{sub}/new.json?limit=25``
for 3 subreddits in a driver loop and hand-feeds Kafka
(kafka_producer/reddit_collector_kafka.py:62-125).  That loop is a
single-process ingestion bottleneck: one thread, one HTTP request at a
time, synchronous per-record acks (:102).

Here the same source is an *engine-native connector* built on the
Spark 4 Python Data Source API (``pyspark.sql.datasource``):

- **Batch**: one ``InputPartition`` per subreddit — the per-subreddit
  fetches the reference serializes in a Python ``for`` loop
  (reddit_collector_kafka.py:63) become parallel Spark tasks; at
  cluster scale, hundreds of subreddit/page partitions fan out across
  executors.
- **Streaming**: a ``SimpleDataSourceStreamReader`` whose offset is the
  poll number — the 30 s ``while True`` cycle (:62, :125) becomes a
  checkpointable stream with deterministic replay
  (``readBetweenOffsets`` regenerates any poll exactly), upgrading the
  reference's at-least-once, crash-forgets-`seen_ids` semantics (:48).

The live HTTP fetch is STUBBED with a deterministic generator (this
container has no network; the real fetch would drop into ``_poll_rows``
unchanged).  Every field is an integer formula of
(subreddit, poll, index), so a DuckDB ``generate_series`` oracle can
reproduce the batch read value-for-value — the connector's plumbing
(schema, partitions, offsets, replay) is real and oracle-checked.

Field parity with the producer dict (reddit_collector_kafka.py:84-95):
same 10 columns, same defaults (``text``/``url`` default ``''``,
``score``/``num_comments`` default 0).  ``timestamp`` — wall-clock
``datetime.now().isoformat()`` in the reference (:94) — is pinned to a
``created_utc``-derived ISO string for determinism (SURVEY.md §5.2
excludes wall-clock columns from hashed comparisons).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

POST_SCHEMA_DDL = (
    "id string, title string, text string, author string, "
    "subreddit string, created_utc double, score int, num_comments int, "
    "url string, timestamp string"
)

DEFAULT_SUBREDDITS = "depression,Anxiety,mentalhealth"
DEFAULT_LIMIT = 25

# Deterministic selftext cycle; includes real risk keywords (hopeless,
# worthless, anxious, overwhelmed, panic) so downstream risk scoring is
# non-vacuous, plus the empty-selftext default path (:87).
_TEXTS = [
    "i feel hopeless and worthless",
    "had a great day today",
    "feeling anxious about tomorrow",
    "",
    "so overwhelmed with panic",
    "just sharing some thoughts",
    "cant sleep lately",
]


def _poll_rows(sub_index: int, subreddit: str, poll: int, limit: int,
               step: int | None = None):
    """Deterministic stand-in for one GET /r/{sub}/new.json?limit=N.

    Poll p yields global post indices [p*step, p*step + limit) — like
    /new.json, each cycle surfaces newer posts.  With ``step < limit``
    consecutive polls *overlap* (the real /new.json case the producer's
    ``seen_ids`` dedup exists for, reddit_collector_kafka.py:78-81);
    overlapping ids carry identical rows, so downstream
    ``dropDuplicates`` — batch or watermarked — is the exact engine
    replacement.  Pure integer formulas; the DuckDB twin lives in
    plans/spark4_sources.py.
    """
    s = sub_index
    if step is None:
        step = limit
    for i in range(limit):
        g = poll * step + i
        created = 1700000000.0 + g * 30.0
        iso = datetime.fromtimestamp(created, timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S")
        post_id = f"t3_{s * 1000000 + g}"
        yield (
            post_id,
            f"post {g} in r/{subreddit}",
            _TEXTS[g % len(_TEXTS)],
            f"user_{(g * 31 + s * 7) % 97}",
            subreddit,
            created,
            (s * 31 + g * 7) % 500,
            (s * 13 + g * 3) % 50,
            f"https://reddit.com/r/{subreddit}/comments/{post_id}",
            iso,
        )


def _parse_options(options) -> tuple[list[str], int, int]:
    subs = options.get("subreddits", DEFAULT_SUBREDDITS).split(",")
    limit = int(options.get("limit", DEFAULT_LIMIT))
    step = int(options.get("step", limit))
    return subs, limit, step


class _SubredditPartition(InputPartition):
    def __init__(self, sub_index: int, subreddit: str):
        self.sub_index = sub_index
        self.subreddit = subreddit


class RedditPollBatchReader(DataSourceReader):
    """One partition per subreddit: the serialized driver loop of the
    reference (reddit_collector_kafka.py:63) becomes task-parallel."""

    def __init__(self, options):
        self.subs, self.limit, self.step = _parse_options(options)
        self.polls = int(options.get("polls", 1))

    def partitions(self):
        return [_SubredditPartition(s, sub)
                for s, sub in enumerate(self.subs)]

    def read(self, partition: _SubredditPartition):
        for poll in range(self.polls):
            yield from _poll_rows(partition.sub_index, partition.subreddit,
                                  poll, self.limit, self.step)


class RedditPollStreamReader(SimpleDataSourceStreamReader):
    """Offset = poll number.  Each micro-batch is one poll cycle over
    every subreddit (reference: one 30 s ``while True`` iteration,
    reddit_collector_kafka.py:62,125).  Deterministic regeneration makes
    replay exact: a crash between checkpoint commits re-reads the same
    poll and produces identical rows (the reference instead loses its
    in-memory ``seen_ids`` set on restart, :48)."""

    def __init__(self, options):
        self.subs, self.limit, self.step = _parse_options(options)

    def initialOffset(self):
        return {"poll": 0}

    def _rows_for(self, poll: int):
        for s, sub in enumerate(self.subs):
            yield from _poll_rows(s, sub, poll, self.limit, self.step)

    def read(self, start: dict):
        poll = start["poll"]
        return iter(list(self._rows_for(poll))), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for poll in range(start["poll"], end["poll"]):
            yield from self._rows_for(poll)

    def commit(self, end: dict):
        pass


class RedditPollDataSource(DataSource):
    """``spark.read.format("reddit_poll")`` / ``spark.readStream...``.

    Options: ``subreddits`` (csv, default the reference's 3-list,
    reddit_collector_kafka.py:29), ``limit`` (posts per poll per
    subreddit, default 25, :64), ``polls`` (batch only: poll cycles).
    """

    @classmethod
    def name(cls) -> str:
        return "reddit_poll"

    def schema(self) -> str:
        return POST_SCHEMA_DDL

    def reader(self, schema):
        return RedditPollBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return RedditPollStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(RedditPollDataSource)
