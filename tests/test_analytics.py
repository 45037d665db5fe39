"""Dashboard-stats operator tests (FIXTURES.md §4): empty input,
single-group, bucket edges, processed_at ties, serving payload shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.operators import analytics

SCHEMA = ("id string, subreddit string, risk_score int, processed_at string")


def make_posts(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_empty_input_zero_stats(spark):
    df = make_posts(spark, [])
    assert analytics.total_count(df).collect()[0].total == 0
    assert analytics.avg_risk(df).collect()[0].avg_risk is None
    assert analytics.high_risk_count(df).collect()[0].high_risk is None
    hist = {r.bucket: r.n for r in analytics.histogram(df).collect()}
    assert hist == {"0-10": 0, "10-20": 0, "20-30": 0, "30+": 0}


def test_bucket_edges_go_upper(spark):
    """risk=10 -> 10-20, risk=20 -> 20-30, risk=30 -> 30+ (left-closed,
    dashboard/app.py:64-72)."""
    df = make_posts(spark, [
        ("a", "s", 0, "t1"), ("b", "s", 10, "t2"),
        ("c", "s", 20, "t3"), ("d", "s", 30, "t4"),
    ])
    hist = {r.bucket: r.n for r in analytics.histogram(df).collect()}
    assert hist == {"0-10": 1, "10-20": 1, "20-30": 1, "30+": 1}


def test_group_stats_single_group(spark):
    df = make_posts(spark, [("a", "s", 10, "t"), ("b", "s", 30, "t")])
    row = analytics.group_stats(df).collect()[0]
    assert (row.subreddit, row.n_posts, row.total_risk, row.avg_risk) == ("s", 2, 40, 20.0)


def test_high_risk_threshold_inclusive(spark):
    df = make_posts(spark, [("a", "s", 29, "t"), ("b", "s", 30, "t")])
    assert analytics.high_risk_count(df).collect()[0].high_risk == 1


def test_topk_ties_deterministic(spark):
    df = make_posts(spark, [
        ("a", "s", 0, "2024-01-01T00:00:00"),
        ("b", "s", 0, "2024-01-01T00:00:00"),
        ("c", "s", 0, "2024-01-02T00:00:00"),
    ])
    got = [r.id for r in analytics.top_k_recent(df, "processed_at", "id", k=2).collect()]
    assert got == ["c", "b"]  # lexicographic ISO desc, id tiebreak


def test_retain_last_n(spark):
    rows = [(f"id{i:03d}", "s", 0, f"2024-01-01T00:00:{i:02d}") for i in range(20)]
    df = make_posts(spark, rows)
    kept = analytics.retain_last_n(df, "processed_at", "id", n=5).collect()
    assert sorted(r.id for r in kept) == [f"id{i:03d}" for i in range(15, 20)]


def test_stats_payload_shape(spark):
    df = make_posts(spark, [
        ("a", "r1", 10, "2024-01-01T00:00:00"),
        ("b", "r1", 40, "2024-01-01T00:00:01"),
        ("c", "r2", 0, "2024-01-01T00:00:02"),
    ])
    payload = analytics.stats_payload(spark, df, group_col="subreddit")
    assert payload["total_posts"] == 3
    assert payload["high_risk_count"] == 1
    assert payload["by_subreddit"]["r1"]["count"] == 2
    assert payload["risk_distribution"]["30+"] == 1
    assert [p["id"] for p in payload["recent_posts"]] == ["c", "b", "a"]
