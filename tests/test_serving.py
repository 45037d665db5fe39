"""End-to-end reference-topology test: posts JSON stream -> native
enrichment -> incrementally-maintained stats state -> /api/stats
payload, compared against the batch serving layer on the same data."""

from __future__ import annotations

import json

from mental_health_bigdata_project_spark.operators.analytics import stats_payload
from mental_health_bigdata_project_spark.pipeline import enrich_posts
from mental_health_bigdata_project_spark.streaming import pipeline as sp
from mental_health_bigdata_project_spark.streaming import serving as ssv


def _write_batches(tmp_path, n_batches=3, per_batch=4):
    d = tmp_path / "posts_in"
    d.mkdir()
    keywords = ["feeling depressed", "all good", "hopeless and anxious and scared",
                "fine thanks"]
    i = 0
    for b in range(n_batches):
        with open(d / f"batch{b}.json", "w") as f:
            for _ in range(per_batch):
                f.write(json.dumps({
                    "id": f"p{i}", "title": keywords[i % 4], "text": f"body {i}",
                    "author": "a", "subreddit": f"sub{i % 2}",
                    "created_utc": float(i), "score": i, "num_comments": 0,
                    "url": "", "timestamp": f"2024-01-01T00:00:{i:02d}"}) + "\n")
                i += 1
    return str(d)


def test_incremental_stats_match_batch(spark, tmp_path):
    in_dir = _write_batches(tmp_path)
    state_dir = str(tmp_path / "state")
    stream = sp.enriched_stream(sp.read_posts_json_stream(spark, in_dir))
    q = ssv.maintain_stats(stream, state_dir, str(tmp_path / "ckpt"),
                           group_col="subreddit")
    q.awaitTermination(120)

    served = ssv.serve_stats(spark, state_dir)

    batch_df = enrich_posts(
        spark.read.json(in_dir, schema=sp.read_posts_json_stream(spark, in_dir).schema),
        with_processed_at=False).withColumn(
            "processed_at", __import__("pyspark.sql.functions", fromlist=["F"]).lit("x"))
    expected = stats_payload(spark, batch_df)

    assert served["total_posts"] == expected["total_posts"] == 12
    assert served["avg_risk_score"] == expected["avg_risk_score"]
    assert served["high_risk_count"] == expected["high_risk_count"]
    assert served["risk_distribution"] == expected["risk_distribution"]
    for g, st in expected["by_subreddit"].items():
        assert served["by_subreddit"][g]["count"] == st["count"]
        assert served["by_subreddit"][g]["avg_risk"] == st["avg_risk"]
