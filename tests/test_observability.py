"""Pins for the observe()-based zero-extra-pass metrics
(operators/observability.py): batch metrics match a direct
aggregation, and streaming progress events carry per-batch observed
metrics."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_observe_corpus_pass_matches_direct_agg(spark, sf_dir):
    from mental_health_bigdata_project_spark.operators.observability import (
        observe_corpus_pass)
    from mental_health_bigdata_project_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    observed, obs = observe_corpus_pass(docs)
    # one real action drives both the work AND the metrics
    n_out = observed.filter(F.col("n_chars") >= 0).count()
    got = obs.get
    direct = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.coalesce(F.length("text"), F.lit(0)) == 0, 1)
              .otherwise(0)).alias("n_empty"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("total_chars"),
    ).collect()[0]
    assert got["n_rows"] == direct["n_rows"] == n_out
    assert got["n_empty"] == direct["n_empty"]
    assert got["total_chars"] == direct["total_chars"]
    assert 0 <= got["min_tokens"] <= got["max_tokens"]


def test_observe_stream_batches_in_progress_events(spark, tmp_path):
    import json as _json
    from mental_health_bigdata_project_spark.operators.observability import (
        observe_stream_batches)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with open(in_dir / "b0.json", "w") as f:
        f.write(_json.dumps({"doc_id": 1, "text": "alpha beta"}) + "\n")
        f.write(_json.dumps({"doc_id": 2, "text": ""}) + "\n")

    stream = (spark.readStream
              .schema("doc_id bigint, text string")
              .json(str(in_dir)))
    q = (observe_stream_batches(stream, "ingest")
         .writeStream.format("noop")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(60)
    # recentProgress carries observedMetrics for each non-empty batch
    metrics = [p["observedMetrics"]["ingest"]
               for p in q.recentProgress
               if p.get("observedMetrics", {}).get("ingest")]
    assert metrics, f"no observed metrics in {q.recentProgress}"
    total_rows = sum(m["n_rows"] for m in metrics)
    total_empty = sum(m["n_empty"] for m in metrics)
    assert total_rows == 2 and total_empty == 1
