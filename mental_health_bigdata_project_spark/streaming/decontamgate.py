"""Streaming benchmark-decontamination gate: the train-once /
apply-per-micro-batch face of ``plans/textops.decontam_benchmark``
(flag-and-drop any training document sharing a token-3-gram with a
held-out eval set — the contamination control every pretraining
ingestion pipeline runs BEFORE documents claim dedup slots or enter
the corpus).

``build_decontam_artifact`` persists the DISTINCT xxhash64
fingerprints of the benchmark corpus's 3-gram shingles — hashes, not
strings, so the artifact is ~8 bytes per distinct shingle and stays a
broadcastable MB-scale set even for large eval suites (the same
"hash the shingles" scale note decontam_benchmark's docstring makes).
``decontam_gate`` returns a ``gate`` callable for the streaming
curation topologies (chunkdedup/spandedup's ``gate=`` hook, same
contract as ``lmgate.lm_tail_gate``): each micro-batch drops documents
whose shingle fingerprints intersect the frozen benchmark set.

Gate semantics are pinned to the batch query by test: on the same
corpus split, the docs the gate drops are EXACTLY the rows
``decontam_benchmark`` (oracle-checked vs DuckDB) flags.

Scale shape per batch: one per-row shingle explode over the batch
only, one broadcast-hash semi-join against the fingerprint set, one
anti-join back on doc_id.  No state grows with the stream; the
artifact is immutable reference data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..plans.textops import tokens_col


def _shingle_fps(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, fp): xxhash64 of each DISTINCT token-3-gram per document —
    the same shingle definition as decontam_benchmark (textops), so
    gate and batch query agree on what counts as contamination."""
    toks = tokens_col(text_col)
    shingles = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                  F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (docs.select(F.col(id_col),
                        F.explode(F.array_distinct(shingles))
                        .alias("shingle"))
            .select(id_col, F.xxhash64("shingle").alias("fp")))


def build_decontam_artifact(benchmark_docs: DataFrame,
                            artifact_dir: str) -> int:
    """Persist the benchmark's distinct shingle fingerprints (the
    frozen contamination set a deployment versions alongside its eval
    suite).  ``benchmark_docs`` needs (doc_id, text).  Returns the
    fingerprint count; refuses an empty set loudly — gating against
    nothing would silently pass every document."""
    fps = (_shingle_fps(benchmark_docs).select("fp").distinct())
    fps.write.mode("overwrite").parquet(os.path.join(artifact_dir, "fps"))
    spark = benchmark_docs.sparkSession
    n = spark.read.parquet(os.path.join(artifact_dir, "fps")).count()
    if n == 0:
        raise ValueError(
            "benchmark corpus produced no 3-gram fingerprints (every doc "
            "has < 3 tokens) — an empty contamination set gates nothing")
    return n


def decontam_gate(spark, artifact_dir: str,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Load the frozen fingerprint set and return a ``gate`` callable:
    drops any document sharing >= 1 shingle with the benchmark."""
    fps = spark.read.parquet(os.path.join(artifact_dir, "fps"))

    def gate(df: DataFrame) -> DataFrame:
        hit = (_shingle_fps(df, id_col, text_col)
               .join(F.broadcast(fps), "fp", "left_semi")
               .select(id_col).distinct())
        return df.join(hit, id_col, "left_anti")

    return gate
