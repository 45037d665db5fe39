"""Pretrained-LM quality gate for streaming curation: the
train-once / apply-per-micro-batch face of quality_ppl_buckets
(CCNet's filtering loop — Wenzek et al. 2020 train a LM on trusted
text and route incoming documents by perplexity).

``build_lm_artifact`` fits the add-1-smoothed bigram LM on a TRUSTED
reference corpus and persists the model as parquet tables (bigram
counts, unigram counts + vocab size, and the tail cutoff — the
33rd-percentile reference score).  ``lm_tail_gate`` returns a
``gate`` callable for the streaming dedup topologies
(chunkdedup/spandedup's ``gate=`` hook): each micro-batch is scored
under the FROZEN artifact and documents scoring below the reference
tail cutoff are dropped before they can claim dedup slots.

Scoring generalizes the batch chain to unseen text (a stream will
contain words the reference never saw): unseen bigrams take the
smoothed floor ln(1/(c(w1)+V)) with c(w1)=0 for unseen unigrams —
the proper add-1 application, so gibberish scores very negative
instead of being silently unscored.  Documents with fewer than 2
tokens carry no LM evidence and pass the gate.

Scale shape: the LM tables are the reference corpus's Zipf head
(bigram table ~= head squared) — loaded per batch as a hash-join
build side; scoring is the batch's bigram stream joined against
them plus one per-doc mean.  No state grows with the stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..plans.textops import tokens_col


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    t = docs.select("doc_id", tokens_col().alias("t"))
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (t.select("doc_id", F.explode(bigrams).alias("b"))
            .select("doc_id", F.col("b.w1").alias("w1"),
                    F.col("b.w2").alias("w2")))


def _score(flat: DataFrame, c12: DataFrame, uf: DataFrame,
           v: int) -> DataFrame:
    """(doc_id, avg_logp) under the frozen LM; unseen (w1,w2)/(w1)
    coalesce to zero counts — the smoothed add-1 floor."""
    logp = F.round(
        F.log((F.coalesce(F.col("n12"), F.lit(0)).cast("double") + 1.0)
              / (F.coalesce(F.col("n1"), F.lit(0)).cast("double")
                 + F.lit(float(v)))),
        6).cast("decimal(18,6)")
    return (flat.join(c12, ["w1", "w2"], "left")
            .join(uf.withColumnRenamed("token", "w1"), "w1", "left")
            .select("doc_id", logp.alias("logp"))
            .groupBy("doc_id")
            .agg((F.sum("logp").cast("double") / F.count("*"))
                 .alias("avg_logp")))


def build_lm_artifact(reference_docs: DataFrame, artifact_dir: str) -> None:
    """Fit the bigram LM + tail cutoff on trusted text and persist it
    (the model artifact a deployment versions alongside its code).
    ``reference_docs`` needs (doc_id, text)."""
    flat = _doc_bigrams(reference_docs)
    c12 = flat.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    uf = (reference_docs.select(F.explode(tokens_col()).alias("token"))
          .groupBy("token").agg(F.count("*").alias("n1")))
    c12.write.mode("overwrite").parquet(os.path.join(artifact_dir, "c12"))
    uf.write.mode("overwrite").parquet(os.path.join(artifact_dir, "uf"))
    # materialize-once: the cutoff pass scores against the parquet just
    # written, not the live c12/uf lineages — otherwise the full
    # explode+groupBy chain would re-execute inside count() and _score
    # (~4x artifact-build cost on a large reference corpus)
    spark = reference_docs.sparkSession
    c12_t = spark.read.parquet(os.path.join(artifact_dir, "c12"))
    uf_t = spark.read.parquet(os.path.join(artifact_dir, "uf"))
    v = uf_t.count()
    scores = _score(flat, c12_t, uf_t, v)
    cut = scores.agg(
        F.expr("percentile_disc(0.33) WITHIN GROUP (ORDER BY avg_logp)")
        .alias("t_tail")).collect()[0]["t_tail"]
    if cut is None:
        raise ValueError(
            "reference corpus has no scorable documents (every doc has "
            "< 2 tokens) — cannot fit a bigram-LM tail cutoff")
    (spark.createDataFrame([(int(v), float(cut))], "v bigint, t_tail double")
     .write.mode("overwrite").parquet(os.path.join(artifact_dir, "meta")))


def lm_tail_gate(spark, artifact_dir: str):
    """Load the frozen artifact and return a ``gate`` callable for the
    streaming curation topologies: drops documents scoring below the
    reference tail cutoff; docs with <2 tokens (no LM evidence) pass."""
    c12 = spark.read.parquet(os.path.join(artifact_dir, "c12"))
    uf = spark.read.parquet(os.path.join(artifact_dir, "uf"))
    meta = spark.read.parquet(os.path.join(artifact_dir, "meta")).collect()[0]
    v, t_tail = int(meta["v"]), float(meta["t_tail"])

    def gate(df: DataFrame) -> DataFrame:
        scores = _score(_doc_bigrams(df), c12, uf, v)
        drop = scores.filter(F.col("avg_logp") < t_tail).select("doc_id")
        return df.join(drop, "doc_id", "left_anti")

    return gate
