"""End-to-end corpus curation: the pipeline a pretraining data run
actually materializes, composed from the registry operators' shared
DataFrame-level cores in their canonical order:

    1. quality gate       — Gopher rule battery (gopher_rules_df)
    2. sub-document dedup — C4 chunk rewrite (chunk_rewrite_df), plus
                            an opt-in ExactSubstr span rewrite
                            (span_rewrite_df) for offset-shifted
                            duplicate passages
    3. document dedup     — near-dup survivor selection
                            (survivor_select_df)
    4. shuffle-and-shard  — seeded permutation (shard_shuffle_df)
    5. write              — shard-partitioned parquet, one sorted file
                            per shard

Each stage is the same plan as its registry query (each oracle-checked
individually); this module wires them into a single lineage and owns
the write.  The composition order matters and mirrors published
pipelines (C4, Gopher, RefinedWeb): quality-filter BEFORE dedup so
junk can't claim first-occurrence chunk slots, sub-document dedup
BEFORE document dedup so boilerplate removal exposes near-dups, and
near-dup clustering runs ON the rewritten text; sharding is computed
over the FINAL surviving set so positions are dense per shard.

Scale posture: every stage keeps its registry plan's shuffle profile;
the final write repartitions on the shard id so each shard directory
gets exactly one file, sorted by in-shard position — the layout a
sequential training reader wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def curate_corpus(spark: SparkSession, sf_dir: str, out_dir: str,
                  min_kept_chunk_frac: float = 0.0,
                  span_dedup: bool = False,
                  exact_near_dedup: bool = False) -> DataFrame:
    """Run the full curation pipeline over ``{sf_dir}/documents.parquet``
    and write the surviving corpus to ``{out_dir}/corpus`` partitioned
    by shard.  Returns the per-stage attrition report (one row per
    stage: documents remaining after it).

    ``min_kept_chunk_frac``: additionally drop documents whose
    chunk-rewrite retained fraction falls below this bound (0.0 keeps
    any document with at least one surviving chunk).

    ``span_dedup``: additionally run the ExactSubstr span rewrite
    (overlapping 8-token windows, _span_frames/span_rewrite_df) after
    the chunk rewrite — catches duplicated passages at token offsets
    the NON-overlapping 30-token chunk alignment misses; documents
    whose every token is a later duplicate occurrence drop out here.

    ``exact_near_dedup``: replace the LSH pair detection in stage 3
    with the EXACT prefix-filtered setsim join (dedup_setsim_prefix's
    pipeline): verified Jaccard >= 0.5 pairs feed the same min-label
    component propagation, and each component keeps its longest
    member (doc_id tiebreak) — the identical survivor heuristic as
    the LSH path, so the flag changes only DETECTION.  No LSH false
    positives can delete a unique document and no banding miss can
    keep a duplicate — at the cost of the exact join's verify stage
    (pruning measured in SCALING.md §11).
    """
    from ..plans.similarity import survivor_select_df
    from ..plans.textops import (_span_frames, chunk_rewrite_df,
                                 gopher_rules_df, shard_shuffle_df,
                                 span_rewrite_df)
    from ..sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n0 = docs.count()

    # 1. quality gate on the raw corpus.  The required-word rule is
    # calibrated to this corpus's function words ("the"/"a" — the
    # synthetic vocabulary has no be/to/of/...); a real run passes the
    # target language's list, exactly as Gopher does per language.
    # each stage is checkpointed once computed: the attrition counts
    # and every downstream stage read the materialized result instead
    # of re-executing the upstream lineage (a real run persists stage
    # outputs to durable storage for exactly this reason)
    kept = docs.join(
        gopher_rules_df(docs, stops=["the", "a"])
        .filter("keep").select("doc_id"), "doc_id", "semi").localCheckpoint()
    n1 = kept.count()

    # 2. C4 chunk rewrite over the kept docs only (junk can't claim
    #    first-occurrence slots); re-expose the rewritten text as
    #    `text` so downstream stages run on the cleaned corpus
    rewritten = (chunk_rewrite_df(kept)
                 .filter(F.col("n_kept") > 0)
                 .filter(F.col("n_kept")
                         >= F.lit(min_kept_chunk_frac) * F.col("n_chunks"))
                 ).localCheckpoint()
    rw_docs = rewritten.select("doc_id",
                               F.col("text_rewritten").alias("text"))
    n2 = rw_docs.count()

    # 2b (opt-in). ExactSubstr span rewrite on the chunk-cleaned text:
    # overlapping windows catch offset-shifted duplicate passages the
    # chunk alignment can't; same retain-one-occurrence rule, so the
    # stages compose rather than fight over survivors
    span_row = []
    if span_dedup:
        t, spans = _span_frames(rw_docs)
        spanned = (span_rewrite_df(t, spans)
                   .filter(F.col("kept_tokens") > 0)).localCheckpoint()
        rw_docs = spanned.select("doc_id",
                                 F.col("text_rewritten").alias("text"))
        rewritten = (rewritten.drop("text_rewritten")
                     .join(rw_docs.withColumnRenamed("text",
                                                     "text_rewritten"),
                           "doc_id"))
        span_row = [("span_rewrite", rw_docs.count())]

    # 3. near-dup survivor selection ON the rewritten text — chunk
    #    removal turns shared-boilerplate docs into tighter near-dups,
    #    which is exactly when survivor selection should see them
    if exact_near_dedup:
        from ..plans.similarity import _min_label_components
        from ..plans.textops import (setsim_candidates, setsim_index,
                                     setsim_shingles, setsim_verify,
                                     tokens_col)
        d = rw_docs.select("doc_id", tokens_col("text").alias("toks"))
        per_doc = setsim_index(setsim_shingles(d))
        pairs = (setsim_verify(per_doc, setsim_candidates(per_doc))
                 .select("doc_a", "doc_b"))
        labels = _min_label_components(pairs)
        # SAME survivor heuristic as the LSH path (survivor_select_df:
        # longest doc wins, doc_id breaks ties) so the flag changes
        # only pair DETECTION, never which member of an agreed cluster
        # survives — expressed as a skew-safe min(struct) aggregate
        nt = rw_docs.select(
            "doc_id", F.size(tokens_col("text")).cast("int").alias("nt"))
        clustered = nt.join(labels, "doc_id")   # docs in no pair survive
        winners = (clustered
                   .groupBy("label")
                   .agg(F.min(F.struct((-F.col("nt")).alias("neg_nt"),
                                       F.col("doc_id").alias("doc_id")))
                        .alias("w"))
                   .select(F.col("w.doc_id").alias("doc_id")))
        losers = (clustered.select("doc_id")
                  .join(winners, "doc_id", "left_anti"))
        survivors = (rw_docs.select("doc_id")
                     .join(losers, "doc_id", "left_anti"))
    else:
        survivors = survivor_select_df(rw_docs).select("doc_id")
    deduped = (rewritten.join(survivors, "doc_id", "semi")
               .localCheckpoint())
    n3 = deduped.count()

    # 4-5. seeded shard + dense in-shard position over the FINAL set;
    # one sorted file per shard directory
    shards = shard_shuffle_df(deduped.select("doc_id"))
    final = (deduped.join(shards, "doc_id")
             .select("doc_id", "shard", "pos", "n_chunks", "n_kept",
                     F.col("text_rewritten").alias("text")))
    (final.repartition(F.col("shard"))
     .sortWithinPartitions("shard", "pos")
     .write.mode("overwrite").partitionBy("shard")
     .parquet(f"{out_dir}/corpus"))

    report = spark.createDataFrame(
        [("input", n0), ("quality_gate", n1), ("chunk_rewrite", n2)]
        + span_row + [("near_dedup", n3)],
        "stage string, docs bigint")
    report.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/report")
    return report
