"""Incremental EXACT set-similarity dedup over a document stream.

The streaming face of ``plans/textops.dedup_setsim_prefix``: each
micro-batch drops documents whose token-3-gram Jaccard with anything
already accepted (or with a lower-id batch-mate) reaches the
threshold — exact, not LSH: every drop is backed by a full
``array_intersect`` verification, so there are no false positives and
the prefix filter guarantees no false negatives.

Design (foreachBatch + two persisted index tables, NOT per-row state):

- **Element order**: the batch query orders each doc's shingles
  rarest-first by corpus document frequency — the best-pruning order,
  but df DRIFTS as a stream grows, and a prefix index written under
  yesterday's order would be unsound against today's.  Prefix
  filtering is lossless under ANY fixed total order, so the streaming
  index pins the order to md5(shingle) — content-defined, stable
  forever, zero maintenance.  Pruning quality becomes
  data-independent (a random permutation) instead of optimal; the
  positional and size bounds still apply unchanged.
- **Index tables** under ``index_dir``: ``prefix`` rows
  (shingle, doc_id, p, sz) — one row per PREFIX element of each
  accepted doc (~(1-t)·|s|+1 of them), the candidate-probe side; and
  ``arrs`` rows (doc_id, arr, sz) — the full sorted element arrays,
  read ONLY for the candidates' verification join.  Both partitioned
  by the batch that added them.
- **Exactly-once on replay**: accepted output and both index deltas
  land in ``batch_id=N`` partitions via dynamic partition overwrite,
  and every index read prunes ``batch_id < N`` (``_read_index``'s
  before_batch) so a crash-retried batch never sees its own delta
  (the round-4 replay fix class).

Within-batch semantics are greedy keep-min: a doc is dropped if any
verified duplicate pair links it to a lower doc_id (or to any prior
accepted doc).  On a chain A~B~C with A!~C this over-deletes C — the
same documented trade-off as the LSH twin; the batch path resolves
chains via dedup_cluster_components.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..plans.textops import (setsim_candidates_between, setsim_prefix_rows,
                             setsim_shingles, setsim_verify_pairs, tokens_col)
from .neardup import _read_index

_T = 0.5


def _prefix_path(index_dir: str) -> str:
    return os.path.join(index_dir, "prefix")


def _arrs_path(index_dir: str) -> str:
    return os.path.join(index_dir, "arrs")


def setsim_arrays(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, arr, sz): per-doc element arrays sorted in the FIXED
    md5-content order (not corpus df — see module docstring).  Docs
    with no shingles (<3 tokens) produce no row."""
    d = df.select(F.col(id_col).alias("doc_id"),
                  tokens_col(text_col).alias("toks"))
    sh = setsim_shingles(d)
    return (sh.groupBy("doc_id")
            .agg(F.transform(
                F.sort_array(F.collect_list(
                    F.struct(F.md5("shingle").alias("h"), F.col("shingle")))),
                lambda s: s["shingle"]).alias("arr"))
            .withColumn("sz", F.size("arr")))


def dedup_setsim_batch_against_index(batch_df: DataFrame, batch_id: int,
                                     out_dir: str, index_dir: str,
                                     id_col: str = "doc_id",
                                     text_col: str = "text",
                                     t: float = _T) -> None:
    """One micro-batch of incremental exact setsim dedup (the
    foreachBatch body, callable directly for tests / backfills)."""
    spark = batch_df.sparkSession
    # the shingle->sort pipeline feeds the prefix probe, both index
    # deltas, and the verify joins — materialize once
    arrs = setsim_arrays(batch_df, id_col, text_col) \
        .localCheckpoint(eager=True)
    pre = setsim_prefix_rows(arrs, t)
    # <3-token docs have no element set: nothing can reach J >= t
    # against them, so they are auto-accepted (mirrors the batch twin,
    # whose per_doc index simply never contains them)
    setless = (batch_df.select(F.col(id_col).alias("doc_id"))
               .join(arrs.select("doc_id"), "doc_id", "left_anti"))

    prior_pre = _read_index(spark, _prefix_path(index_dir),
                            ["shingle", "doc_id", "p", "sz"],
                            before_batch=batch_id)
    prior_arrs = _read_index(spark, _arrs_path(index_dir),
                             ["doc_id", "arr", "sz"],
                             before_batch=batch_id)
    # a crash between the two index writes can leave `prefix` committed
    # without `arrs` for the batch being replayed; before_batch pruning
    # already hides that delta, and requiring BOTH tables here keeps the
    # first-batch replay (arrs path absent entirely) well-defined
    if prior_pre is not None and prior_arrs is not None:
        # batch side probes the accepted-corpus index: pin a shuffled
        # hash join — the index outgrows broadcast (the SCALING.md §2b
        # flapping lesson from the LSH twin)
        cand = setsim_candidates_between(
            pre, prior_pre.hint("shuffle_hash"), F.lit(True), t)
        dup_prior = setsim_verify_pairs(cand, arrs, prior_arrs, t)
        dropped = dup_prior.select(F.col("doc_a").alias("doc_id")).distinct()
        # the prior-probe join + verify is the batch's expensive cross-
        # corpus work and `live` feeds FIVE consumers below (the
        # within-batch prefix rows, both verify sides, the kept
        # anti-join) — materialize it once
        live = (arrs.join(dropped, "doc_id", "left_anti")
                .localCheckpoint(eager=True))
    else:
        live = arrs

    # within-batch greedy keep-min among survivors of the prior probe:
    # any verified pair drops its higher id
    live_pre = setsim_prefix_rows(live, t)
    wcand = setsim_candidates_between(live_pre, live_pre,
                                      F.col("doc_a") > F.col("doc_b"), t)
    wdup = setsim_verify_pairs(wcand, live, live, t)
    losers = wdup.select(F.col("doc_a").alias("doc_id")).distinct()
    kept = live.join(losers, "doc_id", "left_anti") \
        .localCheckpoint(eager=True)

    kept_ids = kept.select("doc_id").unionByName(setless)
    accepted = batch_df.join(
        kept_ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi")
    (accepted.withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(os.path.join(out_dir, "accepted")))
    (setsim_prefix_rows(kept, t)
     .withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(_prefix_path(index_dir)))
    (kept.select("doc_id", "arr", "sz")
     .withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(_arrs_path(index_dir)))


def run_incremental_setsim_dedup(stream: DataFrame, out_dir: str,
                                 checkpoint_dir: str, index_dir: str,
                                 id_col: str = "doc_id",
                                 text_col: str = "text",
                                 t: float = _T):
    """Attach the incremental exact-setsim sink to a document stream
    and drain available input (availableNow)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        dedup_setsim_batch_against_index(batch_df, batch_id, out_dir,
                                         index_dir, id_col, text_col, t)

    return (stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
