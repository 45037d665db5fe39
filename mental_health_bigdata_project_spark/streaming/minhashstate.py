"""Incremental per-group MinHash signatures over a document stream —
the SIXTH mergeable streaming state, and the first with an IDEMPOTENT
combine (hllcount merges registers by MAX, momentstate/cmsstate/
topkstate by ADDITION; this merges signatures by MIN).

Each micro-batch reduces to one 16-value signature row per group: the
per-(group, s) minimum of ``md5(md5(shingle) || '-s')`` over the
batch's token 3-gram shingles — the exact hash family of
``plans/similarity.portable_minhash_sigs``, so the folded stream state
is BY CONSTRUCTION the signature the batch pipeline computes over the
ingested union: min over batches of per-batch minima == min over the
union (min is associative AND commutative AND idempotent).

Idempotence is the distinguishing property: a duplicated delta — a
batch folded twice, an at-least-once sink, overlapping backfills —
cannot change the served state, which no SUM-combined member can say.
The parity/idempotence tests pin both.

Serving folds the deltas and emits the pairwise estimated-Jaccard
overlap matrix between groups (the streaming face of the exact
``source_overlap_matrix`` governance query: 16-hash estimates instead
of exact fingerprint intersections, O(#groups) state instead of
O(#fingerprints)).

Exactly-once story as every sibling: a delta depends only on its own
batch, lands in its own ``batch_id=N`` partition via dynamic partition
overwrite, and a crash-retried batch overwrites itself bit-identically
— and even a NON-overwritten duplicate would be absorbed by the
min-fold.  Compaction folds deltas to one row per group.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..plans.similarity import N_MINHASH
from ..plans.textops import tokens_col

_SIG_COLS = [f"m{s}" for s in range(N_MINHASH)]


def _sigs_path(index_dir: str) -> str:
    return os.path.join(index_dir, "sigs")


def group_minhash_sigs(docs: DataFrame, group_col: str = "source",
                       text_col: str = "text") -> DataFrame:
    """(group, m0..m15) — the portable md5-family minhash signature of
    the UNION of token 3-gram shingle sets of the group's docs.  The
    per-shingle hash chain is identical to
    plans/similarity.portable_minhash_sigs; grouping by source instead
    of doc_id is the only difference, so per-doc and per-group
    signatures share one vocabulary of hash values."""
    d = docs.select(F.col(group_col), tokens_col(text_col).alias("toks"))
    shingles = F.when(
        F.size("toks") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.concat_ws(" ", F.element_at("toks", i),
                                  F.element_at("toks", i + 1),
                                  F.element_at("toks", i + 2))),
    ).otherwise(F.array().cast("array<string>"))
    hs = (d.select(group_col,
                   F.explode(F.array_distinct(shingles)).alias("shingle"))
          .select(group_col, F.md5("shingle").alias("h")))
    return hs.groupBy(group_col).agg(*[
        F.min(F.md5(F.concat(F.col("h"), F.lit(f"-{s}")))).alias(f"m{s}")
        for s in range(N_MINHASH)
    ])


def minhash_batch(batch_df: DataFrame, batch_id: int, index_dir: str,
                  group_col: str = "source") -> None:
    """One micro-batch of signature maintenance (the foreachBatch
    body): one 16-hash row per group seen in the batch."""
    (group_minhash_sigs(batch_df, group_col)
     .withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(_sigs_path(index_dir)))


def read_group_sigs(spark, index_dir: str,
                    group_col: str = "source") -> DataFrame:
    """Fold the signature deltas by MIN — equal to the batch signature
    over the ingested union."""
    from .neardup import _read_index

    sigs = _read_index(spark, _sigs_path(index_dir),
                       [group_col, *_SIG_COLS])
    if sigs is None:
        raise FileNotFoundError(f"no sig index at {_sigs_path(index_dir)}")
    return sigs.groupBy(group_col).agg(
        *[F.min(c).alias(c) for c in _SIG_COLS])


def read_overlap(spark, index_dir: str,
                 group_col: str = "source") -> DataFrame:
    """(group_a, group_b, est_jaccard) — the pairwise 16-hash Jaccard
    estimate between every group pair, from #groups rows of state.
    The #groups x #groups comparison is metadata-sized (sources,
    shards, crawls — never documents)."""
    sigs = read_group_sigs(spark, index_dir, group_col)
    a = sigs.select(F.col(group_col).alias("group_a"),
                    *[F.col(c).alias(f"a_{c}") for c in _SIG_COLS])
    b = sigs.select(F.col(group_col).alias("group_b"),
                    *[F.col(c).alias(f"b_{c}") for c in _SIG_COLS])
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    agree = None
    for c in _SIG_COLS:
        term = (F.col(f"a_{c}") == F.col(f"b_{c}")).cast("int")
        agree = term if agree is None else agree + term
    return pairs.select(
        "group_a", "group_b",
        F.round(agree / F.lit(float(N_MINHASH)), 6).alias("est_jaccard"))


def run_incremental_minhash(stream: DataFrame, checkpoint_dir: str,
                            index_dir: str, **kwargs):
    """Attach the signature sink to a document stream and drain
    available input."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        minhash_batch(batch_df, batch_id, index_dir, **kwargs)

    return (stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def compact_minhash_index(spark, index_dir: str, through: int) -> dict:
    """Min-fold compaction: deltas collapse to one row per group."""
    from .compaction import compact_index

    def fold(live: DataFrame) -> DataFrame:
        grp = [c for c in live.columns if c not in _SIG_COLS]
        return live.groupBy(*grp).agg(
            *[F.min(c).alias(c) for c in _SIG_COLS])

    return compact_index(spark, _sigs_path(index_dir), through,
                         transform=fold)
