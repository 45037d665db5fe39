"""Incremental frequent-items (top-k) state over a stream.

The streaming face of plans/sketches.sketch_topk_native_merge: each
micro-batch reduces its rows to ONE Datasketches frequent-items state
per group (Spark 4 ``approx_top_k_accumulate`` — a parquet-writable
struct of sketch binary + metadata), appended to a log-structured
parquet index; serving ``approx_top_k_combine``s all deltas and
estimates the top-k.  In the sketch's exact regime streaming == batch
holds item-for-item (pinned by the parity test against the
oracle-green ``text_token_freq``); past capacity the estimates degrade
to the sketch's guaranteed error instead of the state growing with the
vocabulary.

Same 100 TB design as the HLL/CMS/moments states in this package:

- The per-batch delta is ONE state row per group regardless of batch
  row count — contrast an exact counter, whose (group, token) state
  grows with the vocabulary ever seen.
- A delta depends only on its own batch (no read-modify-write), so a
  crash-retried batch overwrites its own ``batch_id=N`` partition
  bit-identically — exactly-once replay with no ``before_batch``
  pruning.
- ``compact_topk_index`` folds deltas by per-group combine during
  consolidation (the sketch-aware compaction), leaving one state row
  per group independent of stream age.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

# items tracked per sketch — far above the test corpora's vocabulary,
# so local runs sit in the exact regime; a deployment sizes this to
# its error budget (the sketch stays KB-sized either way)
MAX_ITEMS_TRACKED = 100_000


def _state_path(index_dir: str) -> str:
    return os.path.join(index_dir, "topk_state")


def accumulate_batch(batch_df: DataFrame, batch_id: int, index_dir: str,
                     item_col: str = "token",
                     group_cols: tuple[str, ...] = ("source",)) -> None:
    """One micro-batch of state maintenance (the foreachBatch body,
    callable directly for tests / backfills): reduce the batch to its
    (group..., st) sketch delta and overwrite this batch's own
    partition."""
    delta = (batch_df.groupBy(*group_cols)
             .agg(F.expr(f"approx_top_k_accumulate({item_col}, "
                         f"{MAX_ITEMS_TRACKED})").alias("st")))
    (delta.withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(_state_path(index_dir)))


def read_topk(spark, index_dir: str, k: int = 20,
              group_cols: tuple[str, ...] = ("source",),
              overall: bool = True) -> DataFrame:
    """Serve the top-k: combine every delta's state (and, when
    ``overall``, across groups too — the rollup never re-reads the
    stream), then estimate.  Output: (rnk, item, n) with rnk following
    counts."""
    from .neardup import _read_index

    st = _read_index(spark, _state_path(index_dir), [*group_cols, "st"])
    if st is None:
        raise FileNotFoundError(
            f"no top-k state index at {_state_path(index_dir)}")
    agg = st if overall else st.groupBy(*group_cols)
    merged = agg.agg(
        F.expr(f"approx_top_k_estimate(approx_top_k_combine(st), {k})")
        .alias("tk"))
    keep = [] if overall else list(group_cols)
    return (merged.select(*keep, F.posexplode("tk").alias("pos", "e"))
            .select(*keep, (F.col("pos") + 1).cast("int").alias("rnk"),
                    F.col("e.item").alias("item"),
                    F.col("e.count").cast("bigint").alias("n")))


def run_incremental_topk(stream: DataFrame, checkpoint_dir: str,
                         index_dir: str, item_col: str = "token",
                         group_cols: tuple[str, ...] = ("source",)):
    """Attach the state-maintenance sink to a stream and drain
    available input (availableNow)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        accumulate_batch(batch_df, batch_id, index_dir, item_col,
                         group_cols)

    return (stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def compact_topk_index(spark, index_dir: str, through: int) -> dict:
    """Sketch-aware compaction: states FOLD by per-group combine during
    consolidation, so the compacted store holds one state row per group
    independent of how many batches were folded.  Correctness is the
    same associativity the serve path relies on; manifest / GC /
    replay-guard mechanics are compaction.compact_index's."""
    from .compaction import compact_index

    def fold(live: DataFrame) -> DataFrame:
        grp = [c for c in live.columns if c != "st"]
        return live.groupBy(*grp).agg(
            F.expr(f"approx_top_k_combine(st, {MAX_ITEMS_TRACKED})")
            .alias("st"))

    return compact_index(spark, _state_path(index_dir), through,
                         transform=fold)
