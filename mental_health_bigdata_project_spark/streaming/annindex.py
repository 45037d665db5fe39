"""Incremental vector-search (IVFADC) index over a stream.

The streaming face of plans/similarity.sim_ivfpq_topk: micro-batches
of (vec_id, embedding) rows are ingested into a log-structured ANN
index — exactly the 100 TB vector-serving layout, built online:

- **Quantizers are per-vector deterministic** (md5-Rademacher IVF
  cells and PQ codes — the oracle-green portable recipes), so a
  batch's cell/code assignment depends only on its own rows: no
  read-modify-write, and a crash-retried batch overwrites its own
  ``batch_id=N`` partitions bit-identically (exactly-once).
- **The codebook is MERGEABLE state**: per-(sub, code, j) integer
  partial sums (sum of quantized components + count) per batch, folded
  at serve time into exact means — bit-identical to the batch-built
  codebook over the ingested union, because integer addition is
  associative.  Same for the per-(cell, pos) coarse-centroid partials
  that rank probe cells.
- **Serving is the batch plan on the stored artifacts**: rank cells by
  decimal-summed centroid cosine, probe the top ``nprobe``, score
  candidates by PQ asymmetric distance against a 128-row broadcast
  table, carry the exact distance per candidate — every fold uses the
  identical 9dp-decimal expressions, so ``search_topk`` over an
  ingested corpus HASH-MATCHES ``sim_ivfpq_topk`` run in batch over
  the same rows (pinned in tests/test_streaming_ann.py).
- **Compaction is cell-aware**: codes and raw components consolidate
  PARTITIONED BY CELL, so a steady-state probe reads nprobe/k of the
  store partition-pruned; the codebook partials fold to one row per
  (sub, code, j).

Three log-structured tables under ``index_dir``:
  codes/    (vec_id, cell, sub, code)        — the 4-bit PQ index rows
  vecs/     (vec_id, sub, j, qv, xv)         — raw components (exact
                                               rescoring / refinement)
  cbook/    (sub, code, j, s_qv, n)          — codebook partials
  cellcen/  (cell, pos, s_qv, n)             — coarse-centroid partials
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..plans.similarity import (_IVF_N_PROBE, _PQ_SUBDIM, _ivf_cells,
                                _pq_assign)


def _p(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, name)


def _write_delta(df: DataFrame, batch_id: int, path: str) -> None:
    (df.withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id")
     .parquet(path))


def index_batch(batch_df: DataFrame, batch_id: int, index_dir: str) -> None:
    """One micro-batch of index maintenance (the foreachBatch body):
    assign cells and PQ codes to the batch's vectors (deterministic,
    batch-local) and append the four deltas."""
    cells = _ivf_cells(batch_df).localCheckpoint(eager=True)
    assigned, _ = _pq_assign(batch_df, materialize=True)
    codes = (assigned.filter(F.col("j") == 0)
             .select("vec_id", "sub", "code")
             .join(cells.select("vec_id", "cell"), "vec_id"))
    _write_delta(codes, batch_id, _p(index_dir, "codes"))
    _write_delta(assigned.select("vec_id", "sub", "j", "qv", "xv"),
                 batch_id, _p(index_dir, "vecs"))
    cbook = (assigned.groupBy("sub", "code", "j")
             .agg(F.sum("qv").alias("s_qv"), F.count("qv").alias("n")))
    _write_delta(cbook, batch_id, _p(index_dir, "cbook"))
    cellcen = (cells.select("cell", F.posexplode("q").alias("pos", "qv"))
               .groupBy("cell", "pos")
               .agg(F.sum("qv").alias("s_qv"), F.count("qv").alias("n")))
    _write_delta(cellcen, batch_id, _p(index_dir, "cellcen"))


def _read(spark, index_dir: str, name: str, cols) -> DataFrame:
    from .neardup import _read_index

    df = _read_index(spark, _p(index_dir, name), cols)
    if df is None:
        raise FileNotFoundError(f"no {name} table under {index_dir}")
    return df


def search_topk(spark, index_dir: str, query_vec_id: int = 1) -> DataFrame:
    """Serve the IVFADC search from the persisted index: candidates in
    the query's top-``_IVF_N_PROBE`` cells scored by ADC, exact
    squared distance riding along — the same output schema and values
    as the batch ``sim_ivfpq_topk`` over the ingested union
    (vec_id, cell, adc_dist, exact_dist)."""
    dsum9 = lambda c: (F.sum(F.round(c, 9).cast("decimal(28,9)"))  # noqa: E731
                       .cast("double"))
    dsum9_38 = lambda c: (F.sum(F.round(c, 9).cast("decimal(38,9)"))  # noqa: E731
                          .cast("double"))
    vecs = _read(spark, index_dir, "vecs",
                 ["vec_id", "sub", "j", "qv", "xv"])
    codes = _read(spark, index_dir, "codes",
                  ["vec_id", "cell", "sub", "code"])
    # exact integer-mean codebook from the folded partials (sum of
    # per-batch sums == corpus sum: merge-lossless)
    cen = (_read(spark, index_dir, "cbook",
                 ["sub", "code", "j", "s_qv", "n"])
           .groupBy("sub", "code", "j")
           .agg((F.sum("s_qv").cast("double") / F.sum("n")
                 / F.lit(1_000_000.0)).alias("cv")))
    qe = (vecs.filter(F.col("vec_id") == query_vec_id)
          .select("sub", "j", F.col("xv").alias("qx"))
          .localCheckpoint(eager=True))
    # coarse probe: rank cells by decimal-summed centroid cosine
    cellcen = (_read(spark, index_dir, "cellcen",
                     ["cell", "pos", "s_qv", "n"])
               .groupBy("cell", "pos")
               .agg((F.sum("s_qv").cast("double") / F.sum("n")
                     / F.lit(1_000_000.0)).alias("centroid_val")))
    qpos = qe.select((F.col("sub") * _PQ_SUBDIM + F.col("j")).alias("pos"),
                     F.col("qx"))
    sc = (cellcen.join(F.broadcast(qpos), "pos")
          .groupBy("cell")
          .agg(dsum9_38(F.col("centroid_val") * F.col("qx")).alias("dot"),
               dsum9_38(F.col("centroid_val") * F.col("centroid_val"))
               .alias("cnorm2")))
    probe = (sc.orderBy(F.desc(F.col("dot") / F.sqrt(F.col("cnorm2"))),
                        "cell")
             .limit(_IVF_N_PROBE).select("cell"))
    # the probe list is <= _IVF_N_PROBE rows BY CONSTRUCTION — collect
    # it and push the cell predicate down as a literal isin so the
    # compacted cell-partitioned codes store is PARTITION-PRUNED at
    # plan time (a broadcast join on the partition column does not
    # trigger DPP in this shape — verified; the setsimdedup
    # touched-bucket pushdown, bounded edition)
    probe_cells = [r["cell"] for r in probe.collect()]
    codes_probed = codes.filter(F.col("cell").isin(probe_cells))
    dt = (cen.join(F.broadcast(qe), ["sub", "j"])
          .groupBy("sub", "code")
          .agg(dsum9((F.col("cv") - F.col("qx"))
                     * (F.col("cv") - F.col("qx"))).alias("d")))
    adc = (codes_probed
           .join(F.broadcast(dt), ["sub", "code"])
           .groupBy("vec_id", "cell")
           .agg(F.round(dsum9(F.col("d")), 6).alias("adc_dist")))
    cand_ids = codes_probed.select("vec_id")
    exact = (vecs.join(cand_ids, "vec_id", "left_semi")
             .join(F.broadcast(qe), ["sub", "j"])
             .groupBy("vec_id")
             .agg(F.round(dsum9((F.col("xv") - F.col("qx"))
                                * (F.col("xv") - F.col("qx"))), 6)
                  .alias("exact_dist")))
    return (adc.join(exact, "vec_id")
            .filter(F.col("vec_id") != query_vec_id)
            .select("vec_id", "cell", "adc_dist", "exact_dist"))


def run_incremental_ann(stream: DataFrame, checkpoint_dir: str,
                        index_dir: str):
    """Attach the index-maintenance sink to a stream of
    (vec_id, embedding) rows and drain available input."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        index_batch(batch_df, batch_id, index_dir)

    return (stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def compact_ann_index(spark, index_dir: str, through: int) -> dict:
    """Cell-aware compaction: codes and raw components consolidate
    PARTITIONED BY CELL (codes) so steady-state probes read nprobe/k
    of the store partition-pruned; the codebook / coarse-centroid
    partials FOLD by integer sum to one row per key.  Returns the four
    new manifests."""
    from .compaction import compact_index

    def fold(keys):
        def f(live: DataFrame) -> DataFrame:
            return live.groupBy(*keys).agg(
                F.sum("s_qv").alias("s_qv"), F.sum("n").alias("n"))
        return f

    out = {
        "codes": compact_index(spark, _p(index_dir, "codes"), through,
                               partition_by=["cell"]),
        "vecs": compact_index(spark, _p(index_dir, "vecs"), through),
        "cbook": compact_index(spark, _p(index_dir, "cbook"), through,
                               transform=fold(["sub", "code", "j"])),
        "cellcen": compact_index(spark, _p(index_dir, "cellcen"), through,
                                 transform=fold(["cell", "pos"])),
    }
    return out
