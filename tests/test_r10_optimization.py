"""Round-10 optimization equivalence tests: every rewrite of an
operator's INTERNALS this round must keep its outputs bit-identical —
these tests pin the equivalences directly (the oracle gate re-proves
them end-to-end at 3 SFs).

- decode_wav_batch (vectorized cross-file ADPCM recurrence) vs the
  per-payload sequential decode_wav, including multi-block, odd-nibble,
  samples_per_block-truncated, empty and error cases;
- encode_wav_adpcm_bytes (direct container build) vs encode_wav_adpcm
  over the (lo, hi) nibble expansion it specializes;
- the vectorized synth sample maps vs the scalar encoders;
- artifacts.read_or_build computing (not reading disk) when no
  $SPARK_GRAFT_ARTIFACT_DIR store is configured.
"""

from __future__ import annotations

import os

import pytest


def _adpcm_reference(payload):
    from mental_health_bigdata_project_spark.operators.media import decode_wav
    return decode_wav(payload)


def test_decode_wav_batch_matches_sequential_adpcm():
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, decode_wav_batch, encode_wav_adpcm)

    payloads = [
        encode_wav_adpcm([]),                          # no block at all
        encode_wav_adpcm([7]),                         # single code
        encode_wav_adpcm([1, 2, 3, 4, 5, 6, 7, 8, 9]),  # odd count (pad)
        encode_wav_adpcm(list(range(16)) * 20),        # all codes, long
        encode_wav_adpcm([15, 15, 15, 15] * 50),       # clamp at +-32767
        encode_wav_adpcm([8, 8, 8, 8] * 50),           # negative walk
    ]
    got = decode_wav_batch(payloads)
    want = [decode_wav(p) for p in payloads]
    assert got == want


def test_decode_wav_batch_matches_sequential_multiblock():
    """A hand-built TWO-block ADPCM container (nonzero initial
    predictor/step-index in the second block, no fmt extension so no
    samples_per_block truncation) decodes identically."""
    import struct

    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, decode_wav_batch)

    block1 = struct.pack("<hBB", 100, 5, 0) + bytes([0x21, 0x9F])
    block2 = struct.pack("<hBB", -2000, 40, 0) + bytes([0x73])
    data = block1 + block2
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 8000, len(block1), 4)
    payload = (b"RIFF" + struct.pack("<I", 28 + len(fmt) + len(data))
               + b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
    assert decode_wav_batch([payload]) == [decode_wav(payload)]


def test_decode_wav_batch_truncates_by_samples_per_block():
    """samples_per_block smaller than 1 + n_codes drops trailing codes
    in both decoders (the odd-nibble pad case generalized)."""
    import struct

    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, decode_wav_batch)

    block = struct.pack("<hBB", 0, 0, 0) + bytes([0x54, 0x32, 0x10])
    for spb in (0, 1, 2, 4, 6, 7):
        fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000,
                          len(block), 4, 2, spb)
        payload = (b"RIFF"
                   + struct.pack("<I", 28 + len(fmt) + len(block))
                   + b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", len(block)) + block)
        assert decode_wav_batch([payload]) == [decode_wav(payload)], spb


def test_decode_wav_batch_mixed_formats_and_errors():
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, decode_wav_batch, encode_wav_adpcm,
        encode_wav_float32, encode_wav_mulaw, encode_wav_pcm16)

    payloads = [
        encode_wav_pcm16([0, 1000, -1000, 32767, -32768]),
        encode_wav_float32([0.5, -0.25, 0.0]),
        encode_wav_mulaw(bytes([0, 127, 128, 255])),
        encode_wav_adpcm([3, 12, 0, 15]),
    ]
    assert decode_wav_batch(payloads) == [decode_wav(p) for p in payloads]
    with pytest.raises(ValueError):
        decode_wav_batch([encode_wav_pcm16([1, 2, 3])[:-3]])


def test_encode_wav_adpcm_bytes_matches_nibble_expansion():
    from mental_health_bigdata_project_spark.operators.media import (
        encode_wav_adpcm, encode_wav_adpcm_bytes)

    for bs in (b"", b"a", b"hello world", bytes(range(256)),
               "mixed \t\n punctuation!?".encode("utf-8")):
        want = encode_wav_adpcm(
            [c for b in bs for c in (b & 0x0F, b >> 4)])
        assert encode_wav_adpcm_bytes(bs) == want


def test_vectorized_synth_sample_maps_match_scalar_encoders():
    """The numpy sample maps inside synth_wav_corpus /
    synth_wav_float32_corpus build byte-identical containers to the
    scalar encoders they replaced."""
    import numpy as np

    from mental_health_bigdata_project_spark.operators.media import (
        _wav_container, encode_wav_float32, encode_wav_pcm16)

    for text in ("", "a", "The quick brown fox", "punct!? 42\n"):
        bs = text.encode("utf-8")
        pcm_fast = _wav_container(1, 16, (
            (np.frombuffer(bs, np.uint8).astype(np.int32) % 128 - 64)
            * 256).astype("<i2").tobytes(), 8000)
        assert pcm_fast == encode_wav_pcm16(
            [(b % 128 - 64) * 256 for b in bs])
        f32_fast = _wav_container(3, 32, (
            (np.frombuffer(bs, np.uint8).astype(np.float64) % 128 - 64)
            / 64.0).astype("<f4").tobytes(), 8000)
        assert f32_fast == encode_wav_float32(
            [(b % 128 - 64) / 64.0 for b in bs])


def test_read_or_build_is_session_local_without_store_env(
        spark, sf_dir, tmp_path, monkeypatch):
    """With no $SPARK_GRAFT_ARTIFACT_DIR the artifact layer neither
    reads nor writes any store directory — every invocation computes
    from the inputs (round-10 rule: bench/oracle runs must not reuse
    persisted intermediates keyed on the test data)."""
    monkeypatch.delenv("SPARK_GRAFT_ARTIFACT_DIR", raising=False)

    from mental_health_bigdata_project_spark import artifacts

    assert not artifacts.persistence_enabled()
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).toDF("doc_id")

    got = artifacts.read_or_build(spark, sf_dir, "t_opt_in",
                                  ("documents",), build)
    assert got.count() == 3 and calls == [1]
    assert not os.path.isdir(os.path.join(artifacts.artifact_root(),
                                          artifacts._dataset_key(sf_dir),
                                          "t_opt_in"))


# --- round-2 of the r10 optimization pass ---------------------------------

from pyspark.sql import functions as F  # noqa: E402


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, lang, text)."""
    df = spark.createDataFrame(
        [(i, t, lg, "src0", len(t)) for i, lg, t in rows],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    d = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_doremi_pivot_weights_match_join_form(spark, tmp_path):
    """mixture_doremi_weights (lang-pivot + shuffle-free KL aggregate)
    must be value-identical to the r9 join-based algebra
    (doremi_from_counts, still the streaming monitor's path) — and a
    token-less lang must stay absent from the output, exactly like the
    join form where it has no (lang, word) rows."""
    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.plans.textops import (
        doremi_from_counts, tokens_col)
    from mental_health_bigdata_project_spark.sources import load_table

    d = _write_docs(spark, tmp_path, [
        (1, "en", "aa bb bb cc dd dd dd"),
        (2, "en", "aa aa ee"),
        (3, "fr", "bb bb bb ff gg"),
        (4, "zh", "aa cc cc hh hh hh hh"),
        (5, "xx", "   "),                      # token-less domain
    ])
    got = {r["lang"]: r for r in
           QUERIES["mixture_doremi_weights"](spark, d).collect()}
    dg = (load_table(spark, d, "documents")
          .select("lang", F.explode(tokens_col()).alias("w"))
          .groupBy("lang", "w")
          .agg(F.count("*").cast("bigint").alias("c")))
    want = {r["lang"]: r for r in doremi_from_counts(dg).collect()}
    assert got == want
    assert "xx" not in got


@pytest.mark.slow
def test_doremi_pivot_t5_matches_join_recurrence(spark, tmp_path):
    """mixture_doremi_t5 via the pivoted table must reproduce the r9
    join-based unrolled recurrence (re-implemented here verbatim as
    the reference) on every step's weights, bit-for-bit after the 6dp
    output rounding."""
    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.plans.textops import (
        _DOREMI_T, tokens_col)
    from mental_health_bigdata_project_spark.sources import load_table

    d = _write_docs(spark, tmp_path, [
        (1, "en", "aa bb bb cc dd dd dd aa bb"),
        (2, "en", "aa aa ee ff"),
        (3, "fr", "bb bb bb ff gg gg hh"),
        (4, "zh", "aa cc cc hh hh hh hh ii"),
        (5, "de", "jj jj kk"),
    ])
    got = {r["lang"]: r for r in
           QUERIES["mixture_doremi_t5"](spark, d).collect()}

    # r9 reference: the join-form recurrence (the shape the unrolled
    # CTE oracle mirrors), copied from the pre-pivot implementation
    dg = (load_table(spark, d, "documents")
          .select("lang", F.explode(tokens_col()).alias("w"))
          .groupBy("lang", "w")
          .agg(F.count("*").cast("bigint").alias("c"))
          .localCheckpoint(eager=True))
    nd = (dg.groupBy("lang").agg(F.sum("c").cast("bigint").alias("n"))
          .localCheckpoint(eager=True))
    gw = dg.groupBy("w").agg(F.sum("c").cast("bigint").alias("cg"))
    tot = dg.agg(F.sum("c").cast("bigint").alias("nt"))
    d18 = lambda c: F.sum(c.cast("decimal(38,18)")).cast("double")  # noqa: E731
    p_dw = F.col("c").cast("double") / F.col("n")
    kl1 = (dg.join(F.broadcast(nd), "lang")
           .join(gw, "w")
           .crossJoin(F.broadcast(tot))
           .groupBy("lang")
           .agg(d18(p_dw * F.log(p_dw / (F.col("cg").cast("double")
                                         / F.col("nt")))).alias("e")))
    r1 = (kl1.join(F.broadcast(nd), "lang")
          .crossJoin(F.broadcast(tot))
          .select("lang", ((F.col("n").cast("double") / F.col("nt"))
                           * F.exp(F.lit(1.0) * F.col("e"))).alias("r")))
    z1 = r1.agg(d18(F.col("r")).alias("z"))
    w_steps = [(r1.crossJoin(F.broadcast(z1))
                .select("lang", (F.col("r") / F.col("z")).alias("wt"))
                .localCheckpoint(eager=True))]
    for _ in range(2, _DOREMI_T + 1):
        prev = w_steps[-1]
        q = (dg.join(F.broadcast(nd), "lang")
             .join(F.broadcast(prev), "lang")
             .groupBy("w")
             .agg(d18(F.col("wt") * p_dw).alias("q")))
        kl = (dg.join(F.broadcast(nd), "lang")
              .join(q, "w")
              .groupBy("lang")
              .agg(d18(p_dw * F.log(p_dw / F.col("q"))).alias("e")))
        r = (prev.join(F.broadcast(kl), "lang")
             .select("lang",
                     (F.col("wt") * F.exp(F.lit(1.0) * F.col("e")))
                     .alias("r")))
        z = r.agg(d18(F.col("r")).alias("z"))
        w_steps.append(
            r.crossJoin(F.broadcast(z))
            .select("lang", (F.col("r") / F.col("z")).alias("wt"))
            .localCheckpoint(eager=True))
    out = w_steps[0].select("lang", F.col("wt").alias("wt_1"))
    for k in range(2, _DOREMI_T + 1):
        out = out.join(
            w_steps[k - 1].select("lang", F.col("wt").alias(f"wt_{k}")),
            "lang")
    want = {r["lang"]: r for r in out.select(
        "lang",
        *[F.round(f"wt_{k}", 6).alias(f"weight_{k}")
          for k in range(1, _DOREMI_T + 1)],
        F.round(F.abs(F.col(f"wt_{_DOREMI_T}")
                      - F.col(f"wt_{_DOREMI_T - 1}")), 6)
        .alias("delta_last")).collect()}
    assert got == want


def test_bloom_verdict_report_matches_direct_agg(spark):
    """_bloom_verdict_report (per-doc pre-aggregation, no Expand) must
    equal the direct 2-countDistinct aggregate on mixed flags and on
    the empty relation."""
    from mental_health_bigdata_project_spark.plans.sketches import (
        _bloom_verdict_report)

    def direct(verdicts):
        fp = F.sum(((F.col("bloom_pos") == 1) & (F.col("exact_pos") == 0))
                   .cast("int"))
        return verdicts.agg(
            F.count("*").cast("bigint").alias("n_train_grams"),
            F.sum("bloom_pos").cast("bigint").alias("n_bloom_pos"),
            F.sum("exact_pos").cast("bigint").alias("n_exact_pos"),
            fp.cast("bigint").alias("n_false_pos"),
            F.sum(((F.col("bloom_pos") == 0) & (F.col("exact_pos") == 1))
                  .cast("int")).cast("bigint").alias("n_false_neg"),
            F.round(fp.cast("double") / F.count("*"), 6).alias("fp_rate"),
            F.countDistinct(F.when(F.col("bloom_pos") == 1,
                                   F.col("doc_id")))
            .cast("bigint").alias("n_docs_bloom"),
            F.countDistinct(F.when(F.col("exact_pos") == 1,
                                   F.col("doc_id")))
            .cast("bigint").alias("n_docs_exact"))

    schema = ("doc_id bigint, shingle string, bloom_pos int, "
              "exact_pos int")
    rows = [
        (1, "a b c", 1, 1), (1, "b c d", 1, 0), (1, "c d e", 0, 0),
        (2, "a b c", 1, 1), (2, "x y z", 0, 0),
        (3, "p q r", 0, 0), (3, "q r s", 0, 0),
        (4, "m n o", 1, 0),
    ]
    v = spark.createDataFrame(rows, schema)
    assert (_bloom_verdict_report(v).collect()
            == direct(v).collect())
    empty = spark.createDataFrame([], schema)
    assert (_bloom_verdict_report(empty).collect()
            == direct(empty).collect())


def test_zorder_fused_rank_matches_per_layout_ranks(spark, tmp_path):
    """layout_zorder_skipping's single tagged range exchange must give
    every row the same file as the r9 per-layout _two_phase_global_rank
    passes (both sort keys are unique total orders, so ranks are
    order-determined) — pinned by comparing the full query output
    against a reference built from two independent rank passes."""
    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.plans.advanced import (
        _morton_expr, _two_phase_global_rank)

    rows = [(ok, ln, (ok * 37 + ln * 11) % 97, (ok * 13 + ln * 7) % 53)
            for ok in range(1, 130) for ln in (1, 2, 3)]
    df = spark.createDataFrame(
        rows, "l_orderkey bigint, l_linenumber int, l_partkey bigint, "
              "l_suppkey bigint")
    d = str(tmp_path / "zc")
    df.coalesce(2).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

    got = sorted(tuple(r) for r in
                 QUERIES["layout_zorder_skipping"](spark, d).collect())

    # r9 reference: one _two_phase_global_rank per layout
    li = (spark.read.parquet(f"{d}/lineitem.parquet")
          .select(F.col("l_orderkey").alias("ok"),
                  F.col("l_linenumber").alias("ln"),
                  F.col("l_partkey").alias("x"),
                  F.col("l_suppkey").alias("y")))
    mx = li.agg(F.max("x").alias("mx"), F.max("y").alias("my"),
                F.count("*").alias("n")).localCheckpoint(eager=True)
    zt = (li.crossJoin(F.broadcast(mx))
          .withColumn("x16", F.expr("x * 65536 div (mx + 1)"))
          .withColumn("y16", F.expr("y * 65536 div (my + 1)"))
          .withColumn("z", F.expr(_morton_expr("x16", "y16", "spark")))
          .select("ok", "ln", "x", "y", "n", "z")
          .localCheckpoint(eager=True))
    stats = None
    for name, cols in (("arrival", ["ok", "ln"]),
                       ("zorder", ["z", "x", "y", "ok", "ln"])):
        ranked = _two_phase_global_rank(spark, zt, cols)
        s = (ranked.withColumn("f", F.expr("(rn - 1) * 64 div n"))
             .groupBy("f")
             .agg(F.min("x").alias("mnx"), F.max("x").alias("mxx"),
                  F.min("y").alias("mny"), F.max("y").alias("mxy"))
             .withColumn("layout", F.lit(name)))
        stats = s if stats is None else stats.unionByName(s)
    probes = (spark.range(0, 8).select(F.col("id").alias("k"))
              .crossJoin(F.broadcast(mx))
              .select(F.col("k").cast("int").alias("query_id"),
                      F.expr("mx * (2 * k) div 16").alias("xlo"),
                      F.expr("mx * (2 * k + 1) div 16").alias("xhi"),
                      F.expr("my * (2 * k) div 16").alias("ylo"),
                      F.expr("my * (2 * k + 1) div 16").alias("yhi")))
    scanned = F.when((F.col("mxx") < F.col("xlo"))
                     | (F.col("mnx") > F.col("xhi"))
                     | (F.col("mxy") < F.col("ylo"))
                     | (F.col("mny") > F.col("yhi")), 0).otherwise(1)
    want = sorted(tuple(r) for r in
                  (stats.crossJoin(F.broadcast(probes))
                   .select("layout", "query_id", scanned.alias("scanned"))
                   .groupBy("layout", "query_id")
                   .agg(F.sum("scanned").cast("bigint")
                        .alias("files_scanned"))
                   .select("layout", "query_id", "files_scanned",
                           F.lit(64).cast("int").alias("files_total"),
                           (F.lit(1.0)
                            - F.col("files_scanned").cast("double")
                            / F.lit(64)).alias("skip_frac"))).collect())
    assert got == want


def test_platt_newton_driver_matches_spark_chain(spark):
    """ml_platt_scaling's Newton update moved to collected driver
    floats: the 2x2 solve is pure IEEE *,-,/ (no transcendental), so
    Python must reproduce the 1-row Spark chain bit for bit across all
    three steps, with the sigmoid (the only exp) staying in the JVM."""
    rows = [((i * 7) % 3 == 0 and 1.0 or 0.0, ((i * 13) % 29) / 7.0)
            for i in range(1, 400)]
    pcal = spark.createDataFrame(rows, "y double, x double")
    d18 = "DECIMAL(38,18)"
    sig = "1.0 / (1.0 + exp(-({a0} + {a1} * x)))"

    def sums(a0e, a1e):
        s = sig.format(a0=a0e, a1=a1e)
        return pcal.agg(*[
            F.expr(f"CAST(SUM(CAST({t} AS {d18})) AS DOUBLE)").alias(nm)
            for nm, t in [("g0", f"(y - {s})"), ("g1", f"(y - {s}) * x"),
                          ("h00", f"({s}) * (1.0 - {s})"),
                          ("h01", f"({s}) * (1.0 - {s}) * x"),
                          ("h11", f"({s}) * (1.0 - {s}) * x * x")]])

    # r9 reference: 1-row Spark chain
    pbeta = spark.createDataFrame([(0.0, 0.0)], "a0 double, a1 double")
    for _ in range(3):
        m = (pcal.crossJoin(F.broadcast(pbeta))
             .agg(*[F.expr(f"CAST(SUM(CAST({t} AS {d18})) AS DOUBLE)")
                    .alias(nm) for nm, t in [
                 ("g0", "(y - (1.0 / (1.0 + exp(-(a0 + a1 * x)))))"),
                 ("g1", "(y - (1.0 / (1.0 + exp(-(a0 + a1 * x))))) * x"),
                 ("h00", "(1.0 / (1.0 + exp(-(a0 + a1 * x))))"
                  " * (1.0 - (1.0 / (1.0 + exp(-(a0 + a1 * x)))))"),
                 ("h01", "(1.0 / (1.0 + exp(-(a0 + a1 * x))))"
                  " * (1.0 - (1.0 / (1.0 + exp(-(a0 + a1 * x))))) * x"),
                 ("h11", "(1.0 / (1.0 + exp(-(a0 + a1 * x))))"
                  " * (1.0 - (1.0 / (1.0 + exp(-(a0 + a1 * x)))))"
                  " * x * x")]]))
        pbeta = (pbeta.crossJoin(F.broadcast(m))
                 .selectExpr("a0 + (h11 * g0 - h01 * g1)"
                             " / (h00 * h11 - h01 * h01) AS a0",
                             "a1 + (h00 * g1 - h01 * g0)"
                             " / (h00 * h11 - h01 * h01) AS a1")
                 .localCheckpoint(eager=True))
    want = pbeta.collect()[0]

    # r10 form: collected sums, driver-side IEEE update, literal embeds
    emb = lambda v: f"CAST('{v!r}' AS DOUBLE)"  # noqa: E731
    a0, a1 = 0.0, 0.0
    for _ in range(3):
        row = sums(emb(a0), emb(a1)).collect()[0]
        det = row["h00"] * row["h11"] - row["h01"] * row["h01"]
        a0 = a0 + (row["h11"] * row["g0"] - row["h01"] * row["g1"]) / det
        a1 = a1 + (row["h00"] * row["g1"] - row["h01"] * row["g0"]) / det
    assert (a0, a1) == (want["a0"], want["a1"])


def test_platt_grid_ece_matches_direct_bins(spark):
    """Both ECE bin tables from one (raw-bin x cal-bin) grid of exact
    decimal partials must equal the direct per-bin aggregations."""
    rows = [(float((i * 3) % 2), ((i * 17) % 101) / 101.0,
             ((i * 29) % 89) / 89.0) for i in range(1, 500)]
    pe = spark.createDataFrame(rows, "y double, praw double, pcal_p double")
    d18 = "DECIMAL(38,18)"
    dsum = lambda c: F.sum(F.expr(f"CAST({c} AS {d18})")).cast("double")  # noqa: E731
    bexpr = lambda p: f"LEAST(9, CAST(floor({p} * 10) AS INTEGER))"  # noqa: E731

    def direct(pcol):
        b = (pe.groupBy(F.expr(bexpr(pcol)).alias("bin"))
             .agg(F.count("*").cast("bigint").alias("n"),
                  dsum(pcol).alias("sp"), dsum("y").alias("sy"))
             .localCheckpoint(eager=True))
        tot = b.agg(F.sum("n").alias("nt"))
        return (b.crossJoin(F.broadcast(tot))
                .agg(dsum("(CAST(n AS DOUBLE) / nt)"
                          " * abs(sp / n - sy / n)").alias("e"))
                .collect()[0]["e"])

    grid = (pe.groupBy(F.expr(bexpr("praw")).alias("br"),
                       F.expr(bexpr("pcal_p")).alias("bc"))
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.sum(F.expr(f"CAST(praw AS {d18})")).alias("sp_r"),
                 F.sum(F.expr(f"CAST(pcal_p AS {d18})")).alias("sp_c"),
                 F.sum(F.expr(f"CAST(y AS {d18})")).alias("sy"))
            .localCheckpoint(eager=True))
    tot = grid.agg(F.sum("n").alias("nt"))

    def via_grid(bin_col, sp_col):
        b = (grid.groupBy(F.col(bin_col).alias("bin"))
             .agg(F.sum("n").alias("n"),
                  F.sum(sp_col).cast("double").alias("sp"),
                  F.sum("sy").cast("double").alias("sy")))
        return (b.crossJoin(F.broadcast(tot))
                .agg(dsum("(CAST(n AS DOUBLE) / nt)"
                          " * abs(sp / n - sy / n)").alias("e"))
                .collect()[0]["e"])

    assert via_grid("br", "sp_r") == direct("praw")
    assert via_grid("bc", "sp_c") == direct("pcal_p")
