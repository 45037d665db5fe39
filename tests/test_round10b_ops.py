"""Round-10 batch-B operator semantics: the A-law / IMA-ADPCM WAV
decode paths and property checks for the second wave of round-10
statistics / curation / trainer queries."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.sources import load_table


# --- G.711 A-law (format tag 6) -------------------------------------------

def test_alaw_expand_matches_audioop_and_endpoints():
    """The A-law expansion must agree with CPython's audioop over all
    256 codes and hit the canonical chord endpoints."""
    from mental_health_bigdata_project_spark.operators.media import (
        alaw_expand, decode_wav, encode_wav_alaw)

    assert alaw_expand(0x55) == -8        # negative minimum magnitude
    assert alaw_expand(0xD5) == 8         # positive minimum magnitude
    assert alaw_expand(0x2A) == -32256    # negative full scale
    assert alaw_expand(0xAA) == 32256     # positive full scale

    audioop = pytest.importorskip("audioop")
    for c in range(256):
        (want,) = struct.unpack("<h", audioop.alaw2lin(bytes([c]), 2))
        assert alaw_expand(c) == want, c

    m = decode_wav(encode_wav_alaw(bytes([0x55, 0xD5, 0x2A])))
    assert m["audio_format"] == 6 and m["bit_depth"] == 8
    assert m["n_samples"] == 3
    assert m["sum_samples"] == -8 + 8 - 32256
    assert m["peak_abs"] == 32256


def test_media_decode_alaw_query_matches_python(spark, sf_dir):
    rows = {r.doc_id: r for r in
            QUERIES["media_decode_wav_alaw"](spark, sf_dir).collect()}
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.octet_length("text") == F.length("text"))
            .select("doc_id", "text").limit(40).collect())
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_alaw)
    for d in docs:
        m = decode_wav(encode_wav_alaw(d.text.encode("utf-8")))
        r = rows[d.doc_id]
        assert (r.n_samples, r.sum_samples, r.peak_abs) == (
            m["n_samples"], m["sum_samples"], m["peak_abs"])


# --- IMA ADPCM (format tag 0x11) ------------------------------------------

def _reference_ima_decode(codes, pred=0, idx=0):
    """Independent re-derivation of the IMA 1992 recurrence (coded
    from the spec text, not from operators/media.py) — the sequential
    ground truth the decoder must reproduce sample-for-sample.
    NOTE: CPython's audioop.adpcm2lin intentionally differs (it is
    the pre-IMA Intel/DVI variant with a multiply-form diff), so the
    cross-check is against the spec tables, not audioop."""
    st = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
          34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
          130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
          408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060,
          1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749,
          3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
          7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
          18500, 20350, 22385, 24623, 27086, 29794, 32767]
    it = [-1, -1, -1, -1, 2, 4, 6, 8]
    out = [pred]
    for c in codes:
        step = st[idx]
        diff = step >> 3
        if c & 1:
            diff += step >> 2
        if c & 2:
            diff += step >> 1
        if c & 4:
            diff += step
        if c & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        idx = max(0, min(88, idx + it[c & 7]))
        out.append(pred)
    return out


def test_adpcm_decode_matches_spec_reference():
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_adpcm)

    # a code stream that sweeps all 16 codes, walks the index up into
    # the big-step region, and forces both clamps
    codes = (list(range(16)) * 8 + [7] * 40 + [15] * 40) * 2
    ref = _reference_ima_decode(codes)
    m = decode_wav(encode_wav_adpcm(codes))
    assert m["audio_format"] == 0x11 and m["bit_depth"] == 4
    assert m["n_samples"] == len(ref)
    assert m["sum_samples"] == sum(ref)
    assert m["peak_abs"] == max(abs(s) for s in ref)


def test_adpcm_block_walk_and_odd_pad():
    """Odd code counts pad a nibble that wSamplesPerBlock drops, and
    a hand-built TWO-block payload (non-zero second header) decodes
    block-by-block with state reset at each header."""
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_adpcm)

    m = decode_wav(encode_wav_adpcm([5, 3, 9]))
    ref = _reference_ima_decode([5, 3, 9])
    assert m["n_samples"] == 4 == len(ref)
    assert m["sum_samples"] == sum(ref)

    # two blocks, block_align = 4 + 2: second block restarts at
    # predictor 100 / index 10 (state must NOT carry across blocks)
    blk1 = struct.pack("<hBB", 0, 0, 0) + bytes([0x21, 0x43])
    blk2 = struct.pack("<hBB", 100, 10, 0) + bytes([0x65, 0x87])
    data = blk1 + blk2
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000, 6, 4, 2, 5)
    payload = (b"RIFF" + struct.pack("<I", 28 + len(fmt) + len(data))
               + b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
    m = decode_wav(payload)
    ref = (_reference_ima_decode([1, 2, 3, 4])
           + _reference_ima_decode([5, 6, 7, 8], pred=100, idx=10))
    assert m["n_samples"] == len(ref) == 10
    assert m["sum_samples"] == sum(ref)
    assert m["peak_abs"] == max(abs(s) for s in ref)


def test_adpcm_malformed_raises():
    from mental_health_bigdata_project_spark.operators.media import (
        decode_wav, encode_wav_adpcm)

    good = bytearray(encode_wav_adpcm([1, 2, 3, 4]))
    bad_idx = bytearray(good)
    bad_idx[good.index(b"data") + 8 + 2] = 89      # step index out of range
    with pytest.raises(ValueError):
        decode_wav(bytes(bad_idx))

    # block_align smaller than the 4-byte header
    bad_ba = bytearray(good)
    ba_off = good.index(b"fmt ") + 8 + 12
    struct.pack_into("<H", bad_ba, ba_off, 2)
    with pytest.raises(ValueError):
        decode_wav(bytes(bad_ba))


def test_media_decode_adpcm_query_matches_python(spark, sf_dir):
    rows = {r.doc_id: r for r in
            QUERIES["media_decode_wav_adpcm"](spark, sf_dir).collect()}
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.octet_length("text") == F.length("text"))
            .select("doc_id", "text").limit(40).collect())
    for d in docs:
        codes = [c for b in d.text.encode("utf-8")
                 for c in (b & 0x0F, b >> 4)]
        ref = _reference_ima_decode(codes) if codes else []
        r = rows[d.doc_id]
        assert r.n_samples == len(ref)
        assert r.sum_samples == sum(ref)
        assert r.peak_abs == (max(abs(s) for s in ref) if ref else 0)


# --- ROC-AUC / Gini / KS (round 10, batch 3) -------------------------------

def test_auc_roc_matches_numpy_midranks(spark, sf_dir):
    import numpy as np

    from mental_health_bigdata_project_spark.plans.quality import (
        _logreg_d_beta, _logreg_d_s_frame, _logreg_d_z)  # noqa: F401

    beta = _logreg_d_beta(spark, sf_dir).collect()[0]
    b = np.array([beta[f"b{i}"] for i in range(5)])
    rows = _logreg_d_s_frame(spark, sf_dir).collect()
    X = np.array([[1.0, float(r.x1), float(r.x2), float(r.x3),
                   float(r.x4)] for r in rows])
    y = np.array([float(r.y) for r in rows])
    p = 1.0 / (1.0 + np.exp(-(X @ b)))

    # midranks without scipy: sort, then average ranks within ties
    order = np.argsort(p, kind="mergesort")
    ranks = np.empty(len(p))
    sp = p[order]
    i = 0
    while i < len(sp):
        j = i
        while j < len(sp) and sp[j] == sp[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0     # 1-based midrank
        i = j
    n1, n0 = int(y.sum()), int((1 - y).sum())
    auc = (ranks[y == 1].sum() - n1 * (n1 + 1) / 2.0) / (n1 * n0)

    # KS over the empirical score CDFs
    grid = np.unique(p)
    cpos = np.array([(p[y == 1] <= v).sum() for v in grid])
    cneg = np.array([(p[y == 0] <= v).sum() for v in grid])
    ks = np.max(np.abs(cpos / n1 - cneg / n0))

    r = QUERIES["eval_auc_roc"](spark, sf_dir).collect()[0]
    assert (r.n_pos, r.n_neg) == (n1, n0)
    assert abs(r.auc - auc) < 1e-6
    assert abs(r.gini - (2 * auc - 1)) < 1e-6
    assert abs(r.ks_stat - ks) < 1e-6
    assert 0.0 <= r.auc <= 1.0


# --- Cohen's kappa between quality gates (round 10, batch 3) ---------------

def test_cohens_kappa_cells_match_parent_gates(spark, sf_dir):
    from mental_health_bigdata_project_spark.plans.textops import (
        _docs, gopher_rules_df, quality_ensemble_score)

    gop = {r.doc_id: int(r.keep)
           for r in gopher_rules_df(_docs(spark, sf_dir)).collect()}
    ens = {r.doc_id: int(r.keep)
           for r in quality_ensemble_score(spark, sf_dir).collect()}
    cells = {(1, 1): 0, (1, 0): 0, (0, 1): 0, (0, 0): 0}
    for d, ka in gop.items():
        if d in ens:
            cells[(ka, ens[d])] += 1
    n = sum(cells.values())

    r = QUERIES["stat_cohens_kappa"](spark, sf_dir).collect()[0]
    assert (r.n11, r.n10, r.n01, r.n00) == (
        cells[(1, 1)], cells[(1, 0)], cells[(0, 1)], cells[(0, 0)])
    assert r.n == n
    po = (cells[(1, 1)] + cells[(0, 0)]) / n
    pa = (cells[(1, 1)] + cells[(1, 0)]) / n
    pb = (cells[(1, 1)] + cells[(0, 1)]) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    kappa = 0.0 if pe == 1.0 else (po - pe) / (1 - pe)
    assert abs(r.po - po) < 1e-6
    assert abs(r.pe - pe) < 1e-6
    assert abs(r.kappa - kappa) < 1e-6
    assert -1.0 <= r.kappa <= 1.0


# --- Benjamini-Hochberg FDR (round 10, batch 3) ----------------------------

def test_benjamini_hochberg_stepup_and_padj_equivalence(spark, sf_dir):
    """Raw p agrees with math.erfc (the A&S polynomial is a <=1.5e-7
    approximation), the reject set equals an independent Python
    step-up, and the theorem 'rejected iff p_adj <= q' holds."""
    import math

    rows = QUERIES["stat_benjamini_hochberg"](spark, sf_dir).collect()
    nh = len(rows)
    assert nh >= 20                       # event_type x dow family
    assert sorted(r.p_rank for r in rows) == list(range(1, nh + 1))
    by_rank = sorted(rows, key=lambda r: r.p_rank)
    for r in rows:
        p_ref = math.erfc(abs(r.z_score) / math.sqrt(2))
        assert abs(r.p_value - p_ref) < 1e-5, (r.event_type, r.dow)
    # independent step-up at q = 0.1
    k = max([r.p_rank for r in by_rank
             if r.p_value <= 0.1 * r.p_rank / nh + 1e-9], default=0)
    for r in rows:
        assert r.rejected == (1 if r.p_rank <= k else 0)
        assert r.rejected == (1 if r.p_adj <= 0.1 + 1e-9 else 0)
    # adjusted p is monotone nondecreasing in rank and >= raw p
    padj = [r.p_adj for r in by_rank]
    assert padj == sorted(padj)
    for r in rows:
        assert r.p_adj >= r.p_value - 1e-9


# --- DP Laplace counts (round 10, batch 3) ---------------------------------

def test_privacy_dp_counts_matches_hashlib_replay(spark, sf_dir):
    """The released counts equal true count + the Laplace inverse-CDF
    of the md5-derived uniform, replayed driver-side with hashlib."""
    import hashlib
    import math

    rows = QUERIES["privacy_dp_counts"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        u = int(hashlib.md5(f"dp-{r.event_type}".encode())
                .hexdigest()[:8], 16) / 4294967296.0
        noise = -(1.0) * math.copysign(1.0, u - 0.5) \
            * math.log(1.0 - 2.0 * abs(u - 0.5))
        assert abs(r.noisy_n - (r.true_n + noise)) < 1e-6, r.event_type
        assert abs(r.abs_err - abs(noise)) < 1e-6
        assert r.epsilon == 1.0


# --- cluster-robust SE (round 10, batch 3) ---------------------------------

def test_cluster_robust_se_matches_numpy_sandwich(spark, sf_dir):
    import numpy as np

    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS x",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y").collect()
    x = np.array([r.x for r in li], dtype=float)
    y = np.array([r.y for r in li], dtype=float)
    g = np.array([r.l_orderkey for r in li])
    X = np.column_stack([np.ones_like(x), x])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    e = y - X @ beta
    n, k = len(x), 2
    xtx_inv = np.linalg.inv(X.T @ X)
    sse = float(e @ e)
    se_classic = np.sqrt(sse / (n - k) * xtx_inv[1, 1])
    meat = np.zeros((2, 2))
    for gid in np.unique(g):
        s = (X[g == gid] * e[g == gid, None]).sum(axis=0)
        meat += np.outer(s, s)
    G = len(np.unique(g))
    c = G / (G - 1) * (n - 1) / (n - k)
    se_cluster = np.sqrt(c * (xtx_inv @ meat @ xtx_inv)[1, 1])

    r = QUERIES["stat_cluster_robust_se"](spark, sf_dir).collect()[0]
    assert r.n_obs == n and r.n_clusters == G
    assert abs(r.slope - beta[1] / 100.0) < 1e-5
    assert abs(r.se_classic - se_classic / 100.0) < 1e-5
    assert abs(r.se_cluster - se_cluster / 100.0) < 1e-5
    assert abs(r.se_ratio - se_cluster / se_classic) < 1e-4


# --- multinomial Naive Bayes (round 10, batch 3) ---------------------------

def test_naive_bayes_matches_pure_python(spark, sf_dir):
    import math
    from collections import Counter, defaultdict

    docs = [(r.doc_id, r.lang, r.text.lower().split())
            for r in load_table(spark, sf_dir, "documents").collect()
            if r.text.lower().split()]
    train = [(d, l, t) for d, l, t in docs if d % 5 != 0]
    test = [(d, l, t) for d, l, t in docs if d % 5 == 0]
    ctc = defaultdict(Counter)
    dc = Counter()
    vocab = set()
    for _, lang, toks in train:
        ctc[lang].update(toks)
        dc[lang] += 1
        vocab.update(toks)
    V, dt = len(vocab), len(train)
    nc = {lang: sum(cnt.values()) for lang, cnt in ctc.items()}
    conf = Counter()
    for _, true_lang, toks in test:
        best = None
        for lang in ctc:
            s = math.log(dc[lang]) - math.log(dt)
            tf = Counter(toks)
            for tok, f in tf.items():
                s += f * (math.log(ctc[lang].get(tok, 0) + 1.0)
                          - math.log(nc[lang] + V))
            # argmax with (score DESC, lang ASC) tiebreak
            if best is None or s > best[0] + 1e-12 or (
                    abs(s - best[0]) <= 1e-12 and lang < best[1]):
                best = (s, lang)
        conf[(true_lang, best[1])] += 1

    rows = QUERIES["ml_naive_bayes"](spark, sf_dir).collect()
    got = {(r.true_lang, r.pred_lang): r.n_docs for r in rows}
    assert got == dict(conf)
    acc = sum(v for (a, b), v in conf.items() if a == b) / len(test)
    assert abs(rows[0].accuracy - acc) < 1e-6


# --- histogram GBDT stumps (round 10, batch 3) -----------------------------

def test_gbdt_stumps_match_numpy_boosting(spark, sf_dir):
    """Two depth-1 L2 boosting rounds replicated in numpy: same
    histogram split search, same shrinkage, same tracked MSE."""
    import numpy as np

    from mental_health_bigdata_project_spark.plans.quality import (
        _logreg_d_s_frame)

    rows = _logreg_d_s_frame(spark, sf_dir).collect()
    X = {nm: np.array([float(getattr(r, nm)) for r in rows])
         for nm in ("x1", "x2", "x3", "x4")}
    y = np.array([float(r.y) for r in rows])
    r = y - y.mean()
    lr, B = 0.5, 16
    mse = float(((y - y.mean()) ** 2).mean())
    got = {q.round: q for q in
           QUERIES["ml_gbdt_stumps"](spark, sf_dir).collect()}
    for rnd in (1, 2):
        best = None
        for nm in sorted(X):
            bins = np.minimum(B - 1, np.floor(X[nm] * B).astype(int))
            for b in range(B - 1):
                left = bins <= b
                nl, nr = int(left.sum()), int((~left).sum())
                if nl == 0 or nr == 0:
                    continue
                sl, st = float(r[left].sum()), float(r.sum())
                gain = (sl * sl / nl + (st - sl) ** 2 / nr
                        - st * st / len(r))
                if best is None or gain > best[0] + 1e-12:
                    best = (gain, nm, b, left, sl, st, nl, nr)
        gain, nm, b, left, sl, st, nl, nr = best
        r = r - np.where(left, lr * sl / nl, lr * (st - sl) / nr)
        mse -= (2 * lr - lr * lr) * gain / len(r)
        q = got[rnd]
        assert (q.feature, q.bin_split) == (nm, b), rnd
        assert abs(q.gain - gain) < 1e-4
        assert abs(q.threshold - (b + 1) / B) < 1e-9
        assert abs(q.mse_after - mse) < 1e-6
        # boosting must not increase training MSE
        assert q.mse_after <= float(((y - y.mean()) ** 2).mean()) + 1e-9
    assert got[2].mse_after <= got[1].mse_after + 1e-9


# --- TOST equivalence (round 10, batch 3) ----------------------------------

def test_tost_matches_erfc_and_verdict(spark, sf_dir):
    import math

    ev = [(r.event_type, float(r.value)) for r in
          load_table(spark, sf_dir, "events")
          .filter("value IS NOT NULL AND event_type IN"
                  " ('purchase', 'click')").collect()]
    a = [v for t, v in ev if t == "purchase"]
    b = [v for t, v in ev if t == "click"]

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        return n, m, sum((x - m) ** 2 for x in xs) / (n - 1)

    na, ma, va = mv(a)
    nb, mb, vb = mv(b)
    diff = ma - mb
    se = math.sqrt(va / na + vb / nb)
    zl, zu = (diff + 5.0) / se, (5.0 - diff) / se
    pl = 0.5 * math.erfc(zl / math.sqrt(2))
    pu = 0.5 * math.erfc(zu / math.sqrt(2))

    r = QUERIES["stat_tost_equivalence"](spark, sf_dir).collect()[0]
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.mean_diff - diff) < 1e-4
    assert abs(r.p_lower - pl) < 1e-5 and abs(r.p_upper - pu) < 1e-5
    assert abs(r.p_tost - max(pl, pu)) < 1e-5
    assert r.equivalent == (1 if max(pl, pu) <= 0.05 else 0)
    assert r.delta == 5.0


# --- Platt scaling (round 10, batch 3) -------------------------------------

def test_platt_scaling_matches_numpy_newton(spark, sf_dir):
    import numpy as np

    from mental_health_bigdata_project_spark.plans.quality import (
        _logreg_d_beta, _logreg_d_s_frame)

    beta = _logreg_d_beta(spark, sf_dir).collect()[0]
    bvec = np.array([beta[f"b{i}"] for i in range(5)])
    rows = _logreg_d_s_frame(spark, sf_dir, extra=("event_id",)).collect()
    eid = np.array([r.event_id for r in rows])
    X = np.array([[1.0, float(r.x1), float(r.x2), float(r.x3),
                   float(r.x4)] for r in rows])
    y = np.array([float(r.y) for r in rows])
    z = X @ bvec
    cal, ev = eid % 3 == 0, eid % 3 != 0
    a = np.zeros(2)
    for _ in range(3):
        q = 1.0 / (1.0 + np.exp(-(a[0] + a[1] * z[cal])))
        g = np.array([(y[cal] - q).sum(), ((y[cal] - q) * z[cal]).sum()])
        w = q * (1 - q)
        H = np.array([[w.sum(), (w * z[cal]).sum()],
                      [(w * z[cal]).sum(), (w * z[cal] ** 2).sum()]])
        a = a + np.linalg.solve(H, g)

    def ece(p, yy):
        bins = np.minimum(9, np.floor(p * 10).astype(int))
        tot = len(p)
        out = 0.0
        for bi in np.unique(bins):
            m = bins == bi
            out += m.sum() / tot * abs(p[m].mean() - yy[m].mean())
        return out

    praw = 1.0 / (1.0 + np.exp(-z[ev]))
    pcal = 1.0 / (1.0 + np.exp(-(a[0] + a[1] * z[ev])))
    r = QUERIES["ml_platt_scaling"](spark, sf_dir).collect()[0]
    assert (r.n_calib, r.n_eval) == (int(cal.sum()), int(ev.sum()))
    assert abs(r.platt_a - a[0]) < 1e-4
    assert abs(r.platt_b - a[1]) < 1e-4
    assert abs(r.ece_raw - ece(praw, y[ev])) < 1e-5
    assert abs(r.ece_platt - ece(pcal, y[ev])) < 1e-5


# --- average precision (round 10, batch 3) ---------------------------------

def test_auc_pr_matches_numpy_stepwise_ap(spark, sf_dir):
    import numpy as np

    from mental_health_bigdata_project_spark.plans.quality import (
        _logreg_d_beta, _logreg_d_s_frame)

    beta = _logreg_d_beta(spark, sf_dir).collect()[0]
    b = np.array([beta[f"b{i}"] for i in range(5)])
    rows = _logreg_d_s_frame(spark, sf_dir).collect()
    X = np.array([[1.0, float(r.x1), float(r.x2), float(r.x3),
                   float(r.x4)] for r in rows])
    y = np.array([float(r.y) for r in rows])
    p = 1.0 / (1.0 + np.exp(-(X @ b)))
    n1 = int(y.sum())
    # step-wise AP over the descending distinct-score grid
    ap = 0.0
    tp = fp = 0
    for v in sorted(set(p), reverse=True):
        m = p == v
        ca, cb = int(y[m].sum()), int((1 - y[m]).sum())
        tp, fp = tp + ca, fp + cb
        if ca:
            ap += (ca / n1) * (tp / (tp + fp))
    r = QUERIES["eval_auc_pr"](spark, sf_dir).collect()[0]
    assert r.n_pos == n1
    assert abs(r.average_precision - ap) < 1e-6
    prev = n1 / len(y)
    assert abs(r.baseline_prevalence - prev) < 1e-6
    assert abs(r.lift_over_random - ap / prev) < 1e-4
    assert prev <= r.average_precision <= 1.0    # better than random here


# --- Mann-Kendall + Theil-Sen (round 10, batch 3) --------------------------

def test_mann_kendall_matches_pure_python(spark, sf_dir):
    import math
    from collections import Counter, defaultdict

    ev = load_table(spark, sf_dir, "events") \
        .filter("value IS NOT NULL") \
        .selectExpr("CAST(ts AS DATE) AS day", "value").collect()
    daily = defaultdict(float)
    from decimal import Decimal
    dd = defaultdict(Decimal)
    for r in ev:
        dd[r.day] += Decimal(str(round(r.value, 12)))
    days = sorted(dd)
    v = [float(dd[d]) for d in days]
    nd = len(days)
    s_stat = sum((v[j] > v[i]) - (v[j] < v[i])
                 for i in range(nd) for j in range(i + 1, nd))
    tc = Counter(v)
    tt = sum(t * (t - 1) * (2 * t + 5) for t in tc.values() if t > 1)
    var_s = (nd * (nd - 1) * (2 * nd + 5) - tt) / 18.0
    if s_stat > 0:
        z = (s_stat - 1) / math.sqrt(var_s)
    elif s_stat < 0:
        z = (s_stat + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    slopes = sorted((v[j] - v[i]) / (days[j] - days[i]).days
                    for i in range(nd) for j in range(i + 1, nd))
    sen = slopes[(len(slopes) + 1) // 2 - 1]     # lower median, 1-based

    r = QUERIES["ts_trend_mann_kendall"](spark, sf_dir).collect()[0]
    assert r.n_days == nd
    assert r.s_stat == s_stat
    assert abs(r.var_s - var_s) < 1e-6
    assert abs(r.z_score - z) < 1e-5
    assert abs(r.p_value - math.erfc(abs(z) / math.sqrt(2))) < 1e-5
    assert abs(r.sen_slope - sen) < 1e-4


# --- ACF + Ljung-Box (round 10, batch 3) -----------------------------------

def test_acf_ljung_box_matches_numpy(spark, sf_dir):
    import math

    import numpy as np

    ev = load_table(spark, sf_dir, "events") \
        .filter("value IS NOT NULL") \
        .selectExpr("CAST(ts AS DATE) AS day", "value").collect()
    from collections import defaultdict
    from decimal import Decimal
    dd = defaultdict(Decimal)
    for r in ev:
        dd[r.day] += Decimal(str(round(r.value, 12)))
    v = np.array([float(dd[d]) for d in sorted(dd)])
    n = len(v)
    c = v - v.mean()
    c0 = float(c @ c)
    acf = {k: float(c[:-k] @ c[k:]) / c0 for k in range(1, 7)}
    q = n * (n + 2) * sum(acf[k] ** 2 / (n - k) for k in range(1, 7))
    p = math.exp(-q / 2) * (1 + q / 2 + (q / 2) ** 2 / 2)   # chi2 sf df=6

    rows = {r.lag: r for r in
            QUERIES["ts_acf_ljung_box"](spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 7))
    for k in range(1, 7):
        assert abs(rows[k].acf - acf[k]) < 1e-6, k
        assert abs(rows[k].q_stat - q) < 1e-4
        assert abs(rows[k].p_value - p) < 1e-6
        assert rows[k].n_days == n
        assert -1.0 <= rows[k].acf <= 1.0


# --- Wilson score intervals (round 10, batch 3) ----------------------------

def test_wilson_ci_matches_closed_form_and_contains_phat(spark, sf_dir):
    import math

    rows = QUERIES["stat_wilson_ci"](spark, sf_dir).collect()
    assert len(rows) == 7
    z = 1.959963984540054
    for r in rows:
        ph, n = r.k / r.n, r.n
        ctr = (ph + z * z / (2 * n)) / (1 + z * z / n)
        half = (z * math.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n))
                / (1 + z * z / n))
        assert abs(r.p_hat - ph) < 1e-6
        assert abs(r.ci_lo - max(0.0, ctr - half)) < 1e-6
        assert abs(r.ci_hi - min(1.0, ctr + half)) < 1e-6
        assert r.ci_lo <= r.p_hat <= r.ci_hi


# --- Krippendorff's alpha (round 10, batch 3) ------------------------------

def test_krippendorff_alpha_matches_pair_enumeration(spark, sf_dir):
    """Replicate alpha by literally enumerating pairable values —
    structurally different from the query's coincidence algebra."""
    from collections import Counter, defaultdict

    ev = load_table(spark, sf_dir, "events") \
        .filter("value IS NOT NULL AND value >= 0") \
        .selectExpr("CAST(user_id % 40 AS INTEGER) AS unit",
                    "event_type AS rater",
                    "CAST(LEAST(3, CAST(floor(value / 25.0) AS INTEGER))"
                    " AS INTEGER) AS cat").collect()
    votes = Counter((r.unit, r.rater, r.cat) for r in ev)
    rating = {}
    for (u, rr, c), n in votes.items():
        key = (u, rr)
        # modal bucket, ties to the smaller category
        if key not in rating or (n, -c) > (rating[key][1], -rating[key][0]):
            rating[key] = (c, n)
    units = defaultdict(list)
    for (u, _), (c, _) in rating.items():
        units[u].append(c)
    units = {u: cs for u, cs in units.items() if len(cs) >= 2}
    n = sum(len(cs) for cs in units.values())
    do_sum = 0.0
    for cs in units.values():
        m = len(cs)
        dis = sum(1 for i in range(m) for j in range(m)
                  if i != j and cs[i] != cs[j])
        do_sum += dis / (m - 1)
    nc = Counter(c for cs in units.values() for c in cs)
    de_num = sum(nc[a] * nc[b] for a in nc for b in nc if a != b)
    d_o = do_sum / n
    d_e = de_num / (n * (n - 1))
    alpha = 1 - d_o / d_e

    r = QUERIES["eval_krippendorff_alpha"](spark, sf_dir).collect()[0]
    assert r.n_pairable == n
    assert r.n_units == len(units)
    assert abs(r.d_observed - d_o) < 1e-6
    assert abs(r.d_expected - d_e) < 1e-6
    assert abs(r.alpha - alpha) < 1e-5
    assert r.alpha <= 1.0


# --- DeLong AUC CI (round 10, batch 3) -------------------------------------

def test_delong_ci_matches_numpy_structural_components(spark, sf_dir):
    import numpy as np

    from mental_health_bigdata_project_spark.plans.quality import (
        _logreg_d_beta, _logreg_d_s_frame)

    beta = _logreg_d_beta(spark, sf_dir).collect()[0]
    b = np.array([beta[f"b{i}"] for i in range(5)])
    rows = _logreg_d_s_frame(spark, sf_dir).collect()
    X = np.array([[1.0, float(r.x1), float(r.x2), float(r.x3),
                   float(r.x4)] for r in rows])
    y = np.array([float(r.y) for r in rows])
    p = 1.0 / (1.0 + np.exp(-(X @ b)))
    pos, neg = p[y == 1], p[y == 0]
    n1, n0 = len(pos), len(neg)
    # O(n1*n0) psi-kernel structural components (the definition)
    psi = (pos[:, None] > neg[None, :]).astype(float) \
        + 0.5 * (pos[:, None] == neg[None, :])
    v10 = psi.mean(axis=1)
    v01 = psi.mean(axis=0)
    auc = psi.mean()
    s10 = v10.var(ddof=1)
    s01 = v01.var(ddof=1)
    se = np.sqrt(s10 / n1 + s01 / n0)

    r = QUERIES["eval_auc_delong_ci"](spark, sf_dir).collect()[0]
    assert (r.n_pos, r.n_neg) == (n1, n0)
    assert abs(r.auc - auc) < 1e-6
    assert abs(r.se_delong - se) < 1e-6
    z = 1.959963984540054
    assert abs(r.ci_lo - max(0.0, auc - z * se)) < 1e-5
    assert abs(r.ci_hi - min(1.0, auc + z * se)) < 1e-5
    assert r.ci_lo <= r.auc <= r.ci_hi


# --- Holm-Bonferroni (round 10, batch 3) -----------------------------------

def test_holm_stepdown_matches_python_and_dominates_bh(spark, sf_dir):
    rows = QUERIES["stat_holm_bonferroni"](spark, sf_dir).collect()
    nh = len(rows)
    by_rank = sorted(rows, key=lambda r: r.p_rank)
    # independent step-down
    stop = None
    for r in by_rank:
        if r.p_value > 0.05 / (nh - r.p_rank + 1) + 1e-9:
            stop = r.p_rank
            break
    for r in rows:
        want = 1 if (stop is None or r.p_rank < stop) else 0
        assert r.rejected == want, (r.event_type, r.dow)
    # adjusted p: running max of (m - i + 1) p_(i), monotone, >= raw
    run = 0.0
    for r in by_rank:
        run = max(run, min(1.0, (nh - r.p_rank + 1) * r.p_value))
        # p_value is 6dp-rounded output while the query adjusts the
        # unrounded p: tolerance is the amplified rounding bound
        assert abs(r.p_holm - run) < nh * 5e-7 + 1e-9
        assert r.p_holm >= r.p_value - 1e-9
    # FWER control is stricter than FDR: Holm rejections are a subset
    # of BH's on the same family
    bh = {(r.event_type, r.dow): r.rejected for r in
          QUERIES["stat_benjamini_hochberg"](spark, sf_dir).collect()}
    for r in rows:
        if r.rejected:
            assert bh[(r.event_type, r.dow)] == 1
