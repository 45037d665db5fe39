"""Semantic tests for the round-7 statistics/curation operators:
Mann-Whitney U, chi-square independence, b-bit minhash, and MATTR
lexical diversity.  Value-parity vs DuckDB is scripts/check_oracles.py;
these pin the *semantics* against exact pure-Python recomputes and
hand-built inputs at sf0.001."""

from __future__ import annotations
import pytest

import hashlib
from collections import Counter
from fractions import Fraction

from mental_health_bigdata_project_spark.plans import QUERIES

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow



def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    d = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


# --- stat_mann_whitney ------------------------------------------------------

def test_mann_whitney_matches_exact_recompute(spark, sf_dir):
    """U, mu, sigma, z recomputed in pure Python with Fraction rank
    sums over the collected samples must equal the distributed
    two-phase result — pins the all-integer 2*R_A identity AND the
    running-sum offsets."""
    from mental_health_bigdata_project_spark.sources import load_table

    row = QUERIES["stat_mann_whitney"](spark, sf_dir).collect()[0]
    ev = (load_table(spark, sf_dir, "events")
          .filter("event_type IN ('purchase','click') AND value IS NOT NULL")
          .select("event_type", "value").collect())
    ca, cb = Counter(), Counter()
    for r in ev:
        (ca if r.event_type == "purchase" else cb)[r.value] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    assert (row.n_a, row.n_b) == (na, nb)
    # exact rank sum for group A with average ranks on ties
    prev = 0
    two_ra = 0
    ties = 0
    for v in sorted(set(ca) | set(cb)):
        t = ca.get(v, 0) + cb.get(v, 0)
        two_ra += ca.get(v, 0) * (2 * prev + t + 1)
        ties += t ** 3 - t
        prev += t
    u = Fraction(two_ra - na * (na + 1), 2)
    assert row.u_stat == float(u)
    assert row.mu_u == na * nb / 2.0
    n_tot = na + nb
    var = (na * nb / 12.0) * ((n_tot + 1)
                              - ties / (n_tot * (n_tot - 1.0)))
    assert abs(row.sigma_u - var ** 0.5) < 5e-7
    assert abs(row.z_score - (float(u) - na * nb / 2.0) / var ** 0.5) < 5e-7


# --- stat_chi_square --------------------------------------------------------

def test_chi_square_matches_exact_recompute(spark, sf_dir):
    from mental_health_bigdata_project_spark.sources import load_table

    row = QUERIES["stat_chi_square"](spark, sf_dir).collect()[0]
    docs = (load_table(spark, sf_dir, "documents")
            .select("lang", "source").collect())
    cells = Counter((r.lang, r.source) for r in docs)
    rt = Counter()
    ct = Counter()
    for (lg, src), o in cells.items():
        rt[lg] += o
        ct[src] += o
    n = sum(cells.values())
    assert (row.n, row.n_langs, row.n_sources) == (n, len(rt), len(ct))
    assert row.dof == (len(rt) - 1) * (len(ct) - 1)
    # classic (o-e)^2/e over the DENSE grid (including absent cells)
    chi2 = 0.0
    for lg in rt:
        for src in ct:
            e = rt[lg] * ct[src] / n
            o = cells.get((lg, src), 0)
            chi2 += (o - e) ** 2 / e
    assert abs(row.chi2 - chi2) < 1e-4
    v = (chi2 / (n * min(len(rt) - 1, len(ct) - 1))) ** 0.5
    assert abs(row.cramers_v - v) < 1e-6


def test_chi_square_zero_for_perfect_independence(spark, tmp_path):
    # 2 langs x 2 sources, every cell 2 docs: chi2 exactly 0.
    rows = []
    i = 0
    for lang in ("en", "fr"):
        for src in ("s0", "s1"):
            for _ in range(2):
                rows.append((i, f"tok{i} a b", lang, src, 9))
                i += 1
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    d = str(tmp_path / "ind")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    row = QUERIES["stat_chi_square"](spark, d).collect()[0]
    assert row.chi2 == 0.0
    assert row.cramers_v == 0.0
    assert row.dof == 1


# --- dedup_bbit_minhash -----------------------------------------------------

def _minhash_sigs(text: str) -> list[str]:
    toks = text.lower().split()
    shingles = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
    hs = [hashlib.md5(s.encode()).hexdigest() for s in shingles]
    return [min(hashlib.md5(f"{h}-{s}".encode()).hexdigest() for h in hs)
            for s in range(16)]


def test_bbit_estimates_match_hand_recompute(spark, tmp_path):
    # near-identical pair (one trailing token differs) -> LSH candidate.
    toks = [f"w{i}" for i in range(20)]
    a_text = " ".join(toks)
    b_text = " ".join(toks[:-1] + ["zz"])
    d = _write_docs(spark, tmp_path, [(1, a_text), (2, b_text),
                                      (3, " ".join(f"q{i}" for i in range(20)))])
    out = {(r.doc_a, r.doc_b): r
           for r in QUERIES["dedup_bbit_minhash"](spark, d).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    sa, sb = _minhash_sigs(a_text), _minhash_sigs(b_text)
    agree_full = sum(x == y for x, y in zip(sa, sb))
    agree_b2 = sum(int(x[-1], 16) % 4 == int(y[-1], 16) % 4
                   for x, y in zip(sa, sb))
    assert abs(r.est_full - agree_full / 16.0) < 1e-9
    assert abs(r.est_b2 - (agree_b2 - 4) / 12.0) < 1e-9
    assert abs(r.abs_gap - abs(r.est_b2 - r.est_full)) < 5e-7


def test_bbit_identical_docs_estimate_one(spark, tmp_path):
    text = " ".join(f"w{i}" for i in range(15))
    d = _write_docs(spark, tmp_path, [(1, text), (2, text)])
    r = QUERIES["dedup_bbit_minhash"](spark, d).collect()[0]
    assert r.est_full == 1.0
    assert r.est_b2 == 1.0
    assert r.abs_gap == 0.0


# --- text_ttr_mattr ---------------------------------------------------------

def test_mattr_window_semantics(spark, tmp_path):
    all_same = " ".join(["dup"] * 60)          # 1 type per window
    all_distinct = " ".join(f"u{i}" for i in range(60))
    short = "a b b"                            # < window: falls back to TTR
    d = _write_docs(spark, tmp_path,
                    [(1, all_same), (2, all_distinct), (3, short)])
    out = {r.doc_id: r for r in QUERIES["text_ttr_mattr"](spark, d).collect()}
    assert out[1].n_tokens == 60 and out[1].n_types == 1
    assert abs(out[1].mattr_w50 - 1 / 50) < 1e-6
    assert abs(out[1].ttr - 1 / 60) < 1e-6
    assert out[2].mattr_w50 == 1.0 and out[2].ttr == 1.0
    assert out[3].n_tokens == 3 and out[3].n_types == 2
    assert abs(out[3].mattr_w50 - out[3].ttr) < 1e-12

def test_mattr_is_length_invariant_where_ttr_is_not(spark, tmp_path):
    """The reason MATTR exists: repeat the same 50-token pattern 1x vs
    4x — TTR falls with length, MATTR stays put."""
    base = [f"t{i}" for i in range(25)] * 2    # 50 tokens, 25 types
    d = _write_docs(spark, tmp_path,
                    [(1, " ".join(base)), (2, " ".join(base * 4))])
    out = {r.doc_id: r for r in QUERIES["text_ttr_mattr"](spark, d).collect()}
    assert out[2].ttr < out[1].ttr             # raw TTR length-biased
    assert abs(out[1].mattr_w50 - out[2].mattr_w50) < 1e-6


# --- privacy_t_closeness ------------------------------------------------------

def test_t_closeness_matches_exact_recompute(spark, sf_dir):
    from mental_health_bigdata_project_spark.sources import load_table
    from fractions import Fraction
    import math

    rows = QUERIES["privacy_t_closeness"](spark, sf_dir).collect()
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_nationkey", "c_acctbal", "c_mktsegment").collect())
    cells = Counter()
    glob = Counter()
    for r in cust:
        band = math.floor(r.c_acctbal / 1000.0)
        cells[(r.c_nationkey, band, r.c_mktsegment)] += 1
        glob[r.c_mktsegment] += 1
    n = sum(glob.values())
    got = {(r.c_nationkey, r.bal_band): r for r in rows}
    groups = {}
    for (nk, band, s), c in cells.items():
        groups.setdefault((nk, band), {})[s] = c
    assert set(got) == set(groups)
    for key, dist in groups.items():
        g = sum(dist.values())
        tv = sum(abs(Fraction(dist.get(s, 0), g) - Fraction(glob[s], n))
                 for s in glob) / 2
        assert got[key].group_size == g
        assert abs(got[key].tv_dist - float(tv)) < 5e-7, key
        assert got[key].meets_t == int(tv <= Fraction(2, 10))


def test_t_closeness_zero_when_class_matches_global(spark, tmp_path):
    # every QI class carries the global sensitive distribution exactly
    rows = []
    i = 0
    for nk in (0, 1):
        for seg, reps in (("A", 2), ("B", 1)):
            for _ in range(reps):
                rows.append((i, f"c{i}", "addr", nk, "p", 100.0 * nk,
                             seg, "x"))
                i += 1
    df = spark.createDataFrame(
        rows, "c_custkey bigint, c_name string, c_address string, "
              "c_nationkey bigint, c_phone string, c_acctbal double, "
              "c_mktsegment string, c_comment string")
    d = str(tmp_path / "tc")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    out = QUERIES["privacy_t_closeness"](spark, d).collect()
    assert out and all(r.tv_dist == 0.0 and r.meets_t == 1 for r in out)


# --- stat_anova_oneway --------------------------------------------------------

def test_anova_matches_exact_recompute(spark, sf_dir):
    from mental_health_bigdata_project_spark.sources import load_table

    row = QUERIES["stat_anova_oneway"](spark, sf_dir).collect()[0]
    ev = (load_table(spark, sf_dir, "events")
          .filter("value IS NOT NULL")
          .select("event_type", "value").collect())
    groups = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(r.value)
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    assert (row.k, row.n) == (k, n)
    assert (row.dof_between, row.dof_within) == (k - 1, n - k)
    mean = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - mean) ** 2
              for v in groups.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v)
              for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(row.ssb - ssb) < 1e-3
    assert abs(row.ssw - ssw) < 1e-3
    assert abs(row.f_stat - f) < 1e-4
    assert abs(row.eta_sq - ssb / (ssb + ssw)) < 1e-6


# --- ts_holt_linear -----------------------------------------------------------

def test_holt_linear_matches_python_fold(spark, sf_dir):
    """The Holt recurrence replayed in pure Python over the same daily
    series must reproduce every forecast — pins the fold init (l1=v1,
    b1=v2-v1), the update order, and the h-step projection."""
    import datetime

    from mental_health_bigdata_project_spark.sources import load_table
    from pyspark.sql import functions as F

    got = {r.day: (r.actual, r.forecast, r.abs_err)
           for r in QUERIES["ts_holt_linear"](spark, sf_dir).collect()}
    assert len(got) == 7
    ev = load_table(spark, sf_dir, "events")
    daily = {r.day: float(r.total) for r in
             (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                         .alias("day"))
              .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                   .cast("double").alias("total"))).collect()}
    days = sorted(daily)
    last = days[-1]
    train = [d for d in days if d <= last - datetime.timedelta(days=7)]
    test = [d for d in days if d > last - datetime.timedelta(days=7)]
    v = [daily[d] for d in train]
    l, b = v[0], v[1] - v[0]
    for x in v[1:]:
        l_new = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        l = l_new
    d0 = train[-1]
    for d in test:
        h = (d - d0).days
        fc = l + h * b
        actual, forecast, abs_err = got[d]
        assert actual == daily[d]
        assert abs(forecast - fc) < 5e-5, d
        assert abs(abs_err - abs(daily[d] - fc)) < 5e-5, d


# --- stat_spearman_rho ----------------------------------------------------------

def test_spearman_matches_exact_recompute(spark, sf_dir):
    """Tie-aware Spearman replayed in pure Python (average ranks via
    Fractions, Pearson on ranks) must match the distributed result."""
    from mental_health_bigdata_project_spark.sources import load_table

    row = QUERIES["stat_spearman_rho"](spark, sf_dir).collect()[0]
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_quantity", "l_extendedprice").collect())
    xs = [r.l_quantity for r in li]
    ys = [r.l_extendedprice for r in li]

    def avg_ranks(vals):
        cnt = Counter(vals)
        rank = {}
        prev = 0
        for v in sorted(cnt):
            t = cnt[v]
            rank[v] = Fraction(2 * prev + t + 1, 2)
            prev += t
        return [rank[v] for v in vals]

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(rx)
    assert row.n == n
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    num = n * sxy - sx * sy
    den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    assert abs(row.spearman_rho - float(num) / float(den)) < 5e-7


def test_spearman_is_plus_minus_one_on_monotone_data(spark, tmp_path):
    rows = [(i, i, float(i * i + 1), "x", "2025-01-01", 1.0, 2.0,
             "N", "O", "d", "d", "d", "s", "m", "c")
            for i in range(1, 40)]
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_extendedprice double, "
        "l_comment string, l_shipdate string, l_quantity double, "
        "l_discount double, l_returnflag string, l_linestatus string, "
        "l_commitdate string, l_receiptdate string, l_shipdates string, "
        "l_shipinstruct string, l_shipmode string, l_container string")
    d = str(tmp_path / "mono")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    # quantity constant -> undefined denominator? no: quantity = 1.0
    # for all rows makes den 0; use l_partkey-driven quantity instead
    import pyspark.sql.functions as F2
    df2 = df.withColumn("l_quantity", F2.col("l_partkey").cast("double"))
    df2.coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    row = QUERIES["stat_spearman_rho"](spark, d).collect()[0]
    assert row.spearman_rho == 1.0  # strictly increasing in each other


# --- win_sliding_median / agg_theil_inequality --------------------------------

def test_sliding_median_matches_python_frames(spark, sf_dir):
    from mental_health_bigdata_project_spark.sources import load_table

    got = {r.event_id: r.med_4 for r in
           QUERIES["win_sliding_median"](spark, sf_dir).collect()}
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "user_id", "ts", "value").collect())
    by_user = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for rows in by_user.values():
        for i, r in enumerate(rows):
            frame = sorted(x.value for x in rows[max(0, i - 3):i + 1])
            k = len(frame)
            med = (frame[k // 2] if k % 2 == 1
                   else (frame[k // 2 - 1] + frame[k // 2]) / 2.0)
            assert got[r.event_id] == med, r.event_id
            checked += 1
    assert checked == len(got)


def test_theil_zero_on_equal_spend_and_matches_recompute(spark, sf_dir,
                                                         tmp_path):
    import math

    from mental_health_bigdata_project_spark.sources import load_table

    # (a) perfectly equal spends -> Theil = Atkinson = 0
    rows = [(i, i % 4, "O", 100.0, "1995-01-01", "1-URGENT", "c", 0, "x")
            for i in range(12)]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
              "o_totalprice double, o_orderdate string, "
              "o_orderpriority string, o_clerk string, "
              "o_shippriority int, o_comment string")
    d = str(tmp_path / "eq")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    r = QUERIES["agg_theil_inequality"](spark, d).collect()[0]
    assert r.theil_t == 0.0 and r.atkinson_1 == 0.0

    # (b) corpus recompute
    row = QUERIES["agg_theil_inequality"](spark, sf_dir).collect()[0]
    od = (load_table(spark, sf_dir, "orders")
          .select("o_custkey", "o_totalprice").collect())
    spend = Counter()
    for o in od:
        spend[o.o_custkey] += o.o_totalprice
    vals = list(spend.values())
    n = len(vals)
    mu = sum(vals) / n
    theil = sum((x / mu) * math.log(x / mu) for x in vals) / n
    atk = 1.0 - math.exp(sum(math.log(x) for x in vals) / n) / mu
    assert row.n == n
    assert abs(row.theil_t - theil) < 1e-4
    assert abs(row.atkinson_1 - atk) < 1e-4


# --- stat_kendall_tau ---------------------------------------------------------

def test_kendall_matches_brute_force_on_sample(spark, tmp_path):
    """Brute-force O(n^2) tau-b over a small hand-built table equals
    the grid-collapsed distributed computation."""
    import itertools

    vals = [(1.0, 0.00), (1.0, 0.05), (2.0, 0.00), (2.0, 0.10),
            (3.0, 0.05), (3.0, 0.05), (4.0, 0.10), (5.0, 0.00),
            (5.0, 0.10), (2.0, 0.05)]
    rows = [(i, i, 10.0, "c", "1995-01-01", q, d, "N", "O", "a", "b",
             "c", "d", "e", "f")
            for i, (q, d) in enumerate(vals)]
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_extendedprice double, "
        "l_comment string, l_shipdate string, l_quantity double, "
        "l_discount double, l_returnflag string, l_linestatus string, "
        "l_commitdate string, l_receiptdate string, l_shipdates string, "
        "l_shipinstruct string, l_shipmode string, l_container string")
    d = str(tmp_path / "kt")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    row = QUERIES["stat_kendall_tau"](spark, d).collect()[0]
    conc = disc = tx = ty = 0
    for (xa, ya), (xb, yb) in itertools.combinations(vals, 2):
        if xa == xb:
            tx += 1
            if ya == yb:
                ty += 1
            continue
        if ya == yb:
            ty += 1
            continue
        if (xa < xb) == (ya < yb):
            conc += 1
        else:
            disc += 1
    n = len(vals)
    n0 = n * (n - 1) // 2
    # note: tx/ty above count ties among COMPARED pairs; recompute the
    # marginals the standard way
    from collections import Counter as C2
    n1 = sum(c * (c - 1) // 2 for c in C2(x for x, _ in vals).values())
    n2 = sum(c * (c - 1) // 2 for c in C2(y for _, y in vals).values())
    tau = (conc - disc) / (((n0 - n1) * (n0 - n2)) ** 0.5)
    assert (row.n, row.conc, row.disc) == (n, conc, disc)
    assert abs(row.kendall_tau_b - tau) < 5e-7


def test_kendall_perfect_concordance_is_one(spark, tmp_path):
    rows = [(i, i, 10.0, "c", "1995-01-01", float(i), i / 100.0, "N",
             "O", "a", "b", "c", "d", "e", "f") for i in range(1, 20)]
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_extendedprice double, "
        "l_comment string, l_shipdate string, l_quantity double, "
        "l_discount double, l_returnflag string, l_linestatus string, "
        "l_commitdate string, l_receiptdate string, l_shipdates string, "
        "l_shipinstruct string, l_shipmode string, l_container string")
    d = str(tmp_path / "mono")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    row = QUERIES["stat_kendall_tau"](spark, d).collect()[0]
    assert row.kendall_tau_b == 1.0 and row.disc == 0


# --- text_rake_keywords --------------------------------------------------------

def test_rake_scores_match_hand_recompute(spark, tmp_path):
    """Classic RAKE walkthrough on a tiny corpus: phrases split at
    stopwords, word score = deg/freq, phrase score = sum of members."""
    d = _write_docs(spark, tmp_path, [
        (1, "deep learning of deep networks and fast learning"),
        (2, "fast networks the deep learning"),
    ])
    rows = {r.phrase: r for r in
            QUERIES["text_rake_keywords"](spark, d).collect()}
    # phrases: doc1 -> [deep learning], [deep networks], [fast learning]
    #          doc2 -> [fast networks], [deep learning]
    # freq: deep 3, learning 3, networks 2, fast 2
    # deg (sum of plen over occurrences): deep 6, learning 6,
    #      networks 4, fast 4  -> every word scores 2.0
    assert set(rows) == {"deep learning", "deep networks",
                         "fast learning", "fast networks"}
    for r in rows.values():
        assert r.score == 4.0          # two words x 2.0 each
    assert rows["deep learning"].n_occs == 2
    assert rows["fast networks"].n_occs == 1


def test_rake_caps_phrase_length(spark, tmp_path):
    d = _write_docs(spark, tmp_path, [
        (1, "w1 w2 w3 w4 w5 the x1 x2"),   # 5-token run must be dropped
    ])
    rows = [r.phrase for r in
            QUERIES["text_rake_keywords"](spark, d).collect()]
    assert rows == ["x1 x2"]


# --- stat_bootstrap_ci ---------------------------------------------------------

def test_bootstrap_replicate_zero_matches_hand_weights(spark, sf_dir):
    """Replicate 0 recomputed in Python with the same md5-derived
    Poisson(1) weights must match exactly; the replicate spread must
    bracket the true mean."""
    from mental_health_bigdata_project_spark.plans.quality import (
        _POIS_CUM)
    from mental_health_bigdata_project_spark.sources import load_table

    rows = QUERIES["stat_bootstrap_ci"](spark, sf_dir).collect()
    assert [r.rep for r in rows] == list(range(32))
    ev = (load_table(spark, sf_dir, "events")
          .filter("value IS NOT NULL")
          .select("event_id", "value").collect())

    def w(event_id, rep):
        g, slot = rep // 4, rep % 4
        hx = hashlib.md5(f"{event_id}-{g}".encode()).hexdigest()
        u = int(hx[slot * 8:slot * 8 + 8], 16) / 4294967296.0
        for k, c in enumerate(_POIS_CUM):
            if u < c:
                return k
        return len(_POIS_CUM)

    n0 = sum(w(r.event_id, 0) for r in ev)
    s0 = sum(w(r.event_id, 0) * r.value for r in ev)
    got0 = rows[0]
    assert got0.n_eff == n0
    assert abs(got0.boot_mean - s0 / n0) < 5e-6
    # Poisson(1) weights: n_eff ~ n +- O(sqrt(n))
    n = len(ev)
    assert all(abs(r.n_eff - n) < 6 * n ** 0.5 for r in rows)
    true_mean = sum(r.value for r in ev) / n
    means = [r.boot_mean for r in rows]
    assert min(means) <= true_mean <= max(means)


# --- dq_referential_integrity --------------------------------------------------

def test_referential_integrity_clean_and_orphan_detection(spark, sf_dir,
                                                          tmp_path):
    from mental_health_bigdata_project_spark.sources import load_table

    rows = {r.fk: r for r in
            QUERIES["dq_referential_integrity"](spark, sf_dir).collect()}
    assert set(rows) == {"lineitem->orders", "orders->customer",
                        "customer->nation"}
    assert all(r.n_orphans == 0 for r in rows.values())
    # inject an orphan order (customer key that does not exist)
    import shutil
    d = str(tmp_path / "dirty")
    import os
    os.makedirs(d)
    for t in ("lineitem", "orders", "customer", "nation"):
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    from pyspark.sql import functions as F

    od = load_table(spark, sf_dir, "orders")
    bad = od.limit(1).withColumn(
        "o_custkey", F.lit(-99).cast(od.schema["o_custkey"].dataType))
    od.unionByName(bad).coalesce(1).write.mode("overwrite") \
        .parquet(f"{d}/orders.parquet.tmp")
    os.remove(f"{d}/orders.parquet")
    os.rename(f"{d}/orders.parquet.tmp", f"{d}/orders.parquet")
    dirty = {r.fk: r for r in
             QUERIES["dq_referential_integrity"](spark, d).collect()}
    assert dirty["orders->customer"].n_orphans == 1


# --- win_streak_islands ---------------------------------------------------------

def test_streaks_on_hand_built_days(spark, tmp_path):
    import datetime

    base = datetime.datetime(2025, 1, 1)
    # user 1: days 1,2,3, 7,8  -> streaks 3 and 2
    # user 2: days 1, 3, 5     -> three 1-day streaks
    evs = []
    eid = 0
    for u, offs in ((1, [0, 1, 2, 6, 7]), (2, [0, 2, 4])):
        for o in offs:
            for rep in range(2):   # two events same day: distinct folds
                evs.append((eid, base + datetime.timedelta(days=o, hours=rep),
                            u, "click", 1.0, "{}"))
                eid += 1
    df = spark.createDataFrame(
        evs, "event_id bigint, ts timestamp_ntz, user_id bigint, "
             "event_type string, value double, props string")
    d = str(tmp_path / "ev")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r.user_id: r for r in
           QUERIES["win_streak_islands"](spark, d).collect()}
    assert out[1].n_active_days == 5
    assert out[1].longest_streak == 3 and out[1].n_streaks == 2
    assert out[2].longest_streak == 1 and out[2].n_streaks == 3


# --- stat_ab_srm ----------------------------------------------------------------

def test_srm_matches_hand_assignment(spark, sf_dir):
    from mental_health_bigdata_project_spark.sources import load_table

    row = QUERIES["stat_ab_srm"](spark, sf_dir).collect()[0]
    users = {r.user_id for r in
             (load_table(spark, sf_dir, "events")
              .select("user_id").distinct().collect())}
    arms = Counter(
        int(hashlib.md5(f"exp1-{u}".encode()).hexdigest()[:8], 16) % 2
        for u in users)
    assert (row.n_control, row.n_treat) == (arms[0], arms[1])
    tot = arms[0] + arms[1]
    chi2 = sum((n - tot / 2) ** 2 / (tot / 2) for n in arms.values())
    assert abs(row.srm_chi2 - chi2) < 1e-6
    # 2-arm identity: chi2 == (n0-n1)^2 / tot
    assert abs(row.srm_chi2 - (arms[0] - arms[1]) ** 2 / tot) < 1e-6


# --- text_burstiness ------------------------------------------------------------

def test_burstiness_separates_clumped_from_spread(spark, tmp_path):
    # 'spread' once per doc in 10 docs (VMR ~ Poisson-ish <= 1);
    # 'clump' 60 times in ONE doc (VMR >> 1); both tot >= 50
    docs = []
    for i in range(10):
        base = ["spread"] * 5 + [f"u{i}{j}" for j in range(3)]
        docs.append((i, " ".join(base)))
    docs[0] = (0, docs[0][1] + " " + " ".join(["clump"] * 60))
    d = _write_docs(spark, tmp_path, docs)
    out = {r.token: r for r in QUERIES["text_burstiness"](spark, d).collect()}
    assert set(out) == {"spread", "clump"}
    n_docs = 10
    # spread: c=5 in every doc -> variance 0 -> VMR 0
    assert out["spread"].vmr == 0.0
    assert out["spread"].burstiness == 5.0
    # clump: tot=60 in one doc: mean 6, E[c^2]=360, var=324, VMR=54
    assert out["clump"].tot == 60 and out["clump"].df == 1
    assert abs(out["clump"].vmr - 54.0) < 1e-6
    assert out["clump"].burstiness == 60.0


# --- graph_adamic_adar -----------------------------------------------------------

def test_adamic_adar_hand_graph(spark, tmp_path):
    import math

    d = _write_docs(spark, tmp_path, [(1, "a b c"), (2, "a b d")])
    rows = {(r.a, r.b): r for r in
            QUERIES["graph_adamic_adar"](spark, d).collect()}
    # edges: ab, ac, bc, ad, bd; deg a=3, b=3, c=2, d=2
    # AA(c,d): common {a,b} -> 2/ln(3)
    # AA(a,b): common {c,d} -> 1/ln2 + 1/ln2
    assert rows[("c", "d")].n_common == 2
    assert abs(rows[("c", "d")].aa_score - 2 / math.log(3)) < 1e-6
    assert abs(rows[("a", "b")].aa_score - 2 / math.log(2)) < 1e-6
    # adjacent-but-no-extra-common pairs score via their wedge only
    assert rows[("a", "c")].n_common == 1   # common neighbor b
    assert abs(rows[("a", "c")].aa_score - 1 / math.log(3)) < 1e-6
