"""Portable sketches, weighted sampling, and closed-form statistics.

No reference counterpart (the reference's only aggregation surface is
the dashboard's exact group-bys — ``dashboard/app.py:30-85``); this is
the [EXT] approximate-query layer a 100 TB pipeline needs when exact
answers stop fitting a shuffle budget:

- ``sketch_hll_portable``      — HyperLogLog distinct-count estimate
                                 with md5-derived registers, so the
                                 ESTIMATE itself (not just a tolerance
                                 verdict) hash-matches DuckDB
- ``sketch_hll_merge``         — the re-aggregation property measured:
                                 monthly register partials max-merged
                                 to year == the direct year build
- ``sketch_hdr_quantiles``     — HDR-histogram quantiles (log2 bucket
                                 + 5 sub-bucket bits, pure integer
                                 math), p50/p90/p99 within 2^-5
                                 relative error, error measured
- ``sketch_bloom_decontam``    — Bloom-filter pre-gate for benchmark
                                 decontamination: k=3 md5 bit
                                 positions, m=2^14 bits, false-positive
                                 rate measured against the exact join
- ``sample_weighted_reservoir``— one-pass weighted top-k reservoir
                                 (Efraimidis–Spirakis A-ES keys from
                                 md5 uniforms)
- ``ml_linreg_closed_form``    — per-group OLS (slope/intercept/r²)
                                 from exact decimal moment sums
- ``lm_kneser_ney_bigram``     — interpolated Kneser–Ney bigram LM
                                 estimation as three count aggregations

Unlike ``sketch_hll_rollup`` / ``sketch_topk_*`` (plans/relational.py),
which wrap the ENGINE's sketch implementations behind tolerance or
exactness verdicts, everything here derives its randomness from md5 —
bit-identical in hashlib, Spark, and DuckDB — so the driver's value
hash pins the approximate OUTPUT, not just a pass/fail flag.

Determinism recipe (registry rules, plans/registry.py): register
indexes, rho ranks, bucket bounds, and bit positions are integer;
harmonic sums accumulate as exact power-of-two BIGINTs (2^(CAP-rho));
the only floats are final per-row scalar expressions (fixed evaluation
order, correctly-rounded IEEE ops) rounded before output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions.vectors import to_double_array
from ..sources import load_table
from .registry import query
from .textops import _TOKS_SQL, corpus_shingles, tokens_col


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- HyperLogLog with portable registers ----------------------------------
#
# m = 64 registers (b = 6 index bits), rho over the next 64 hash bits,
# capped at _HLL_CAP so each register's harmonic term 2^(CAP - rho) is
# an exact BIGINT and the per-group harmonic sum is order-free integer
# addition.  Flajolet et al. 2007 constants: alpha_64 = 0.7213 /
# (1 + 1.079/64); small-range (V > 0, E <= 2.5m) switches to linear
# counting m*ln(m/V).

_HLL_M = 64
_HLL_CAP = 40
_HEX = "0123456789abcdef"

# One register row per key: idx = low 6 bits of the first hash byte,
# rho = 1 + number of leading zero BITS in hash nibbles 3..18.
_HLL_REG_SQL_DUCK = f"""
      (strpos('{_HEX}', substring(h, 1, 1)) - 1) * 16
        + strpos('{_HEX}', substring(h, 2, 1)) - 1 AS b0,
      length(regexp_extract(substring(h, 3, 16), '^0*')) AS zp,
      strpos('{_HEX}', substring(h, 3 + length(regexp_extract(substring(h, 3, 16), '^0*')), 1)) - 1 AS nv
"""


def _hll_registers(keyed: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., idx, mx): max-rho register table for the md5-hashed
    key column ``h``.  The register table is at most m rows per group —
    kilobytes — which is the whole point: partials this size merge up
    any rollup hierarchy without re-touching the fact rows."""
    zp = F.length(F.regexp_extract(F.substring("h", 3, 16), "^0*", 0))
    nv = F.instr(F.lit(_HEX), F.expr(
        "substring(h, 3 + length(regexp_extract("
        "substring(h, 3, 16), '^0*', 0)), 1)")) - 1
    reg = keyed.select(
        *group_cols,
        ((F.instr(F.lit(_HEX), F.substring("h", 1, 1)) - 1) * 16
         + F.instr(F.lit(_HEX), F.substring("h", 2, 1)) - 1).alias("b0"),
        zp.alias("zp"), nv.alias("nv"))
    rho = (F.when(F.col("zp") == 16, F.lit(65))
           .otherwise(4 * F.col("zp")
                      + F.when(F.col("nv") >= 8, 0)
                      .when(F.col("nv") >= 4, 1)
                      .when(F.col("nv") >= 2, 2).otherwise(3) + 1))
    return (reg.select(*group_cols, (F.col("b0") % _HLL_M).alias("idx"),
                       F.least(rho, F.lit(_HLL_CAP)).alias("rr"))
            .groupBy(*group_cols, "idx").agg(F.max("rr").alias("mx")))


def _hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., harmonic_s, n_zero_regs, est): the HLL estimate from a
    register table.  harmonic_s = sum 2^(CAP - mx) + V * 2^CAP is an
    exact BIGINT (order-free), so it anchors the value hash even before
    the float division; est applies the alpha correction and the
    linear-counting small-range switch."""
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(1L, {_HLL_CAP} - mx)")).alias("s_present"),
        F.count("*").alias("n_present"))
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    s = (F.col("s_present")
         + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(1 << _HLL_CAP))
    v = F.lit(_HLL_M) - F.col("n_present")
    e_raw = (F.lit(alpha * _HLL_M * _HLL_M * float(1 << _HLL_CAP))
             / F.col("harmonic_s").cast("double"))
    est = F.when((e_raw <= 2.5 * _HLL_M) & (v > 0),
                 F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v))\
           .otherwise(e_raw)
    return (agg.withColumn("harmonic_s", s.cast("bigint"))
            .select(*group_cols, "harmonic_s",
                    v.cast("bigint").alias("n_zero_regs"),
                    F.round(est, 4).alias("est")))


_HLL_EST_SQL = f"""
    agg AS (
      SELECT {{grp}}, CAST(SUM(1::BIGINT << ({_HLL_CAP} - mx))
                 + ({_HLL_M} - COUNT(*)) * (1::BIGINT << {_HLL_CAP})
                 AS BIGINT) AS harmonic_s,
             CAST({_HLL_M} - COUNT(*) AS BIGINT) AS n_zero_regs
      FROM regs GROUP BY {{grp}}),
    est AS (
      SELECT {{grp}}, harmonic_s, n_zero_regs,
             round(CASE WHEN (0.7213 / (1.0 + 1.079 / {_HLL_M}))
                             * {_HLL_M} * {_HLL_M} * CAST(1::BIGINT << {_HLL_CAP} AS DOUBLE)
                             / CAST(harmonic_s AS DOUBLE) <= 2.5 * {_HLL_M}
                         AND n_zero_regs > 0
                   THEN CAST({_HLL_M} AS DOUBLE)
                        * ln(CAST({_HLL_M} AS DOUBLE) / n_zero_regs)
                   ELSE (0.7213 / (1.0 + 1.079 / {_HLL_M}))
                        * {_HLL_M} * {_HLL_M} * CAST(1::BIGINT << {_HLL_CAP} AS DOUBLE)
                        / CAST(harmonic_s AS DOUBLE)
                   END, 4) AS est
      FROM agg)
"""

def _hll_regs_sql(grp_src: str, grp: str, prefix: str = "") -> str:
    """CTE chain building the register table ``{prefix}regs`` for
    orders.o_custkey at the given grouping.  ``prefix`` namespaces the
    CTEs so one oracle can hold two INDEPENDENT register builds (the
    merge-vs-direct comparison needs a genuinely separate direct
    build, not a regrouping of the same CTE)."""
    return f"""{prefix}hx AS (
      SELECT {grp_src}, md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders),
    {prefix}nib AS (
      SELECT {grp}, {_HLL_REG_SQL_DUCK} FROM {prefix}hx),
    {prefix}rho AS (
      SELECT {grp}, b0 % {_HLL_M} AS idx,
             LEAST(CASE WHEN zp = 16 THEN 65
                   ELSE 4 * zp + (CASE WHEN nv >= 8 THEN 0
                                       WHEN nv >= 4 THEN 1
                                       WHEN nv >= 2 THEN 2 ELSE 3 END) + 1
                   END, {_HLL_CAP}) AS rr
      FROM {prefix}nib),
    {prefix}regs AS (
      SELECT {grp}, idx, MAX(rr) AS mx
      FROM {prefix}rho GROUP BY {grp}, idx)
"""


@query("sketch_hll_portable", f"""
    WITH {_hll_regs_sql("CAST(year(o_orderdate) AS INT) AS yr", "yr")},
    {_HLL_EST_SQL.format(grp="yr")},
    ex AS (SELECT CAST(year(o_orderdate) AS INT) AS yr,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
           FROM orders GROUP BY 1)
    SELECT e.yr, e.harmonic_s, e.n_zero_regs, e.est, x.n_exact,
           round(abs(e.est - x.n_exact) / x.n_exact, 4) AS rel_err,
           CAST(abs(e.est - x.n_exact) / x.n_exact <= 0.39 AS INT)
             AS within_3sigma
    FROM est e JOIN ex x ON x.yr = e.yr
""")
def sketch_hll_portable(spark, sf_dir):
    """HyperLogLog (Flajolet et al. 2007) with PORTABLE registers:
    distinct ordering customers per year, where the register index and
    rho rank derive from md5 — bit-identical in Spark and DuckDB — so
    the driver hash pins the sketch ESTIMATE itself, not a tolerance
    verdict like ``sketch_hll_rollup``'s engine-sketch approx_ok flag.

    Exactness: harmonic terms are 2^(40 - rho) BIGINTs summed in any
    order; the only floats are one division, the alpha multiply, and
    the m*ln(m/V) linear-counting branch — per-row scalars with fixed
    evaluation order, rounded to 4dp.  The exact count and measured
    relative error ride along (m=64 gives sigma = 1.04/8 = 13%%; the
    verdict bound is 3 sigma).

    At 100 TB: the fact scan reduces to m-row register partials per
    group — the groupBy shuffles kilobytes, and the same registers
    merge up any rollup without re-scanning (sketch_hll_merge measures
    exactly that).

    r11: ONE fact scan feeds both legs — registers and the exact
    count both derive from the pinned distinct (yr, custkey) set.
    Equivalent by construction: duplicate keys map to identical
    (idx, rho) so the register max is unchanged, and the exact leg's
    COUNT(DISTINCT custkey) is COUNT(*) of the distinct pairs; md5 now
    runs once per distinct key instead of once per order row."""
    o = _t(spark, sf_dir, "orders")
    dk = (o.select(F.year("o_orderdate").cast("int").alias("yr"),
                   "o_custkey")
          .distinct().localCheckpoint(eager=True))
    keyed = dk.select(
        "yr", F.md5(F.col("o_custkey").cast("string")).alias("h"))
    est = _hll_estimate(_hll_registers(keyed, ["yr"]), ["yr"])
    exact = dk.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n_exact"))
    rel = F.round(F.abs(F.col("est") - F.col("n_exact")) / F.col("n_exact"), 4)
    return est.join(exact, "yr").select(
        "yr", "harmonic_s", "n_zero_regs", "est", "n_exact",
        rel.alias("rel_err"),
        (F.abs(F.col("est") - F.col("n_exact")) / F.col("n_exact") <= 0.39)
        .cast("int").alias("within_3sigma"))


@query("sketch_hll_merge", f"""
    WITH {_hll_regs_sql(
        "CAST(year(o_orderdate) AS INT) AS yr, month(o_orderdate) AS mo",
        "yr, mo")},
    merged AS (
      SELECT yr, idx, MAX(mx) AS mx FROM regs GROUP BY yr, idx),
    magg AS (
      SELECT yr, CAST(SUM(1::BIGINT << ({_HLL_CAP} - mx))
                 + ({_HLL_M} - COUNT(*)) * (1::BIGINT << {_HLL_CAP})
                 AS BIGINT) AS merged_s
      FROM merged GROUP BY yr),
    nm AS (SELECT yr, CAST(COUNT(DISTINCT mo) AS BIGINT) AS n_months
           FROM regs GROUP BY yr),
    {_hll_regs_sql("CAST(year(o_orderdate) AS INT) AS yr", "yr",
                   prefix="d_")},
    direct AS (
      SELECT yr, CAST(SUM(1::BIGINT << ({_HLL_CAP} - mx))
                 + ({_HLL_M} - COUNT(*)) * (1::BIGINT << {_HLL_CAP})
                 AS BIGINT) AS direct_s
      FROM d_regs GROUP BY yr)
    SELECT m.yr, n.n_months, m.merged_s, d.direct_s,
           CAST(m.merged_s = d.direct_s AS INT) AS merge_lossless
    FROM magg m JOIN nm n ON n.yr = m.yr JOIN direct d ON d.yr = m.yr
""")
def sketch_hll_merge(spark, sf_dir):
    """The property that makes HLL the 100 TB distinct-count tool:
    register partials MERGE losslessly.  Build per-(year, month)
    register tables, max-merge them to year level, and compare the
    merged harmonic sum against the register table built directly at
    year granularity — ``merge_lossless`` is pinned to 1 because
    per-register max is associative, so a month -> year -> all-time
    rollup never re-reads the fact table.

    Contrast with sketch_hll_rollup's ``naive_sum_of_partials``: naive
    addition of monthly distinct counts overcounts returning customers;
    register merge doesn't.  The shuffle carries at most m = 64 rows
    per (year, month) — the merge agg is metadata-sized regardless of
    fact-table volume.

    r11: ONE fact scan — the pinned distinct (yr, mo, custkey) set
    feeds the monthly registers, the month count, AND the direct
    year-level build (still an independent register build, exactly as
    before — both were already fed from the same ``keyed`` projection;
    duplicate keys map to identical (idx, rho), so every register max
    is unchanged).  Before: three aggregation chains re-scanned
    orders."""
    o = _t(spark, sf_dir, "orders")
    dk = (o.select(F.year("o_orderdate").cast("int").alias("yr"),
                   F.month("o_orderdate").alias("mo"), "o_custkey")
          .distinct().localCheckpoint(eager=True))
    keyed = dk.select(
        "yr", "mo", F.md5(F.col("o_custkey").cast("string")).alias("h"))
    monthly = _hll_registers(keyed, ["yr", "mo"])
    merged = monthly.groupBy("yr", "idx").agg(F.max("mx").alias("mx"))

    def harmonic(regs, out):
        return regs.groupBy("yr").agg(
            (F.sum(F.expr(f"shiftleft(1L, {_HLL_CAP} - mx)"))
             + (F.lit(_HLL_M) - F.count("*")) * F.lit(1 << _HLL_CAP))
            .cast("bigint").alias(out))

    magg = harmonic(merged, "merged_s")
    nm = monthly.groupBy("yr").agg(
        F.countDistinct("mo").cast("bigint").alias("n_months"))
    direct = harmonic(
        _hll_registers(keyed.select("yr", "h"), ["yr"]), "direct_s")
    return (magg.join(nm, "yr").join(direct, "yr")
            .select("yr", "n_months", "merged_s", "direct_s",
                    (F.col("merged_s") == F.col("direct_s"))
                    .cast("int").alias("merge_lossless")))


# --- engine-native Datasketches twins (rows-only) --------------------------
#
# Spark >= 3.5 ships Apache DataSketches HLL (hll_sketch_agg /
# hll_sketch_estimate / hll_union_agg) and Spark 4 adds approx_top_k.
# These are the PRODUCTION twins of the portable sketches above: the
# sketch binaries and their estimates are engine internals (no DuckDB
# equivalent), so they register rows-only, and the tolerance-verdict
# tests in tests/test_sketches.py pin each one against its oracle-green
# sibling (VERDICT r4 item 7 / r5 item 7).

_HLL_NATIVE_TOL = 0.05  # default lgK=12 -> RSE 1.04/sqrt(4096) ~ 1.6%; 3 sigma


@query("sketch_hll_native")
def sketch_hll_native(spark, sf_dir):
    """Engine-side Datasketches HLL: distinct ordering customers per
    year via hll_sketch_agg + hll_sketch_estimate — the production twin
    of ``sketch_hll_portable`` (oracle-green md5-register HLL, same
    grouping).  Rows-only: the HLL_4 sketch and its estimator are
    engine internals; the ``within_tol`` verdict column (3-sigma bound
    at the default lgK=12) and the exact count riding along pin the
    semantics, plus the ledger test vs the portable sibling.

    At 100 TB this is the path to PREFER over the portable one: the
    sketch partials are JVM-side byte arrays merged map-side (no md5
    per row, no register explode), and the shuffle carries <= 2^lgK
    bytes per group."""
    o = _t(spark, sf_dir, "orders")
    est = (o.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
           .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))")
                .alias("est"),
                F.countDistinct("o_custkey").cast("bigint")
                .alias("n_exact")))
    rel = F.abs(F.col("est") - F.col("n_exact")) / F.col("n_exact")
    return est.select(
        "yr", "est", "n_exact", F.round(rel, 4).alias("rel_err"),
        (rel <= _HLL_NATIVE_TOL).cast("int").alias("within_tol"))


@query("sketch_hll_native_merge")
def sketch_hll_native_merge(spark, sf_dir):
    """Engine-side HLL rollup: per-(year, month) Datasketches sketches
    union-merged to year (hll_union_agg) vs the sketch built directly
    at year grain — the production twin of ``sketch_hll_merge``
    (oracle-green).  The INSTRUCTIVE difference, measured by the
    ``merge_vs_direct_rel`` column: the portable md5-register merge is
    BIT-lossless (merge_lossless pinned = 1 by per-register max), while
    the Datasketches union is only STATISTICALLY lossless — union
    promotes sketch mode/target-lgK internally, so merged and direct
    estimates differ by a fraction of the error bound (observed ~0.3%
    at sf0.01) without violating it.  Both verdict flags bound the
    estimates against the exact count; the rollup itself never re-reads
    the fact table — monthly sketch partials merge in a
    metadata-sized agg."""
    o = _t(spark, sf_dir, "orders")
    keyed = o.select(F.year("o_orderdate").cast("int").alias("yr"),
                     F.month("o_orderdate").alias("mo"), "o_custkey")
    monthly = (keyed.groupBy("yr", "mo")
               .agg(F.expr("hll_sketch_agg(o_custkey)").alias("sk")))
    merged = (monthly.groupBy("yr")
              .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))")
                   .alias("merged_est"),
                   F.count("*").cast("bigint").alias("n_months")))
    direct = (keyed.groupBy("yr")
              .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))")
                   .alias("direct_est"),
                   F.countDistinct("o_custkey").cast("bigint")
                   .alias("n_exact")))
    m_rel = F.abs(F.col("merged_est") - F.col("n_exact")) / F.col("n_exact")
    d_rel = F.abs(F.col("direct_est") - F.col("n_exact")) / F.col("n_exact")
    return (merged.join(direct, "yr")
            .select("yr", "n_months", "merged_est", "direct_est", "n_exact",
                    F.round(F.abs(F.col("merged_est") - F.col("direct_est"))
                            / F.col("n_exact"), 4)
                    .alias("merge_vs_direct_rel"),
                    (m_rel <= _HLL_NATIVE_TOL).cast("int")
                    .alias("merged_within_tol"),
                    (d_rel <= _HLL_NATIVE_TOL).cast("int")
                    .alias("direct_within_tol")))


@query("sketch_topk_native")
def sketch_topk_native(spark, sf_dir):
    """Engine-side frequent-items top-k (Spark 4 approx_top_k,
    Datasketches frequent-items): the 20 most frequent corpus tokens
    with counts — the production twin of the exact ``text_token_freq``
    (oracle-green).  maxItemsTracked is set far above the corpus
    vocabulary, so the sketch runs in its exact regime here and the
    parity test pins every returned (token, count) against the exact
    aggregate; past capacity at real corpus scale the same plan
    degrades gracefully to guaranteed-error estimates instead of
    OOMing on the vocabulary — THE reason to prefer it over an exact
    top-k once the item domain stops fitting in an executor."""
    from .textops import tokens_col
    toks = (_t(spark, sf_dir, "documents")
            .select(F.explode(tokens_col()).alias("token")))
    sk = toks.agg(F.expr("approx_top_k(token, 20, 100000)").alias("tk"))
    return (sk.select(F.posexplode("tk").alias("pos", "e"))
            .select((F.col("pos") + 1).cast("int").alias("rnk"),
                    F.col("e.item").alias("token"),
                    F.col("e.count").cast("bigint").alias("n")))


@query("sketch_topk_native_merge")
def sketch_topk_native_merge(spark, sf_dir):
    """Mergeable top-k rollup (Spark 4 approx_top_k_accumulate /
    _combine / _estimate): one frequent-items sketch per SOURCE,
    combined to the corpus answer without re-reading the fact table —
    the rollup face of ``sketch_topk_native`` (whose exact sibling is
    the oracle-green ``text_token_freq``), and the top-k analog of
    ``sketch_hll_native_merge``.  In the exact regime (maxItemsTracked
    above the vocabulary) the combine is lossless, so the parity test
    pins the merged output against both the single-pass sketch and the
    exact aggregate.

    At 100 TB this is the shape that matters: per-partition/per-source
    sketch states are kilobytes, persist as a metadata-sized rollup
    table, and answer "top tokens last month / per source / overall"
    by combining states — never re-scanning text."""
    from .textops import tokens_col
    toks = (_t(spark, sf_dir, "documents")
            .select("source", F.explode(tokens_col()).alias("token")))
    per_src = (toks.groupBy("source")
               .agg(F.expr("approx_top_k_accumulate(token, 100000)")
                    .alias("st")))
    sk = per_src.agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(st), 20)")
        .alias("tk"))
    return (sk.select(F.posexplode("tk").alias("pos", "e"))
            .select((F.col("pos") + 1).cast("int").alias("rnk"),
                    F.col("e.item").alias("token"),
                    F.col("e.count").cast("bigint").alias("n")))


@query("sketch_theta_setops_native")
def sketch_theta_setops_native(spark, sf_dir):
    """Engine-side Datasketches THETA set algebra (Spark 4
    theta_sketch_agg / theta_union / theta_intersection /
    theta_difference): customers active in 1996 (A) and 1997 (B), with
    |A ∪ B|, |A ∩ B| and |A \\ B| read off the sketches — the
    production twin of ``sketch_hll_setops`` (oracle-green), and the
    upgrade over it: HLL only supports union, so that query derives the
    intersection by inclusion-exclusion (compounding three estimates'
    errors); theta sketches carry their sampling threshold, so
    intersection and difference are FIRST-CLASS operations with their
    own bounded error.  Rows-only: the sketch binaries and estimator
    are engine internals; exact counts ride along with relative-error
    columns and tolerance verdicts, pinned by the ledger test.

    At 100 TB: one theta sketch per (source, slice) answers any
    overlap/rollout/churn question between any pair of slices from
    kilobyte-sized state — the exact comparator is the audit, not the
    serving path (same economics note as sketch_hll_setops)."""
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("yr"), "o_custkey")
    oy = o.filter(F.col("yr").isin(1996, 1997))
    keyed = oy.select(
        F.when(F.col("yr") == 1996, "a").otherwise("b").alias("tag"),
        "o_custkey")
    # one sketch per tag; the conditional max just pivots the single
    # non-null binary per branch into columns (max over one value)
    sks = (keyed.groupBy("tag")
           .agg(F.expr("theta_sketch_agg(o_custkey)").alias("sk"))
           .agg(F.max(F.when(F.col("tag") == "a", F.col("sk")))
                .alias("sk_a"),
                F.max(F.when(F.col("tag") == "b", F.col("sk")))
                .alias("sk_b")))
    est = sks.select(
        F.expr("theta_sketch_estimate(sk_a)").alias("est_a"),
        F.expr("theta_sketch_estimate(sk_b)").alias("est_b"),
        F.expr("theta_sketch_estimate(theta_union(sk_a, sk_b))")
        .alias("est_union"),
        F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
        .alias("est_inter"),
        F.expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))")
        .alias("est_diff"))
    exact = oy.agg(
        F.countDistinct(F.when(F.col("yr") == 1996, F.col("o_custkey")))
        .cast("bigint").alias("exact_a"),
        F.countDistinct(F.when(F.col("yr") == 1997, F.col("o_custkey")))
        .cast("bigint").alias("exact_b"),
        F.countDistinct("o_custkey").cast("bigint").alias("exact_union"))
    rel = lambda e, x: F.abs(F.col(e) - F.col(x)) / F.col(x)  # noqa: E731
    return (est.crossJoin(exact)
            .withColumn("exact_inter",
                        (F.col("exact_a") + F.col("exact_b")
                         - F.col("exact_union")).cast("bigint"))
            .withColumn("exact_diff",
                        (F.col("exact_a") - F.col("exact_inter"))
                        .cast("bigint"))
            .select("est_a", "est_b", "est_union", "est_inter", "est_diff",
                    "exact_a", "exact_b", "exact_union", "exact_inter",
                    "exact_diff",
                    F.round(rel("est_inter", "exact_inter"), 4)
                    .alias("inter_rel_err"),
                    (rel("est_union", "exact_union") <= _HLL_NATIVE_TOL)
                    .cast("int").alias("union_within_tol"),
                    (rel("est_inter", "exact_inter") <= 0.15)
                    .cast("int").alias("inter_within_tol")))


# --- HDR-histogram quantile sketch ----------------------------------------
#
# Bucket a positive integer c by its binary exponent e = bitlength - 1
# plus the next _HDR_BITS bits: bucket lower bound = (c >> g) << g with
# g = max(e - _HDR_BITS, 0).  Relative bucket width <= 2^-_HDR_BITS, so
# any quantile read off the bucket CDF is within that relative error.
# Pure integer math — no log() anywhere — which is what makes the
# bucket id portable across engines (ceil(log_gamma(x)) bucketing a la
# DDSketch would hinge on libm ulps at bucket boundaries).

_HDR_BITS = 5
_HDR_QS = [0.5, 0.9, 0.99]
_HDR_QS_SQL = ", ".join(f"({q})" for q in _HDR_QS)


@query("sketch_hdr_quantiles", f"""
    WITH c AS (
      SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
      FROM lineitem),
    b AS (
      SELECT (c >> g) << g AS b_lo, g, COUNT(*) AS cnt
      FROM (SELECT c, GREATEST(length(ltrim(bin(c), '0')) - 1 - {_HDR_BITS},
                               0) AS g FROM c)
      GROUP BY 1, 2),
    cdf AS (
      SELECT b_lo, g, cnt,
             CAST(SUM(cnt) OVER (ORDER BY b_lo) AS BIGINT) AS cum
      FROM b),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
    qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES {_HDR_QS_SQL}) AS t(q)),
    pick AS (
      SELECT q.q, MIN(f.b_lo) AS b_lo
      FROM qs q CROSS JOIN n
      JOIN cdf f ON f.cum >= CAST(ceil(q.q * n.n) AS BIGINT)
      GROUP BY q.q),
    vcdf AS (
      SELECT c, CAST(SUM(cnt) OVER (ORDER BY c) AS BIGINT) AS cum
      FROM (SELECT c, COUNT(*) AS cnt FROM c GROUP BY c)),
    exact AS (
      SELECT q.q, MIN(v.c) AS exact_c
      FROM qs q CROSS JOIN n
      JOIN vcdf v ON v.cum >= CAST(ceil(q.q * n.n) AS BIGINT)
      GROUP BY q.q)
    SELECT p.q,
           round((p.b_lo + (CAST(p.b_lo >= (1::BIGINT << {_HDR_BITS + 1})
                      AS INT) * ((1::BIGINT << GREATEST(
                        length(ltrim(bin(p.b_lo), '0')) - 1 - {_HDR_BITS}, 0))
                      - 1)) / 2.0) / 100.0, 4) AS est,
           round(x.exact_c / 100.0, 2) AS exact,
           round(abs((p.b_lo + (CAST(p.b_lo >= (1::BIGINT << {_HDR_BITS + 1})
                      AS INT) * ((1::BIGINT << GREATEST(
                        length(ltrim(bin(p.b_lo), '0')) - 1 - {_HDR_BITS}, 0))
                      - 1)) / 2.0) - x.exact_c) / x.exact_c, 6) AS rel_err,
           CAST(abs((p.b_lo + (CAST(p.b_lo >= (1::BIGINT << {_HDR_BITS + 1})
                      AS INT) * ((1::BIGINT << GREATEST(
                        length(ltrim(bin(p.b_lo), '0')) - 1 - {_HDR_BITS}, 0))
                      - 1)) / 2.0) - x.exact_c) / x.exact_c
                <= 1.0 / (1 << {_HDR_BITS}) AS INT) AS within_bound
    FROM pick p JOIN exact x ON x.q = p.q
""")
def sketch_hdr_quantiles(spark, sf_dir):
    """HDR-histogram quantile sketch (High Dynamic Range buckets a la
    Gil Tene; same guarantee class as DDSketch): p50/p90/p99 of
    l_extendedprice from a log2-bucketed integer histogram — bucket =
    top 1+5 significant bits of the price in cents, so every estimate
    is within 2^-5 = 3.125% relative error by construction, with the
    exact quantile and measured error alongside.

    The bucketing is PURE INTEGER (bit length via bin(), shifts for
    bounds) — no log() calls — which is why both engines agree on
    every bucket id exactly; DDSketch's ceil(log_gamma(x)) would hinge
    on libm's last ulp exactly at bucket boundaries.

    At 100 TB: the fact scan collapses into bounded bucket counters
    (~64 octaves x 32 sub-buckets) via map-side combine — the
    histogram is mergeable across partitions and partials by plain
    addition — and the quantile read is a window over that bounded
    histogram; the full-data alternative (global sort or rank) never
    happens.  The exact comparator column computes its CDF over
    DISTINCT cents values, also bounded far below row count."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.select(hdr_cents_expr().alias("c"))
    b = hdr_histogram(c)
    nrow = c.agg(F.count("*").cast("bigint").alias("n"))
    pick = hdr_pick_buckets(spark, b, nrow=nrow)
    qs = spark.createDataFrame([(q,) for q in _HDR_QS], "q double")
    target = F.ceil(F.col("q") * F.col("n")).cast("bigint")
    vcdf = (c.groupBy("c").agg(F.count("*").alias("cnt"))
            .withColumn("cum",
                        F.sum("cnt").over(Window.orderBy("c")).cast("bigint")))
    exact = (vcdf.crossJoin(F.broadcast(qs)).crossJoin(F.broadcast(nrow))
             .filter(F.col("cum") >= target)
             .groupBy("q").agg(F.min("c").alias("exact_c")))
    mid = hdr_bucket_midpoint()
    rel = F.abs(mid - F.col("exact_c")) / F.col("exact_c")
    return (pick.join(exact, "q")
            .select("q", F.round(mid / 100.0, 4).alias("est"),
                    F.round(F.col("exact_c") / 100.0, 2).alias("exact"),
                    F.round(rel, 6).alias("rel_err"),
                    (rel <= 1.0 / (1 << _HDR_BITS)).cast("int")
                    .alias("within_bound")))


HDR_CENTS_SQL = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"


def hdr_cents_expr():
    """Column expression for the default HDR input (price cents) —
    built lazily because F.expr needs an active session."""
    return F.expr(HDR_CENTS_SQL)


def hdr_histogram(c: DataFrame) -> DataFrame:
    """(b_lo, cnt): the bounded HDR bucket histogram of a positive
    BIGINT column ``c`` — the mergeable state (bucket counts combine
    by plain addition; sketch_hdr_merge pins it, and the streaming
    twin streaming/histstate.py persists exactly these rows)."""
    g = F.greatest(F.length(F.bin("c")) - 1 - _HDR_BITS, F.lit(0))
    return (c.select("c", g.alias("g"))
            .select(F.expr("shiftleft(shiftright(c, g), g)").alias("b_lo"))
            .groupBy("b_lo").agg(F.count("*").cast("bigint").alias("cnt")))


def hdr_pick_buckets(spark, hist: DataFrame,
                     qs: list[float] | None = None,
                     nrow: DataFrame | None = None) -> DataFrame:
    """(q, b_lo): the bucket holding each requested quantile, read off
    the histogram CDF (a window over the BOUNDED bucket table).

    ``nrow`` (a 1-row ``n BIGINT`` frame) lets a caller that already
    has the total share it; otherwise it is summed from the histogram —
    callers that also compute their own total should pass it in so the
    plan carries ONE global aggregate, not two."""
    qdf = spark.createDataFrame([(q,) for q in (qs or _HDR_QS)], "q double")
    cdf = hist.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("b_lo")).cast("bigint"))
    if nrow is None:
        nrow = hist.agg(F.sum("cnt").cast("bigint").alias("n"))
    target = F.ceil(F.col("q") * F.col("n")).cast("bigint")
    return (cdf.crossJoin(F.broadcast(qdf)).crossJoin(F.broadcast(nrow))
            .filter(F.col("cum") >= target)
            .groupBy("q").agg(F.min("b_lo").alias("b_lo")))


def hdr_bucket_midpoint():
    """Midpoint of bucket ``b_lo`` (singleton buckets below
    2^(bits+1) have width 1)."""
    width_m1 = (F.expr(f"CAST(b_lo >= shiftleft(1L, {_HDR_BITS + 1}) AS INT)")
                * (F.expr(
                    f"shiftleft(1L, GREATEST(length(bin(b_lo)) - 1 "
                    f"- {_HDR_BITS}, 0))") - 1))
    return F.col("b_lo") + width_m1 / 2.0


# --- Bloom-filter decontamination pre-gate --------------------------------

_BLOOM_M = 1 << 14   # bits
_BLOOM_K = 3         # hash functions

_BLOOM_SHINGLES_SQL = f"""
    d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(
          CASE WHEN len(toks) >= 3 THEN
              list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
          ELSE [] END)) AS shingle
      FROM d),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0)
"""

def _bloom_bit_sql_tpl(m: int, nibbles: int = 4) -> str:
    """SQL template for bit position j of shingle s: fold ``nibbles``
    md5 nibbles of (s || '#j') into an integer and reduce mod m (use
    enough nibbles that 16^nibbles >= m)."""
    terms = " + ".join(
        f"(strpos('{_HEX}', substring(md5({{s}} || '#' || {{j}}), "
        f"{p + 1}, 1)) - 1) * {16 ** (nibbles - 1 - p)}"
        for p in range(nibbles))
    return f"(({terms}) % {m})"


# bit position j of shingle s: fold 4 md5 nibbles of (s || '#j').
_BLOOM_BIT_SQL = _bloom_bit_sql_tpl(_BLOOM_M, 4)


def _bloom_bit_col(s_col: str, j: int, m: int = _BLOOM_M,
                   nibbles: int = 4) -> Column:
    """Bit position j of shingle column ``s_col`` — the same md5-nibble
    fold as _bloom_bits but with j a LITERAL, so the probe side can
    carry all K bit positions as plain columns on the un-exploded gram
    row instead of tripling the relation through an explode."""
    h = F.md5(F.concat(F.col(s_col), F.lit(f"#{j}")))
    bit = None
    for p in range(nibbles):
        term = ((F.instr(F.lit(_HEX), F.substring(h, p + 1, 1)) - 1)
                * (16 ** (nibbles - 1 - p)))
        bit = term if bit is None else bit + term
    return (bit % m).cast("int")


def _bloom_bits(df: DataFrame, s_col: str, m: int = _BLOOM_M,
                nibbles: int = 4) -> DataFrame:
    """Explode each shingle into its _BLOOM_K bit positions."""
    out = df.select(
        "*", F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)]))
        .alias("j"))
    h = F.md5(F.concat(F.col(s_col), F.lit("#"), F.col("j").cast("string")))
    bit = None
    for p in range(nibbles):
        term = ((F.instr(F.lit(_HEX), F.substring(h, p + 1, 1)) - 1)
                * (16 ** (nibbles - 1 - p)))
        bit = term if bit is None else bit + term
    return out.withColumn("bit", (bit % m).cast("int"))


def _bloom_probe_verdicts(train: DataFrame, bench: DataFrame, s_col: str,
                          m: int = _BLOOM_M, nibbles: int = 4) -> DataFrame:
    """(train columns.., bloom_pos, exact_pos) via K BROADCAST joins on
    the un-exploded gram relation — one row in, one row out.

    The r9 formulation exploded every train gram K ways, semi-joined
    the bit table, re-grouped on (doc_id, gram) to count set bits, and
    sort-merge-joined that back onto train: two corpus-gram-sized
    shuffles plus a 3x explode (guide §2.3/§2.4).  All the probe ever
    needs is "is bit_j set" for K literal j's — each a hash lookup in
    the broadcast bit table — so bloom_pos = AND over K broadcast
    left-join hits, computed in the same stage as the scan.  Bit
    values, and therefore every aggregate downstream, are unchanged."""
    bbits = (_bloom_bits(bench, s_col, m=m, nibbles=nibbles)
             .select("bit").distinct())
    probe = train.select(
        "*", *[_bloom_bit_col(s_col, j, m=m, nibbles=nibbles)
               .alias(f"_bit{j}") for j in range(_BLOOM_K)])
    for j in range(_BLOOM_K):
        hit = (bbits.withColumnRenamed("bit", f"_bit{j}")
               .withColumn(f"_hit{j}", F.lit(1)))
        probe = probe.join(F.broadcast(hit), f"_bit{j}", "left")
    bloom_pos = None
    for j in range(_BLOOM_K):
        c = F.col(f"_hit{j}").isNotNull()
        bloom_pos = c if bloom_pos is None else (bloom_pos & c)
    return (probe
            .join(F.broadcast(bench.withColumn("_ex", F.lit(1))),
                  s_col, "left")
            .withColumn("bloom_pos", bloom_pos.cast("int"))
            .withColumn("exact_pos", F.coalesce("_ex", F.lit(0)))
            .drop("_ex", *[f"_bit{j}" for j in range(_BLOOM_K)],
                  *[f"_hit{j}" for j in range(_BLOOM_K)]))


def _bloom_verdict_report(verdicts: DataFrame) -> DataFrame:
    """The shared (n_train_grams .. n_docs_exact) rollup over a
    per-gram verdict relation.

    The direct form — one agg with two COUNT(DISTINCT doc_id) branches
    — plans an Expand that TRIPLES the gram relation before its
    exchange (guide §2.3: shuffle fewer bytes; the r10 `_before` plans
    show Expand feeding the widest Exchange of both bloom gates).
    Grouping by doc_id first reduces map-side to ~#docs rows (distinct-
    doc flags become per-doc MAX, gram counters per-doc SUMs), then a
    1-row total sums the per-doc partials — every output is the same
    exact integer (sum of per-group integer sums == global sum;
    COUNT(DISTINCT doc) == SUM over docs of MAX(flag)), so the oracle
    hash is unchanged."""
    fp_g = ((F.col("bloom_pos") == 1) & (F.col("exact_pos") == 0))
    fn_g = ((F.col("bloom_pos") == 0) & (F.col("exact_pos") == 1))
    per_doc = (verdicts.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("_n"),
                    F.sum("bloom_pos").alias("_nb"),
                    F.sum("exact_pos").alias("_nx"),
                    F.sum(fp_g.cast("int")).alias("_nfp"),
                    F.sum(fn_g.cast("int")).alias("_nfn"),
                    F.max("bloom_pos").alias("_db"),
                    F.max("exact_pos").alias("_dx")))
    # COUNT(*)/COUNT(DISTINCT ..) are 0 on an empty relation while SUM
    # is NULL — coalesce exactly those three so the empty-train edge
    # (tiny fixtures) keeps the original/oracle values
    return per_doc.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint")
        .alias("n_train_grams"),
        F.sum("_nb").cast("bigint").alias("n_bloom_pos"),
        F.sum("_nx").cast("bigint").alias("n_exact_pos"),
        F.sum("_nfp").cast("bigint").alias("n_false_pos"),
        F.sum("_nfn").cast("bigint").alias("n_false_neg"),
        F.round(F.sum("_nfp").cast("double") / F.sum("_n"), 6)
        .alias("fp_rate"),
        F.coalesce(F.sum("_db"), F.lit(0)).cast("bigint")
        .alias("n_docs_bloom"),
        F.coalesce(F.sum("_dx"), F.lit(0)).cast("bigint")
        .alias("n_docs_exact"))


@query("sketch_bloom_decontam", f"""
    WITH {_BLOOM_SHINGLES_SQL},
    bbits AS (
      SELECT DISTINCT {_BLOOM_BIT_SQL.format(s="b.shingle", j="j.j")} AS bit
      FROM bench b CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS j) j),
    probe AS (
      SELECT t.doc_id, t.shingle,
             {_BLOOM_BIT_SQL.format(s="t.shingle", j="j.j")} AS bit
      FROM train t CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS j) j),
    hits AS (
      SELECT p.doc_id, p.shingle, COUNT(b.bit) AS n_set
      FROM probe p LEFT JOIN bbits b ON b.bit = p.bit
      GROUP BY p.doc_id, p.shingle),
    verdicts AS (
      SELECT h.doc_id, h.shingle,
             CAST(h.n_set = {_BLOOM_K} AS INT) AS bloom_pos,
             CAST(x.shingle IS NOT NULL AS INT) AS exact_pos
      FROM hits h LEFT JOIN bench x ON x.shingle = h.shingle)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_train_grams,
           CAST(SUM(bloom_pos) AS BIGINT) AS n_bloom_pos,
           CAST(SUM(exact_pos) AS BIGINT) AS n_exact_pos,
           CAST(SUM(CASE WHEN bloom_pos = 1 AND exact_pos = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN bloom_pos = 0 AND exact_pos = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
           round(CAST(SUM(CASE WHEN bloom_pos = 1 AND exact_pos = 0
                         THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS fp_rate,
           CAST(COUNT(DISTINCT CASE WHEN bloom_pos = 1
                      THEN doc_id END) AS BIGINT) AS n_docs_bloom,
           CAST(COUNT(DISTINCT CASE WHEN exact_pos = 1
                      THEN doc_id END) AS BIGINT) AS n_docs_exact
    FROM verdicts
""")
def sketch_bloom_decontam(spark, sf_dir):
    """Bloom-filter pre-gate for benchmark decontamination, with its
    false-positive rate MEASURED against the exact membership join:
    the benchmark split's 3-gram shingles set k=3 md5-derived bits in
    an m=2^14 filter; a training gram is bloom-positive iff all three
    of its bits are set.  n_false_neg is structurally 0 (the filter
    never drops a true member) — pinned in the hashed output.

    Why this matters at 100 TB: decontam_benchmark broadcasts the
    benchmark SHINGLE STRINGS; this gate broadcasts a BITMAP (2 KiB
    here; a few hundred MB for a billion-gram benchmark at 10 bits/
    element) and filters the training scan map-side, so only the ~fp%%
    of grams that pass ever reach the exact verification join.  The
    relational encoding (bit table + count == k) expresses exactly the
    bitmap probe; the physical bitmap lives in the broadcast hash
    table.  Spark's own BloomFilterAggregate does this engine-side;
    the md5 bit derivation keeps it oracle-checkable."""
    # the exploded shingle table feeds FOUR consumers (bench bits,
    # probe, exact verdict, train rows) — and three OTHER queries
    # consume the same relation, so it comes from the session-wide
    # memoized checkpoint (textops.corpus_shingles)
    sh = corpus_shingles(spark, sf_dir)
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    # (doc_id, shingle) is already distinct: sh explodes
    # array_distinct per doc — no dedup shuffle needed here
    train = sh.filter(F.col("doc_id") % 97 != 0)
    # bloom_pos/exact_pos ride the train scan through K+1 broadcast
    # joins — no explode, no (doc_id, gram) re-group, no join-back
    # (the r9 shape paid two corpus-gram shuffles; see
    # _bloom_probe_verdicts for the equivalence argument)
    verdicts = _bloom_probe_verdicts(train, bench, "shingle")
    # per-doc pre-aggregation instead of the 2-countDistinct Expand
    # (r10 round 2; see _bloom_verdict_report)
    return _bloom_verdict_report(verdicts)


# --- GPT-3-style 13-gram Bloom decontamination ----------------------------

_NG13 = 13                # the GPT-3 Appendix C overlap window
_NG13_BLOOM_M = 1 << 17   # bits (13-gram vocab >> 3-gram: bigger filter)
_NG13_BIT_SQL = _bloom_bit_sql_tpl(_NG13_BLOOM_M, nibbles=5)

_NG13_GRAMS_SQL = f"""
    d AS (SELECT doc_id, {{toks}} AS toks FROM documents),
    g AS (SELECT doc_id, unnest(list_distinct(list_transform(
              range(1, len(toks) - {_NG13} + 2),
              i -> md5(array_to_string(toks[i:i+{_NG13 - 1}], ' '))))) AS h
          FROM d WHERE len(toks) >= {_NG13}),
    bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
    train AS (SELECT doc_id, h FROM g WHERE doc_id % 97 <> 0)
"""


@query("decontam_ngram13_bloom", f"""
    WITH {_NG13_GRAMS_SQL.format(toks=_TOKS_SQL)},
    bbits AS (
      SELECT DISTINCT {_NG13_BIT_SQL.format(s="b.h", j="j.j")} AS bit
      FROM bench b CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS j) j),
    probe AS (
      SELECT t.doc_id, t.h,
             {_NG13_BIT_SQL.format(s="t.h", j="j.j")} AS bit
      FROM train t CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS j) j),
    hits AS (
      SELECT p.doc_id, p.h, COUNT(b.bit) AS n_set
      FROM probe p LEFT JOIN bbits b ON b.bit = p.bit
      GROUP BY p.doc_id, p.h),
    verdicts AS (
      SELECT t.doc_id,
             CAST(coalesce(hi.n_set, 0) = {_BLOOM_K} AS INT) AS bloom_pos,
             CAST(x.h IS NOT NULL AS INT) AS exact_pos
      FROM train t
      LEFT JOIN hits hi ON hi.doc_id = t.doc_id AND hi.h = t.h
      LEFT JOIN bench x ON x.h = t.h)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_train_grams,
           CAST(SUM(bloom_pos) AS BIGINT) AS n_bloom_pos,
           CAST(SUM(exact_pos) AS BIGINT) AS n_exact_pos,
           CAST(SUM(CASE WHEN bloom_pos = 1 AND exact_pos = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN bloom_pos = 0 AND exact_pos = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
           round(CAST(SUM(CASE WHEN bloom_pos = 1 AND exact_pos = 0
                         THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS fp_rate,
           CAST(COUNT(DISTINCT CASE WHEN bloom_pos = 1
                      THEN doc_id END) AS BIGINT) AS n_docs_bloom,
           CAST(COUNT(DISTINCT CASE WHEN exact_pos = 1
                      THEN doc_id END) AS BIGINT) AS n_docs_exact
    FROM verdicts
""")
def decontam_ngram13_bloom(spark, sf_dir):
    """GPT-3-style 13-GRAM Bloom decontamination gate (Brown et al.
    2020, Appendix C: training-set contamination was defined as a
    13-gram overlap with any benchmark document; VERDICT r9 item 1's
    third candidate).  The benchmark split's distinct 13-gram
    fingerprints set k=3 bits (5-nibble md5 fold) in an m=2^17 filter
    — larger than the 3-gram gate's 2^14 because the 13-gram
    vocabulary is nearly corpus-sized (almost every window is unique),
    exactly why GPT-3 chose it: a hit is a near-certain verbatim
    overlap, not a common phrase.  Grams are md5 fingerprints of the
    13-token window (split_leakage_audit's convention), so the
    benchmark set broadcasts as fixed-width hashes, never strings.
    n_false_neg is structurally 0; fp_rate is MEASURED against the
    exact membership join, like the 3-gram parent.

    At 100 TB: the filter stays a broadcast bitmap (2^17 bits here;
    ~10 bits/gram at production benchmark sizes), probed map-side
    during the training scan — only bloom-positives reach the exact
    verify join, and the gram relation is ~1 row per corpus token
    carrying a 32-char hash, the span-dedup shape."""
    t = (_t(spark, sf_dir, "documents")
         .select("doc_id", tokens_col().alias("toks"))
         .filter(F.size("toks") >= _NG13))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - _NG13 + 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, _NG13))))
    g = (t.select("doc_id",
                  F.explode(F.array_distinct(grams)).alias("h"))
         .localCheckpoint(eager=True))     # feeds bench + train + verdicts
    bench = g.filter(F.col("doc_id") % 97 == 0).select("h").distinct()
    train = g.filter(F.col("doc_id") % 97 != 0)
    # same broadcast-probe rewrite as the 3-gram parent: K bit columns
    # on the un-exploded gram row + K broadcast hit joins replace the
    # explode -> semi-join -> regroup -> join-back chain
    verdicts = _bloom_probe_verdicts(train, bench, "h",
                                     m=_NG13_BLOOM_M, nibbles=5)
    # per-doc pre-aggregation instead of the 2-countDistinct Expand
    # (r10 round 2; see _bloom_verdict_report)
    return _bloom_verdict_report(verdicts)


# --- weighted reservoir sampling (Efraimidis–Spirakis A-ES) ---------------

_RES_K = 10

# 13 md5 nibbles -> 52-bit uniform in [0, 1): exactly representable.
_U_SQL_DUCK = (
    "list_aggregate(list_transform(range(1, 14), i -> "
    "(strpos('{hx}', substring(md5('wres:' || CAST(doc_id AS VARCHAR)), i, 1))"
    " - 1) * (16.0 ** (13 - i))), 'sum') / (16.0 ** 13)").format(hx=_HEX)


@query("sample_weighted_reservoir", f"""
    WITH keyed AS (
      SELECT doc_id, CAST(GREATEST(n_chars, 1) AS BIGINT) AS w,
             round(pow({_U_SQL_DUCK}, 1.0 / GREATEST(n_chars, 1)), 12) AS k
      FROM documents)
    SELECT doc_id, w, k
    FROM keyed ORDER BY k DESC, doc_id LIMIT {_RES_K}
""")
def sample_weighted_reservoir(spark, sf_dir):
    """One-pass weighted sampling without replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): each document draws key u^(1/w)
    from a uniform u and its weight w = n_chars, and the top-k keys
    ARE a weighted sample — inclusion probability proportional to
    weight, no second pass, no global knowledge of total weight.

    This is the distributed-sampling workhorse: every partition keeps
    its local top-k (TakeOrderedAndProject — the same physical shape as
    topk_recent), partials merge on the driver in O(partitions * k).
    Contrast sample_weighted_systematic, which needs a global
    cumulative-weight prefix (a two-phase rank) — A-ES trades that
    coordination for per-row randomness, which is why streaming and
    map-reduce samplers all use it.

    Determinism: u folds 13 md5 nibbles (52 bits — exactly
    representable); pow's last-ulp is masked by the 12dp round (a flip
    would need two keys within 1e-12 AND an engine ulp disagreement),
    and the ordering carries the doc_id tiebreak."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("wres:"), F.col("doc_id").cast("string")))
    u = None
    for i in range(13):
        term = ((F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1)
                .cast("double") * float(16.0 ** (12 - i)))
        u = term if u is None else u + term
    u = u / float(16.0 ** 13)
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("bigint")
    return (d.select("doc_id", w.alias("w"),
                     F.round(F.pow(u, 1.0 / w), 12).alias("k"))
            .orderBy(F.desc("k"), "doc_id").limit(_RES_K))


# --- closed-form per-group OLS --------------------------------------------

@query("ml_linreg_closed_form", """
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(CAST(floor(l_quantity + 0.5) AS BIGINT)
                 AS DECIMAL(38,0))) AS sx,
             SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS DECIMAL(38,0))) AS sy,
             SUM(CAST(CAST(floor(l_quantity + 0.5) AS BIGINT)
                      * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(CAST(floor(l_quantity + 0.5) AS BIGINT)
                      * CAST(floor(l_quantity + 0.5) AS BIGINT)
                 AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                      * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS DECIMAL(38,0))) AS syy
      FROM lineitem GROUP BY l_returnflag),
    d AS (
      SELECT l_returnflag, n,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cov_n,
             CAST(n * sxx - sx * sx AS DOUBLE) AS varx_n,
             CAST(n * syy - sy * sy AS DOUBLE) AS vary_n,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM m)
    SELECT l_returnflag, n,
           round(cov_n / varx_n / 100.0, 6) AS slope,
           round((syd - (cov_n / varx_n) * sxd) / n / 100.0, 4) AS intercept,
           round(cov_n * cov_n / (varx_n * vary_n), 6) AS r2
    FROM d
""")
def ml_linreg_closed_form(spark, sf_dir):
    """Per-group ordinary least squares from the normal equations:
    price-vs-quantity slope, intercept, and r² per l_returnflag, with
    every moment (n, Σx, Σy, Σxy, Σx², Σy²) accumulated as an EXACT
    DECIMAL(38,0) over integer-quantized inputs (quantity units, price
    cents) — so unlike MLlib's LinearRegression (LBFGS internals,
    rows-only in the mllib ledger), the fitted coefficients hash-match
    DuckDB bitwise.

    This is the textbook map-side-combinable regression: one pass, six
    partial sums per group, no iteration, no feature matrix — the
    entire reduce state is 6 numbers per group, so at 100 TB the
    shuffle moves a few hundred bytes per group regardless of row
    count.  Closed-form determinism recipe: exact decimal moment
    differences (n·Σxy − ΣxΣy etc.), ONE cast to double per quantity,
    then fixed-order scalar arithmetic rounded for output.

    ``linreg_moments`` / ``linreg_fit`` are shared with the streaming
    twin (streaming/momentstate.py), so the serve-time fit can never
    drift from this oracle-checked one."""
    li = _t(spark, sf_dir, "lineitem")
    return linreg_fit(linreg_moments(li, "l_returnflag"), "l_returnflag")


LINREG_X_EXPR = "CAST(floor(l_quantity + 0.5) AS BIGINT)"
LINREG_Y_EXPR = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
LINREG_MOMS = ["n", "sx", "sy", "sxy", "sxx", "syy"]
_LINREG_DEC = "decimal(38,0)"


def linreg_moments(df: DataFrame, group_col: str,
                   x_expr: str = LINREG_X_EXPR,
                   y_expr: str = LINREG_Y_EXPR) -> DataFrame:
    """Per-group exact DECIMAL(38,0) OLS moment sums over integer-
    quantized (x, y) — the map-side-combinable sufficient statistic.
    Moments ADD exactly, so any partition/batch/time-slice of rows can
    keep its own six numbers and merge later (the streaming twin's
    whole design)."""
    xq = F.expr(x_expr)
    yc = F.expr(y_expr)
    return df.groupBy(group_col).agg(
        F.count("*").cast(_LINREG_DEC).alias("n"),
        F.sum(xq.cast(_LINREG_DEC)).alias("sx"),
        F.sum(yc.cast(_LINREG_DEC)).alias("sy"),
        F.sum((xq * yc).cast(_LINREG_DEC)).alias("sxy"),
        F.sum((xq * xq).cast(_LINREG_DEC)).alias("sxx"),
        F.sum((yc * yc).cast(_LINREG_DEC)).alias("syy"))


def linreg_fit(m: DataFrame, group_col: str) -> DataFrame:
    """(group, n, slope, intercept, r2) from a moment table — exact
    decimal differences, one double cast per quantity, fixed-order
    scalar arithmetic, rounded for output."""
    d = m.select(
        group_col, F.col("n").cast("bigint").alias("n"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double").alias("cov_n"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double").alias("varx_n"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double").alias("vary_n"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"))
    slope = F.col("cov_n") / F.col("varx_n")
    return d.select(
        group_col, "n",
        F.round(slope / 100.0, 6).alias("slope"),
        F.round((F.col("syd") - slope * F.col("sxd")) / F.col("n") / 100.0, 4)
        .alias("intercept"),
        F.round(F.col("cov_n") * F.col("cov_n")
                / (F.col("varx_n") * F.col("vary_n")), 6).alias("r2"))


# --- interpolated Kneser–Ney bigram LM ------------------------------------

_KN_D = 0.75
_KN_TOP = 20


@query("lm_kneser_ney_bigram", f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    bg AS (
      SELECT u.w1 AS w1, u.w2 AS w2
      FROM (SELECT unnest(list_transform(range(1, len(toks)),
                   i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS u
            FROM d WHERE len(toks) >= 2)),
    cbg AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
    cw1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw,
                   CAST(COUNT(*) AS BIGINT) AS n1f
            FROM cbg GROUP BY w1),
    cw2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM cbg GROUP BY w2),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM cbg)
    SELECT b.w1, b.w2, CAST(b.c AS BIGINT) AS c_bigram,
           f.cw AS c_w1,
           round((b.c - {_KN_D}) / f.cw
                 + ({_KN_D} * f.n1f / f.cw) * (bk.n1b * 1.0 / t.tt), 9)
             AS p_kn
    FROM cbg b
    JOIN cw1 f ON f.w1 = b.w1
    JOIN cw2 bk ON bk.w2 = b.w2
    CROSS JOIN t
    ORDER BY p_kn DESC, b.w1, b.w2 LIMIT {_KN_TOP}
""")
def lm_kneser_ney_bigram(spark, sf_dir):
    """Interpolated Kneser–Ney bigram language-model estimation (Kneser
    & Ney 1995; Chen & Goodman 1998's interpolated form with fixed
    discount D=0.75) — THE n-gram smoothing used by production LM
    toolkits, computed as three count aggregations and a join:

        P(w2|w1) = (c(w1 w2) - D)/c(w1·)
                   + (D · N1+(w1 ·)/c(w1·)) · N1+(· w2)/N1+(· ·)

    The continuation probability N1+(·w2)/N1+(··) — "how many contexts
    does w2 follow" — is KN's insight, and it falls out of the SAME
    bigram-type table as the discounted term: cbg (bigram counts) is
    aggregated three ways (by pair, by w1, by w2), all map-side
    combinable.  Output: the corpus's top-20 conditional
    probabilities with their count evidence.

    At 100 TB: everything downstream of the one bigram-count agg is
    vocabulary-sized, not corpus-sized; the three count tables join on
    single-word keys (broadcastable for real vocabularies).  Per-row
    probability arithmetic is fixed-order scalar float — exact counts
    in, 9dp-rounded probability out, engine-identical.  The stupid-
    backoff twin (text_bigram_lm_score) scores sequences; this one
    ESTIMATES the smoothed model itself."""
    return _kn_full(spark, sf_dir).orderBy(
        F.desc("p_kn"), "w1", "w2").limit(_KN_TOP)


def _kn_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full (w1, w2, c_bigram, c_w1, p_kn) Kneser–Ney table —
    lm_kneser_ney_bigram's top-k reads from it; tests check the
    per-context probability-mass invariant over all of it."""
    toks = tokens_col()
    d = (_t(spark, sf_dir, "documents").select(toks.alias("toks"))
         .filter(F.size("toks") >= 2))
    bg = d.select(F.explode(F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.struct(F.element_at("toks", i).alias("w1"),
                           F.element_at("toks", i + 1).alias("w2")),
    )).alias("p")).select("p.w1", "p.w2")
    # the bigram-type table feeds FOUR consumers (pair join, w1
    # totals, continuation counts, the type total): checkpoint it once
    # — it IS the trained model's sufficient statistic, the artifact a
    # deployment persists (the dedup_semdedup reuse recipe)
    cbg = (bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
           .localCheckpoint(eager=True))
    cw1 = cbg.groupBy("w1").agg(F.sum("c").cast("bigint").alias("cw"),
                                F.count("*").cast("bigint").alias("n1f"))
    cw2 = cbg.groupBy("w2").agg(F.count("*").cast("bigint").alias("n1b"))
    tt = cbg.agg(F.count("*").cast("bigint").alias("tt"))
    p_kn = ((F.col("c") - _KN_D) / F.col("cw")
            + (_KN_D * F.col("n1f") / F.col("cw"))
            * (F.col("n1b") * 1.0 / F.col("tt")))
    return (cbg.join(cw1, "w1").join(cw2, "w2").crossJoin(F.broadcast(tt))
            .select("w1", "w2", F.col("c").cast("bigint").alias("c_bigram"),
                    F.col("cw").alias("c_w1"),
                    F.round(p_kn, 9).alias("p_kn")))


# --- Johnson–Lindenstrauss random projection ------------------------------
#
# Rademacher projection of the 64-d embeddings into _JL_K = 16 dims via
# the shared md5 sign planes ('jl<p>:' namespaces).  Components are
# floor-quantized to integer micro-units first, so every projected
# coordinate is an EXACT BIGINT signed sum and the projected squared
# distance sum_p (S_pa - S_pb)^2 is exact integer arithmetic — the
# estimator d2_jl = that / (k * 1e12) divides once at the end.

_JL_K = 16
_JL_PAIRS = 16   # pinned evaluation pairs: (2i, 2i+1) for i < 16

_JL_PROJ_SQL = ", ".join(
    f"list_aggregate(list_transform(q, (x, i) -> CASE WHEN "
    f"substr(md5('jl{p}:' || CAST(i - 1 AS VARCHAR)), 1, 1) >= '8' "
    f"THEN x ELSE -x END), 'sum') AS s{p}"
    for p in range(_JL_K))

_JL_D2_SQL = " + ".join(
    f"(a.s{p} - b.s{p}) * (a.s{p} - b.s{p})" for p in range(_JL_K))

_JL_EXACT_D2_SQL = (
    "list_aggregate(list_transform(a.ve, (x, i) -> "
    "CAST(round((x - b.ve[i]) * (x - b.ve[i]), 9) AS DECIMAL(38,9))), "
    "'sum')")

_JL_BASE_SQL = f"""v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ve,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
      FROM embeddings),
    proj AS (SELECT vec_id, ve, {_JL_PROJ_SQL} FROM v)"""


def _jl_proj(e: DataFrame) -> DataFrame:
    """(vec_id, ve, s0..s{k-1}): exact integer Rademacher projections
    using the precomputed literal sign strings (plan-build-time md5 —
    the _md5_signstr recipe; the oracle SQL keeps the md5 form)."""
    from .similarity import _md5_signstr

    v = to_double_array("embedding")
    qarr = F.transform(v, lambda x: F.floor(x * 1_000_000).cast("bigint"))
    base = e.select("vec_id", v.alias("ve"), qarr.alias("q"))

    def proj(p):
        s = F.lit(_md5_signstr(f"jl{p}:"))
        signed = F.transform(
            F.col("q"),
            lambda x, i: F.when(F.substring(s, i + 1, 1) == "+", x)
            .when(F.substring(s, i + 1, 1) == "-", -x)
            .otherwise(F.raise_error(F.lit(
                "embedding dim exceeds _md5_signstr table; raise n"))))
        return F.aggregate(signed, F.lit(0).cast("bigint"),
                           lambda acc, x: acc + x).alias(f"s{p}")

    return base.select("vec_id", "ve", *[proj(p) for p in range(_JL_K)])


@query("vec_jl_distortion", f"""
    WITH {_JL_BASE_SQL}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(round({_JL_EXACT_D2_SQL}, 6) AS DOUBLE) AS exact_d2,
           round(CAST({_JL_D2_SQL} AS BIGINT)
                 / ({_JL_K} * 1000000000000.0), 6) AS jl_d2,
           round(round(CAST({_JL_D2_SQL} AS BIGINT)
                       / ({_JL_K} * 1000000000000.0), 6)
                 / CAST(round({_JL_EXACT_D2_SQL}, 6) AS DOUBLE), 4)
             AS distortion
    FROM proj a
    JOIN proj b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id % 2 = 0 AND a.vec_id < {2 * _JL_PAIRS}
""")
def vec_jl_distortion(spark, sf_dir):
    """Johnson–Lindenstrauss random projection, 64 -> 16 dims, with its
    distortion MEASURED on 16 pinned vector pairs: projected squared
    distance (exact integer Rademacher sums over micro-unit components,
    scaled by 1/(k * 1e12)) against the exact squared distance
    (9dp-decimal termwise sums).  E[distortion] = 1 with per-pair
    sigma ~ sqrt(2/k) = 35%% — the test pins the sample mean.

    This is THE dimensionality-reduction primitive for embedding
    pipelines at 100 TB: the projection is a per-row map riding the
    scan (no shuffle, no training pass — the sign planes derive from
    md5), it cuts every downstream ANN / dedup distance computation
    4x, and unlike PCA (`ml_pca_embeddings`, rows-only: eigenbasis is
    engine-specific) it is fully oracle-checkable.  Pairs with ids
    (2i, 2i+1) keep the evaluation join trivially co-partitioned."""
    e = _emb_sketch(spark, sf_dir)
    proj = _jl_proj(e)
    a = proj.filter((F.col("vec_id") % 2 == 0)
                    & (F.col("vec_id") < 2 * _JL_PAIRS))
    b = proj.select((F.col("vec_id") - 1).alias("vid_a"),
                    F.col("ve").alias("bve"),
                    *[F.col(f"s{p}").alias(f"t{p}") for p in range(_JL_K)])
    j = a.join(b, a.vec_id == b.vid_a)
    jl_d2_int = _jl_proj_d2("s", "t")
    exact_d2 = _jl_exact_d2("ve", "bve")
    jl_d2 = jl_d2_int.cast("bigint") / F.lit(_JL_K * 1_000_000_000_000.0)
    # rounding discipline: exact_d2 is a 9dp DECIMAL whose value can sit
    # EXACTLY on a 6dp half-way (measured: 2 of 48 pairs across SFs), so
    # it is rounded AS A DECIMAL (HALF_UP agrees bitwise across engines)
    # and only then cast to double; rounding after the double cast makes
    # Spark (shortest-repr BigDecimal) and DuckDB (binary value) disagree
    # at those half-ways.  distortion then divides the two already-
    # rounded outputs — a full-precision double quotient, where a 4dp
    # half-way has ~2^-40 probability instead of 1e-3.
    exact_d2_r = F.round(exact_d2, 6).cast("double")
    return j.select(
        a.vec_id.alias("id_a"), (a.vec_id + 1).alias("id_b"),
        exact_d2_r.alias("exact_d2"),
        F.round(jl_d2, 6).alias("jl_d2"),
        F.round(F.round(jl_d2, 6) / exact_d2_r, 4).alias("distortion"))


@query("sim_jl_topk_recall", f"""
    WITH {_JL_BASE_SQL},
    qp AS (SELECT * FROM proj WHERE vec_id = 1),
    jd AS (
      SELECT p.vec_id, CAST({_JL_D2_SQL.replace('a.s', 'p.s')
                             .replace('b.s', 'q.s')} AS BIGINT) AS d2
      FROM proj p CROSS JOIN qp q WHERE p.vec_id <> 1),
    jtop AS (SELECT vec_id FROM jd ORDER BY d2, vec_id LIMIT 10),
    qv AS (SELECT ve FROM v WHERE vec_id = 1),
    ed AS (
      SELECT av.vec_id,
             {_JL_EXACT_D2_SQL.replace('a.ve', 'av.ve')
                              .replace('b.ve[i]', 'qv.ve[i]')} AS d2
      FROM v av CROSS JOIN qv WHERE av.vec_id <> 1),
    etop AS (SELECT vec_id FROM ed ORDER BY d2, vec_id LIMIT 10)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap,
           round(COUNT(*) / 10.0, 2) AS recall_at_10
    FROM jtop j JOIN etop e ON e.vec_id = j.vec_id
""")
def sim_jl_topk_recall(spark, sf_dir):
    """Recall@10 of nearest-neighbor search in the 16-d JL-projected
    space against the exact 64-d ranking (query = vec_id 1) — the eval
    anchor for vec_jl_distortion, same pattern as sim_ann_recall_eval
    / sim_ivfpq_recall: every approximation in this repo ships with
    its measured accuracy so the speed/recall trade is a number, not
    a claim.

    Both rankings are engine-exact (integer projected distances;
    9dp-decimal exact distances; vec_id tiebreaks), so the recall is
    deterministic and hash-pinned.  At scale the projected scan moves
    16 BIGINTs per vector instead of 64 doubles — the JL win — and
    the top-10s are TakeOrderedAndProject, never a global sort."""
    e = _emb_sketch(spark, sf_dir)
    proj = _jl_proj(e)
    qp = proj.filter(F.col("vec_id") == 1)
    qcols = qp.select(*[F.col(f"s{p}").alias(f"q{p}")
                        for p in range(_JL_K)], F.col("ve").alias("qve"))
    cand = proj.filter(F.col("vec_id") != 1).crossJoin(F.broadcast(qcols))
    jtop = (cand.select("vec_id",
                        _jl_proj_d2("s", "q").cast("bigint").alias("d2"))
            .orderBy("d2", "vec_id").limit(10).select("vec_id"))
    etop = (cand.select("vec_id", _jl_exact_d2("ve", "qve").alias("d2"))
            .orderBy("d2", "vec_id").limit(10).select("vec_id"))
    return (jtop.join(etop, "vec_id")
            .agg(F.count("*").cast("bigint").alias("n_overlap"),
                 F.round(F.count("*") / 10.0, 2).alias("recall_at_10")))


def _emb_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "embeddings")


def _jl_proj_d2(pa: str, pb: str):
    """Exact integer projected squared distance: sum over planes of
    ({pa}{p} - {pb}{p})^2 — shared by both JL queries so the estimator
    cannot desynchronize between them."""
    out = None
    for p in range(_JL_K):
        d = F.col(f"{pa}{p}") - F.col(f"{pb}{p}")
        out = d * d if out is None else out + d * d
    return out


def _jl_exact_d2(ca: str, cb: str):
    """Exact squared L2 between two double-array columns as a
    DECIMAL(20,9) fold of 9dp-rounded terms.  (20,9) + (20,9) ->
    (21,9): the add keeps scale 9, so the re-cast is exact; at (38,9)
    each add would overflow to scale 8 and silently round — measured
    4.1e-8 drift over a 64-term fold.  Shared by both JL queries (the
    load-bearing determinism recipe lives in ONE place)."""
    return F.aggregate(
        F.zip_with(F.col(ca), F.col(cb),
                   lambda x, y: F.round((x - y) * (x - y), 9)
                   .cast("decimal(20,9)")),
        F.lit(0).cast("decimal(20,9)"),
        lambda acc, x: (acc + x).cast("decimal(20,9)"))


# --- HDR histogram mergeability -------------------------------------------

@query("sketch_hdr_merge", f"""
    WITH c AS (
      SELECT month(l_shipdate) AS mo,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
      FROM lineitem),
    g AS (SELECT mo, c, GREATEST(length(ltrim(bin(c), '0')) - 1
                                 - {_HDR_BITS}, 0) AS g FROM c),
    partials AS (
      SELECT mo, (c >> g) << g AS b_lo, COUNT(*) AS cnt
      FROM g GROUP BY 1, 2),
    merged AS (
      SELECT b_lo, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM partials GROUP BY b_lo),
    direct AS (
      SELECT (c >> g) << g AS b_lo, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM merged) AS BIGINT) AS n_buckets,
           CAST((SELECT COUNT(*) FROM partials) AS BIGINT)
             AS n_partial_rows,
           CAST((SELECT COUNT(*) FROM merged m
                 FULL JOIN direct d ON d.b_lo = m.b_lo
                 WHERE m.cnt IS DISTINCT FROM d.cnt) AS BIGINT)
             AS n_mismatched,
           CAST((SELECT SUM(cnt) FROM merged) AS BIGINT) AS total_rows
""")
def sketch_hdr_merge(spark, sf_dir):
    """HDR-histogram mergeability, the sum-combine companion of
    sketch_hll_merge's max-combine: per-month bucket histograms of
    l_extendedprice added together equal the histogram built directly
    on all rows — ``n_mismatched`` pinned to 0 because bucket counts
    combine by plain integer addition (the property that lets every
    partition/partial/time-slice keep its own bounded histogram and
    roll up without re-scanning facts).

    Output also records the compression: ``n_partial_rows`` (sum of
    the 12 monthly histogram sizes) vs ``n_buckets`` after merge, and
    the conserved ``total_rows``."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.select(F.month("l_shipdate").alias("mo"), F.expr(
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("c"))
    g = c.withColumn("g", F.greatest(
        F.length(F.bin("c")) - 1 - _HDR_BITS, F.lit(0)))
    blo = F.expr("shiftleft(shiftright(c, g), g)")
    partials = (g.select("mo", blo.alias("b_lo"))
                .groupBy("mo", "b_lo").agg(F.count("*").alias("cnt")))
    merged = partials.groupBy("b_lo").agg(
        F.sum("cnt").cast("bigint").alias("cnt"))
    direct = (g.select(blo.alias("b_lo"))
              .groupBy("b_lo").agg(F.count("*").cast("bigint").alias("cnt")))
    mism = (merged.withColumnRenamed("cnt", "m_cnt")
            .join(direct.withColumnRenamed("cnt", "d_cnt"), "b_lo", "full")
            .filter(~F.col("m_cnt").eqNullSafe(F.col("d_cnt")))
            .agg(F.count("*").cast("bigint").alias("n_mismatched")))
    stats = merged.agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.sum("cnt").cast("bigint").alias("total_rows"))
    nprt = partials.agg(F.count("*").cast("bigint").alias("n_partial_rows"))
    return (stats.crossJoin(nprt).crossJoin(mism)
            .select("n_buckets", "n_partial_rows", "n_mismatched",
                    "total_rows"))


# --- HLL set algebra ------------------------------------------------------

@query("sketch_hll_setops", f"""
    WITH hx AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             md5(CAST(o_custkey AS VARCHAR)) AS h
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
    nib AS (
      SELECT yr, {_HLL_REG_SQL_DUCK} FROM hx),
    rho AS (
      SELECT yr, b0 % {_HLL_M} AS idx,
             LEAST(CASE WHEN zp = 16 THEN 65
                   ELSE 4 * zp + (CASE WHEN nv >= 8 THEN 0
                                       WHEN nv >= 4 THEN 1
                                       WHEN nv >= 2 THEN 2 ELSE 3 END) + 1
                   END, {_HLL_CAP}) AS rr
      FROM nib),
    regs_y AS (
      SELECT CASE WHEN yr = 1996 THEN 'a' ELSE 'b' END AS tag, idx,
             MAX(rr) AS mx
      FROM rho GROUP BY 1, idx),
    regs AS (
      SELECT tag, idx, mx FROM regs_y
      UNION ALL
      SELECT 'u' AS tag, idx, MAX(mx) AS mx FROM regs_y GROUP BY idx),
    {_HLL_EST_SQL.format(grp="tag")},
    piv AS (
      SELECT MAX(CASE WHEN tag = 'a' THEN est END) AS est_a,
             MAX(CASE WHEN tag = 'b' THEN est END) AS est_b,
             MAX(CASE WHEN tag = 'u' THEN est END) AS est_union
      FROM est),
    ex AS (
      SELECT CAST(count(DISTINCT CASE WHEN yr = 1996
                        THEN o_custkey END) AS BIGINT) AS exact_a,
             CAST(count(DISTINCT CASE WHEN yr = 1997
                        THEN o_custkey END) AS BIGINT) AS exact_b,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_union
      FROM (SELECT CAST(year(o_orderdate) AS INT) AS yr, o_custkey
            FROM orders WHERE year(o_orderdate) IN (1996, 1997))),
    xi AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_inter FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997))
    SELECT p.est_a, p.est_b, p.est_union,
           round(p.est_a + p.est_b - p.est_union, 4) AS est_inter,
           e.exact_a, e.exact_b, e.exact_union, x.exact_inter,
           round(abs(p.est_a + p.est_b - p.est_union - x.exact_inter)
                 / x.exact_inter, 4) AS inter_rel_err
    FROM piv p CROSS JOIN ex e CROSS JOIN xi x
""")
def sketch_hll_setops(spark, sf_dir):
    """Sketch set algebra — the reason distinct-count sketches replace
    exact distinct at cross-source scale: customers active in 1996 (A)
    and 1997 (B) as two register tables; |A ∪ B| by register max-merge
    (exact sketch semantics, no re-scan) and |A ∩ B| by inclusion-
    exclusion est_a + est_b - est_union, with the exact counts and the
    intersection's measured relative error alongside (inclusion-
    exclusion compounds the error of three estimates — the honest
    caveat, which is why the error column is in the hashed output).

    At 100 TB this is the source_overlap_matrix economics flipped:
    that query pays one shuffle per source-pair through shared keys;
    this one answers ANY pair (or any union of years/sources/slices)
    from m-row register tables that were built once — the exact
    comparator here is the audit, not the serving path."""
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("yr"), "o_custkey")
    oy = o.filter(F.col("yr").isin(1996, 1997))
    keyed = oy.select(
        F.when(F.col("yr") == 1996, "a").otherwise("b").alias("tag"),
        F.md5(F.col("o_custkey").cast("string")).alias("h"))
    regs_y = _hll_registers(keyed, ["tag"])
    regs_u = (regs_y.groupBy("idx").agg(F.max("mx").alias("mx"))
              .select(F.lit("u").alias("tag"), "idx", "mx"))
    est = _hll_estimate(regs_y.unionByName(regs_u), ["tag"])
    piv = est.agg(
        F.max(F.when(F.col("tag") == "a", F.col("est"))).alias("est_a"),
        F.max(F.when(F.col("tag") == "b", F.col("est"))).alias("est_b"),
        F.max(F.when(F.col("tag") == "u", F.col("est"))).alias("est_union"))
    ex = oy.agg(
        F.countDistinct(F.when(F.col("yr") == 1996, F.col("o_custkey")))
        .cast("bigint").alias("exact_a"),
        F.countDistinct(F.when(F.col("yr") == 1997, F.col("o_custkey")))
        .cast("bigint").alias("exact_b"),
        F.countDistinct("o_custkey").cast("bigint").alias("exact_union"))
    xi = (o.filter(F.col("yr") == 1996).select("o_custkey")
          .intersect(o.filter(F.col("yr") == 1997).select("o_custkey"))
          .agg(F.count("*").cast("bigint").alias("exact_inter")))
    inter = F.col("est_a") + F.col("est_b") - F.col("est_union")
    return (piv.crossJoin(ex).crossJoin(xi)
            .select("est_a", "est_b", "est_union",
                    F.round(inter, 4).alias("est_inter"),
                    "exact_a", "exact_b", "exact_union", "exact_inter",
                    F.round(F.abs(inter - F.col("exact_inter"))
                            / F.col("exact_inter"), 4)
                    .alias("inter_rel_err")))


# --- association rules (pairs, exact) -------------------------------------

_AR_TOP = 20


@query("assoc_rules_pairs", f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON p_partkey = l_partkey),
    nn AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
           FROM baskets),
    items AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS supp
      FROM baskets GROUP BY p_brand),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS supp_ab
      FROM baskets a JOIN baskets b
        ON b.l_orderkey = a.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2)
    SELECT p.brand_a, p.brand_b, p.supp_ab,
           round(p.supp_ab * 1.0 / ia.supp, 6) AS conf_a_to_b,
           round(p.supp_ab * 1.0 / ib.supp, 6) AS conf_b_to_a,
           round(p.supp_ab * 1.0 * nn.n / (ia.supp * ib.supp), 6) AS lift
    FROM pairs p
    JOIN items ia ON ia.p_brand = p.brand_a
    JOIN items ib ON ib.p_brand = p.brand_b
    CROSS JOIN nn
    ORDER BY lift DESC, p.brand_a, p.brand_b LIMIT {_AR_TOP}
""")
def assoc_rules_pairs(spark, sf_dir):
    """Exact pairwise association rules over order baskets (items =
    part brands bought in one order): support, both directional
    confidences, and lift for every co-bought brand pair, top-20 by
    lift — classic market-basket mining computed relationally, and the
    ORACLE-GREEN sibling for the rows-only `ml_fpgrowth_itemsets`
    (MLlib's lattice traversal is engine-specific; pair-level rules
    are pure counts).

    All inputs to the ranking are exact integers (pair/item supports,
    basket count); confidence and lift are single fixed-order double
    expressions rounded at 6dp with (brand_a, brand_b) tiebreaks, so
    the top-20 is engine-deterministic.

    Scale shape: baskets = one broadcast join (part is the dim) + one
    distinct; the pair generation self-joins ON THE BASKET KEY, so
    fan-out is C(items-per-basket, 2) per order — bounded by basket
    width (~4 brands), never by catalog size; supports are two hash
    aggs.  This is exactly how pair-level rules are mined at retail
    scale — FP-growth only becomes necessary for itemsets of size
    >= 3 with low support."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (li.join(F.broadcast(part),
                       li.l_partkey == part.p_partkey)
               .select("l_orderkey", "p_brand").distinct())
    nn = baskets.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n"))
    items = baskets.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("supp"))
    b2 = baskets.select(F.col("l_orderkey").alias("ok2"),
                        F.col("p_brand").alias("brand_b"))
    pairs = (baskets.withColumnRenamed("p_brand", "brand_a")
             .join(b2, (F.col("ok2") == F.col("l_orderkey"))
                   & (F.col("brand_a") < F.col("brand_b")))
             .groupBy("brand_a", "brand_b")
             .agg(F.count("*").cast("bigint").alias("supp_ab")))
    ia = items.select(F.col("p_brand").alias("brand_a"),
                      F.col("supp").alias("supp_a"))
    ib = items.select(F.col("p_brand").alias("brand_b"),
                      F.col("supp").alias("supp_b"))
    return (pairs.join(F.broadcast(ia), "brand_a")
            .join(F.broadcast(ib), "brand_b")
            .crossJoin(F.broadcast(nn))
            .select("brand_a", "brand_b", "supp_ab",
                    F.round(F.col("supp_ab") * 1.0 / F.col("supp_a"), 6)
                    .alias("conf_a_to_b"),
                    F.round(F.col("supp_ab") * 1.0 / F.col("supp_b"), 6)
                    .alias("conf_b_to_a"),
                    F.round(F.col("supp_ab") * 1.0 * F.col("n")
                            / (F.col("supp_a") * F.col("supp_b")), 6)
                    .alias("lift"))
            .orderBy(F.desc("lift"), "brand_a", "brand_b")
            .limit(_AR_TOP))


# --- column statistics profile (ANALYZE TABLE) ----------------------------

_PROFILE_COLS = ["o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderpriority"]

_PROFILE_STACK_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS v FROM orders"
    for c in _PROFILE_COLS)


@query("dq_profile_columns", f"""
    WITH stacked AS ({_PROFILE_STACK_SQL}),
    base AS (
      SELECT col_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv_exact,
             MIN(v) AS min_str, MAX(v) AS max_str
      FROM stacked GROUP BY col_name),
    hx AS (SELECT col_name, md5(v) AS h FROM stacked WHERE v IS NOT NULL),
    nib AS (SELECT col_name, {_HLL_REG_SQL_DUCK} FROM hx),
    rho AS (
      SELECT col_name, b0 % {_HLL_M} AS idx,
             LEAST(CASE WHEN zp = 16 THEN 65
                   ELSE 4 * zp + (CASE WHEN nv >= 8 THEN 0
                                       WHEN nv >= 4 THEN 1
                                       WHEN nv >= 2 THEN 2 ELSE 3 END) + 1
                   END, {_HLL_CAP}) AS rr
      FROM nib),
    regs AS (
      SELECT col_name, idx, MAX(rr) AS mx FROM rho GROUP BY col_name, idx),
    {_HLL_EST_SQL.format(grp="col_name")}
    SELECT b.col_name, b.n_rows, b.n_null, b.ndv_exact,
           e.est AS ndv_hll,
           round(abs(e.est - b.ndv_exact) / b.ndv_exact, 4) AS ndv_rel_err,
           b.min_str, b.max_str
    FROM base b JOIN est e ON e.col_name = b.col_name
""")
def dq_profile_columns(spark, sf_dir):
    """ANALYZE-TABLE-style column statistics profile of `orders` —
    the stats block a cost-based optimizer (or a data-quality monitor)
    maintains per column: row count, null count, exact NDV, the HLL
    NDV estimate a production profiler would actually store (reusing
    this module's portable registers, measured error alongside), and
    lexical min/max of the string form (string comparison is the one
    ordering both engines define identically for every source type).

    Plan shape: ONE scan of orders stacked into (col_name, value)
    rows — profiling C columns multiplies rows by C before the
    partial agg, the standard Expand-style trade — then two
    metadata-sized aggs (per-column stats, per-column registers).  At
    100 TB the profile is the canonical mergeable-state consumer: the
    registers roll daily partition profiles up to table level without
    re-scanning (sketch_hll_merge), which is how ANALYZE stays
    incremental on partitioned tables."""
    o = _t(spark, sf_dir, "orders")
    stacked = o.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col(c).cast("string").alias("v"))
        for c in _PROFILE_COLS])).alias("s")).select("s.col_name", "s.v")
    base = stacked.groupBy("col_name").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        (F.count("*") - F.count("v")).cast("bigint").alias("n_null"),
        F.countDistinct("v").cast("bigint").alias("ndv_exact"),
        F.min("v").alias("min_str"), F.max("v").alias("max_str"))
    keyed = (stacked.filter(F.col("v").isNotNull())
             .select("col_name", F.md5("v").alias("h")))
    est = _hll_estimate(_hll_registers(keyed, ["col_name"]), ["col_name"])
    return (base.join(est, "col_name")
            .select("col_name", "n_rows", "n_null", "ndv_exact",
                    F.col("est").alias("ndv_hll"),
                    F.round(F.abs(F.col("est") - F.col("ndv_exact"))
                            / F.col("ndv_exact"), 4).alias("ndv_rel_err"),
                    "min_str", "max_str"))


# --- leave-one-group-out influence over the closed-form OLS ---------------

# shared moment fragments: quantity in units, price in cents — exact
# integer quantization, the ml_linreg_closed_form convention
_OLS_QX = "CAST(floor(l_quantity + 0.5) AS BIGINT)"
_OLS_QY = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"


@query("ml_influence_linreg_logo", f"""
    WITH m AS (
      SELECT l_returnflag AS grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST({_OLS_QX} AS DECIMAL(38,0))) AS sx,
             SUM(CAST({_OLS_QY} AS DECIMAL(38,0))) AS sy,
             SUM(CAST({_OLS_QX} * {_OLS_QY} AS DECIMAL(38,0))) AS sxy,
             SUM(CAST({_OLS_QX} * {_OLS_QX} AS DECIMAL(38,0))) AS sxx
      FROM lineitem GROUP BY l_returnflag),
    f AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
                 SUM(sx) AS sx, SUM(sy) AS sy,
                 SUM(sxy) AS sxy, SUM(sxx) AS sxx
          FROM m),
    ff AS (SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_raw
           FROM f),
    lo AS (SELECT m.grp, CAST(f.n - m.n AS BIGINT) AS n_logo,
                  f.sx - m.sx AS sx, f.sy - m.sy AS sy,
                  f.sxy - m.sxy AS sxy, f.sxx - m.sxx AS sxx
           FROM m CROSS JOIN f),
    fl AS (SELECT grp, n_logo,
                  CAST(n_logo * sxy - sx * sy AS DOUBLE)
                  / CAST(n_logo * sxx - sx * sx AS DOUBLE) AS slope_raw,
                  CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
           FROM lo)
    SELECT fl.grp, fl.n_logo,
           round(ff.slope_raw / 100.0, 6) AS slope_full,
           round(fl.slope_raw / 100.0, 6) AS slope_logo,
           round((fl.slope_raw - ff.slope_raw) / 100.0, 6)
             AS slope_delta,
           round((fl.syd - fl.slope_raw * fl.sxd) / fl.n_logo / 100.0, 4)
             AS intercept_logo
    FROM fl CROSS JOIN ff
""")
def ml_influence_linreg_logo(spark, sf_dir):
    """EXACT leave-one-group-out refits of the closed-form OLS (the
    datamodels-style group-influence question answered with zero
    approximation — the companion to ml_influence_logo_newton's
    one-step refit): because the normal-equation moments (n, Σx, Σy,
    Σxy, Σx²) are SUMS, the fit-without-group-g is a closed-form fit
    over (full − group) moments — integer-exact DECIMAL(38,0)
    subtraction, no second scan, no approximation.  Per l_returnflag:
    the full slope, the refit slope without that group, the delta
    (the group's exact influence on the price-vs-quantity trend), and
    the refit intercept.

    Exactness: every moment is an exact decimal integer over the
    quantized inputs (quantity units, price cents — the
    ml_linreg_closed_form convention), so the LOGO moments are exact
    differences, and the slope/intercept are fixed double op chains
    on exactly-equal inputs.  Plan: ONE grouped scan produces all
    per-group moments; the full moments are a 1-row roll-up of the
    group rows (NOT a second scan); influence for every group is then
    #groups-sized algebra — group-level attribution at 100 TB for the
    cost of the aggregation the fit needed anyway."""
    q_x = F.expr(_OLS_QX)
    q_y = F.expr(_OLS_QY)
    m = (load_table(spark, sf_dir, "lineitem")
         .groupBy(F.col("l_returnflag").alias("grp"))
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum(q_x.cast("decimal(38,0)")).alias("sx"),
              F.sum(q_y.cast("decimal(38,0)")).alias("sy"),
              F.sum((q_x * q_y).cast("decimal(38,0)")).alias("sxy"),
              F.sum((q_x * q_x).cast("decimal(38,0)")).alias("sxx"))
         .localCheckpoint(eager=True))         # feeds full roll-up + lo
    f = m.agg(F.sum("n").cast("bigint").alias("fn"),
              F.sum("sx").cast("decimal(38,0)").alias("fsx"),
              F.sum("sy").cast("decimal(38,0)").alias("fsy"),
              F.sum("sxy").cast("decimal(38,0)").alias("fsxy"),
              F.sum("sxx").cast("decimal(38,0)").alias("fsxx"))
    ff = f.selectExpr(
        "CAST(fn * fsxy - fsx * fsy AS DOUBLE)"
        " / CAST(fn * fsxx - fsx * fsx AS DOUBLE) AS full_slope_raw")
    lo = (m.crossJoin(F.broadcast(f))
          .selectExpr("grp", "CAST(fn - n AS BIGINT) AS n_logo",
                      "fsx - sx AS sx", "fsy - sy AS sy",
                      "fsxy - sxy AS sxy", "fsxx - sxx AS sxx"))
    fl = lo.selectExpr(
        "grp", "n_logo",
        "CAST(n_logo * sxy - sx * sy AS DOUBLE)"
        " / CAST(n_logo * sxx - sx * sx AS DOUBLE) AS slope_raw",
        "CAST(sy AS DOUBLE) AS syd", "CAST(sx AS DOUBLE) AS sxd")
    return (fl.crossJoin(F.broadcast(ff))
            .selectExpr(
                "grp", "n_logo",
                "round(full_slope_raw / 100.0, 6) AS slope_full",
                "round(slope_raw / 100.0, 6) AS slope_logo",
                "round((slope_raw - full_slope_raw) / 100.0, 6)"
                " AS slope_delta",
                "round((syd - slope_raw * sxd) / n_logo / 100.0, 4)"
                " AS intercept_logo"))


# --- cluster-robust (Liang-Zeger) standard errors (round 10, batch 3) ------
#
# Shared formula strings over the double-cast moment columns — both
# engines evaluate the identical op chains.  Quantized scale: x in
# quantity units, y in price cents (LINREG_X_EXPR / LINREG_Y_EXPR).
_CR_BB = "cov_n / varx_n"
_CR_SE_CLASSIC = ("sqrt(((vary_n - (cov_n / varx_n) * cov_n) / nd)"
                  " * nd / ((nd - 2.0) * varx_n))")
_CR_VARB = ("(sxd * sxd * m11 - 2.0 * nd * sxd * m12 + nd * nd * m22)"
            " / (varx_n * varx_n)")
_CR_CFACT = "(gd / (gd - 1.0)) * ((nd - 1.0) / (nd - 2.0))"
_CR_SE_CLUSTER = f"sqrt({_CR_CFACT} * ({_CR_VARB}))"
# per-cluster score sums from the cluster's double-cast moments at
# the pooled fit (aa, bb)
_CR_SEG = "(syg - ng * aa - bb * sxg)"
_CR_SXEG = "(sxyg - aa * sxg - bb * sxxg)"


@query("stat_cluster_robust_se", f"""
    WITH q AS (SELECT l_orderkey,
                      {LINREG_X_EXPR} AS x, {LINREG_Y_EXPR} AS y
               FROM lineitem),
    cm AS (SELECT l_orderkey,
                  CAST(count(*) AS DECIMAL(38,0)) AS n,
                  SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                  SUM(CAST(y AS DECIMAL(38,0))) AS sy,
                  SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
                  SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
                  SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
          FROM q GROUP BY l_orderkey),
    gm AS (SELECT CAST(SUM(n) AS DECIMAL(38,0)) AS n,
                  CAST(SUM(sx) AS DECIMAL(38,0)) AS sx,
                  CAST(SUM(sy) AS DECIMAL(38,0)) AS sy,
                  CAST(SUM(sxy) AS DECIMAL(38,0)) AS sxy,
                  CAST(SUM(sxx) AS DECIMAL(38,0)) AS sxx,
                  CAST(SUM(syy) AS DECIMAL(38,0)) AS syy,
                  CAST(count(*) AS BIGINT) AS g
           FROM cm),
    d AS (SELECT CAST(n AS BIGINT) AS n_obs, g,
                 CAST(n AS DOUBLE) AS nd, CAST(g AS DOUBLE) AS gd,
                 CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                 CAST(n * sxy - sx * sy AS DOUBLE) AS cov_n,
                 CAST(n * sxx - sx * sx AS DOUBLE) AS varx_n,
                 CAST(n * syy - sy * sy AS DOUBLE) AS vary_n
          FROM gm),
    fit AS (SELECT d.*, {_CR_BB} AS bb,
                   (syd - ({_CR_BB}) * sxd) / nd AS aa
            FROM d),
    sc AS (SELECT f.bb, f.aa,
                  CAST(cm.n AS DOUBLE) AS ng,
                  CAST(cm.sx AS DOUBLE) AS sxg,
                  CAST(cm.sy AS DOUBLE) AS syg,
                  CAST(cm.sxy AS DOUBLE) AS sxyg,
                  CAST(cm.sxx AS DOUBLE) AS sxxg
           FROM cm CROSS JOIN fit f),
    meat AS (SELECT
        CAST(SUM(CAST({_CR_SEG} * {_CR_SEG} AS DECIMAL(38,6)))
             AS DOUBLE) AS m11,
        CAST(SUM(CAST({_CR_SEG} * {_CR_SXEG} AS DECIMAL(38,6)))
             AS DOUBLE) AS m12,
        CAST(SUM(CAST({_CR_SXEG} * {_CR_SXEG} AS DECIMAL(38,6)))
             AS DOUBLE) AS m22
      FROM sc)
    SELECT f.n_obs, f.g AS n_clusters,
           round(f.bb / 100.0, 6) AS slope,
           round(({_CR_SE_CLASSIC}) / 100.0, 6) AS se_classic,
           round(({_CR_SE_CLUSTER}) / 100.0, 6) AS se_cluster,
           round(({_CR_SE_CLUSTER}) / ({_CR_SE_CLASSIC}), 6) AS se_ratio
    FROM fit f CROSS JOIN meat
""")
def stat_cluster_robust_se(spark, sf_dir):
    """Cluster-robust (Liang & Zeger 1986; CR1 correction, Cameron &
    Miller 2015) standard errors for the pooled OLS slope, clustered
    by order — the randomize-by-order / analyze-by-line-item problem
    every experimentation platform hits: classic OLS SEs assume
    independent rows, but line items within an order are correlated,
    and the honest slope uncertainty needs the sandwich
    (X'X)^-1 [sum_g X_g'e_g e_g'X_g] (X'X)^-1.  Reports both SEs and
    their ratio (the "design effect" — how much the iid assumption
    understates uncertainty).

    The key identity making this ONE-SCAN exact: each cluster's score
    sums need no residual rows —
    sum_g(e) = sy_g - n_g*a - b*sx_g and sum_g(x*e) = sxy_g - a*sx_g
    - b*sxx_g are algebra over the cluster's integer moments, so the
    scan produces per-cluster DECIMAL(38,0) moments (map-side
    combinable), the pooled fit comes from their exact total, and the
    meat is a second #clusters-sized agg of double products
    accumulated in DECIMAL(38,6).  Classic SE comes from the same
    exact moment differences (SSE = (Syy - b*Sxy) algebra — no
    residual pass).  At 100 TB: one wide shuffle onto cluster keys,
    then metadata-sized reductions — the same shape as any per-entity
    rollup, with zero extra passes for the sandwich."""
    li = _t(spark, sf_dir, "lineitem")
    xq = F.expr(LINREG_X_EXPR)
    yc = F.expr(LINREG_Y_EXPR)
    dec = "decimal(38,0)"
    cm = (li.groupBy("l_orderkey")
          .agg(F.count("*").cast(dec).alias("n"),
               F.sum(xq.cast(dec)).alias("sx"),
               F.sum(yc.cast(dec)).alias("sy"),
               F.sum((xq * yc).cast(dec)).alias("sxy"),
               F.sum((xq * xq).cast(dec)).alias("sxx"),
               F.sum((yc * yc).cast(dec)).alias("syy"))
          .localCheckpoint(eager=True))    # cluster moments feed fit + meat
    gm = cm.agg(F.sum("n").cast(dec).alias("n"),
                F.sum("sx").cast(dec).alias("sx"),
                F.sum("sy").cast(dec).alias("sy"),
                F.sum("sxy").cast(dec).alias("sxy"),
                F.sum("sxx").cast(dec).alias("sxx"),
                F.sum("syy").cast(dec).alias("syy"),
                F.count("*").cast("bigint").alias("g"))
    d = gm.selectExpr(
        "CAST(n AS BIGINT) AS n_obs", "g",
        "CAST(n AS DOUBLE) AS nd", "CAST(g AS DOUBLE) AS gd",
        "CAST(sx AS DOUBLE) AS sxd", "CAST(sy AS DOUBLE) AS syd",
        "CAST(n * sxy - sx * sy AS DOUBLE) AS cov_n",
        "CAST(n * sxx - sx * sx AS DOUBLE) AS varx_n",
        "CAST(n * syy - sy * sy AS DOUBLE) AS vary_n")
    fit = d.selectExpr("*", f"{_CR_BB} AS bb",
                       f"(syd - ({_CR_BB}) * sxd) / nd AS aa")
    sc = (cm.crossJoin(F.broadcast(fit))
          .selectExpr("bb", "aa",
                      "CAST(n AS DOUBLE) AS ng",
                      "CAST(sx AS DOUBLE) AS sxg",
                      "CAST(sy AS DOUBLE) AS syg",
                      "CAST(sxy AS DOUBLE) AS sxyg",
                      "CAST(sxx AS DOUBLE) AS sxxg"))
    d18 = "decimal(38,6)"
    meat = sc.agg(
        F.sum(F.expr(f"CAST({_CR_SEG} * {_CR_SEG} AS {d18})"))
        .cast("double").alias("m11"),
        F.sum(F.expr(f"CAST({_CR_SEG} * {_CR_SXEG} AS {d18})"))
        .cast("double").alias("m12"),
        F.sum(F.expr(f"CAST({_CR_SXEG} * {_CR_SXEG} AS {d18})"))
        .cast("double").alias("m22"))
    return (fit.crossJoin(F.broadcast(meat))
            .selectExpr("n_obs", "g AS n_clusters",
                        "round(bb / 100.0, 6) AS slope",
                        f"round(({_CR_SE_CLASSIC}) / 100.0, 6)"
                        " AS se_classic",
                        f"round(({_CR_SE_CLUSTER}) / 100.0, 6)"
                        " AS se_cluster",
                        f"round(({_CR_SE_CLUSTER}) / ({_CR_SE_CLASSIC}), 6)"
                        " AS se_ratio"))
