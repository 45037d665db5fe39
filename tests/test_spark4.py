"""Spark-4-native surface (plans/spark4.py): VARIANT, collations, SQL
UDF inlining, parameterized SQL, pipe syntax, df.stat queries.

Value-parity with DuckDB is covered by the oracle gate; these tests pin
the *plan-level* claims the module's docstrings make (SQL UDFs inline,
VARIANT stays native, the stratified sample pushes its predicate) and
the semantics that the oracle can't observe (collation merging actually
uses the collated comparison, sampleBy determinism under a fixed seed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_variant_extract_values(spark, sf_dir):
    df = QUERIES["variant_extract"](spark, sf_dir)
    rows = df.orderBy("event_id").limit(5).collect()
    import json
    from mental_health_bigdata_project_spark.sources import load_table
    raw = (load_table(spark, sf_dir, "events")
           .orderBy("event_id").limit(5).collect())
    for got, src in zip(rows, raw):
        assert got.k == json.loads(src.props)["k"]
        assert got.missing_k is None


def test_sql_udf_inlines_to_native_plan(spark, sf_dir):
    """A SQL scalar UDF must vanish at analysis time: the physical plan
    contains the CASE expression, not any Python/eval node."""
    df = QUERIES["sql_udf_len_bucket"](spark, sf_dir)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CASE WHEN" in plan


def test_collation_merges_case_variants(spark, sf_dir):
    """Grouping on UTF8_LCASE must merge `en` with `En`: every output
    group count is even (each source row contributes itself + its
    initcap twin)."""
    df = QUERIES["collate_group_ci"](spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.lang_ci == r.lang_ci.lower()
        assert r.n % 2 == 0


def test_stratified_sample_pushes_predicate(spark, sf_dir):
    """The modulus predicate must reach the scan side (no shuffle before
    the filter): Filter sits under the first Exchange."""
    df = QUERIES["sample_stratified"](spark, sf_dir)
    plan = _plan(df)
    filter_pos = plan.find("Filter")
    exchange_pos = plan.find("Exchange")
    assert filter_pos != -1 and exchange_pos != -1
    # toString prints operators top-down: scan-side filter appears AFTER
    # (deeper than) the agg exchange in the text, so filter_pos > exchange_pos.
    assert filter_pos > exchange_pos


def test_sample_by_seed_deterministic(spark, sf_dir):
    a = QUERIES["sample_stratified_api"](spark, sf_dir).collect()
    b = QUERIES["sample_stratified_api"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_crosstab_matches_groupby(spark, sf_dir):
    from mental_health_bigdata_project_spark.sources import load_table
    ct = {r[0]: (r["F"], r["O"])
          for r in QUERIES["stat_crosstab"](spark, sf_dir).collect()}
    gb = load_table(spark, sf_dir, "lineitem").groupBy(
        "l_returnflag", "l_linestatus").count().collect()
    want = {}
    for r in gb:
        f, o = want.get(r.l_returnflag, (0, 0))
        if r.l_linestatus == "F":
            want[r.l_returnflag] = (r["count"], o)
        else:
            want[r.l_returnflag] = (f, r["count"])
    assert ct == want


def test_chunker_properties():
    """Pure-Python property test of the UDTF chunker: every token is
    covered, stride-prefixes reconstruct the document, and chunk count
    is ceil(n/stride)."""
    import math

    from hypothesis import given, settings, strategies as st

    from mental_health_bigdata_project_spark.plans.udtf_udaf import ChunkDoc

    token = st.text(alphabet="abc", min_size=1, max_size=4)

    @settings(max_examples=200, deadline=None)
    @given(toks=st.lists(token, min_size=0, max_size=120),
           chunk_size=st.integers(1, 40), overlap=st.integers(0, 39))
    def prop(toks, chunk_size, overlap):
        stride = max(1, chunk_size - min(overlap, chunk_size - 1))
        text = " ".join(toks)
        out = list(ChunkDoc.func().eval(text, chunk_size, stride))
        n = len(toks)
        assert len(out) == (math.ceil(n / stride) if n else 0)
        assert [i for i, _, _ in out] == list(range(len(out)))
        for _, chunk, n_tok in out:
            got = chunk.split(" ") if chunk else []
            assert len(got) == n_tok <= chunk_size
        # stride-prefix reconstruction covers every token exactly once
        rebuilt = []
        for idx, chunk, _ in out:
            toks_i = chunk.split(" ") if chunk else []
            rebuilt.extend(toks_i[:stride] if idx < len(out) - 1 else toks_i)
        assert rebuilt == toks

    prop()
