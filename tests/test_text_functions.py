"""Golden-record + edge-case tests for the native clean/risk expressions
(FIXTURES.md §3: G1-G3 from the reference's golden output file, E1-E7
synthetic edge cases).  These pin the exact reference UDF semantics:
substring keyword match, membership-not-occurrence counting, cap at 100,
score-before-truncate ordering, apostrophe keyword on uncleaned text.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.functions.text import (
    clean_text, combined_text, risk_score)
from mental_health_bigdata_project_spark.pipeline import enrich_posts

GOLDEN_PATH = "/root/reference/data/processed_posts_realtime.json"


def score_of(spark, title: str, text: str) -> int:
    df = spark.createDataFrame([(title, text)], "title string, text string")
    return df.select(
        risk_score(combined_text("title", "text")).alias("r")).collect()[0].r


def clean_of(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(clean_text(F.col("t")).alias("c")).collect()[0].c


@pytest.mark.skipif(not os.path.exists(GOLDEN_PATH),
                    reason="reference golden file not available")
def test_golden_records_exact_parity(spark):
    """Re-run the pipeline on the 3 golden records; risk_score and
    cleaned_text must match the stored values exactly."""
    with open(GOLDEN_PATH) as f:
        records = json.load(f)
    assert len(records) >= 3
    for rec in records:
        # The golden file stores text already truncated to 500 chars; the
        # stored risk was computed pre-truncation.  Recomputing on the
        # *stored* text must still match for G1/G3; G2's keyword lies in
        # the truncated region, so only compare cleaned_text there and
        # assert the full-text ordering property separately below.
        got_clean = clean_of(
            spark, f"{rec['title']} {rec['text']}".strip())[:200]
        assert got_clean == rec["cleaned_text"], rec["id"]
    # G1: single keyword 'depressed' -> 10
    g1 = records[0]
    assert score_of(spark, g1["title"], g1["text"]) == g1["risk_score"] == 10
    # G3: 'kms'/'cant fix' are NOT keywords -> 0 (semantics must not be
    # "improved" to understand slang or missing apostrophes)
    g3 = records[2]
    assert score_of(spark, g3["title"], g3["text"]) == g3["risk_score"] == 0


def test_score_before_truncate_ordering(spark):
    """G2 property: a keyword beyond char 500 still scores (score on the
    full text, truncate after — kafka_consumer_simple.py:123-131)."""
    text = ("x" * 600) + " I feel hopeless"
    df = spark.createDataFrame([("1", "title", text)], "id string, title string, text string")
    out = enrich_posts(df).collect()[0]
    assert out.risk_score == 10
    assert len(out.text) == 500  # stored text truncated
    assert len(out.cleaned_text) <= 200


def test_substring_not_word_boundary(spark):
    # E1: 'die' inside 'died'
    assert score_of(spark, "", "my plant died yesterday") == 10


def test_keyword_counts_once(spark):
    # E2: repeated keyword counts once
    assert score_of(spark, "", "hopeless hopeless hopeless") == 10


def test_cap_at_100(spark):
    # E3: 11+ distinct keywords cap at 100
    text = ("suicide kill myself end it all no reason to live hopeless "
            "worthless give up can't go on depressed anxious panic overwhelmed")
    assert score_of(spark, "", text) == 100


def test_title_only(spark):
    # E4: empty text, title carries the keyword
    assert score_of(spark, "feeling depressed", "") == 10


def test_null_text_defaults(spark):
    # E5: null text -> clean '' / score from title only
    df = spark.createDataFrame([("t", None)], "title string, text string")
    row = df.select(
        risk_score(combined_text("title", "text")).alias("r"),
        clean_text(F.col("text")).alias("c")).collect()[0]
    assert row.r == 0
    assert row.c == ""


def test_url_and_punct_stripped(spark):
    # E6: URLs then punctuation then whitespace collapse
    got = clean_of(spark, "Check http://x.com/a?b=1  it's GREAT!!  ok")
    assert got == "check its great ok"


def test_apostrophe_keyword_on_uncleaned_text(spark):
    # E7: "can't go on" matches the raw text (cleaning strips the ')
    assert score_of(spark, "", "I can't go on like this") >= 10
    # and the cleaned form 'cant go on' must NOT match
    assert score_of(spark, "", "cant go on") == 0


def test_clean_is_native_no_python_udf(spark):
    """The whole enrichment must stay JVM-side: no BatchEvalPython /
    PythonUDF nodes in the physical plan."""
    df = spark.createDataFrame([("1", "t", "x")], "id string, title string, text string")
    plan = enrich_posts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


# --- property-based parity (hypothesis) ----------------------------------

def _spec_clean(s: str) -> str:
    """Independent pure-Python spec of the clean pipeline (SURVEY §2.7):
    lower -> strip urls -> strip non-alnum -> collapse whitespace.

    Whitespace is spelled out as the Java/RE2 class [ \\t\\n\\x0b\\f\\r]:
    Python's \\s additionally matches \\x1c-\\x1f and Unicode spaces,
    which the engine (Java regex) and the oracle (RE2) both exclude —
    the engine's class is the contract."""
    import re
    ws = " \t\n\x0b\f\r"
    s = s.lower()
    s = re.sub(rf"http[^{ws}]+|www[^{ws}]+", "", s)
    s = re.sub(rf"[^a-z0-9{ws}]", "", s)
    return re.sub(rf"[{ws}]+", " ", s).strip(ws)


def _spec_risk(s: str) -> int:
    from mental_health_bigdata_project_spark.functions.text import (
        DISTRESS_KEYWORDS)
    low = s.lower()
    return min(10 * sum(1 for k in DISTRESS_KEYWORDS if k in low), 100)


def test_property_clean_and_risk_parity(spark):
    """Randomized parity: the native expressions must equal the spec on
    adversarial text (unicode, keywords embedded mid-word, URLs,
    repeated whitespace).  One Spark job per batch, not per example."""
    from hypothesis import given, settings, strategies as st
    from mental_health_bigdata_project_spark.functions.text import (
        DISTRESS_KEYWORDS, clean_text, risk_score)

    frag = st.one_of(
        st.text(max_size=30),
        st.sampled_from(DISTRESS_KEYWORDS),
        st.sampled_from(["http://x.com/a?b=1", "www.foo.bar/baz",
                         "  ", "\t\n", "CAN'T GO ON", "Die", "diet"]),
    )
    texts = st.lists(
        st.builds(lambda parts: " ".join(parts), st.lists(frag, max_size=6)),
        min_size=1, max_size=40)

    @settings(max_examples=8, deadline=None)
    @given(texts)
    def run(batch):
        df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)],
                                   "i int, text string")
        got = {r.i: (r.c, r.r) for r in df.select(
            "i", clean_text(F.col("text")).alias("c"),
            risk_score(F.col("text")).alias("r")).collect()}
        want = {i: (_spec_clean(t), _spec_risk(t)) for i, t in enumerate(batch)}
        assert got == want

    run()


def test_bpe_merges_match_python_reference(spark, sf_dir):
    """The distributed BPE trainer must produce the EXACT merge list a
    single-process reference implementation learns from the same word
    counts (same pair-count convention: all adjacent pairs; same greedy
    left-to-right merge application; same lexicographic tiebreak)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.plans.textops import tokens_col
    from mental_health_bigdata_project_spark.sources import load_table

    got = [(r["step"], r["left"], r["right"], r["weight"])
           for r in QUERIES["bpe_train_merges"](spark, sf_dir).collect()]
    assert len(got) == 10

    words = Counter()
    for r in (load_table(spark, sf_dir, "documents")
              .select(F.explode(tokens_col()).alias("w"))
              .groupBy("w").agg(F.count("*").alias("freq")).collect()):
        words[tuple(r["w"])] = r["freq"]

    expected = []
    for step in range(10):
        counts = Counter()
        for syms, freq in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freq
        if not counts:
            break
        (a, b), wgt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        expected.append((step, a, b, wgt))
        merged = Counter()
        for syms, freq in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] += freq
        words = merged

    assert got == expected


def test_bpe_encode_matches_python_application(spark, sf_dir):
    """Encoding with the learned merges must give the same per-word
    symbol count as a pure-Python greedy left-to-right application."""
    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.plans.textops import tokens_col
    from mental_health_bigdata_project_spark.sources import load_table

    merges = [(r["left"], r["right"])
              for r in QUERIES["bpe_train_merges"](spark, sf_dir)
              .orderBy("step").collect()]

    def encode(word: str) -> int:
        syms = list(word)
        for a, b in merges:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return len(syms)

    docs = load_table(spark, sf_dir, "documents")
    expected = {}
    for r in (docs.select("doc_id", tokens_col().alias("toks")).collect()):
        expected[r["doc_id"]] = (
            len(r["toks"]), sum(encode(w) for w in r["toks"]))

    got = {r["doc_id"]: (r["n_tokens"], r["n_bpe_symbols"])
           for r in QUERIES["bpe_encode_apply"](spark, sf_dir).collect()}
    assert got == expected
    # merges must actually compress: fewer symbols than characters
    total_chars = sum(
        len(w) for r in docs.select(tokens_col().alias("t")).collect()
        for w in r["t"])
    assert sum(v[1] for v in got.values()) < total_chars
