"""Focused equivalence tests for the round-11 optimization rewrites
(fast tier: these guard result-identity of changed operator internals).

- ml_gbdt_stumps' driver-side stump search is additionally covered by
  tests/test_round10b_ops.py::test_gbdt_stumps_match_numpy_boosting
  (independent numpy boosting reference), which stays in the fast tier.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_minhash_pair_build_shared_and_filter_equivalent(spark, sf_dir):
    """dedup_minhash_near and dedup_cluster_components consume ONE
    session-pinned pair table (r11): the memo hands out the same
    object, and the near query is exactly the >= 0.5 slice of it."""
    from mental_health_bigdata_project_spark.plans import similarity as S

    p1 = S.corpus_neardup_fast_pairs(spark, sf_dir)
    p2 = S.corpus_neardup_fast_pairs(spark, sf_dir)
    assert p1 is p2, "pair build must be session-memoized"

    near = {(r["doc_a"], r["doc_b"], r["est_jaccard"])
            for r in S.dedup_minhash_near(spark, sf_dir).collect()}
    manual = {(r["doc_a"], r["doc_b"], r["est_jaccard"])
              for r in p1.filter(F.col("est_jaccard") >= 0.5).collect()}
    assert near == manual and near, "near pairs == filtered shared table"

    # the cluster report's node set is exactly the pair-graph's nodes
    comp = S.dedup_cluster_components(spark, sf_dir).collect()
    members = {int(m) for r in comp for m in r["member_ids"].split(",")}
    nodes = {d for a, b, _ in near for d in (a, b)}
    assert members == nodes


@pytest.mark.slow    # re-runs the full DoReMi build twice (~1 min)
def test_doremi_pivot_overflow_falls_back_to_join_form(spark, sf_dir):
    """Past the domain bound the weights query must return the SAME
    rows via the join-based doremi_from_counts recurrence (ADVICE r10:
    the pivot form degrades/hard-fails at large domain counts)."""
    from mental_health_bigdata_project_spark.plans import textops as T

    rows_pivot = sorted(
        map(tuple, T.mixture_doremi_weights(spark, sf_dir).collect()))
    T._DOREMI_PIVOT_MEMO.clear()
    old = T.DOREMI_MAX_DOMAINS
    T.DOREMI_MAX_DOMAINS = 1          # force the overflow path
    try:
        with pytest.raises(T.DoremiDomainOverflow):
            T._doremi_pivot(spark, sf_dir)
        rows_join = sorted(
            map(tuple, T.mixture_doremi_weights(spark, sf_dir).collect()))
    finally:
        T.DOREMI_MAX_DOMAINS = old
        T._DOREMI_PIVOT_MEMO.clear()
    assert rows_join == rows_pivot
