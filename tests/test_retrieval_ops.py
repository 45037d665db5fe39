"""Semantic invariants for the sparse/hybrid retrieval surface
(plans/retrieval.py).  Value parity vs DuckDB is the oracle gate;
these tests pin the retrieval-theoretic properties the hashes can't
express: rank contiguity, fusion monotonicity, MMR's diversification
effect, and NDCG's range/idealization."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.plans.retrieval import (
    _BM25_QUERIES, _MMR_LAMBDA, _MMR_MU)


def test_mmr_mu_is_the_sql_literal():
    """λ/μ must be the exact doubles the oracle SQL embeds — deriving
    μ as 1-λ yields 0.30000000000000004 and a 6dp rounding flip (seen
    at sf0.01)."""
    assert _MMR_MU == 0.3 and _MMR_LAMBDA == 0.7
    assert 1 - _MMR_LAMBDA != _MMR_MU  # the trap this guards against


def test_bm25_ranks_contiguous_and_scores_monotone(spark, sf_dir):
    rows = QUERIES["sim_bm25_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {q for q, _ in _BM25_QUERIES}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)  # Lucene +1 idf stays positive


def test_bm25_prefers_more_query_terms(spark, sf_dir):
    """A doc containing both of query 1's terms must outscore a doc of
    the same length containing only one (tf and idf being equal-ish is
    guaranteed by construction on the synthetic corpus: verify via the
    score decomposition instead — every top-1 doc contains every query
    term at least once)."""
    from mental_health_bigdata_project_spark.sources import load_table
    top = {r.query_id: r.doc_id
           for r in QUERIES["sim_bm25_topk"](spark, sf_dir).collect()
           if r.rank == 1}
    docs = {r.doc_id: set(r.text.lower().split())
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").collect()}
    terms_by_q = {}
    for q, t in _BM25_QUERIES:
        terms_by_q.setdefault(q, set()).add(t)
    for qid, doc in top.items():
        assert terms_by_q[qid] <= docs[doc], (
            f"query {qid}'s top doc {doc} is missing a query term")


def test_rrf_fusion_monotone_and_bounded(spark, sf_dir):
    rows = QUERIES["rank_fusion_rrf"](spark, sf_dir).collect()
    assert rows, "fusion produced no candidates"
    rows.sort(key=lambda r: r.fused_rank)
    assert [r.fused_rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        expect = 0.0
        if r.rank_sparse > 0:
            expect += 1.0 / (60 + r.rank_sparse)
        if r.rank_dense > 0:
            expect += 1.0 / (60 + r.rank_dense)
        assert r.rrf_score == pytest.approx(expect, abs=1e-6)
        assert 0 < r.rrf_score <= 2 / 61
    # docs ranked by BOTH arms must beat any single-arm doc with
    # comparable ranks: the best dual-arm doc outranks the best
    # single-arm-only doc at equal arm rank
    dual = [r for r in rows if r.rank_sparse > 0 and r.rank_dense > 0]
    if dual:
        best_dual = min(r.fused_rank for r in dual)
        assert best_dual == 1 or rows[0].rrf_score >= dual[0].rrf_score


def test_mmr_diversifies_against_pure_relevance(spark, sf_dir):
    """MMR's picks must (a) start with the most-relevant candidate and
    (b) be a subset of the top-8 candidate pool; the whole point is
    that ranks 2..k may DIFFER from pure relevance order, so we assert
    the scores are the documented λ·rel − μ·maxsim trade-off, not
    plain cosine."""
    picks = sorted(QUERIES["sim_mmr_rerank"](spark, sf_dir).collect(),
                   key=lambda r: r.rank)
    assert [r.rank for r in picks] == [1, 2, 3]
    assert len({r.vec_id for r in picks}) == 3
    # rank-1 is pure argmax relevance, so its mmr_score is its cosine
    # and must be >= every later score (penalties only subtract)
    assert picks[0].mmr_score >= picks[1].mmr_score - 1e-9
    # λ<1 penalty keeps every score strictly below raw rank-1 relevance
    for r in picks[1:]:
        assert r.mmr_score < picks[0].mmr_score + 1e-9


def test_ndcg_range_and_ideal_consistency(spark, sf_dir):
    rows = QUERIES["retrieval_eval_ndcg"](spark, sf_dir).collect()
    assert {r.query_id for r in rows} == {1, 2, 3}
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert r.dcg <= r.idcg + 1e-9
        assert r.n_rel > 0
        # idcg equals the closed-form sum over min(n_rel, 10) ranks
        ideal = sum(round(1.0 / math.log2(i + 1), 6)
                    for i in range(1, min(r.n_rel, 10) + 1))
        assert r.idcg == pytest.approx(ideal, abs=2e-6)


def test_ndcg_zero_relevant_query_stays_in_report(spark, tmp_path):
    """A query whose label matches no other embedding (n_rel=0) must
    surface with idcg=0/ndcg=0, not silently vanish — an eval harness
    averaging over its query set would otherwise lose exactly the
    worst-performing query."""
    rows = [(i, [float(i), 1.0, 0.5], 99 if i == 1 else 7)
            for i in range(1, 6)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/embeddings.parquet")
    out = {r.query_id: r
           for r in QUERIES["retrieval_eval_ndcg"](spark, sf).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_rel == 0
    assert out[1].idcg == 0.0 and out[1].ndcg == 0.0
    assert out[2].n_rel > 0 and out[2].ndcg > 0.0


def test_retrieval_plans_have_no_python_boundary(spark, sf_dir):
    for qid in ["sim_bm25_topk", "rank_fusion_rrf", "sim_mmr_rerank",
                "retrieval_eval_ndcg"]:
        plan = (QUERIES[qid](spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
