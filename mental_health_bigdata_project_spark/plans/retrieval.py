"""Retrieval serving + evaluation: BM25, rank fusion, MMR, NDCG.

No reference counterpart (the reference's only "retrieval" is the
dashboard's keyword filter — ``dashboard/app.py:30-85``); this is the
[EXT] sparse/hybrid-retrieval surface a training-data and RAG pipeline
needs next to the dense ANN stack in ``plans/similarity.py``:

- ``sim_bm25_topk``     — Okapi BM25 over an inverted-index join
- ``rank_fusion_rrf``   — reciprocal-rank fusion of the dense and
                          sparse arms (the standard hybrid combiner)
- ``sim_mmr_rerank``    — maximal-marginal-relevance diversification
                          of a candidate list (unrolled, compositional)
- ``retrieval_eval_ndcg`` — NDCG@10 of the dense run against label
                          relevance (the eval harness for the above)

Scale notes are per-query; the common theme is that every stage is a
term- or candidate-bounded join — never a corpus×corpus product — so
each plan's shuffle volume is O(postings) or O(k²), not O(N²).

Determinism follows the registry rules (plans/registry.py): per-term
double scores are 6dp-rounded then decimal-summed so accumulation is
order-free cross-engine; ranks always carry an id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..artifacts import SessionMemo
from ..functions.vectors import cosine_similarity, to_double_array
from ..sources import load_table
from .registry import query
from .textops import tokens_col

# BM25 free parameters (the Robertson/Lucene defaults).
_K1, _B = 1.2, 0.75

# The fixed query workload: three queries over the corpus vocabulary.
# A real serving path broadcasts exactly such a (query_id, term) relation
# per batch; pinning it keeps the oracle deterministic.
_BM25_QUERIES = [
    (1, "vector"), (1, "join"),
    (2, "hash"), (2, "scan"), (2, "slow"),
    (3, "stream"), (3, "window"),
]

_BM25_QUERIES_SQL = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)

# Shared oracle fragments --------------------------------------------------

_TOKS_SQL = ("list_filter(regexp_split_to_array(lower(text), '\\s+'), "
             "x -> x <> '')")

_COS_SQL = ("list_dot_product({a}, {b}) / "
            "(sqrt(list_dot_product({a}, {a})) * "
            "sqrt(list_dot_product({b}, {b})))")

# Okapi BM25 with the Lucene +1 idf (always positive, so high-df terms
# in this 30-word synthetic vocabulary still contribute).
_BM25_CORE_SQL = f"""
    qt AS (SELECT * FROM (VALUES {_BM25_QUERIES_SQL}) v(query_id, term)),
    toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE)
                       / count(*) AS avgdl
              FROM dl),
    tf AS (SELECT t.doc_id, t.token, CAST(count(*) AS BIGINT) AS tf
           FROM toks t JOIN (SELECT DISTINCT term FROM qt) q
             ON t.token = q.term
           GROUP BY t.doc_id, t.token),
    dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS dfreq
              FROM tf GROUP BY token),
    terms AS (
      SELECT qt.query_id, tf.doc_id,
             round(ln(1 + (s.n - d.dfreq + 0.5) / (d.dfreq + 0.5))
                   * tf.tf * ({_K1} + 1)
                   / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / s.avgdl)),
                   6) AS term_score
      FROM qt
      JOIN tf ON tf.token = qt.term
      JOIN dfreq d ON d.token = qt.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s),
    scores AS (
      SELECT query_id, doc_id,
             CAST(SUM(CAST(term_score AS DECIMAL(18,6))) AS DOUBLE) AS score
      FROM terms GROUP BY query_id, doc_id),
    ranked AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS INTEGER)
               AS rank,
             round(score, 6) AS score
      FROM scores)
"""


def bm25_rank_df(qt: DataFrame, tf: DataFrame, dl: DataFrame,
                 stats: DataFrame) -> DataFrame:
    """BM25 scoring core shared by the batch plan and the streaming
    index (streaming/bm25index.py serves from persisted postings with
    THIS exact function, so streaming-equals-batch parity is by
    construction).  Inputs: qt(query_id, term), tf(doc_id, token, tf),
    dl(doc_id, dl), stats(n, avgdl) — a 1-row frame.  Output:
    (query_id, doc_id, rank, score) for every matching doc."""
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    idf = F.log(1 + (F.col("n") - F.col("dfreq") + 0.5)
                / (F.col("dfreq") + 0.5))
    norm = (F.col("tf") * (_K1 + 1)
            / (F.col("tf")
               + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))))
    terms = (F.broadcast(qt).join(tf, qt.term == tf.token)
             .join(F.broadcast(dfreq), "token")
             # postings ⋈ doc-lengths is the one genuinely big-big join:
             # both sides key on doc_id, so pin a shuffled hash join —
             # co-partitioned, no sort, and no skew (doc_id is unique)
             .join(dl.hint("shuffle_hash"), "doc_id")
             .crossJoin(F.broadcast(stats))
             .select("query_id", "doc_id",
                     F.round(idf * norm, 6).alias("term_score")))
    scores = (terms.groupBy("query_id", "doc_id")
              .agg(F.sum(F.col("term_score").cast("decimal(18,6)"))
                   .cast("double").alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return scores.select(
        "query_id", "doc_id",
        F.row_number().over(w).cast("int").alias("rank"),
        F.round("score", 6).alias("score"))


_BM25_INDEX_MEMO = SessionMemo()


def _bm25_index(spark: SparkSession, sf_dir: str) -> tuple:
    """(tf, dl, stats): the postings index for the fixed query-term
    workload — the session-memoized STORED-INDEX face of the BM25
    family (sim_bm25_topk and rank_fusion_rrf each rebuilt it from the
    raw corpus per call; the streaming twin streaming/bm25index.py
    already persists exactly these relations).  Scoring itself stays
    per-call: only the index is pinned."""
    hit = _BM25_INDEX_MEMO.get(spark, sf_dir)
    if hit is not None:
        return hit
    docs = load_table(spark, sf_dir, "documents")
    qt = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    # doc length = token-array size on the UN-exploded row: identical
    # to count-after-explode for every doc that produces tokens (the
    # size() > 0 filter reproduces explode dropping empty docs), and
    # it saves a full corpus explode + doc_id-keyed agg shuffle
    # (guide §2.4 — the explode below then only feeds the pruned tf)
    dl = (docs.select("doc_id", F.size(tokens_col()).alias("dl"))
          .filter(F.col("dl") > 0)
          .localCheckpoint(eager=True))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum(F.col("dl").cast("decimal(18,0)")).cast("double")
         / F.count("*")).alias("avgdl")).localCheckpoint(eager=True)
    # Posting lists only for queried terms: the semi-join prunes the
    # token stream before the tf aggregation ever shuffles.
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    qterms = qt.select("term").distinct()
    tf = (toks.join(F.broadcast(qterms), toks.token == qterms.term)
          .groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
          .localCheckpoint(eager=True))
    hit = (tf, dl, stats)
    _BM25_INDEX_MEMO.put(spark, sf_dir, hit)
    return hit


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, rank, score) for the fixed query workload —
    the shared sparse arm of sim_bm25_topk and rank_fusion_rrf:
    per-call scoring over the session-pinned postings index."""
    qt = spark.createDataFrame(_BM25_QUERIES, "query_id int, term string")
    tf, dl, stats = _bm25_index(spark, sf_dir)
    return bm25_rank_df(qt, tf, dl, stats)


@query("sim_bm25_topk", f"""
    WITH {_BM25_CORE_SQL}
    SELECT query_id, doc_id, rank, score
    FROM ranked WHERE rank <= 10
""")
def sim_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-10 per query over an inverted-index join — the
    sparse-retrieval baseline every hybrid RAG / curation stack pairs
    with dense ANN.  The plan is postings-bounded: the token stream is
    semi-joined to the (broadcast) query-term list BEFORE the tf
    aggregation, so shuffle volume is O(matching postings), never the
    corpus; df/avgdl are metadata-sized broadcasts; the final top-10
    is a per-query WindowGroupLimit under the exchange.  Per-term
    scores are 6dp-rounded then decimal-summed (order-free, the
    registry's float rule); idf is the Lucene ln(1 + (N-df+.5)/(df+.5))
    variant so scores stay positive on this stopword-dense synthetic
    vocabulary.  At 100 TB: identical shape — the query relation stays
    a broadcast, postings shard by token, and per-query heaps replace
    nothing (the window already computes map-side partial top-k)."""
    scored = _bm25_scores(spark, sf_dir)
    return scored.filter(F.col("rank") <= 10)


@query("rank_fusion_rrf", f"""
    WITH {_BM25_CORE_SQL},
    sparse AS (SELECT doc_id, rank AS rank_sparse FROM ranked
               WHERE query_id = 1 AND doc_id <> 1 AND rank <= 20),
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 1),
    dcos AS (
      SELECT e.vec_id AS doc_id,
             round({_COS_SQL.format(a='e.embedding::DOUBLE[]', b='q.qe')},
                   6) AS cosine
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 1),
    dense AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cosine DESC, doc_id)
                  AS INTEGER) AS rank_dense
      FROM dcos QUALIFY rank_dense <= 20),
    fused AS (
      SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
             CAST(coalesce(s.rank_sparse, 0) AS INTEGER) AS rank_sparse,
             CAST(coalesce(d.rank_dense, 0) AS INTEGER) AS rank_dense,
             round(coalesce(CAST(1.0 AS DOUBLE) / (60 + s.rank_sparse),
                            CAST(0 AS DOUBLE))
                   + coalesce(CAST(1.0 AS DOUBLE) / (60 + d.rank_dense),
                              CAST(0 AS DOUBLE)), 6) AS rrf_score
      FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id)
    SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
                AS INTEGER) AS fused_rank,
           doc_id, rrf_score, rank_sparse, rank_dense
    FROM fused
""")
def rank_fusion_rrf(spark, sf_dir):
    """Reciprocal-rank fusion (k=60) of the sparse BM25 arm and the
    dense cosine arm for one query — the standard hybrid-retrieval
    combiner (Cormack et al.): rrf = Σ 1/(60+rank), rank-only so the
    two arms' incomparable score scales never meet.  Both arms are
    top-20 lists (candidate-bounded), so the fusion join moves ≤40
    rows regardless of corpus size; at 100 TB the arms are the
    already-sharded BM25/ANN plans and this stage is unchanged.
    1/(60+rank) is an exact double division and the two addends are
    coalesce-fixed in order, so no decimal accumulation is needed;
    absent ranks surface as 0 (not NULL) to keep the driver hash
    canonical."""
    e = load_table(spark, sf_dir, "embeddings")
    sparse = (_bm25_scores(spark, sf_dir)
              .filter((F.col("query_id") == 1) & (F.col("doc_id") != 1)
                      & (F.col("rank") <= 20))
              .select("doc_id", F.col("rank").alias("rank_sparse")))
    q = (e.filter(F.col("vec_id") == 1)
         .select(to_double_array("embedding").alias("qe")))
    cos = cosine_similarity(to_double_array("embedding"), F.col("qe"))
    # Distributed partial top-k (TakeOrderedAndProject) FIRST, so the
    # corpus never funnels through a single-partition window sort; the
    # row_number below then ranks only the 20 survivors.
    dense = (e.crossJoin(F.broadcast(q))
             .filter(F.col("vec_id") != 1)
             .select(F.col("vec_id").alias("doc_id"),
                     F.round(cos, 6).alias("cosine"))
             .orderBy(F.desc("cosine"), "doc_id").limit(20)
             .withColumn("rank_dense",
                         F.row_number().over(
                             Window.orderBy(F.desc("cosine"), "doc_id"))
                         .cast("int"))
             .drop("cosine"))
    rrf = (F.when(F.col("rank_sparse") > 0,
                  1.0 / (60 + F.col("rank_sparse"))).otherwise(0.0)
           + F.when(F.col("rank_dense") > 0,
                    1.0 / (60 + F.col("rank_dense"))).otherwise(0.0))
    fused = (sparse.join(dense.hint("shuffle_hash"), "doc_id", "full_outer")
             .select("doc_id",
                     F.coalesce("rank_sparse", F.lit(0)).cast("int")
                     .alias("rank_sparse"),
                     F.coalesce("rank_dense", F.lit(0)).cast("int")
                     .alias("rank_dense"))
             .withColumn("rrf_score", F.round(rrf, 6)))
    return fused.select(
        F.row_number().over(Window.orderBy(F.desc("rrf_score"), "doc_id"))
        .cast("int").alias("fused_rank"),
        "doc_id", "rrf_score", "rank_sparse", "rank_dense")


# MMR: candidates = dense top-8 for vec 1; select k=3 with λ=0.7.
# μ is pinned to the literal 0.3 — deriving it as 1-λ in Python yields
# 0.30000000000000004, a different double than the SQL literal 0.3, and
# the divergence surfaced as a 6dp rounding flip at sf0.01.
_MMR_LAMBDA, _MMR_MU = 0.7, 0.3


@query("sim_mmr_rerank", f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
               WHERE vec_id = 1),
    cand AS (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS ve,
             round({_COS_SQL.format(a='e.embedding::DOUBLE[]', b='q.qe')},
                   6) AS rel
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> 1
      QUALIFY row_number() OVER (ORDER BY rel DESC, e.vec_id) <= 8),
    sims AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round({_COS_SQL.format(a='a.ve', b='b.ve')}, 6) AS sim
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
    s1 AS (SELECT vec_id, rel AS mmr FROM cand
           ORDER BY rel DESC, vec_id LIMIT 1),
    m2 AS (
      SELECT c.vec_id,
             round(CAST({_MMR_LAMBDA} AS DOUBLE) * c.rel
                   - CAST({_MMR_MU} AS DOUBLE) * s.sim, 6) AS mmr
      FROM cand c JOIN sims s ON s.ia = c.vec_id
      JOIN s1 ON s.ib = s1.vec_id
      WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)),
    s2 AS (SELECT vec_id, mmr FROM m2 ORDER BY mmr DESC, vec_id LIMIT 1),
    m3 AS (
      SELECT c.vec_id,
             round(CAST({_MMR_LAMBDA} AS DOUBLE) * c.rel
                   - CAST({_MMR_MU} AS DOUBLE) * max(s.sim),
                   6) AS mmr
      FROM cand c JOIN sims s ON s.ia = c.vec_id
      WHERE s.ib IN (SELECT vec_id FROM s1 UNION ALL
                     SELECT vec_id FROM s2)
        AND c.vec_id NOT IN (SELECT vec_id FROM s1 UNION ALL
                             SELECT vec_id FROM s2)
      GROUP BY c.vec_id, c.rel),
    s3 AS (SELECT vec_id, mmr FROM m3 ORDER BY mmr DESC, vec_id LIMIT 1)
    SELECT 1 AS rank, vec_id, mmr AS mmr_score FROM s1
    UNION ALL SELECT 2, vec_id, mmr FROM s2
    UNION ALL SELECT 3, vec_id, mmr FROM s3
""")
def sim_mmr_rerank(spark, sf_dir):
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein): from
    the dense top-8 candidate list for one query, greedily pick k=3
    items maximizing λ·rel − (1−λ)·max-sim-to-selected — the standard
    diversification pass between retrieval and context assembly (and,
    in curation, between scoring and sample selection).  Greedy
    selection is inherently sequential, so the k steps are UNROLLED as
    k dataflow stages — each an argmax over the (broadcast-sized)
    candidate set joined to the selected set's similarity rows; no
    driver loop, no collect.  All heavy lifting (the corpus-wide
    top-8) happens once up front; the rerank itself touches k·|cand|
    rows, so at 100 TB the cost is the candidate generation, which is
    the already-audited dense-ANN plan.  rel and pairwise sims are
    6dp-rounded before every comparison and every argmax carries a
    vec_id tiebreak, so the greedy trajectory is identical
    cross-engine."""
    e = load_table(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") == 1)
         .select(to_double_array("embedding").alias("qe")))
    rel = cosine_similarity(to_double_array("embedding"), F.col("qe"))
    cand = (e.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != 1)
            .select("vec_id", to_double_array("embedding").alias("ve"),
                    F.round(rel, 6).alias("rel"))
            .orderBy(F.desc("rel"), "vec_id").limit(8)
            # one corpus scan feeds s1/m2/m3 and both sides of the sim
            # matrix — truncate the lineage so the 8-row candidate set
            # is computed once, not once per consumer subtree
            .localCheckpoint(eager=False))
    a = cand.select(F.col("vec_id").alias("ia"), F.col("ve").alias("va"))
    b = cand.select(F.col("vec_id").alias("ib"), F.col("ve").alias("vb"))
    sims = (a.join(F.broadcast(b), F.col("ia") != F.col("ib"))
            .select("ia", "ib",
                    F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
                    .alias("sim")))
    lam, mu = _MMR_LAMBDA, _MMR_MU

    s1 = (cand.orderBy(F.desc("rel"), "vec_id").limit(1)
          .select("vec_id", F.col("rel").alias("mmr")))
    sel1 = s1.select(F.col("vec_id").alias("ib"))
    m2 = (cand.join(F.broadcast(s1.select(F.col("vec_id").alias("sel"))),
                    F.col("vec_id") == F.col("sel"), "left_anti")
          .join(sims.join(F.broadcast(sel1), "ib"),
                F.col("vec_id") == F.col("ia"))
          .select("vec_id",
                  F.round(lam * F.col("rel") - mu * F.col("sim"), 6)
                  .alias("mmr")))
    s2 = m2.orderBy(F.desc("mmr"), "vec_id").limit(1)
    sel12 = s1.select("vec_id").unionAll(s2.select("vec_id"))
    m3 = (cand.join(F.broadcast(sel12.select(F.col("vec_id").alias("sel"))),
                    F.col("vec_id") == F.col("sel"), "left_anti")
          .join(sims.join(F.broadcast(sel12.select(F.col("vec_id")
                                                   .alias("ib"))), "ib"),
                F.col("vec_id") == F.col("ia"))
          .groupBy("vec_id", "rel")
          .agg(F.max("sim").alias("maxsim"))
          .select("vec_id",
                  F.round(lam * F.col("rel") - mu * F.col("maxsim"), 6)
                  .alias("mmr")))
    s3 = m3.orderBy(F.desc("mmr"), "vec_id").limit(1)
    pick = lambda df, r: df.select(  # noqa: E731
        F.lit(r).cast("int").alias("rank"), "vec_id",
        F.col("mmr").alias("mmr_score"))
    return pick(s1, 1).unionAll(pick(s2, 2)).unionAll(pick(s3, 3))


@query("retrieval_eval_ndcg", f"""
    WITH qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe,
                       label AS qlabel
                FROM embeddings WHERE vec_id IN (1, 2, 3)),
    run AS (
      SELECT q.query_id, e.vec_id, e.label, q.qlabel,
             round({_COS_SQL.format(a='e.embedding::DOUBLE[]', b='q.qe')},
                   6) AS cosine,
             CAST(row_number() OVER (
                    PARTITION BY q.query_id
                    ORDER BY round({_COS_SQL.format(
                        a='e.embedding::DOUBLE[]', b='q.qe')}, 6) DESC,
                             e.vec_id) AS INTEGER) AS rank
      FROM embeddings e JOIN qs q ON e.vec_id <> q.query_id),
    dcg AS (
      SELECT query_id,
             CAST(SUM(CAST(round(
                    CASE WHEN label = qlabel THEN 1.0 ELSE 0.0 END
                    / (ln(rank + 1) / ln(2)), 6) AS DECIMAL(18,6)))
                  AS DOUBLE) AS dcg
      FROM run WHERE rank <= 10 GROUP BY query_id),
    nrel AS (
      SELECT q.query_id,
             CAST(SUM(CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel
      FROM embeddings e JOIN qs q ON e.vec_id <> q.query_id
      GROUP BY q.query_id),
    idcg AS (
      SELECT n.query_id, n.n_rel,
             COALESCE(CAST(SUM(CAST(round(1.0 / (ln(i + 1) / ln(2)), 6)
                                    AS DECIMAL(18,6))) AS DOUBLE), 0.0)
               AS idcg
      FROM nrel n LEFT JOIN (SELECT unnest(range(1, 11)) AS i) r
        ON r.i <= least(n.n_rel, 10)
      GROUP BY n.query_id, n.n_rel)
    SELECT d.query_id, round(d.dcg, 6) AS dcg, round(i.idcg, 6) AS idcg,
           i.n_rel,
           round(CASE WHEN i.idcg = 0 THEN 0.0 ELSE d.dcg / i.idcg END, 6)
             AS ndcg
    FROM dcg d JOIN idcg i ON d.query_id = i.query_id
""")
def retrieval_eval_ndcg(spark, sf_dir):
    """NDCG@10 of the dense-cosine run against label relevance — the
    graded-ranking eval that closes the retrieval loop (recall@k is
    already measured by sim_ivfpq_recall; NDCG adds rank position
    weighting).  Relevance is binary label-match against the query
    vector's own label; IDCG uses the corpus-wide relevant count
    (capped at the cutoff), i.e. true NDCG, not the local-ideal
    shortcut.  A query with ZERO relevant documents stays in the
    report with idcg=0/ndcg=0 rather than silently dropping out — the
    worst query is the one an averaged eval must not lose.  One corpus
    scan serves all three queries (the query
    relation is a 3-row broadcast); per-rank gains are 6dp-rounded
    then decimal-summed.  At 100 TB the run under eval would come from
    the ANN index; this harness only ever touches k rows per query
    after the rank window."""
    e = load_table(spark, sf_dir, "embeddings")
    qs = (e.filter(F.col("vec_id").isin(1, 2, 3))
          .select(F.col("vec_id").alias("query_id"),
                  to_double_array("embedding").alias("qe"),
                  F.col("label").alias("qlabel")))
    cos = cosine_similarity(to_double_array("embedding"), F.col("qe"))
    joined = (e.join(F.broadcast(qs), F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id", "label", "qlabel",
                      F.round(cos, 6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    run = joined.withColumn("rank", F.row_number().over(w).cast("int"))
    gain = (F.when(F.col("label") == F.col("qlabel"), 1.0).otherwise(0.0)
            / (F.log(F.col("rank") + 1) / F.log(F.lit(2.0))))
    dcg = (run.filter(F.col("rank") <= 10)
           .groupBy("query_id")
           .agg(F.sum(F.round(gain, 6).cast("decimal(18,6)"))
                .cast("double").alias("dcg")))
    nrel = (joined.groupBy("query_id")
            .agg(F.sum(F.when(F.col("label") == F.col("qlabel"), 1)
                       .otherwise(0)).cast("bigint").alias("n_rel")))
    ranks = spark.range(1, 11).select(F.col("id").alias("i"))
    ideal_gain = 1.0 / (F.log(F.col("i") + 1) / F.log(F.lit(2.0)))
    # LEFT join + coalesce: a query with zero relevant docs (n_rel=0)
    # must surface with idcg=0/ndcg=0, not silently vanish from the
    # report — it is exactly the worst-performing query an eval harness
    # averaging ndcg over its query set needs to see
    idcg = (nrel.join(F.broadcast(ranks),
                      F.col("i") <= F.least(F.col("n_rel"), F.lit(10)),
                      "left")
            .groupBy("query_id", "n_rel")
            .agg(F.coalesce(
                F.sum(F.round(ideal_gain, 6).cast("decimal(18,6)"))
                .cast("double"), F.lit(0.0)).alias("idcg")))
    return (dcg.join(F.broadcast(idcg), "query_id")
            .select("query_id", F.round("dcg", 6).alias("dcg"),
                    F.round("idcg", 6).alias("idcg"), "n_rel",
                    F.round(F.when(F.col("idcg") == 0, 0.0)
                            .otherwise(F.col("dcg") / F.col("idcg")), 6)
                    .alias("ndcg")))
