"""Spot-checks of [EXT] operator semantics beyond the oracle hash:
as-of join correctness on a hand-built case, dedup survivor choice,
similarity sanity, multimodal plumbing, plan-quality assertions."""

from __future__ import annotations
import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

from mental_health_bigdata_project_spark.sources import load_table

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow



def test_asof_join_semantics(spark, sf_dir):
    """Every purchase's matched view must be the max view ts <= purchase
    ts for that user (validated independently of the oracle)."""
    df = entry_mod.queries()["join_asof_events"](spark, sf_dir)
    rows = df.collect()
    assert rows
    from mental_health_bigdata_project_spark.sources import load_table
    events = load_table(spark, sf_dir, "events")
    views = {(r.user_id, r.ts) for r in
             events.filter(F.col("event_type") == "view").collect()}
    by_user = {}
    for u, t in views:
        by_user.setdefault(u, []).append(t)
    for r in rows:
        expect = max((t for t in by_user.get(r.user_id, []) if t <= r.ts),
                     default=None)
        assert r.view_ts == expect, (r.event_id, r.view_ts, expect)


def test_dedup_exact_keeps_min_doc_id(spark, sf_dir):
    df = entry_mod.queries()["dedup_exact_docs"](spark, sf_dir)
    rows = df.collect()
    fps = [r.fingerprint for r in rows]
    assert len(fps) == len(set(fps))  # one survivor per fingerprint


def test_cosine_topk_self_similarity(spark, sf_dir):
    """Top-1 neighbour's cosine must be <= 1 and the list sorted desc."""
    rows = entry_mod.queries()["sim_cosine_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    cos = [r.cosine for r in rows]
    assert all(-1.0 <= c <= 1.0 for c in cos)
    assert cos == sorted(cos, reverse=True)


def test_minhash_agrees_with_exact_jaccard(spark, sf_dir):
    """Every exact-Jaccard>=0.8 pair (restricted domain) should be a
    minhash candidate (recall check on high-sim pairs)."""
    exact = entry_mod.queries()["dedup_ngram_jaccard"](spark, sf_dir).collect()
    strong = {(r.doc_a, r.doc_b) for r in exact if r.jaccard >= 0.8}
    approx = {(r.doc_a, r.doc_b)
              for r in entry_mod.queries()["dedup_minhash_near"](spark, sf_dir).collect()}
    missed = strong - approx
    assert len(missed) <= max(1, len(strong) // 5), missed


def test_multimodal_mapinpandas_plumbing(spark, sf_dir):
    df = entry_mod.queries()["multimodal_features"](spark, sf_dir)
    rows = df.limit(5).collect()
    assert {"doc_id", "byte_len", "checksum", "mean_byte"} == set(df.columns)
    for r in rows:
        assert r.byte_len > 0 and 0 <= r.mean_byte <= 255


def test_media_decode_is_stubbed():
    from mental_health_bigdata_project_spark.operators.media import decode_media
    import pytest
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image/png")


def test_q1_plan_pushes_filter_and_prunes_columns(spark, sf_dir):
    """Plan-quality gate: the Q1 scan must push the shipdate predicate
    and read only the referenced columns."""
    df = entry_mod.queries()["q1_pricing_summary"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_partkey" not in plan  # unreferenced column pruned from scan


def test_broadcast_dim_join_is_broadcast(spark, sf_dir):
    df = entry_mod.queries()["join_broadcast_dim"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_recall_vs_exact_topk(spark, sf_dir):
    """IVF with nprobe=8/16 cells must recover most of the exact top-10
    (embedding clusters are coherent, so the true neighbours live in the
    probed cells)."""
    exact = {r.vec_id
             for r in entry_mod.queries()["sim_cosine_topk"](spark, sf_dir).collect()}
    ivf = {r.vec_id
           for r in entry_mod.queries()["sim_ann_ivf"](spark, sf_dir).collect()}
    assert len(exact & ivf) >= 6, sorted(exact - ivf)


def test_pipeline_training_data_has_one_shuffle(spark, sf_dir):
    """The composite cleaning pipeline must fuse into a single scan +
    one exchange (the dedup window on fingerprint) — no materialization
    barriers between quality gate and dedup."""
    df = entry_mod.queries()["pipeline_training_data"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q5_broadcasts_all_dims(spark, sf_dir):
    """Q5's nation/region/supplier sides must broadcast (no shuffle for
    dimension joins at these ratios)."""
    df = entry_mod.queries()["q5_region_revenue"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_sample_systematic_pushes_predicate(spark, sf_dir):
    """The modulus sample predicate must reach the parquet scan."""
    df = entry_mod.queries()["sample_systematic"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(event_id)]" in plan, plan


def test_cluster_components_cover_pairs(spark, sf_dir):
    """Every minhash candidate pair must land in one cluster, and each
    cluster id must be its minimum member."""
    pairs = {(r.doc_a, r.doc_b) for r in entry_mod.queries()
             ["dedup_minhash_near"](spark, sf_dir).collect()}
    clusters = entry_mod.queries()["dedup_cluster_components"](spark, sf_dir).collect()
    member_to_cluster = {}
    for c in clusters:
        members = [int(x) for x in c.member_ids.split(",")]
        assert c.cluster_id == min(members)
        assert c.cluster_size == len(members)
        for m in members:
            member_to_cluster[m] = c.cluster_id
    for a, b in pairs:
        assert member_to_cluster[a] == member_to_cluster[b], (a, b)


def test_frame_sampling_shapes(spark, sf_dir):
    """Frame sampler: every 4th 64-byte frame, correct indices/lengths,
    fan-out preserved per doc."""
    from mental_health_bigdata_project_spark.operators.media import (
        sample_frames, with_binary_payload)
    from mental_health_bigdata_project_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    payloads = with_binary_payload(docs)
    frames = sample_frames(payloads).collect()
    assert frames
    by_doc = {}
    for r in frames:
        assert r.frame_idx % 4 == 0
        assert 0 < r.frame_len <= 64
        assert len(r.frame_bytes) == r.frame_len
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    src = {r.doc_id: len(r.payload) for r in payloads.collect()}
    for doc_id, idxs in by_doc.items():
        expected = list(range(0, (src[doc_id] + 63) // 64, 4))
        assert sorted(idxs) == expected


def test_aqe_converts_smj_to_broadcast_at_runtime(spark, sf_dir):
    """With static broadcast disabled, AQE must still convert the join
    to broadcast at runtime once the filtered side's actual size is
    known — the 100 TB 'filter-then-join' resilience story."""
    # static broadcast off; AQE's own runtime threshold explicitly on
    # (it defaults to the static value, which would disable it too)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
    try:
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING")
        joined = o.join(c, o.o_custkey == c.c_custkey).groupBy(
            "c_mktsegment").count()
        joined.collect()  # materialize so AQE finalizes
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in final, final
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """A deliberately skewed join key (99% of rows on one key) must
    trigger AQE's skew-join split: the final plan's shuffle read shows
    skewed partition handling instead of one giant reducer."""
    n = 200_000
    # left: 99% of rows pile on key 7; right: every key exactly once, so
    # the join output stays O(n) while the left k=7 partition is skewed
    left = spark.range(n).select(
        F.when(F.col("id") % 100 != 0, F.lit(7)).otherwise(F.col("id"))
        .alias("k"), F.col("id").alias("v"))
    right = spark.range(n).select(F.col("id").alias("k"),
                                  F.col("id").alias("w"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = left.join(right, "k")
        # collect() finalizes THIS DataFrame's AQE execution (a noop
        # write would execute a clone and leave this plan un-finalized)
        assert len(joined.collect()) == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "skewed" in final, final[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_hll_sketch_rollup_accuracy(spark, sf_dir):
    """Merged monthly HLL sketches must estimate the year-level distinct
    within tolerance (approx_ok verdict column == 1 for every year),
    and the naive sum of monthly partials must sit at/above the true
    distinct (it double-counts customers active in several months)."""
    from mental_health_bigdata_project_spark.plans import QUERIES

    rows = QUERIES["sketch_hll_rollup"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_ok == 1
        assert r.naive_sum_of_partials >= r.exact_distinct


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A date-partitioned fact joined to a filtered dim must prune fact
    partitions at RUNTIME via a dynamic-pruning subquery — at 100 TB
    this is the difference between scanning 2 partitions and scanning
    all of them when the pruning values are only known after the dim
    filter runs."""
    from mental_health_bigdata_project_spark.sources import load_table

    fact_dir = str(tmp_path / "fact_by_year")
    (load_table(spark, sf_dir, "orders")
     .withColumn("o_year", F.year("o_orderdate"))
     .repartition("o_year")
     .write.mode("overwrite").partitionBy("o_year").parquet(fact_dir))
    dim_dir = str(tmp_path / "year_dim")
    (spark.range(1990, 2010)
     .select(F.col("id").alias("year"), (F.col("id") % 2 == 0).alias("even"))
     .write.mode("overwrite").parquet(dim_dir))

    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).filter("year IN (1996, 1997)")
    joined = fact.join(dim, fact.o_year == dim.year)
    n = joined.count()
    want = fact.filter(F.col("o_year").isin(1996, 1997)).count()
    assert n == want > 0

    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()


def test_shuffle_hash_join_hint(spark, sf_dir):
    """The SHUFFLE_HASH hint must override sort-merge selection: same
    single shuffle on the keys, but no sort on either side — the right
    choice when one side is modest and sorting dominates (e.g. high
    column counts), and an explicit physical-strategy control the
    engine exposes alongside BROADCAST (sql_hint_broadcast)."""
    from mental_health_bigdata_project_spark.sources import load_table

    confs = {"spark.sql.autoBroadcastJoinThreshold": "-1",
             "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        j = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
        assert j.count() == o.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "ShuffledHashJoin" in final
        assert "SortMergeJoin" not in final
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_gemm_topk_matches_native(spark, sf_dir):
    """The mapInPandas GEMM retrieval must return the same neighbor ids
    as the native-expression path for every query (cosines may differ
    in final ulps; ids must not)."""
    from mental_health_bigdata_project_spark.plans import QUERIES

    native = QUERIES["sim_topk_batch"](spark, sf_dir).collect()
    gemm = QUERIES["sim_topk_batch_gemm"](spark, sf_dir).collect()

    def by_query(rows):
        d = {}
        for r in rows:
            d.setdefault(r.query_id, []).append(r.vec_id)
        return {k: sorted(v) for k, v in d.items()}

    a, b = by_query(native), by_query(gemm)
    assert a.keys() == b.keys() and len(a) == 8
    assert a == b
    for rn, rg in zip(sorted(native, key=lambda r: (r.query_id, r.vec_id)),
                      sorted(gemm, key=lambda r: (r.query_id, r.vec_id))):
        assert abs(rn.cosine - rg.cosine) < 1e-5


def test_topk_sketch_rollup_exact_at_small_cardinality(spark, sf_dir):
    """Combined monthly approx_top_k sketches must be EXACT here: 5
    event types never overflow maxItemsTracked=1024, so the year-level
    estimate equals the exact per-year group-by."""
    got = {}
    for r in entry_mod.queries()["sketch_topk_rollup"](spark, sf_dir).collect():
        got.setdefault(r.yr, {})[r.event_type] = r.cnt
    from mental_health_bigdata_project_spark.sources import load_table
    from pyspark.sql import functions as F
    ev = load_table(spark, sf_dir, "events")
    exact = {}
    for r in (ev.groupBy(F.year("ts").alias("yr"), "event_type")
              .count().collect()):
        exact.setdefault(r.yr, {})[r.event_type] = r["count"]
    # top-5 estimate covers all 5 types -> whole map must match
    assert got == exact


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime row-level filtering: a selective dim filter must inject a
    bloom filter (might_contain over xxhash64 of the join key) into the
    fact side's scan filter, so non-matching fact rows die at the scan
    instead of riding the shuffle.  The application-side size threshold
    defaults to 10GB (right for real clusters); forcing it to 0 makes
    the behavior observable at test scale."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 1)
        j = li.join(p, li.l_partkey == p.p_partkey)
        expected = j.count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # semantics unchanged by the filter
        assert expected == li.join(p, li.l_partkey == p.p_partkey).count()
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))


def test_pagerank_tokens_invariants(spark, sf_dir):
    """TextRank sanity: the damped-PageRank rank mass must equal the
    node count (conservation invariant of the per-node formulation),
    every rank positive, the run deterministic, and rank order must
    reflect graph centrality (a token's weighted degree)."""
    from mental_health_bigdata_project_spark.plans import QUERIES

    q = QUERIES["graph_pagerank_tokens"]
    rows = {r["token"]: r["rank"] for r in q(spark, sf_dir).collect()}
    assert len(rows) > 10
    assert all(v > 0 for v in rows.values())
    assert abs(sum(rows.values()) - len(rows)) < 1e-3

    again = {r["token"]: r["rank"] for r in q(spark, sf_dir).collect()}
    assert rows == again          # same engine, same plan => identical

    # centrality sanity: the max-rank token sits in the top quartile by
    # weighted degree (rank correlates with, but is not equal to, degree)
    docs = load_table(spark, sf_dir, "documents")
    from mental_health_bigdata_project_spark.plans.textops import tokens_col
    deg = (docs.select(F.explode(tokens_col()).alias("tok"))
           .groupBy("tok").count().collect())
    by_deg = sorted(deg, key=lambda r: -r["count"])
    top_quartile = {r["tok"] for r in by_deg[:max(1, len(by_deg) // 4)]}
    best = max(rows, key=rows.get)
    assert best in top_quartile


def test_cached_dim_serves_multiple_plans(spark, sf_dir):
    """A cached dimension must be served from the in-memory columnar
    relation (InMemoryTableScan) by every subsequent plan that touches
    it — the serving-layer pattern replacing the reference dashboard's
    re-read-per-request (dashboard/app.py:16-28)."""
    dim = load_table(spark, sf_dir, "nation").cache()
    try:
        q1 = dim.groupBy("n_regionkey").count()
        q2 = (load_table(spark, sf_dir, "supplier")
              .join(dim, F.col("s_nationkey") == F.col("n_nationkey"))
              .groupBy("n_name").count())
        assert q1.count() > 0 and q2.count() > 0
        for q in (q1, q2):
            assert "InMemoryTableScan" in q._jdf.queryExecution().executedPlan().toString()
    finally:
        dim.unpersist()


def test_fpgrowth_singleton_supports_match_doc_freq(spark, sf_dir):
    """Every singleton frequent itemset's support must equal the plain
    document frequency of that token (independent recount), and every
    itemset's support must be <= the min of its members' singleton
    supports (anti-monotonicity)."""
    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.plans.textops import tokens_col

    rows = QUERIES["ml_fpgrowth_itemsets"](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    df_counts = {r["tok"]: r["n"] for r in (
        docs.select(F.explode(F.array_distinct(tokens_col())).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("n")).collect())}
    itemsets = [(r["itemset"].split(" "), r["freq"]) for r in rows]
    singles = {items[0]: freq for items, freq in itemsets if len(items) == 1}
    assert singles
    for tok, freq in singles.items():
        assert df_counts[tok] == freq
    for items, freq in itemsets:
        assert freq <= min(df_counts[t] for t in items)


def test_pca_variance_monotone_and_basis_orthonormal(spark, sf_dir):
    """PCA invariants: explained variance is non-increasing across
    components and the learned basis is orthonormal."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.sources import load_table

    out = QUERIES["ml_pca_embeddings"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0 and {"label", "n", "mean_pc1", "mean_pc2"} <= set(out.columns)

    emb = load_table(spark, sf_dir, "embeddings").select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"))
    model = PCA(k=8, inputCol="features", outputCol="pca").fit(emb)
    ev = list(model.explainedVariance)
    assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:]))
    import numpy as np
    basis = model.pc.toArray()  # 64 x 8
    gram = basis.T @ basis
    assert np.allclose(gram, np.eye(8), atol=1e-8)


def test_portable_minhash_estimates_track_exact_jaccard(spark, sf_dir):
    """Semantic bound for the portable MinHash twin: on every candidate
    pair it emits, the 16-hash agreement estimate must sit within 0.45
    of the EXACT 3-gram Jaccard (16 Bernoulli trials -> sd ~0.125; 0.45
    is a >3-sigma bound), and every emitted pair must genuinely share
    at least one shingle.  Guards against a hash-family or banding bug
    that would still hash-match its own oracle."""
    from pyspark.sql import functions as F

    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.plans.textops import tokens_col
    from mental_health_bigdata_project_spark.sources import load_table

    pairs = {(r.doc_a, r.doc_b): r.est_jaccard
             for r in QUERIES["dedup_minhash_portable"](spark, sf_dir).collect()}
    assert pairs, "portable minhash emitted no candidate pairs"

    toks = tokens_col()
    d = load_table(spark, sf_dir, "documents").select("doc_id", toks.alias("toks"))
    sh = F.when(
        F.size("toks") >= 3,
        F.transform(F.sequence(F.lit(1), F.size("toks") - 2),
                    lambda i: F.concat_ws(" ", F.element_at("toks", i),
                                          F.element_at("toks", i + 1),
                                          F.element_at("toks", i + 2))),
    ).otherwise(F.array().cast("array<string>"))
    shingle_sets = {r.doc_id: set(r.sh) for r in
                    d.select("doc_id", F.array_distinct(sh).alias("sh"))
                    .filter(F.col("doc_id").isin(
                        [i for p in pairs for i in p])).collect()}
    for (a, b), est in pairs.items():
        sa, sb = shingle_sets[a], shingle_sets[b]
        inter = len(sa & sb)
        assert inter > 0, f"pair ({a},{b}) shares no shingle"
        exact = inter / len(sa | sb)
        assert abs(est - exact) <= 0.45, (a, b, est, exact)


def test_ivf_cell_layout_prunes_ann_read(spark, sf_dir, tmp_path):
    """The sim_ann_ivf scale claim, made concrete: persist embeddings
    PARTITIONED BY the (deterministic sign-bucket) cell id, then an ANN
    probe of a handful of cells must compile to a partition-pruned scan
    (PartitionFilters on cell) that reads only the probed directories —
    at 100 TB the candidate scan touches nprobe/k of the store, no
    shuffle, no full scan."""
    from mental_health_bigdata_project_spark.sources import load_table

    # build the cell id exactly as dedup_embedding_cells does (sign bits
    # of the first 8 dims) and persist the corpus clustered by it
    emb = load_table(spark, sf_dir, "embeddings")
    cell = None
    for i in range(8):
        bit = (F.element_at("embedding", i + 1) > 0).cast("int") * (1 << i)
        cell = bit if cell is None else cell + bit
    store = str(tmp_path / "ivf_store")
    (emb.withColumn("cell", cell)
     .repartition("cell")
     .write.mode("overwrite").partitionBy("cell").parquet(store))

    probe = [3, 17, 101]
    reader = spark.read.parquet(store).filter(F.col("cell").isin(probe))
    plan = reader._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120], plan

    got = {r.vec_id for r in reader.collect()}
    want = {r.vec_id for r in emb.withColumn("cell", cell)
            .filter(F.col("cell").isin(probe)).collect()}
    assert got == want and got  # pruned read returns exactly the probed cells


def test_media_resize_nearest_neighbor(spark, sf_dir):
    """Resize: bounded output payloads, deterministic nearest-neighbor
    sampling, short payloads pass through unchanged."""
    from mental_health_bigdata_project_spark.operators.media import (
        resize_media, with_binary_payload)
    from mental_health_bigdata_project_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    payloads = with_binary_payload(docs)
    src = {r.doc_id: bytes(r.payload) for r in payloads.collect()}
    out = {r.doc_id: r for r in resize_media(payloads, 32).collect()}
    assert set(out) == set(src)
    for doc_id, r in out.items():
        p = src[doc_id]
        assert r.orig_len == len(p)
        if len(p) <= 32:
            assert bytes(r.resized_bytes) == p
        else:
            assert r.target_len == 32
            expected = bytes(p[(i * len(p)) // 32] for i in range(32))
            assert bytes(r.resized_bytes) == expected


def test_binaryfile_media_ingestion_batch_and_stream(spark, tmp_path):
    """Raw media enters through the binaryFile source: batch and
    streaming twins produce the SAME (doc_id, payload, media_meta)
    rows, glob pruning filters at listing time, and the rows feed the
    Arrow featurizer unchanged."""
    from mental_health_bigdata_project_spark.operators.media import (
        extract_features, read_media_dir, stream_media_dir)

    media = tmp_path / "media"
    media.mkdir()
    blobs = {"a.img": bytes(range(200)), "b.img": b"\xff" * 10,
             "c.img": b"\x00", "empty.img": b"", "skip.txt": b"not media"}
    for name, blob in blobs.items():
        (media / name).write_bytes(blob)

    batch = read_media_dir(spark, str(media), glob="*.img")
    rows = {r.media_meta.path.rsplit("/", 1)[-1]: r for r in batch.collect()}
    # glob pruned skip.txt at listing time; the binaryFile source also
    # SKIPS zero-byte files (no splittable content) — a corpus with
    # placeholder empties loses them here, so assert the behavior
    assert set(rows) == {"a.img", "b.img", "c.img"}
    assert bytes(rows["a.img"].payload) == blobs["a.img"]
    assert rows["a.img"].media_meta.ext == "img"
    assert rows["a.img"].media_meta.length == 200
    assert len({r.doc_id for r in rows.values()}) == 3  # path-hash ids

    # the projection feeds the Arrow featurizer directly
    feats = {r.doc_id: r for r in extract_features(
        batch.select("doc_id", "payload")).collect()}
    assert feats[rows["a.img"].doc_id].byte_len == 200
    assert feats[rows["c.img"].doc_id].byte_len == 1

    # streaming twin: drain with availableNow, compare to batch
    out = tmp_path / "out"
    q = (stream_media_dir(spark, str(media), glob="*.img")
         .writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r.doc_id: bytes(r.payload)
           for r in spark.read.parquet(str(out)).collect()}
    assert got == {r.doc_id: bytes(r.payload) for r in rows.values()}
