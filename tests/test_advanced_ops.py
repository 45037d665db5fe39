"""Semantic invariants for plans/advanced.py operators — properties the
oracle hash can't express (dominance soundness, disjointness, bounds),
checked by brute force at sf0.001."""

from __future__ import annotations
import pytest

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.sources import load_table


@pytest.mark.slow
def test_skyline_is_exactly_the_undominated_set(spark, sf_dir):
    """Every returned point is undominated and every undominated order
    is returned (brute-force O(n^2) over the sf0.001 frontier space)."""
    pts = [(r["o_orderkey"], r["o_totalprice"], r["o_orderdate"])
           for r in load_table(spark, sf_dir, "orders")
           .select("o_orderkey", "o_totalprice", "o_orderdate").collect()]
    got = {r["o_orderkey"]
           for r in QUERIES["skyline_pareto_orders"](spark, sf_dir).collect()}

    def dominated(p, q):  # q dominates p (maximize price, date)
        return (q[1] >= p[1] and q[2] >= p[2]
                and (q[1] > p[1] or q[2] > p[2]))

    expected = {k for k, pr, dt in pts
                if not any(dominated((k, pr, dt), q)
                           for q in pts if q[0] != k)}
    assert got == expected and got


def test_interval_merge_spans_are_disjoint_and_complete(spark, sf_dir):
    """Per user: merged spans don't overlap/touch, are ordered, and
    account for every event exactly once."""
    rows = QUERIES["interval_merge_overlaps"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    assert sum(r["n_events"] for r in rows) == n_events
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["merged_start"], r["merged_end"]))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2  # strictly disjoint (touching would merge)
        for s, e in spans:
            assert s < e


def test_ewma_stays_within_window_envelope(spark, sf_dir):
    """EWMA is a convex combination of trailing values: always within
    [min, max] of its 20-row window; a user's first row equals value."""
    df = QUERIES["ts_ewma"](spark, sf_dir)
    w_chk = (F.col("ewma20") >= F.col("lo") - 1e-9) & \
            (F.col("ewma20") <= F.col("hi") + 1e-9)
    from pyspark.sql.window import Window
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-19, Window.currentRow))
    ev = load_table(spark, sf_dir, "events")
    env = ev.select("event_id", F.min("value").over(w).alias("lo"),
                    F.max("value").over(w).alias("hi"))
    joined = df.join(env, "event_id")
    assert joined.filter(~w_chk).count() == 0
    wn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (df.withColumn("rn", F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .filter("rn = 1"))
    assert first.filter(F.abs(F.col("ewma20") - F.col("value")) > 1e-12) \
        .count() == 0


def test_weighted_systematic_sample_picks_exactly_n(spark, sf_dir):
    rows = QUERIES["sample_weighted_systematic"](spark, sf_dir).collect()
    assert sum(r["n_picks"] for r in rows) == 50
    # heavier docs can't be picked less often than any lighter doc +1
    assert all(r["n_picks"] >= 1 for r in rows)


def test_asof_nearest_beats_both_alternatives(spark, sf_dir):
    """The chosen view is at least as close as the best backward AND
    best forward candidate, per purchase (brute force per user)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'") \
        .select("event_id", "user_id", "ts").collect()
    views = ev.filter("event_type = 'view'") \
        .select("user_id", "ts").collect()
    by_user: dict = {}
    for v in views:
        by_user.setdefault(v["user_id"], []).append(v["ts"])
    got = {r["event_id"]: r for r in
           QUERIES["join_asof_nearest"](spark, sf_dir).collect()}
    assert len(got) == len(purchases)
    for p in purchases:
        vts = by_user.get(p["user_id"], [])
        r = got[p["event_id"]]
        if not vts:
            assert r["near_view_ts"] is None
            continue
        best = min(abs((v - p["ts"]).total_seconds()) for v in vts)
        chosen = abs((r["near_view_ts"] - p["ts"]).total_seconds())
        assert chosen == best


def test_triangle_counts_match_networkx_free_bruteforce(spark, sf_dir):
    """Triangle membership counts agree with a pure-Python enumeration
    over the same top-60 co-occurrence edge set."""
    from itertools import combinations

    from mental_health_bigdata_project_spark.plans.textops import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    tok_rows = docs.select(
        F.array_distinct(tokens_col()).alias("t")).collect()
    from collections import Counter
    freq = Counter()
    for r in tok_rows:
        freq.update(r["t"])
    top = {t for t, _ in sorted(freq.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:60]}
    edges = set()
    for r in tok_rows:
        in_top = sorted(set(r["t"]) & top)
        edges.update(combinations(in_top, 2))
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if a < b < c:
                expected[a] += 1
                expected[b] += 1
                expected[c] += 1
    got = {r["token"]: r["n_triangles"] for r in
           QUERIES["graph_triangle_count"](spark, sf_dir).collect()}
    assert got == dict(expected)


@pytest.mark.slow
def test_als_recommendations_dominated_by_seen_types(spark, sf_dir):
    """ml_als_recommend invariant: with a dense users x 5-type
    interaction matrix, implicit ALS must overwhelmingly recommend
    types the user actually interacted with, and the output shape is
    exactly top-2 per user with positive scores."""
    from mental_health_bigdata_project_spark.plans import QUERIES

    rows = QUERIES["ml_als_recommend"](spark, sf_dir).collect()
    assert rows
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    assert all(len(v) == 2 for v in per_user.values())
    assert all({x.rnk for x in v} == {1, 2} for v in per_user.values())
    seen_frac = sum(r.seen for r in rows) / len(rows)
    assert seen_frac >= 0.9


def test_privacy_l_diversity_invariants(spark, sf_dir):
    """Per-QI-class accounting: the top sensitive share is a proper
    fraction >= 1/n_sensitive, meets_l tracks the l=3 threshold, and
    class sizes sum to the customer count (no row lost to the two
    stacked aggs)."""
    from mental_health_bigdata_project_spark.plans import QUERIES
    from mental_health_bigdata_project_spark.sources import load_table

    rows = QUERIES["privacy_l_diversity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_sensitive <= 5  # 5 market segments exist
        assert 0.0 < r.top_sens_share <= 1.0
        assert r.top_sens_share >= 1.0 / r.n_sensitive - 1e-9
        assert r.meets_l == (1 if r.n_sensitive >= 3 else 0)
    total = sum(r.group_size for r in rows)
    assert total == load_table(spark, sf_dir, "customer").count()


def test_layout_zorder_beats_arrival_on_skipping(spark, sf_dir):
    """The point of the layout rewrite, asserted: Z-order clustering
    must let min/max file pruning skip most files on every diagonal
    rectangle probe, while arrival order skips ~none (each file's
    bounding box spans the whole key domain).  Also pins the
    file-count accounting (scanned <= total = 64) and the exactness
    of the dyadic skip fraction."""
    from mental_health_bigdata_project_spark.plans import QUERIES

    rows = QUERIES["layout_zorder_skipping"](spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r.layout, {})[r.query_id] = r
    assert set(by) == {"arrival", "zorder"}
    assert set(by["arrival"]) == set(by["zorder"]) == set(range(8))
    for qid in range(8):
        a, z = by["arrival"][qid], by["zorder"][qid]
        assert 0 <= z.files_scanned <= a.files_scanned <= 64
        assert a.files_total == z.files_total == 64
        assert z.skip_frac == 1.0 - z.files_scanned / 64  # dyadic-exact
        # the clustering claim: z-order prunes where arrival cannot
        assert z.files_scanned < 64
    total_a = sum(r.files_scanned for r in rows if r.layout == "arrival")
    total_z = sum(r.files_scanned for r in rows if r.layout == "zorder")
    assert total_z < total_a / 2
