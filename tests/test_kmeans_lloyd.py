"""Invariants for the oracle-checked unrolled Lloyd k-means
(plans/similarity.py::_lloyd_chain) and the learned-quantizer IVF
probe built on it.  Value parity vs DuckDB is the oracle gate's job
(green at sf0.001/0.01/0.1); these tests pin the ALGORITHMIC
properties the hash can't see: the argmin really is the argmin, Lloyd
iterations never increase inertia, and the probe only searches the
probed cells."""

from __future__ import annotations

import math

import pytest

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.plans.similarity import (

    _KM_K, _emb, _lloyd_chain)

# Long-running parity/e2e/compaction tests: slow tier (r11; see
# pytest.ini) — the driver's default `pytest tests/ -x -q` gate
# outgrew its time budget (VERDICT r10 item 1); run with -m slow.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def kmeans_out(spark, sf_dir):
    return QUERIES["ml_kmeans_lloyd_portable"](spark, sf_dir).collect()


def test_kmeans_partition_is_total(kmeans_out, spark, sf_dir):
    n_corpus = _emb(spark, sf_dir).count()
    assert sum(r.n_vecs for r in kmeans_out) == n_corpus
    assert len(kmeans_out) <= _KM_K
    assert all(0 <= r.cid < _KM_K for r in kmeans_out)
    assert all(r.avg_sqdist > 0 for r in kmeans_out)


def test_kmeans_assignment_is_argmin(spark, sf_dir):
    """Each vector's recorded (cid, dist) must be the true minimum
    over all centroids — recomputed independently in Python floats."""
    e = _emb(spark, sf_dir)
    w2, cen = _lloyd_chain(e)
    assign = {r.vec_id: (r.cid, float(r.dist)) for r in w2.collect()}
    cents: dict[int, dict[int, float]] = {}
    for r in cen.collect():
        cents.setdefault(r.cid, {})[r.pos] = r.cv
    vecs = {r.vec_id: [math.floor(x * 1_000_000) / 1_000_000.0
                       for x in r.embedding]
            for r in e.select("vec_id",
                              e.embedding.cast("array<double>")
                              .alias("embedding")).collect()}
    for vid, (cid, dist) in assign.items():
        x = vecs[vid]
        dists = {c: sum((x[p] - cv[p]) ** 2 for p in range(len(x)))
                 for c, cv in cents.items()}
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
        # float recompute vs the engine's exact decimal: tolerance, and
        # the argmin must agree unless two cells are within tolerance
        assert abs(dists[cid] - dist) < 1e-6
        assert cid == best[0] or abs(dists[cid] - best[1]) < 1e-6


def test_lloyd_iteration_never_increases_inertia(spark, sf_dir):
    """The defining Lloyd invariant: total inertia (sum of squared
    distances to the assigned centroid) is non-increasing per
    iteration."""
    e = _emb(spark, sf_dir)
    inertias = []
    for iters in (1, 2):
        w2, _ = _lloyd_chain(e, iters=iters)
        total = w2.groupBy().sum("dist").collect()[0][0]
        inertias.append(float(total))
    assert inertias[1] <= inertias[0] + 1e-9


def test_ivf_kmeans_probe_shape(spark, sf_dir):
    rows = QUERIES["sim_ann_ivf_kmeans"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(rows[i].cosine >= rows[i + 1].cosine
               for i in range(len(rows) - 1))
    assert len({r.cid for r in rows}) <= 2      # only the probed cells
    assert all(r.vec_id != 1 for r in rows)     # query excluded
