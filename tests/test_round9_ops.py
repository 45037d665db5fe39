"""Round-9 operator semantics: the d-feature Newton trainer's numpy
replication, plus property checks the DuckDB oracles can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from mental_health_bigdata_project_spark.plans import QUERIES
from mental_health_bigdata_project_spark.sources import load_table


def test_logreg_newton_d_matches_numpy_replication(spark, sf_dir):
    """The engine's two d-feature Newton steps (5x5 Hessian solved by
    unrolled Gaussian elimination) must reproduce the same recurrence
    run in numpy on the collected rows — numpy solves with
    np.linalg.solve (LAPACK, partial pivoting), a DIFFERENT algorithm
    than the engine's no-pivot elimination, so agreement here checks
    the math, not just the formula strings."""
    import numpy as np

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "value", "user_id", "event_id").collect())
    y = np.array([1.0 if r.event_type == "purchase" else 0.0 for r in ev])
    X = np.column_stack([
        np.ones(len(ev)),
        np.array([r.value / 100.0 for r in ev]),
        np.array([(r.user_id % 97) / 97.0 for r in ev]),
        np.array([(r.event_id % 11) / 11.0 for r in ev]),
        np.array([1.0 if r.event_type == "click" else 0.0 for r in ev]),
    ])
    beta = np.zeros(5)
    for _ in range(2):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        g = X.T @ (y - p)
        H = (X * (p * (1.0 - p))[:, None]).T @ X
        beta = beta + np.linalg.solve(H, g)
    row = QUERIES["ml_logreg_newton_d"](spark, sf_dir).collect()[0]
    assert row.n == len(ev)
    for i in range(5):
        assert abs(row[f"b{i}"] - beta[i]) < 1e-5, (i, row[f"b{i}"], beta[i])
    # log-likelihood at the fitted model matches numpy's evaluation
    p = 1.0 / (1.0 + np.exp(-(X @ beta)))
    ll = float(np.sum(y * np.log(p) + (1.0 - y) * np.log(1.0 - p)))
    assert abs(row.log_likelihood - ll) < 1e-3
    # the is-click indicator must be informative and NEGATIVE (a click
    # is by construction not a purchase), unlike the near-null slopes
    # on the synthetic numeric features — a sanity check that the
    # extra dimensions actually train
    assert row.b4 < -0.5


def test_gauss_stages_solve_random_spd_systems():
    """_gauss_stages emits a correct solver: evaluate its assignment
    program in pure Python on random SPD systems and compare with
    numpy.linalg.solve."""
    import numpy as np

    from mental_health_bigdata_project_spark.plans.quality import (
        _gauss_stages)

    rng = np.random.default_rng(7)
    for n in (2, 3, 5, 6):
        A = rng.normal(size=(n, n))
        H = A @ A.T + n * np.eye(n)        # SPD
        g = rng.normal(size=n)
        env = {f"g{i}": g[i] for i in range(n)}
        for i in range(n):
            for j in range(i, n):
                env[f"h{i}{j}"] = H[i, j]
        for stage in _gauss_stages(n):
            for name, expr in stage:
                env[name] = eval(expr, {}, env)  # noqa: S307 — test-only
        d = np.array([env[f"d{i}"] for i in range(n)])
        assert np.allclose(d, np.linalg.solve(H, g), atol=1e-9)
