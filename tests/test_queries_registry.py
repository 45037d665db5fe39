"""Registry sanity: every query runs at sf0.001 and returns a stable
schema; entry() smoke; oracle ids are a subset of query ids.  (Full
value-parity against DuckDB is scripts/check_oracles.py / the driver.)"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


def test_oracles_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the bulk of the surface must be oracle-checked, not rows-only
    assert len(oracles) >= 35


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"lang", "n_docs", "avg_risk", "high_risk"} <= set(df.columns)


@pytest.mark.parametrize("qid", sorted(entry_mod.queries()))
def test_query_runs(spark, sf_dir, qid):
    df = entry_mod.queries()[qid](spark, sf_dir)
    assert df.columns  # schema resolves
    n = df.count()
    assert n >= 0
