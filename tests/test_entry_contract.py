"""Driver-contract smoke: entry() runs under a plain session, every
queries() entry returns a DataFrame at sf0.001, oracle keys are a subset
of query keys, and column aliasing rules hold (the driver compares
columns sorted by name)."""

from __future__ import annotations

import pytest

import __spark_entry__ as E


def test_oracle_keys_subset_of_queries():
    qs = E.queries()
    os_ = E.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30


def test_entry_runs_and_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema.fields) >= 3
    # stable schema on second invocation
    assert E.entry(spark).schema == df.schema


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_smoke(spark, sf_dir, name):
    """Every catalog query plans and executes at sf0.001."""
    df = E.queries()[name](spark, sf_dir)
    rows = df.limit(1000).collect()
    # queries over planted patterns may legitimately return few rows, but
    # a completely empty catalog entry is a wiring bug
    nonempty_expected = name not in {"anti_join_customers_without_orders"}
    if nonempty_expected:
        assert len(rows) > 0, f"{name} returned 0 rows"
