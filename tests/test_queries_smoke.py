"""Smoke: every registered query runs at sf0.001 and produces a stable
schema; entry() returns rows. The full value-level correctness gate is
tools/check_oracle.py (driver-equivalent, sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _all_queries():
    from irs_990_efiler_database_spark.queries import all_queries

    return all_queries()


def test_registry_nonempty():
    from irs_990_efiler_database_spark.queries import all_oracles, all_queries

    qs, os_ = all_queries(), all_oracles()
    assert len(qs) >= 40
    # every oracle key must have a query
    assert set(os_) <= set(qs)


@pytest.mark.parametrize("name", sorted(_all_queries()))
def test_query_runs(spark, name):
    fn = _all_queries()[name]
    df = fn(spark, SF_SMOKE)
    assert df.columns  # schema resolves
    df.limit(5).collect()  # executes


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 1


def test_oracle_and_query_names_aligned():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    missing = set(qs) - set(oracles)
    # every query should have an oracle unless deliberately rows-only
    allowed_rows_only: set[str] = set()
    assert missing <= allowed_rows_only, f"queries without oracle: {missing}"
