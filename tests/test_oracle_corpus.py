"""Run the full declared-query corpus against the DuckDB oracle at sf0.001 —
a local mirror of the driver's CORRECTNESS gate (which runs at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, compare_query

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

WITH_ORACLE = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def test_all_queries_have_known_oracle_state():
    # every oracle key must reference a declared query
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    compare_query(spark, duck, df, ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # runs and has a stable schema
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
