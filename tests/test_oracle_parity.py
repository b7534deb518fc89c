"""Spark-vs-DuckDB parity for every oracle-checked query in the registry —
the local replica of the driver's CORRECTNESS gate (run at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from postgres_cdc_plugin_spark import registry

from .conftest import assert_parity

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()


def test_registry_consistency():
    # every oracle belongs to a query; every non-oracle query is declared rows-only
    assert set(ORACLES) <= set(QUERIES)
    missing = set(QUERIES) - set(ORACLES)
    assert missing == registry.ROWS_ONLY, (
        f"queries without oracle not declared rows-only: {missing ^ registry.ROWS_ONLY}"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    assert_parity(QUERIES[name](spark, sf_dir), duck.sql(ORACLES[name]), name)


@pytest.mark.parametrize("name", sorted(registry.ROWS_ONLY))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
