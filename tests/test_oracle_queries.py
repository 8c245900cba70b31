"""Differential tests: every SQL-expressible registry query vs DuckDB.

This is the local mirror of the driver's t2 gate (CORRECTNESS_r{N}.json):
run the Spark implementation and the oracle SQL on the same fixtures and
require identical row count, column names, and canonical values.
"""

from __future__ import annotations

import pytest

from ascii_hydra_spark.verification import REGISTRY
from tests.oracle_compare import assert_results_match

SQL_CHECKED = [name for name, spec in REGISTRY.items() if spec.sql is not None]
ROWS_ONLY = [name for name, spec in REGISTRY.items() if spec.sql is None]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, oracle, sf_dir, name):
    spec = REGISTRY[name]
    spark_df = spec.fn(spark, sf_dir)
    duck_pdf = oracle.execute(spec.sql).fetchdf()
    assert_results_match(spark_df, duck_pdf, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    """No-oracle queries must at least execute and return a stable schema."""
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
