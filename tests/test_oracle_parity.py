"""The main correctness gate, run locally: every registered query
with an oracle is executed through Spark AND DuckDB on the same
parquet fixtures and compared (count + schema-names + value multiset)
— the same differential check the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from mcp_iceberg_duckdb_spark import registry
from tests.conftest import assert_matches_oracle

registry.load_all()

_WITH_ORACLE = sorted(n for n, s in registry.QUERIES.items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in registry.QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(name, spark, duck, sf_dir):
    spec = registry.QUERIES[name]
    df = spec.builder(spark, sf_dir)
    assert_matches_oracle(df, duck, spec.oracle, name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    """Queries without an oracle must still run and return a stable
    schema (>= 0 rows)."""
    spec = registry.QUERIES[name]
    df = spec.builder(spark, sf_dir)
    assert df.columns, f"{name}: no output columns"
    df.collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
