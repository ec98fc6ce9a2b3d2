"""Shared pytest fixtures: one SparkSession for the whole run, one
DuckDB connection with the fixture tables registered as views —
mirroring the driver's differential-oracle harness."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# Callable oracles (certificate pattern) render literals from the
# data at this dir — keep it in lockstep with the dir the DuckDB
# views read.
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR


@pytest.fixture(scope="session")
def spark():
    from mcp_iceberg_duckdb_spark.session import build_session

    s = build_session(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def _scaled_sf_dir(scale: str) -> str:
    """Resolve a larger-scale fixture dir next to SF_DIR, skipping
    (not erroring) on machines that lack that scale factor."""
    base = Path(SF_DIR).parent / f"sf{scale}"
    if not (base / "lineitem.parquet").exists():
        pytest.skip(f"no sf{scale} fixtures at {base}")
    return str(base)


@pytest.fixture(scope="session")
def sf_dir_medium():
    """sf0.01 fixtures (driver's correctness scale)."""
    return _scaled_sf_dir("0.01")


@pytest.fixture(scope="session")
def sf_dir_large():
    """sf0.1 fixtures (driver's bench scale)."""
    return _scaled_sf_dir("0.1")


@pytest.fixture(scope="session")
def duck():
    from mcp_iceberg_duckdb_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


from mcp_iceberg_duckdb_spark.compare import (  # noqa: E402
    norm_cell as _norm_cell,
    rows_to_multiset as _rows_to_multiset,
)


def assert_matches_oracle(spark_df, duck_con, oracle, name: str = "?"):
    """Driver-style comparison: column names (sorted), row count, and
    order-insensitive value multiset must all match."""
    if callable(oracle):  # certificate-pattern oracle (registry.py)
        oracle = oracle()
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(oracle)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: rowcount mismatch spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_ms = _rows_to_multiset(s_cols, s_rows)
    d_ms = _rows_to_multiset(d_cols, d_rows)
    if s_ms != d_ms:
        diffs = [(a, b) for a, b in zip(s_ms, d_ms) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
