"""Shared pytest fixtures: one SparkSession for the whole run, one
DuckDB connection with the fixture tables registered as views —
mirroring the driver's differential-oracle harness."""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mcp_iceberg_duckdb_spark.session import build_session

    s = build_session(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


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


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison. Type-tagged:
    the driver value-hashes results, where 23 (BIGINT) and 23.0
    (DOUBLE) differ — Python's 23 == 23.0 must not mask that, nor
    bool vs int (bool is an int subclass)."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # collapse -0.0 / +0.0 and last-ulp noise the queries didn't
        # already round away
        return ("f", round(v, 9) + 0.0)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, list):
        return ("l", tuple(_norm_cell(x) for x in v))
    return (type(v).__name__, v)


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda tup: tuple(str(x) for x in tup),
    )


def assert_matches_oracle(spark_df, duck_con, oracle: str, name: str = "?"):
    """Driver-style comparison: column names (sorted), row count, and
    order-insensitive value multiset must all match."""
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
