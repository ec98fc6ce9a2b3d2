"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` builder; ``oracle_sql()`` gives the
DuckDB-runnable ANSI equivalent for the differential correctness
check. Registered by the modules under
``mcp_iceberg_duckdb_spark/operators/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from mcp_iceberg_duckdb_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return registry.QUERIES["q1_pricing_summary"].builder(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for ops that are
    not SQL-expressible — the driver records a rows-only check)."""
    return registry.all_oracles()
