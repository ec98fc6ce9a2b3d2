"""Shared helpers for operator builders.

Determinism conventions (SURVEY.md §5): every computed column is
aliased identically in the Spark builder and the DuckDB oracle SQL;
double-valued aggregates are rounded on BOTH sides (sum-order across
partitions is nondeterministic in any parallel engine, so last-ulp
float differences are expected and rounded away); LIMIT queries use a
total order with a unique tiebreak key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.sources.tables import Tables, load


def t(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)


def views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for spark.sql builders."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def r2(c: Column | str) -> Column:
    return F.round(c, 2)


def r4(c: Column | str) -> Column:
    return F.round(c, 4)


def r6(c: Column | str) -> Column:
    return F.round(c, 6)


def ntz(lit: str) -> Column:
    """Timestamp-NTZ literal (matches DuckDB's naive TIMESTAMP '...')."""
    return F.lit(lit).cast("timestamp_ntz")


def sql_query(sql: str):
    """Builder for queries expressed directly in (dialect-shared) SQL:
    registers every fixture view, then runs Catalyst on the text."""

    def builder(spark: SparkSession, sf_dir: str) -> DataFrame:
        views(
            spark,
            sf_dir,
            "region",
            "nation",
            "customer",
            "supplier",
            "part",
            "orders",
            "lineitem",
            "events",
            "documents",
            "embeddings",
        )
        return spark.sql(sql)

    return builder
