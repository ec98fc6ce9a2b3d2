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


def parallelize(df: DataFrame) -> DataFrame:
    """Repartition to the session's default parallelism before a
    CPU-heavy per-row stage (signatures, cosine scoring). Small-file
    corpora otherwise run those stages in ONE task — a 0.5 MB parquet
    with a single row group cannot be split by maxPartitionBytes. The
    shuffle moves only the raw input rows; at production scale inputs
    arrive well-partitioned and AQE coalesces the extra exchange."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def r2(c: Column | str) -> Column:
    return F.round(c, 2)


def r4(c: Column | str) -> Column:
    return F.round(c, 4)


def r6(c: Column | str) -> Column:
    return F.round(c, 6)


def dec_sum(c: Column, out_scale: int = 2, dec: str = "decimal(18,6)") -> Column:
    """Deterministic money-style sum: per-row cast to DECIMAL (exact
    and order-INDEPENDENT to add), exact decimal sum, back to double,
    round.

    round(sum(double), 2) is a latent cross-session hash-mismatch:
    double summation order varies with partitioning (core count), and
    with enough groups some sum lands within an ulp of a half-cent
    midpoint — observed on TPC-H Q7 (1199 groups): 1413903.735 →
    .73 on one session, .74 on another.

    The final rounding must ALSO happen in the decimal domain: exact
    decimal sums legitimately end in .xx5, and round(double, 2) of
    such a midpoint resolves differently per engine (Spark rounds the
    shortest decimal repr half-up, DuckDB the binary value), while
    round(DECIMAL, 2) is half-away-from-zero in both. Decimal→decimal
    CAST is NOT usable for this (DuckDB casts round half-even, Spark
    half-up). SQL twin:
    CAST(round(sum(CAST(x AS DECIMAL(18,6))), 2) AS DECIMAL(18,2))."""
    return (
        F.round(F.sum(c.cast(dec)), out_scale).cast(f"decimal(18,{out_scale})")
    )


def dec_avg(c: Column, out_scale: int = 4, dec: str = "decimal(18,6)") -> Column:
    """Deterministic mean via exact decimal sum / count."""
    return F.round(F.sum(c.cast(dec)).cast("double") / F.count(c), out_scale)


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
