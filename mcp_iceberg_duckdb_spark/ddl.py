"""DDL / DML surface (SURVEY.md §2.9) — everything the reference
either hand-rolled or listed as roadmap, done natively.

Reference behavior being replaced/improved:

- CREATE TABLE: substring type matching where any type containing
  "INT" (including BIGINT) became int32, unknown types silently became
  strings (IcebergConnection.py:186-199). Here: Spark's real DDL
  parser and full type system; nothing downgrades.
- INSERT: single-row only, values zipped to schema order ignoring the
  column list, one data file + one commit per row
  (IcebergConnection.py:132-177, QueryManager.py:115-116). Here:
  multi-row and INSERT ... SELECT, column lists honored.
- UPDATE / DELETE / ALTER: rejected by the reference
  (`Unsupported query type`, roadmap README.md:112-117). Here:
  supported — natively against Iceberg/Delta catalogs; against plain
  file tables via an explicit copy-on-write rewrite (the same
  mechanism Iceberg CoW uses under the hood).

With the Iceberg runtime jar on the classpath all of these verbs go
straight through ``spark.sql`` (see sources/iceberg.py); the
emulation path below exists so the surface works in this jar-less
container too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def create_table(
    spark: SparkSession, name: str, columns_ddl: str, using: str = "parquet"
) -> None:
    """CREATE TABLE with a real type system (vs the reference's
    substring matching, IcebergConnection.py:186-199). ``columns_ddl``
    is standard ``"id INT, name STRING, ..."`` text."""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({columns_ddl}) USING {using}")


def insert_rows(spark: SparkSession, name: str, values_sql: str) -> int:
    """INSERT INTO ... VALUES — multi-row in one transaction/commit
    (the reference wrote one file + one catalog commit per row)."""
    spark.sql(f"INSERT INTO {name} VALUES {values_sql}")
    return spark.table(name).count()


def insert_select(spark: SparkSession, name: str, select_sql: str) -> None:
    spark.sql(f"INSERT INTO {name} {select_sql}")


def alter_add_column(spark: SparkSession, name: str, col_ddl: str) -> None:
    spark.sql(f"ALTER TABLE {name} ADD COLUMNS ({col_ddl})")


def _rewrite(spark: SparkSession, name: str, df: DataFrame) -> None:
    """Copy-on-write rewrite for file-backed tables: materialize the
    new image, then atomically overwrite. (With Iceberg on the
    classpath UPDATE/DELETE run natively and this path is unused.)"""
    cols = spark.table(name).columns
    # localCheckpoint truncates lineage — without it Spark refuses to
    # overwrite a table that the plan still reads from
    staged = df.select(*cols).localCheckpoint(eager=True)
    staged.write.mode("overwrite").insertInto(name, overwrite=True)


def delete_where(spark: SparkSession, name: str, condition: str) -> int:
    """DELETE FROM name WHERE condition. Tries native DML first
    (Iceberg/Delta), falls back to CoW rewrite for file tables."""
    before = spark.table(name).count()
    try:
        spark.sql(f"DELETE FROM {name} WHERE {condition}")
    except Exception:
        remaining = spark.table(name).filter(f"NOT ({condition})")
        _rewrite(spark, name, remaining)
    return before - spark.table(name).count()


def update_where(
    spark: SparkSession, name: str, assignments: dict[str, str], condition: str
) -> int:
    """UPDATE name SET col=expr,... WHERE condition — native first,
    CoW rewrite fallback."""
    set_sql = ", ".join(f"{k} = {v}" for k, v in assignments.items())
    n_match = spark.table(name).filter(condition).count()
    try:
        spark.sql(f"UPDATE {name} SET {set_sql} WHERE {condition}")
    except Exception:
        tbl = spark.table(name)
        cond = F.expr(condition)
        updated = tbl.select(
            *[
                F.when(cond, F.expr(assignments[c])).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
                for c in tbl.columns
            ]
        )
        _rewrite(spark, name, updated)
    return n_match


def merge_upsert(
    spark: SparkSession,
    target: str,
    source: DataFrame,
    key: str,
) -> None:
    """MERGE/upsert: native MERGE INTO where the catalog supports it,
    else the classic anti-join + union emulation."""
    source.createOrReplaceTempView("_merge_source")
    try:
        cols = spark.table(target).columns
        set_sql = ", ".join(f"t.{c} = s.{c}" for c in cols if c != key)
        spark.sql(
            f"MERGE INTO {target} t USING _merge_source s ON t.{key} = s.{key} "
            f"WHEN MATCHED THEN UPDATE SET {set_sql} "
            f"WHEN NOT MATCHED THEN INSERT *"
        )
    except Exception:
        tbl = spark.table(target)
        kept = tbl.join(source, on=key, how="left_anti")
        _rewrite(spark, target, kept.unionByName(source.select(*tbl.columns)))
