"""CSV / JSONL ingestion round-trips: fixture tables written out in
each format and read back through the pinned-schema loaders must be
value-identical to the parquet load — including NTZ timestamps and
array columns (JSONL) — and malformed input must fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.sources.files import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from mcp_iceberg_duckdb_spark.sources.tables import load


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("table", ["nation", "orders", "documents"])
def test_csv_roundtrip_matches_parquet(spark, sf_dir, tmp_path, table):
    src = load(spark, sf_dir, table)
    out = str(tmp_path / f"{table}_csv")
    write_csv(src, out)
    back = read_csv(spark, out, table=table)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


@pytest.mark.parametrize("table", ["nation", "events", "embeddings"])
def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path, table):
    src = load(spark, sf_dir, table)
    out = str(tmp_path / f"{table}_jsonl")
    write_jsonl(src, out)
    back = read_jsonl(spark, out, table=table)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_rejects_nested_tables(spark, tmp_path):
    with pytest.raises(ValueError, match="nested"):
        read_csv(spark, str(tmp_path), table="embeddings")


def test_schema_required(spark, tmp_path):
    with pytest.raises(ValueError, match="schema inference is disabled"):
        read_csv(spark, str(tmp_path))
    with pytest.raises(ValueError, match="unknown table"):
        read_jsonl(spark, str(tmp_path), table="nope")


def test_failfast_on_malformed_rows(spark, tmp_path):
    """FAILFAST is the default: a malformed row kills the batch
    instead of silently nulling it (undetected data loss at scale)."""
    p = tmp_path / "bad.csv"
    p.write_text("r_regionkey,r_name\n0,AFRICA\nnot_an_int,EUROPE\n")
    df = read_csv(spark, str(p), table="region")
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        df.collect()
    # explicit PERMISSIVE opt-out still works for forensics
    perm = read_csv(spark, str(p), table="region", mode="PERMISSIVE")
    vals = {r.r_name for r in perm.collect()}
    assert "AFRICA" in vals and len(vals) == 2


def test_filters_push_into_csv_scan(spark, sf_dir, tmp_path):
    """The lazy load composes with Catalyst like any source: filters
    appear as PushedFilters on the CSV scan node."""
    src = load(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_csv")
    write_csv(src, out)
    df = read_csv(spark, out, table="orders").filter(
        F.col("o_orderkey") == 1
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)]" in plan or (
        "PushedFilters" in plan and "o_orderkey" in plan
    )


@pytest.mark.parametrize("table", ["nation", "events", "embeddings"])
def test_orc_roundtrip_matches_parquet(spark, sf_dir, tmp_path, table):
    from mcp_iceberg_duckdb_spark.sources.files import read_orc, write_orc

    src = load(spark, sf_dir, table)
    out = str(tmp_path / f"{table}_orc")
    write_orc(src, out)
    back = read_orc(spark, out, table=table)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_filters_push_into_orc_scan(spark, sf_dir, tmp_path):
    from mcp_iceberg_duckdb_spark.sources.files import read_orc, write_orc

    src = load(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(src, out)
    df = read_orc(spark, out, table="orders").filter(F.col("o_orderkey") == 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderkey" in plan
