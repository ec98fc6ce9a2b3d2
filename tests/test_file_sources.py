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


def test_compact_parquet_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    from mcp_iceberg_duckdb_spark.sources.files import compact_parquet

    src = load(spark, sf_dir, "documents")
    frag = str(tmp_path / "fragmented")
    src.repartition(32).write.parquet(frag)
    import os as _os

    n_in = sum(
        1 for f in _os.listdir(frag) if f.endswith(".parquet")
    )
    assert n_in == 32
    out = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, frag, out, target_file_bytes=1 << 30)
    assert n_out == 1
    assert _sorted_rows(spark.read.parquet(out)) == _sorted_rows(src)


def test_compact_parquet_sorted_layout_prunes(spark, sf_dir, tmp_path):
    """Sorted compaction must leave per-file min/max ranges disjoint
    on the sort key (the pruning lever)."""
    from mcp_iceberg_duckdb_spark.sources.files import compact_parquet

    src = load(spark, sf_dir, "orders")
    frag = str(tmp_path / "ofrag")
    src.repartition(16).write.parquet(frag)
    out = str(tmp_path / "osorted")
    n_out = compact_parquet(
        spark, frag, out, target_file_bytes=64 * 1024, sort_cols=["o_orderkey"]
    )
    assert n_out >= 2
    import pyarrow.parquet as pq
    import os as _os

    ranges = []
    for f in sorted(_os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(_os.path.join(out, f))
        idx = md.schema.names.index("o_orderkey")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo, f"overlapping file ranges: {ranges}"


def test_merge_schema_reads_evolved_batches(spark, sf_dir, tmp_path):
    from mcp_iceberg_duckdb_spark.sources.files import read_parquet_merged

    base = str(tmp_path / "evolving")
    v1 = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    v1.write.parquet(base)
    v2 = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    v2.write.mode("append").parquet(base)
    merged = read_parquet_merged(spark, base)
    assert set(merged.columns) == {"n_nationkey", "n_name", "n_regionkey"}
    n = v1.count()
    assert merged.count() == 2 * n
    assert merged.where(F.col("n_regionkey").isNull()).count() == n


def test_csv_hostile_values_roundtrip_contract(spark, tmp_path):
    """Round-trip contract for hostile strings: commas, quotes,
    unicode, empty-vs-NULL survive the default (splittable) CSV
    path; embedded NEWLINES fail LOUDLY by default (FAILFAST — the
    splittable reader cannot parse quoted newlines) and round-trip
    exactly with multiLine=true; JSONL handles everything splittably."""
    from mcp_iceberg_duckdb_spark.sources import files as fsrc

    safe = [
        (1, "plain", 1.0), (2, "comma,inside", 2.0),
        (3, 'quote"inside', 3.0), (5, None, 5.0),
        (7, "unicode żółw", 7.0), (9, "tab\tinside", 9.0),
    ]
    schema = "k bigint, s string, v double"
    df = spark.createDataFrame(safe, schema)
    p = str(tmp_path / "safe_csv")
    fsrc.write_csv(df, p)
    got = sorted(
        tuple(r) for r in fsrc.read_csv(spark, p, schema=schema).collect()
    )
    assert got == sorted(safe)
    hostile = safe + [(4, "newline\ninside", 4.0)]
    df2 = spark.createDataFrame(hostile, schema)
    p2 = str(tmp_path / "nl_csv")
    fsrc.write_csv(df2, p2)
    with pytest.raises(Exception, match="FAILED_READ_FILE|Malformed"):
        fsrc.read_csv(spark, p2, schema=schema).collect()  # LOUD
    got2 = sorted(
        tuple(r)
        for r in fsrc.read_csv(
            spark, p2, schema=schema, multiLine="true"
        ).collect()
    )
    assert got2 == sorted(hostile)
    # JSONL: splittable AND newline-safe
    p3 = str(tmp_path / "nl_jsonl")
    fsrc.write_jsonl(df2, p3)
    got3 = sorted(
        tuple(r)
        for r in fsrc.read_jsonl(spark, p3, schema=schema).collect()
    )
    assert got3 == sorted(hostile)
