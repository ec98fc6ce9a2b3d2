"""The layout gate inside operators/_util.parallelize (round 14):
repartition fires ONLY when the file source cannot split into enough
independently-readable units (parquet row groups) to fill the
cluster. On production-shaped input (many row groups) the helper is
the identity — no exchange, plan unchanged — so every call site's
"extra exchange" exists only where the scan is otherwise one task."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from mcp_iceberg_duckdb_spark.operators._util import parallelize


def _shuffles(df) -> int:
    from mcp_iceberg_duckdb_spark.plans.inspect import shuffle_count

    return shuffle_count(df)


def test_single_row_group_scan_is_spread(spark, tmp_path):
    p = tmp_path / "one_rg.parquet"
    pq.write_table(pa.table({"x": list(range(10_000))}), p)
    assert pq.ParquetFile(p).metadata.num_row_groups == 1
    df = spark.read.parquet(str(p))
    out = parallelize(df)
    assert _shuffles(out) == _shuffles(df) + 1, (
        "a one-row-group file is one scan task; parallelize must "
        "round-robin it across the cluster"
    )
    assert out.count() == 10_000


def test_splittable_scan_is_left_unchanged(spark, tmp_path):
    # Round 15 (ADVICE r14 medium): the gate now estimates the PLANNED
    # partition count — Spark sizes file partitions by bytes
    # (maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    # total/parallelism)), files packed into splits), capped by row
    # groups — so "splittable" needs BOTH many row groups AND enough
    # bytes per the session's split sizing. The previous fixture
    # (10k rows, 32 row groups, ~80 KB) actually planned as a 1-task
    # scan; this one is genuinely multi-split under the confs it pins.
    p = tmp_path / "many_rg.parquet"
    n_rg = max(spark.sparkContext.defaultParallelism, 8)
    n_rows = 200_000
    pq.write_table(
        pa.table({"x": list(range(n_rows))}),
        p,
        row_group_size=max(n_rows // n_rg, 1),
    )
    assert pq.ParquetFile(p).metadata.num_row_groups >= n_rg
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.files.openCostInBytes",
        )
    }
    try:
        conf.set("spark.sql.files.maxPartitionBytes", "65536")
        conf.set("spark.sql.files.openCostInBytes", "0")
        df = spark.read.parquet(str(p))
        out = parallelize(df)
        assert _shuffles(out) == _shuffles(df), (
            "input already splits into >= parallelism/2 byte-sized "
            "row-group-backed splits; the gate must return the plan "
            "unchanged (production no-op)"
        )
        assert out.count() == n_rows
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_small_many_row_group_scan_is_spread(spark, tmp_path):
    # the ADVICE r14 falsifier: many row groups but few BYTES — Spark
    # plans this as a 1-2 task scan, so the gate must spread it
    p = tmp_path / "small_many_rg.parquet"
    n_rg = spark.sparkContext.defaultParallelism
    pq.write_table(
        pa.table({"x": list(range(10_000))}),
        p,
        row_group_size=max(10_000 // n_rg, 1),
    )
    assert pq.ParquetFile(p).metadata.num_row_groups >= n_rg
    df = spark.read.parquet(str(p))
    out = parallelize(df)
    assert _shuffles(out) == _shuffles(df) + 1, (
        "an ~80 KB file is a 1-task scan no matter how many row "
        "groups it has; the byte-aware gate must round-robin it"
    )
    assert out.count() == 10_000


def test_non_file_source_still_spreads(spark):
    # createDataFrame has no file source; the gate cannot prove the
    # input splits, so it keeps today's behavior (repartition)
    df = spark.createDataFrame([(i,) for i in range(100)], "x int")
    out = parallelize(df)
    assert _shuffles(out) == _shuffles(df) + 1
