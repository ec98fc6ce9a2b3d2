"""Partitioned writes + partition pruning — the reference's roadmap
item "partitioned CREATE" (README.md:117) and the scan behavior that
matters most at 100 TB: a filtered read must touch only matching
partitions (PartitionFilters), and bucketed layouts must co-locate
join keys."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mcp_iceberg_duckdb_spark.plans.inspect import explain_str
from mcp_iceberg_duckdb_spark.sources.tables import load


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part") / "events_by_day")
    events = load(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    events.write.mode("overwrite").partitionBy("day").parquet(out)
    return out


def test_partition_pruning(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        F.col("day") == "2024-01-05"
    )
    plan = explain_str(df)
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "day filter must prune partitions, not scan all"
    # and the data actually comes back right
    days = {r.day.isoformat() for r in df.select("day").distinct().collect()}
    assert days == {"2024-01-05"}


def test_partitioned_create_table(spark):
    """CREATE TABLE ... PARTITIONED BY through SQL (reference roadmap)."""
    spark.sql("DROP TABLE IF EXISTS part_tbl")
    try:
        spark.sql(
            "CREATE TABLE part_tbl (id BIGINT, v DOUBLE, dt STRING) "
            "USING parquet PARTITIONED BY (dt)"
        )
        spark.sql(
            "INSERT INTO part_tbl VALUES (1, 1.0, '2024-01-01'), (2, 2.0, '2024-01-02')"
        )
        got = spark.sql(
            "SELECT id FROM part_tbl WHERE dt = '2024-01-02'"
        ).collect()
        assert [r.id for r in got] == [2]
        parts = spark.sql("SHOW PARTITIONS part_tbl").collect()
        assert len(parts) == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS part_tbl")


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Bucketing both join sides on the key removes the join
    exchanges entirely — the co-located join layout for repeated
    large⋈large joins."""
    import shutil

    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a stale warehouse dir (e.g. from a killed session) blocks
        # managed-table creation even after DROP
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{name}", ignore_errors=True)
    try:
        load(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).saveAsTable("b_orders")
        load(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).saveAsTable("b_lineitem")
        # disable auto-broadcast: at fixture scale Catalyst would
        # broadcast the small side and skip the bucketed path we're
        # asserting (at real scale both sides are too big to ship)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = explain_str(joined, mode="simple")
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, "bucketed join must not shuffle"
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        for name in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_multi_file_table_reads_like_single(spark, sf_dir, tmp_path):
    """A table split across many parquet files (the only layout that
    exists at 100 TB) must read identically to the single-file
    fixture, with filters still pushed."""
    from mcp_iceberg_duckdb_spark.plans.inspect import has_pushed_filters

    out = str(tmp_path / "li_many")
    li = load(spark, sf_dir, "lineitem")
    li.repartition(16).write.mode("overwrite").parquet(out)
    many = spark.read.schema(li.schema).parquet(out)
    assert len(many.inputFiles()) >= 16
    assert many.count() == li.count()
    filtered = many.filter(F.col("l_quantity") > 45.0).select("l_orderkey")
    assert has_pushed_filters(filtered)
    assert (
        filtered.count()
        == li.filter(F.col("l_quantity") > 45.0).count()
    )


def test_repartition_colocates_write(spark, sf_dir, tmp_path):
    """repartitionByRange → sorted, range-partitioned output files
    (the layout that makes downstream range predicates prune)."""
    out = str(tmp_path / "li_range")
    li = load(spark, sf_dir, "lineitem")
    li.repartitionByRange(4, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert len(back.inputFiles()) >= 4
