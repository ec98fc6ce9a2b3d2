"""Vendored Iceberg filesystem tables (sources/iceberg_fs.py) and the
Avro object-container codec under them (sources/avro_io.py): value
round-trips, manifest-level pruning, snapshot time travel, and
corrupt-input contracts — all with zero Iceberg/Avro dependencies."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.sources import iceberg_fs as ice
from mcp_iceberg_duckdb_spark.sources.avro_io import (
    read_container,
    write_container,
)
from mcp_iceberg_duckdb_spark.sources.tables import load

_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"], "default": None},
        {"name": "b", "type": ["null", "bytes"], "default": None},
        {"name": "m", "type": ["null", {"type": "map", "values": "bytes"}], "default": None},
        {"name": "a", "type": {"type": "array", "items": "double"}},
        {"name": "f", "type": "boolean"},
    ],
}
_RECS = [
    {"k": 0, "s": "x", "b": b"\x00\xff", "m": {"1": b"a"}, "a": [1.5], "f": True},
    {"k": -(2**62), "s": None, "b": None, "m": None, "a": [], "f": False},
    {"k": 2**62, "s": "", "b": b"", "m": {}, "a": [-0.25, 3.5], "f": True},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_container_roundtrip(codec):
    schema, recs = read_container(write_container(_SCHEMA, _RECS, codec))
    assert recs == _RECS
    assert schema["name"] == "t"


def test_avro_zigzag_edge_ints():
    sch = {"type": "record", "name": "z", "fields": [{"name": "v", "type": "long"}]}
    vals = [{"v": v} for v in (0, -1, 1, 63, -64, 64, -65, 2**63 - 1, -(2**63))]
    assert read_container(write_container(sch, vals))[1] == vals


def test_avro_corrupt_inputs_raise():
    blob = write_container(_SCHEMA, _RECS)
    with pytest.raises(ValueError):
        read_container(b"NOPE" + blob[4:])
    # flip a sync byte
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError):
        read_container(bytes(bad))


def test_avro_truncation_contract():
    """Any cut either raises ValueError or yields a clean record
    prefix (a container is block-framed; a cut exactly at a block
    boundary is a shorter valid file)."""
    blob = write_container(_SCHEMA, _RECS, codec="null")
    for cut in range(1, len(blob) - 1):
        try:
            _, recs = read_container(blob[:cut])
        except ValueError:
            continue
        assert recs == _RECS[: len(recs)]


def test_avro_union_and_named_ref():
    sch = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "x", "type": {"type": "record", "name": "inner",
                                   "fields": [{"name": "v", "type": "int"}]}},
            {"name": "y", "type": ["null", "inner"], "default": None},
        ],
    }
    recs = [{"x": {"v": 1}, "y": {"v": 2}}, {"x": {"v": 3}, "y": None}]
    assert read_container(write_container(sch, recs))[1] == recs


@pytest.fixture(scope="module")
def orders_table(spark, sf_dir, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("ice") / "orders_tbl")
    shutil.rmtree(loc, ignore_errors=True)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    schema = ice.spark_schema_to_iceberg(orders)
    ice.create_table(loc, schema, part_cols=["o_orderpriority"])
    snap1 = ice.append(spark, loc, orders)
    return loc, orders, snap1


def test_iceberg_roundtrip_values(spark, sf_dir, orders_table):
    loc, orders, _ = orders_table
    got = {
        tuple(r)
        for r in ice.read_iceberg(spark, loc)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .collect()
    }
    want = {
        tuple(r)
        for r in orders.select(
            "o_orderkey", "o_custkey", "o_orderpriority"
        ).collect()
    }
    assert got == want


def test_iceberg_partition_pruning(spark, sf_dir, orders_table):
    loc, orders, _ = orders_table
    all_files, total = ice.plan_files(loc)
    assert len(all_files) == total >= 5  # one file per priority
    pruned, _ = ice.plan_files(
        loc, filters=[("o_orderpriority", "=", "1-URGENT")]
    )
    assert len(pruned) < len(all_files)
    got = ice.read_iceberg(
        spark, loc, filters=[("o_orderpriority", "=", "1-URGENT")]
    ).count()
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert got == want


def test_iceberg_bounds_pruning(spark, sf_dir, orders_table):
    loc, _, _ = orders_table
    # impossible predicate: bounds prove no file can match
    none_files, _ = ice.plan_files(loc, filters=[("o_orderkey", "<", -5)])
    assert none_files == []
    # satisfiable predicate keeps files and values match the filter
    some, _ = ice.plan_files(loc, filters=[("o_orderkey", ">=", 8)])
    assert some


def test_iceberg_residual_filter_pushed_down(spark, sf_dir, orders_table):
    from mcp_iceberg_duckdb_spark.plans import explain_str

    loc, _, _ = orders_table
    df = ice.read_iceberg(spark, loc, filters=[("o_orderkey", ">=", 8)])
    plan = explain_str(df)
    assert "PushedFilters: [" in plan and "o_orderkey" in plan


def test_iceberg_snapshot_time_travel(spark, sf_dir, orders_table):
    loc, orders, snap1 = orders_table
    n1 = orders.count()
    ice.append(spark, loc, orders.limit(7))
    assert ice.read_iceberg(spark, loc).count() == n1 + 7
    assert (
        ice.read_iceberg(spark, loc, snapshot_id=snap1["snapshot-id"]).count()
        == n1
    )
    meta = ice.read_table_meta(loc)
    assert len(meta["snapshots"]) == 2
    assert meta["snapshots"][1]["parent-snapshot-id"] == snap1["snapshot-id"]


def test_iceberg_copy_on_write_delete(spark, sf_dir, tmp_path):
    """DELETE WHERE pred: only manifest-candidate files get
    rewritten; survivors carry EXISTING entries; replaced files stay
    time-travelable; values equal the source minus exact matches."""
    loc = str(tmp_path / "del_tbl")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    ice.create_table(
        loc, ice.spark_schema_to_iceberg(orders), part_cols=["o_orderpriority"]
    )
    snap1 = ice.append(spark, loc, orders)
    pre_files, _ = ice.plan_files(loc)
    median_key = orders.approxQuantile("o_custkey", [0.5], 0)[0]
    filters = [("o_orderpriority", "=", "3-MEDIUM"), ("o_custkey", "<", int(median_key))]
    snap2 = ice.delete_where(spark, loc, filters)
    assert snap2["summary"]["operation"] == "overwrite"
    # exactly the one affected partition was rewritten
    assert snap2["summary"]["deleted-data-files"] == "1"
    got = {
        tuple(r)
        for r in ice.read_iceberg(spark, loc).select("o_orderkey").collect()
    }
    want = {
        tuple(r)
        for r in orders.filter(
            ~(
                (F.col("o_orderpriority") == "3-MEDIUM")
                & (F.col("o_custkey") < int(median_key))
            )
        )
        .select("o_orderkey")
        .collect()
    }
    assert got == want
    # partial delete: the partition still has rows (rewrite, not drop)
    remaining = (
        ice.read_iceberg(
            spark, loc, filters=[("o_orderpriority", "=", "3-MEDIUM")]
        ).count()
    )
    assert 0 < remaining < orders.filter(
        F.col("o_orderpriority") == "3-MEDIUM"
    ).count()
    # pre-delete snapshot still reads the full table
    assert (
        ice.read_iceberg(spark, loc, snapshot_id=snap1["snapshot-id"]).count()
        == orders.count()
    )
    post_files, _ = ice.plan_files(loc)
    assert len(post_files) == len(pre_files)  # 4 untouched + 1 rewrite


def test_iceberg_unknown_snapshot_and_column_raise(spark, sf_dir, orders_table):
    loc, _, _ = orders_table
    with pytest.raises(ValueError, match="snapshot"):
        ice.plan_files(loc, snapshot_id=42)
    with pytest.raises(ValueError, match="unknown column"):
        ice.plan_files(loc, filters=[("nope", "=", 1)])


def test_iceberg_copy_on_write_update(spark, sf_dir, tmp_path):
    """UPDATE SET col=expr WHERE pred: matched rows change exactly as
    assigned, everything else byte-identical; partition-column
    updates are rejected."""
    loc = str(tmp_path / "upd_tbl")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    ice.create_table(
        loc, ice.spark_schema_to_iceberg(orders), part_cols=["o_orderpriority"]
    )
    ice.append(spark, loc, orders)
    filters = [("o_orderpriority", "=", "2-HIGH"), ("o_custkey", "<", 75)]
    snap = ice.update_where(
        spark, loc, filters, {"o_totalprice": F.col("o_totalprice") + 1000.0}
    )
    assert snap["summary"]["operation"] == "overwrite"
    cond = (F.col("o_orderpriority") == "2-HIGH") & (F.col("o_custkey") < 75)
    exp = orders.withColumn(
        "o_totalprice",
        F.when(cond, F.col("o_totalprice") + 1000.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    got = {tuple(r) for r in ice.read_iceberg(spark, loc).collect()}
    want = {tuple(r) for r in exp.collect()}
    assert got == want
    with pytest.raises(ValueError, match="partition columns"):
        ice.update_where(spark, loc, filters, {"o_orderpriority": "X"})
