"""LIVE Iceberg catalog suite — the reference's core behavior
(IcebergConnection.py:107-177, :223-235: catalog connect, CREATE,
INSERT, SELECT-after-write, and the UPDATE/DELETE/MERGE its README
roadmaps) against a real local hadoop catalog. The runtime jar is
absent from this container, so the whole module is gated on the
classpath probe; when the environment gains the jar these run
unchanged. Conf comes from sources/iceberg.configure_catalog — the
exact dict a deployment passes."""

from __future__ import annotations

import pytest

from mcp_iceberg_duckdb_spark.sources.iceberg import (
    configure_catalog,
    iceberg_available,
)


@pytest.fixture(scope="module")
def ice_spark(spark, tmp_path_factory):
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on the classpath")
    from pyspark.sql import SparkSession

    wh = str(tmp_path_factory.mktemp("ice_wh"))
    builder = SparkSession.builder.master("local[4]").appName("ice-live")
    for k, v in configure_catalog("ice", "hadoop", warehouse=wh).items():
        builder = builder.config(k, v)
    s = builder.getOrCreate()
    yield s


def test_create_insert_select_roundtrip(ice_spark):
    ice_spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.db")
    ice_spark.sql("DROP TABLE IF EXISTS ice.db.t")
    ice_spark.sql(
        "CREATE TABLE ice.db.t (id BIGINT, name STRING, v DOUBLE) "
        "PARTITIONED BY (bucket(4, id))"
    )
    ice_spark.sql(
        "INSERT INTO ice.db.t VALUES (1,'a',1.5),(2,'b',2.5),(3,'c',3.5)"
    )
    got = {r.id: (r.name, r.v) for r in ice_spark.sql(
        "SELECT * FROM ice.db.t").collect()}
    assert got == {1: ("a", 1.5), 2: ("b", 2.5), 3: ("c", 3.5)}


def test_update_delete_merge_native(ice_spark):
    ice_spark.sql("DROP TABLE IF EXISTS ice.db.m")
    ice_spark.sql("CREATE TABLE ice.db.m (id BIGINT, v BIGINT)")
    ice_spark.sql("INSERT INTO ice.db.m VALUES (1,10),(2,20),(3,30)")
    ice_spark.sql("UPDATE ice.db.m SET v = v + 1 WHERE id = 2")
    ice_spark.sql("DELETE FROM ice.db.m WHERE id = 3")
    ice_spark.sql("DROP TABLE IF EXISTS ice.db.chg")
    ice_spark.sql("CREATE TABLE ice.db.chg (id BIGINT, v BIGINT)")
    ice_spark.sql("INSERT INTO ice.db.chg VALUES (1,100),(4,400)")
    ice_spark.sql(
        "MERGE INTO ice.db.m t USING ice.db.chg c ON t.id = c.id "
        "WHEN MATCHED THEN UPDATE SET t.v = c.v "
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (c.id, c.v)"
    )
    got = {r.id: r.v for r in ice_spark.sql("SELECT * FROM ice.db.m").collect()}
    assert got == {1: 100, 2: 21, 4: 400}


def test_snapshot_time_travel(ice_spark):
    ice_spark.sql("DROP TABLE IF EXISTS ice.db.tt")
    ice_spark.sql("CREATE TABLE ice.db.tt (id BIGINT)")
    ice_spark.sql("INSERT INTO ice.db.tt VALUES (1)")
    snap1 = ice_spark.sql(
        "SELECT snapshot_id FROM ice.db.tt.snapshots "
        "ORDER BY committed_at DESC LIMIT 1"
    ).collect()[0].snapshot_id
    ice_spark.sql("INSERT INTO ice.db.tt VALUES (2)")
    now = ice_spark.sql("SELECT count(*) AS n FROM ice.db.tt").collect()[0].n
    then = ice_spark.sql(
        f"SELECT count(*) AS n FROM ice.db.tt VERSION AS OF {snap1}"
    ).collect()[0].n
    assert (then, now) == (1, 2)


def test_schema_evolution_add_column(ice_spark):
    ice_spark.sql("DROP TABLE IF EXISTS ice.db.ev")
    ice_spark.sql("CREATE TABLE ice.db.ev (id BIGINT)")
    ice_spark.sql("INSERT INTO ice.db.ev VALUES (1)")
    ice_spark.sql("ALTER TABLE ice.db.ev ADD COLUMN note STRING")
    ice_spark.sql("INSERT INTO ice.db.ev VALUES (2, 'x')")
    rows = {r.id: r.note for r in ice_spark.sql(
        "SELECT * FROM ice.db.ev").collect()}
    assert rows == {1: None, 2: "x"}
