"""The Iceberg DSv2 path is jar-gated in this container — test what
CAN run without the runtime: the session conf a deployment would use
(catalog plugin + SQL extensions, REST/hadoop variants) and the
classpath probe degrading gracefully to False instead of raising."""

from __future__ import annotations

from mcp_iceberg_duckdb_spark.sources.iceberg import (
    ICEBERG_CATALOG_IMPL,
    ICEBERG_EXTENSIONS,
    configure_catalog,
    iceberg_available,
)


def test_configure_catalog_rest():
    conf = configure_catalog(
        "lake", "rest", uri="http://catalog:8181", warehouse="s3://wh"
    )
    assert conf["spark.sql.extensions"] == ICEBERG_EXTENSIONS
    assert conf["spark.sql.catalog.lake"] == ICEBERG_CATALOG_IMPL
    assert conf["spark.sql.catalog.lake.type"] == "rest"
    assert conf["spark.sql.catalog.lake.uri"] == "http://catalog:8181"
    assert conf["spark.sql.catalog.lake.warehouse"] == "s3://wh"


def test_configure_catalog_hadoop_minimal():
    conf = configure_catalog("ice", "hadoop", warehouse="/tmp/wh")
    assert conf["spark.sql.catalog.ice.type"] == "hadoop"
    assert "spark.sql.catalog.ice.uri" not in conf


def test_probe_is_false_without_jar_and_never_raises(spark):
    assert iceberg_available(spark) is False
