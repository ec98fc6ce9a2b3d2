"""The Iceberg DSv2 path is jar-gated in this container — test what
CAN run without the runtime: the session conf a deployment would use
(catalog plugin + SQL extensions, REST/hadoop variants) and the
classpath probe degrading gracefully to False instead of raising."""

from __future__ import annotations

from mcp_iceberg_duckdb_spark.sources.iceberg import (
    ICEBERG_CATALOG_IMPL,
    ICEBERG_EXTENSIONS,
    configure_catalog,
    from_env,
    hadoop_fs_conf,
    iceberg_available,
    load_dotenv_file,
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


def test_from_env_reads_reference_style_variables():
    """Deployment parity: the exact PyIceberg env-var family the
    reference's catalog reads (README.md:37-38 → PyIceberg env
    configuration) produces the full Spark catalog conf — including
    the __-nesting and underscore→dash prop normalization."""
    env = {
        "PYICEBERG_CATALOG__ICEBERG__URI": "http://catalog:8181",
        "PYICEBERG_CATALOG__ICEBERG__WAREHOUSE": "s3://wh",
        "PYICEBERG_CATALOG__ICEBERG__S3__ACCESS_KEY_ID": "ak",
        "PYICEBERG_CATALOG__ICEBERG__S3__SECRET_ACCESS_KEY": "sk",
        "PYICEBERG_CATALOG__ICEBERG__S3__ENDPOINT": "http://minio:9000",
        "PYICEBERG_CATALOG__OTHER__URI": "http://elsewhere",  # wrong catalog
        "UNRELATED": "x",
    }
    conf = from_env("iceberg", env=env)
    assert conf["spark.sql.extensions"] == ICEBERG_EXTENSIONS
    assert conf["spark.sql.catalog.iceberg"] == ICEBERG_CATALOG_IMPL
    assert conf["spark.sql.catalog.iceberg.type"] == "rest"  # reference default
    assert conf["spark.sql.catalog.iceberg.uri"] == "http://catalog:8181"
    assert conf["spark.sql.catalog.iceberg.warehouse"] == "s3://wh"
    assert conf["spark.sql.catalog.iceberg.s3.access-key-id"] == "ak"
    assert conf["spark.sql.catalog.iceberg.s3.secret-access-key"] == "sk"
    assert conf["spark.sql.catalog.iceberg.s3.endpoint"] == "http://minio:9000"
    assert "http://elsewhere" not in conf.values()


def test_from_env_type_override_and_dotenv(tmp_path):
    """.env file parsing (the reference ships python-dotenv) with the
    real environment taking precedence, and an explicit type beating
    the rest default."""
    p = tmp_path / ".env"
    p.write_text(
        "# lake connection\n"
        "export PYICEBERG_CATALOG__ICEBERG__TYPE='hive'\n"
        'PYICEBERG_CATALOG__ICEBERG__URI="thrift://meta:9083"\n'
        "PYICEBERG_CATALOG__ICEBERG__WAREHOUSE=s3://wh\n"
        "\n"
        "not a kv line\n"
    )
    parsed = load_dotenv_file(p)
    assert parsed["PYICEBERG_CATALOG__ICEBERG__TYPE"] == "hive"
    conf = from_env(
        "iceberg",
        env={"PYICEBERG_CATALOG__ICEBERG__WAREHOUSE": "s3://override"},
        dotenv_path=p,
    )
    assert conf["spark.sql.catalog.iceberg.type"] == "hive"
    assert conf["spark.sql.catalog.iceberg.uri"] == "thrift://meta:9083"
    # real env var beats the .env value, matching dotenv semantics
    assert conf["spark.sql.catalog.iceberg.warehouse"] == "s3://override"


def test_hadoop_fs_conf_mapping():
    conf = from_env(
        "iceberg",
        env={
            "PYICEBERG_CATALOG__ICEBERG__S3__ACCESS_KEY_ID": "ak",
            "PYICEBERG_CATALOG__ICEBERG__S3__SECRET_ACCESS_KEY": "sk",
            "PYICEBERG_CATALOG__ICEBERG__S3__PATH_STYLE_ACCESS": "true",
            "PYICEBERG_CATALOG__ICEBERG__URI": "http://catalog:8181",
        },
    )
    fs = hadoop_fs_conf(conf)
    assert fs == {
        "spark.hadoop.fs.s3a.access.key": "ak",
        "spark.hadoop.fs.s3a.secret.key": "sk",
        "spark.hadoop.fs.s3a.path.style.access": "true",
    }
