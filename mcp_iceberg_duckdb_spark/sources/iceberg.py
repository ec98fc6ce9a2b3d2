"""Iceberg DSv2 catalog wiring — the real lake path (SURVEY.md §1.1).

The reference talks to Iceberg through PyIceberg with a full
unfiltered scan per query (IcebergConnection.py:107-117). The Spark
replacement is the Iceberg Spark runtime catalog plugin: scans get
predicate pushdown, column pruning, and hidden-partition pruning from
Iceberg manifests, writes get ACID commits, and UPDATE/DELETE/MERGE
run natively (MoR or CoW per table property).

The runtime jar is not in this container, so everything is gated:
``iceberg_available(spark)`` probes the classpath, and
``configure_catalog`` returns the conf dict a deployment would pass
to the session builder.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"
ICEBERG_EXTENSIONS = (
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
)


def configure_catalog(
    name: str = "iceberg",
    catalog_type: str = "rest",
    uri: str | None = None,
    warehouse: str | None = None,
) -> dict[str, str]:
    """Session conf for an Iceberg catalog named ``name`` — mirrors
    the reference's env-driven REST catalog config (README.md:21-40)
    but through Spark's catalog plugin, giving pushdown instead of
    full scans."""
    conf = {
        "spark.sql.extensions": ICEBERG_EXTENSIONS,
        f"spark.sql.catalog.{name}": ICEBERG_CATALOG_IMPL,
        f"spark.sql.catalog.{name}.type": catalog_type,
    }
    if uri:
        conf[f"spark.sql.catalog.{name}.uri"] = uri
    if warehouse:
        conf[f"spark.sql.catalog.{name}.warehouse"] = warehouse
    return conf


def iceberg_available(spark: SparkSession) -> bool:
    """True if the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CATALOG_IMPL)  # noqa: SLF001
        return True
    except Exception:
        return False
