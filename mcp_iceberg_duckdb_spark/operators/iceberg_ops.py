"""Iceberg-table queries over the vendored filesystem implementation
(sources/iceberg_fs.py) — the no-jar path that makes the reference's
core surface (SQL over Iceberg tables, IcebergConnection.py:107-177)
actually executable in this container, with the manifest-level
pruning the reference's full-download design lacks.

The query materializes a real Iceberg v1 table (metadata JSON + Avro
manifest list + Avro manifests + partitioned parquet) from the
orders fixture, then answers an aggregate through the Iceberg scan
path: snapshot -> manifest pruning (identity partition values +
column bounds) -> spark.read over the surviving files. The oracle is
the same aggregate straight off the source parquet — equality proves
the whole table round-trip (write, commit, manifest stats, pruning,
read) loses and invents nothing.

At 100 TB: pruning happens on manifest metadata (KBs per thousands
of files) before Spark lists a single data file; the residual filter
still reaches the parquet scan as PushedFilters for row-group
pruning. Tests: tests/test_iceberg_fs.py (pruning counts, time
travel, Avro fuzz)."""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import dec_sum, t
from mcp_iceberg_duckdb_spark.registry import query

_FILTERS = (
    ("o_orderpriority", "=", "1-URGENT"),  # identity-partition prune
    ("o_orderkey", ">=", 16),  # column-bounds prune
)


def iceberg_orders_table(spark, sf_dir: str) -> str:
    """Materialize (once per sf fixture) the orders columns this
    container's Iceberg types cover as a partitioned Iceberg v1
    table under /tmp; reuse when the marker says it was built from
    the same fixture."""
    from mcp_iceberg_duckdb_spark.sources import iceberg_fs as ice

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    loc = f"/tmp/spark_graft_iceberg_orders_{key}"
    marker = os.path.join(loc, "fixture.json")
    try:
        with open(marker) as fh:
            if json.load(fh)["sf_dir"] == sf_dir:
                return loc
    except (OSError, ValueError, KeyError):
        pass
    shutil.rmtree(loc, ignore_errors=True)
    orders = t(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    schema = ice.spark_schema_to_iceberg(orders)
    ice.create_table(loc, schema, part_cols=["o_orderpriority"])
    ice.append(spark, loc, orders)
    with open(marker, "w") as fh:
        json.dump({"sf_dir": sf_dir}, fh)
    return loc


@query(
    "x_iceberg_fs_scan",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_price,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_orderkey >= 16
    GROUP BY o_orderpriority
    """,
    tags=("source", "iceberg", "tierx"),
)
def x_iceberg_fs_scan(spark, sf_dir):
    """Aggregate over a REAL Iceberg table via the vendored scan
    path: the orders fixture committed as a partitioned Iceberg v1
    table (metadata JSON + Avro manifests, sources/iceberg_fs.py),
    read back through snapshot resolution + manifest pruning — the
    partition predicate eliminates 4/5 partitions at the MANIFEST
    level (no file listed, no byte read) and the key predicate
    prunes on stored column bounds; the oracle aggregates the source
    parquet directly, so any loss/invention in the write-commit-scan
    loop breaks value parity. Cites the reference's
    IcebergConnection.py full-scan design as the contrast."""
    from mcp_iceberg_duckdb_spark.sources.iceberg_fs import read_iceberg

    loc = iceberg_orders_table(spark, sf_dir)
    df = read_iceberg(spark, loc, filters=_FILTERS)
    return df.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        dec_sum(F.col("o_totalprice")).alias("sum_price"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
        F.max("o_orderkey").cast("bigint").alias("max_key"),
    )


_DEL_FILTERS = (
    ("o_orderpriority", "=", "5-LOW"),
    ("o_custkey", "<", 64),
)


@query(
    "x_iceberg_fs_delete",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_price
    FROM orders
    WHERE NOT (o_orderpriority = '5-LOW' AND o_custkey < 64)
    GROUP BY o_orderpriority
    """,
    tags=("source", "iceberg", "dml", "tierx"),
)
def x_iceberg_fs_delete(spark, sf_dir):
    """Copy-on-write DELETE on a real Iceberg table, verified through
    the surviving rows: build the orders table (own location — this
    query mutates), DELETE WHERE priority='5-LOW' AND custkey<64 via
    sources/iceberg_fs.delete_where (manifest pruning bounds the
    rewrite to the one affected partition; the other four files
    survive as EXISTING entries, the replaced file is recorded
    DELETED and stays time-travelable), then aggregate the table.
    Oracle: the same aggregate over the source parquet with the
    predicate negated — parity proves the rewrite removed exactly
    the matching rows. Mirrors the reference's DELETE surface
    (QueryManager routes DML to DuckDB; here it is a real Iceberg
    overwrite snapshot)."""
    import hashlib as _hashlib
    import json as _json

    from mcp_iceberg_duckdb_spark.sources import iceberg_fs as ice

    key = _hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    loc = f"/tmp/spark_graft_iceberg_del_{key}"
    marker = os.path.join(loc, "fixture.json")
    built = False
    try:
        with open(marker) as fh:
            built = _json.load(fh)["sf_dir"] == sf_dir
    except (OSError, ValueError, KeyError):
        pass
    if not built:
        shutil.rmtree(loc, ignore_errors=True)
        orders = t(spark, sf_dir).orders.select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        )
        ice.create_table(
            loc,
            ice.spark_schema_to_iceberg(orders),
            part_cols=["o_orderpriority"],
        )
        ice.append(spark, loc, orders)
        ice.delete_where(spark, loc, list(_DEL_FILTERS))
        with open(marker, "w") as fh:
            _json.dump({"sf_dir": sf_dir}, fh)
    df = ice.read_iceberg(spark, loc)
    return df.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        dec_sum(F.col("o_totalprice")).alias("sum_price"),
    )


@query(
    "x_iceberg_fs_timetravel",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders
    """,
    tags=("source", "iceberg", "tierx"),
)
def x_iceberg_fs_timetravel(spark, sf_dir):
    """Snapshot time travel as a first-class query: the DELETE
    table's history still holds the pre-delete snapshot; reading AT
    that snapshot id must reproduce the ORIGINAL table exactly even
    though the current snapshot has rows removed and files rewritten.
    Oracle: the unfiltered aggregate over the source parquet — parity
    proves deleted data remains reachable through the snapshot log
    (the Iceberg property backing reproducible training-data
    lineage). Depends on x_iceberg_fs_delete's builder for the
    mutated table."""
    from mcp_iceberg_duckdb_spark.sources import iceberg_fs as ice

    # ensure the table exists with its delete applied (the builder
    # materializes the table eagerly; no action needed on its result)
    x_iceberg_fs_delete(spark, sf_dir)
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    loc = f"/tmp/spark_graft_iceberg_del_{key}"
    first_snap = ice.read_table_meta(loc)["snapshots"][0]["snapshot-id"]
    df = ice.read_iceberg(spark, loc, snapshot_id=first_snap)
    return df.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
        F.count_distinct("o_orderpriority").cast("bigint").alias(
            "n_priorities"
        ),
    )


@query(
    "x_iceberg_fs_update",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(floor(CAST(sum(CAST(
               CASE WHEN o_orderpriority = '2-HIGH' AND o_custkey < 64
                    THEN o_totalprice + 1000.0
                    ELSE o_totalprice END
           AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("source", "iceberg", "dml", "tierx"),
)
def x_iceberg_fs_update(spark, sf_dir):
    """Copy-on-write UPDATE on a real Iceberg table: build the orders
    table (own mutable location), UPDATE SET totalprice += 1000 WHERE
    priority='2-HIGH' AND custkey<64 via iceberg_fs.update_where
    (pruning bounds the rewrite to the one affected partition; the
    exact +1000.0 double increment is engine-portable), then
    aggregate. Oracle: the same aggregate over source parquet with
    the CASE applied inline — parity proves matched rows changed
    exactly as assigned and nothing else moved. The reference routes
    UPDATE to DuckDB over its full download; here it is a real
    Iceberg overwrite snapshot."""
    import hashlib as _hashlib
    import json as _json

    from mcp_iceberg_duckdb_spark.sources import iceberg_fs as ice

    key = _hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    loc = f"/tmp/spark_graft_iceberg_upd_{key}"
    marker = os.path.join(loc, "fixture.json")
    built = False
    try:
        with open(marker) as fh:
            built = _json.load(fh)["sf_dir"] == sf_dir
    except (OSError, ValueError, KeyError):
        pass
    if not built:
        shutil.rmtree(loc, ignore_errors=True)
        orders = t(spark, sf_dir).orders.select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        )
        ice.create_table(
            loc,
            ice.spark_schema_to_iceberg(orders),
            part_cols=["o_orderpriority"],
        )
        ice.append(spark, loc, orders)
        ice.update_where(
            spark,
            loc,
            [("o_orderpriority", "=", "2-HIGH"), ("o_custkey", "<", 64)],
            {"o_totalprice": F.col("o_totalprice") + 1000.0},
        )
        with open(marker, "w") as fh:
            _json.dump({"sf_dir": sf_dir}, fh)
    df = ice.read_iceberg(spark, loc)
    return df.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        dec_sum(F.col("o_totalprice")).alias("sum_price"),
    )
