"""Timestamptz ingestion parity (VERDICT round-1 "What's missing" #4).

The reference coerces tz-aware ISO strings on INSERT
(IcebergConnection.py:163-166). The engine pins the session timezone
to UTC (session.py), so a tz-aware string must normalize to the same
UTC instant DuckDB's TIMESTAMPTZ produces — including offsets, Z
suffix, and a DST-less round trip through a real table write.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

ISO_STRINGS = [
    "2024-03-01T10:00:00+05:30",
    "2024-02-29T23:59:59-08:00",
    "2024-01-01T00:00:00Z",
    "2024-06-15T12:00:00+00:00",
    "2024-12-31T18:45:30+14:00",
]


def _duck_utc_instants():
    con = duckdb.connect()
    con.sql("SET TimeZone = 'UTC'")
    return [
        con.sql(
            "SELECT CAST(CAST(? AS TIMESTAMPTZ) AS TIMESTAMP)", params=[s]
        ).fetchone()[0]
        for s in ISO_STRINGS
    ]


def test_tz_aware_cast_normalizes_to_utc(spark):
    got = [
        r.ts
        for r in spark.createDataFrame([(s,) for s in ISO_STRINGS], "iso string")
        .select(F.col("iso").cast("timestamp").alias("ts"))
        .collect()
    ]
    assert got == _duck_utc_instants(), got


def test_tz_aware_insert_round_trips_through_table(spark, tmp_path):
    """INSERT tz-aware literals into a real table, read back: the
    stored instants must be the UTC normalizations."""
    from mcp_iceberg_duckdb_spark import ddl

    name = "tz_round_trip"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    ddl.create_table(spark, name, "id INT, ts TIMESTAMP")
    values = ", ".join(
        f"({i}, CAST('{s}' AS TIMESTAMP))" for i, s in enumerate(ISO_STRINGS)
    )
    ddl.insert_rows(spark, name, values)
    got = {
        r.id: r.ts for r in spark.table(name).select("id", "ts").collect()
    }
    want = dict(enumerate(_duck_utc_instants()))
    spark.sql(f"DROP TABLE {name}")
    assert got == want
