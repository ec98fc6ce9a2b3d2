"""Temporal/range join operators — capabilities absent from the
reference (SURVEY.md §2.3 J3: "range/as-of/interval joins absent")
and from Spark's built-in join kinds; implemented as compositions of
DataFrame ops per the preference order (composition > pandas-UDF >
mapPartitions).

As-of join (the kdb/pandas merge_asof semantic): for each left row,
the single most recent right row at-or-before its timestamp, per key.
Implemented with the union + last-non-null-over-window trick:

    tag both sides, union, sort by (key, ts, side), then
    last(right_value, ignorenulls) over the ordered window

— one shuffle on the key, no per-row probing, no skew beyond the
key's own distribution. This is the shape that scales: a naive
implementation (non-equi join + windowed min) materializes the full
interval cross product first.

DuckDB has native ASOF JOIN, which makes a perfect differential
oracle for our composition.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import t
from mcp_iceberg_duckdb_spark.registry import query


@query(
    "j_asof",
    oracle="""
    WITH views AS (
        SELECT user_id, ts AS view_ts, event_id AS view_event, value AS view_value
        FROM events WHERE event_type = 'view'
    ),
    purchases AS (
        SELECT user_id, ts AS buy_ts, event_id AS buy_event, value AS buy_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.buy_event, p.buy_ts, v.view_ts AS asof_view_ts
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.view_ts <= p.buy_ts
    """,
    tags=("join", "temporal"),
)
def j_asof(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent
    view at-or-before it (NULL if none). Union + last-ignorenulls
    window — one shuffle on user_id. Oracle: DuckDB's native
    ASOF LEFT JOIN."""
    e = t(spark, sf_dir).events
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("eid"),
        F.lit(0).alias("side"),  # views sort before a same-ts purchase
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("eid"),
        F.lit(1).alias("side"),
    )
    unioned = views.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ets", "side", "eid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    view_ts = F.when(F.col("side") == 0, F.col("ets"))
    enriched = unioned.withColumn(
        "asof_view_ts", F.last(view_ts, ignorenulls=True).over(w)
    )
    return enriched.filter(F.col("side") == 1).select(
        "user_id",
        F.col("eid").alias("buy_event"),
        F.col("ets").alias("buy_ts"),
        "asof_view_ts",
    )


@query(
    "j_range_band",
    oracle="""
    WITH tiers AS (
        SELECT * FROM (VALUES
            ('tiny',    0.0,  10.0),
            ('small',  10.0,  25.0),
            ('medium', 25.0,  40.0),
            ('large',  40.0, 1e9)
        ) AS t(tier, lo, hi)
    )
    SELECT l_orderkey, l_linenumber, tier
    FROM lineitem JOIN tiers
      ON l_quantity >= lo AND l_quantity < hi
    """,
    tags=("join", "temporal"),
)
def j_range_band(spark, sf_dir):
    """Range (band) join against a tiny tier table: broadcast
    nested-loop with a range predicate — correct pattern when one
    side is literal-sized. For two large sides the scale path is
    bucketizing the range key to turn it into an equi-join."""
    li = t(spark, sf_dir).lineitem
    tiers = spark.createDataFrame(
        [
            ("tiny", 0.0, 10.0),
            ("small", 10.0, 25.0),
            ("medium", 25.0, 40.0),
            ("large", 40.0, 1e9),
        ],
        "tier STRING, lo DOUBLE, hi DOUBLE",
    )
    return li.join(
        F.broadcast(tiers),
        (li.l_quantity >= tiers.lo) & (li.l_quantity < tiers.hi),
    ).select("l_orderkey", "l_linenumber", "tier")


@query(
    "j_range_bucketized",
    oracle="""
    SELECT e1.event_id AS ev_a, e2.event_id AS ev_b
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
     AND e1.event_type = 'click' AND e2.event_type = 'purchase'
    """,
    tags=("join", "temporal"),
)
def j_range_bucketized(spark, sf_dir):
    """Interval self-join at scale: purchases within 5 minutes after
    a click, same user. Implemented as the bucketized pattern — join
    on (user, 5-min bucket) for the event's bucket and its successor,
    then filter the exact interval. Turns a non-equi time join into
    an equi-join + residual, which shuffles instead of nested-looping.
    """
    e = t(spark, sf_dir).events
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("ev_a"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("ts_a"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("ev_b"),
        F.col("user_id").alias("u2"),
        F.col("ts").alias("ts_b"),
    )
    bucket_a = F.expr("unix_timestamp(CAST(ts_a AS TIMESTAMP)) div 300")
    bucket_b = F.expr("unix_timestamp(CAST(ts_b AS TIMESTAMP)) div 300")
    # each click probes its own bucket and the next one
    clicks_b = clicks.withColumn("bkt", F.explode(F.array(bucket_a, bucket_a + 1)))
    purchases_b = purchases.withColumn("bkt2", bucket_b)
    return (
        clicks_b.join(
            purchases_b,
            (F.col("u") == F.col("u2")) & (F.col("bkt") == F.col("bkt2")),
        )
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTE"))
        )
        .select("ev_a", "ev_b")
        .distinct()
    )
