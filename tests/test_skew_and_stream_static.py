"""Tests for the skew utilities (salted join/aggregate must equal the
unsalted results) and the stream-static join."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from mcp_iceberg_duckdb_spark.functions.skew import salted_count, salted_join
from mcp_iceberg_duckdb_spark.sources.tables import load
from mcp_iceberg_duckdb_spark.streaming.events import (
    read_event_stream,
    run_stream_to_memory,
    stream_static_enriched,
)


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_custkey"
    )
    salted = salted_join(
        li, orders, li.l_orderkey == orders.o_orderkey, n_salts=4
    ).select("l_orderkey", "l_linenumber", "o_custkey")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_outer(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    plain = c.join(orders, c.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "o_orderkey"
    )
    salted = salted_join(
        c, orders, c.c_custkey == orders.o_custkey, n_salts=4, how="left"
    ).select("c_custkey", "o_orderkey")
    assert sorted(
        map(tuple, salted.collect()), key=str
    ) == sorted(map(tuple, plain.collect()), key=str)


def test_salted_count_matches_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag): r.n
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        r.l_returnflag: r.n
        for r in salted_count(li, "l_returnflag", n_salts=4).collect()
    }
    assert salted == plain


def test_stream_static_join(spark, sf_dir):
    from mcp_iceberg_duckdb_spark import registry

    registry.load_all()
    funnel = registry.QUERIES["s_event_funnel"].builder(spark, sf_dir)
    events_path = os.path.join(sf_dir, "events.parquet")
    out = run_stream_to_memory(
        spark,
        stream_static_enriched(read_event_stream(spark, events_path), funnel),
        "t_enriched",
    )
    batch_events = load(spark, sf_dir, "events")
    assert out.count() == batch_events.count()
    # purchasers got their profile attached; non-purchasers got null
    enriched = out.filter(F.col("user_purchases").isNotNull())
    purchasers = {r.user_id for r in funnel.collect()}
    assert {r.user_id for r in enriched.select("user_id").distinct().collect()} == purchasers
