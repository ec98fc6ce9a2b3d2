"""functions/rank2p property tests: the two-phase broadcast-offset
rank must equal the single-window row_number on the same order, and
ntile_from_rank must equal the engine's ntile, across random data,
bucket widths, partition layouts, and k — these helpers now back
w_cume_percent, w_nth_value_ntile, s_user_rfm, x_pack_context_windows
and the KS/AUC bucket pattern, so a boundary bug here would corrupt
five operators at once."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W

from mcp_iceberg_duckdb_spark.functions.rank2p import (
    broadcast_offset_rank,
    ntile_from_rank,
)


@settings(max_examples=12, deadline=None, derandomize=True)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 3)),
        min_size=1,
        max_size=120,
    ),
    width=st.sampled_from([1, 3, 7, 64]),
)
def test_rank_equals_single_window(spark, data, width):
    rows = [(i, v, g) for i, (v, g) in enumerate(data)]
    df = spark.createDataFrame(rows, "id long, v long, g long")
    got = {
        r.id: r.gr
        for r in broadcast_offset_rank(
            df, F.expr(f"CAST(v div {width} AS BIGINT)"), ["v", "id"]
        ).collect()
    }
    want = {
        r.id: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(W.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


@settings(max_examples=12, deadline=None, derandomize=True)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 2)),
        min_size=1,
        max_size=100,
    )
)
def test_rank_partitioned_and_descending(spark, data):
    rows = [(i, v, g) for i, (v, g) in enumerate(data)]
    df = spark.createDataFrame(rows, "id long, v long, g long")
    got = {
        r.id: r.gr
        for r in broadcast_offset_rank(
            df,
            F.expr("CAST(-(v div 5) AS BIGINT)"),  # desc-compatible bucket
            [F.col("v").desc(), F.col("id")],
            partition_cols=("g",),
        ).collect()
    }
    want = {
        r.id: r.rn
        for r in df.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("g").orderBy(F.col("v").desc(), "id")
            ),
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("k", [1, 2, 4, 5, 7])
@pytest.mark.parametrize("n", [1, 2, 4, 5, 6, 97])
def test_ntile_matches_engine(spark, n, k):
    df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "gr long")
    got = {
        r.gr: r.t
        for r in df.withColumn("n", F.lit(n))
        .select("gr", ntile_from_rank("gr", "n", k).alias("t"))
        .collect()
    }
    want = {
        r.gr: r.t
        for r in df.select(
            "gr", F.ntile(k).over(W.orderBy("gr")).cast("bigint").alias("t")
        ).collect()
    }
    assert got == want
