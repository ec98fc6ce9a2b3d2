"""Skew-handling utilities (SURVEY.md §4 / the 100 TB design point).

Two layers of defense against hot keys:

1. AQE skew-join splitting — on by default in the session factory
   (``spark.sql.adaptive.skewJoin.enabled``): oversized shuffle
   partitions are split at runtime. This is the first resort.
2. Explicit salting (here) — for aggregations and joins where one key
   dominates so badly that even split partitions re-concentrate (or
   when AQE is unavailable, e.g. inside some streaming sinks):
   scatter the hot side over N salt buckets, replicate the other side
   N×, join/aggregate on (key, salt), then merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Scatter rows uniformly over n_salts buckets.

    The salt mixes a content hash with per-row position
    (spark_partition_id + monotonically_increasing_id): a hash of the
    columns ALONE sends fully-duplicated rows — the degenerate hot-key
    case salting exists for — to one bucket, spreading nothing
    (round-2 advisory, ADVICE.md). Position is deterministic only
    when the input's per-partition row order is stable — i.e. the
    input is a scan (or was localCheckpoint'ed / sorted within
    partitions). Directly downstream of an exchange, shuffle-block
    fetch order varies between task attempts, so a retried task can
    assign different salts; per-row join/aggregate results stay
    correct (the salt only routes rows), but bucket assignment is not
    reproducible there. For post-shuffle inputs feeding salted_join
    at scale, sortWithinPartitions or localCheckpoint first if
    reproducible bucketing matters."""
    return df.withColumn(
        col_name,
        F.pmod(
            F.xxhash64(
                *df.columns,
                F.spark_partition_id(),
                F.monotonically_increasing_id(),
            ),
            F.lit(n_salts),
        ).cast("int"),
    )


def replicate_with_salt(
    df: DataFrame, n_salts: int, col_name: str = "_salt"
) -> DataFrame:
    """Replicate every row n_salts times, one per salt value — the
    build side of a salted join."""
    return df.withColumn(
        col_name, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-prone DataFrame to another, spreading each join key
    over n_salts shuffle partitions. ``on`` is the ordinary join
    condition; the salt equality is added on top. The salt columns are
    dropped from the result.

    Cost model: the other side is replicated n_salts× — use when the
    hot key's partition exceeds executor memory, and keep n_salts
    small (4-16)."""
    s = with_salt(skewed, n_salts)
    o = replicate_with_salt(other, n_salts)
    joined = s.join(o, on & (s["_salt"] == o["_salt"]), how)
    return joined.drop("_salt")


def salted_count(
    df: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase aggregation for a skewed groupBy count: partial
    count per (key, salt), then merge per key. Spark's hash aggregate
    already does map-side partial aggregation — explicit salting adds
    a second *shuffle-level* split for keys whose partials still
    collapse onto one reducer."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("bigint").alias("n"))
