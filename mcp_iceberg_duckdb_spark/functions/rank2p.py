"""Two-phase broadcast-offset global ranking — THE scale-correct
replacement for `row_number()/ntile() OVER (ORDER BY ...)`.

An ordered window with no (or a low-cardinality) partition spec moves
its whole input through one WindowExec partition — Spark even warns
`No Partition Defined ... Moving all data to a single partition`. At
100 TB that is the canonical scale-killer, yet exact global ranks are
what epoch shuffles, shard packers, percentile scores, and ntile
segmentations need. The standard engine pattern (used by e.g.
distributed sort-rank implementations) is:

  phase 1: bucket rows by a key MONOTONE along the sort order; count
           rows per bucket; take the exclusive prefix sum over the
           bucket GRID (bounded by the value domain / bucket width —
           independent of corpus size);
  phase 2: rank WITHIN each bucket (a properly partitioned window)
           and add the broadcast bucket offset.

x_corpus_epoch_shuffle proved the pattern; round 8 extracts it here
and applies it to w_cume_percent, w_nth_value_ntile, s_user_rfm, and
the KS/AUC ECDFs (tests/test_plans.py::test_no_unbounded_global_windows
pins that no other global-window site exists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def broadcast_offset_rank(
    df: DataFrame,
    bucket: Column,
    order_by: list,
    partition_cols: tuple[str, ...] = (),
    out: str = "gr",
) -> DataFrame:
    """Add column ``out`` = exact 1-based row_number over
    (partition_cols, order_by), computed two-phase. ``bucket`` MUST be
    monotone non-decreasing along ``order_by``'s leading column(s)
    within each partition (e.g. ``F.expr("k div 4096")`` for an
    ascending k, or ``-(k div W)`` for descending k) — bucket order
    then equals sort order up to in-bucket ties, which the
    partition-local window resolves. The only cross-bucket state is
    the per-bucket count relation, bounded by |value domain| / width,
    broadcast back as offsets."""
    pts = df.withColumn("__b", bucket)
    keys = [*partition_cols, "__b"]
    btot = pts.groupBy(*keys).agg(F.count("*").alias("__bc"))
    wb = (
        (W.partitionBy(*partition_cols) if partition_cols else W)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    off = btot.select(
        *keys, (F.sum("__bc").over(wb) - F.col("__bc")).alias("__off")
    )
    wl = W.partitionBy(*keys).orderBy(*order_by)
    return (
        pts.join(F.broadcast(off), keys)
        .withColumn(out, F.col("__off") + F.row_number().over(wl))
        .drop("__b", "__off")
    )


def ntile_from_rank(gr: str, n: str, k: int) -> Column:
    """SQL-standard ntile(k) as pure integer arithmetic over a global
    rank ``gr`` (1-based) and partition size ``n``: q = n div k, r =
    n mod k; the first r tiles take q+1 rows, the rest q. Matches
    Spark's and DuckDB's ntile exactly, with no window at all."""
    q = f"({n} div {k})"
    r = f"({n} % {k})"
    return F.expr(
        f"""CAST(CASE
             WHEN {gr} <= {r} * ({q} + 1)
             THEN ({gr} + {q}) div ({q} + 1)
             ELSE {r} + (({gr} - {r} * ({q} + 1) + {q} - 1) div {q})
           END AS BIGINT)"""
    )
