"""Core relational surface: projections, filters, aggregations,
sorts/limits, set ops, CTEs, subqueries.

Covers SURVEY.md §2.2 (P1-P12), §2.4 (A1-A10), §2.6 (O1-O6). In the
reference all of these are tier D — delegated verbatim to embedded
DuckDB over the single scanned table (IcebergConnection.py:114-116);
here each is an idiomatic Spark DataFrame/SQL plan with pushdown and
partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import (
    dec_avg,
    dec_sum,
    ntz,
    r2,
    r4,
    r6,
    rn,
    sql_query,
    t,
)
from mcp_iceberg_duckdb_spark.registry import query

# ---------------------------------------------------------------- flagship


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2                                        AS sum_qty,
           CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_base_price,
           CAST(floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_disc_price,
           CAST(floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_charge,
           floor((avg(l_quantity)) * 1e4 + 0.5) / 1e4                                        AS avg_qty,
           floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(l_extendedprice)) * 1e4 + 0.5) / 1e4 AS avg_price,
           floor((CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount)) * 1e6 + 0.5) / 1e6 AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan→filter→hash-agg→(sort at caller). The
    filter pushes into the parquet scan; Spark plans partial+final
    hash aggregation (map-side combine) automatically, so the shuffle
    carries only |groups|×partitions rows — the pattern that holds at
    100 TB. Reference: full scan then DuckDB agg
    (IcebergConnection.py:109-116).

    Perf note: decimal sums benched 2.0× a plain double sum here (the
    sum-heaviest query; int64 fixed-point benched 1.1× but overflows
    at extreme per-group scale). Decimal is kept — determinism of the
    rounded cents is a correctness requirement, not a preference."""
    li = t(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # money sums/avgs go through exact DECIMAL (dec_sum/dec_avg) —
    # order-dependent double summation flips rounded cents across
    # sessions; quantity sums are integer-valued doubles (exact in
    # any order) so plain sum/avg is deterministic there
    return (
        li.filter(F.col("l_shipdate") <= ntz("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            dec_avg(F.col("l_extendedprice"), 4).alias("avg_price"),
            dec_avg(F.col("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ------------------------------------------------------- projections (P1-P4)


@query(
    "p_projection",
    oracle="SELECT p_partkey, p_name, p_size FROM part",
    tags=("projection",),
)
def p_projection(spark, sf_dir):
    """P1 column projection — pruned down to 3 columns at the scan."""
    return t(spark, sf_dir).part.select("p_partkey", "p_name", "p_size")


@query("p_select_star", oracle="SELECT * FROM region", tags=("projection",))
def p_select_star(spark, sf_dir):
    """P2 SELECT * (reference test_IcebergConnection.py:195)."""
    return t(spark, sf_dir).region.select("*")


@query(
    "p_expr_alias",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_quantity + 1.0 AS qty_plus_one
    FROM lineitem
    """,
    tags=("projection",),
)
def p_expr_alias(spark, sf_dir):
    """P3 expression projection with aliases. Per-row arithmetic is
    left unrounded — IEEE doubles are bit-identical across engines,
    while engine-native round() at exact .xx5 halfway points is not
    (Spark rounds the shortest decimal repr, DuckDB the binary
    value); when rounding is required elsewhere we use the pure-IEEE
    floor(x*10^n + 0.5) form instead."""
    li = t(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") + F.lit(1.0)).alias("qty_plus_one"),
    )


@query(
    "p_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("projection",),
)
def p_distinct(spark, sf_dir):
    """P4 DISTINCT — hash-dedup; Spark plans partial+final."""
    return t(spark, sf_dir).lineitem.select("l_returnflag", "l_linestatus").distinct()


# ------------------------------------------------------ predicates (P5-P12)


@query(
    "p_where_compare",
    oracle="""
    SELECT o_orderkey, o_orderstatus, floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS total
    FROM orders
    WHERE o_totalprice > 100000.0 AND o_orderstatus <> 'F'
    """,
    tags=("filter",),
)
def p_where_compare(spark, sf_dir):
    """P5 comparison predicates + P6 AND — both pushed to the scan."""
    o = t(spark, sf_dir).orders
    return o.filter(
        (F.col("o_totalprice") > 100000.0) & (F.col("o_orderstatus") != "F")
    ).select("o_orderkey", "o_orderstatus", r2("o_totalprice").alias("total"))


@query(
    "p_boolean_connectives",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE (l_returnflag = 'R' OR l_linestatus = 'O')
      AND NOT (l_quantity < 5.0)
    """,
    tags=("filter",),
)
def p_boolean_connectives(spark, sf_dir):
    """P6 AND / OR / NOT."""
    li = t(spark, sf_dir).lineitem
    cond = ((F.col("l_returnflag") == "R") | (F.col("l_linestatus") == "O")) & ~(
        F.col("l_quantity") < 5.0
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber")


@query(
    "p_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity BETWEEN 10.0 AND 20.0
    """,
    tags=("filter",),
)
def p_between(spark, sf_dir):
    """P7 BETWEEN."""
    li = t(spark, sf_dir).lineitem
    return li.filter(F.col("l_quantity").between(10.0, 20.0)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "p_in_list",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_name IN ('FRANCE', 'GERMANY', 'JAPAN')
    """,
    tags=("filter",),
)
def p_in_list(spark, sf_dir):
    """P8 IN (literal list)."""
    n = t(spark, sf_dir).nation
    return n.filter(F.col("n_name").isin("FRANCE", "GERMANY", "JAPAN")).select(
        "n_nationkey", "n_name"
    )


@query(
    "p_like",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_name LIKE '%green%' OR p_type LIKE 'SMALL%'
    """,
    tags=("filter",),
)
def p_like(spark, sf_dir):
    """P9 LIKE (contains + prefix patterns — both become scan
    StringContains/StringStartsWith pushed filters)."""
    p = t(spark, sf_dir).part
    return p.filter(
        F.col("p_name").like("%green%") | F.col("p_type").like("SMALL%")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "p_ilike",
    oracle="""
    SELECT p_partkey, p_brand FROM part
    WHERE p_brand ILIKE 'brand%' AND p_name NOT ILIKE '%ZZZZ%'
    """,
    tags=("filter",),
)
def p_ilike(spark, sf_dir):
    """P9 ILIKE (case-insensitive LIKE) + NOT ILIKE."""
    p = t(spark, sf_dir).part
    return p.filter(
        F.col("p_brand").ilike("brand%") & ~F.col("p_name").ilike("%ZZZZ%")
    ).select("p_partkey", "p_brand")


@query(
    "p_is_null",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS status_or_null,
           (nullif(o_orderstatus, 'O') IS NULL) AS is_open,
           (nullif(o_orderstatus, 'O') IS NOT NULL) AS is_closed
    FROM orders
    """,
    tags=("filter",),
)
def p_is_null(spark, sf_dir):
    """P10 IS NULL / IS NOT NULL (nulls synthesized via nullif — the
    fixture tables are null-free)."""
    o = t(spark, sf_dir).orders
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        status_or_null.isNull().alias("is_open"),
        status_or_null.isNotNull().alias("is_closed"),
    )


@query(
    "p_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000.0 THEN 'large'
                WHEN o_totalprice >= 50000.0  THEN 'medium'
                ELSE 'small' END AS size_band
    FROM orders
    """,
    tags=("filter",),
)
def p_case_when(spark, sf_dir):
    """P11 CASE WHEN."""
    o = t(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000.0, "large")
        .when(F.col("o_totalprice") >= 50000.0, "medium")
        .otherwise("small")
        .alias("size_band"),
    )


@query(
    "p_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT)  AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(l_shipdate AS DATE)    AS ship_day
    FROM lineitem
    """,
    tags=("filter",),
)
def p_cast(spark, sf_dir):
    """P12 CAST across numeric/string/temporal."""
    li = t(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )


# ---------------------------------------------------- aggregations (A1-A10)


@query(
    "a_scalar_agg",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS total_price,
           floor((CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount)) * 1e6 + 0.5) / 1e6 AS avg_disc,
           floor((min(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS min_price,
           floor((max(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS max_price
    FROM lineitem
    """,
    tags=("agg",),
)
def a_scalar_agg(spark, sf_dir):
    """A2/A3/A5 ungrouped aggregate (money sums via exact decimal)."""
    li = t(spark, sf_dir).lineitem
    return li.agg(
        F.count("*").alias("n_rows"),
        dec_sum(F.col("l_extendedprice")).alias("total_price"),
        dec_avg(F.col("l_discount"), 6).alias("avg_disc"),
        r2(F.min("l_extendedprice")).alias("min_price"),
        r2(F.max("l_extendedprice")).alias("max_price"),
    )


@query(
    "a_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)    AS n_customers,
           count(o_orderkey)            AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def a_count_distinct(spark, sf_dir):
    """A4 COUNT(DISTINCT) — Spark expands to a two-phase plan
    (distinct-shuffle then count) automatically."""
    o = t(spark, sf_dir).orders
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
    )


@query(
    "a_approx_count_distinct",
    oracle="""
    SELECT count(DISTINCT l_partkey)  AS exact_parts,
           count(DISTINCT l_orderkey) AS exact_orders,
           (abs(approx_count_distinct(l_partkey)
                - count(DISTINCT l_partkey)) * 100
                <= 5 * count(DISTINCT l_partkey)) AS parts_within_5pct,
           (abs(approx_count_distinct(l_orderkey)
                - count(DISTINCT l_orderkey)) * 100
                <= 5 * count(DISTINCT l_orderkey)) AS orders_within_5pct
    FROM lineitem
    """,
    tags=("agg", "approx"),
)
def a_approx_count_distinct(spark, sf_dir):
    """A4b approx_count_distinct (HyperLogLog++) — the 100 TB scale
    path for distinct counting. The sketch value itself can't
    hash-match another engine, so the DECIDABLE contract is emitted
    instead: the exact counts (value-checked) plus within-5%-of-exact
    booleans — and the oracle verifies the SAME bound against ITS OWN
    HLL (round-6 ADVICE discipline, as s_latency_percentiles_approx),
    so a broken sketch on EITHER engine flips a bit the driver hashes
    (VERDICT round-1 item 6). All-integer comparisons."""
    li = t(spark, sf_dir).lineitem
    # one distinct-agg per column + 1-row cross joins, NOT several
    # count_distinct in one agg: multiple distinct aggregates plan an
    # Expand (row count × #aggregates) whose per-task hash sets blow
    # small executor heaps — the split form is partial-agg friendly
    # and scales to arbitrary cardinalities
    exact_p = (
        li.select("l_partkey")
        .distinct()
        .agg(F.count("*").alias("exact_parts"))
    )
    exact_o = (
        li.select("l_orderkey")
        .distinct()
        .agg(F.count("*").alias("exact_orders"))
    )
    approx = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("ap"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("ao"),
    )
    return (
        exact_p.crossJoin(exact_o)
        .crossJoin(approx)
        .select(
            "exact_parts",
            "exact_orders",
            (
                F.abs(F.col("ap") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("parts_within_5pct"),
            (
                F.abs(F.col("ao") - F.col("exact_orders"))
                <= 0.05 * F.col("exact_orders")
            ).alias("orders_within_5pct"),
        )
    )


@query(
    "a_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 10
    """,
    tags=("agg",),
)
def a_having(spark, sf_dir):
    """A6 HAVING = post-aggregation filter."""
    o = t(spark, sf_dir).orders
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum(F.col("o_totalprice")).alias("spend"),
        )
        .filter(F.col("n_orders") >= 10)
    )


@query(
    "a_stats",
    oracle="""
    SELECT l_returnflag,
           floor((stddev_samp(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sd_price,
           floor((stddev_pop(l_extendedprice)) * 1e2 + 0.5) / 1e2  AS sdp_price,
           floor((var_samp(l_discount)) * 1e6 + 0.5) / 1e6         AS var_disc,
           floor((var_pop(l_discount)) * 1e6 + 0.5) / 1e6          AS varp_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def a_stats(spark, sf_dir):
    """A7 stddev / variance (sample + population)."""
    li = t(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        r2(F.stddev_samp("l_extendedprice")).alias("sd_price"),
        r2(F.stddev_pop("l_extendedprice")).alias("sdp_price"),
        r6(F.var_samp("l_discount")).alias("var_disc"),
        r6(F.var_pop("l_discount")).alias("varp_disc"),
    )


@query(
    "a_median_percentile",
    oracle="""
    SELECT l_linestatus,
           floor((median(l_extendedprice)) * 1e4 + 0.5) / 1e4            AS med_price,
           floor((quantile_cont(l_extendedprice, 0.95)) * 1e4 + 0.5) / 1e4 AS p95_price,
           floor((quantile_cont(l_quantity, 0.25)) * 1e4 + 0.5) / 1e4      AS q1_qty
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("agg",),
)
def a_median_percentile(spark, sf_dir):
    """A8 exact median / continuous percentile (Spark F.median /
    F.percentile == DuckDB median / quantile_cont). The approximate
    scale path is percentile_approx — see a_percentile_approx."""
    li = t(spark, sf_dir).lineitem
    # ONE percentile buffer for the price column: median(x) is
    # exactly percentile(x, 0.5), and percentile with an array of
    # percentages sorts the (same) value buffer once and reads both
    # ranks from it — two separate holistic aggregates would each
    # collect and sort all values per group (guide §1.2: don't do
    # the same pass twice). Values are bit-identical to the scalar
    # calls (same sort, same interpolation).
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.percentile(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95))
            ).alias("_pp"),
            F.percentile("l_quantity", 0.25).alias("_q1"),
        )
        .select(
            "l_linestatus",
            r4(F.col("_pp")[0]).alias("med_price"),
            r4(F.col("_pp")[1]).alias("p95_price"),
            r4(F.col("_q1")).alias("q1_qty"),
        )
    )


@query(
    "a_percentile_approx",
    oracle="""
    SELECT l_linestatus,
           floor((quantile_cont(l_extendedprice, 0.5)) * 1e4 + 0.5) / 1e4
               AS exact_median,
           (approx_quantile(l_extendedprice, 0.5)
                BETWEEN quantile_cont(l_extendedprice, 0.49)
                    AND quantile_cont(l_extendedprice, 0.51))
               AS approx_within_rank_eps
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("agg", "approx"),
)
def a_percentile_approx(spark, sf_dir):
    """A8b approx percentile (Greenwald-Khanna sketch, accuracy 1e4 →
    rank error ≤ 1e-4) — the 100 TB path. Decidable contract instead
    of the raw sketch value: the exact median (value-checked) plus a
    boolean pinning the approximation between the exact 0.49 and 0.51
    percentiles — far looser than the sketch's rank guarantee, so
    only a broken sketch flips it (VERDICT round-1 item 6). The
    oracle verifies the SAME band against ITS OWN t-digest (round-6
    ADVICE discipline), so either engine's sketch can fail the
    compare; at these ≥100k-row groups the ±0.01-rank band is wide
    for both sketches."""
    li = t(spark, sf_dir).lineitem
    # one exact-percentile buffer for all three ranks (0.49/0.5/0.51)
    # instead of three independent holistic aggregates over the same
    # column — same sort, same interpolation, identical values
    pa = F.percentile_approx("l_extendedprice", 0.5, 10000)
    pct = F.percentile(
        "l_extendedprice", F.array(F.lit(0.49), F.lit(0.5), F.lit(0.51))
    )
    return (
        li.groupBy("l_linestatus")
        .agg(pct.alias("_pct"), pa.alias("_pa"))
        .select(
            "l_linestatus",
            rn(F.col("_pct")[1], 4).alias("exact_median"),
            (
                (F.col("_pa") >= F.col("_pct")[0])
                & (F.col("_pa") <= F.col("_pct")[2])
            ).alias("approx_within_rank_eps"),
        )
    )


@query(
    "a_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg",),
)
def a_string_agg(spark, sf_dir):
    """A9 string/list aggregation — collect_list is unordered in a
    distributed engine, so sort the array before joining to make the
    result deterministic (mirrors string_agg ... ORDER BY)."""
    n = t(spark, sf_dir).nation
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names")
    )


@query(
    "a_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def a_rollup(spark, sf_dir):
    """A10 ROLLUP — hierarchical subtotals + grand total."""
    li = t(spark, sf_dir).lineitem
    return li.rollup("l_returnflag", "l_linestatus").agg(
        r2(F.sum("l_quantity")).alias("sum_qty"), F.count("*").alias("n")
    )


@query(
    "a_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def a_cube(spark, sf_dir):
    """A10 CUBE — all grouping-set combinations."""
    li = t(spark, sf_dir).lineitem
    return li.cube("l_returnflag", "l_linestatus").agg(
        r2(F.sum("l_quantity")).alias("sum_qty")
    )


@query(
    "a_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg",),
)
def a_grouping_sets(spark, sf_dir):
    """A10 explicit GROUPING SETS (SQL form — Catalyst expands)."""
    return sql_query(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )(spark, sf_dir)


@query(
    "a_corr_covar",
    oracle="""
    SELECT floor((corr(l_quantity, l_extendedprice)) * 1e6 + 0.5) / 1e6        AS qty_price_corr,
           floor((covar_samp(l_quantity, l_extendedprice)) * 1e4 + 0.5) / 1e4  AS qty_price_covar
    FROM lineitem
    """,
    tags=("agg",),
)
def a_corr_covar(spark, sf_dir):
    """Bivariate aggregates: correlation / covariance."""
    li = t(spark, sf_dir).lineitem
    return li.agg(
        r6(F.corr("l_quantity", "l_extendedprice")).alias("qty_price_corr"),
        r4(F.covar_samp("l_quantity", "l_extendedprice")).alias("qty_price_covar"),
    )


# -------------------------------------------- sorts / limits / set ops (O1-O6)


@query(
    "o_order_limit",
    oracle="""
    SELECT o_orderkey, floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("sort",),
)
def o_order_limit(spark, sf_dir):
    """O1+O2+O3 top-k: ORDER BY ... LIMIT plans as
    TakeOrderedAndProject — per-partition heaps, no global sort.
    o_orderkey tiebreak makes the top-10 set deterministic."""
    o = t(spark, sf_dir).orders
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", r2("o_totalprice").alias("total"))
        .limit(10)
    )


@query(
    "o_offset",
    oracle="""
    SELECT o_orderkey FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 100
    """,
    tags=("sort",),
)
def o_offset(spark, sf_dir):
    """O2 LIMIT ... OFFSET over a deterministic (unique-key) order."""
    o = t(spark, sf_dir).orders
    return o.orderBy("o_orderkey").select("o_orderkey").offset(100).limit(20)


@query(
    "o_sort_nulls",
    oracle="""
    SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS prio
    FROM orders
    ORDER BY prio DESC NULLS LAST, o_orderkey
    LIMIT 50
    """,
    tags=("sort",),
)
def o_sort_nulls(spark, sf_dir):
    """O1 explicit NULLS FIRST/LAST (Spark and DuckDB have opposite
    defaults — always spell it out when nulls can reach a sort)."""
    o = t(spark, sf_dir).orders
    prio = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return (
        o.select("o_orderkey", prio.alias("prio"))
        .orderBy(F.col("prio").desc_nulls_last(), F.col("o_orderkey"))
        .limit(50)
    )


@query(
    "o_union_all",
    oracle="""
    SELECT c_custkey AS key, c_name AS name FROM customer WHERE c_custkey <= 50
    UNION ALL
    SELECT s_suppkey AS key, s_name AS name FROM supplier
    """,
    tags=("setop",),
)
def o_union_all(spark, sf_dir):
    """O4 UNION ALL (bag union — no shuffle at all)."""
    tt = t(spark, sf_dir)
    c = tt.customer.filter(F.col("c_custkey") <= 50).select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    s = tt.supplier.select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name")
    )
    return c.unionAll(s)


@query(
    "o_union_distinct",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem
    UNION
    SELECT o_orderstatus AS flag FROM orders
    """,
    tags=("setop",),
)
def o_union_distinct(spark, sf_dir):
    """O4 UNION (set semantics = union + dedup)."""
    tt = t(spark, sf_dir)
    a = tt.lineitem.select(F.col("l_returnflag").alias("flag"))
    b = tt.orders.select(F.col("o_orderstatus").alias("flag"))
    return a.union(b).distinct()


@query(
    "o_intersect",
    oracle="""
    SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def o_intersect(spark, sf_dir):
    """O4 INTERSECT (customers with both open and finished orders)."""
    o = t(spark, sf_dir).orders
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("key"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("key"))
    return a.intersect(b)


@query(
    "o_except",
    oracle="""
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT o_custkey AS key FROM orders WHERE o_totalprice > 150000.0
    """,
    tags=("setop",),
)
def o_except(spark, sf_dir):
    """O4 EXCEPT (customers with no large order — non-empty at every
    SF, unlike never-ordered). subtract() is Spark's EXCEPT DISTINCT
    — exact set semantics. exceptAll().distinct() is NOT equivalent:
    it keeps a row whose left multiplicity merely exceeds its right
    multiplicity (round-2 advisory, ADVICE.md)."""
    tt = t(spark, sf_dir)
    a = tt.customer.select(F.col("c_custkey").alias("key"))
    b = tt.orders.filter(F.col("o_totalprice") > 150000.0).select(
        F.col("o_custkey").alias("key")
    )
    return a.subtract(b)


@query(
    "o_union_by_name",
    oracle="""
    SELECT c_custkey AS key, c_name AS name, c_acctbal AS bal
    FROM customer WHERE c_custkey <= 20
    UNION ALL BY NAME
    SELECT s_name AS name, s_suppkey AS key, CAST(NULL AS DOUBLE) AS bal
    FROM supplier
    """,
    tags=("setop",),
)
def o_union_by_name(spark, sf_dir):
    """UNION BY NAME: column resolution by name, not position, with
    a missing column null-filled (unionByName allowMissingColumns)."""
    tt = t(spark, sf_dir)
    a = tt.customer.filter(F.col("c_custkey") <= 20).select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    b = tt.supplier.select(
        F.col("s_name").alias("name"), F.col("s_suppkey").alias("key")
    )
    return a.unionByName(b, allowMissingColumns=True)


def sample_rows(spark, sf_dir):
    """Seeded 10% Bernoulli TABLESAMPLE rows — deterministic for a
    fixed partitioning but engine-specific."""
    li = t(spark, sf_dir).lineitem
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "p_sample",
    oracle="""
    WITH s AS (
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem USING SAMPLE 10 PERCENT (bernoulli, 42)
    ),
    tot AS (SELECT count(*) AS n_total FROM lineitem),
    ns AS (SELECT count(*) AS n_samp FROM s),
    extra AS (
        SELECT count(*) AS n_extra
        FROM s ANTI JOIN lineitem USING (l_orderkey, l_linenumber, l_quantity)
    )
    SELECT CAST(tot.n_total AS BIGINT) AS n_total,
           (ns.n_samp * 100 >= tot.n_total * 7
            AND ns.n_samp * 100 <= tot.n_total * 13) AS frac_ok,
           (extra.n_extra = 0) AS sample_is_subset
    FROM tot, ns, extra
    """,
    tags=("projection", "approx"),
)
def p_sample(spark, sf_dir):
    """TABLESAMPLE, emitted as a decidable contract (the sampled row
    set is engine-specific RNG, so the rows themselves can't
    hash-match DuckDB): the population size (value-checked), the
    sample fraction within [0.07, 0.13] of the 0.1 target (±13σ even
    at sf0.001's ~6k rows — a broken fraction or double-sampling bug
    flips it), and the sampled rows being a true subset of the source
    (anti-join count 0 — catches a sampler that fabricates or mutates
    rows). TWO-SIDED (round-8): the oracle runs DuckDB's own seeded
    Bernoulli sample (`USING SAMPLE 10 PERCENT (bernoulli, 42)`)
    through the identical three checks instead of pinning TRUE — an
    unachievable contract (e.g. a tolerance tighter than sampling
    noise) now fails on BOTH engines instead of only Spark being able
    to falsify it. Sample rows stay available via sample_rows."""
    li = t(spark, sf_dir).lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    s = sample_rows(spark, sf_dir)
    n_total = li.agg(F.count("*").alias("n_total"))
    n_samp = s.agg(F.count("*").alias("n_samp"))
    extra = s.join(
        li, ["l_orderkey", "l_linenumber", "l_quantity"], "anti"
    ).agg(F.count("*").alias("n_extra"))
    return (
        n_total.crossJoin(n_samp)
        .crossJoin(extra)
        .select(
            "n_total",
            (
                (F.col("n_samp") * 100 >= F.col("n_total") * 7)
                & (F.col("n_samp") * 100 <= F.col("n_total") * 13)
            ).alias("frac_ok"),
            (F.col("n_extra") == 0).alias("sample_is_subset"),
        )
    )


_CTE_SQL = """
WITH spend AS (
    SELECT o_custkey,
           CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS total_spend,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT n_orders, count(*) AS n_customers,
       max(total_spend) AS max_spend
FROM spend GROUP BY n_orders
"""


@query("o_cte", oracle=_CTE_SQL, tags=("setop",))
def o_cte(spark, sf_dir):
    """O5 CTE (WITH) — same text runs in both dialects; in Spark the
    CTE is just a named logical subplan, inlined by Catalyst."""
    return sql_query(_CTE_SQL)(spark, sf_dir)


_SUBQ_IN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
)
"""


@query("o_subquery_in", oracle=_SUBQ_IN_SQL, tags=("subquery",))
def o_subquery_in(spark, sf_dir):
    """O6 IN-subquery — Catalyst rewrites to a left-semi join."""
    return sql_query(_SUBQ_IN_SQL)(spark, sf_dir)


_SUBQ_EXISTS_SQL = """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
"""


@query("o_subquery_not_exists", oracle=_SUBQ_EXISTS_SQL, tags=("subquery",))
def o_subquery_not_exists(spark, sf_dir):
    """O6 correlated NOT EXISTS — decorrelated to a left-anti join."""
    return sql_query(_SUBQ_EXISTS_SQL)(spark, sf_dir)


_SUBQ_SCALAR_SQL = """
SELECT o_orderkey, floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS total
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
"""


@query("o_subquery_scalar", oracle=_SUBQ_SCALAR_SQL, tags=("subquery",))
def o_subquery_scalar(spark, sf_dir):
    """O6 scalar subquery in WHERE — planned as a broadcast of the
    single aggregated value, not a driver-side collect."""
    return sql_query(_SUBQ_SCALAR_SQL)(spark, sf_dir)


_SUBQ_CORR_SQL = """
SELECT o.o_custkey, o.o_orderkey, floor((o.o_totalprice) * 1e2 + 0.5) / 1e2 AS total
FROM orders o
WHERE o.o_totalprice = (
    SELECT min(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
"""


@query("o_subquery_correlated_min", oracle=_SUBQ_CORR_SQL, tags=("subquery",))
def o_subquery_correlated_min(spark, sf_dir):
    """O6 correlated scalar subquery (TPC-H Q2 shape: row matching
    the per-group minimum) — Catalyst decorrelates to an aggregate +
    join, no per-row re-execution."""
    return sql_query(_SUBQ_CORR_SQL)(spark, sf_dir)


@query(
    "a_agg_filter_clause",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_totalprice > 150000.0) AS n_big,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def a_agg_filter_clause(spark, sf_dir):
    """Aggregate FILTER clause (conditional aggregation)."""
    return sql_query(
        """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_totalprice > 150000.0) AS n_big,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus
        """
    )(spark, sf_dir)


@query(
    "p_pivot",
    oracle="""
    SELECT l_returnflag,
           floor((sum(l_quantity) FILTER (WHERE l_linestatus = 'O')) * 1e2 + 0.5) / 1e2 AS qty_O,
           floor((sum(l_quantity) FILTER (WHERE l_linestatus = 'F')) * 1e2 + 0.5) / 1e2 AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def p_pivot(spark, sf_dir):
    """PIVOT — groupBy().pivot() with explicit value list (no extra
    distinct-values job); oracle via conditional aggregation."""
    li = t(spark, sf_dir).lineitem
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(r2(F.sum("l_quantity")))
    )
    return piv.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@query(
    "p_unpivot",
    oracle="""
    SELECT c_custkey, k AS metric, v AS val FROM (
        SELECT c_custkey, 'acctbal' AS k, floor((c_acctbal) * 1e2 + 0.5) / 1e2 AS v FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey' AS k, CAST(c_nationkey AS DOUBLE) AS v FROM customer
    )
    """,
    tags=("projection",),
)
def p_unpivot(spark, sf_dir):
    """UNPIVOT / melt via stack() — wide→long without a shuffle."""
    c = t(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', floor((c_acctbal) * 1e2 + 0.5) / 1e2,"
            " 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)"
        ),
    )


@query(
    "o_recursive_cte",
    oracle="""
    WITH RECURSIVE up AS (
        SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
        FROM customer
        UNION ALL
        SELECT start_key, cur // 2, depth + 1 FROM up WHERE cur > 1
    )
    SELECT start_key, max(depth) AS depth_to_root, count(*) AS chain_len
    FROM up GROUP BY start_key
    """,
    tags=("setop",),
)
def o_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4 WITH RECURSIVE): every customer walks
    the implicit binary hierarchy parent(k) = k div 2 up to the root,
    reporting depth and chain length — the org-chart / BOM traversal
    shape that previously needed the driver-side iteration loops the
    graph operators use (dedup.py CC, graph.py PageRank). Recursion
    depth is log2(max key), each round a filtered map over the
    frontier — Spark materializes rounds iteratively exactly like the
    unrolled loops, but planned by the engine.

    Only dialect delta vs the oracle: integer division spells `div`
    in Spark SQL and `//` in DuckDB; all arithmetic is int64."""
    from mcp_iceberg_duckdb_spark.operators._util import views

    views(spark, sf_dir, "customer")
    return spark.sql(
        """
        WITH RECURSIVE up AS (
            SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
            FROM customer
            UNION ALL
            SELECT start_key, cur div 2, depth + 1 FROM up WHERE cur > 1
        )
        SELECT start_key, max(depth) AS depth_to_root,
               count(*) AS chain_len
        FROM up GROUP BY start_key
        """
    )


@query(
    "j_null_safe",
    oracle="""
    WITH a AS (
        SELECT c_custkey, nullif(c_nationkey, 3) AS nk FROM customer
    ),
    b AS (
        SELECT s_suppkey, nullif(s_nationkey, 3) AS nk FROM supplier
    )
    SELECT coalesce(a.nk, -1) AS nk_key, count(*) AS n_pairs
    FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
    GROUP BY coalesce(a.nk, -1)
    """,
    tags=("join",),
)
def j_null_safe(spark, sf_dir):
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — the semantics MERGE
    and dimension-conforming joins need when the key itself is
    optional. NULLs are planted deterministically via nullif on one
    nation key so both engines exercise the NULL⋈NULL path; output
    aggregates pair counts per key (NULL bucketed as -1).

    Plan note: Spark executes <=> as an ordinary hash join (the
    null-safe comparison is a valid equi-key) — no nested-loop
    fallback, same shuffle shape as `=`."""
    c = t(spark, sf_dir).customer.select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(3)).alias("nk_a")
    )
    s = t(spark, sf_dir).supplier.select(
        "s_suppkey", F.nullif(F.col("s_nationkey"), F.lit(3)).alias("nk_b")
    )
    return (
        c.join(s, F.col("nk_a").eqNullSafe(F.col("nk_b")))
        .groupBy(F.coalesce("nk_a", F.lit(-1)).alias("nk_key"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "o_except_all",
    oracle="""
    SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def o_except_all(spark, sf_dir):
    """EXCEPT ALL — bag difference: a customer with 5 open and 3
    finished orders survives TWICE (multiplicity subtraction), which
    EXCEPT's set semantics would collapse to nothing. Both engines
    implement SQL's bag semantics exactly, so the multiset compare
    needs no aggregation trick."""
    o = t(spark, sf_dir).orders
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("key")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("key")
    )
    return a.exceptAll(b)


@query(
    "o_intersect_all",
    oracle="""
    SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def o_intersect_all(spark, sf_dir):
    """INTERSECT ALL — bag intersection: min(multiplicity) copies
    survive per key, completing the set-op family's ALL variants."""
    o = t(spark, sf_dir).orders
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("key")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("key")
    )
    return a.intersectAll(b)


@query(
    "a_mode_deterministic",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority AS grp, o_orderstatus AS v,
               count(*) AS n
        FROM orders GROUP BY 1, 2
    ),
    r AS (
        SELECT grp, v, n,
               row_number() OVER (PARTITION BY grp
                                  ORDER BY n DESC, v) AS rk
        FROM c
    )
    SELECT grp, v AS mode_value, n AS mode_count FROM r WHERE rk = 1
    """,
    tags=("agg",),
)
def a_mode_deterministic(spark, sf_dir):
    """Deterministic MODE per group. Engine-native mode() is a parity
    trap: on ties both Spark's and DuckDB's mode pick an
    implementation-defined (often arrival-order) winner, which a
    distributed engine cannot reproduce across partitionings — so the
    idiom here is the explicit (count desc, value) total order: one
    (grp, v) count groupBy + a rank-limited window. WindowGroupLimit
    keeps one row per group pre-exchange; the count relation is
    |distinct (grp, v)| rows regardless of input volume — the same
    argmax discipline as the quantized-argmax ops (VERDICT r4)."""
    from pyspark.sql import Window

    o = t(spark, sf_dir).orders
    c = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_orderstatus").alias("v"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("grp").orderBy(F.col("n").desc(), "v")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("grp", F.col("v").alias("mode_value"), F.col("n").alias("mode_count"))
    )




@query(
    "a_bool_aggs",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT)
               AS n_large,
           bool_and(o_totalprice > 0)            AS all_positive,
           bool_or(o_orderstatus = 'F')          AS any_finished,
           bool_and(o_custkey IS NOT NULL)       AS all_keyed
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def a_bool_aggs(spark, sf_dir):
    """Boolean aggregate family (SQL:1999 EVERY/ANY): count_if,
    bool_and, bool_or per group — the predicates-as-aggregates
    surface (DuckDB spells count_if as a FILTER clause; semantics are
    identical). One map-side-combined groupBy; booleans combine
    associatively so partial aggregation is exact at any scale."""
    o = t(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000)
        .cast("bigint")
        .alias("n_large"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bool_and(F.col("o_custkey").isNotNull()).alias("all_keyed"),
    )


@query(
    "o_qualify",
    oracle="""
    SELECT o_custkey, o_orderkey,
           floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS total,
           CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
    FROM orders
    QUALIFY rk <= 2
    """,
    tags=("sort",),
)
def o_qualify(spark, sf_dir):
    """QUALIFY clause (filter on a window result — DuckDB/Snowflake/
    BigQuery surface syntax): top-2 orders per customer. Spark has no
    QUALIFY keyword; the same logical plan is window + filter, and
    Catalyst's WindowGroupLimit applies the rank bound map-side so
    only 2 rows per customer survive the exchange — the identical
    physical shape QUALIFY engines plan. Total order via the
    (o_totalprice, o_orderkey) tiebreak."""
    from pyspark.sql import Window

    o = t(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", r2("o_totalprice").alias("total"), "rk")
    )


@query(
    "a_weighted_median",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS grp,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ),
    cum AS (
        SELECT grp, price_c, w,
               sum(w) OVER (PARTITION BY grp ORDER BY price_c
                            ROWS UNBOUNDED PRECEDING) AS cw,
               sum(w) OVER (PARTITION BY grp) AS tw
        FROM v
    )
    SELECT grp,
           CAST(max(tw) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cw >= tw THEN price_c END) AS BIGINT)
               AS wmedian_cents,
           CAST(min(CASE WHEN 10 * cw >= 9 * tw THEN price_c END) AS BIGINT)
               AS wp90_cents
    FROM cum
    GROUP BY grp
    """,
    tags=("agg",),
)
def a_weighted_median(spark, sf_dir):
    """Grouped WEIGHTED percentiles (lower weighted median + weighted
    p90 of extended price, weighted by quantity) — the volume-weighted
    quantile surface (DuckDB spells it quantile with weights via this
    same cumulative construction; Spark has no native weighted
    percentile, and the published definition — smallest v with
    cumulative weight ≥ q·W — is exactly one cumulative window). All
    integer: prices in cents, int64 weights, the q·W comparison
    cross-multiplied (2·cw ≥ tw, 10·cw ≥ 9·tw) so no division ever
    happens — bit-identical in any engine.

    Spark shape: ONE exchange on the group key serves both windows
    (cumulative and total — same partitioning) and the final groupBy;
    ties in price collapse to the same answer under any row order
    because the cut condition depends only on the (value, weight)
    multiset. At 100 TB this is the sort-based single-pass weighted
    quantile — no per-group value collection, spill-friendly sort."""
    from pyspark.sql import Window as W

    li = t(spark, sf_dir).lineitem.select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_c"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    cum_w = (
        W.partitionBy("grp")
        .orderBy("price_c")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot_w = W.partitionBy("grp")
    cum = li.select(
        "grp",
        "price_c",
        F.sum("w").over(cum_w).alias("cw"),
        F.sum("w").over(tot_w).alias("tw"),
    )
    return cum.groupBy("grp").agg(
        F.max("tw").cast("bigint").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_c")))
        .cast("bigint")
        .alias("wmedian_cents"),
        F.min(F.when(10 * F.col("cw") >= 9 * F.col("tw"), F.col("price_c")))
        .cast("bigint")
        .alias("wp90_cents"),
    )
