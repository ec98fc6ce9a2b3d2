"""Additional TPC-H-shaped flagship queries (adapted to the fixture
schema, TESTDATA.md) — the join/agg patterns a warehouse workload is
made of, each with its DuckDB oracle. These are the bench headliners:
scan-heavy (Q6), exists/anti (Q4), join+topk (Q10), conditional agg
(Q12/Q14 shapes), group-HAVING-join (Q18 shape).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import dec_sum, ntz, r2, rn, t
from mcp_iceberg_duckdb_spark.registry import query


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(floor(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24.0
    """,
    tags=("agg", "flagship"),
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-sum — the I/O-bound benchmark. All
    four predicates push into the parquet scan; zero shuffles (single
    partial+final agg)."""
    li = t(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_shipdate") >= ntz("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ntz("1998-01-01 00:00:00"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24.0)
    ).agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n"),
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "flagship"),
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4: EXISTS → left-semi join, then count per priority.
    The semi join never widens orders rows, and lineitem is pruned to
    its two join columns at the scan."""
    tt = t(spark, sf_dir)
    o = tt.orders.filter(
        (F.col("o_orderdate") >= ntz("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < ntz("1997-10-01 00:00:00"))
    )
    li = tt.lineitem.select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(floor(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("join", "flagship"),
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: 4-way join + group + top-20 — returned-revenue per
    customer. customer/nation broadcast; lineitem⋈orders is the one
    shuffle; TakeOrderedAndProject caps the result."""
    tt = t(spark, sf_dir)
    o = tt.orders.filter(
        (F.col("o_orderdate") >= ntz("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < ntz("1997-07-01 00:00:00"))
    )
    li = tt.lineitem.filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(tt.customer), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(tt.nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE l_quantity >= 25.0) AS heavy_count,
           count(*) FILTER (WHERE l_quantity <  25.0) AS light_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
    tags=("join", "flagship"),
)
def q12_priority_shipping(spark, sf_dir):
    """TPC-H Q12 shape: join + conditional counts per priority."""
    tt = t(spark, sf_dir)
    li = tt.lineitem.filter(
        (F.col("l_shipdate") >= ntz("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ntz("1998-01-01 00:00:00"))
    )
    joined = tt.orders.join(li, tt.orders.o_orderkey == li.l_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("l_quantity") >= 25.0, 1)).alias("heavy_count"),
        F.count(F.when(F.col("l_quantity") < 25.0, 1)).alias("light_count"),
    )


@query(
    "q14_promo_effect",
    oracle="""
    SELECT floor((100.0 * CAST(sum(CAST(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("join", "flagship"),
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14: promo revenue share — broadcast part, single agg."""
    tt = t(spark, sf_dir)
    li = tt.lineitem.filter(
        (F.col("l_shipdate") >= ntz("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < ntz("1997-10-01 00:00:00"))
    )
    joined = li.join(F.broadcast(tt.part), li.l_partkey == tt.part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))

    def dsum(c):
        # exact decimal sums; the final ratio is an arbitrary real, so
        # double division + round is deterministic (no .5 midpoints)
        return F.sum(c.cast("decimal(18,6)")).cast("double")

    return joined.agg(
        rn(100.0 * dsum(promo) / dsum(rev), 4).alias("promo_pct")
    )


_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@query("q15_top_supplier", oracle=_Q15_SQL, tags=("join", "flagship"))
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: top supplier by quarterly revenue — a CTE consumed
    twice (join input + scalar-max subquery); Catalyst computes it
    once per consumer but the decimal revenue makes both reads agree
    exactly. Same SQL text in both dialects."""
    from mcp_iceberg_duckdb_spark.operators._util import sql_query

    return sql_query(_Q15_SQL)(spark, sf_dir)


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(floor(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1.0 AND l.l_quantity <= 20.0)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10.0 AND l.l_quantity <= 30.0)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20.0 AND l.l_quantity <= 40.0)
    """,
    tags=("join", "flagship"),
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive band predicates
    across both join sides — Catalyst extracts the common l_partkey =
    p_partkey equi-condition and evaluates the OR as a post-join
    residual; per-side IN/range fragments are pushed to the scans."""
    tt = t(spark, sf_dir)
    li, p = tt.lineitem, tt.part
    cond = (
        (
            (p.p_brand == "Brand#1")
            & p.p_size.between(1, 15)
            & li.l_quantity.between(1.0, 20.0)
        )
        | (
            (p.p_brand == "Brand#3")
            & p.p_size.between(10, 30)
            & li.l_quantity.between(10.0, 30.0)
        )
        | (
            (p.p_brand == "Brand#5")
            & p.p_size.between(20, 50)
            & li.l_quantity.between(20.0, 40.0)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


_Q22_SQL = """
SELECT substr(c_name, 10, 1) AS cust_group,
       count(*) AS n_custs,
       CAST(floor(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
      SELECT 1 FROM (
          SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 10
      ) f WHERE f.o_custkey = c.c_custkey
  )
GROUP BY substr(c_name, 10, 1)
"""


@query("q22_global_sales_opportunity", oracle=_Q22_SQL, tags=("join", "flagship"))
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers who are not
    frequent buyers — scalar-avg subquery + anti join against an
    aggregate + group. ('No orders at all' is empty in this synthetic
    data, so the anti side is the >=10-orders frequent-buyer set.)
    Same SQL text in both dialects; the avg threshold compare is safe
    (balances are not within 1e-9 of the avg)."""
    from mcp_iceberg_duckdb_spark.operators._util import sql_query

    return sql_query(_Q22_SQL)(spark, sf_dir)


@query(
    "q7_bilateral_volume",
    oracle="""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(floor(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INTEGER)
    """,
    tags=("join", "flagship"),
)
def q7_bilateral_volume(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between different
    nations per year — the same dimension (nation) joined twice under
    two roles, both broadcast. This query's 1199 groups are what
    exposed the double-sum rounding hazard dec_sum exists for."""
    tt = t(spark, sf_dir)
    li = tt.lineitem.filter(
        (F.col("l_shipdate") >= ntz("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ntz("1999-01-01 00:00:00"))
    )
    n1 = tt.nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = tt.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(tt.orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(tt.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(tt.supplier), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("c_nk") != F.col("s_nk"))
    )
    return joined.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "volume"
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, floor((o.o_totalprice) * 1e2 + 0.5) / 1e2 AS total,
           floor((t.sum_qty) * 1e2 + 0.5) / 1e2 AS sum_qty
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150.0
    ) t
    JOIN orders o   ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    tags=("join", "flagship"),
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered aggregate driving a join —
    the aggregate shrinks lineitem to qualifying orderkeys BEFORE the
    join (orders of magnitude less shuffle than join-then-filter)."""
    tt = t(spark, sf_dir)
    big = (
        tt.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150.0)
    )
    return (
        big.join(tt.orders, big.l_orderkey == tt.orders.o_orderkey)
        .join(F.broadcast(tt.customer), tt.orders.o_custkey == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            r2("o_totalprice").alias("total"),
            r2("qty").alias("sum_qty"),
        )
    )
