"""Joins — the capability the reference explicitly lacks.

Reference: single-table only (README.md:6 "Support only single table
queries"; QueryManager.py:79-81 extracts just the first FROM table, a
JOIN breaks inside DuckDB on the unregistered second table —
test_QueryManager.py:73). Our engine lifts the restriction with the
full Spark join surface (SURVEY.md §2.3).

Scale notes: every dimension here (region/nation/customer/supplier/
part) is broadcast-sized relative to the fact tables, and Catalyst
auto-broadcasts under ``spark.sql.autoBroadcastJoinThreshold``; the
explicit ``F.broadcast`` hints document intent and keep the plan
stable when statistics are missing (e.g. fresh files, no ANALYZE) —
that's the plan shape that survives 1000 executors: fact table never
shuffles for a dim join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import dec_sum, ntz, r2, sql_query, t
from mcp_iceberg_duckdb_spark.registry import query


@query(
    "j_inner_equi",
    oracle="""
    SELECT o.o_orderkey, c.c_name, floor((o.o_totalprice) * 1e2 + 0.5) / 1e2 AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("join",),
)
def j_inner_equi(spark, sf_dir):
    """J1 inner equi-join, dim side broadcast: the orders scan never
    shuffles; the filtered customer dim ships to every task."""
    tt = t(spark, sf_dir)
    c = tt.customer.filter(F.col("c_mktsegment") == "BUILDING")
    return tt.orders.join(
        F.broadcast(c), tt.orders.o_custkey == c.c_custkey, "inner"
    ).select("o_orderkey", "c_name", r2("o_totalprice").alias("total"))


@query(
    "j_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    """,
    tags=("join",),
)
def j_left_outer(spark, sf_dir):
    """J1 left outer join with a join-side predicate (kept in the ON
    clause — moving it to WHERE would change outer semantics)."""
    tt = t(spark, sf_dir)
    o = tt.orders
    cond = (tt.customer.c_custkey == o.o_custkey) & (o.o_orderstatus == "F")
    return tt.customer.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@query(
    "j_right_outer",
    oracle="""
    SELECT n.n_name, s.s_suppkey
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    tags=("join",),
)
def j_right_outer(spark, sf_dir):
    """J1 right outer join (nations with no supplier keep a row)."""
    tt = t(spark, sf_dir)
    return tt.supplier.join(
        tt.nation, tt.supplier.s_nationkey == tt.nation.n_nationkey, "right"
    ).select("n_name", "s_suppkey")


@query(
    "j_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS key, count(*) AS n_cust
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS key, count(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.key, s.key) AS nationkey, c.n_cust, s.n_supp
    FROM c FULL OUTER JOIN s ON c.key = s.key
    """,
    tags=("join",),
)
def j_full_outer(spark, sf_dir):
    """J1 full outer join of two aggregates."""
    tt = t(spark, sf_dir)
    c = tt.customer.groupBy(F.col("c_nationkey").alias("key")).agg(
        F.count("*").alias("n_cust")
    )
    s = tt.supplier.groupBy(F.col("s_nationkey").alias("key")).agg(
        F.count("*").alias("n_supp")
    )
    return c.join(s, c.key == s.key, "full").select(
        F.coalesce(c.key, s.key).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "j_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0)
    """,
    tags=("join",),
)
def j_semi(spark, sf_dir):
    """J1 left semi join (EXISTS) — emits each customer at most once,
    never widens the row."""
    tt = t(spark, sf_dir)
    big = tt.orders.filter(F.col("o_totalprice") > 250000.0)
    return tt.customer.join(
        big, tt.customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "j_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def j_anti(spark, sf_dir):
    """J1 left anti join (NOT EXISTS)."""
    tt = t(spark, sf_dir)
    return tt.customer.join(
        tt.orders, tt.customer.c_custkey == tt.orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "j_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    tags=("join",),
)
def j_cross(spark, sf_dir):
    """J1 cross join (tiny×tiny only — a cross join of two fact
    tables is a plan bug at any scale)."""
    tt = t(spark, sf_dir)
    return tt.region.crossJoin(tt.nation).select("r_name", "n_name")


@query(
    "j_self",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    tags=("join",),
)
def j_self(spark, sf_dir):
    """J2 self join (same-region nation pairs; < dedups the pair)."""
    n = t(spark, sf_dir).nation
    a, b = n.alias("a"), n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))


@query(
    "j_nonequi",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey AND l.l_extendedprice > 40.0 * p.p_retailprice
    """,
    tags=("join",),
)
def j_nonequi(spark, sf_dir):
    """J3 equi-join + non-equi residual predicate — hash join on the
    equi key, residual evaluated in the probe (no nested loop)."""
    tt = t(spark, sf_dir)
    li, p = tt.lineitem, tt.part
    return li.join(
        F.broadcast(p),
        (li.l_partkey == p.p_partkey)
        & (li.l_extendedprice > 40.0 * p.p_retailprice),
    ).select("l_orderkey", "l_linenumber", "p_partkey")


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(floor(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("join", "flagship"),
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join, filters pushed to all three scans,
    dim (filtered customer) broadcast, agg, top-10. At cluster scale:
    lineitem⋈orders is the only shuffle (both sides large); AQE picks
    its strategy."""
    tt = t(spark, sf_dir)
    c = tt.customer.filter(F.col("c_mktsegment") == "BUILDING")
    o = tt.orders.filter(F.col("o_orderdate") < ntz("1998-03-15 00:00:00"))
    li = tt.lineitem.filter(F.col("l_shipdate") > ntz("1996-03-15 00:00:00"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(floor(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("join", "flagship"),
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join. All dims broadcast; the only
    shuffle is lineitem⋈orders. The c_nationkey = s_nationkey
    equality rides along as a residual condition."""
    tt = t(spark, sf_dir)
    r = tt.region.filter(F.col("r_name") == "ASIA")
    n = tt.nation.join(F.broadcast(r), tt.nation.n_regionkey == r.r_regionkey)
    s = tt.supplier.join(
        F.broadcast(n), tt.supplier.s_nationkey == F.col("n_nationkey")
    )
    o = tt.orders.filter(
        (F.col("o_orderdate") >= ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ntz("1998-01-01 00:00:00"))
    )
    li = tt.lineitem
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(tt.customer),
            (o.o_custkey == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return joined.groupBy("n_name").agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, floor((o.o_totalprice) * 1e2 + 0.5) / 1e2 AS total
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) o
WHERE c.c_custkey <= 30
"""


@query("j_lateral_topk", oracle=_LATERAL_SQL, tags=("join",))
def j_lateral_topk(spark, sf_dir):
    """LATERAL correlated subquery (top-2 orders per customer).
    Same SQL text in both dialects; Spark plans a lateral join."""
    return sql_query(_LATERAL_SQL)(spark, sf_dir)
