"""Second batch of TPC-H-shaped flagships (Q8/Q9/Q11/Q13/Q16/Q17/Q21
shapes, adapted to the fixture schema — there is no partsupp table,
so Q11/Q16 re-root their part-supplier relation on the distinct
(l_partkey, l_suppkey) pairs observed in lineitem, and Q21's
"late" predicate uses l_shipdate vs o_orderdate + 90 days since the
fixtures carry no commit/receipt dates).

These cover the join/agg patterns the first batch lacks: ratio-of-
conditional-sums per group (Q8), LIKE-filtered multi-join rollup
(Q9), HAVING vs scalar-subquery-of-the-same-CTE (Q11), outer join
with ON-clause residual + two-level aggregation (Q13), distinct
pairs + NOT IN anti join + COUNT DISTINCT (Q16), join against a
per-group average (decorrelated correlated-scalar, Q17), and
EXISTS/NOT EXISTS on the same fact under different correlations
(Q21). Reference parity note: all are tier-D surface — the reference
delegates SELECT text to embedded DuckDB (IcebergConnection.py:114-116)
but forbids multi-table queries (QueryManager.py:79-81); these lift
that restriction the Spark-native way.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import dec_sum, ntz, rn, t
from mcp_iceberg_duckdb_spark.registry import query

_DEC = "decimal(18,6)"


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           floor((CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY o_year
    """,
    tags=("join", "flagship"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: national market share — one supplier nation's slice
    of regional revenue per year, a ratio of two conditional sums.
    Plan: lineitem⋈orders is the only shuffled join; customer,
    supplier, both nation roles, region, and part all broadcast. Both
    numerator and denominator accumulate as exact decimals in ONE
    aggregate pass (no second scan), and the ratio is taken in double
    at the very end — the same float contract as the DuckDB oracle."""
    tt = t(spark, sf_dir)
    o = tt.orders.filter(
        (F.col("o_orderdate") >= ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ntz("1998-01-01 00:00:00"))
    )
    n1 = tt.nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = tt.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        tt.lineitem.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(tt.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            F.broadcast(tt.region.filter(F.col("r_name") == "ASIA")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(tt.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(
            F.broadcast(tt.part.filter(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    nation_vol = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero)
    return joined.groupBy(
        F.year("o_orderdate").alias("o_year")
    ).agg(
        rn(
            F.sum(nation_vol).cast("double") / F.sum(vol).cast("double"), 6
        ).alias("mkt_share")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(floor(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INTEGER)
    """,
    tags=("join", "flagship"),
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit on a product line by supplier nation
    and year (fixtures have no partsupp, so profit = discounted
    revenue without the supplycost term). The '%widget%' LIKE prunes
    part FIRST, the pruned part broadcasts into lineitem, and only
    matching lineitem rows reach the orders shuffle — filter-early
    ordering that matters far more at 100 TB than at sf0.1."""
    tt = t(spark, sf_dir)
    p = tt.part.filter(F.col("p_name").like("%widget%"))
    joined = (
        tt.lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(tt.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(tt.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(tt.nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "profit"
            )
        )
    )


_Q11_SQL = """
WITH val AS (
    SELECT l.l_partkey AS partkey,
           sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS value_dec
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY l.l_partkey
)
SELECT partkey,
       floor((value_dec) * 1e2 + 0.5) / 1e2 AS part_value
FROM val
WHERE CAST(value_dec AS DOUBLE) >
      (SELECT CAST(sum(value_dec) AS DOUBLE) * 0.002 FROM val)
"""


@query("q11_important_parts", oracle=_Q11_SQL, tags=("join", "flagship"))
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose one-nation revenue exceeds a
    fraction of that nation's total — the same CTE consumed as both
    the row stream and a scalar-subquery total. Fixtures lack
    partsupp, so 'value' is NATION_3-supplied discounted revenue per
    part. Same SQL text through Catalyst and DuckDB; sums stay exact
    decimal until the final double threshold compare, so both engines
    face identical IEEE comparisons."""
    from mcp_iceberg_duckdb_spark.operators._util import sql_query

    return sql_query(_Q11_SQL)(spark, sf_dir)


@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    """,
    tags=("join", "flagship"),
)
def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13: how many customers placed k orders — left outer
    join with a residual predicate in the ON clause (an URGENT order
    must not count, but a customer with only URGENT orders must still
    appear with c_count=0 — pushing the predicate to WHERE would
    silently drop them), then a second aggregation over the first.
    The outer join shuffles on custkey and the histogram re-shuffles
    on the count — at scale the second exchange is tiny (≤ distinct
    counts rows per partition after partial agg)."""
    tt = t(spark, sf_dir)
    o = tt.orders.select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        tt.customer.join(
            o,
            (tt.customer.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_size, count(DISTINCT ps.suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND ps.suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_size
    """,
    tags=("join", "flagship"),
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier count per brand/size,
    excluding a brand, a type, and blacklisted (negative-balance)
    suppliers. The part-supplier relation is re-derived as DISTINCT
    (l_partkey, l_suppkey) since fixtures lack partsupp. NOT IN maps
    to a left-anti join against the (broadcast, tiny) blacklist;
    COUNT(DISTINCT) expands to the standard two-phase expand/agg."""
    tt = t(spark, sf_dir)
    ps = (
        tt.lineitem.select(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .distinct()
    )
    p = tt.part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad = tt.supplier.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        ps.join(F.broadcast(p), ps.partkey == p.p_partkey)
        .join(
            F.broadcast(bad), ps.suppkey == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey AS pk,
               0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*)) AS qty_threshold
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS total_revenue,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa     ON pa.pk = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < pa.qty_threshold
    """,
    tags=("join", "flagship"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue from below-half-average-quantity line items
    — the classic correlated scalar aggregate, written directly in
    its decorrelated form (per-part avg aggregated once, joined
    back) which is exactly the plan Catalyst rewrites the correlated
    subquery into. The threshold is an exact-decimal sum divided by a
    count, so Spark and DuckDB derive bit-identical doubles and the
    boundary compare cannot diverge. At scale the pa aggregate is
    ~|part| rows → broadcast back into the fact scan."""
    tt = t(spark, sf_dir)
    pa = (
        tt.lineitem.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (
                0.5
                * (
                    F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
                    / F.count("*")
                )
            ).alias("qty_threshold")
        )
    )
    li = tt.lineitem.join(
        F.broadcast(tt.part.filter(F.col("p_brand") == "Brand#3")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            dec_sum(F.col("l_extendedprice")).alias("total_revenue"),
            F.count("*").alias("n"),
        )
    )


_Q21_LATE_DOC = """TPC-H Q21 shape: suppliers who were the ONLY late
shipper on a finished multi-supplier order ("late" = shipped more
than 90 days after the order date; fixtures carry no commit/receipt
dates). Two correlations against the same fact table with opposite
polarity: EXISTS(another supplier on the order) → left-semi,
NOT EXISTS(another LATE supplier on the order) → left-anti. The
`late` set is computed once and reused for both the driving rows and
the anti side; order keys shuffle-partition all three joins
identically, so AQE can reuse the exchange."""


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey AS lo, l.l_suppkey AS ls
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.ls
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.lo AND l2.l_suppkey <> l1.ls
    )
    AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.lo = l1.lo AND l3.ls <> l1.ls
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    tags=("join", "flagship"),
)
def q21_waiting_supplier(spark, sf_dir):
    tt = t(spark, sf_dir)
    finished = tt.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        tt.lineitem.join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select(F.col("l_orderkey").alias("lo"), F.col("l_suppkey").alias("ls"))
    )
    l2 = tt.lineitem.select(
        F.col("l_orderkey").alias("lo2"), F.col("l_suppkey").alias("ls2")
    )
    l3 = late.select(F.col("lo").alias("lo3"), F.col("ls").alias("ls3"))
    survivors = (
        late.join(
            l2,
            (F.col("lo") == F.col("lo2")) & (F.col("ls") != F.col("ls2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("lo") == F.col("lo3")) & (F.col("ls") != F.col("ls3")),
            "left_anti",
        )
    )
    return (
        survivors.join(F.broadcast(tt.supplier), F.col("ls") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


q21_waiting_supplier.__doc__ = _Q21_LATE_DOC


_Q2_SQL = """
WITH observed AS (
    SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey AS suppkey
    FROM lineitem l
),
ranked AS (
    SELECT o.partkey, o.suppkey, s.s_acctbal, s.s_name, n.n_name
    FROM observed o
    JOIN supplier s ON s.s_suppkey = o.suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
)
SELECT p.p_partkey, p.p_name, rk.s_name, rk.n_name, floor((rk.s_acctbal) * 1e2 + 0.5) / 1e2 AS acctbal
FROM ranked rk
JOIN part p ON p.p_partkey = rk.partkey
WHERE p.p_size = 15
  AND rk.s_acctbal = (
      SELECT min(rk2.s_acctbal) FROM ranked rk2 WHERE rk2.partkey = rk.partkey
  )
  AND rk.suppkey = (
      SELECT min(rk3.suppkey) FROM ranked rk3
      WHERE rk3.partkey = rk.partkey AND rk3.s_acctbal = rk.s_acctbal
  )
"""


@query("q2_min_cost_supplier", oracle=_Q2_SQL, tags=("join", "flagship"))
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: the cheapest European supplier for each
    size-15 part (fixtures lack partsupp/ps_supplycost, so the
    part-supplier relation is the observed lineitem pairs and 'cost'
    is s_acctbal ascending). The correlated min subquery — plus a
    min-suppkey tiebreak so the answer is a total function — is the
    argmin-per-group pattern. Same SQL text in both dialects; on the
    Spark side Catalyst decorrelates both subqueries into aggregate
    joins over the shared `ranked` CTE. s_acctbal equality compares
    raw parquet doubles (no arithmetic), so the oracle cannot
    diverge."""
    from mcp_iceberg_duckdb_spark.operators._util import sql_query

    return sql_query(_Q2_SQL)(spark, sf_dir)


_Q20_SQL = """
WITH red_parts AS (
    SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
),
shipped AS (
    SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
           sum(CAST(l.l_quantity AS DECIMAL(18,6))) AS qty
    FROM lineitem l JOIN red_parts g ON l.l_partkey = g.p_partkey
    GROUP BY l.l_partkey, l.l_suppkey
),
part_total AS (
    SELECT partkey, sum(qty) AS total_qty FROM shipped GROUP BY partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM shipped sh
JOIN part_total pt ON pt.partkey = sh.partkey
JOIN supplier s    ON s.s_suppkey = sh.suppkey
JOIN nation n      ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_7'
  AND CAST(sh.qty AS DOUBLE) > 0.1 * CAST(pt.total_qty AS DOUBLE)
"""


@query("q20_excess_share_suppliers", oracle=_Q20_SQL, tags=("join", "flagship"))
def q20_excess_share_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: NATION_7 suppliers holding an outsized share
    (>10%) of any red part's shipped volume (fixtures lack
    partsupp/availqty, so 'stock share' is shipped-quantity share).
    Nested aggregation at two grains — per (part, supplier) then per
    part — with the part-grain total joined back; quantities stay
    exact decimals until one final double compare shared verbatim
    with the oracle. Same SQL text through Catalyst and DuckDB."""
    from mcp_iceberg_duckdb_spark.operators._util import sql_query

    return sql_query(_Q20_SQL)(spark, sf_dir)


_FULFILL_ORACLE = """
    WITH first_ship AS (
        SELECT l_orderkey, min(l_shipdate) AS ship0
        FROM lineitem GROUP BY l_orderkey
    ),
    lat AS (
        SELECT o.o_orderpriority,
               CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                             CAST(f.ship0 AS DATE)) AS BIGINT) AS days
        FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(min(days) AS BIGINT) AS min_days,
           CAST(max(days) AS BIGINT) AS max_days,
           floor((quantile_cont(CAST(days AS DOUBLE), 0.5)) * 1e2 + 0.5)
               / 1e2 AS p50_days,
           floor((quantile_cont(CAST(days AS DOUBLE), 0.9)) * 1e2 + 0.5)
               / 1e2 AS p90_days
    FROM lat GROUP BY o_orderpriority
"""


@query(
    "q23_fulfillment_latency", oracle=_FULFILL_ORACLE, tags=("tpch", "join")
)
def q23_fulfillment_latency(spark, sf_dir):
    """Order-fulfillment SLA (a TPC-H-style addition beyond the 22):
    days from order date to FIRST shipment, percentile-banded per
    order priority — the operational latency readout the
    orders⋈lineitem pair naturally supports.

    Spark shape: one lineitem groupBy (min shipdate per order — the
    fact-side reduce), one join to orders on the order key, one
    priority groupBy with exact interpolated percentiles over
    integer day counts (s_latency_percentiles discipline).

    Fixture note: the synthetic order/ship dates are drawn
    independently, so negative latencies appear — parity-irrelevant,
    but any real-data reading would add a ship0 >= orderdate DQ rule
    (x_dq_audit's referential family)."""
    tt = t(spark, sf_dir)
    first_ship = tt.lineitem.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("ship0")
    )
    lat = tt.orders.join(
        first_ship, tt.orders.o_orderkey == first_ship.l_orderkey
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("ship0").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("bigint")
        .alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.min("days").cast("bigint").alias("min_days"),
        F.max("days").cast("bigint").alias("max_days"),
        rn(F.percentile(F.col("days").cast("double"), F.lit(0.5)), 2).alias(
            "p50_days"
        ),
        rn(F.percentile(F.col("days").cast("double"), F.lit(0.9)), 2).alias(
            "p90_days"
        ),
    )
