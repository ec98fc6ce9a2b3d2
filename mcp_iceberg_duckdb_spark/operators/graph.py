"""Iterative graph analytics (tier X — SURVEY.md §2.11): PageRank
over the customer⇄supplier co-purchase graph — the second iterative
operator family after connected components (dedup.py), showing the
general Pregel-lite shape: per-iteration contribution join + node
groupBy, plan truncated with localCheckpoint at scale.

Determinism discipline: ranks live in int64 MICRO-units and every
update is integer arithmetic — r'(v) = 150000 + Σ_{u→v}
(850000·(r(u) div deg(u))) div 1e6 — so there is no float summation
order anywhere and both engines produce bit-identical ranks. The
DuckDB oracle unrolls the same fixed iteration count as chained CTEs
(recursive CTEs disallow aggregation in the recursive term).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import rn, t
from mcp_iceberg_duckdb_spark.registry import query

_PR_ITERS = 5
_PR_ONE = 1_000_000  # rank 1.0 in micro-units
_PR_JUMP = 150_000  # (1 − 0.85) in micro-units
_PR_DAMP = 850_000  # 0.85 in micro-units


def _oracle_sql() -> str:
    """Fixed-iteration PageRank as chained CTEs, integer-exact."""
    parts = [
        """
    WITH edges_d AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT src, dst FROM edges_d
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges_d
    ),
    deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
    pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg)"""
    ]
    for i in range(_PR_ITERS):
        parts.append(
            f""",
    pr{i + 1} AS (
        SELECT e.dst AS node,
               CAST({_PR_JUMP} + ({_PR_DAMP} * sum(p.r // d.d)) // 1000000
                    AS BIGINT) AS r
        FROM edges e
        JOIN pr{i} p ON p.node = e.src
        JOIN deg d ON d.node = e.src
        GROUP BY e.dst
    )"""
        )
    parts.append(
        f"""
    SELECT node,
           floor((CAST(r AS DOUBLE) / 1e6) * 1e6 + 0.5) / 1e6 AS pagerank
    FROM pr{_PR_ITERS}"""
    )
    return "".join(parts)


@query("x_graph_pagerank", oracle=_oracle_sql(), tags=("graph", "tierx"))
def x_graph_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, 5 iterations) on the bipartite
    customer⇄supplier graph induced by co-purchases (node ids:
    customer 2k, supplier 2k+1; edges symmetric, so there are no
    dangling nodes and rank mass needs no dangling redistribution).

    Spark shape: the distinct edge relation and per-node degrees are
    computed once and reused across iterations; each iteration is ONE
    contribution join (edges ⋈ ranks, both sides partitioned on the
    join key — AQE reuses the exchange) + ONE node groupBy with
    map-side combine. State per iteration is the node-rank relation
    (|V| rows of two int64s), never collected. At 100 TB the loop adds
    localCheckpoint(eager=False) per round like the CC operator
    (dedup.py) to truncate lineage; at fixture scale the 5-iteration
    plan stays a plain unrolled DAG, which also keeps the builder
    side-effect-free for the oracle compare.

    Integer-exact determinism: see module docstring — div-based
    updates make float summation order irrelevant; both engines agree
    bit-for-bit, and the only rounding is the final display de-scale."""
    o = t(spark, sf_dir).orders.select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir).lineitem.select("l_orderkey", "l_suppkey")
    ed = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = ed.unionByName(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d")
    )
    # localCheckpoint (the CC-loop precedent, dedup.py): the unrolled
    # 5-iteration DAG would otherwise INLINE the orders⋈lineitem
    # edge-building subtree into every iteration — 49 shuffles and 40
    # joins of plan, all AQE/codegen overhead. Checkpointing the
    # (src, d) contribution relation once truncates the lineage so
    # each iteration plans as scan ⋈ ranks + one groupBy.
    contrib_src = edges.join(
        deg.select(F.col("node").alias("src"), "d"), "src"
    ).localCheckpoint()
    ranks = contrib_src.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(_PR_ONE).cast("bigint").alias("r")
    )
    # per-edge flow r div d (int64, ≤ r), damping factored OUT of the
    # sum so every intermediate stays far inside int64:
    # r' = 150000 + (850000 · Σ(r div d)) div 1e6 — all integer ops.
    for _ in range(_PR_ITERS):
        ranks = (
            contrib_src.join(
                ranks.select(F.col("node").alias("src"), "r"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("r div d")).alias("s"))
            .select(
                "node",
                (
                    F.lit(_PR_JUMP)
                    + F.expr(f"({_PR_DAMP} * s) div 1000000")
                )
                .cast("bigint")
                .alias("r"),
            )
        )
    return ranks.select(
        "node", rn(F.col("r").cast("double") / F.lit(1e6), 6).alias("pagerank")
    )


# ---- Z-order layout key (data-layout lever: multi-column pruning) ----

_Z_BITS = 16
_Z_EPOCH = "DATE '1992-01-01'"


def _z_interleave(a, b):
    """Bit-interleave two 16-bit ints into one 32-bit Morton (Z-order)
    key — pure shift/mask expressions, identical in both engines."""
    z = F.lit(0).cast("bigint")
    for i in range(_Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _z_sql(a: str, b: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


@query(
    "x_layout_zorder",
    oracle=f"""
    SELECT o_orderkey,
           {_z_sql("(o_custkey & 65535)",
                   f"(datediff('day', {_Z_EPOCH}, o_orderdate) & 65535)")}
               AS zval
    FROM orders
    """,
    tags=("layout", "tierx"),
)
def x_layout_zorder(spark, sf_dir):
    """Z-order (Morton) layout key over (customer, order-date) — the
    data-LAYOUT lever: writing a table sorted by the interleaved key
    clusters rows that are close in BOTH dimensions into the same
    parquet row groups, so min/max statistics prune multi-column
    box predicates that a single-column sort can only prune on its
    leading column. tests/test_partitioning.py measures the effect
    directly on row-group stats: the z-sorted layout scans a fraction
    of the row groups the key-sorted layout needs for a
    (custkey-range AND date-range) query.

    Pure shift/mask integer expressions (shuffle-free map over the
    scan; the sort that USES the key is a one-off write-side cost).
    At 100 TB this is the Delta/Iceberg OPTIMIZE ZORDER shape:
    compute key → range-partition by it → write; nothing collects."""
    o = t(spark, sf_dir).orders
    ck = F.col("o_custkey").bitwiseAND(F.lit(65535)).cast("bigint")
    dd = (
        F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1992-01-01")))
        .bitwiseAND(F.lit(65535))
        .cast("bigint")
    )
    return o.select("o_orderkey", _z_interleave(ck, dd).alias("zval"))


# ---- Triangle counting (degree-ordered wedge join) ----

_TRI_ORACLE = """
    WITH e AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    tri AS (
        SELECT e1.u AS x, e1.v AS y, e2.v AS z
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pernode AS (
        SELECT node, count(*) AS tri_count
        FROM (SELECT unnest([x, y, z]) AS node FROM tri)
        GROUP BY node
    )
    SELECT s.s_suppkey, CAST(coalesce(p.tri_count, 0) AS BIGINT) AS tri_count
    FROM supplier s LEFT JOIN pernode p ON p.node = s.s_suppkey
"""


@query("x_graph_triangles", oracle=_TRI_ORACLE, tags=("graph", "tierx"))
def x_graph_triangles(spark, sf_dir):
    """Per-supplier triangle counts on the supplier co-occurrence
    graph (edge = two suppliers fulfilled lineitems of the same
    order). Triangle counting is the standard graph-quality /
    community-density audit, and the distributed-shape benchmark for
    wedge-join algorithms.

    Spark shape — the Suri-Vassilvitskii (WWW'11) degree-ordered
    wedge join: each canonical edge is ORIENTED from its
    lower-(degree, id) endpoint to the higher, so every wedge is
    generated exactly once at its lowest-ranked vertex and the wedge
    count is bounded by O(m^1.5) REGARDLESS of skew — a hub of degree
    D generates no wedges at itself beyond neighbors of higher rank,
    the failure mode that kills id-ordered implementations at 100 TB.
    One distinct (co-occurrence pairs dedup), one degree groupBy
    (broadcast back onto the edges — |V| = supplier-dim rows, the
    small dimension; at extreme |V| AQE demotes the hint to shuffle),
    one self-join on the wedge apex, one semi-join against the
    closing edge, one explode + groupBy for per-node counts. Nothing
    iterative, nothing collected.

    The DuckDB oracle orients by supplier id instead (correct for any
    total order, merely slower) — both engines count the identical
    triangle set, so per-node counts match bit-for-bit (pure int64).

    Reference parity: co-occurrence analytics are inexpressible in
    the reference's single-table SELECT surface (QueryManager.py:79-81).
    """
    li = t(spark, sf_dir).lineitem.select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .distinct()
    )
    both = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = both.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("d"))
    # total-order rank key (deg, id) packed into one int64: suppkey is
    # far below 1e9, degree below 1e9 — key = d*1e9 + id never overflows
    key = deg.select(
        "node", (F.col("d") * F.lit(1_000_000_000) + F.col("node")).alias("k")
    )
    ed = (
        und.join(F.broadcast(key.withColumnsRenamed({"node": "u", "k": "ku"})), "u")
        .join(F.broadcast(key.withColumnsRenamed({"node": "v", "k": "kv"})), "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.least("ku", "kv").alias("src_k"),
            F.greatest("ku", "kv").alias("dst_k"),
        )
    )
    e1 = ed.alias("e1")
    e2 = ed.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (F.col("e1.dst_k") < F.col("e2.dst_k")),
    ).select(
        F.col("e1.src").alias("x"),
        F.col("e1.dst").alias("y"),
        F.col("e2.dst").alias("z"),
    )
    tri = wedges.join(
        ed.select(F.col("src").alias("y"), F.col("dst").alias("z")),
        ["y", "z"],
        "leftsemi",
    )
    pernode = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("tri_count"))
    )
    s = t(spark, sf_dir).supplier.select("s_suppkey")
    return s.join(
        pernode, s.s_suppkey == pernode.node, "left"
    ).select(
        "s_suppkey",
        F.coalesce(F.col("tri_count"), F.lit(0)).cast("bigint").alias("tri_count"),
    )
