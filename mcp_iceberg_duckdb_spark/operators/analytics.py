"""Product/retail analytics (tier X — SURVEY.md §2.11): market-basket
association rules and deterministic A/B experiment evaluation — the
decision-support layer a curation pipeline's event/transaction side
feeds. Inexpressible in the reference's single-table SELECT surface
(reference QueryManager.py:79-81: joins unsupported).

Determinism discipline: supports/counts are int64; lift/confidence
are integer-division micro-units; the z statistic is an IEEE chain
over exact integer counts (identical in both engines) quantized to
6dp before any comparison."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import cap_basket, t
from mcp_iceberg_duckdb_spark.registry import query

# ---- market-basket association rules (support / confidence / lift) ----

_MB_MINSUP = 3  # minimum pair support (co-occurrence count)
_MB_TOPK = 20
# per-order cap on parts entering the pair join (see _util.cap_basket):
# a no-op on organic TPC-H baskets (≤ 7 parts/order), a hard Σ basket²
# bound against a planted hot basket
_MB_BASKET_CAP = 64

_MB_ORACLE = f"""
    WITH i0 AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    i AS (
        SELECT l_orderkey, l_partkey FROM (
            SELECT l_orderkey, l_partkey,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_partkey) AS brn
            FROM i0
        ) WHERE brn <= {_MB_BASKET_CAP}
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM i),
    cnt AS (SELECT l_partkey, count(*) AS c FROM i GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS c_ab
        FROM i a JOIN i b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= {_MB_MINSUP}
    )
    SELECT pa, pb, c_ab,
           (c_ab * 1000000) // n.n_orders AS support_ppm,
           (c_ab * 1000000) // ca.c AS conf_micro,
           (c_ab * n.n_orders * 1000000) // (ca.c * cb.c) AS lift_micro
    FROM pairs
    JOIN cnt ca ON ca.l_partkey = pa
    JOIN cnt cb ON cb.l_partkey = pb
    CROSS JOIN n
    ORDER BY lift_micro DESC, pa, pb
    LIMIT {_MB_TOPK}
"""


@query("x_market_basket_lift", oracle=_MB_ORACLE, tags=("analytics", "tierx"))
def x_market_basket_lift(spark, sf_dir):
    """Top association rules over order baskets: for part pairs
    co-purchased in ≥ 3 orders, support, confidence P(b|a)
    and lift P(a,b)/(P(a)·P(b)) — the classic market-basket screen
    (Agrawal-Srikant shape, materialized at the pair level).

    Spark shape: the distinct (order, part) relation builds once and
    is basket-capped (cap_basket, smallest 64 parts per order — a
    no-op at TPC-H's ~4 items/order, a hard guard against one hot
    basket's quadratic pair fan-out); the pair join is then ONE
    self-join on the order key whose fan-out is Σ min(basket, 64)².
    Item counts and the 1-row order count broadcast
    back onto the ≥minsup pair relation; the head is a totally
    ordered TakeOrdered (lift desc, pa, pb).

    Determinism: all three metrics are integer division over exact
    int64 counts (micro/ppm units) — no float anywhere. int64
    headroom: c_ab·n_orders·1e6 at fixture scale ≤ 1e17; at larger
    corpora widen to DECIMAL before the multiply (same plan)."""
    li = t(spark, sf_dir).lineitem
    # cap_basket bounds the Σ basket² pair fan-out against a
    # pathological hot order BEFORE any counting, so supports,
    # confidences and lifts are all defined on the same capped
    # relation in both engines (no-op at organic TPC-H basket sizes;
    # tests/test_diagnostics.py plants a hot basket and checks the
    # bound). The window's hash partitioning on l_orderkey is the
    # partitioning the pair self-join reuses.
    items = cap_basket(
        li.select("l_orderkey", "l_partkey").distinct(),
        "l_orderkey",
        "l_partkey",
        _MB_BASKET_CAP,
    )
    n = items.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    cnt = items.groupBy("l_partkey").agg(F.count("*").alias("c"))
    # Apriori prune (anti-monotonicity): a pair with support ≥ minsup
    # can only contain parts whose INDIVIDUAL support is ≥ minsup —
    # semi-join items down to frequent parts before the pair join,
    # shrinking the Σ basket² fan-out without changing the result.
    # (At THIS fixture's density — mean part support ≈28 vs minsup 3 —
    # the prune removes almost nothing; at production minsup ratios
    # it is the step that keeps the pair join tractable.)
    frequent = cnt.where(F.col("c") >= _MB_MINSUP).select("l_partkey")
    items = items.join(F.broadcast(frequent), "l_partkey", "leftsemi")
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= _MB_MINSUP)
    )
    ca = cnt.select(F.col("l_partkey").alias("pa"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("l_partkey").alias("pb"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(ca), "pa")
        .join(F.broadcast(cb), "pb")
        .crossJoin(F.broadcast(n))
        .select(
            "pa",
            "pb",
            "c_ab",
            F.expr("(c_ab * 1000000) div n_orders").alias("support_ppm"),
            F.expr("(c_ab * 1000000) div ca").alias("conf_micro"),
            F.expr("(c_ab * n_orders * 1000000) div (ca * cb)").alias(
                "lift_micro"
            ),
        )
        .orderBy(F.col("lift_micro").desc(), "pa", "pb")
        .limit(_MB_TOPK)
    )


# ---- deterministic A/B split + two-proportion z-test ----

_AB_ORACLE = """
    WITH assign AS (
        SELECT user_id,
               substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 1) < '8'
                   AS in_a,
               CASE WHEN count(*) FILTER (WHERE event_type = 'purchase')
                         >= 14 THEN 1 ELSE 0 END AS converted
        FROM events
        GROUP BY user_id
    ),
    counts AS (
        SELECT count(*) FILTER (WHERE in_a) AS n_a,
               count(*) FILTER (WHERE NOT in_a) AS n_b,
               CAST(sum(converted) FILTER (WHERE in_a) AS BIGINT)
                   AS conv_a,
               CAST(sum(converted) FILTER (WHERE NOT in_a) AS BIGINT)
                   AS conv_b
        FROM assign
    )
    SELECT n_a, n_b, conv_a, conv_b,
           (conv_a * 1000000) // n_a AS rate_a_ppm,
           (conv_b * 1000000) // n_b AS rate_b_ppm,
           CAST(floor(
               ((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                       * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                       * (1.0 / n_a + 1.0 / n_b))) * 1e6 + 0.5
           ) AS BIGINT) AS z_micro,
           abs(CAST(floor(
               ((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                       * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                       * (1.0 / n_a + 1.0 / n_b))) * 1e6 + 0.5
           ) AS BIGINT)) > 1959964 AS significant
    FROM counts
"""


@query("x_ab_test_ztest", oracle=_AB_ORACLE, tags=("analytics", "tierx"))
def x_ab_test_ztest(spark, sf_dir):
    """A/B experiment evaluation with a DETERMINISTIC hash
    assignment: users split into arms by an md5 bucket of the user
    id (the salted-hash assignment real experiment platforms use —
    reproducible under reruns, retries and repartitioning, never a
    random() draw), conversion = a heavy-purchaser flag (≥14
    purchase events — the fixture's per-user median, so both rates
    sit strictly inside (0, 1) at every scale factor), then the
    two-proportion pooled z-test.

    Spark shape: one per-user groupBy (assignment is a codegen'd
    expression riding it), then a single 1-row four-way conditional
    count — two linear passes, no joins, no window. At 100 TB the
    per-user reduce is the only shuffle.

    Determinism: counts are exact int64; the z statistic is one
    fixed-shape IEEE expression over those ints (identical operation
    order in both engines), quantized to micro-units BEFORE the
    significance comparison (|z| > 1.959964) so the flag can never
    straddle an ulp."""
    e = t(spark, sf_dir).events
    assign = (
        e.groupBy("user_id")
        .agg(
            (
                F.count_if(F.col("event_type") == "purchase") >= 14
            )
            .cast("int")
            .alias("converted")
        )
        .withColumn(
            "in_a",
            F.substring(
                F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
                1,
                1,
            )
            < "8",
        )
    )
    counts = assign.agg(
        F.count_if(F.col("in_a")).alias("n_a"),
        F.count_if(~F.col("in_a")).alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("converted"))).alias("conv_a"),
        F.sum(F.when(~F.col("in_a"), F.col("converted"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    z_micro = F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    return counts.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.expr("(conv_a * 1000000) div n_a").alias("rate_a_ppm"),
        F.expr("(conv_b * 1000000) div n_b").alias("rate_b_ppm"),
        z_micro.alias("z_micro"),
        (F.abs(z_micro) > F.lit(1_959_964)).alias("significant"),
    )


# ---- skyline (Pareto front) over per-user purchase stats ----

_SKY_ORACLE = """
    WITH stats AS (
        SELECT user_id,
               count(*) AS freq,
               CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
                   AS monetary_cents,
               CAST(epoch_us((SELECT max(ts) FROM events
                              WHERE event_type = 'purchase'))
                    - epoch_us(max(ts)) AS BIGINT) AS recency_us
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    )
    SELECT s.user_id, s.freq, s.monetary_cents, s.recency_us
    FROM stats s
    WHERE NOT EXISTS (
        SELECT 1 FROM stats d
        WHERE d.freq >= s.freq
          AND d.monetary_cents >= s.monetary_cents
          AND d.recency_us <= s.recency_us
          AND (d.freq > s.freq
               OR d.monetary_cents > s.monetary_cents
               OR d.recency_us < s.recency_us)
    )
"""


@query("x_skyline_pareto", oracle=_SKY_ORACLE, tags=("analytics", "tierx"))
def x_skyline_pareto(spark, sf_dir):
    """Skyline (Pareto-front) query over per-user purchase stats:
    the users no one else dominates on (frequency↑, monetary↑,
    recency↓) simultaneously — the multi-criteria "best customers"
    set that no single scoring function can rank (EDBT'23 studied
    integrating exactly this operator into Spark SQL; Börzsönyi 2001
    is the original skyline operator).

    Spark shape: the expensive part is the per-user reduce over the
    event log (one groupBy — the same relation RFM builds); the
    skyline itself runs on that |users|-row relation as a
    dominance ANTI-join (broadcast both sides). The 100 TB path for
    skylines over UNAGGREGATED corpora is the standard two-phase
    identity skyline(S) = skyline(∪ᵢ skyline(partitionᵢ)) — local
    fronts per partition, then one small merged front; here the
    aggregation step already plays the reducing role.

    Determinism: all three criteria are exact int64 (count, cents
    sum, µs recency anchored at corpus max); dominance is pure
    integer comparison — no scoring, no ordering, no ties to
    break."""
    e = t(spark, sf_dir).events
    p = e.where(F.col("event_type") == "purchase")
    anchor = p.agg(F.max("ts").alias("now_ts"))
    stats = (
        p.groupBy("user_id")
        .agg(
            F.count("*").alias("freq"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("monetary_cents"),
            F.max("ts").alias("last_ts"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            "freq",
            "monetary_cents",
            (
                F.unix_micros(F.col("now_ts").cast("timestamp"))
                - F.unix_micros(F.col("last_ts").cast("timestamp"))
            )
            .cast("bigint")
            .alias("recency_us"),
        )
    )
    d = stats.select(
        F.col("freq").alias("d_freq"),
        F.col("monetary_cents").alias("d_mon"),
        F.col("recency_us").alias("d_rec"),
    )
    dominated = (
        (F.col("d_freq") >= F.col("freq"))
        & (F.col("d_mon") >= F.col("monetary_cents"))
        & (F.col("d_rec") <= F.col("recency_us"))
        & (
            (F.col("d_freq") > F.col("freq"))
            | (F.col("d_mon") > F.col("monetary_cents"))
            | (F.col("d_rec") < F.col("recency_us"))
        )
    )
    return stats.join(F.broadcast(d), dominated, "left_anti")


# ---- chi-square test of independence (contingency rollup) ----


@query(
    "x_stats_chi2_independence",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS rk, o_orderstatus AS ck,
               CAST(count(*) AS BIGINT) AS obs
        FROM orders GROUP BY 1, 2
    ),
    m AS (
        SELECT rk, ck, obs,
               sum(obs) OVER (PARTITION BY rk) AS row_tot,
               sum(obs) OVER (PARTITION BY ck) AS col_tot,
               sum(obs) OVER () AS n
        FROM cells
    ),
    contrib AS (
        SELECT n,
               (CAST(obs AS HUGEINT) * n
                - CAST(row_tot AS HUGEINT) * col_tot) AS d,
               (CAST(n AS DOUBLE) * CAST(row_tot AS DOUBLE)
                * CAST(col_tot AS DOUBLE)) AS den
        FROM m
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST((SELECT (count(DISTINCT rk) - 1)
                      * (count(DISTINCT ck) - 1) FROM cells)
               AS BIGINT) AS dof,
           CAST(sum(CAST(floor(((CAST(d AS DOUBLE) * CAST(d AS DOUBLE))
                                / den) * 1e6 + 0.5)
                         AS BIGINT)) AS BIGINT) AS chi2_micro
    FROM contrib
    """,
    tags=("stats", "tierx"),
)
def x_stats_chi2_independence(spark, sf_dir):
    """Pearson chi-square test of independence over the (order
    priority × order status) contingency table — the categorical
    companion to x_ab_test_ztest. Exact integer rational throughout:
    the per-cell term (obs − exp)²/exp with exp = row·col/N is
    rewritten as D²/(N·row·col) with D = obs·N − row·col. D² can
    overflow int64 once the corpus passes ~3e9·cell-share (it did at
    sf0.1), so the per-cell term runs in IEEE doubles — D and den are
    integer-exact in double, the multiply/divide are correctly
    rounded, and the term is micro-quantized (the rn() discipline)
    BEFORE the sum, which is then an exact int64 add: deterministic
    at any partitioning, identical in both engines.

    Spark shape: one map-side-combined groupBy to the R×C cell
    relation, window totals over it (|cells| rows, not corpus rows),
    one scalar aggregate. At 100 TB the statistic costs exactly the
    contingency rollup — the same plan a BI cube already runs."""
    from pyspark.sql import Window as W

    o = t(spark, sf_dir).orders
    cells = o.groupBy(
        F.col("o_orderpriority").alias("rk"),
        F.col("o_orderstatus").alias("ck"),
    ).agg(F.count("*").cast("bigint").alias("obs"))
    m = cells.select(
        "rk",
        "ck",
        "obs",
        F.sum("obs").over(W.partitionBy("rk")).alias("row_tot"),
        F.sum("obs").over(W.partitionBy("ck")).alias("col_tot"),
        F.sum("obs").over(W.partitionBy()).alias("n"),
    )
    contrib = m.select(
        "n",
        "rk",
        "ck",
        # DECIMAL(38,0): obs*n approaches n^2, past int64 at ~3e9 rows
        # (the same class den already escaped to doubles)
        (
            F.col("obs").cast("decimal(38,0)") * F.col("n")
            - F.col("row_tot").cast("decimal(38,0)") * F.col("col_tot")
        ).alias("d"),
        (
            F.col("n").cast("double")
            * F.col("row_tot").cast("double")
            * F.col("col_tot").cast("double")
        ).alias("den"),
    )
    dof = cells.agg(
        (
            (F.count_distinct("rk") - 1) * (F.count_distinct("ck") - 1)
        )
        .cast("bigint")
        .alias("dof")
    )
    cell = F.floor(
        (
            F.col("d").cast("double")
            * F.col("d").cast("double")
            / F.col("den")
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    stat = contrib.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(cell).cast("bigint").alias("chi2_micro"),
    )
    return stat.crossJoin(F.broadcast(dof)).select("n", "dof", "chi2_micro")
