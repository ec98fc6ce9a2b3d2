"""Operational diagnostics (tier X — SURVEY.md §2.11): the audits a
pipeline team runs BEFORE pointing a 1000-executor job at 100 TB —
key-skew profiling (will this join/groupBy hot-spot?) and a
rule-based data-quality sweep (null/range/referential violations).

The reference cannot express either: both need multi-table joins or
whole-relation distribution statistics, outside its single-table
SELECT surface (reference QueryManager.py:79-81).

Determinism discipline (SURVEY.md §5): every statistic is an integer
(counts, integer-division ppm/micro shares) or a floor-rounded
double; no float summation order anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import t
from mcp_iceberg_duckdb_spark.registry import query

# ---- key-skew diagnostic ----------------------------------------------

_SKEW_TOPN = 10

_SKEW_ORACLE = f"""
    WITH counts AS (
        SELECT l_suppkey AS k, count(*) AS c
        FROM lineitem GROUP BY l_suppkey
    ),
    summary AS (
        SELECT count(*) AS n_keys,
               CAST(sum(c) AS BIGINT) AS n_rows,
               max(c) AS max_cnt,
               min(c) AS min_cnt,
               CAST(floor(median(c)) AS BIGINT) AS med_cnt
        FROM counts
    ),
    topn AS (
        SELECT CAST(sum(c) AS BIGINT) AS top_c
        FROM (SELECT c FROM counts ORDER BY c DESC, k LIMIT {_SKEW_TOPN})
    )
    SELECT n_keys, n_rows, max_cnt, min_cnt, med_cnt,
           (max_cnt * n_keys * 1000000) // n_rows AS skew_micro,
           (top_c * 1000000) // n_rows AS top{_SKEW_TOPN}_share_micro
    FROM summary, topn
"""


@query("x_diag_key_skew", oracle=_SKEW_ORACLE, tags=("diag", "tierx"))
def x_diag_key_skew(spark, sf_dir):
    """Join/groupBy-key skew profile for lineitem.l_suppkey — the
    pre-flight check behind every salting / AQE-skew-join decision
    (functions/skew.py is the remediation; this is the detector).
    skew_micro = max_cnt / mean_cnt in micro-units: 1e6 means
    perfectly uniform, 10e6 means the hottest key carries 10× the
    average and a plain hash partition will straggle.

    Spark shape: ONE map-side-combined groupBy on the key (the same
    reduce any join on that key pays), leaving a |keys|-row counts
    relation — key cardinality is orders of magnitude below row count,
    so the follow-up single-row summary (median over |keys| values,
    top-{N} via TakeOrdered) is driver-bounded by construction. All
    shares are integer division; median is floored to int64 on both
    engines (even-count midpoints are x.5 exactly).

    Scale: at 100 TB the counts relation for a 10 M-key join is
    10 M × 16 B — a single executor's workload; nothing here touches
    the raw rows twice."""
    li = t(spark, sf_dir).lineitem
    counts = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count("*").alias("c")
    )
    summary = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_cnt"),
        F.min("c").alias("min_cnt"),
        F.floor(F.median("c")).cast("bigint").alias("med_cnt"),
    )
    topn = (
        counts.orderBy(F.col("c").desc(), "k")
        .limit(_SKEW_TOPN)
        .agg(F.sum("c").alias("top_c"))
    )
    return summary.crossJoin(F.broadcast(topn)).select(
        "n_keys",
        "n_rows",
        "max_cnt",
        "min_cnt",
        "med_cnt",
        F.expr("(max_cnt * n_keys * 1000000) div n_rows").alias("skew_micro"),
        F.expr("(top_c * 1000000) div n_rows").alias(
            f"top{_SKEW_TOPN}_share_micro"
        ),
    )


# ---- data-quality audit -----------------------------------------------

_DQ_DIM = 64  # embeddings fixture dimension (sources/tables.py)

_DQ_ORACLE = f"""
    SELECT 'orders_orphan_custkey' AS rule,
           count(*) FILTER (WHERE c.c_custkey IS NULL) AS n_violations,
           count(*) AS n_checked,
           (count(*) FILTER (WHERE c.c_custkey IS NULL) * 1000000)
               // count(*) AS viol_ppm
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           count(*) FILTER (WHERE o.o_orderkey IS NULL),
           count(*),
           (count(*) FILTER (WHERE o.o_orderkey IS NULL) * 1000000)
               // count(*)
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    UNION ALL
    SELECT 'orders_nonpositive_total',
           count(*) FILTER (WHERE o_totalprice <= 0.0),
           count(*),
           (count(*) FILTER (WHERE o_totalprice <= 0.0) * 1000000)
               // count(*)
    FROM orders
    UNION ALL
    SELECT 'lineitem_qty_range',
           count(*) FILTER (WHERE l_quantity < 1.0 OR l_quantity > 50.0),
           count(*),
           (count(*) FILTER (WHERE l_quantity < 1.0 OR l_quantity > 50.0)
               * 1000000) // count(*)
    FROM lineitem
    UNION ALL
    SELECT 'documents_blank_text',
           count(*) FILTER (WHERE length(trim(text)) = 0),
           count(*),
           (count(*) FILTER (WHERE length(trim(text)) = 0) * 1000000)
               // count(*)
    FROM documents
    UNION ALL
    SELECT 'events_value_nonfinite',
           count(*) FILTER (WHERE isnan(value) OR isinf(value)),
           count(*),
           (count(*) FILTER (WHERE isnan(value) OR isinf(value)) * 1000000)
               // count(*)
    FROM events
    UNION ALL
    SELECT 'embeddings_dim_drift',
           count(*) FILTER (WHERE len(embedding) <> {_DQ_DIM}),
           count(*),
           (count(*) FILTER (WHERE len(embedding) <> {_DQ_DIM}) * 1000000)
               // count(*)
    FROM embeddings
    UNION ALL
    SELECT 'embeddings_nonfinite',
           count(*) FILTER (WHERE len(list_filter(embedding,
               x -> isnan(x) OR isinf(x))) > 0),
           count(*),
           (count(*) FILTER (WHERE len(list_filter(embedding,
               x -> isnan(x) OR isinf(x))) > 0) * 1000000) // count(*)
    FROM embeddings
"""


def _dq_rule(df, rule: str, cond):
    """One-row (rule, n_violations, n_checked, viol_ppm) aggregate —
    violations counted with count_if so each rule is a single pass."""
    return df.agg(
        F.lit(rule).alias("rule"),
        F.count_if(cond).alias("n_violations"),
        F.count("*").alias("n_checked"),
    ).select(
        "rule",
        "n_violations",
        "n_checked",
        F.expr("(n_violations * 1000000) div n_checked").alias("viol_ppm"),
    )


@query("x_dq_audit", oracle=_DQ_ORACLE, tags=("diag", "tierx"))
def x_dq_audit(spark, sf_dir):
    """Rule-based data-quality sweep across five tables in one
    result: referential orphans (orders→customer,
    lineitem→orders), numeric range violations, blank documents,
    non-finite event values, and embedding dim/NaN hygiene — the
    Great-Expectations-style gate run before any downstream stage
    trains on the data.

    Spark shape: each rule is ONE scan-aggregate (count_if) over its
    table; the two referential rules are left joins whose null-probe
    counts the orphans — at fixture scale the dim side broadcasts, at
    100 TB they become the ordinary shuffle joins a real FK audit
    pays (AQE picks; the audit never materializes violating rows,
    only counts). The 8 one-row aggregates union into a single
    8-row DataFrame; ppm shares are integer division — no floats in
    the output."""
    tb = t(spark, sf_dir)
    o, c, li = tb.orders, tb.customer, tb.lineitem
    docs, ev, emb = tb.documents, tb.events, tb.embeddings

    orphan_orders = _dq_rule(
        o.join(c, o.o_custkey == c.c_custkey, "left"),
        "orders_orphan_custkey",
        F.col("c_custkey").isNull(),
    )
    orphan_lines = _dq_rule(
        li.join(o, li.l_orderkey == o.o_orderkey, "left"),
        "lineitem_orphan_orderkey",
        F.col("o_orderkey").isNull(),
    )
    nonpos = _dq_rule(
        o, "orders_nonpositive_total", F.col("o_totalprice") <= 0.0
    )
    qty = _dq_rule(
        li,
        "lineitem_qty_range",
        (F.col("l_quantity") < 1.0) | (F.col("l_quantity") > 50.0),
    )
    blank = _dq_rule(
        docs, "documents_blank_text", F.length(F.trim("text")) == 0
    )
    nonfinite_v = _dq_rule(
        ev,
        "events_value_nonfinite",
        F.isnan("value") | (F.abs("value") == F.lit(float("inf"))),
    )
    dim_drift = _dq_rule(
        emb, "embeddings_dim_drift", F.size("embedding") != _DQ_DIM
    )
    emb_nan = _dq_rule(
        emb,
        "embeddings_nonfinite",
        F.exists(
            "embedding",
            lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
        ),
    )
    out = orphan_orders
    for part in (
        orphan_lines,
        nonpos,
        qty,
        blank,
        nonfinite_v,
        dim_drift,
        emb_nan,
    ):
        out = out.unionByName(part)
    return out


# ---- robust outlier detection (median absolute deviation) ----

_MAD_K4 = 44478  # 3 · 1.4826 in 1e-4 units (Gaussian-consistency scale)

_MAD_ORACLE = f"""
    WITH q AS (
        SELECT event_type AS grp,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    med AS (
        SELECT grp, CAST(floor(median(cents)) AS BIGINT) AS med_cents
        FROM q GROUP BY grp
    ),
    dev AS (
        SELECT q.grp, q.cents, m.med_cents,
               abs(q.cents - m.med_cents) AS ad
        FROM q JOIN med m ON m.grp = q.grp
    ),
    mad AS (
        SELECT grp, CAST(floor(median(ad)) AS BIGINT) AS mad_cents
        FROM dev GROUP BY grp
    )
    SELECT d.grp, count(*) AS n, d.med_cents, m.mad_cents,
           count(*) FILTER (WHERE d.ad * 10000 > m.mad_cents * {_MAD_K4})
               AS n_outliers,
           (count(*) FILTER (WHERE d.ad * 10000 > m.mad_cents * {_MAD_K4})
               * 1000000) // count(*) AS outlier_ppm
    FROM dev d JOIN mad m ON m.grp = d.grp
    GROUP BY d.grp, d.med_cents, m.mad_cents
"""


@query("x_outlier_mad", oracle=_MAD_ORACLE, tags=("diag", "tierx"))
def x_outlier_mad(spark, sf_dir):
    """Robust per-group outlier screen: |x − median| > 3·1.4826·MAD
    (median absolute deviation with the Gaussian consistency factor)
    — the heavy-tail-safe alternative to z-scores, whose mean/stddev
    an outlier itself corrupts — run per event type over the value
    stream, whose long tail is exactly what the rule exists for
    (~5% flagged at sf0.01; the uniform TPC-H money columns flag
    zero, correctly). Completes the DQ family beside x_dq_audit
    (rule violations) and s_anomaly_zscore (temporal).

    Spark shape: two grouped medians (group count is tiny — the
    median state is per-group, not per-row), each joined back
    BROADCAST onto the row relation, then one counting groupBy —
    three linear passes over the rows, no self-joins, no sort of the
    full relation.

    Determinism: prices in int64 cents, medians floored to int64
    (even-count midpoints are exactly .5), and the threshold compare
    is cross-multiplied into pure int64 — ad·10⁴ > mad·44478 — so no
    float touches the decision or the output."""
    e = t(spark, sf_dir).events
    q = e.select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    med = q.groupBy("grp").agg(
        F.floor(F.median("cents")).cast("bigint").alias("med_cents")
    )
    dev = q.join(F.broadcast(med), "grp").select(
        "grp",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("ad"),
    )
    mad = dev.groupBy("grp").agg(
        F.floor(F.median("ad")).cast("bigint").alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "grp")
        .groupBy("grp", "med_cents", "mad_cents")
        .agg(
            F.count("*").alias("n"),
            F.count_if(
                F.col("ad") * 10000 > F.col("mad_cents") * _MAD_K4
            ).alias("n_outliers"),
        )
        .select(
            "grp",
            "n",
            "med_cents",
            "mad_cents",
            "n_outliers",
            F.expr("(n_outliers * 1000000) div n").alias("outlier_ppm"),
        )
    )


# ---- join-blowup estimator (pre-flight join cardinality) ----

_JB_ORACLE = """
    WITH cl AS (
        SELECT l_suppkey AS k, count(*) AS c FROM lineitem GROUP BY l_suppkey
    ),
    co AS (
        SELECT s_suppkey AS k, count(*) AS c FROM supplier GROUP BY s_suppkey
    ),
    est AS (
        SELECT CAST(sum(cl.c * co.c) AS BIGINT) AS est_rows,
               CAST(max(cl.c * co.c) AS BIGINT) AS max_key_rows
        FROM cl JOIN co ON co.k = cl.k
    ),
    selfest AS (
        SELECT CAST(sum(c * c) AS BIGINT) AS self_est_rows,
               CAST(max(c * c) AS BIGINT) AS self_max_key_rows
        FROM cl
    ),
    sizes AS (
        SELECT (SELECT count(*) FROM lineitem) AS n_left,
               (SELECT count(*) FROM supplier) AS n_right
    )
    SELECT n_left, n_right, est_rows, max_key_rows,
           self_est_rows, self_max_key_rows,
           (max_key_rows * 1000000) // est_rows AS top_key_share_ppm,
           self_est_rows // n_left AS self_amplification
    FROM est, selfest, sizes
"""


@query("x_diag_join_blowup", oracle=_JB_ORACLE, tags=("diag", "tierx"))
def x_diag_join_blowup(spark, sf_dir):
    """Pre-flight join-cardinality estimate: the EXACT output size of
    a join is Σ_k c_left(k)·c_right(k) over the key histograms — two
    cheap groupBys predict whether the real join explodes before you
    run it (the check that catches accidental many-to-many keys).
    Reports the lineitem⋈supplier FK join (benign: est = |lineitem|)
    and the lineitem SELF-join on l_suppkey (the blowup case: Σ c² ≈
    600× amplification at sf0.1), plus the hottest key's share —
    skew concentration for the salting decision
    (functions/skew.py).

    Spark shape: two key groupBys (|keys| rows each), one hash join
    of the count relations, single-row aggregates — never runs the
    candidate join itself. At 100 TB the histograms are the same
    relations x_diag_key_skew builds; this is the planning use of
    them.

    Determinism: pure int64 counts and products; shares by integer
    division."""
    tb = t(spark, sf_dir)
    cl = tb.lineitem.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count("*").alias("cl")
    )
    co = tb.supplier.groupBy(F.col("s_suppkey").alias("k")).agg(
        F.count("*").alias("co")
    )
    est = cl.join(co, "k").agg(
        F.sum(F.col("cl") * F.col("co")).cast("bigint").alias("est_rows"),
        F.max(F.col("cl") * F.col("co"))
        .cast("bigint")
        .alias("max_key_rows"),
    )
    selfest = cl.agg(
        F.sum(F.col("cl") * F.col("cl"))
        .cast("bigint")
        .alias("self_est_rows"),
        F.max(F.col("cl") * F.col("cl"))
        .cast("bigint")
        .alias("self_max_key_rows"),
    )
    sizes = tb.lineitem.agg(F.count("*").alias("n_left")).crossJoin(
        F.broadcast(tb.supplier.agg(F.count("*").alias("n_right")))
    )
    return (
        est.crossJoin(F.broadcast(selfest))
        .crossJoin(F.broadcast(sizes))
        .select(
            "n_left",
            "n_right",
            "est_rows",
            "max_key_rows",
            "self_est_rows",
            "self_max_key_rows",
            F.expr("(max_key_rows * 1000000) div est_rows").alias(
                "top_key_share_ppm"
            ),
            F.expr("self_est_rows div n_left").alias("self_amplification"),
        )
    )
