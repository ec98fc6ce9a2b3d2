"""Second scalar-function batch (SURVEY.md §2.7): map/struct access,
trig/bit/hash families, min_by/max_by and boolean aggregates — each
restricted to forms with exact Spark↔DuckDB equivalents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import dec_round, r2, r6, rn, t
from mcp_iceberg_duckdb_spark.registry import query


@query(
    "f_struct",
    oracle="""
    SELECT o_orderkey,
           struct_pack(status := o_orderstatus, total := floor((o_totalprice) * 1e2 + 0.5) / 1e2).status AS status_out,
           struct_pack(status := o_orderstatus, total := floor((o_totalprice) * 1e2 + 0.5) / 1e2).total  AS total_out
    FROM orders
    """,
    tags=("scalar", "struct"),
)
def f_struct(spark, sf_dir):
    """Struct construction + field access (struct ↔ struct_pack).
    Only the extracted scalars are projected: raw struct cells
    serialize engine-specifically (Row vs dict) and would defeat the
    value-hash comparison."""
    o = t(spark, sf_dir).orders
    info = F.struct(
        F.col("o_orderstatus").alias("status"),
        r2("o_totalprice").alias("total"),
    )
    return o.select(
        "o_orderkey",
        info.getField("status").alias("status_out"),
        info.getField("total").alias("total_out"),
    )


@query(
    "f_map",
    oracle="""
    SELECT n_nationkey,
           array_to_string(map_keys(MAP {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)}), ',')   AS ks,
           array_to_string(map_values(MAP {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)}), ',') AS vs,
           MAP {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)}['name'][1]  AS name_val
    FROM nation
    """,
    tags=("scalar", "map"),
)
def f_map(spark, sf_dir):
    """Map construction, map_keys / map_values, key lookup. (DuckDB
    map extraction returns a 1-element list — indexed with [1] to
    match Spark's scalar element_at.) Key/value lists are projected
    as comma-joined strings, not raw arrays: the external compare
    canonicalizes via pandas sort and raw list cells are unhashable —
    same contract as f_struct."""
    n = t(spark, sf_dir).nation
    m = F.create_map(
        F.lit("name"),
        F.col("n_name"),
        F.lit("region"),
        F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.concat_ws(",", F.map_keys(m)).alias("ks"),
        F.concat_ws(",", F.map_values(m)).alias("vs"),
        F.element_at(m, "name").alias("name_val"),
    )


@query(
    "f_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((sin(l_discount)) * 1e6 + 0.5) / 1e6              AS sin_d,
           floor((cos(l_discount)) * 1e6 + 0.5) / 1e6              AS cos_d,
           floor((atan2(l_discount, 0.1)) * 1e6 + 0.5) / 1e6       AS atan2_d,
           floor((degrees(l_discount)) * 1e6 + 0.5) / 1e6          AS deg_d,
           floor((radians(l_quantity)) * 1e6 + 0.5) / 1e6          AS rad_q,
           floor((pi()) * 1e6 + 0.5) / 1e6                         AS pi_val
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def f_trig(spark, sf_dir):
    """Trigonometric family."""
    li = t(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r6(F.sin("l_discount")).alias("sin_d"),
        r6(F.cos("l_discount")).alias("cos_d"),
        r6(F.atan2(F.col("l_discount"), F.lit(0.1))).alias("atan2_d"),
        r6(F.degrees("l_discount")).alias("deg_d"),
        r6(F.radians("l_quantity")).alias("rad_q"),
        r6(F.lit(3.141592653589793)).alias("pi_val"),
    )


@query(
    "f_bits",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255            AS and_low,
           o_orderkey | 4096           AS or_bit,
           xor(o_orderkey, 1023)       AS xor_bits,
           o_orderkey << 2             AS shl,
           o_orderkey >> 3             AS shr,
           CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
    FROM orders
    """,
    tags=("scalar", "bits"),
)
def f_bits(spark, sf_dir):
    """Bit manipulation family."""
    o = t(spark, sf_dir).orders
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_low"),
        k.bitwiseOR(F.lit(4096)).alias("or_bit"),
        k.bitwiseXOR(F.lit(1023)).alias("xor_bits"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("popcount"),
    )


@query(
    "f_hash_family",
    oracle="""
    SELECT doc_id,
           md5(text)                       AS h_md5,
           sha256(text)                    AS h_sha256,
           CAST(position('spark' IN text) AS INTEGER) AS spark_pos,
           ascii(substr(text, 1, 1))       AS first_cp,
           chr(ascii(substr(text, 1, 1)))  AS first_ch,
           repeat(lang, 3)                 AS lang3
    FROM documents
    """,
    tags=("scalar", "hash"),
)
def f_hash_family(spark, sf_dir):
    """Hashing + codepoint/string utilities with exact twins."""
    d = t(spark, sf_dir).documents
    first = F.substring("text", 1, 1)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.instr(F.col("text"), "spark").alias("spark_pos"),
        F.ascii(first).alias("first_cp"),
        F.chr(F.ascii(first)).alias("first_ch"),
        F.repeat(F.col("lang"), 3).alias("lang3"),
    )


@query(
    "a_min_max_by",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, o_orderkey) AS last_order,
           arg_min(o_orderkey, o_orderkey) AS first_order,
           bool_and(o_totalprice > 0.0)    AS all_positive,
           bool_or(o_totalprice > 400000.0) AS any_huge
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def a_min_max_by(spark, sf_dir):
    """max_by/min_by (arg_max/arg_min) on a unique ordering key +
    boolean aggregates."""
    o = t(spark, sf_dir).orders
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_orderkey").alias("last_order"),
        F.min_by("o_orderkey", "o_orderkey").alias("first_order"),
        F.bool_and(F.col("o_totalprice") > 0.0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_huge"),
    )


@query(
    "a_decimal_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(floor(CAST(sum(CAST(floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS DECIMAL(14,2))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS total_dec,
           CAST(floor(CAST(min(CAST(floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS DECIMAL(14,2))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS min_dec,
           CAST(floor(CAST(max(CAST(floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS DECIMAL(14,2))) AS DECIMAL(30,6)) * CAST(100 AS DECIMAL(3,0)) + 0.5) AS DOUBLE) / CAST(100 AS DOUBLE) AS max_dec
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "decimal"),
)
def a_decimal_agg(spark, sf_dir):
    """Exact decimal aggregation — the money-safe path (double sums
    are order-dependent; DECIMAL sums are exact and deterministic, no
    rounding needed on the compare). Result scales pinned by explicit
    casts since Spark and DuckDB widen sum() differently."""
    o = t(spark, sf_dir).orders
    dec = r2("o_totalprice").cast("decimal(14,2)")
    return o.groupBy("o_orderstatus").agg(
        dec_round(F.sum(dec), 2).alias("total_dec"),
        dec_round(F.min(dec), 2).alias("min_dec"),
        dec_round(F.max(dec), 2).alias("max_dec"),
    )


@query(
    "f_array_setops",
    oracle="""
    WITH pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.embedding AS va, b.embedding AS vb
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id < 20
    )
    SELECT id_a, id_b,
           len(list_intersect(list_transform(va, x -> CAST(floor(CAST(x AS DOUBLE) * 10 + 0.5) AS BIGINT)),
                              list_transform(vb, x -> CAST(floor(CAST(x AS DOUBLE) * 10 + 0.5) AS BIGINT)))) AS n_common,
           array_to_string(list_sort(list_distinct(list_transform(va, x -> CAST(floor(CAST(x AS DOUBLE) * 10 + 0.5) AS BIGINT)))), ',') AS qa
    FROM pairs
    """,
    tags=("scalar", "array"),
)
def f_array_setops(spark, sf_dir):
    """Array set operations (intersect / distinct / sort) over
    quantized embedding values. The sorted-distinct list is projected
    as a comma-joined string, not a raw array: the external compare
    canonicalizes via pandas sort and raw list cells are unhashable —
    same contract as f_struct."""
    e = t(spark, sf_dir).embeddings
    a = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    q = lambda v: F.transform(  # noqa: E731
        v, lambda x: F.floor(x.cast("double") * 10 + F.lit(0.5)).cast("bigint")
    )
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect(q(F.col("va")), q(F.col("vb"))))
            .cast("bigint")
            .alias("n_common"),
            F.array_join(F.array_sort(F.array_distinct(q(F.col("va")))), ",").alias(
                "qa"
            ),
        )
    )


@query(
    "a_histogram",
    oracle="""
    SELECT CAST(floor((l_extendedprice - 900.0) / 5000.0) AS BIGINT) AS bucket,
           count(*) AS n,
           floor((min(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS min_price,
           floor((max(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS max_price
    FROM lineitem
    GROUP BY CAST(floor((l_extendedprice - 900.0) / 5000.0) AS BIGINT)
    """,
    tags=("agg",),
)
def a_histogram(spark, sf_dir):
    """Fixed-width histogram via explicit bucket arithmetic — fully
    deterministic (floor of identical IEEE ops on both engines),
    unlike engine-native histogram()/width_bucket whose bin-edge
    conventions differ. min/max are order-independent aggregates, so
    no float-sum nondeterminism enters. Scale: one shuffle carrying
    only (bucket, partial count/min/max) after map-side combine."""
    li = t(spark, sf_dir).lineitem
    bucket = F.floor((F.col("l_extendedprice") - 900.0) / 5000.0).cast("bigint")
    return li.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        r2(F.min("l_extendedprice")).alias("min_price"),
        r2(F.max("l_extendedprice")).alias("max_price"),
    )


@query(
    "a_regr_family",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           floor((regr_slope(l_extendedprice, l_quantity)) * 1e4 + 0.5) / 1e4
               AS slope_4dp,
           floor((regr_intercept(l_extendedprice, l_quantity)) * 1e2 + 0.5)
               / 1e2 AS intercept_2dp,
           floor((regr_r2(l_extendedprice, l_quantity)) * 1e6 + 0.5) / 1e6
               AS r2_6dp,
           floor((regr_avgx(l_extendedprice, l_quantity)) * 1e4 + 0.5) / 1e4
               AS avgx_4dp,
           floor((regr_avgy(l_extendedprice, l_quantity)) * 1e2 + 0.5) / 1e2
               AS avgy_2dp
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def a_regr_family(spark, sf_dir):
    """ANSI SQL:2003 linear-regression aggregates (regr_slope /
    intercept / r² / count / avgx / avgy) per group — the grouped
    simple-OLS surface both engines implement natively (Spark 3.4+
    F.regr_*). Rounded like a_corr_covar: the covariance sums are
    double accumulations whose order varies with partitioning, so
    results are floor-rounded at scales safely inside the
    deterministic digits (slope/avg 4dp, money 2dp, r² 6dp)."""
    li = t(spark, sf_dir).lineitem
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        rn(F.regr_slope(y, x), 4).alias("slope_4dp"),
        r2(F.regr_intercept(y, x)).alias("intercept_2dp"),
        r6(F.regr_r2(y, x)).alias("r2_6dp"),
        rn(F.regr_avgx(y, x), 4).alias("avgx_4dp"),
        r2(F.regr_avgy(y, x)).alias("avgy_2dp"),
    )


@query(
    "a_bitwise_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_orderkey & 1023) AS BIGINT) AS and_low,
           CAST(bit_or(o_orderkey & 1023) AS BIGINT) AS or_low,
           CAST(bit_xor(o_orderkey & 1023) AS BIGINT) AS xor_low
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "bits"),
)
def a_bitwise_agg(spark, sf_dir):
    """Bitwise aggregate family (bit_and / bit_or / bit_xor) — the
    flag-mask reductions (permission intersection, feature-union,
    parity) with exact integer semantics; order-independent by
    algebra, so no rounding is needed anywhere."""
    li = t(spark, sf_dir).orders
    masked = F.col("o_orderkey").bitwiseAND(F.lit(1023))
    return li.groupBy("o_orderstatus").agg(
        F.bit_and(masked).cast("bigint").alias("and_low"),
        F.bit_or(masked).cast("bigint").alias("or_low"),
        F.bit_xor(masked).cast("bigint").alias("xor_low"),
    )


@query(
    "f_interval_arith",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 3 DAY AS plus_3d,
           ts + INTERVAL 1 MONTH AS plus_1mo,
           CAST(last_day(CAST(ts AS DATE)) AS DATE) AS month_end,
           CAST(date_trunc('quarter', CAST(ts AS DATE)) AS DATE)
               AS quarter_start,
           CAST(datediff('day', CAST(ts AS DATE), DATE '2024-06-30')
               AS INTEGER) AS days_to_h1_end
    FROM events
    """,
    tags=("scalar", "datetime"),
)
def f_interval_arith(spark, sf_dir):
    """Calendar interval arithmetic: day/month addition (month
    addition clamps at month end identically in both engines —
    probed: Jan 31 + 1 month = Feb 29 10:00 in 2024), last_day,
    quarter truncation, day distance to a fixed date. Extends
    f_datetime's extraction surface with the MUTATION surface."""
    e = t(spark, sf_dir).events
    d = F.col("ts").cast("date")
    return e.select(
        "event_id",
        F.expr("ts + INTERVAL 3 DAY").alias("plus_3d"),
        F.expr("ts + INTERVAL 1 MONTH").alias("plus_1mo"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
        F.datediff(F.lit("2024-06-30").cast("date"), d).alias(
            "days_to_h1_end"
        ),
    )


@query(
    "f_string_extra",
    oracle="""
    SELECT doc_id,
           translate(lang, 'aeiou', 'AEIOU') AS lang_vowels_up,
           reverse(source) AS source_rev,
           left(text, 12) AS head12,
           right(text, 12) AS tail12,
           length(text) - length(replace(text, ' ', '')) AS n_spaces
    FROM documents
    """,
    tags=("scalar", "string"),
)
def f_string_extra(spark, sf_dir):
    """Second string-utility batch with exact twins: translate
    (character mapping), reverse, left/right slices, and the
    replace-based character count."""
    d = t(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.translate("lang", "aeiou", "AEIOU").alias("lang_vowels_up"),
        F.reverse("source").alias("source_rev"),
        F.expr("left(text, 12)").alias("head12"),
        F.expr("right(text, 12)").alias("tail12"),
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
        )
        .cast("bigint")
        .alias("n_spaces"),
    )


@query(
    "f_url_parse",
    oracle="""
    WITH u AS (
        SELECT o_orderkey,
               'https://shop' || CAST(o_custkey % 7 AS VARCHAR)
               || '.example.com/cat/' || CAST(o_custkey % 100 AS VARCHAR)
               || '/item?ok=' || CAST(o_orderkey AS VARCHAR)
               || '&pri=' || substr(o_orderpriority, 1, 1)
               || '#frag' || CAST(o_orderkey % 3 AS VARCHAR) AS url
        FROM orders
    )
    SELECT o_orderkey, url,
           regexp_extract(url, '^([a-z]+)://', 1)          AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)   AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1)            AS qs,
           regexp_extract(url, '[?&]pri=([^&#]*)', 1)      AS pri_param,
           regexp_extract(url, '#(.*)$', 1)                AS fragment
    FROM u
    """,
    tags=("scalar", "string"),
)
def f_url_parse(spark, sf_dir):
    """URL dissection — Spark's java.net-backed `parse_url`
    (PROTOCOL/HOST/PATH/QUERY/QUERY:key/REF) differentially checked
    against an INDEPENDENT implementation (DuckDB RE2 regexes over the
    identically-constructed URL), so the oracle is a true
    cross-implementation test rather than a shared-expression twin.
    URLs are synthesized deterministically from order columns (crawl
    pipelines parse billions of these before x_url_canonicalize keys
    the dedup).

    Spark shape: pure per-row expressions, shuffle-free, whole-stage
    codegen; at 100 TB this is scan-bound — exactly what a URL-field
    extraction stage must be."""
    o = t(spark, sf_dir).orders
    url = F.concat(
        F.lit("https://shop"),
        (F.col("o_custkey") % 7).cast("string"),
        F.lit(".example.com/cat/"),
        (F.col("o_custkey") % 100).cast("string"),
        F.lit("/item?ok="),
        F.col("o_orderkey").cast("string"),
        F.lit("&pri="),
        F.substring("o_orderpriority", 1, 1),
        F.lit("#frag"),
        (F.col("o_orderkey") % 3).cast("string"),
    )
    d = o.select("o_orderkey", url.alias("url"))
    return d.select(
        "o_orderkey",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("qs"),
        F.parse_url("url", F.lit("QUERY"), F.lit("pri")).alias("pri_param"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
    )
