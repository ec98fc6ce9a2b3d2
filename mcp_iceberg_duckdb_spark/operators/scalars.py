"""Scalar function families (SURVEY.md §2.7, tier D — the declared
set is restricted to functions with exact Spark↔DuckDB equivalents so
the differential oracle hash-matches).

All of these run JVM-side inside whole-stage codegen — no Python in
the row path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import r4, r6, t
from mcp_iceberg_duckdb_spark.registry import query


@query(
    "f_string_basic",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                 AS up,
           lower(c_mktsegment)           AS lo,
           length(c_name)                AS len,
           substr(c_name, 1, 8)          AS pre,
           trim(concat('  ', c_name, ' ')) AS trimmed,
           replace(c_name, 'Customer', 'Cust') AS repl,
           concat(c_name, '/', c_mktsegment)   AS joined,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           reverse(c_mktsegment)         AS rev
    FROM customer
    """,
    tags=("scalar", "string"),
)
def f_string_basic(spark, sf_dir):
    """String family: upper/lower/length/substr/trim/replace/concat/
    lpad/reverse."""
    c = t(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").cast("bigint").alias("len"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
        F.concat("c_name", F.lit("/"), "c_mktsegment").alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
    )


@query(
    "f_string_predicates",
    oracle="""
    SELECT p_partkey,
           contains(p_name, 'red')        AS has_red,
           starts_with(p_type, 'SMALL')   AS is_small,
           split_part(p_type, ' ', 1)     AS type_head,
           left(p_brand, 5)               AS brand5,
           right(p_name, 3)               AS tail3
    FROM part
    """,
    tags=("scalar", "string"),
)
def f_string_predicates(spark, sf_dir):
    """String predicates + splitting: contains/starts_with/split_part/
    left/right."""
    p = t(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.contains(F.col("p_name"), F.lit("red")).alias("has_red"),
        F.startswith(F.col("p_type"), F.lit("SMALL")).alias("is_small"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.left(F.col("p_brand"), F.lit(5)).alias("brand5"),
        F.right(F.col("p_name"), F.lit(3)).alias("tail3"),
    )


@query(
    "f_regex",
    oracle="""
    SELECT p_partkey,
           regexp_matches(p_name, '^[a-m]')            AS starts_a_to_m,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_extract(p_name, '([a-z]+)', 1)       AS first_word
    FROM part
    """,
    tags=("scalar", "string"),
)
def f_regex(spark, sf_dir):
    """Regex family: rlike / regexp_replace (global) /
    regexp_extract. DuckDB's regexp_replace needs the 'g' flag to
    match Spark's replace-all semantics."""
    p = t(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.col("p_name").rlike("^[a-m]").alias("starts_a_to_m"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
    )


@query(
    "f_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                   AS abs_d,
           CAST(ceil(l_quantity) AS BIGINT)         AS ceil_q,
           CAST(floor(l_quantity) AS BIGINT)        AS floor_q,
           floor((sqrt(l_extendedprice)) * 1e6 + 0.5) / 1e6          AS sqrt_p,
           floor((pow(l_discount, 2)) * 1e6 + 0.5) / 1e6             AS disc_sq,
           floor((exp(l_discount)) * 1e6 + 0.5) / 1e6                AS exp_d,
           floor((ln(l_extendedprice)) * 1e6 + 0.5) / 1e6            AS ln_p,
           floor((log10(l_extendedprice)) * 1e6 + 0.5) / 1e6         AS log10_p,
           CAST(l_orderkey % 7 AS BIGINT)           AS mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE)  AS sgn,
           greatest(l_quantity, 25.0)               AS hi,
           least(l_quantity, 25.0)                  AS lo
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def f_math(spark, sf_dir):
    """Math family. ceil/floor on DOUBLE return DOUBLE in both
    engines; % keeps the dividend's sign in both."""
    li = t(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.ceil("l_quantity").alias("ceil_q"),
        F.floor("l_quantity").alias("floor_q"),
        r6(F.sqrt("l_extendedprice")).alias("sqrt_p"),
        r6(F.pow("l_discount", 2)).alias("disc_sq"),
        r6(F.exp("l_discount")).alias("exp_d"),
        r6(F.log("l_extendedprice")).alias("ln_p"),
        r6(F.log10("l_extendedprice")).alias("log10_p"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.greatest("l_quantity", F.lit(25.0)).alias("hi"),
        F.least("l_quantity", F.lit(25.0)).alias("lo"),
    )


@query(
    "f_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                         AS y,
           month(o_orderdate)                        AS m,
           day(o_orderdate)                          AS d,
           CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           strftime(o_orderdate, '%Y-%m')            AS ym,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS INTEGER) AS days_to_eoy,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due,
           make_date(2024, 1, 15)                    AS fixed_date
    FROM orders
    """,
    tags=("scalar", "datetime"),
)
def f_datetime(spark, sf_dir):
    """Datetime family: extract parts, truncate, format, diff, add.
    Spark datediff(end, start) ≡ DuckDB date_diff('day', start, end)
    — argument order is reversed between the engines."""
    o = t(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_eoy"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAY"))
        .cast("date")
        .alias("due"),
        F.make_date(F.lit(2024), F.lit(1), F.lit(15)).alias("fixed_date"),
    )


@query(
    "f_datetime_time_parts",
    oracle="""
    SELECT event_id,
           hour(ts)   AS h,
           minute(ts) AS mi,
           second(ts) AS s,
           date_trunc('hour', ts) AS hour_bucket,
           CAST(ts AS DATE)       AS day
    FROM events
    """,
    tags=("scalar", "datetime"),
)
def f_datetime_time_parts(spark, sf_dir):
    """Time-of-day parts on the µs-precision events stream table."""
    e = t(spark, sf_dir).events
    return e.select(
        "event_id",
        F.hour("ts").cast("bigint").alias("h"),
        F.minute("ts").cast("bigint").alias("mi"),
        F.second("ts").cast("bigint").alias("s"),
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_bucket"),
        F.col("ts").cast("date").alias("day"),
    )


@query(
    "f_conditional",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN')   AS status,
           ifnull(nullif(o_orderpriority, '1-URGENT'), 'URGENT') AS prio,
           if(o_totalprice > 150000.0, 'big', 'small')    AS bucket
    FROM orders
    """,
    tags=("scalar", "conditional"),
)
def f_conditional(spark, sf_dir):
    """Conditional/null family: coalesce / nullif / ifnull(nvl) / if."""
    o = t(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status"
        ),
        F.nvl(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT")
        ).alias("prio"),
        F.when(F.col("o_totalprice") > 150000.0, "big")
        .otherwise("small")
        .alias("bucket"),
    )


@query(
    "f_try_cast_format",
    oracle="""
    SELECT doc_id,
           TRY_CAST(lang AS INTEGER)                  AS lang_as_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT) AS n_chars_rt,
           printf('%s:%d', lang, n_chars)             AS tagged
    FROM documents
    """,
    tags=("scalar", "cast"),
)
def f_try_cast_format(spark, sf_dir):
    """TRY_CAST (NULL on failure, never an error) + printf-style
    formatting."""
    d = t(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.col("n_chars").cast("string").cast("bigint").alias("n_chars_rt"),
        F.format_string("%s:%d", F.col("lang"), F.col("n_chars")).alias("tagged"),
    )


@query(
    "f_array",
    oracle="""
    SELECT vec_id,
           len(embedding)            AS dim,
           embedding[1]              AS first_elem,
           embedding[64]             AS last_elem,
           floor((list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')) * 1e6 + 0.5) / 1e6 AS vec_sum
    FROM embeddings
    """,
    tags=("scalar", "array"),
)
def f_array(spark, sf_dir):
    """Array family over embedding array<float>: size / element_at
    (1-indexed in both engines) / fold-sum via F.aggregate."""
    e = t(spark, sf_dir).embeddings
    vec = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.element_at("embedding", 64).alias("last_elem"),
        r6(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x)
        ).alias("vec_sum"),
    )


@query(
    "f_array_explode",
    oracle="""
    SELECT vec_id, u.pos, floor((u.val) * 1e6 + 0.5) / 1e6 AS val
    FROM embeddings,
         LATERAL (SELECT CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
                         CAST(unnest(embedding) AS DOUBLE) AS val) u
    WHERE vec_id < 10
    """,
    tags=("scalar", "array"),
)
def f_array_explode(spark, sf_dir):
    """UNNEST/EXPLODE with position (posexplode ↔ unnest+
    generate_subscripts)."""
    e = t(spark, sf_dir).embeddings
    return (
        e.filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode("embedding").alias("pos0", "val0"))
        .select(
            "vec_id",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            r6(F.col("val0").cast("double")).alias("val"),
        )
    )


@query(
    "f_array_transform",
    oracle="""
    SELECT vec_id,
           floor((list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')) * 1e6 + 0.5) / 1e6 AS sq_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
    tags=("scalar", "array"),
)
def f_array_transform(spark, sf_dir):
    """Higher-order array functions: transform / filter / aggregate —
    the JVM-side way to do per-element math without a UDF."""
    e = t(spark, sf_dir).embeddings
    vec = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        r6(
            F.aggregate(
                F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )


@query(
    "f_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')            AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed
    FROM events
    """,
    tags=("scalar", "json"),
)
def f_json(spark, sf_dir):
    """JSON extraction from the events.props string column
    (get_json_object ↔ json_extract_string) plus typed parsing via
    from_json into a struct."""
    e = t(spark, sf_dir).events
    k = F.get_json_object(F.col("props"), "$.k")
    typed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        typed.getField("k").alias("k_typed"),
    )


@query(
    "f_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5
    FROM documents
    """,
    tags=("scalar", "hash"),
)
def f_hash(spark, sf_dir):
    """Deterministic content hashing (md5 hex — identical output in
    both engines; the building block for exact dedup)."""
    d = t(spark, sf_dir).documents
    return d.select("doc_id", F.md5(F.col("text")).alias("text_md5"))


@query(
    "f_regex_extract_all",
    oracle="""
    SELECT doc_id,
           coalesce(array_to_string(regexp_extract_all(text, '[a-z]+ing'),
                                    ','), '') AS ing_words,
           len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
           coalesce(array_to_string(regexp_extract_all(text,
               '\\b([a-z])[a-z]{4}\\b', 1), ','), '') AS initials5
    FROM documents
    """,
    tags=("scalar", "string"),
)
def f_regex_extract_all(spark, sf_dir):
    """regexp_extract_all — ALL matches (and group extraction), not
    just the first like f_regex's regexp_extract. Match lists are
    projected as comma-joined strings per the no-top-level-array
    output contract (tests/test_oracle_types.py guard)."""
    d = t(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all("text", F.lit("[a-z]+ing"), 0), ","
        ).alias("ing_words"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0))
        .cast("bigint")
        .alias("n_numbers"),
        F.array_join(
            F.regexp_extract_all(
                "text", F.lit(r"\b([a-z])[a-z]{4}\b"), 1
            ),
            ",",
        ).alias("initials5"),
    )


@query(
    "f_array_explode_outer",
    oracle="""
    WITH d AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN []
                    ELSE string_split(o_orderpriority, '-') END AS parts
        FROM orders WHERE o_orderkey < 300
    )
    SELECT o_orderkey, u.part
    FROM d, LATERAL (
        SELECT unnest(CASE WHEN len(parts) = 0
                           THEN [NULL]::VARCHAR[] ELSE parts END) AS part
    ) u
    """,
    tags=("scalar", "array"),
)
def f_array_explode_outer(spark, sf_dir):
    """EXPLODE_OUTER — the row-preserving flatten: rows whose array is
    EMPTY survive with a NULL element instead of vanishing (plain
    explode silently drops them — the bug class this op's tests
    exist to catch in ETL). Every third order gets an empty parts
    array to exercise the preserved branch. DuckDB has no native
    outer unnest; the oracle's CASE-to-[NULL] rewrite is the
    documented equivalent, which doubles as the spec.

    Spark shape: generator expression inside codegen, shuffle-free;
    outer-ness costs nothing at any scale."""
    o = t(spark, sf_dir).orders.where(F.col("o_orderkey") < 300)
    d = o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.array().cast("array<string>"),
        )
        .otherwise(F.split("o_orderpriority", "-"))
        .alias("parts"),
    )
    return d.select(
        "o_orderkey", F.explode_outer("parts").alias("part")
    )
