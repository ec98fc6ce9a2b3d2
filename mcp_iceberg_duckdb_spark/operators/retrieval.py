"""Retrieval-shaped text operators (tier X — SURVEY.md §2.11):
overlapping token-window chunking and BM25 ranked retrieval — the two
Spark-side halves of a RAG / training-data indexing pipeline that the
reference's single-table SELECT surface (reference
QueryManager.py:79-81) cannot express.

Both are pure DataFrame pipelines: chunking is a shuffle-free
expression map (split once per doc, slice per window), retrieval is
one tokens groupBy + two broadcast joins + a per-query window head.

Determinism discipline (as _util.py): every float that feeds an
ORDER BY is quantized with the version-inert `rn` first; `ln` is the
single libm-dependent op and is 6dp-quantized immediately (same
treatment as the PMI collocations in textops.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcp_iceberg_duckdb_spark.operators._util import rn, t
from mcp_iceberg_duckdb_spark.registry import query

_CHUNK_W = 32  # tokens per chunk
_CHUNK_S = 24  # stride (8-token overlap)

_CHUNK_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk
        FROM documents
    ),
    starts AS (
        SELECT doc_id, tk, len(tk) AS n,
               unnest(range(0, len(tk), {_CHUNK_S})) AS start
        FROM toks
    )
    SELECT doc_id,
           CAST(start // {_CHUNK_S} AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS chunk_start,
           CAST(least({_CHUNK_W}, n - start) AS BIGINT) AS chunk_n_tokens,
           md5(array_to_string(tk[start + 1:start + {_CHUNK_W}], ' '))
               AS chunk_md5
    FROM starts
"""


@query("x_text_chunking", oracle=_CHUNK_ORACLE, tags=("text", "tierx"))
def x_text_chunking(spark, sf_dir):
    """Overlapping token-window chunking (window {W}, stride {S}) —
    the standard RAG / context-packing pre-step: every document
    becomes ceil(n/S) chunks of <= W tokens, md5-keyed for downstream
    chunk-level dedup and embedding.

    Spark shape: ONE split per document (let-bound token array, the
    same discipline as the ExactSubstr scrub, textops.py), a
    `sequence(0, n-1, S)` start list, posexplode + `slice` per
    window, md5 over the joined slice. No shuffle at all — the whole
    operator is a narrow expression map, so at 100 TB it scales with
    scan bandwidth and the only cost knob is output amplification
    (W/S ~ 1.33x token duplication).

    Full-parity oracle: DuckDB `range(0, n, S)` generates the same
    start set as Spark's inclusive `sequence(0, n-1, S)`, and both
    engines md5 the identical sliced strings — bit-identical rows,
    no tolerance anywhere.
    """
    d = t(spark, sf_dir).documents.select(
        "doc_id", F.split("text", " ").alias("tk")
    )
    d = d.select(
        "doc_id",
        "tk",
        F.size("tk").alias("n"),
        F.posexplode(
            F.sequence(F.lit(0), F.size("tk") - 1, F.lit(_CHUNK_S))
        ).alias("chunk_idx", "start"),
    )
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("chunk_start"),
        F.least(F.lit(_CHUNK_W), F.col("n") - F.col("start"))
        .cast("long")
        .alias("chunk_n_tokens"),
        F.md5(
            F.concat_ws(" ", F.slice("tk", F.col("start") + 1, _CHUNK_W))
        ).alias("chunk_md5"),
    )


_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_NQ = 8  # query terms
_BM25_TOPK = 5  # docs returned per query term

_BM25_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term,
               len(string_split(text, ' ')) AS dl
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, dl, count(*) AS tf
        FROM tok GROUP BY doc_id, term, dl
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    corpus AS (
        SELECT count(*) AS n_docs, sum(dl) AS sum_dl
        FROM (SELECT doc_id, any_value(dl) AS dl FROM tf GROUP BY doc_id)
    ),
    qterms AS (
        SELECT term, df,
               floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1e6
                     + 0.5) / 1e6 AS idf
        FROM df, corpus
        ORDER BY df DESC, term
        LIMIT {_BM25_NQ}
    ),
    scored AS (
        SELECT q.term, f.doc_id,
               floor(q.idf * (f.tf * ({_BM25_K1} + 1.0))
                     / (f.tf + {_BM25_K1}
                        * (1.0 - {_BM25_B}
                           + {_BM25_B} * f.dl * c.n_docs / c.sum_dl))
                     * 1e6 + 0.5) / 1e6 AS score
        FROM qterms q JOIN tf f ON f.term = q.term, corpus c
    ),
    ranked AS (
        SELECT term, doc_id, score,
               row_number() OVER (PARTITION BY term
                                  ORDER BY score DESC, doc_id) AS rnk
        FROM scored
    )
    SELECT term, doc_id, CAST(rnk AS INTEGER) AS rnk, score
    FROM ranked WHERE rnk <= {_BM25_TOPK}
"""


@query("x_text_bm25_topk", oracle=_BM25_ORACLE, tags=("text", "tierx"))
def x_text_bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval: the {NQ} highest-document-frequency
    terms act as single-term queries and each returns its top-{K}
    documents by the Lucene-style BM25 score
    idf * tf(k1+1) / (tf + k1(1 - b + b*dl/avgdl)) with
    idf = ln((N - df + 0.5)/(df + 0.5) + 1) (always positive, so
    high-df query terms stay well-defined).

    Spark shape — the inverted-index join a 100 TB retrieval pass
    needs: ONE tokens groupBy builds the (doc, term, tf, dl) posting
    relation; per-term document frequencies reduce from it; the
    {NQ}-row query-term relation and the 1-row corpus stats row are
    BROADCAST back onto the postings (never collected), so the only
    wide exchanges are the two linear groupBys. The per-query head is
    a rank window bounded by WindowGroupLimit — k rows per query term
    survive the exchange. At scale the postings relation is the thing
    you persist and re-probe per query batch; here it is consumed
    once so no cache is pinned.

    Determinism: idf's `ln` is quantized to 6dp the moment it is
    computed (libm is the only per-engine op; same discipline as the
    PMI operator); the final score is 6dp-quantized and the ranking
    window orders on the QUANTIZED score with doc_id tiebreak, so
    both engines rank identical values. dl/avgdl is computed as
    dl*N/sum_dl from exact integers — one rounding per double op,
    bit-identical IEEE across engines.
    """
    d = t(spark, sf_dir).documents.select(
        "doc_id", F.split("text", " ").alias("tk")
    )
    tok = d.select(
        "doc_id",
        F.size("tk").alias("dl"),
        F.explode("tk").alias("term"),
    )
    tf = tok.groupBy("doc_id", "term", "dl").agg(F.count("*").alias("tf"))
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    corpus = (
        tf.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
        )
    )
    qterms = (
        df_rel.crossJoin(F.broadcast(corpus))
        .select(
            "term",
            "df",
            rn(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                ),
                6,
            ).alias("idf"),
            "n_docs",
            "sum_dl",
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(_BM25_NQ)
    )
    scored = tf.join(F.broadcast(qterms), "term").select(
        "term",
        "doc_id",
        rn(
            F.col("idf")
            * (F.col("tf") * F.lit(_BM25_K1 + 1.0))
            / (
                F.col("tf")
                + F.lit(_BM25_K1)
                * (
                    F.lit(1.0 - _BM25_B)
                    + F.lit(_BM25_B)
                    * F.col("dl")
                    * F.col("n_docs")
                    / F.col("sum_dl")
                )
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("term").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _BM25_TOPK)
        .select("term", "doc_id", F.col("rnk").cast("int").alias("rnk"), "score")
    )


# ---- chunk-level dedup rate (sub-document duplication analysis) ----

_CDUP_W = 16  # non-overlapping chunk width


@query(
    "x_text_chunk_dedup_rate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS tk
        FROM documents
    ),
    chunks AS (
        SELECT source,
               md5(array_to_string(tk[start + 1:start + {_CDUP_W}], ' '))
                   AS h
        FROM (
            SELECT doc_id, source, tk,
                   unnest(range(0, len(tk), {_CDUP_W})) AS start
            FROM toks
        )
    ),
    per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(count(DISTINCT h) AS BIGINT) AS n_unique
        FROM chunks GROUP BY source
    ),
    srcs AS (SELECT DISTINCT source, h FROM chunks),
    shared AS (
        SELECT h FROM srcs GROUP BY h HAVING count(*) > 1
    ),
    sh_per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_shared
        FROM srcs SEMI JOIN shared USING (h)
        GROUP BY source
    )
    SELECT p.source, p.n_chunks, p.n_unique,
           CAST((p.n_chunks - p.n_unique) * 1000000 // p.n_chunks
               AS BIGINT) AS dup_ppm,
           CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared_other
    FROM per_src p LEFT JOIN sh_per s ON p.source = s.source
    """,
    tags=("text", "tierx"),
)
def x_text_chunk_dedup_rate(spark, sf_dir):
    """Sub-document duplication ledger: non-overlapping {W}-token
    chunks md5-keyed, then per source (1) the within-source duplicate
    chunk rate — the signal C4/RefinedWeb-style pipelines act on at
    paragraph granularity, here at fixed token granularity since the
    fixture has no sentence structure — and (2) the count of this
    source's distinct chunks that ALSO appear in another source
    (cross-source boilerplate/syndication pressure, the thing that
    makes per-source dedup insufficient).

    Exactness: md5 chunk keys (the x_text_chunking discipline), all
    counts int64, one integer div for the ppm — bit-identical rows.

    Spark shape: one narrow chunk explode (scan-bandwidth), one
    (source, h) map-side-combined distinct, two key-hashed groupBys,
    and a semi join against the >1-source chunk set — every shuffle
    keyed on the chunk hash, nothing corpus-wide through one
    partition. At 100 TB this is the same cost envelope as exact
    dedup, reused at chunk granularity."""
    d = t(spark, sf_dir).documents.select(
        "source", F.split("text", " ").alias("tk")
    )
    chunks = d.select(
        "source",
        F.explode(
            F.sequence(F.lit(0), F.size("tk") - 1, F.lit(_CDUP_W))
        ).alias("start"),
        "tk",
    ).select(
        "source",
        F.md5(
            F.concat_ws(" ", F.slice("tk", F.col("start") + 1, _CDUP_W))
        ).alias("h"),
    )
    per_src = chunks.groupBy("source").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.count_distinct("h").cast("long").alias("n_unique"),
    )
    srcs = chunks.select("source", "h").distinct()
    shared = (
        srcs.groupBy("h")
        .agg(F.count("*").alias("ns"))
        .where(F.col("ns") > 1)
        .select("h")
    )
    sh_per = (
        srcs.join(shared, "h", "semi")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return (
        per_src.join(sh_per, "source", "left")
        .select(
            "source",
            "n_chunks",
            "n_unique",
            F.expr(
                "CAST(((n_chunks - n_unique) * 1000000) div n_chunks"
                " AS BIGINT)"
            ).alias("dup_ppm"),
            F.coalesce(F.col("n_shared"), F.lit(0))
            .cast("long")
            .alias("n_shared_other"),
        )
    )
