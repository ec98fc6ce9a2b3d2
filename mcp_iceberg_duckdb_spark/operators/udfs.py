"""UDF surface demos (SURVEY.md §2.8 — the reference has no user
function mechanism at all; this is the engine's extension tier).

The rule (pyspark guide + SURVEY §4): built-in expressions first;
when Python is unavoidable, Arrow-batched pandas_udf / mapInPandas —
never row-at-a-time Python UDFs in a hot path.

The pandas_udf here is deliberately something expressible in SQL so
the DuckDB oracle can check the Arrow round-trip end-to-end; real
deployments put the genuinely-non-SQL logic (model scoring,
tokenizers) in the same shape.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mcp_iceberg_duckdb_spark.operators._util import t
from mcp_iceberg_duckdb_spark.registry import query


@query(
    "x_udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           floor((CAST(len(string_split(text, ' ')) AS DOUBLE)
                 / greatest(length(text), 1) * 100.0) * 1e6 + 0.5) / 1e6 AS tokens_per_100_chars
    FROM documents
    """,
    tags=("udf", "tierx"),
)
def x_udf_pandas_scalar(spark, sf_dir):
    """Scalar pandas_udf (Series→Series, Arrow-batched): token
    density per 100 chars. Defined as a local closure so executors
    don't need the package importable (pickled by value)."""

    @F.pandas_udf(T.DoubleType())
    def token_density(text: pd.Series) -> pd.Series:
        n_tokens = text.str.split(" ").str.len().astype("float64")
        n_chars = text.str.len().clip(lower=1).astype("float64")
        # floor-form rounding: identical IEEE ops to the oracle's
        # floor((x)*1e6+0.5)/1e6 (pandas .round is half-even and
        # engine floor(() + 0.5) midpoint behavior is version-dependent)
        return np.floor(n_tokens / n_chars * 100.0 * 1e6 + 0.5) / 1e6

    d = t(spark, sf_dir).documents
    return d.select("doc_id", token_density("text").alias("tokens_per_100_chars"))


@query(
    "x_udf_grouped_agg",
    oracle="""
    SELECT lang,
           floor((avg(CAST(n_chars AS DOUBLE))) * 1e4 + 0.5) / 1e4 AS mean_chars,
           floor((quantile_cont(CAST(n_chars AS DOUBLE), 0.5)) * 1e4 + 0.5) / 1e4 AS median_chars
    FROM documents GROUP BY lang
    """,
    tags=("udf", "tierx"),
)
def x_udf_grouped_agg(spark, sf_dir):
    """applyInPandas grouped-map as a per-group aggregator (pandas
    UDAF shape): one pandas DataFrame per language group in, one
    summary row out."""

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        chars = pdf["n_chars"].astype("float64")
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "mean_chars": [math.floor(chars.mean() * 1e4 + 0.5) / 1e4],
                "median_chars": [
                    math.floor(
                        chars.quantile(0.5, interpolation="linear") * 1e4 + 0.5
                    )
                    / 1e4
                ],
            }
        )

    d = t(spark, sf_dir).documents
    return d.groupBy("lang").applyInPandas(
        summarize, schema="lang string, mean_chars double, median_chars double"
    )


@query(
    "x_udtf_ngrams",
    oracle="""
    SELECT d.doc_id, substr(d.lang, i, 2) AS bigram
    FROM documents d,
         unnest(generate_series(1, greatest(length(d.lang) - 1, 0))) AS u(i)
    """,
    tags=("udf", "tierx"),
)
def x_udtf_ngrams(spark, sf_dir):
    """Python UDTF (Spark 3.5+/4): one row in → many rows out —
    char-bigram expansion of the language code. The expansion is
    deterministic, so the lateral-unnest SQL twin value-checks the
    whole UDTF path (registration, LATERAL join, row fan-out)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, bigram string")
    class Bigrams:
        def eval(self, doc_id: int, s: str):
            if s:
                for i in range(len(s) - 1):
                    yield doc_id, s[i : i + 2]

    d = t(spark, sf_dir).documents
    d.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("lang_bigrams", Bigrams)
    return spark.sql(
        "SELECT b.doc_id, b.bigram FROM _udtf_docs, "
        "LATERAL lang_bigrams(doc_id, lang) b"
    )
