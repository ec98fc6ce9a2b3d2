"""Operator modules — importing this package registers every query
builder into mcp_iceberg_duckdb_spark.registry.QUERIES."""

from mcp_iceberg_duckdb_spark.operators import (  # noqa: F401
    analytics,
    dedup,
    diagnostics,
    graph,
    iceberg_ops,
    joins,
    multimodal,
    pipeline_extra,
    relational,
    retrieval,
    scalars,
    scalars_extra,
    similarity,
    temporal_joins,
    textops,
    tpch_extra,
    tpch_extra2,
    udfs,
    windows,
)
