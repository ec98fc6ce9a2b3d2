"""mcp_iceberg_duckdb_spark — a PySpark-native analytics engine with
the query and data-processing capabilities of the reference MCP
Iceberg/DuckDB server (elca-anh/mcp-iceberg-duckdb), re-expressed as
idiomatic Spark: DataFrame/SQL plans compiled by Catalyst, Iceberg
DSv2 for the lake path, Structured Streaming for streams, plus
LLM-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for the 100 TB scale point.
"""

__version__ = "0.1.0"
