from mcp_iceberg_duckdb_spark.streaming import events  # noqa: F401
