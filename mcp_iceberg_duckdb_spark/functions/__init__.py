from mcp_iceberg_duckdb_spark.functions import textfns, vector  # noqa: F401
