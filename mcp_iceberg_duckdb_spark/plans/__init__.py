from mcp_iceberg_duckdb_spark.plans.inspect import (  # noqa: F401
    explain_str,
    global_window_count,
    has_broadcast_hash_join,
    has_pushed_filters,
    has_take_ordered,
    has_window_group_limit,
    range_partitioning_count,
    read_schema_columns,
    shuffle_count,
)
