"""CSV / JSON-lines file sources with the same pinned-schema
discipline as the parquet loaders (sources/tables.py).

The reference engine's data plane accepts external files through
DuckDB's readers (its embedded engine natively scans CSV/JSON next to
parquet); this module is the Spark-side equivalent for landing such
files into the engine's tables — the ingestion edge of a training-data
pipeline, where raw crawls and metadata sidecars arrive as JSONL and
tabular exports arrive as CSV.

Scale rules baked in:

- **Explicit schema, never inference.** Schema inference reads every
  file once before the real scan — a full extra pass at 100 TB. A
  known table name binds its TESTDATA.md schema; otherwise the caller
  must pass one.
- **FAILFAST by default.** PERMISSIVE silently nulls malformed rows —
  at pipeline scale that is undetected data loss; a bad batch should
  die loudly at the ingestion edge. Callers doing forensics can pass
  ``mode="PERMISSIVE"`` plus a ``columnNameOfCorruptRecord``.
- **Timestamps pin to TIMESTAMP_NTZ** via the table schemas, matching
  the parquet fixtures and the DuckDB oracle's naive timestamps.
- **Splittability**: uncompressed (and bzip2/lz4-frame) CSV/JSONL
  split by ``maxPartitionBytes`` like parquet; gzip does NOT (one
  task per .gz file) — shard gzipped drops into many files upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mcp_iceberg_duckdb_spark.sources.tables import EVENTS_NTZ_SCHEMA, SCHEMAS


def _resolve_schema(
    table: str | None, schema: T.StructType | str | None
) -> T.StructType | str:
    if schema is not None:
        return schema
    if table is not None:
        if table not in SCHEMAS:
            raise ValueError(
                f"unknown table {table!r}; known: {sorted(SCHEMAS)}"
            )
        if table == "events":
            # the raw-parquet schema reads ts as int64 only to sniff
            # the footer unit (tables.py); external CSV/JSONL carries
            # textual timestamps — bind the post-conversion NTZ schema
            return EVENTS_NTZ_SCHEMA
        return SCHEMAS[table]
    raise ValueError(
        "pass table= (a TESTDATA.md table) or schema= — schema inference "
        "is disabled by design (it costs a full extra pass over the data)"
    )


# Spark's DEFAULT text writers truncate TIMESTAMP_NTZ to milliseconds
# (pattern yyyy-MM-dd'T'HH:mm:ss[.SSS]) — a silent 3-digit precision
# loss on round-trip that parquet never has. Both directions here pin
# full microseconds instead; override per-call if ingesting foreign
# files with a different convention.
_NTZ_US_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def read_csv(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Lazy CSV load with pinned schema. Defaults: header on, empty
    string as NULL, FAILFAST, µs-precision NTZ timestamps. CSV
    carries no nested types — tables with array columns (embeddings)
    must arrive as JSONL/parquet.

    Embedded newlines: the writer quotes them (standard CSV), but
    parsing quoted newlines requires ``multiLine="true"``, which
    makes every file NON-SPLITTABLE (one task per file — a real cost
    at 100 TB). The default therefore stays splittable and FAILFAST
    makes the mismatch LOUD, never silent; pass multiLine for
    newline-bearing data, or prefer JSONL (splittable AND
    newline-safe) — the round-trip contract is pinned in
    tests/test_file_sources.py."""
    resolved = _resolve_schema(table, schema)
    if isinstance(resolved, T.StructType) and any(
        isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        for f in resolved.fields
    ):
        raise ValueError(
            f"table {table!r} has nested columns — CSV cannot represent "
            "them; use read_jsonl or parquet"
        )
    opts = {
        "header": "true",
        "nullValue": "",
        "mode": "FAILFAST",
        "timestampNTZFormat": _NTZ_US_FORMAT,
    }
    opts.update(options)
    return spark.read.options(**opts).schema(resolved).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Lazy JSON-lines load with pinned schema (one JSON object per
    line — the crawl-drop format; multiLine JSON is NOT splittable
    and is deliberately not defaulted)."""
    resolved = _resolve_schema(table, schema)
    opts = {"mode": "FAILFAST", "timestampNTZFormat": _NTZ_US_FORMAT}
    opts.update(options)
    return spark.read.options(**opts).schema(resolved).json(path)


def write_csv(df: DataFrame, path: str, **options) -> None:
    """CSV sink matching read_csv's conventions (header, µs NTZ)."""
    opts = {"header": "true", "timestampNTZFormat": _NTZ_US_FORMAT}
    opts.update(options)
    df.write.options(**opts).mode("overwrite").csv(path)


def write_jsonl(df: DataFrame, path: str, **options) -> None:
    """JSONL sink matching read_jsonl's conventions (µs NTZ —
    Spark's default writer silently truncates to milliseconds)."""
    opts = {"timestampNTZFormat": _NTZ_US_FORMAT}
    opts.update(options)
    df.write.options(**opts).mode("overwrite").json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Lazy ORC load. ORC is self-describing like parquet, so the
    pinned schema here acts as a CONTRACT check (column pruning +
    type projection) rather than an inference replacement; it also
    keeps predicate pushdown and splittable stripes — the only
    columnar alternative Spark ships a native vectorized reader for.
    Nested types round-trip (unlike CSV)."""
    reader = spark.read.options(**options).format("orc")
    resolved = _resolve_schema(table, schema) if (table or schema) else None
    if resolved is not None:
        reader = reader.schema(resolved)
    return reader.load(path)


def write_orc(df: DataFrame, path: str, **options) -> None:
    """ORC sink (zlib default — Spark's vectorized ORC writer).
    TIMESTAMP_NTZ, decimals, and nested arrays all round-trip at
    full precision; stripe-level min/max indexes give the same
    row-group pruning lever the z-order layout test measures for
    parquet."""
    df.write.options(**options).mode("overwrite").orc(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-files compaction — the maintenance pass every streaming
    or per-batch writer eventually needs (thousands of KB-sized files
    turn scan planning and open() overhead into the bottleneck long
    before bytes do). Rewrites ``path`` into ``out_path`` with file
    count sized from the ACTUAL input bytes / target_file_bytes; with
    ``sort_cols`` the rewrite is range-partitioned + sorted so
    min/max stats prune afterwards (the OPTIMIZE ... ZORDER
    counterpart for a plain sort key — pair with the z-order key
    expression in operators/graph.py for multi-column pruning).

    Returns the number of files written. Input sizing uses the
    driver-side filesystem listing — metadata only, no data pass."""
    import math
    import os as _os

    total = 0
    for root, _dirs, names in _os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                total += _os.path.getsize(_os.path.join(root, n))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(out_path)
    return sum(
        1
        for _root, _dirs, names in _os.walk(out_path)
        for n in names
        if n.endswith(".parquet")
    )


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: unions the schemas of every file under
    ``path`` (mergeSchema) so batches written before a column was
    added coexist with batches written after — the files-only
    fallback for the ALTER TABLE ADD COLUMN path (ddl.py); absent
    columns read as NULL. Costs a footer read per file at planning
    time, which is why it is an explicit opt-in function and not the
    default loader behavior."""
    return spark.read.option("mergeSchema", "true").parquet(path)
