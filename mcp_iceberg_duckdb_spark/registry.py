"""Central query registry — the engine's operator inventory made
executable.

Every operator from SURVEY.md §2 is registered here as a named
DataFrame builder, optionally paired with the ANSI-SQL oracle string
the driver runs through DuckDB (the reference's effective semantics
authority — its SELECT path delegates the raw SQL to embedded DuckDB
at IcebergConnection.py:114-116, so "matches DuckDB" IS parity).

Builders take ``(spark, sf_dir)`` and return a lazy DataFrame; no
builder may collect() — distribution stays inside Spark.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for the DuckDB differential oracle
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query builder (and its oracle SQL)."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def all_queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }


def load_all() -> None:
    """Import every operator module so decorators run."""
    from mcp_iceberg_duckdb_spark import operators, streaming  # noqa: F401
