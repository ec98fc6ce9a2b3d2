"""Every oracle pair must agree on exact column TYPES, not just
values: the driver's hasher may distinguish int32 from int64 and
TIMESTAMP from TIMESTAMP_NTZ even when Python-level values compare
equal (Spark size()/rank()/ntile()/year() return INT where DuckDB's
len()/rank()/year() return BIGINT — a silent hash-gap the value
sweeps can never catch)."""

from __future__ import annotations

import pytest

from mcp_iceberg_duckdb_spark import registry

registry.load_all()

_ORACLED = sorted(
    n for n, s in registry.QUERIES.items() if s.oracle is not None
)

_DUCK_CANON = {
    "integer": "int",
    "bigint": "bigint",
    "smallint": "smallint",
    "tinyint": "tinyint",
    "double": "double",
    "float": "float",
    "varchar": "string",
    "boolean": "boolean",
    "timestamp": "timestamp_ntz",  # DuckDB TIMESTAMP is naive
    "date": "date",
    "blob": "binary",
}


def _canon_duck(t: str) -> str:
    t = str(t).lower()
    if t.startswith("decimal"):
        return t
    if t.endswith("[]"):
        return f"array<{_canon_duck(t[:-2])}>"
    return _DUCK_CANON.get(t, t)


_ALL = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", _ALL)
def test_no_toplevel_container_columns(name, spark, sf_dir):
    """Driver-canonicalizer contract: the external compare sorts the
    result with pandas ``sort_values``, which crashes on unhashable
    list/dict cells — so no registered query may project a raw
    ArrayType/MapType column at the top level (the round-4 f_map /
    f_array_setops failure class). Arrays must be joined to strings
    (``concat_ws``/``array_join``) or exploded before projection."""
    from pyspark.sql.types import ArrayType, MapType

    sdf = registry.QUERIES[name].builder(spark, sf_dir)  # lazy
    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]
    assert not bad, (
        f"{name}: top-level container columns {bad} would crash the "
        "driver canonicalizer — project strings instead"
    )


@pytest.mark.parametrize("name", _ORACLED)
def test_output_types_match_oracle(name, spark, duck, sf_dir):
    spec = registry.QUERIES[name]
    sdf = spec.builder(spark, sf_dir)  # lazy: schema only, no execution
    stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    oracle = spec.oracle() if callable(spec.oracle) else spec.oracle
    rel = duck.sql(oracle)
    dtypes = {c: _canon_duck(t) for c, t in zip(rel.columns, rel.types)}
    diffs = {
        c: (stypes.get(c), dtypes.get(c))
        for c in set(stypes) | set(dtypes)
        if stypes.get(c) != dtypes.get(c)
    }
    assert not diffs, f"{name}: column type mismatches {diffs}"


def test_every_registered_query_is_oracle_backed():
    """The repo's standing claim: NO rows-only queries — every
    registered builder carries a DuckDB oracle (weaker rows-only
    driver checks never apply here). A new query without one fails
    here before it ships."""
    missing = [
        n for n, s in registry.QUERIES.items() if s.oracle is None
    ]
    assert not missing, f"oracle-less queries registered: {missing}"
