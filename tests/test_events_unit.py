"""Unit coverage for the events timestamp-unit sniffing: the ms
fixture variant (never shipped yet, but the loader claims to handle
it) and the descriptive error paths ADVICE round 3 asked for."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mcp_iceberg_duckdb_spark.sources.tables import events_ts_unit, load


@pytest.fixture(scope="module")
def ms_events(sf_dir, tmp_path_factory):
    src = os.path.join(sf_dir, "events.parquet")
    tbl = pq.read_table(src)
    idx = tbl.schema.get_field_index("ts")
    import pyarrow.compute as pc

    # truncate µs → ms by integer division (values are post-1970, so
    # integer division floors like a time truncation would)
    us_int = tbl.column("ts").cast(pa.int64())
    ms = pc.divide(us_int, 1000).cast(pa.timestamp("ms"))
    tbl = tbl.set_column(idx, pa.field("ts", pa.timestamp("ms")), ms)
    out_dir = tmp_path_factory.mktemp("events_ms")
    out = str(out_dir / "events.parquet")
    pq.write_table(tbl, out)
    assert pq.read_schema(out).field("ts").type == pa.timestamp("ms")
    return str(out_dir)


def test_ms_variant_loads_and_matches_native(spark, sf_dir, ms_events):
    """A TIMESTAMP(MILLIS) fixture must load through the NTZ branch
    with ms-truncated wall-clock values (the cast to ms floors
    sub-millisecond digits; everything else must be identical)."""
    assert events_ts_unit(os.path.join(ms_events, "events.parquet")) == "ms"
    native = load(spark, sf_dir, "events").selectExpr(
        "event_id", "date_trunc('hour', ts) AS h"
    )
    ms = load(spark, ms_events, "events").selectExpr(
        "event_id", "date_trunc('hour', ts) AS h"
    )
    assert sorted(map(tuple, ms.collect())) == sorted(
        map(tuple, native.collect())
    )


def test_unit_sniff_dir_and_file_agree(sf_dir):
    f = os.path.join(sf_dir, "events.parquet")
    assert events_ts_unit(f) in ("ns", "us", "ms")


def test_unit_sniff_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="no .parquet"):
        events_ts_unit(str(tmp_path))


def test_unit_sniff_non_timestamp_raises(tmp_path):
    out = str(tmp_path / "events.parquet")
    pq.write_table(
        pa.table({"event_id": [1], "ts": pa.array([5], pa.int64())}), out
    )
    with pytest.raises(TypeError, match="not a\n?\\s*timestamp|not a timestamp"):
        events_ts_unit(out)
