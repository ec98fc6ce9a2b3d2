"""Composed sf1 fixture: one directory with EVERY table a decade
above the driver's sf0.1 fixture, assembled from the three
family-specific generators (VERDICT round-8, "Next round" item 1):

- documents/embeddings: regenerated at 10x (50,000 docs / 20,000
  vecs) with make_scale_fixture's empirical-distribution generator;
- orders/lineitem: make_tpch_scale_fixture's key-shifted replication
  x10 (non-key columns verbatim, so TPC-H predicate selectivities
  stay proportional);
- events: make_events_scale_fixture's user/event-id-shifted
  replication x10 (per-user history preserved, time axis untouched);
- region/nation/customer/supplier/part: copied unchanged — the
  realistic fact-growth shape (facts grow, dimensions saturate),
  and it keeps every fixture foreign key valid.

The result is the standing input of the `-m decade` pytest gate
(tests/test_decade.py) and scripts/oracle_sweep.py / bench.py runs at
sf1. Default output /tmp/sf1 (~170 MB); never touches /root/testdata.

Usage:
    python scripts/make_sf1_fixture.py [OUT_DIR] [FACTOR]
    # defaults: /tmp/sf1, 10
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

SCRIPTS = Path(__file__).resolve().parent
if str(SCRIPTS) not in sys.path:
    sys.path.insert(0, str(SCRIPTS))

import make_scale_fixture as docs_gen  # noqa: E402
import make_tpch_scale_fixture as tpch_gen  # noqa: E402

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SRC_SF_DIR = Path("/root/testdata/sf0.1")


def replicate_events(out: Path, replicas: int) -> int:
    """make_events_scale_fixture's replication, importable form."""
    src = pq.read_table(SRC_SF_DIR / "events.parquet")
    eid_stride = pa.compute.max(src.column("event_id")).as_py() + 1
    uid_stride = pa.compute.max(src.column("user_id")).as_py() + 1
    ei = src.schema.get_field_index("event_id")
    ui = src.schema.get_field_index("user_id")
    with pq.ParquetWriter(out / "events.parquet", src.schema) as w:
        for r in range(replicas):
            t = src.set_column(
                ei,
                src.schema.field("event_id"),
                pa.compute.add(src.column("event_id"), r * eid_stride),
            )
            t = t.set_column(
                ui,
                src.schema.field("user_id"),
                pa.compute.add(src.column("user_id"), r * uid_stride),
            )
            w.write_table(t)
    return src.num_rows * replicas


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/sf1")
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out.mkdir(parents=True, exist_ok=True)

    n_docs = 5000 * factor
    n_vecs = 2000 * factor
    docs_gen.make_documents(out, n_docs, seed=7)
    docs_gen.make_embeddings(out, n_vecs, seed=7, label_split=1)
    n_o = tpch_gen._replicate("orders", "o_orderkey", out, factor)
    n_l = tpch_gen._replicate("lineitem", "l_orderkey", out, factor)
    n_e = replicate_events(out, factor)
    for p in SRC_SF_DIR.glob("*.parquet"):
        if p.stem not in ("documents", "embeddings", "orders", "lineitem", "events"):
            shutil.copy(p, out / p.name)
    print(
        f"wrote {out}: {n_docs} docs, {n_vecs} vecs, {n_o} orders, "
        f"{n_l} lineitem, {n_e} events (factor {factor})"
    )


if __name__ == "__main__":
    main()
