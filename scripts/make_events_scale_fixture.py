"""Deterministic scale-fixture generator for the events table — the
input of the ops/observability family (s_*) and the streaming twins.

The tier-X text/dedup family has two measured decades and the TPC-H
facts have one; the events family's 100 TB claims rested on two flat
queries (HLL rolling, approx percentiles). This script replicates the
sf0.1 event log R times with the USER and EVENT id spaces shifted per
replica and the time axis untouched:

- user count grows R× with each user keeping the fixture's realistic
  per-user history — the scale axis that matters for keyed state
  (stateful twins, RFM, rolling-active-users all carry per-user
  state);
- per-hour / per-day event volume grows R× — the axis that matters
  for the time-bucketed aggregations (percentile buckets, mix drift,
  trending);
- event-time distributions are bit-identical per replica, so
  watermark/lateness behavior and cross-scale wall-time RATIOS
  compare like with like.

Row groups are written per replica (~100k rows each) so scan
parallelism grows with the data like a real ingest's file count.

Usage:
    python scripts/make_events_scale_fixture.py OUT_DIR REPLICAS

Writes OUT_DIR/events.parquet (+ copies of every other fixture
table). Never touches /root/testdata.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SRC_SF_DIR = Path("/root/testdata/sf0.1")


def main() -> None:
    out = Path(sys.argv[1])
    replicas = int(sys.argv[2])
    out.mkdir(parents=True, exist_ok=True)
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
    for p in SRC_SF_DIR.glob("*.parquet"):
        if p.stem != "events":
            shutil.copy(p, out / p.name)
    print(
        f"wrote {out}: {src.num_rows * replicas} events "
        f"({replicas} replicas, {uid_stride * replicas} user-id space)"
    )


if __name__ == "__main__":
    main()
