"""Deterministic scale-fixture generator for the TPC-H fact tables —
the inputs of the relational/join/agg family.

make_scale_fixture.py gave the text/dedup heavyweights a measured
scaling decade; the join/agg family's 100 TB story still rested on
pinned plan shapes alone (VERDICT round-6, "Next round" item 4). This
script replicates ORDERS and LINEITEM R times with the orderkey space
shifted per replica — every other column, including the foreign keys
into customer/supplier/part, is kept verbatim, so:

- orders↔lineitem join keys stay consistent inside each replica and
  the replicas are key-disjoint (offset = replica · (max_orderkey+1));
- the dimension tables are copied UNCHANGED — this is the realistic
  fact-growth shape (a warehouse's facts grow ~linearly while its
  dimensions saturate), and it keeps every fixture join valid;
- per-group row counts grow R× for dimension-grouped queries (q5/q9/
  q21) while GROUP COUNT grows R× for orderkey-grouped ones (q18) —
  both scaling regimes are exercised;
- date/flag distributions are bit-identical per replica, so selective
  predicates (q1's shipdate cut, q19's disjunction) stay proportional
  and cross-scale wall-time RATIOS compare like with like.

Row groups are written per replica (~600k rows each), so Spark's scan
parallelism grows with the data exactly as a real ingest's file count
would.

Usage:
    python scripts/make_tpch_scale_fixture.py OUT_DIR REPLICAS

Writes OUT_DIR/{orders,lineitem}.parquet (+ copies of every other
fixture table). Never touches /root/testdata.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SRC_SF_DIR = Path("/root/testdata/sf0.1")


def _replicate(table_name: str, key_col: str, out: Path, replicas: int) -> int:
    src = pq.read_table(SRC_SF_DIR / f"{table_name}.parquet")
    max_key = pa.compute.max(src.column(key_col)).as_py()
    stride = max_key + 1
    key_idx = src.schema.get_field_index(key_col)
    with pq.ParquetWriter(out / f"{table_name}.parquet", src.schema) as w:
        for r in range(replicas):
            shifted = pa.compute.add(src.column(key_col), r * stride)
            w.write_table(
                src.set_column(key_idx, src.schema.field(key_col), shifted)
            )
    return src.num_rows * replicas


def main() -> None:
    out = Path(sys.argv[1])
    replicas = int(sys.argv[2])
    out.mkdir(parents=True, exist_ok=True)
    n_o = _replicate("orders", "o_orderkey", out, replicas)
    n_l = _replicate("lineitem", "l_orderkey", out, replicas)
    for p in SRC_SF_DIR.glob("*.parquet"):
        if p.stem not in ("orders", "lineitem"):
            shutil.copy(p, out / p.name)
    print(f"wrote {out}: {n_o} orders, {n_l} lineitem ({replicas} replicas)")


if __name__ == "__main__":
    main()
