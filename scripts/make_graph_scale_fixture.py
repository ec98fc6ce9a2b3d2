"""Deterministic scale-fixture generator for the orders/lineitem
co-purchase family — the inputs of the graph / basket heavyweights
(PageRank, k-core, LPA, triangles, Adamic-Adar, market-basket lift).

Companion to make_scale_fixture.py (documents/embeddings): the graph
operators' 100 TB claims are linearity arguments over |edges| and the
sparsified-subgraph bounds; this regenerates the transactional tables
at ANY multiple of sf0.1, mimicking its measured joint distribution
(read-only from /root/testdata/sf0.1):

- orders per customer ~ fixture empirical (10 avg, keys contiguous)
- basket size (lineitems per order) resampled from the fixture's
  empirical histogram (mode 3-4, tail to 17)
- supplier/part keys uniform over dimensions scaled WITH the corpus
  (suppliers 1000·F, parts 20000·F) so per-node degree and per-pair
  co-occurrence statistics stay in the fixture's regime instead of
  densifying into a near-complete graph — the property the mutual
  top-K sparsification bounds rely on
- all non-key columns filled with fixture-plausible values so the
  schema-pinned loaders (sources/tables.py) accept the files

The SAME generator (same seed policy) produces every scale, so
cross-scale wall-time RATIOS compare generator output against
generator output. Remaining tables are copied from sf0.1 unchanged.

Usage:
    python scripts/make_graph_scale_fixture.py OUT_DIR FACTOR [SEED]

Writes OUT_DIR/{orders,lineitem,customer,supplier,part}.parquet plus
copies of the other fixture tables. Never touches /root/testdata.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC_SF_DIR = Path("/root/testdata/sf0.1")

_BASE_ORDERS = 150_000
_BASE_CUST = 15_000
_BASE_SUPP = 1_000
_BASE_PART = 20_000


def main() -> None:
    out_dir = Path(sys.argv[1])
    factor = float(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    rng = np.random.default_rng(seed)
    out_dir.mkdir(parents=True, exist_ok=True)

    n_orders = int(_BASE_ORDERS * factor)
    n_cust = int(_BASE_CUST * factor)
    n_supp = int(_BASE_SUPP * factor)
    n_part = int(_BASE_PART * factor)

    # empirical basket-size histogram from the fixture
    src_li = pq.read_table(
        SRC_SF_DIR / "lineitem.parquet", columns=["l_orderkey"]
    )
    _, counts = np.unique(
        src_li.column("l_orderkey").to_numpy(), return_counts=True
    )
    sizes, freq = np.unique(counts, return_counts=True)
    basket = rng.choice(sizes, size=n_orders, p=freq / freq.sum())

    orderkey = np.arange(n_orders, dtype=np.int64)
    custkey = rng.integers(0, n_cust, size=n_orders, dtype=np.int64)
    base_day = np.datetime64("1995-01-01", "us")
    odate = base_day + (
        rng.integers(0, 2400, size=n_orders) * np.int64(86_400_000_000)
    ).astype("timedelta64[us]")
    orders = pa.table(
        {
            "o_orderkey": orderkey,
            "o_custkey": custkey,
            "o_orderstatus": np.where(
                rng.random(n_orders) < 0.5, "O", "F"
            ),
            "o_totalprice": np.round(
                rng.uniform(1000.0, 400000.0, size=n_orders), 2
            ),
            "o_orderdate": odate,
            "o_orderpriority": np.full(n_orders, "3-MEDIUM"),
        }
    )

    li_order = np.repeat(orderkey, basket)
    n_li = len(li_order)
    li_line = np.concatenate(
        [np.arange(1, b + 1, dtype=np.int32) for b in basket]
    )
    lineitem = pa.table(
        {
            "l_orderkey": li_order,
            "l_partkey": rng.integers(0, n_part, size=n_li, dtype=np.int64),
            "l_suppkey": rng.integers(
                1000, 1000 + n_supp, size=n_li, dtype=np.int64
            ),
            "l_linenumber": li_line,
            "l_quantity": rng.integers(1, 51, size=n_li).astype(np.float64),
            "l_extendedprice": np.round(
                rng.uniform(900.0, 100000.0, size=n_li), 2
            ),
            "l_discount": np.round(rng.uniform(0.0, 0.1, size=n_li), 2),
            "l_tax": np.round(rng.uniform(0.0, 0.08, size=n_li), 2),
            "l_returnflag": np.full(n_li, "N"),
            "l_linestatus": np.full(n_li, "O"),
            "l_shipdate": np.repeat(odate, basket)
            + (
                rng.integers(1, 120, size=n_li) * np.int64(86_400_000_000)
            ).astype("timedelta64[us]"),
        }
    )

    customer = pa.table(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": np.array([f"Customer#{i:09d}" for i in range(n_cust)]),
            "c_nationkey": rng.integers(
                0, 25, size=n_cust, dtype=np.int32
            ),
            "c_acctbal": np.round(
                rng.uniform(-999.99, 9999.99, size=n_cust), 2
            ),
            "c_mktsegment": np.full(n_cust, "BUILDING"),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": np.arange(1000, 1000 + n_supp, dtype=np.int64),
            "s_name": np.array(
                [f"Supplier#{i:09d}" for i in range(n_supp)]
            ),
            "s_nationkey": rng.integers(
                0, 25, size=n_supp, dtype=np.int32
            ),
            "s_acctbal": np.round(
                rng.uniform(-999.99, 9999.99, size=n_supp), 2
            ),
        }
    )
    part_names = np.array([f"part {i} powder" for i in range(n_part)])
    src_part = pq.read_schema(SRC_SF_DIR / "part.parquet")
    part_cols = {"p_partkey": np.arange(n_part, dtype=np.int64)}
    for f in src_part:
        if f.name == "p_partkey":
            continue
        if f.name == "p_name":
            part_cols[f.name] = part_names
        elif pa.types.is_integer(f.type):
            part_cols[f.name] = rng.integers(
                1, 50, size=n_part
            ).astype(f.type.to_pandas_dtype())
        elif pa.types.is_floating(f.type):
            part_cols[f.name] = np.round(
                rng.uniform(900.0, 2000.0, size=n_part), 2
            )
        else:
            part_cols[f.name] = np.full(n_part, "STANDARD")
    part = pa.table(part_cols)

    for name, tbl in (
        ("orders", orders),
        ("lineitem", lineitem),
        ("customer", customer),
        ("supplier", supplier),
        ("part", part),
    ):
        src_schema = pq.read_schema(SRC_SF_DIR / f"{name}.parquet")
        tbl = tbl.select(src_schema.names).cast(pa.schema(src_schema))
        pq.write_table(tbl, str(out_dir / f"{name}.parquet"))

    for name in ("region", "nation", "events", "documents", "embeddings"):
        shutil.copy(
            SRC_SF_DIR / f"{name}.parquet", out_dir / f"{name}.parquet"
        )
    print(
        f"wrote {out_dir}: {n_orders} orders / {n_li} lineitems / "
        f"{n_cust} customers / {n_supp} suppliers / {n_part} parts"
    )


if __name__ == "__main__":
    main()
