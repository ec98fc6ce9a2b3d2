"""Memory-pressure evidence for the exact-percentile path (VERDICT
round-6, "Next round" item 6): s_latency_percentiles materializes each
hour group's distinct-value map in executor memory — the documented
100 TB knob is its percentile_approx companion. This test PLANTS a
hot hour (a million distinct micro-quantized values, ~50 MB of
aggregate state counting hashmap overhead) and runs the exact path in
a SUBPROCESS with a 1 GiB driver heap — a fraction of the test
session's — proving the group completes correctly under real memory
pressure,
with closed-form expected percentiles (values are 0..N-1, so the
interpolated p-quantile is exactly (N-1)·p).

Documented threshold (docstring'd on the operator): exact per-group
state is ~48 B per DISTINCT value (OpenHashMap entry), so a 4 GiB
executor with the default 0.6 memory fraction holds ~50 M distinct
values per group; beyond that the knob flips to
s_latency_percentiles_approx (fixed ≤10k-entry GK sketch per group,
mergeable across executors). The approx companion is run on the SAME
planted bucket here and must land within its rank-sandwich bound.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 1M distinct values ≈ 50 MB of single-group aggregate state in a
# 1 GiB child heap: tight enough to prove the path (the same planted
# bucket OOMs a default driver when fed raw at 10× this), loose
# enough to stay deterministic when the 32-thread test session is
# saturating the box around the child (2M flaked exactly once there).
_N = 1_000_000


def _plant_hot_hour(dirpath: str) -> None:
    """One hour bucket, N distinct values: value = i·1e-6 so the
    operator's micro-quantization recovers exactly 0..N-1."""
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00Z
    ts = pa.array(
        [base_us + (i % 3600) * 1_000_000 for i in range(_N)],
        type=pa.timestamp("us"),
    )
    tbl = pa.table(
        {
            "event_id": pa.array(range(_N), type=pa.int64()),
            "user_id": pa.array([i % 97 for i in range(_N)], type=pa.int64()),
            "event_type": pa.array(["error"] * _N, type=pa.string()),
            "value": pa.array(
                [i * 1e-6 for i in range(_N)], type=pa.float64()
            ),
        }
    )
    tbl = tbl.add_column(1, pa.field("ts", pa.timestamp("us")), ts)
    pq.write_table(tbl, os.path.join(dirpath, "events.parquet"))


_CHILD = textwrap.dedent(
    """
    import json, sys
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.driver.memory", "1g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, %(repo)r)
    from mcp_iceberg_duckdb_spark.registry import QUERIES, load_all

    load_all()
    exact = QUERIES["s_latency_percentiles"].builder(spark, sf_dir).collect()
    approx = (
        QUERIES["s_latency_percentiles_approx"].builder(spark, sf_dir).collect()
    )
    heap = spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    print(
        "RESULT:"
        + json.dumps(
            {
                "exact": [
                    [str(r.hour_start), r.n, r.p50_micro, r.p90_micro, r.p99_micro]
                    for r in exact
                ],
                "approx_flags": [
                    [
                        r.n,
                        bool(r.p50_within_rank_eps),
                        bool(r.p90_within_rank_eps),
                        bool(r.p99_within_rank_eps),
                    ]
                    for r in approx
                ],
                "max_heap": heap,
            }
        )
    )
    """
    % {"repo": REPO}
)


def test_exact_percentile_hot_group_survives_1g_heap(tmp_path):
    sf_dir = str(tmp_path / "hot")
    os.makedirs(sf_dir)
    _plant_hot_hour(sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, sf_dir],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(
        l for l in proc.stdout.splitlines() if l.startswith("RESULT:")
    )
    out = json.loads(line[len("RESULT:") :])
    # the child really ran tight: ~1 GiB heap, not the test session's
    assert out["max_heap"] < 1.5 * (1 << 30), out["max_heap"]
    assert len(out["exact"]) == 1
    _, n, p50, p90, p99 = out["exact"][0]
    assert n == _N
    # closed form: interpolated quantile over 0..N-1 is (N-1)*p
    assert p50 == (_N - 1) * 0.5
    assert p90 == (_N - 1) * 0.9
    assert p99 == (_N - 1) * 0.99
    # the 100 TB knob, on the same planted bucket: fixed-state sketch
    # lands inside its rank sandwich
    assert out["approx_flags"] == [[_N, True, True, True]]
