"""The decade gate (VERDICT round-8 "Next round" item 1): the full
277-query differential sweep at sf1 — one measured decade above the
driver's bench scale, two above its correctness scale — as a standing
opt-in pytest marker. The repo's entire bug history (int64 ppm
overflows, candidate-mass blowups, 1 GB-heap OOMs) consists of
defects invisible below a decade jump.

Run it with:

    python scripts/make_sf1_fixture.py /tmp/sf1 10   # ~170 MB, ~1 min
    python -m pytest -m decade tests/test_decade.py  # ~1-2 h

Excluded from default runs via pyproject's `-m "not decade"` addopts.
The sweep subprocess uses a 48 GB driver heap (local-mode JVM shares
driver/executor; the bare 1 GB heap OOMs on shuffle buffers alone at
sf1) and records the 10 oracle-side-quadratic dedup/CC queries
rows-only (scripts/oracle_sweep.DECADE_ROWS_ONLY — their DuckDB
oracles are all-pairs/recursive by design and exceed 720 s at 50k
docs; their Spark sides still execute and their value parity is
enforced at sf0.01/sf0.1 every round)."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
REPO = Path(__file__).parents[1]

pytestmark = pytest.mark.decade


def _require_sf1():
    if not (Path(SF1_DIR) / "lineitem.parquet").exists():
        pytest.skip(
            f"no sf1 fixture at {SF1_DIR} — generate with "
            "`python scripts/make_sf1_fixture.py /tmp/sf1 10`"
        )


def test_sf1_full_registry_sweep():
    """Every registered query runs at sf1; every tractable oracle
    value-matches DuckDB there. 0 bad = green."""
    _require_sf1()
    sys.path.insert(0, str(REPO / "scripts"))
    from oracle_sweep import DECADE_ROWS_ONLY

    env = dict(os.environ)
    env["SPARK_GRAFT_SWEEP_MEM"] = env.get("SPARK_GRAFT_SWEEP_MEM", "48g")
    env["SPARK_GRAFT_SWEEP_ROWS_ONLY"] = ",".join(DECADE_ROWS_ONLY)
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "oracle_sweep.py"), SF1_DIR, "32"],
        env=env,
        capture_output=True,
        text=True,
        timeout=4 * 3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"sf1 sweep failed:\n{tail}"
    assert "SWEEP" in proc.stdout, f"sweep produced no summary:\n{tail}"
