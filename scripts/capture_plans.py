"""Capture .explain("formatted") output for registered queries into
plans/r<N>/<query>_<tag>.txt — the optimization-round evidence files
(the judge checks plan claims against these).

Usage:
    python scripts/capture_plans.py <tag> [query1,query2,...]

With no query list, captures every registered query. Tag is normally
"before" or "after". SPARK_GRAFT_SF_DIR selects the fixture
(default /root/testdata/sf0.1); SPARK_GRAFT_PLANS_DIR the output dir
(default plans/r14).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = Path(
    os.environ.get("SPARK_GRAFT_PLANS_DIR", str(REPO_ROOT / "plans" / "r14"))
)


def main() -> None:
    from mcp_iceberg_duckdb_spark import registry
    from mcp_iceberg_duckdb_spark.session import build_session

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    registry.load_all()
    names = (
        [s for s in sys.argv[2].split(",") if s]
        if len(sys.argv) > 2
        else list(registry.QUERIES)
    )
    spark = build_session(app_name="capture_plans")
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for name in names:
        q = registry.QUERIES.get(name)
        if q is None:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        try:
            df = q.builder(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture must not die on one query
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        (OUT_DIR / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
