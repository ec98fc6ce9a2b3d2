"""Physical-plan inspection helpers — the machinery behind the
"explain and iterate until it's the plan you'd want" loop.

These parse ``df.explain("formatted")`` output; tests in
tests/test_plans.py pin the scale-critical properties:

- filters reach the parquet scan (PushedFilters non-empty),
- projection pruning reaches the scan (ReadSchema minimal),
- dimension joins broadcast (BroadcastHashJoin, fact side unshuffled),
- top-k plans as TakeOrderedAndProject (per-partition heaps),
- rank-limit windows use WindowGroupLimit (k rows per group survive
  the shuffle instead of the whole partition),
- shuffle (Exchange) counts don't silently regress.

At 100 TB each of these is the difference between a job that runs
and one that doesn't; pinning them in tests turns plan regressions
into test failures.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_pushed_filters(df: DataFrame, table_hint: str | None = None) -> bool:
    """True if at least one scan reports non-empty PushedFilters."""
    plan = explain_str(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            return True
    return False


def read_schema_columns(df: DataFrame, path_hint: str) -> list[str]:
    """Column names in the ReadSchema of the scan whose Location
    contains path_hint — i.e. what actually gets read from parquet."""
    plan = explain_str(df)
    blocks = re.split(r"\n\n", plan)
    for block in blocks:
        if path_hint in block:
            m = re.search(r"ReadSchema: struct<([^>]*)>", block)
            if m:
                return [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
    # fallback: first ReadSchema in the plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    return (
        [c.split(":")[0].strip() for c in m.group(1).split(",") if c] if m else []
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def has_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in explain_str(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan (AQE may
    remove some at runtime; this counts the static plan)."""
    return len(re.findall(r"\bExchange\b", explain_str(df, mode="simple")))
