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


def _split_top_level_bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups in a plan-node argument list
    (brackets nest inside window expressions)."""
    depth = 0
    groups: list[str] = []
    cur: list[str] = []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def global_window_count(df: DataFrame) -> int:
    """Number of Window physical nodes with NO partition spec — each
    one moves its entire input relation to a single partition at
    runtime (Spark logs `WindowExec: No Partition Defined ... Moving
    all data to a single partition`). A partitioned Window renders as
    ``Window [exprs], [partSpec], [orderSpec]`` (3 top-level bracket
    groups); an unpartitioned one as ``Window [exprs], [orderSpec]``
    (2). At 100 TB an unpartitioned window over anything that grows
    with the corpus is a non-starter, so tests/test_plans.py fails
    any registry query whose plan contains one UNLESS the site is
    registered with a proven input-row bound. Accepts a DataFrame or
    an already-captured ``explain(mode="simple")`` string (the
    whole-registry audits explain once and run every detector on the
    text)."""
    plan = df if isinstance(df, str) else explain_str(df, mode="simple")
    n = 0
    for line in plan.splitlines():
        m = re.search(r"(?:^|\+\- |:\- |^\s*)Window (\[.*)$", line)
        if m is None or "WindowGroupLimit" in line:
            continue
        args = m.group(1)
        groups = _split_top_level_bracket_groups(args)
        if len(groups) >= 3:
            continue  # [exprs], [partSpec], [orderSpec]
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC)\b", groups[1]
        ):
            continue  # [exprs], [partSpec] — partitioned, unordered
        n += 1
    return n


def range_partitioning_count(df: DataFrame) -> int:
    """Number of rangepartitioning exchanges (global sorts) in the
    static plan. A global sort samples the whole relation to pick
    range bounds, then total-orders it — legitimate only as the final
    presentation ORDER BY of a small head; anything else should be a
    hash-bucketed two-phase rank (x_corpus_epoch_shuffle) or a
    TakeOrderedAndProject top-k. tests/test_plans.py pins the
    allowlist so a future regression (e.g. an orderBy sneaking in
    front of a window) fails tests instead of burning a cluster.
    Accepts a DataFrame or a captured simple-mode plan string."""
    plan = df if isinstance(df, str) else explain_str(df, mode="simple")
    return len(re.findall(r"\brangepartitioning\b", plan))
