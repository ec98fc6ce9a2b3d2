"""Cross-engine result comparison helpers shared by the test suite
(tests/conftest.assert_matches_oracle) and the full-registry sweep
(scripts/oracle_sweep.py) — one normalization, applied everywhere,
mirroring the driver's sorted-columns order-insensitive value hash."""

from __future__ import annotations

import math


def norm_cell(v):
    """Normalize a cell for cross-engine comparison. Type-tagged:
    the driver value-hashes results, where 23 (BIGINT) and 23.0
    (DOUBLE) differ — Python's 23 == 23.0 must not mask that, nor
    bool vs int (bool is an int subclass), nor Decimal('1') vs 1
    (str() of both is '1')."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # collapse -0.0 / +0.0 and last-ulp noise the queries didn't
        # already round away
        return ("f", round(v, 9) + 0.0)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, list):
        return ("l", tuple(norm_cell(x) for x in v))
    return (type(v).__name__, v)


def rows_to_multiset(cols, rows):
    """Column-name-sorted, order-insensitive multiset of typed rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows),
        key=lambda tup: tuple(str(x) for x in tup),
    )
