"""The sf1 decade record can never silently go stale (VERDICT
round-9 "Next round" item 1): DECADE_SF1.md carries a
machine-readable ``recorded-query-count:`` line stating how many
registry queries the committed sf1 sweep covered; this default-run
test fails the suite the moment a query is registered without
re-running the decade gate (`pytest -m decade`) and refreshing the
record."""

from __future__ import annotations

import re
from pathlib import Path


def test_decade_record_matches_registry():
    from mcp_iceberg_duckdb_spark import registry

    registry.load_all()
    text = (Path(__file__).parents[1] / "DECADE_SF1.md").read_text()
    m = re.search(r"^recorded-query-count:\s*(\d+)\s*$", text, re.M)
    assert m, (
        "DECADE_SF1.md lacks the machine-readable "
        "'recorded-query-count: N' line"
    )
    recorded, live = int(m.group(1)), len(registry.QUERIES)
    assert recorded == live, (
        f"the committed sf1 decade sweep covered {recorded} queries but "
        f"the registry now has {live} — re-run "
        "`python scripts/make_sf1_fixture.py /tmp/sf1 10 && "
        "python -m pytest -m decade tests/test_decade.py` and update "
        "DECADE_SF1.md (count + results)"
    )
