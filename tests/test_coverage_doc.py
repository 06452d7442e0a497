"""COVERAGE.md and README.md are pinned against the live catalog so the
coverage docs can't silently lag when queries are added or removed
(the round-3 drift: two new queries missing from every doc)."""

import re

from __spark_entry__ import oracle_sql, queries

COVERAGE = "/root/repo/COVERAGE.md"
README = "/root/repo/README.md"

# every catalog query name uses one of these family prefixes; backticked
# tokens with these prefixes in COVERAGE.md are treated as query names
# for the reverse (staleness) direction of the check
_QUERY_TOKEN = re.compile(r"`([a-z][a-z0-9_]{2,})`")


def test_every_catalog_query_listed_in_coverage():
    text = open(COVERAGE).read()
    missing = [q for q in queries() if f"`{q}`" not in text]
    assert missing == [], f"COVERAGE.md lags the catalog: {missing}"


def test_coverage_lists_no_retired_queries():
    """Any backticked token that LOOKS like a catalog query (shares a
    family prefix with one) must actually be registered — a renamed or
    deleted query can't linger in the doc. RETIRED twins (capacity
    policy, r9) are still registered callables with CI oracle coverage,
    so naming them in the doc is legitimate — include them."""
    from proteofav_spark.queries import all_queries

    qs = set(all_queries(include_retired=True))
    stale = []
    q_col = None
    for line in open(COVERAGE).read().splitlines():
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        lowered = [c.lower() for c in cells]
        if any("query" in c and "`" not in c for c in lowered):
            q_col = next(i for i, c in enumerate(lowered) if "query" in c)
            continue
        if q_col is None or len(cells) <= q_col or set(cells[q_col]) <= set("- :"):
            continue
        for tok in _QUERY_TOKEN.findall(cells[q_col]):
            if tok not in qs:
                stale.append(tok)
    assert stale == [], f"COVERAGE.md lists non-catalog queries: {stale}"


def test_readme_counts_match_catalog():
    text = open(README).read()
    n_q, n_o = len(queries()), len(oracle_sql())
    assert f"{n_q} queries" in text, (
        f"README catalog count stale: expected '{n_q} queries'"
    )
    assert f"{n_o} with a DuckDB" in text, (
        f"README oracle count stale: expected '{n_o} with a DuckDB'"
    )
