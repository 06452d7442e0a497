"""Catalog-capacity policy tripwires (VERDICT r8 item #2).

The driver attests the first ``ATTEST_WINDOW`` registered queries per
round; the freshness tripwire bounds any query's staleness at 2 rounds.
The rotation is therefore only sustainable while

    len(catalog) + 2 * MAX_NEW_PER_ROUND  <=  3 * ATTEST_WINDOW

— the two-round lookahead keeps slack for newcomers, which must occupy
window slots the round they land (never-attested queries may not sit
below the fold). The policy's second lever is retirement: an oracled
query strictly subsumed by a newer twin leaves the DRIVER catalog
(``RETIRED`` in queries.py) but keeps its callable, its oracle, and CI
coverage — ``test_retired_twins_stay_oracle_green`` below re-verifies
every retired oracled query against DuckDB each run, so retirement
never silently drops correctness coverage.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_attestation() -> dict[str, int]:
    import glob
    import re

    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as fh:
            for q in json.load(fh):
                newest[q] = int(m.group(1))
    return newest


def test_catalog_headroom_holds():
    from proteofav_spark.queries import (
        ATTEST_WINDOW,
        MAX_NEW_PER_ROUND,
        all_queries,
    )

    n = len(all_queries())
    ceiling = 3 * ATTEST_WINDOW
    assert n + 2 * MAX_NEW_PER_ROUND <= ceiling, (
        f"catalog has {n} registered queries; with up to "
        f"{MAX_NEW_PER_ROUND} new per round and a 2-round staleness "
        f"bound the rotation needs n + 2*new <= {ceiling}. Retire or "
        f"merge redundant oracle twins (see RETIRED in queries.py)"
    )


def test_new_registrations_respect_per_round_budget():
    """Queries with NO driver attestation yet are this round's newcomers;
    the policy caps them at MAX_NEW_PER_ROUND (they must all fit in the
    window alongside the stale rotation)."""
    from proteofav_spark.queries import MAX_NEW_PER_ROUND, all_queries

    newest = _newest_attestation()
    if not newest:
        return  # pre-first-round checkout
    never = [q for q in all_queries() if q not in newest]
    assert len(never) <= MAX_NEW_PER_ROUND, (
        f"{len(never)} never-attested queries (> {MAX_NEW_PER_ROUND}): "
        f"{never} — move new coverage to pytest-only fixtures"
    )


def test_retired_twins_leave_driver_catalog_but_stay_importable():
    from proteofav_spark.queries import RETIRED, all_oracles, all_queries

    exposed = all_queries()
    full = all_queries(include_retired=True)
    for name in RETIRED:
        assert name not in exposed, f"{name} is retired but driver-exposed"
        assert name not in all_oracles(), name
        assert name in full, f"{name} retired AND unregistered — dead code?"
    # a retired name must reference a real superseding twin still exposed
    for name, why in RETIRED.items():
        twin = why.split("superseded by ", 1)[1].split(":", 1)[0].strip()
        assert twin in exposed, f"{name}'s superseding twin {twin} missing"


def test_retired_twins_stay_oracle_green():
    """Retirement must not drop correctness coverage: every retired query
    that HAS an oracle is still checked against DuckDB at sf0.001."""
    from proteofav_spark.queries import RETIRED, all_oracles

    oracled = [n for n in RETIRED if n in all_oracles(include_retired=True)]
    assert oracled, "no retired oracled queries — drop this test"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_oracles.py"),
            "/root/testdata/sf0.001",
            *oracled,
            "--include-retired",
        ],
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, (
        f"retired-twin oracle check failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-1000:]}"
    )
    assert "failed=0" in proc.stdout
