"""Attestation-window rotation tripwire.

The external harness attests only the first ``ATTEST_WINDOW`` registered
queries per round (CORRECTNESS_r{N}.json), and the working rule since
round 5 is: no query's newest driver attestation may become more than
two rounds old, and a never-attested query must be attested in its
first round. Rounds 5-7 enforced this by hand-rotating ``_PRIORITY``;
this test automates the check so a future rotation mistake fails CI
instead of surfacing in the verdict.

Simulation: let R be the newest recorded round. The next driver run
will attest exactly the current window at round R+1. After that run,
every query OUTSIDE the window must still have an attestation no older
than two rounds (newest >= R-1), and every never-attested query must be
INSIDE the window.
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _attestations() -> tuple[dict[str, int], int]:
    newest: dict[str, int] = {}
    latest = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:  # stray file (e.g. a _backup copy) — not a record
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(path) as fh:
            for name in json.load(fh):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest, latest


def test_window_rotation_keeps_every_attestation_fresh():
    from proteofav_spark.queries import ATTEST_WINDOW, all_queries

    newest, latest = _attestations()
    assert latest >= 1, "no driver records found"
    ordered = list(all_queries())
    window = set(ordered[:ATTEST_WINDOW])

    never = [q for q in ordered if q not in newest]
    missing_new = [q for q in never if q not in window]
    assert missing_new == [], (
        f"never-attested queries outside the window: {missing_new}"
    )

    # after the next run (round latest+1), out-of-window queries keep
    # their current newest round; it must not be older than 2 rounds
    stale = sorted(
        q for q in ordered
        if q not in window and newest.get(q, 0) < latest - 1
    )
    assert stale == [], (
        f"queries whose attestation would exceed two rounds of staleness "
        f"after the next driver run (newest < r{latest - 1}); rotate them "
        f"into _PRIORITY: {stale}"
    )


def test_window_is_exactly_the_priority_prefix():
    """_PRIORITY must fill the window exactly (no accidental short list
    letting registration order decide what gets attested) and contain
    only real catalog queries."""
    from proteofav_spark.queries import ATTEST_WINDOW, _PRIORITY, all_queries

    qs = set(all_queries())
    unknown = [q for q in _PRIORITY if q not in qs]
    assert unknown == [], f"_PRIORITY names not in the catalog: {unknown}"
    assert len(_PRIORITY) == len(set(_PRIORITY)) == ATTEST_WINDOW
