"""CI oracle coverage for queries OUTSIDE the driver's attestation window.

The external harness attests only the first ``ATTEST_WINDOW`` registered
queries per round; ``_PRIORITY`` rotates the newest/riskiest families into
that window, which necessarily displaces older ones below the fold. This
test closes the resulting gap (ADVICE r2, medium): every displaced query
is re-verified against its DuckDB oracle here, so a regression in a
below-fold query fails CI even though the driver will not re-attest it
this round.

Runs the standalone checker in a subprocess (its own Spark session +
DuckDB connection) at sf0.001 — the smallest SF, since this is a
regression tripwire, not the primary gate."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_below_fold_queries_stay_oracle_green():
    from proteofav_spark.queries import ATTEST_WINDOW, all_oracles, all_queries

    ordered = list(all_queries())
    below = ordered[ATTEST_WINDOW:]
    assert below, "window covers everything — test is vacuous, drop it"
    oracled = [n for n in below if n in all_oracles()]
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_oracles.py"),
            "/root/testdata/sf0.001",
            *oracled,
        ],
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, (
        f"below-fold oracle check failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-1000:]}"
    )
    assert "failed=0" in proc.stdout
