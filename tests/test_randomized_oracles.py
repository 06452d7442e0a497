"""Randomized-input oracle gate (r13): the driver's correctness compare is
re-run on a SEEDED PERTURBATION of the testdata (subsampled rows, jittered
numerics and dates, NULLs injected into nullable payload columns — see
tools/perturb_testdata.py). On the fixed sf tables a query and its oracle
can agree by accident; this axis re-tests the pair on data neither was
tuned on. A representative query from each family keeps the suite fast —
the full 137-query sweep runs via:

    python tools/perturb_testdata.py /tmp/randdata/seedN N
    python tools/check_oracles.py /tmp/randdata/seedN
"""

from __future__ import annotations

import subprocess
import sys
import tempfile

REPO = "/root/repo"

# one representative per family: scan-agg, star join, decorrelated
# subquery (NULL-sensitive avg), disjunctive predicates, window, salted
# two-stage, quantiles, top-k, sessionize, as-of, exact dedup, MinHash,
# PQ (the corpus-contract query), brute-force kNN, text stats
SUBSET = [
    "agg_pricing_summary",
    "join_star_revenue",
    "customers_above_avg_no_orders",
    "disjunctive_predicate_revenue",
    "window_moving_avg",
    "agg_salted_two_stage",
    "agg_quantiles_value",
    "topk_per_group",
    "sessionize_events_gap",
    "events_merge_asof_tolerance",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "ann_pq_topk",
    "knn_cosine_topk",
    "text_token_stats",
]


def test_randomized_input_oracle_subset():
    out = tempfile.mkdtemp(prefix="randdata_")
    gen = subprocess.run(
        [sys.executable, f"{REPO}/tools/perturb_testdata.py", out, "42"],
        capture_output=True, text=True, timeout=300,
    )
    assert gen.returncode == 0, gen.stderr[-1000:]
    sweep = subprocess.run(
        [sys.executable, f"{REPO}/tools/check_oracles.py", out, *SUBSET],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    tail = (sweep.stdout + sweep.stderr)[-2000:]
    assert sweep.returncode == 0, tail
    assert "failed=0" in sweep.stdout, tail
    assert f"checked={len(SUBSET)}" in sweep.stdout, tail
