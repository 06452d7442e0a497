"""Interleaved same-session A/B for the salted two-phase top-k in
ann_ivf_coarse (VERDICT r7 item #3): the r7 uniform two-phase rollout
regressed the query 0.884 -> 1.193 s at sf0.1, the only headline query
that got slower, and the cost of the new salt exchange was asserted
("zero at sf0.1") from the two NEW retrieval queries rather than
measured on this one.

Protocol: ONE session (the IVF index artifacts are built once and shared
by both arms, so the diff isolates exactly the top-k stage), the B arm
monkeypatches _topk_per_query with the single-phase window it replaced
(one per-qid window over the full candidate set), arms interleaved
A,B,A,B,... so host-load drift hits both equally. Warm runs only (one
untimed build run first).

Usage: python tools/ab_topk_salt.py [sf_dir] [pairs]
Prints one JSON line with per-arm samples + medians.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from pyspark.sql import Window as W, functions as F

    from proteofav_spark.operators import llm_queries as lq
    from proteofav_spark.queries import all_queries
    from proteofav_spark.session import get_spark, warm_python_workers

    spark = get_spark("ab_topk_salt")
    warm_python_workers(spark)
    qs = all_queries(include_retired=True)
    fn = qs["ann_ivf_coarse"]

    salted = lq._topk_per_query

    def single_phase(scored, k, order):
        # the exact pre-r7 shape: one window partitioned only by qid —
        # every scored row for a query lands in ONE sort partition
        w = W.partitionBy("qid").orderBy(*order)
        return scored.withColumn("prk", F.row_number().over(w)).filter(
            F.col("prk") <= k
        )

    # untimed: build the IVF index artifacts once (shared by both arms)
    fn(spark, sf_dir).count()

    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        return round(time.perf_counter() - t0, 3)

    a, b = [], []
    for _ in range(pairs):
        lq._topk_per_query = salted
        a.append(run())
        lq._topk_per_query = single_phase
        b.append(run())
    lq._topk_per_query = salted

    out = {
        "query": "ann_ivf_coarse",
        "sf_dir": sf_dir,
        "salted_sec": a,
        "single_phase_sec": b,
        "salted_median": round(statistics.median(a), 3),
        "single_phase_median": round(statistics.median(b), 3),
        "salt_cost_ms": round(
            (statistics.median(a) - statistics.median(b)) * 1000
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
