"""Interleaved same-session A/B for the per-query top-k stage.

History: r7 rolled the salted two-phase top-k into every retrieval
prefilter; the r8 A/B (this tool, arms then inverted) measured the salt
exchange at ~68 ms/query (~10%) at sf0.1 and ACCEPTED it for the
bounded-final-sort argument. r13 re-adjudicated: Spark's rank-limit
pushdown (SPARK-37099, WindowGroupLimit Partial below the exchange)
already provides the map-side prune the salt bought, at zero extra
exchanges — so `_topk_per_query` is now the single per-qid window, and
this tool's B arm monkeypatches the OLD salted two-phase form back in to
keep the decision measurable.

Protocol: ONE session (the IVF index artifacts are built once and shared
by both arms, so the diff isolates exactly the top-k stage), arms
interleaved A,B,A,B,... so host-load drift hits both equally. Warm runs
only (one untimed build run first).

Usage: python tools/ab_topk_salt.py [sf_dir] [pairs]
Prints one JSON line with per-arm samples + medians.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

TOPK_SALT = 32  # salt buckets of the retired two-phase form


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

    single_phase = lq._topk_per_query

    def salted(scored, k, order):
        # the exact r7-r12 shape: local top-k inside (qid, salt) buckets,
        # then the per-qid global window
        s = scored.withColumn(
            "_salt", F.pmod(F.xxhash64("vec_id"), F.lit(TOPK_SALT))
        )
        w_loc = W.partitionBy("qid", "_salt").orderBy(*order)
        local = (
            s.withColumn("_lrk", F.row_number().over(w_loc))
            .filter(F.col("_lrk") <= k)
            .drop("_salt", "_lrk")
        )
        w_glob = W.partitionBy("qid").orderBy(*order)
        return local.withColumn("prk", F.row_number().over(w_glob)).filter(
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
        lq._topk_per_query = single_phase
        a.append(run())
        lq._topk_per_query = salted
        b.append(run())
    lq._topk_per_query = single_phase

    out = {
        "query": "ann_ivf_coarse",
        "sf_dir": sf_dir,
        # arm A (single_phase) is PRODUCTION; arm B (salted) is the
        # RETIRED r12 form monkeypatched back in. salt_cost_ms = B - A,
        # i.e. positive means the retired salt is slower.
        "production_arm": "single_phase",
        "single_phase_sec": a,
        "salted_sec": b,
        "single_phase_median": round(statistics.median(a), 3),
        "salted_median": round(statistics.median(b), 3),
        "salt_cost_ms": round(
            (statistics.median(b) - statistics.median(a)) * 1000
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
