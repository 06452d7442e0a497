"""Interleaved A/B micro-bench for named catalog queries against an
arbitrary repo checkout (HEAD vs a round-commit worktree), the same
protocol that settled the spatial_contacts_grid flag in round 3/4
(PERF_NOTES.md): one process per invocation, warm runs only compared,
pairs interleaved by the calling shell loop so host-load drift hits both
sides equally.

Usage: python tools/ab_bench.py REPO_PATH SF_DIR RUNS QUERY [QUERY ...]
Prints one JSON line: {"repo": ..., "queries": {name: [sec, ...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd


def main() -> None:
    repo, sf_dir, runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    sys.path.insert(0, repo)

    from proteofav_spark.queries import all_queries
    from proteofav_spark.session import get_spark

    spark = get_spark("ab_bench")
    qs = all_queries(include_retired=True)

    # same warmup as bench.py: JVM, one exchange, parquet footers
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql.functions import col

    spark.range(10_000).groupBy((col("id") % 7).alias("k")).count().count()
    for t in (
        "nation", "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings",
    ):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
    # warm the Python/Arrow worker pool too — shared helper so the two
    # measurement protocols can't drift; old checkouts (pre-helper)
    # fall back to an inline equivalent
    from proteofav_spark import session as _sess

    warm = getattr(_sess, "warm_python_workers", None)
    if warm is not None:
        warm(spark)
    else:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _warm(v: pd.Series) -> pd.Series:
            import numpy as np
            return pd.Series(np.asarray(v) * 1)

        n_cpu = spark.sparkContext.defaultParallelism
        spark.range(n_cpu * 4, numPartitions=n_cpu).select(
            _warm(col("id"))
        ).count()

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = times

    print(json.dumps({"repo": os.path.basename(repo.rstrip("/")) or repo,
                      "queries": out}))


if __name__ == "__main__":
    main()
