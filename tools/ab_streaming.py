"""Interleaved A/B for the two STREAMING sink anchors (ingest rows/s,
enrich q/s) against an arbitrary repo checkout — the streaming twin of
tools/ab_bench.py (VERDICT r9 #4: the headline bench got the interleaved
same-host protocol every drift episode, but the sinks never did, and r9's
18 %/32 % anchor drops coincided with a real hot-path change — reject
counting in corpus.py's foreachBatch body).

One process per invocation (fresh JVM, fresh Python workers — exactly
how the driver measures), pairs interleaved by the calling shell loop so
host-load drift hits both sides equally.

Usage: python tools/ab_streaming.py REPO_PATH SF_DIR MODE
MODE: ingest | enrich
Prints one JSON line: {"repo": ..., "mode": ..., ...sink payload...}.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    repo, sf_dir, mode = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir

    import bench  # the checkout's own bench module owns the sink harness

    bench.SF_DIR = sf_dir
    from proteofav_spark.session import get_spark

    spark = get_spark("ab_streaming")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm JVM/footers
    fn = bench.run_ingest_bench if mode == "ingest" else bench.run_enrich_bench
    out = fn(spark)
    print(json.dumps({"repo": os.path.basename(repo.rstrip("/")), "mode": mode, **out}))


if __name__ == "__main__":
    main()
