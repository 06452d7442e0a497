"""Stage-level profile of catalog queries via the Spark event log.

Runs each named query (warm: one untimed run, then one timed run) with a
per-query job description, then parses the event log into a per-query
job/stage breakdown: stage wall time, task time, shuffle read/write
bytes, fetch wait, GC — the guide §1/§7 empirical loop without the UI
(spark.ui.enabled is off in this sandbox).

Usage: python tools/profile_stages.py QUERY [QUERY ...] [--sf-dir=DIR]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]

    log_dir = tempfile.mkdtemp(prefix="spark_events_")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from proteofav_spark import session as sess

    # same tuned session as get_spark, plus the event log
    orig_builder_cls = SparkSession.builder.__class__  # noqa: F841
    n = os.environ["SPARK_GRAFT_CPUS"]
    import proteofav_spark.session as s

    # monkey-free: replicate get_spark's builder with two extra confs
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName("profile_stages")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    repo_root = REPO
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from proteofav_spark.queries import all_queries
    from proteofav_spark.session import warm_python_workers

    qs = all_queries(include_retired=True)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql.functions import col

    spark.range(10_000).groupBy((col("id") % 7).alias("k")).count().count()
    warm_python_workers(spark, int(n))

    sc = spark.sparkContext
    for name in names:
        fn = qs[name]
        sc.setJobDescription(f"warmup:{name}")
        fn(spark, sf_dir).count()
        sc.setJobDescription(f"timed:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        print(f"# {name}: warm run {time.perf_counter() - t0:.3f}s",
              file=sys.stderr)
        sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    # ---- parse the event log ----
    cands = [os.path.join(log_dir, f) for f in os.listdir(log_dir)]
    path = max(cands, key=os.path.getmtime)
    if os.path.isdir(path):  # rolling event log v2: a directory of files
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        parts = [path]

    def _lines():
        for p in parts:
            with open(p) as fh:
                yield from fh

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in _lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:90],
                    "wall_ms": (comp - sub) if sub and comp else None,
                    "tasks": si["Number of Tasks"],
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + m.get(
                    "Executor Run Time", 0
                )
                st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                st["py_ms"] = st.get("py_ms", 0) + (
                    m.get("Executor Deserialize Time", 0)
                )
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                st["sh_read_b"] = (
                    st.get("sh_read_b", 0)
                    + sr.get("Remote Bytes Read", 0)
                    + sr.get("Local Bytes Read", 0)
                )
                st["fetch_wait_ms"] = st.get("fetch_wait_ms", 0) + sr.get(
                    "Fetch Wait Time", 0
                )
                st["sh_write_b"] = st.get("sh_write_b", 0) + sw.get(
                    "Shuffle Bytes Written", 0
                )

    per_query: dict[str, list] = {}
    for jid in sorted(jobs):
        j = jobs[jid]
        desc = j["desc"]
        if not desc.startswith("timed:"):
            continue
        q = desc.split(":", 1)[1]
        per_query.setdefault(q, []).append((jid, j))
    for q, jlist in per_query.items():
        print(f"\n=== {q}: {len(jlist)} jobs ===")
        for jid, j in jlist:
            wall = j.get("t1", j["t0"]) - j["t0"]
            print(f" job {jid}: wall {wall} ms")
            for sid in sorted(j["stages"]):
                st = stages.get(sid)
                if not st or st.get("wall_ms") is None:
                    continue
                print(
                    f"   stage {sid:4d} wall {st['wall_ms']:6d}ms "
                    f"taskSum {st.get('task_ms', 0):7d}ms "
                    f"gc {st.get('gc_ms', 0):4d}ms "
                    f"tasks {st.get('tasks', '?'):>4} "
                    f"shR {st.get('sh_read_b', 0):>9} "
                    f"shW {st.get('sh_write_b', 0):>9} "
                    f"fetchWait {st.get('fetch_wait_ms', 0)}ms  "
                    f"{st.get('name', '')}"
                )


if __name__ == "__main__":
    main()
