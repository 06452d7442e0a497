"""SparkSession factory.

Local testing runs one JVM with N threads; the config block is written so the
same code lands well on a real cluster: AQE handles skew/broadcast decisions
at runtime, shuffle partitions are kept modest for local runs but would be
raised (or left to AQE coalescing) on a 1000-executor deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "proteofav_spark", cpus: str | None = None) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    Tuning notes for scale (the same settings are correct at 100 TB):
    - AQE on: runtime join-strategy switches, skew-join splitting and
      post-shuffle partition coalescing replace hand-tuned partition counts.
    - ``autoBroadcastJoinThreshold`` raised to 64 MB: every per-protein side
      table (DSSP/SIFTS/validation) and every TPC-H dimension comfortably
      broadcasts, eliminating shuffles on the enrichment joins.
    - Arrow enabled: all pandas_udf / applyInPandas paths batch via Arrow.
    - Parquet pushdown options left at defaults (on): filters and column
      pruning reach the scans.
    """
    n = cpus or DEFAULT_CPUS
    # executor Python workers unpickle mapInPandas closures by re-importing
    # this package — make sure the repo root is importable regardless of the
    # driver process's cwd/sys.path
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
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
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_python_workers(spark, n_cpu: int | None = None) -> None:
    """Spin up the Python/Arrow worker pool once (daemon spawn + numpy
    import) so the first Arrow-UDF query in a measurement isn't billed
    those one-time costs. Shared by bench.py and tools/ab_bench.py —
    two copies of this warmup already drifted once."""
    # module-global import: with `from __future__ import annotations`
    # the udf's hints are STRINGS resolved against module globals, so a
    # function-local pandas alias breaks pandas_udf type inference
    global _pd
    import pandas as _pd
    from pyspark.sql.functions import col as _col, pandas_udf as _pudf

    @_pudf("long")
    def _warm(v: _pd.Series) -> _pd.Series:
        import numpy as _np

        return _pd.Series(_np.asarray(v) * 1)

    n = n_cpu or spark.sparkContext.defaultParallelism
    spark.range(n * 4, numPartitions=n).select(_warm(_col("id"))).count()
