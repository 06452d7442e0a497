"""Runtime scale-behavior proofs: the session's AQE configuration must
actually DO the things the plan docstrings claim it does — skew-join
splitting and post-shuffle partition coalescing — demonstrated on
synthetic data shaped to trigger each mechanism, with the executed
(adaptive-final) plan as the witness."""

from pyspark.sql import functions as F


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join(spark):
    """One hot key carrying ~95% of the probe side must make AQE mark
    the sort-merge join partition as skewed and split it (skew=true in
    the final plan) once the skew thresholds are in range — the runtime
    mechanism every '100 TB: AQE skew-split applies' note relies on."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        joined = left.join(right, "k")
        plan = _executed(joined)
        assert "SortMergeJoin" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """A tiny aggregate shuffled across the configured 32 partitions must
    come back coalesced (AQEShuffleRead coalesced) — the mechanism that
    keeps thousand-partition production shuffles from emitting
    thousand-file outputs for kilobyte results."""
    agged = (
        spark.range(10_000)
        .groupBy((F.col("id") % 50).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    plan = _executed(agged)
    assert "AQEShuffleRead coalesced" in plan, plan
