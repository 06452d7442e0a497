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


def test_runtime_bloom_filter_injects_for_selective_dim_join(spark, tmp_path):
    """The third runtime mechanism the 100 TB notes rely on, alongside
    skew-split and partition coalescing: a shuffle join against a dim
    with a SELECTIVE predicate gets a bloom-filter semi-join pushed onto
    the fact side (`might_contain(scalar-subquery)` over a
    `bloom_filter_agg` of the filtered dim keys), so the fact shuffle
    writes only rows that can possibly match — at cluster scale that is
    the difference between shuffling 100 TB and shuffling the ~1/7 that
    survives the dim filter. Locally the application-side size gate
    (default 10 GB) is lowered to let the rule fire on test data; the
    mechanism itself is stock Catalyst (InjectRuntimeFilter)."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        fact_p = str(tmp_path / "fact")
        dim_p = str(tmp_path / "dim")
        spark.range(200_000).select(
            (F.col("id") % 5000).alias("fk"),
            F.concat(F.lit("v-"), F.col("id")).alias("v"),
        ).write.mode("overwrite").parquet(fact_p)
        spark.range(5000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("cat")
        ).write.mode("overwrite").parquet(dim_p)

        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).where(F.col("cat") == 3)
        j = fact.join(dim, fact.fk == dim.k)

        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt
        assert "bloom_filter_agg" in opt, opt
        # the filter sits on the FACT side, keyed on the join column
        assert "xxhash64(fk" in opt, opt

        # and the result is still exactly the unfiltered-join answer
        n = j.count()
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            saved[
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
            ],
        )
        assert n == fact.join(dim, fact.fk == dim.k).count()
    finally:
        for k, v in saved.items():
            conf.set(k, v)
