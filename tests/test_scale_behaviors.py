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


def test_lsh_depth_ladder_deepens_with_corpus_and_bounds_pairs(spark):
    """Pin the r10 embedding-LSH re-tune: the occupancy probe must pick a
    DEEPER bucket depth as the corpus grows, keeping estimated candidate
    pairs/vector bounded near TARGET_PAIRS_PER_VEC — the r9 trap was an
    8-bit ladder that bottomed out by sf0.3x, after which candidates grew
    n²/1,536-cells (measured 27 → 81 → 269 pairs/vec). This test fails if
    anyone shrinks the ladder, breaks the distributed probe, or the probe
    stops tracking corpus growth."""
    from pyspark.sql import functions as F

    from proteofav_spark.operators.llm_queries import (
        DEPTH_LADDER,
        MAX_BITS,
        N_TABLES_DEDUP,
        TARGET_PAIRS_PER_VEC,
        adaptive_bucket_mask,
        banded_embeddings,
    )

    def mask_and_pairs(sf_dir: str) -> tuple[int, float]:
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = e.count()
        b = (
            banded_embeddings(e, bits=MAX_BITS, n_tables=N_TABLES_DEDUP)
            .select("vec_id", "tbl", "bucket")
            .localCheckpoint()
        )
        mask = adaptive_bucket_mask(b)
        rows = (
            b.groupBy(
                "tbl", F.col("bucket").bitwiseAND(F.lit(mask)).alias("bk")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        pairs = sum(r["c"] * (r["c"] - 1) // 2 for r in rows)
        return mask, pairs / n

    small_mask, small_ppv = mask_and_pairs("/root/testdata/sf0.01")
    big_mask, big_ppv = mask_and_pairs("/root/testdata/sf0.1")
    # a 10x corpus must never pick a SHALLOWER depth
    assert big_mask >= small_mask, (small_mask, big_mask)
    # the chosen depth keeps candidates near-linear unless the ladder is
    # genuinely exhausted (then the corpus's duplicate structure decides)
    for mask, ppv in ((small_mask, small_ppv), (big_mask, big_ppv)):
        if mask != (1 << MAX_BITS) - 1:
            assert ppv <= TARGET_PAIRS_PER_VEC, (mask, ppv)
    # the ladder reaches past the r9 ceiling (the 8-bit bottom-out)
    assert DEPTH_LADDER[-1] == MAX_BITS and MAX_BITS >= 12
