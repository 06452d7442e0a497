"""Bulk-ingest + lake partitioning tests."""

import glob
import os

from pyspark.sql import functions as F

from proteofav_spark.plans.lake import (
    parse_mmcif_atoms_many,
    read_lake,
    write_partitioned,
)


def test_bulk_ingest_many_files(spark, refdata):
    df = parse_mmcif_atoms_many(spark, f"{refdata}/mmcif/")
    entries = {r["entry_id"] for r in df.select("entry_id").distinct().collect()}
    assert "2pah" in entries and "2w4o" in entries
    assert len(entries) >= 10
    # canonical schema: numeric columns typed, per-entry counts match the
    # single-file reader
    assert dict(df.dtypes)["Cartn_x"] == "double"
    n_2pah = df.filter(F.col("entry_id") == "2pah").count()
    assert n_2pah == 5317


def test_bulk_ingest_schema_drift(spark, refdata):
    """Files with extra columns (BioUnit orig_* ids) and files without them
    land in one canonical frame."""
    df = parse_mmcif_atoms_many(spark, f"{refdata}/mmcif/")
    bio = df.filter(F.col("entry_id") == "2pah_bio")
    plain = df.filter(F.col("entry_id") == "2pah")
    assert bio.filter(F.col("orig_auth_asym_id").isNotNull()).count() > 0
    assert plain.filter(F.col("orig_auth_asym_id").isNotNull()).count() == 0


def test_partitioned_lake_roundtrip(spark, refdata, tmp_path):
    df = parse_mmcif_atoms_many(spark, f"{refdata}/mmcif/2pah.cif")
    lake = str(tmp_path / "atoms_lake")
    write_partitioned(df, lake)
    assert os.path.isdir(lake)
    assert glob.glob(f"{lake}/entry_id=2pah/*.parquet")
    back = read_lake(spark, lake, entry_id="2pah")
    assert back.count() == 5317
    # partition pruning visible in the plan
    explained = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in explained


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """write_bucketed_table's claim: a join on the bucket key between two
    tables bucketed the same way needs NO exchange — the executed plan
    must contain no Exchange operator (broadcast disabled to force the
    sort-merge path that would otherwise shuffle both sides)."""
    import shutil

    from proteofav_spark.plans.lake import write_bucketed_table

    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("a")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("b")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed_table(left, "bkt_left", ("k",), n_buckets=8,
                             sort_cols=("k",))
        write_bucketed_table(right, "bkt_right", ("k",), n_buckets=8,
                             sort_cols=("k",))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        assert joined.count() == 10_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_compact_lake_merges_small_files(spark, tmp_path):
    """64 tiny files compact to the target-sized count; row content and
    values survive byte-for-byte (sum invariant); the original path is
    atomically replaced."""
    from proteofav_spark.plans.lake import compact_lake, lake_file_stats

    path = str(tmp_path / "lake_t")
    spark.range(50000).selectExpr("id", "id * 2 AS v").repartition(32) \
        .write.parquet(path)
    before = lake_file_stats(spark, path)
    assert before["n_files"] == 32
    total_v = spark.read.parquet(path).groupBy().sum("v").first()[0]
    res = compact_lake(spark, path, target_file_bytes=10**9)
    assert res["after"]["n_files"] < before["n_files"]
    back = spark.read.parquet(path)
    assert back.count() == 50000
    assert back.groupBy().sum("v").first()[0] == total_v
    # compaction is idempotent
    res2 = compact_lake(spark, path, target_file_bytes=10**9)
    assert res2["after"]["n_files"] == res["after"]["n_files"]


def test_zorder_write_bounds_both_dimensions(spark, tmp_path):
    """Z-order's claim, checked on real parquet footer statistics: a
    single-key sorted layout bounds only its sort column per file (the
    other dimension spans ~its whole domain in every file), while the
    Z-ordered layout bounds BOTH dimensions, so min/max pruning works
    for predicates on either."""
    import pyarrow.parquet as pq

    from proteofav_spark.plans.lake import zorder_write

    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us")
    )
    lo_u, hi_u, lo_t, hi_t = e.agg(
        F.min("user_id"), F.max("user_id"), F.min("t_us"), F.max("t_us")
    ).collect()[0]

    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    # baseline: range-partition + sort on user_id only
    (
        e.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(plain)
    )
    zorder_write(e, zord, ("user_id", "t_us"), n_files=8)

    def mean_spans(path):
        import glob

        su, st, n = 0.0, 0.0, 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            mn_u = mn_t = None
            mx_u = mx_t = None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    s = col.statistics
                    if s is None:
                        continue
                    if col.path_in_schema == "user_id":
                        mn_u = s.min if mn_u is None else min(mn_u, s.min)
                        mx_u = s.max if mx_u is None else max(mx_u, s.max)
                    elif col.path_in_schema == "t_us":
                        mn_t = s.min if mn_t is None else min(mn_t, s.min)
                        mx_t = s.max if mx_t is None else max(mx_t, s.max)
            if mn_u is None:
                continue
            su += (mx_u - mn_u) / max(hi_u - lo_u, 1)
            st += (mx_t - mn_t) / max(hi_t - lo_t, 1)
            n += 1
        return su / n, st / n

    plain_u, plain_t = mean_spans(plain)
    z_u, z_t = mean_spans(zord)
    # single-key layout: secondary dimension unbounded per file
    assert plain_t > 0.9
    # z-order bounds both dimensions well below the full domain
    assert z_u < 0.6 and z_t < 0.6
    # and never loses rows
    assert (
        spark.read.parquet(zord).count()
        == spark.read.parquet(plain).count()
    )


def test_morton_col_matches_python_reference(spark):
    """The JVM shift/mask Morton expression agrees bit-for-bit with a
    plain Python interleave over the same quantization — locality along
    the curve follows from correctness of the interleave."""
    from proteofav_spark.plans.lake import ZORDER_BITS, morton_col

    rows = [(float(x), float(y)) for x in range(0, 100, 7) for y in range(0, 100, 11)]
    df = spark.createDataFrame(rows, "x double, y double")
    mins, maxs = {"x": 0.0, "y": 0.0}, {"x": 99.0, "y": 99.0}
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", morton_col(("x", "y"), mins, maxs)
        ).collect()
    }
    top = (1 << ZORDER_BITS) - 1

    def ref(x, y):
        qx = min(top, max(0, int((x - 0.0) / 99.0 * top)))
        qy = min(top, max(0, int((y - 0.0) / 99.0 * top)))
        z = 0
        for i in range(ZORDER_BITS):
            z |= ((qx >> i) & 1) << (2 * i)
            z |= ((qy >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == ref(x, y), (x, y)


def test_morton_col_auto_reduces_bits_on_overflow(spark):
    """5 columns at the default 16 bits would need 80 key bits; the
    expression must auto-reduce to 12 bits/dim so the key stays inside
    the 63 value bits of a signed long — non-negative everywhere and
    monotone in every dimension at the reduced resolution."""
    import pytest

    from proteofav_spark.plans.lake import morton_col

    cols = ("a", "b", "c", "d", "e")
    rows = [tuple(float(v + i) for i in range(5)) for v in range(0, 1000, 37)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double, e double")
    mins = {c: 0.0 for c in cols}
    maxs = {c: 1003.0 for c in cols}
    got = df.withColumn("z", morton_col(cols, mins, maxs)).collect()
    zs = [r["z"] for r in got]
    assert all(z >= 0 for z in zs)
    assert all(z < (1 << 60) for z in zs)  # 5 dims * 12 bits
    # the diagonal point set is strictly increasing along the curve
    ordered = [r["z"] for r in sorted(got, key=lambda r: r["a"])]
    assert ordered == sorted(ordered) and len(set(ordered)) == len(ordered)
    # a key that cannot fit at all raises
    with pytest.raises(ValueError):
        morton_col(tuple("abcdefghij" * 7), {}, {})


def test_lake_merger_rides_bucketed_tables_exchange_free(spark):
    """The lake_table_merger docstring's scale claim, executed: both
    sides staged as bucketed tables on their three join keys (same
    bucket count) merge with NO Exchange in the executed plan — the
    shuffle-free enrichment join the 100 TB lake layout exists for
    (broadcast disabled to force the sort-merge path)."""
    import shutil

    from proteofav_spark.plans.lake import write_bucketed_table
    from proteofav_spark.plans.mergers import lake_table_merger

    atoms = spark.range(0, 5_000).select(
        F.concat(F.lit("e"), (F.col("id") % 50).cast("string")).alias(
            "entry_id"
        ),
        (F.col("id") % 400).cast("string").alias("auth_seq_id_full"),
        F.lit("A").alias("auth_asym_id"),
        (F.col("id") * 2).alias("x"),
    )
    dssp = spark.range(0, 5_000).select(
        F.concat(F.lit("e"), (F.col("id") % 50).cast("string")).alias(
            "entry_id"
        ),
        (F.col("id") % 400).cast("string").alias("RES_FULL"),
        F.lit("A").alias("CHAIN_FULL"),
        F.lit("H").alias("SS"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed_table(
            atoms, "bkt_atoms",
            ("entry_id", "auth_seq_id_full", "auth_asym_id"), n_buckets=8,
        )
        write_bucketed_table(
            dssp, "bkt_dssp",
            ("entry_id", "RES_FULL", "CHAIN_FULL"), n_buckets=8,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        merged = lake_table_merger(
            spark.table("bkt_atoms"), dssp_table=spark.table("bkt_dssp")
        )
        assert merged.count() > 0
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_atoms")
        spark.sql("DROP TABLE IF EXISTS bkt_dssp")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
