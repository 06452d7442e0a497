"""Semantics tests for the pipeline-extension operators
(operators/pipeline_queries.py): as-of join, banded range join,
connected-components dedup clustering, token-shard packing, stratified
sampling, split assignment, and exact quantiles. The DuckDB oracles check
value parity; these tests pin the SEMANTIC invariants each operator must
hold regardless of data."""

import pytest
from pyspark.sql import Window as W, functions as F

from proteofav_spark.operators.pipeline_queries import (
    RANGE_W_S,
    SHARD_CAP_TOKENS,
    min_label_components,
    packed_documents,
    star_components,
    q_dedup_cc_clusters,
    q_events_asof_join,
    q_events_range_join_bucketed,
    q_pack_token_shards,
    q_sample_stratified_hash,
    q_shard_concat_digest,
    q_split_train_val_test,
    q_agg_quantiles_value,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_asof_matches_naive_per_user(spark, events):
    """The union+carry-forward as-of equals the naive 'max click at-or-
    before' computed independently via a windowed inequality join."""
    res = q_events_asof_join(spark, SF)
    e = events.withColumn("t_us", F.unix_micros(F.col("ts").cast("timestamp")))
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("t_us").alias("p_t"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("nc_id"), F.col("user_id").alias("c_user"),
        F.col("t_us").alias("c_t"),
    )
    naive = (
        p.join(c, (p.user_id == c.c_user) & (c.c_t <= p.p_t), "left")
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("purchase_id")
                .orderBy(F.desc_nulls_last("c_t"), F.desc_nulls_last("nc_id"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("purchase_id", F.col("nc_id").alias("naive_click"))
    )
    diff = (
        res.join(naive, "purchase_id")
        .filter(
            ~(
                (F.col("click_id") == F.col("naive_click"))
                | (F.col("click_id").isNull() & F.col("naive_click").isNull())
            )
        )
        .count()
    )
    assert diff == 0


def test_asof_lag_nonnegative_and_nulls_consistent(spark):
    res = q_events_asof_join(spark, SF).cache()
    assert res.filter(F.col("lag_s") < 0).count() == 0
    # lag is NULL exactly when no click matched
    assert res.filter(
        F.col("click_id").isNull() != F.col("lag_s").isNull()
    ).count() == 0
    res.unpersist()


def test_range_join_banding_equals_naive(spark, events):
    """Cell±1 banding must reproduce the naive inequality join exactly."""
    res = q_events_range_join_bucketed(spark, SF)
    e = events.withColumn("t_us", F.unix_micros(F.col("ts").cast("timestamp")))
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "t_us"
    )
    clk = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("t_us").alias("c_t"),
    )
    naive = (
        err.join(
            clk,
            (err.user_id == clk.c_user)
            & (F.abs(err.t_us - clk.c_t) <= RANGE_W_S * 1_000_000),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("click_id").alias("naive_n"))
    )
    diffs = (
        res.join(naive, "event_id")
        .filter(F.col("n_nearby_clicks") != F.col("naive_n"))
        .count()
    )
    assert diffs == 0
    # zero-match errors are retained, not dropped
    assert res.count() == err.count()


def test_cc_clusters_are_consistent(spark):
    """Every near-dup edge has both endpoints in the same cluster, the
    cluster id is the minimum member id, and sizes are consistent."""
    from proteofav_spark.operators.llm_queries import q_dedup_minhash_lsh

    labels = q_dedup_cc_clusters(spark, SF).cache()
    pairs = q_dedup_minhash_lsh(spark, SF).select("doc_a", "doc_b")
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb")
    )
    split_edges = (
        pairs.join(la, "doc_a").join(lb, "doc_b")
        .filter(F.col("ca") != F.col("cb"))
        .count()
    )
    assert split_edges == 0
    # cluster id is the min doc_id of the cluster (one canonical each)
    mins = labels.groupBy("cluster_id").agg(
        F.min("doc_id").alias("mn"), F.count(F.lit(1)).alias("n")
    )
    assert mins.filter(F.col("cluster_id") != F.col("mn")).count() == 0
    bad_sizes = (
        labels.join(mins, "cluster_id")
        .filter(F.col("cluster_size") != F.col("n"))
        .count()
    )
    assert bad_sizes == 0
    assert labels.filter("is_canonical").count() == mins.count()
    labels.unpersist()


def test_packing_respects_budget_and_order(spark):
    """Shard ids are non-decreasing in doc_id within a lang (streams are
    doc_id ranges and offsets accumulate in stream order), and each doc's
    shard is its per-stream offset plus its stream-local
    preceding-cumsum div cap."""
    packed = packed_documents(spark, SF).cache()
    w = W.partitionBy("lang").orderBy("doc_id")
    seq = packed.withColumn("prev_shard", F.lag("shard_id").over(w))
    assert seq.filter(F.col("shard_id") < F.col("prev_shard")).count() == 0
    recomputed = packed.filter(
        F.col("shard_id")
        != F.col("off")
        + F.floor((F.col("cum") - F.col("n_tokens")) / SHARD_CAP_TOKENS)
    )
    assert recomputed.count() == 0
    # streams partition the packing: no shard spans a stream boundary
    span = packed.groupBy("lang", "shard_id").agg(
        F.countDistinct("stream").alias("ns")
    )
    assert span.filter(F.col("ns") > 1).count() == 0
    packed.unpersist()


def test_shard_digest_covers_all_docs(spark):
    import hashlib

    d = spark.read.parquet(f"{SF}/documents.parquet")
    shards = q_shard_concat_digest(spark, SF)
    assert shards.agg(F.sum("n_docs")).first()[0] == d.count()
    # recompute every shard digest driver-side (tiny SF): md5 of member
    # texts concatenated in doc_id order with the RS separator — pins the
    # content without asserting cross-shard distinctness, which two
    # identically-concatenating shards would legitimately break
    expected = {}
    rows = packed_documents(spark, SF).select(
        "lang", "shard_id", "doc_id", "text"
    ).collect()
    for r in sorted(rows, key=lambda r: (r["lang"], r["shard_id"], r["doc_id"])):
        expected.setdefault((r["lang"], r["shard_id"]), []).append(r["text"])
    expected = {
        k: hashlib.md5("\x1e".join(v).encode()).hexdigest()
        for k, v in expected.items()
    }
    got = {
        (r["lang"], r["shard_id"]): r["shard_md5"] for r in shards.collect()
    }
    assert got == expected


def test_shard_digest_matches_composed_form_with_cap_spanning_doc(
    spark, tmp_path
):
    """The r13 single-pass q_shard_concat_digest must be row-identical to
    the packed_documents-composed aggregation it replaced — pinned on a
    synthetic corpus whose oversized document spans several caps, so
    local_shard values have GAPS (empty shards): the subtle step in the
    equivalence proof is that per-stream n_shards = max(local_shard)+1
    computes the same value on the one-row-per-shard frame as on the
    per-document frame, which gaps would break if the rollup counted
    shards instead of taking the max."""
    docs = []
    # lang 'en', stream 0: doc 1 small, doc 2 spans ~3 caps, doc 3 small
    docs.append((1, "w " * 50, "en"))
    docs.append((2, "w " * (SHARD_CAP_TOKENS * 3), "en"))
    docs.append((3, "w " * 40, "en"))
    # lang 'en', a later stream (doc_id div 256 == 2): offsets must skip
    # the gap shards allocated to stream 0
    docs.append((600, "w " * 30, "en"))
    docs.append((601, "w " * 30, "en"))
    # second lang
    docs.append((5, "w " * 10, "fr"))
    d = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    sf_dir = str(tmp_path)
    d.write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r["lang"], r["shard_id"]): (
            r["n_docs"], r["shard_tokens"], r["shard_md5"]
        )
        for r in q_shard_concat_digest(spark, sf_dir).collect()
    }
    packed = packed_documents(spark, sf_dir)
    members = F.array_sort(F.collect_list(F.struct("doc_id", "text")))
    composed = packed.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.md5(
            F.array_join(F.transform(members, lambda m: m["text"]), "\x1e")
        ).alias("shard_md5"),
    )
    want = {
        (r["lang"], r["shard_id"]): (
            r["n_docs"], r["shard_tokens"], r["shard_md5"]
        )
        for r in composed.collect()
    }
    assert got == want
    # the oversized doc really produced a shard-id gap (empty shards)
    en_ids = sorted(sid for lang, sid in got if lang == "en")
    assert en_ids != list(range(len(en_ids)))


def test_stratified_sample_is_deterministic_subset(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    s1 = q_sample_stratified_hash(spark, SF)
    s2 = q_sample_stratified_hash(spark, SF)
    assert s1.exceptAll(s2).count() == 0  # run-to-run identical
    assert s1.join(d, "doc_id", "left_anti").count() == 0  # subset
    # en keeps ~50%, others ~25% — allow wide tolerance at tiny SF
    rates = (
        s1.groupBy("lang").count()
        .join(d.groupBy("lang").count().withColumnRenamed("count", "total"),
              "lang")
        .withColumn("rate", F.col("count") / F.col("total"))
        .collect()
    )
    for r in rates:
        expected = 0.5 if r["lang"] == "en" else 0.25
        assert abs(r["rate"] - expected) < 0.18, (r["lang"], r["rate"])


def test_split_partitions_corpus(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    res = q_split_train_val_test(spark, SF).collect()
    assert sum(r["n_docs"] for r in res) == d.count()
    by_split = {}
    for r in res:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] > by_split["val"]
    assert by_split["train"] > by_split["test"]


def test_cc_synthetic_components(spark):
    """Two known components (a 4-path and a triangle) resolve to the
    min-id canonical each, regardless of edge orientation."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11), (11, 12), (10, 12)],
        "doc_a long, doc_b long",
    )
    rows = {r["doc_id"]: r for r in min_label_components(pairs).collect()}
    assert {v: r["cluster_id"] for v, r in rows.items()} == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
    }
    assert {v for v, r in rows.items() if r["is_canonical"]} == {1, 10}
    assert rows[4]["cluster_size"] == 4 and rows[12]["cluster_size"] == 3


def test_cc_raises_past_round_cap(spark):
    """A path graph whose diameter exceeds max_rounds must raise loudly,
    not silently emit a split component."""
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(path, max_rounds=2)
    # max_rounds=0 must hit the SAME designed diagnostic, not a
    # NameError on the never-bound loop counter (review r8)
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(path, max_rounds=0)
    out = min_label_components(path)  # default cap is plenty for d=12
    assert out.filter(F.col("cluster_id") != 0).count() == 0


def test_star_components_matches_min_label(spark):
    """On a mixed graph (path + triangle + isolated edge) the star
    algorithm and plain min-label propagation agree exactly."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    star = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in star_components(pairs).collect()
    }
    ml = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in min_label_components(pairs).collect()
    }
    assert star == ml


def test_star_components_long_chain(spark):
    """A 200-edge path graph (diameter 200) — min-label propagation's
    worst case, which raises past its round cap — converges for
    large-star/small-star in O(log² n) rounds."""
    n = 200
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    out = star_components(path, max_rounds=25).collect()
    assert len(out) == n + 1
    assert all(r["cluster_id"] == 0 for r in out)
    assert sum(r["is_canonical"] for r in out) == 1
    assert all(r["cluster_size"] == n + 1 for r in out)


def test_pack_query_projection(spark):
    """q_pack_token_shards is the registered projection of
    packed_documents — pin its column contract and that it carries every
    document exactly once."""
    out = q_pack_token_shards(spark, SF)
    assert out.columns == ["doc_id", "lang", "n_tokens", "shard_id"]
    d = spark.read.parquet(f"{SF}/documents.parquet")
    assert out.count() == d.count()
    assert out.select("doc_id").distinct().count() == d.count()


def test_quantiles_ordered(spark):
    for r in q_agg_quantiles_value(spark, SF).collect():
        assert r["p25"] <= r["p50"] <= r["p90"] <= r["p99"]
        assert r["n"] > 0


def test_pack_shard_ids_contiguous_from_zero(spark):
    """Per lang, shard ids start at 0; they are additionally gap-free
    whenever no document exceeds the shard cap (an oversized doc occupies
    several shard-widths, legitimately skipping ids — the start-offset
    rule guarantees contiguity only below the cap)."""
    packed = packed_documents(spark, SF)
    per_lang = packed.groupBy("lang").agg(
        F.min("shard_id").alias("mn"), F.max("shard_id").alias("mx"),
        F.countDistinct("shard_id").alias("n"),
        F.max("n_tokens").alias("longest"),
    )
    assert per_lang.filter(F.col("mn") != 0).count() == 0
    bad = per_lang.filter(
        (F.col("longest") <= SHARD_CAP_TOKENS)
        & (F.col("n") != F.col("mx") + 1)
    )
    assert bad.count() == 0


def test_star_components_empty_and_selfloop_inputs(spark):
    """Degenerate inputs: an empty edge list and a self-loop-only list
    both produce an empty vertex table rather than erroring."""
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert star_components(empty).count() == 0
    loops = spark.createDataFrame([(5, 5), (7, 7)], "doc_a long, doc_b long")
    assert star_components(loops).count() == 0


def test_retention_cohorts_week0_covers_all_users(spark):
    """Every user belongs to their own cohort at offset 0, so summing
    offset-0 rows must equal the distinct user count, and every offset
    must be non-negative with monotonically non-increasing totals."""
    from proteofav_spark.operators.pipeline_queries import (
        q_events_retention_cohorts,
    )

    rows = q_events_retention_cohorts(spark, SF).collect()
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id").distinct().count()
    )
    week0 = sum(r["n_users"] for r in rows if r["week_offset"] == 0)
    assert week0 == n_users
    assert all(r["week_offset"] >= 0 for r in rows)
    by_offset = {}
    for r in rows:
        by_offset[r["week_offset"]] = by_offset.get(r["week_offset"], 0) + r["n_users"]
    # retained users at offset k is a subset of cohort sizes — totals
    # cannot exceed offset-0 totals
    assert all(v <= week0 for v in by_offset.values())


def test_funnel_stages_monotone_and_ordered(spark):
    """Funnel stage counts must be monotone non-increasing (each stage
    requires the previous), and an adversarial user whose click precedes
    every view must NOT count as converted."""
    import os
    import tempfile
    from datetime import datetime

    from proteofav_spark.operators.pipeline_queries import (
        q_events_funnel_conversion,
    )

    out = {r["stage"]: r["n_users"] for r in q_events_funnel_conversion(spark, SF).collect()}
    assert out["view"] >= out["view_click"] >= out["view_click_purchase"]

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: proper view → click → purchase order
        (1, t(0), 1, "view", 1.0, "{}"),
        (2, t(1), 1, "click", 1.0, "{}"),
        (3, t(2), 1, "purchase", 1.0, "{}"),
        # user 2: click BEFORE any view — ordered funnel must reject
        (4, t(0), 2, "click", 1.0, "{}"),
        (5, t(1), 2, "view", 1.0, "{}"),
        (6, t(2), 2, "purchase", 1.0, "{}"),
    ]
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double, props: string"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    got = {r["stage"]: r["n_users"] for r in q_events_funnel_conversion(spark, tmp).collect()}
    assert got == {"view": 2, "view_click": 1, "view_click_purchase": 1}


def test_quantize_int8_error_bound(spark):
    """Per-vector RMSE of int8 scalar quantization is bounded by half a
    quantization step of the widest dimension (max (hi-lo)/255/2 per
    element, so RMSE ≤ that too), and is zero only for vectors exactly
    on grid points."""
    from proteofav_spark.operators.llm_queries import q_embedding_quantize_int8
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    stats = (
        e.select(F.posexplode("embedding").alias("d", "v"))
        .groupBy("d")
        .agg((F.max(F.col("v").cast("double")) - F.min(F.col("v").cast("double"))).alias("rng"))
        .agg(F.max("rng"))
        .first()[0]
    )
    bound = stats / 255 / 2 + 1e-9
    out = q_embedding_quantize_int8(spark, SF)
    assert out.count() == e.count()
    assert out.filter(F.col("q_rmse") > bound).count() == 0
    assert out.filter(F.col("q_rmse") < 0).count() == 0
