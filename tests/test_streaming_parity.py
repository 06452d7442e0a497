"""End-to-end Structured-Streaming parity: drive the real streaming
engine (Trigger.AvailableNow, file source → memory sink) over the sf0.01
events/documents lake and assert VALUE-level agreement with the batch
twins — not just row counts. This pins that the streaming plans compute
the same function as the oracled batch queries, so the DuckDB oracle
transitively covers the streaming surface."""

from pyspark.sql import functions as F

from proteofav_spark.queries import (
    all_queries,
    load,
)
from proteofav_spark.streaming.corpus import (
    read_documents_stream,
    stream_collision_candidates,
    stream_exact_dedup,
)
from proteofav_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_windows,
    tumbling_counts,
)

SF = "/root/testdata/sf0.01"


def test_stream_tumbling_value_parity_with_batch_twin(spark):
    """Streaming 1-hour tumbling counts == the oracled batch
    events_tumbling_window rows, value for value (window start mapped to
    the batch hour_bucket)."""
    stream = read_events_stream(spark, SF)
    run_to_memory(
        tumbling_counts(stream, window="1 hour"),
        "parity_tumbling",
        output_mode="complete",
    )
    got = {
        (r["hb"], r["event_type"], r["n_events"], r["total_value"])
        for r in spark.table("parity_tumbling")
        .select(
            F.expr("unix_timestamp(window_start) div 3600").alias("hb"),
            "event_type",
            "n_events",
            "total_value",
        )
        .collect()
    }
    batch = {
        (r["hour_bucket"], r["event_type"], r["n_events"], r["total_value"])
        for r in all_queries()["events_tumbling_window"](spark, SF).collect()
    }
    assert got == batch


def test_stream_sessionize_parity_with_batch_twin(spark):
    """Streaming session windows (30-min gap) == batch
    sessionize_events_gap: same per-user session count and the same
    multiset of per-session event counts for every user. (The batch twin
    keeps an event at exactly gap distance in the same session — `> 1800`
    — matching session_window's closed merge bound.)"""
    stream = read_events_stream(spark, SF)
    run_to_memory(
        session_windows(stream, gap="30 minutes"),
        "parity_sessions",
        output_mode="complete",
    )
    got_rows = spark.table("parity_sessions").collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["user_id"], []).append(r["n_events"])
    batch_rows = all_queries()["sessionize_events_gap"](spark, SF).collect()
    batch = {}
    for r in batch_rows:
        batch.setdefault(r["user_id"], []).append(r["n_events"])
    assert set(got) == set(batch)
    mismatched = [
        u for u in batch if sorted(got[u]) != sorted(batch[u])
    ]
    assert mismatched == [], mismatched[:10]


def test_stream_exact_dedup_count_parity(spark):
    """Streaming exact dedup over the sf0.01 documents lake emits exactly
    one row per distinct content hash — the same cardinality the batch
    dedup_exact_hash groupBy produces (every doc arrives inside the
    watermark horizon under AvailableNow, so no state evicts mid-run)."""
    docs = read_documents_stream(spark, SF)
    run_to_memory(
        stream_exact_dedup(docs).select("doc_id", "text_hash"),
        "parity_dedup",
    )
    got = spark.table("parity_dedup")
    n_distinct = (
        load(spark, SF, "documents")
        .select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
        .count()
    )
    assert got.count() == n_distinct
    # first-seen semantics: emitted doc_ids are distinct per hash
    assert got.select("text_hash").distinct().count() == n_distinct


def test_stream_collision_candidates_value_parity(spark):
    """Stream-static MinHash collision flagging == the identical join run
    fully in batch: stream sf0.01 documents against a static sf0.001
    corpus band index, row sets must agree exactly."""
    from proteofav_spark.operators.llm_queries import (
        P_MOD,
        ROWS_PER_BAND,
        minhash_band_buckets,
    )

    corpus_bands = minhash_band_buckets(
        load(spark, "/root/testdata/sf0.001", "documents").select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    stream = read_documents_stream(spark, SF)
    run_to_memory(
        stream_collision_candidates(stream, corpus_bands),
        "parity_collisions",
    )
    got = {
        (r["doc_id"], r["band"], r["bucket"], r["known_doc_id"])
        for r in spark.table("parity_collisions").collect()
    }
    sentinel = "_".join([str(P_MOD)] * ROWS_PER_BAND)
    batch = {
        (r["doc_id"], r["band"], r["bucket"], r["known_doc_id"])
        for r in minhash_band_buckets(load(spark, SF, "documents"))
        .filter(F.col("bucket") != sentinel)
        .join(
            corpus_bands.filter(F.col("bucket") != sentinel).select(
                F.col("doc_id").alias("known_doc_id"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .collect()
    }
    assert got == batch
    assert len(got) > 0  # the sf0.001 corpus is a subset slice — overlaps exist


def test_stream_asof_enrich_parity_with_oracled_batch_query(spark, tmp_path):
    """Streaming as-of enrichment (foreachBatch merge_asof against a
    static right side) over a MULTI-batch source equals the
    DuckDB-oracled events_merge_asof_tolerance batch query value for
    value — proving per-batch application preserves as-of semantics
    (row-local on the left when the right side is static)."""
    from proteofav_spark.operators.pipeline_queries import ASOF_TOL_US
    from proteofav_spark.streaming.events import run_asof_enrich

    e = load(spark, SF, "events").withColumn(
        "t_us", F.expr("unix_micros(cast(ts as timestamp))")
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "t_us")
        .agg(
            F.max("event_id").alias("view_id"),
            F.round(F.max("value"), 2).alias("view_value"),
        )
    )
    src = str(tmp_path / "src")
    # 4 source files -> 4 micro-batches under maxFilesPerTrigger=1
    e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "t_us"
    ).repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id bigint, purchase_id bigint, t_us bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = run_asof_enrich(
        stream, views, on="t_us", by=["user_id"], out_path=out,
        checkpoint=str(tmp_path / "ckpt"),
        direction="backward", tolerance=ASOF_TOL_US,
    )
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p.numInputRows > 0])
    assert n_batches >= 2, "source did not split into micro-batches"

    got = {
        tuple(r) for r in spark.read.parquet(out)
        .select("purchase_id", "user_id", "t_us", "t_us_right",
                "view_id", "view_value").collect()
    }
    batch = {
        tuple(r)
        for r in all_queries()["events_merge_asof_tolerance"](spark, SF)
        .select("purchase_id", "user_id", "t_us", "t_us_right",
                "view_id", "view_value").collect()
    }
    assert got == batch


def test_stream_asof_enrich_validates_eagerly(spark, tmp_path):
    """Contract errors surface at wiring time as plain ValueErrors, not
    out of batch 0 as wrapped StreamingQueryExceptions."""
    import pytest

    from proteofav_spark.streaming.events import run_asof_enrich

    right = load(spark, SF, "events").select(
        "user_id", F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        F.col("event_id").alias("rid"),
    ).limit(10)
    stream = (
        spark.readStream.schema("user_id bigint, t_us bigint")
        .parquet(str(tmp_path))  # never started — validation fires first
    )
    with pytest.raises(ValueError, match="direction"):
        run_asof_enrich(
            stream, right, on="t_us", by=["user_id"],
            out_path=str(tmp_path / "o"), checkpoint=str(tmp_path / "c"),
            direction="backwards",
        )
    with pytest.raises(ValueError, match="tolerance"):
        run_asof_enrich(
            stream, right, on="t_us", by=["user_id"],
            out_path=str(tmp_path / "o"), checkpoint=str(tmp_path / "c"),
            tolerance=-5,
        )
    # tolerance on a non-numeric on-column would only explode at plan
    # time inside batch 0 (ts - ts is an interval, incomparable to the
    # numeric tolerance) — the validator must catch it HERE (review r8)
    right_ts = load(spark, SF, "events").select(
        "user_id", F.col("ts"), F.col("event_id").alias("rid")
    ).limit(10)
    stream_ts = spark.readStream.schema(
        "user_id bigint, ts timestamp_ntz"
    ).parquet(str(tmp_path))
    with pytest.raises(ValueError, match="numeric on-column"):
        run_asof_enrich(
            stream_ts, right_ts, on="ts", by=["user_id"],
            out_path=str(tmp_path / "o"), checkpoint=str(tmp_path / "c"),
            tolerance=3600,
        )


def test_stream_knn_enrich_parity_with_batch_probe(spark, tmp_path):
    """Streaming retrieval enrichment (foreachBatch quantized probe
    against the static persisted IVF store) over a MULTI-batch query
    stream equals one batch probe over all queries, value for value —
    per-batch application is exact when the store is static (each
    query's matches are row-local)."""
    from proteofav_spark.plans.ann_store import (
        build_ivf_store,
        probe_ivf_store_quantized,
    )
    from proteofav_spark.streaming.corpus import run_knn_enrich

    e = load(spark, SF, "embeddings")
    store = str(tmp_path / "store")
    build_ivf_store(e, store)

    queries = e.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    src = str(tmp_path / "src")
    queries.repartition(3).write.parquet(src)  # 3 files -> 3 micro-batches
    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = run_knn_enrich(
        stream, store, out, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p.numInputRows > 0])
    assert n_batches >= 2, "source did not split into micro-batches"

    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    batch = {
        tuple(r)
        for r in probe_ivf_store_quantized(spark, store, queries).collect()
    }
    assert got == batch and got


def test_stream_knn_enrich_validates_eagerly(spark, tmp_path):
    """Contract errors (missing qid/qvec, pre-codes store) surface at
    wiring time as plain ValueErrors, not out of batch 0."""
    import pytest

    from proteofav_spark.plans.ann_store import build_ivf_store
    from proteofav_spark.streaming.corpus import run_knn_enrich

    e = load(spark, SF, "embeddings")
    store = str(tmp_path / "store")
    build_ivf_store(e, store)
    src = str(tmp_path / "badsrc")
    e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "embedding"  # wrong: no qvec column
    ).write.parquet(src)
    bad = spark.readStream.schema("qid bigint, embedding array<float>").parquet(
        src
    )
    with pytest.raises(ValueError, match="qvec"):
        run_knn_enrich(bad, store, str(tmp_path / "o"), str(tmp_path / "c"))
