"""Semantic invariants for the round-8 additions: the error-bound HLL
oracle, the one-step k-means assignment parity row, the rounding-boundary
tripwire probes, the τ-parametrized embedding-dedup frame, the
no-quarantine reject accounting in the JSONL ingest, and the
cross-process codes-flag re-validation in the IVF store. The DuckDB
oracles check value parity against an independent engine; these tests pin
the data-independent semantics each oracle row rests on."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# approx_distinct_parts_bounds
# ---------------------------------------------------------------------------


def test_approx_bounds_true_and_exact_matches_brute(spark):
    """The error-bound row: exact counts match a driver-side recompute
    and the 5%% envelope holds (rsd=0.02, gate at 2.5x) — the property
    the DuckDB oracle's literal TRUE column asserts."""
    from proteofav_spark.queries import all_queries

    rows = all_queries()["approx_distinct_parts_bounds"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    want = {}
    for r in li:
        want.setdefault(r["l_returnflag"], set()).add(r["l_partkey"])
    assert {r["l_returnflag"]: r["exact_parts"] for r in rows} == {
        k: len(v) for k, v in want.items()
    }
    assert all(r["within_tol"] for r in rows)


# ---------------------------------------------------------------------------
# embedding_kmeans_assign
# ---------------------------------------------------------------------------


def test_kmeans_assign_matches_numpy(spark):
    """The one-step assignment equals a pure-numpy argmin with the same
    seeds (lowest vec_ids), float64 widening, and first-occurrence
    tie-break — the driver oracle checks DuckDB; this pins numpy."""
    from proteofav_spark.operators.llm_queries import KMEANS_K
    from proteofav_spark.queries import all_queries

    got = {
        r["vec_id"]: r["cluster"]
        for r in all_queries()["embedding_kmeans_assign"](spark, SF).collect()
    }
    rows = sorted(
        spark.read.parquet(f"{SF}/embeddings.parquet").collect(),
        key=lambda r: r["vec_id"],
    )
    cents = np.array(
        [r["embedding"] for r in rows[:KMEANS_K]], dtype=np.float64
    )
    for r in rows:
        e = np.array(r["embedding"], dtype=np.float64)
        d2 = ((cents - e) ** 2).sum(axis=1)
        assert got[r["vec_id"]] == int(d2.argmin()), r["vec_id"]


# ---------------------------------------------------------------------------
# rounding-boundary probes
# ---------------------------------------------------------------------------


def test_probe_half_cents_every_row_sits_on_boundary(spark):
    """The probe's entire point: 100%% of groups carry a forced .xx5
    boundary sum (s ≡ 50 mod 100) and the emitted dollars equal the
    integer half-away-from-zero conversion."""
    from proteofav_spark.queries import all_queries

    rows = all_queries()["probe_round_half_cents"](spark, SF).collect()
    assert rows
    for r in rows:
        s = r["units_boundary"]
        assert s % 100 == 50
        assert r["dollars"] == ((s + 50) // 100) / 100.0


def test_probe_pow2_sixth_every_row_is_odd(spark):
    from proteofav_spark.queries import all_queries

    rows = all_queries()["probe_round_pow2_sixth"](spark, SF).collect()
    assert rows
    for r in rows:
        n = r["odd_num"]
        assert n % 2 == 1  # odd -> n/128 has an exact 7th-decimal half
        assert r["ratio6"] == ((n * 2000000 + 128) // 256) / 1000000.0


# ---------------------------------------------------------------------------
# dedup_embedding_cosine_frame(tau=...)
# ---------------------------------------------------------------------------


def test_tau_parametrization_is_pure_output_filter(spark):
    """τ moves only the final filter: the production-τ result is exactly
    the synthetic-τ result re-filtered (same pairs, same cosines) — the
    containment the scaling falsification run relies on."""
    from proteofav_spark.operators.llm_queries import (
        COSINE_DUP_TAU,
        dedup_embedding_cosine_frame,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    low = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in dedup_embedding_cosine_frame(
            spark, e, tau=COSINE_DUP_TAU
        ).collect()
    }
    hi_tau = 0.45  # inside the synthetic corpus's range, above default
    hi = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in dedup_embedding_cosine_frame(spark, e, tau=hi_tau).collect()
    }
    assert hi == {k: v for k, v in low.items() if v >= hi_tau}


# ---------------------------------------------------------------------------
# JSONL ingest without a quarantine path: dropped rows leave a trace
# ---------------------------------------------------------------------------


def test_jsonl_ingest_no_quarantine_counts_drops(spark, tmp_path, capfd):
    """ADVICE r7: with quarantine_path=None, corrupt and null-text rows
    must not vanish silently — the batch logs a reject count and the
    store still receives every clean row exactly once."""
    from proteofav_spark.streaming.corpus import run_jsonl_ingest

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"text": "alpha doc", "lang": "en", "source": "s"}\n'
        "{not json at all\n"
        '{"text": null, "lang": "en", "source": "s"}\n'
        '{"text": "beta doc", "lang": "en", "source": "s"}\n'
    )
    store = str(tmp_path / "store")
    q = run_jsonl_ingest(spark, str(src), store, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert spark.read.parquet(store).count() == 2
    assert not (tmp_path / "quarantine").exists()
    err = capfd.readouterr().err
    assert "dropped 2 reject row(s)" in err
    # r9: the count is also a programmatic metrics surface — no stderr
    # scraping needed to alert on reject volume
    assert q.ingest_merger.rejects_dropped == 2
    assert sum(q.ingest_merger.reject_batches.values()) == 2


# ---------------------------------------------------------------------------
# IVF store: cross-process backfill picked up without a writer restart
# ---------------------------------------------------------------------------


def test_append_revalidates_codes_flag_after_external_backfill(
    spark, tmp_path
):
    """ADVICE r7: the codes flag cache is process-local. Simulate a
    backfill_codes run from ANOTHER process by resetting this process's
    cached flag to the stale False after backfilling — the next append
    must re-read meta and write coded rows, not poison the store with
    NULL-codes files."""
    from proteofav_spark.plans import ann_store as st

    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    path = str(tmp_path / "store")
    st.build_ivf_store(e.where(F.col("vec_id") < 400), path)
    # strip the codes column: a store built before the SQ8 tier existed
    lists = spark.read.parquet(f"{path}/lists").drop("codes")
    lists.localCheckpoint().write.mode("overwrite").partitionBy(
        "list_label"
    ).parquet(f"{path}/lists")
    spark.createDataFrame(
        [(st._store_embed_type(spark, path), False)],
        "embedding_type string, has_codes boolean",
    ).write.mode("overwrite").parquet(f"{path}/meta")
    st._STORE_CODES_CACHE[path] = False
    st._EMBED_TYPE_CACHE.pop(path, None)
    spark.catalog.refreshByPath(f"{path}/lists")

    st.backfill_codes(spark, path)            # "the other process"
    st._STORE_CODES_CACHE[path] = False       # this process: stale flag

    batch = e.where(
        (F.col("vec_id") >= 400) & (F.col("vec_id") < 450)
    )
    n_batch = batch.count()
    assert n_batch > 0
    st.append_ivf_store(spark, path, batch)
    appended = spark.read.parquet(f"{path}/lists").where(
        F.col("vec_id") >= 400
    )
    assert appended.count() == n_batch
    assert appended.where(F.col("codes").isNull()).count() == 0


# ---------------------------------------------------------------------------
# Dedup ingest store: compaction is MERGE-semantics-invariant
# ---------------------------------------------------------------------------


def test_dedup_store_compaction_preserves_merge_semantics(spark, tmp_path):
    """compact_lake on the ingest store (the documented maintenance
    path): contents byte-identical, file count reduced, and a post-
    compaction replay of already-ingested content still anti-joins to
    ZERO new rows — compaction can never un-dedup the store."""
    import os

    from proteofav_spark.plans.lake import compact_lake
    from proteofav_spark.streaming.corpus import dedup_store_merger

    store = str(tmp_path / "store")
    merge = dedup_store_merger(store)

    def docs(batch):  # distinct content per batch -> files accumulate
        return [
            (batch * 100 + i, f"batch {batch} document body {i}")
            for i in range(50)
        ]

    for b in range(3):
        merge(
            spark.createDataFrame(docs(b), "doc_id bigint, text string"),
            b,
        )

    def n_parquet_files():
        return sum(
            1
            for _, _, fs in os.walk(store)
            for f in fs
            if f.endswith(".parquet")
        )

    before = sorted(
        map(tuple, spark.read.parquet(store).select("text_hash").collect())
    )
    n_files_before = n_parquet_files()
    compact_lake(spark, store, partition_cols=("hash_prefix",))
    after = sorted(
        map(tuple, spark.read.parquet(store).select("text_hash").collect())
    )
    assert after == before and len(after) == 150
    assert n_parquet_files() < n_files_before
    # replay already-ingested content after compaction: still exactly-once
    merge(
        spark.createDataFrame(docs(0) + docs(2), "doc_id bigint, text string"),
        99,
    )
    assert spark.read.parquet(store).count() == 150
