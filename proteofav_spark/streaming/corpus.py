"""Structured-Streaming corpus ingestion: incremental dedup for a
continuously-arriving document stream (the streaming face of the batch
dedup family in ``operators/llm_queries.py``).

Scale notes (100 TB design):
- Exact dedup keys state on a 128-bit content hash and bounds it with
  ``dropDuplicatesWithinWatermark`` — plain ``dropDuplicates`` on an
  unbounded stream grows state forever, which is exactly the failure
  mode a production ingest hits first. The watermark horizon is the
  dedup window; beyond it, re-ingested bytes defer to the batch pass.
- Near-dup flagging reuses the batch MinHash banding
  (:func:`...llm_queries.minhash_band_buckets` — map-only, so the same
  plan runs on the stream) and joins against a static band-bucket index
  of the existing corpus. A stream-static equi-join needs no stream
  state at all; the static side broadcasts when it fits and is
  refreshed by re-deploying, the standard pattern for slowly-growing
  reference indexes.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the documents table file-by-file (schema from a batch
    peek; pathGlobFilter keeps sibling tables out of the stream).

    The file stream source requires a DIRECTORY basePath: when
    ``documents.parquet`` is a Spark-written directory it streams
    directly; when the lake stores it as one flat parquet file (the
    driver testdata layout) the parent directory is streamed with a
    name-scoped glob instead."""
    import os

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.format("parquet").schema(schema)
    if os.path.isdir(path.removeprefix("file:")):
        return reader.option("pathGlobFilter", "*.parquet").load(path)
    return reader.option("pathGlobFilter", "documents*.parquet").load(sf_dir)


def stream_exact_dedup(docs: DataFrame, horizon: str = "10 minutes") -> DataFrame:
    """First-seen rows per distinct text within the watermark horizon.

    Content-hash keyed so state rows carry a true 16-byte binary key
    (``unhex(md5)``, not md5's 32-char hex string) instead of the text;
    ``dropDuplicatesWithinWatermark`` lets the engine evict state older
    than the horizon (unbounded ``dropDuplicates`` state is the classic
    streaming-dedup OOM)."""
    return (
        docs.withColumn("text_hash", F.unhex(F.md5(F.col("text").cast("binary"))))
        .withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", horizon)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def stream_collision_candidates(
    stream_docs: DataFrame, corpus_bands: DataFrame
) -> DataFrame:
    """Incoming documents whose MinHash band bucket collides with the
    existing corpus index: (doc_id, band, bucket, known_doc_id) rows —
    near-dup *candidates* against the already-ingested corpus, to be
    confirmed by an exact-similarity pass downstream.

    ``corpus_bands`` is a static (doc_id, band, bucket) frame (batch
    :func:`minhash_band_buckets` output, or its persisted parquet).
    Row-level append output: the stream-static join keeps NO stream
    state, so this scales to an arbitrary-rate ingest. No broadcast
    hint: a corpus index is ~N_BANDS rows per known document and soon
    outgrows the driver — the broadcast-vs-shuffle choice stays with
    the autoBroadcastJoinThreshold / the caller's hint.

    Shingle-less documents (< 3 tokens) all share the sentinel
    signature (every min-hash = P_MOD), which would mark every short
    streamed doc a candidate dup of every short corpus doc — the
    sentinel bucket is dropped on both sides; short docs defer to the
    exact-hash dedup path."""
    from proteofav_spark.operators.llm_queries import (
        P_MOD, ROWS_PER_BAND, minhash_band_buckets,
    )

    sentinel = "_".join([str(P_MOD)] * ROWS_PER_BAND)
    known = corpus_bands.filter(F.col("bucket") != sentinel).select(
        F.col("doc_id").alias("known_doc_id"), "band", "bucket"
    )
    return (
        minhash_band_buckets(stream_docs)
        .filter(F.col("bucket") != sentinel)
        .join(known, ["band", "bucket"])
    )


# ---------------------------------------------------------------------------
# Exactly-once ingest sink: idempotent MERGE-by-content-hash into the store
# ---------------------------------------------------------------------------

def dedup_store_merger(store_path: str):
    """Build the ``foreachBatch`` function for an exactly-once document
    ingest: each micro-batch MERGEs into a content-hash-keyed parquet
    store, and replaying a batch (the post-crash recovery path — Spark
    re-runs the last uncommitted batch from the checkpoint) appends
    NOTHING the store already holds. Parquet has no transactional
    MERGE, so idempotence is constructed, not assumed:

    1. in-batch dedup on the 256-bit content hash (a batch may carry
       its own duplicates);
    2. LEFT ANTI join against the store's existing hashes — this is
       what makes replay safe: a fully-replayed batch anti-joins to
       zero rows, and a partially-committed batch (crash mid-write:
       some task files visible, commit incomplete) re-appends only the
       rows whose files never landed;
    3. append-only write partitioned by a 1-byte hash prefix.

    100 TB shape: the anti-join needs only the store's (hash_prefix,
    text_hash) columns — column pruning reads a few bytes per stored
    document, not the corpus — and the batch's observed prefixes prune
    the store scan to the partitions a small batch actually touches.
    The hash prefix also pre-buckets both sides' shuffle keys evenly
    (crypto-hash prefixes are uniform, so no skew). State here is ZERO:
    dedup-across-all-history lives in the store itself, not in
    watermark-bounded stream state — this sink is the beyond-horizon
    complement to :func:`stream_exact_dedup`.

    Maintenance: appends accumulate one file per touched prefix per
    batch; on an ingest cadence that is the same small-files failure
    mode the IVF store has. Run
    ``plans.lake.compact_lake(spark, store_path,
    partition_cols=("hash_prefix",))`` from a quiesced maintenance slot
    (no ingest running — single-writer contract); the anti-join and
    replay idempotence are layout-independent, so compaction never
    changes MERGE semantics (pinned in tests)."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        new = (
            # a NULL text has no content identity: its hash is NULL, and
            # NULL never matches the anti-join's null-unsafe equality, so
            # such a row would re-append on EVERY batch and replay —
            # dropped here, matching the batch dedup family's contract
            batch_df.where(F.col("text").isNotNull())
            .withColumn(
                "text_hash", F.sha2(F.col("text").cast("binary"), 256)
            )
            .withColumn("hash_prefix", F.substring("text_hash", 1, 2))
            .dropDuplicates(["text_hash"])
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        )
        try:
            existing = spark.read.parquet(store_path)
            store_exists = True
        except AnalysisException:
            # ONLY path-missing (first batch against a fresh store) may
            # skip the anti-join; a transient IO error on an existing
            # store must fail the batch loudly — treating it as
            # store-absent would append duplicates with no error
            store_exists = False
        if store_exists:
            prefixes = [
                r["hash_prefix"]
                for r in new.select("hash_prefix").distinct().collect()
            ]  # bounded: ≤256 values
            seen = existing.where(
                F.col("hash_prefix").isin(prefixes)
            ).select("hash_prefix", "text_hash")
            new = new.join(seen, ["hash_prefix", "text_hash"], "left_anti")
        # cluster on the partition column before the partitioned write:
        # without this every shuffle task writes a file into every
        # prefix directory it touches — up to tasks x 256 small files
        # PER BATCH, which is the store-side small-files failure mode at
        # any scale (probe latency goes footer-bound; see
        # compact_ivf_store for the same argument). One exchange keyed
        # on hash_prefix bounds it to one file per touched prefix per
        # batch; crypto-uniform prefixes make the exchange skew-free.
        (
            new.repartition(F.col("hash_prefix"))
            .write.mode("append")
            .partitionBy("hash_prefix")
            .parquet(store_path)
        )
        spark.catalog.refreshByPath(store_path)

    return merge_batch


def run_dedup_ingest(
    docs_stream: DataFrame, store_path: str, checkpoint: str
):
    """Drive the exactly-once ingest: availableNow trigger (process all
    pending files, then stop — the batch-like deployment mode), with
    the checkpoint recording source offsets so a crashed run resumes at
    the exact uncommitted batch and the idempotent merger absorbs the
    replay."""
    return (
        docs_stream.writeStream.foreachBatch(dedup_store_merger(store_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Raw JSONL ingest: file stream -> quarantine + exactly-once dedup store
# ---------------------------------------------------------------------------


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema,
    path_glob: str = "*.jsonl*",
) -> DataFrame:
    """File-source streaming twin of ``sources.corpus.read_jsonl_corpus``
    (shared schema-augmentation and reader options — one corrupt-record
    contract for both): new files matching ``path_glob`` under ``path``
    stream in with EXPLICIT schema only and PERMISSIVE corrupt-line
    capture in ``_corrupt``. The glob default keeps stray directory
    members (_SUCCESS markers, READMEs, a nested checkpoint/quarantine)
    out of the stream — without it any such file floods the quarantine
    as corrupt lines, and a quarantine nested under ``path`` would feed
    back into its own source. Pair with :func:`run_jsonl_ingest` for the
    full raw-dump-to-store path."""
    from proteofav_spark.sources.corpus import (
        corrupt_augmented_schema,
        jsonl_read_options,
    )

    return (
        spark.readStream.schema(corrupt_augmented_schema(schema))
        .options(**jsonl_read_options())
        .option("pathGlobFilter", path_glob)
        .json(path)
    )


def jsonl_ingest_merger(store_path: str, quarantine_path: str | None = None):
    """``foreachBatch`` body composing the raw-JSONL contract with the
    exactly-once dedup sink: each micro-batch splits into clean rows
    (documents-table shape via the SHARED projection, then MERGEd into
    the store through :func:`dedup_store_merger`'s replay-idempotent
    anti-join) and a quarantine of everything that cannot be stored —
    malformed lines (reason ``corrupt``) AND well-formed lines with a
    null/missing ``text`` (reason ``null_text``: the store keys on the
    content hash, so a contentless row has no identity there; dropping
    it silently would violate the nothing-vanishes contract).

    Without ``quarantine_path`` the reject rows are NOT retained: they
    are counted per batch, the drop is logged to stderr, AND the count
    accumulates on the returned callable itself
    (``merger.rejects_dropped``, total rows across batches;
    ``merger.reject_batches`` maps batch_id → count) — a programmatic
    metrics surface so an ingest driver can alert on reject volume
    without scraping stderr (ADVICE r8/r9 contract-honesty item). The
    nothing-vanishes contract thus degrades to
    nothing-vanishes-UNRETAINED, never to uncounted. Pass a quarantine
    path whenever the reject payloads themselves must survive
    (replayable from the source files otherwise).

    Identity: ``doc_id`` hashes TEXT ALONE here, because the store's
    dedup key is sha2(text) — content identity. Two differently-labeled
    copies of one text are one stored document (lang/source are the
    first-seen copy's attributes); the batch READER keeps full-row
    identity instead, see ``documents_projection``.

    Delivery semantics, stated honestly: the STORE side is exactly-once
    (the anti-join absorbs crash replays); the QUARANTINE side is
    at-least-once — a replayed batch re-appends its reject lines, so
    quarantine consumers should tolerate (or dedup on) repeats. Making
    rejects exactly-once would need a second content-keyed MERGE store,
    unwarranted for a reject log.

    Per-batch plan: the batch parse is CACHED for its three consumers
    (quarantine write, prefix probe, store write — the bounded
    micro-batch is exactly split_corrupt's documented cache case) and
    unpersisted after; the clean side fans out before hashing so a
    single non-splittable ``.jsonl.gz`` batch file does not hash on one
    core."""
    from proteofav_spark.queries import fan_out
    from proteofav_spark.sources.corpus import (
        documents_projection,
        split_corrupt,
    )

    base = dedup_store_merger(store_path)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        clean, quarantine = split_corrupt(batch_df, materialize="cache")
        try:
            rejects = quarantine.select(
                "raw_line", F.lit("corrupt").alias("reason")
            ).unionByName(
                clean.where(F.col("text").isNull()).select(
                    F.to_json(
                        F.struct("text", "lang", "source")
                    ).alias("raw_line"),
                    F.lit("null_text").alias("reason"),
                )
            )
            if quarantine_path is not None:
                rejects.write.mode("append").parquet(quarantine_path)
            else:
                # no quarantine configured: rejects are dropped, but never
                # silently — the batch is cached, so this count is a cheap
                # second scan, and the drop leaves an auditable trace on
                # stderr AND on the merger callable (metrics surface)
                n_rej = rejects.count()
                if n_rej:
                    merge.rejects_dropped += n_rej
                    merge.reject_batches[batch_id] = n_rej
                    print(
                        f"# jsonl_ingest batch {batch_id}: dropped {n_rej} "
                        "reject row(s) (corrupt/null-text; no "
                        "quarantine_path configured)",
                        file=sys.stderr,
                    )
            docs = documents_projection(
                fan_out(clean.where(F.col("text").isNotNull())),
                id_cols=["text"],
            )
            base(docs, batch_id)
        finally:
            batch_df.unpersist()

    merge.rejects_dropped = 0
    merge.reject_batches = {}
    return merge


def run_jsonl_ingest(
    spark: SparkSession,
    src_path: str,
    store_path: str,
    checkpoint: str,
    quarantine_path: str | None = None,
):
    """Drive the raw-dump ingest end to end: stream JSONL files as they
    land, quarantine whatever cannot be stored (malformed lines AND
    contentless null-text rows), and MERGE clean documents into the
    content-hash dedup store exactly once (availableNow trigger — the
    batch-like deployment mode; the checkpoint makes crash recovery
    replay only the uncommitted batch, which the merger absorbs).

    ``quarantine_path=None`` (the default) DROPS reject rows instead of
    retaining them — counted and logged per batch, never silent (see
    :func:`jsonl_ingest_merger`); the returned query carries the merger
    as ``query.ingest_merger`` so callers can read
    ``ingest_merger.rejects_dropped`` after ``awaitTermination()``
    instead of scraping stderr. Set ``quarantine_path`` whenever reject
    payloads must be inspectable after the run."""
    from proteofav_spark.sources.corpus import DOCUMENTS_SCHEMA

    stream = read_jsonl_stream(spark, src_path, DOCUMENTS_SCHEMA)
    merger = jsonl_ingest_merger(store_path, quarantine_path)
    query = (
        stream.writeStream.foreachBatch(merger)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.ingest_merger = merger
    return query


# ---------------------------------------------------------------------------
# Streaming retrieval enrichment: query-vector stream x persisted IVF store
# ---------------------------------------------------------------------------


def knn_enrich_merger(
    store_path: str,
    out_path: str,
    nprobe: int | None = None,
    topk: int | None = None,
    prefilter_m: int | None = None,
):
    """``foreachBatch`` body for streaming retrieval enrichment: each
    micro-batch of query vectors (``qid``, ``qvec``) is searched against
    the STATIC persisted IVF store with the quantized two-stage probe
    and the (qid, vec_id, cosine, rk) matches append to a parquet sink.

    Per-batch application is EXACT, not approximate, for the same reason
    as the as-of enrichment (events.asof_enrich_merger): with a static
    store each query's result is row-local — it depends only on that
    query and the store, never on other stream rows — so enriching
    micro-batches independently equals one batch probe over the full
    stream history (pinned in tests/test_streaming_parity.py).

    100 TB shape: the probe's per-batch driver work is the bounded
    |batch|·nprobe centroid ranking; the cluster-side cost is the
    partition-pruned, column-pruned codes scan of nprobe/K lists — the
    store bytes never re-shuffle per batch (contrast merge_asof's
    union exchange), so a small query cadence against a huge corpus is
    the cheap direction for this join."""
    from proteofav_spark.plans.ann_store import probe_ivf_store_quantized

    kw = {}
    if nprobe is not None:
        kw["nprobe"] = nprobe
    if topk is not None:
        kw["topk"] = topk
    if prefilter_m is not None:
        kw["prefilter_m"] = prefilter_m

    def enrich(batch_df: DataFrame, batch_id: int) -> None:
        probe_ivf_store_quantized(
            batch_df.sparkSession, store_path, batch_df, **kw
        ).write.mode("append").parquet(out_path)

    return enrich


def run_knn_enrich(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    nprobe: int | None = None,
    topk: int | None = None,
    prefilter_m: int | None = None,
):
    """Drive streaming retrieval enrichment with Trigger.AvailableNow.
    At-least-once on crash replay — matches carry their query identity
    (``qid``), so a downstream exactly-once consumer dedupes on
    (qid, vec_id) or wraps the write in the anti-join MERGE pattern of
    :func:`dedup_store_merger`.

    Contract errors raise HERE, before the query starts: the stream must
    carry ``qid`` and ``qvec`` columns, and the store must exist with
    the SQ8 codes column (pre-codes stores direct to backfill_codes) —
    not as a py4j-wrapped StreamingQueryException out of batch 0."""
    from proteofav_spark.plans.ann_store import require_codes

    missing = {"qid", "qvec"} - set(stream.schema.fieldNames())
    if missing:
        raise ValueError(
            f"query stream must carry qid and qvec; missing {sorted(missing)}"
        )
    require_codes(stream.sparkSession, store_path)
    return (
        stream.writeStream.foreachBatch(
            knn_enrich_merger(
                store_path, out_path,
                nprobe=nprobe, topk=topk, prefilter_m=prefilter_m,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
