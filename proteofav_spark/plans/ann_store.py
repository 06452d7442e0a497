"""Persisted IVF vector store: the durable, partition-pruned form of the
session-cached ANN index in ``operators/llm_queries.py``.

The in-session index (``_INDEX_CACHE``) holds centroids + inverted lists
as localCheckpoint-ed frames — right for interactive reuse, gone with
the session. This module is the 100 TB path those docstrings promise:
the inverted lists land as Parquet PARTITIONED BY the coarse-centroid
id, so a probe of NPROBE lists is a metadata-level partition prune at
the scan — the engine never opens the other K-NPROBE directories. Store
layout::

    <path>/centroids/            tiny: (list_label, cvec, cnorm)
    <path>/lists/list_label=<k>/ (vec_id, embedding, enorm, codes) per cell
    <path>/meta/                 one row: embedding type + has_codes flag

Search cost is therefore |probed partitions| / K of the corpus per
query batch, independent of total corpus size — the defining IVF
property, here enforced by the storage layout instead of a runtime
filter. ``codes`` is the SQ8 compressed projection (1 byte/dim):
:func:`probe_ivf_store_quantized` combines the partition prune with a
column-pruned codes-only scan and rescores only the integer-dot
survivors at full precision. All scoring is JVM-side (``zip_with`` dot
products inside whole-stage codegen); no Python appears anywhere in
the flow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

from proteofav_spark.operators.llm_queries import (
    _norm_col as _norm,
    _topk_per_query,
    int_dot_udf,
    label_centroids,
)

NPROBE_DEFAULT = 4
TOPK_DEFAULT = 5
PREFILTER_M_DEFAULT = 50  # quantized-prefilter survivors per query


# ---------------------------------------------------------------------------
# Store-scan resolution (r13 optimization): every `spark.read.parquet` on a
# store subdir re-lists the path and re-reads parquet footers — ~100-200 ms
# of single-threaded driver work PER PROBE, and at production scale the
# lists tree has K partition directories to re-list on every search. The
# scan DataFrame is immutable plan metadata, so it is resolved once per
# (session, store-subdir) exactly like the catalog-style table resolution
# in queries.load(). Every store MUTATOR (build/append/compact/rebalance/
# backfill) calls _evict_store_scans alongside its existing
# catalog.refreshByPath — a stale plan would otherwise chase deleted files.
# ---------------------------------------------------------------------------

_STORE_SCAN_CACHE: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}


def _store_scan(spark: SparkSession, path: str, part: str) -> DataFrame:
    key = (path, part)
    hit = _STORE_SCAN_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = spark.read.parquet(f"{path}/{part}")
    _STORE_SCAN_CACHE[key] = (spark, df)
    return df


def _evict_store_scans(path: str) -> None:
    for key in [k for k in list(_STORE_SCAN_CACHE) if k[0] == path]:
        _STORE_SCAN_CACHE.pop(key, None)


def _store_centroids_local(spark: SparkSession, path: str) -> DataFrame:
    """The K-row centroid table as a session-cached LOCAL relation.

    The store contract already reads the centroids whole at search time
    (they are bounded index metadata — K rows regardless of corpus
    size); collecting them once per (session, store) and probing against
    a LocalTableScan removes a parquet scan stage AND its broadcast-
    exchange materialization from EVERY probe call — two driver round
    trips per search batch, which at 100 TB is pure driver/scheduler
    relief on the hot path (guide §5: the driver should do almost no
    per-query work). Evicted with the scan cache on any store mutation."""
    key = (path, "centroids_local")
    hit = _STORE_SCAN_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    src = _store_scan(spark, path, "centroids")
    df = spark.createDataFrame(src.collect(), src.schema)
    _STORE_SCAN_CACHE[key] = (spark, df)
    return df


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a: Column, b: Column, na: Column, nb: Column) -> Column:
    return F.round(_dot(a, b) / (na * nb), 6)


def _codes_i8(a: Column) -> Column:
    """Symmetric int8 retrieval codes ``floor(v·127+0.5)`` SATURATED to
    [-127, 127], as 1-byte tinyints — the same arithmetic as the
    session-index SQ8 tier (operators/llm_queries._codes_expr) on the
    unit-norm range, stored at 1/8 the bytes of the float64 zip_with
    inputs. Saturation (the standard int8 scheme) keeps the store usable
    for NON-normalized corpora too: out-of-range components clip, the
    prefilter loses resolution only on those dims, and the exact rescore
    stage is unaffected — vs. the ANSI tinyint cast failing the whole
    write."""
    return F.transform(
        a,
        lambda v: F.least(
            F.greatest(
                F.floor(v.cast("double") * 127 + F.lit(0.5)), F.lit(-127.0)
            ),
            F.lit(127.0),
        ).cast("tinyint"),
    )


def _assign_to_centroids(vectors: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment shared by build/append — MAP-ONLY:
    the K-row centroid table collapses to a single broadcast row
    carrying an array<struct(label, cvec, cnorm)>, each vector scores
    the array in place (``transform``), and ``array_max`` takes the
    argmax. The former shape (crossJoin ×K → partial agg →
    Exchange(vec_id) → max(struct)) shuffled the ENTIRE corpus —
    embeddings included — once per build/append purely to reduce K
    scores per vector that were computed side by side on the same row;
    at 100 TB that exchange was the build's only corpus-wide shuffle
    (guide §2.4). ``array_max`` uses the same struct ordering as the
    row-wise ``max(struct(cc, nl))``, so assignment is unchanged:
    ties (equal rounded cosine) break to the SMALLER label on every
    path, and a re-appended vector always lands in the list the
    original build chose. ``vectors`` must carry (vec_id, embedding,
    enorm) with unique vec_ids — the batch contract; returns the same
    plus ``list_label``. Empty centroid table ⇒ empty result (the
    ``size(_cents) > 0`` filter, matching the old inner crossJoin —
    and, because it references only the broadcast array rather than
    the scored argmax, Catalyst cannot inline the heavy transform into
    a second per-row evaluation the way a filter on the computed label
    would)."""
    carr = cents.agg(
        F.collect_list(F.struct("list_label", "cvec", "cnorm")).alias("_cents")
    )
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            _cosine(
                F.col("embedding"), c["cvec"], F.col("enorm"), c["cnorm"]
            ).alias("cc"),
            (-c["list_label"]).alias("nl"),
        ),
    )
    return (
        vectors.crossJoin(F.broadcast(carr))
        .filter(F.size("_cents") > 0)
        .select(
            "vec_id",
            "embedding",
            "enorm",
            (-F.array_max(scored)["nl"]).alias("list_label"),
        )
    )


def build_ivf_store(embeddings: DataFrame, path: str) -> None:
    """Train the coarse quantizer (per-``label`` centroid — the same
    deterministic stand-in for k-means as ``ann_ivf_coarse``), assign
    every vector to its nearest centroid, and persist:

    - ``centroids``: K tiny rows, read whole at search time;
    - ``lists``: the corpus, PARTITIONED BY ``list_label`` so probes
      prune directories at the scan.

    One corpus-wide (label, dim) partial-agg for training, one map-only
    assignment pass with a broadcast centroid table, one
    partition-by-label write. At 100 TB the write is the only heavy
    job, and it shuffles once on the partition key."""
    # ONE training definition shared with the session index
    # (llm_queries.label_centroids) — the store must assign vectors
    # exactly like ann_ivf_coarse or the two indexes drift
    cents = label_centroids(embeddings).select(
        F.col("label").alias("list_label"), "cvec", "cnorm"
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")

    c = embeddings.sparkSession.read.parquet(f"{path}/centroids")
    ev = embeddings.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("enorm")
    )
    _assign_to_centroids(ev, c).withColumn(
        "codes", _codes_i8(F.col("embedding"))
    ).sortWithinPartitions("vec_id").write.mode("overwrite").partitionBy(
        "list_label"
    ).parquet(f"{path}/lists")
    # vec_id-sorted within write tasks so each parquet file's row-group
    # min/max stats on vec_id are selective — the quantized probe's
    # rescore pushes a literal vec_id isin and skips non-candidate groups
    # persist the embedding element type so appends don't have to list
    # the whole lists tree (thousands of partitions at scale) to learn it;
    # has_codes records whether list rows carry the SQ8 codes column, so
    # appends into a pre-codes store never write mixed-schema files
    ddl = ev.schema["embedding"].dataType.simpleString()
    embeddings.sparkSession.createDataFrame(
        [(ddl, True)], "embedding_type string, has_codes boolean"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    _EMBED_TYPE_CACHE[path] = ddl
    _STORE_CODES_CACHE[path] = True
    # drop the session's cached file listing for the store paths: Spark
    # shares a FileStatusCache per session, so a reader created after a
    # rewrite would otherwise chase deleted part-files
    embeddings.sparkSession.catalog.refreshByPath(f"{path}/lists")
    embeddings.sparkSession.catalog.refreshByPath(f"{path}/centroids")
    _evict_store_scans(path)


_EMBED_TYPE_CACHE: dict[str, str] = {}


def _store_embed_type(spark: SparkSession, path: str) -> str:
    """The store's embedding element type as a DDL string — from the
    session cache, else the one-row ``meta`` table, else (stores built
    before meta existed) ONE full lists-schema inference, cached so
    repeated appends never re-list the data tree."""
    ddl = _EMBED_TYPE_CACHE.get(path)
    if ddl is None:
        _load_store_meta(spark, path)
        ddl = _EMBED_TYPE_CACHE[path]
    return ddl


_STORE_CODES_CACHE: dict[str, bool] = {}


def _store_has_codes(spark: SparkSession, path: str) -> bool:
    """Whether the store's list rows carry the SQ8 ``codes`` column —
    from the meta flag (new builds), else False for pre-codes stores
    (their meta lacks the column, or no meta exists at all).

    Only a cached True is trusted: the cache is PROCESS-local, and
    :func:`backfill_codes` may have flipped the on-disk flag False→True
    from a different process (a long-lived writer would then append
    codes-less rows into a coded store until restart — ADVICE r7). A
    cached False therefore re-reads the one-row META table on every
    call — a single tiny-file read per append, the price of cross-
    process correctness. Legacy pre-meta stores stay on their cached
    False when meta is still absent: a cross-process backfill always
    CREATES meta, so its absence proves nothing changed, and the full
    lists-tree schema inference never re-runs per append. True→False
    never happens in place (only a full :func:`build_ivf_store`
    rewrite, which repopulates meta and this cache on its own write
    path), so True stays cacheable.

    Any UNREADABLE meta keeps the cached False (ADVICE r9): besides a
    missing directory (AnalysisException), a concurrent meta rewrite
    caught mid-commit can present an existing directory with ZERO
    readable rows — ``collect()[0]`` would IndexError and crash every
    subsequent append, when the correct behavior is the same as for a
    missing meta: fall back to the last known flag and pick the rewrite
    up on the next append."""
    from pyspark.errors import AnalysisException

    has = _STORE_CODES_CACHE.get(path)
    if has is None:
        _load_store_meta(spark, path)
        has = _STORE_CODES_CACHE[path]
    elif has is False:
        try:
            spark.catalog.refreshByPath(f"{path}/meta")
            meta = spark.read.parquet(f"{path}/meta")
            rows = meta.collect()
            if rows:
                has = (
                    bool(rows[0]["has_codes"])
                    if "has_codes" in meta.schema.fieldNames()
                    else False
                )
                _STORE_CODES_CACHE[path] = has
            # else: zero-row meta (mid-commit rewrite) — cached False stands
        except AnalysisException:
            pass  # no meta on disk: legacy store, cached False stands
    return has


def _load_store_meta(spark: SparkSession, path: str) -> None:
    """Populate both per-path caches from the one-row ``meta`` table,
    falling back to ONE full lists-schema inference for stores built
    before meta existed — cached so repeated appends never re-list the
    data tree."""
    from pyspark.errors import AnalysisException

    rows = []
    try:
        # the meta table may have been rewritten by ANOTHER process
        # (backfill_codes from a maintenance slot): drop this session's
        # cached file listing or the read chases deleted part-files
        spark.catalog.refreshByPath(f"{path}/meta")
        meta = spark.read.parquet(f"{path}/meta")
        rows = meta.collect()
    except AnalysisException:
        pass
    if rows:
        ddl = rows[0]["embedding_type"]
        has = (
            bool(rows[0]["has_codes"])
            if "has_codes" in meta.schema.fieldNames()
            else False
        )
    else:
        # no meta (legacy store) OR a meta dir with zero readable rows
        # (mid-commit concurrent rewrite — ADVICE r9): one full lists
        # schema inference, same as the pre-meta path
        schema = spark.read.parquet(f"{path}/lists").schema
        ddl = schema["embedding"].dataType.simpleString()
        has = "codes" in schema.fieldNames()
    _EMBED_TYPE_CACHE[path] = ddl
    _STORE_CODES_CACHE[path] = has


def append_ivf_store(spark: SparkSession, path: str, batch: DataFrame) -> None:
    """Incremental append: assign a NEW batch (``vec_id``,
    ``embedding``) to the EXISTING centroids and append into the
    partitioned lists — the ingest half of an append-only corpus. The
    quantizer is not retrained (that is what keeps ingest O(|batch|)),
    which means a drifting data distribution concentrates appends on a
    few hot centroids over time: run :func:`ivf_skew_report` on a
    maintenance cadence and :func:`rebalance_ivf_store` when a list
    exceeds its budget — a hot centroid at 100 TB is one giant
    partition that every probe of that cell must scan whole.

    Multi-process note: the codes-presence flag is validated against
    the on-disk meta on every append unless this process has already
    seen it True (see :func:`_store_has_codes`) — a backfill_codes run
    in another process is picked up by the next append, no writer
    restart needed. The quiesce contract still applies WHILE backfill/
    rebalance/compaction runs (single-writer maintenance slot); this
    re-validation closes the stale-flag window after they finish."""
    cents = spark.read.parquet(f"{path}/centroids")
    # coerce the batch's embedding to the STORE's element type: parquet
    # directories with mixed float/double files fail at read time, so an
    # append of (say) array<double> into a float store would poison every
    # later scan of the touched partitions
    stored_type = _store_embed_type(spark, path)
    ev = batch.select(
        "vec_id",
        F.col("embedding").cast(stored_type).alias("embedding"),
    ).select("vec_id", "embedding", _norm(F.col("embedding")).alias("enorm"))
    out = _assign_to_centroids(ev, cents)
    # match the STORE's column set: a codes column appended into a
    # pre-codes store (or vice versa) would leave mixed-schema files whose
    # inferred lists schema depends on which footer Spark samples first
    if _store_has_codes(spark, path):
        out = out.withColumn("codes", _codes_i8(F.col("embedding")))
    out.sortWithinPartitions("vec_id").write.mode("append").partitionBy(
        "list_label"
    ).parquet(f"{path}/lists")
    spark.catalog.refreshByPath(f"{path}/lists")
    _evict_store_scans(path)


def ivf_file_stats(path: str) -> dict[int, tuple[int, int]]:
    """Per-list (file_count, total_bytes) from a directory listing of
    the partitioned lists tree — pure metadata, no data read. Locally
    this is an os.walk; on a cluster filesystem the same numbers come
    from the driver's listFiles metadata sweep (the thing the NameNode/
    object-store index serves), still never opening a row group."""
    import os

    base = os.path.join(path, "lists")
    out: dict[int, tuple[int, int]] = {}
    for d in os.listdir(base):
        if not d.startswith("list_label="):
            continue
        label = int(d.split("=", 1)[1])
        n = b = 0
        part_dir = os.path.join(base, d)
        for f in os.listdir(part_dir):
            if f.endswith(".parquet"):
                n += 1
                b += os.path.getsize(os.path.join(part_dir, f))
        out[label] = (n, b)
    return out


def compact_ivf_store(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Merge the small files that per-batch appends accumulate inside
    each list partition (``append_ivf_store`` writes at least one file
    per touched partition per batch — a 100 TB ingest cadence turns
    that into thousands of KB-size files per hot list, and footer reads
    plus task scheduling dominate probe latency long before data volume
    does; same maintenance argument as :func:`..lake.compact_lake`).

    A list is rewritten only when its current file count exceeds
    ``ceil(bytes / target_file_bytes)`` — the already-compact lists and
    every untouched partition are left byte-identical (dynamic
    partition overwrite rewrites ONLY the selected labels, so probe
    pruning keeps working mid-compaction). Within the rewrite, each
    list's rows are bucketed by ``pmod(xxhash64(vec_id), n_target)`` and
    the shuffle keys on (list_label, bucket), so every output partition
    lands at most ``n_target`` files near the target size — per-list
    file sizing in ONE job, no per-list loop. The selected rows are
    localCheckpoint-ed before the overwrite (plain parquet cannot read
    and replace the same files in one job). Returns before/after
    (files, bytes) per rewritten list.

    Concurrency contract: PROBES are safe mid-compaction (untouched
    partitions stay byte-identical; a rewritten partition is swapped
    atomically by dynamic partition overwrite), but APPENDS into a
    selected list must be quiesced for the duration — a file appended
    between the localCheckpoint snapshot and the overwrite is not in
    the snapshot and is deleted by the overwrite, silently dropping its
    rows. Run compaction from the same single-writer maintenance slot
    as ``rebalance_ivf_store`` (which already holds that contract)."""
    import math

    stats = ivf_file_stats(path)
    todo: dict[int, int] = {}
    for label, (nf, nb) in stats.items():
        n_target = max(1, math.ceil(nb / target_file_bytes))
        if nf > n_target:
            todo[label] = n_target
    if not todo:
        return {"compacted": {}, "skipped": sorted(stats)}

    members = (
        spark.read.parquet(f"{path}/lists")
        .where(F.col("list_label").isin(sorted(todo)))
        .localCheckpoint()
    )
    # per-list target file count via a broadcast join against the tiny
    # (list_label, n_target) frame — after a broad append cadence todo
    # can be ALL K lists, and a K-deep CASE chain would cost O(rows x K)
    # comparisons (and Catalyst analysis depth); the join is O(rows)
    targets = spark.createDataFrame(
        sorted(todo.items()), "list_label int, n_target int"
    )
    bucketed = members.join(F.broadcast(targets), "list_label").withColumn(
        "bucket", F.pmod(F.xxhash64("vec_id"), F.col("n_target"))
    )
    out = (
        bucketed.repartition("list_label", "bucket")
        .sortWithinPartitions("vec_id")
        .drop("bucket", "n_target")
    )

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("list_label").parquet(
            f"{path}/lists"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.catalog.refreshByPath(f"{path}/lists")
    _evict_store_scans(path)

    after = ivf_file_stats(path)
    return {
        "compacted": {
            label: {"before": stats[label], "after": after[label]}
            for label in sorted(todo)
        },
        "skipped": sorted(set(stats) - set(todo)),
    }


def ivf_list_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-list row counts: (list_label, n_rows). The aggregate groups
    on the PARTITION column and touches no data columns, so the scan is
    satisfied from parquet footers/row-group metadata — at 100 TB this
    is a metadata sweep, not a corpus read."""
    return (
        spark.read.parquet(f"{path}/lists")
        .groupBy("list_label")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def ivf_skew_report(
    spark: SparkSession, path: str, row_budget: int | None = None
) -> dict:
    """Occupancy skew across inverted lists, the health metric that
    decides when to rebalance: K lists, total/mean/max rows, the
    max/mean ratio, and (when ``row_budget`` is given) the hot lists
    exceeding it. Driver-side result is K+constant scalars — bounded by
    the quantizer size, never the corpus."""
    rows = {r["list_label"]: r["n_rows"] for r in ivf_list_stats(spark, path).collect()}
    if not rows:
        return {"k": 0, "total": 0, "mean": 0.0, "max": 0, "skew": 0.0, "hot": []}
    total = sum(rows.values())
    mean = total / len(rows)
    mx_label = max(rows, key=lambda l: (rows[l], -l))
    report = {
        "k": len(rows),
        "total": total,
        "mean": round(mean, 1),
        "max": rows[mx_label],
        "max_label": mx_label,
        "skew": round(rows[mx_label] / mean, 2),
        "hot": [],
    }
    if row_budget is not None:
        report["hot"] = sorted(l for l, n in rows.items() if n > row_budget)
    return report


def rebalance_ivf_store(
    spark: SparkSession,
    path: str,
    row_budget: int,
    lloyd_iters: int = 4,
    compact_target_file_bytes: int | None = None,
) -> dict:
    """Split every list exceeding ``row_budget`` into two geometric
    children (distributed 2-means over ALL hot lists at once), so probe
    cost per cell stays bounded as appends concentrate. Child 0 keeps
    the old label (its partition is dynamically overwritten); child 1
    gets a fresh label appended to the centroid table — the partition
    layout keeps its shape, so existing probes keep pruning.

    Deterministic seeding (no RNG, same result on re-run): seed 1 is
    the member FARTHEST from the list centroid, seed 2 the member
    farthest from seed 1, ties to the smaller vec_id — the standard
    diameter-ish 2-means start. Then ``lloyd_iters`` rounds of
    assign/re-mean, each a broadcast join + one (list, child, dim)
    partial-agg shuffle over the hot members only (the cold K-|hot|
    lists are partition-pruned from every pass). Mean/rounding matches
    ``label_centroids`` (6 dp) so future appends assign consistently.

    A list of exact duplicates cannot split geometrically (both
    children coincide and every tie breaks to child 0); such labels are
    returned under ``"unsplit"`` — the fix there is dedup, not
    clustering. Returns {"split": {old: new}, "unsplit": [...]}.

    When ``compact_target_file_bytes`` is set, the same maintenance
    pass finishes with :func:`compact_ivf_store` at that target — split
    partitions are freshly written and dense, but the appends that made
    a list hot typically ALSO left a small-file trail across the cold
    lists, and one maintenance window should fix both (the "compaction"
    key in the result carries the per-list before/after file stats)."""
    def _with_compaction(result: dict) -> dict:
        # shared maintenance tail for both the no-hot-lists early return
        # and the post-split exit
        if compact_target_file_bytes is not None:
            result["compaction"] = compact_ivf_store(
                spark, path, compact_target_file_bytes
            )
        return result

    report = ivf_skew_report(spark, path, row_budget)
    hot = report["hot"]
    if not hot:
        return _with_compaction({"split": {}, "unsplit": []})

    cents_all = spark.read.parquet(f"{path}/centroids").collect()
    max_label = max(r["list_label"] for r in cents_all)
    new_label_of = {
        old: max_label + 1 + i for i, old in enumerate(sorted(hot))
    }

    # hot members only: the scan partition-prunes to the lists being split
    members = (
        spark.read.parquet(f"{path}/lists")
        .where(F.col("list_label").isin(list(hot)))
        .localCheckpoint()  # re-read per Lloyd round from block storage
    )
    hot_cents = spark.createDataFrame(
        [r for r in cents_all if r["list_label"] in set(hot)]
    )

    # seed 1: farthest member from the list centroid (min cosine)
    def _argmin(df: DataFrame, score: Column) -> DataFrame:
        return (
            df.groupBy("list_label")
            .agg(
                F.min(
                    F.struct(score.alias("cc"), "vec_id", "embedding", "enorm")
                ).alias("m")
            )
            .select(
                "list_label",
                F.col("m.vec_id").alias("seed_id"),
                F.col("m.embedding").alias("svec"),
                F.col("m.enorm").alias("snorm"),
            )
        )

    with_cent = members.join(F.broadcast(hot_cents), "list_label")
    s1 = _argmin(
        with_cent,
        _cosine(F.col("embedding"), F.col("cvec"), F.col("enorm"), F.col("cnorm")),
    )
    s2 = _argmin(
        members.join(F.broadcast(s1), "list_label").where(
            F.col("vec_id") != F.col("seed_id")
        ),
        _cosine(F.col("embedding"), F.col("svec"), F.col("enorm"), F.col("snorm")),
    )
    childs = (
        s1.select("list_label", F.lit(0).alias("child"),
                  F.col("svec").alias("ccvec"), F.col("snorm").alias("ccnorm"))
        .unionAll(
            s2.select("list_label", F.lit(1).alias("child"),
                      F.col("svec").alias("ccvec"), F.col("snorm").alias("ccnorm"))
        )
        .localCheckpoint()
    )

    def _assign_children(ch: DataFrame) -> DataFrame:
        # nearest of the list's (up to) two children; ties to child 0.
        # A degenerate zero-norm child centroid scores NaN from the
        # cosine division — and NaN sorts ABOVE every real double in a
        # struct max, which would funnel ALL members to that child; pin
        # it to -2 (below any true cosine) so it attracts nothing.
        score = F.when(
            F.col("ccnorm") > 0,
            _cosine(F.col("embedding"), F.col("ccvec"),
                    F.col("enorm"), F.col("ccnorm")),
        ).otherwise(F.lit(-2.0))
        return (
            members.join(F.broadcast(ch), "list_label")
            .select(
                "list_label", "vec_id", "embedding", "enorm", "child",
                score.alias("cc"),
            )
            .groupBy("list_label", "vec_id")
            .agg(
                F.max(
                    F.struct(F.col("cc"), (-F.col("child")).alias("nc"),
                             F.col("embedding"), F.col("enorm"))
                ).alias("m")
            )
            .select(
                "list_label", "vec_id",
                F.col("m.embedding").alias("embedding"),
                F.col("m.enorm").alias("enorm"),
                (-F.col("m.nc")).alias("child"),
            )
        )

    for _ in range(lloyd_iters):
        asg = _assign_children(childs)
        # re-mean (6 dp, same as label_centroids) — only non-empty
        # children survive, so a degenerate list collapses to one child
        cd = (
            asg.select("list_label", "child", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("list_label", "child", "dim")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("c"))
        )
        childs = (
            cd.groupBy("list_label", "child")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: s["c"],
                ).alias("ccvec")
            )
            .withColumn("ccnorm", _norm(F.col("ccvec")))
            .localCheckpoint()
        )

    final = _assign_children(childs).localCheckpoint()
    # a label splits ONLY if both children ended non-empty — a
    # one-sided final assignment (exact-dup lists, or a collapsed
    # child) must stay unsplit, or the remap would move every member
    # to the new label while dynamic overwrite leaves the old
    # partition untouched (duplicated vectors under a stale label)
    children_of: dict = {}
    for r in final.select("list_label", "child").distinct().collect():
        children_of.setdefault(r["list_label"], set()).add(r["child"])
    split_ok = {l for l, cs in children_of.items() if cs == {0, 1}}
    unsplit = sorted(set(hot) - split_ok)

    # ALL driver-side state is collected BEFORE any store mutation, so
    # a driver failure here leaves the store exactly as it was
    child_rows = childs.collect()
    by_lc = {(r["list_label"], r["child"]): r for r in child_rows}

    # centroid table first (K+|split| tiny rows, via the driver to
    # avoid reading and overwriting the same files in one job). Plain
    # parquet has no cross-file transaction, so order the two writes
    # for graceful partial failure: centroids-then-lists means a crash
    # in between leaves the new label present but its partition empty —
    # probes lose nothing (the old list still holds every member);
    # lists-first would strand members in a partition no centroid
    # targets (silent recall loss).
    new_cents = []
    for r in cents_all:
        lbl = r["list_label"]
        if lbl in split_ok:
            c0 = by_lc[(lbl, 0)]
            new_cents.append((lbl, c0["ccvec"], c0["ccnorm"]))
        else:
            new_cents.append((lbl, r["cvec"], r["cnorm"]))
    for lbl in sorted(split_ok):
        c1 = by_lc[(lbl, 1)]
        new_cents.append((new_label_of[lbl], c1["ccvec"], c1["ccnorm"]))
    spark.createDataFrame(
        new_cents, "list_label int, cvec array<double>, cnorm double"
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.catalog.refreshByPath(f"{path}/centroids")

    # literal label remap (no UDF): CASE over the bounded hot set
    remap = F.col("list_label")
    for old in sorted(split_ok):
        remap = F.when(
            (F.col("child") == 1) & (F.col("list_label") == old),
            F.lit(new_label_of[old]),
        ).otherwise(remap)
    out = final.select(
        "vec_id", "embedding", "enorm", remap.alias("list_label")
    )
    if _store_has_codes(spark, path):
        # the split rewrite rebuilds rows from the Lloyd state, which never
        # carried codes — recompute them (a deterministic function of the
        # embedding) or the rewritten partitions would drop the column
        out = out.withColumn("codes", _codes_i8(F.col("embedding")))
    out = out.sortWithinPartitions("vec_id")

    # dynamic partition overwrite: only the touched partitions (old hot
    # labels now holding child 0; fresh child-1 labels) are replaced
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("list_label").parquet(
            f"{path}/lists"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.catalog.refreshByPath(f"{path}/lists")
    _evict_store_scans(path)

    return _with_compaction({
        "split": {old: new_label_of[old] for old in sorted(split_ok)},
        "unsplit": unsplit,
    })


def probe_ivf_store(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = NPROBE_DEFAULT,
    topk: int = TOPK_DEFAULT,
) -> DataFrame:
    """Search the persisted store: score ``queries`` (``qid``,
    ``qvec``) against the K-row centroid table, take each query's
    ``nprobe`` nearest lists, and scan ONLY those partitions for the
    exact re-rank.

    The probed label set is collected driver-side (bounded by
    |queries|·nprobe — query batches are small by contract) and applied
    as a LITERAL ``isin`` on the partition column, so the lists scan
    carries a static PartitionFilter: the other K-nprobe directories
    are pruned from the file listing, never opened. Returns
    (qid, vec_id, cosine, rk) with rk ≤ topk, ranked by
    (cosine DESC, vec_id) — the same contract as ``ann_ivf_coarse``."""
    q, lists, probe_rows = _probe_selection(spark, path, queries, nprobe)
    scored = (
        lists.join(F.broadcast(probe_rows), "list_label")  # adds qid per probe
        .join(F.broadcast(q), "qid")  # adds qvec, qnorm
        .select(
            "qid",
            "vec_id",
            _cosine(
                F.col("embedding"), F.col("qvec"), F.col("enorm"), F.col("qnorm")
            ).alias("cosine"),
        )
    )
    # rank-limited top-k (r13): WindowGroupLimit prunes each map task to
    # its local top-k per qid before the exchange, so the per-qid sort
    # never sees the ~corpus/K rows of a probed cell
    return _topk_per_query(
        scored, topk, [F.desc("cosine"), F.asc("vec_id")]
    ).withColumnRenamed("prk", "rk")


def _probe_selection(
    spark: SparkSession, path: str, queries: DataFrame, nprobe: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared probe-cell selection: score queries against the K-row
    centroid table, keep each query's ``nprobe`` nearest lists, and
    return (q with norms, the statically partition-pruned lists scan,
    the per-query probed-cell membership frame).

    Only the DISTINCT probed labels round-trip through the driver — a
    ≤K-row collect at ANY batch size — and become the LITERAL ``isin``
    on the partition column, so the lists scan carries a static
    PartitionFilter: the other K-nprobe directories are pruned from the
    file listing, never opened. The per-query membership frame stays
    LAZY (its plan is the broadcast-centroid crossJoin + a K-row-per-
    query window — tiny at any |queries|): the previous version
    collected all |queries|·nprobe (qid, label) pairs and re-created
    them as a literal DataFrame, which priced streaming-enrich
    micro-batches (|Q|=2000 → 8,000-row Python round-trip per batch)
    for a literalness the prune never needed — the prune only needs the
    label SET."""
    cents = F.broadcast(_store_centroids_local(spark, path))
    q = queries.select(
        "qid", "qvec", _norm(F.col("qvec")).alias("qnorm")
    )
    wq = W.partitionBy("qid").orderBy(F.desc("cc"), F.asc("list_label"))
    probes = (
        q.crossJoin(cents)
        .select(
            "qid",
            "list_label",
            _cosine(F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm"))
            .alias("cc"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("qid", "list_label")
    )
    # materialize the tiny (|queries|·nprobe-row) selection ONCE: the
    # distinct-labels collect below and the scoring join both read the
    # checkpointed blocks instead of each re-running the crossJoin +
    # window (review r8). LAZY checkpoint (r13): the collect right below
    # is the materializing action — eager paid a separate whole-frame
    # pass per probe call just to checkpoint it. Per-batch frames go
    # unreferenced after the batch, so the ContextCleaner reclaims the
    # blocks — unlike the session-lifetime _INDEX_CACHE artifacts,
    # nothing pins them.
    probes = probes.localCheckpoint(eager=False)
    labels = sorted(
        r["list_label"]
        for r in probes.select("list_label").distinct().collect()
    )  # bounded by K (the centroid count) regardless of batch size
    lists = _store_scan(spark, path, "lists").where(
        F.col("list_label").isin(labels)  # static partition prune
    )
    return q, lists, probes


def probe_ivf_store_quantized(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = NPROBE_DEFAULT,
    topk: int = TOPK_DEFAULT,
    prefilter_m: int = PREFILTER_M_DEFAULT,
) -> DataFrame:
    """Two-stage probe combining the store's two scale levers: IVF
    PARTITION pruning (only nprobe/K directories are listed) × SQ8
    COMPRESSED scan (the prefilter reads vec_id + 1-byte-per-dim codes +
    the partition column only — Parquet column pruning keeps the float
    embedding and norm bytes on disk for that stage). The exact-integer
    dot prefilter keeps ``prefilter_m`` candidates per query via the
    rank-limited top-k (no per-query global sort). The rescore
    stage is ADAPTIVE on the survivor bound |queries|·prefilter_m:

    - point-query path (bound ≤ _ISIN_PUSHDOWN_CAP): survivors are
      collected driver-side and the full-precision re-rank scan carries
      a LITERAL vec_id isin pushdown, so parquet row-group stats skip
      the float bytes of non-surviving row groups (lists are written
      vec_id-sorted within partitions precisely so those min/max stats
      are selective);
    - batch path (streaming enrichment — thousands of queries per
      micro-batch): the bound is beyond literal pushdown AND beyond a
      sensible driver round-trip (collecting 100k survivor rows per
      batch just to drop the literals was the r8 enrich anchor's whole
      addBatch budget), so the prefilter stays LAZY and the rescore is
      one composed plan: the codes branch scans 1-byte columns, the
      float branch scans only the probed partitions, and AQE picks the
      survivor-join strategy from runtime sizes.

    Identical (cosine DESC, vec_id) contract as :func:`probe_ivf_store`,
    to which this is EXACTLY equal whenever prefilter_m covers the
    probed-cell population (pinned by tests/test_ann_store.py for both
    paths).

    Stores built before the codes column exist raise — run
    :func:`backfill_codes` once (new builds persist codes always)."""
    require_codes(spark, path)
    q, lists, topm = _quantized_prefilter(
        spark, path, queries, nprobe, prefilter_m
    )
    full = lists.select("vec_id", "embedding", "enorm")
    # one narrow count on the (point-set or micro-batch) query frame
    # decides the path from the WORST-CASE survivor bound n_q·m, not the
    # realized distinct-survivor count: a mid-size overlapping batch
    # (e.g. 250 queries whose survivors collapse to 3k distinct ids)
    # therefore takes the lazy path even though its ids would have fit
    # the literal cap — deliberate, because learning the realized count
    # requires exactly the unbounded collect the cap exists to prevent
    n_q = queries.count()
    if n_q * prefilter_m <= _ISIN_PUSHDOWN_CAP:
        # bounded collect (|queries| x prefilter_m): executes the
        # prefilter once and turns the survivors into literals, so the
        # rescore plan never re-runs the codes scan and its float scan
        # can push down row-group stats
        cand_rows = topm.collect()
        cand = F.broadcast(
            spark.createDataFrame(
                [(r["qid"], r["vec_id"]) for r in cand_rows],
                T.StructType(
                    [
                        T.StructField("qid", queries.schema["qid"].dataType),
                        T.StructField(
                            "vec_id", lists.schema["vec_id"].dataType
                        ),
                    ]
                ),
            )
        )
        full = full.where(
            F.col("vec_id").isin(sorted({r["vec_id"] for r in cand_rows}))
        )
    else:
        cand = topm  # lazy: one composed prefilter+rescore plan
    surv = full.join(cand, "vec_id").join(F.broadcast(q), "qid")
    wr = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        surv.select(
            "qid",
            "vec_id",
            _cosine(
                F.col("embedding"), F.col("qvec"), F.col("enorm"), F.col("qnorm")
            ).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= topk)
    )


_ISIN_PUSHDOWN_CAP = 10_000  # literal-filter size guard (plan bloat)


def _quantized_prefilter(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int,
    prefilter_m: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The lazy prefilter stage of :func:`probe_ivf_store_quantized`,
    exposed so tests can audit its plan (the probe collects it, which
    removes the compressed scan from the returned rescore plan). Returns
    (q with norms, the pruned lists scan, the per-query top-prefilter_m
    survivors as a lazy (qid, vec_id) frame)."""
    q, lists, probe_rows = _probe_selection(spark, path, queries, nprobe)
    qq = q.select("qid", _codes_i8(F.col("qvec")).alias("qcodes"))
    # Arrow int-dot kernel: exact integer arithmetic, bit-identical to
    # the JVM zip_with/aggregate fold it replaced (order-independent
    # sum — pinned against the JVM twin in tests), ~25% faster on the
    # candidate volumes a 2,000-query enrich batch produces (~1.6M rows)
    scored = (
        lists.select("vec_id", "list_label", "codes")  # compressed scan
        .join(F.broadcast(probe_rows), "list_label")
        .join(F.broadcast(qq), "qid")
        .select(
            "qid", "vec_id",
            int_dot_udf()(F.col("codes"), F.col("qcodes")).alias("iscore"),
        )
    )
    topm = _topk_per_query(
        scored, prefilter_m, [F.desc("iscore"), F.asc("vec_id")]
    ).select("qid", "vec_id")
    return q, lists, topm


def require_codes(spark: SparkSession, path: str) -> None:
    """Raise (one shared message for the probe and the streaming
    enrichment's eager validation) when the store predates the SQ8
    codes column."""
    if not _store_has_codes(spark, path):
        raise ValueError(
            f"store at {path} has no SQ8 codes column: run "
            "backfill_codes(spark, path) once, or rebuild"
        )


def backfill_codes(spark: SparkSession, path: str) -> None:
    """Migration/repair for stores whose list rows predate (fully or
    partially) the SQ8 codes column: rewrite list partitions with codes
    filled in, then flip the meta flag. A full-store rewrite in the
    worst case — run it from the same single-writer maintenance slot as
    rebalance/compaction (appends must be quiesced, same contract as
    compact_ivf_store).

    Idempotent AND crash-safe: the lists overwrite lands before the
    meta write, so a crash in between leaves lists coded but meta
    stale — a rerun takes the cheap branch (lists already carry a fully
    non-null codes column), repairs only what is missing, and ALWAYS
    rewrites meta. It also repairs the mixed rows that crash window can
    create (appends routed by the stale flag wrote NULL-codes rows into
    coded partitions): ``coalesce(codes, encode(embedding))`` fills
    exactly those, leaving already-coded rows bit-identical."""
    lists = spark.read.parquet(f"{path}/lists")
    rewrite = True
    if "codes" in lists.schema.fieldNames():
        if lists.where(F.col("codes").isNull()).limit(1).count() == 0:
            rewrite = False  # fully coded — only the meta flag is stale
        else:
            out = lists.withColumn(
                "codes",
                F.coalesce(F.col("codes"), _codes_i8(F.col("embedding"))),
            )
    else:
        out = lists.withColumn("codes", _codes_i8(F.col("embedding")))
    if rewrite:
        out = out.sortWithinPartitions("vec_id").localCheckpoint()
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.mode("overwrite").partitionBy("list_label").parquet(
                f"{path}/lists"
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    ddl = _store_embed_type(spark, path)
    spark.createDataFrame(
        [(ddl, True)], "embedding_type string, has_codes boolean"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    _STORE_CODES_CACHE[path] = True
    spark.catalog.refreshByPath(f"{path}/lists")
    _evict_store_scans(path)
    spark.catalog.refreshByPath(f"{path}/meta")


NEAR_DUP_TOPK = 50  # matches retained per new vector (see docstring)


def incremental_near_dups(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    nprobe: int = NPROBE_DEFAULT,
    tau: float = 0.95,
    topk: int = NEAR_DUP_TOPK,
) -> DataFrame:
    """Incremental-ingest near-dup check: score a NEW batch of vectors
    (``vec_id``, ``embedding``) against the persisted corpus store and
    return (new_id, corpus_id, cosine) pairs above ``tau`` — the
    "is this new document a duplicate of anything already ingested"
    primitive an append-only training-data pipeline runs on every
    increment, WITHOUT rescanning or re-indexing the corpus.

    Composition of :func:`probe_ivf_store`: the batch probes its nprobe
    cells, only those partitions are scanned, and the threshold filter
    runs on the probed candidates. Cost per increment is
    |batch|·nprobe/K of the corpus — independent of corpus size, which
    is the property that keeps ingest dedup viable as the corpus grows
    toward 100 TB. Two bounded-result caveats, both tunable: recall is
    the IVF probe's (a true dup whose cell is outside the nprobe probed
    cells is missed — raise nprobe or add a sign-LSH second channel,
    ``dedup_consensus``, where recall matters more than cost), and at
    most ``topk`` matches are kept PER NEW VECTOR (a boilerplate
    vector with more above-τ duplicates than that reports only its
    ``topk`` nearest — raise ``topk`` when the consumer needs the full
    duplicate fan-out, e.g. for cluster linking)."""
    hits = probe_ivf_store(
        spark,
        path,
        batch.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
        nprobe=nprobe,
        topk=topk,
    )
    return hits.where(F.col("cosine") >= tau).select(
        F.col("qid").alias("new_id"),
        F.col("vec_id").alias("corpus_id"),
        "cosine",
    )


def ingest_with_dedup(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    nprobe: int = NPROBE_DEFAULT,
    tau: float = 0.95,
) -> dict:
    """The composed append-only ingest step a training-data pipeline
    runs per increment: dedup the batch (against ITSELF and against the
    persisted store), append only the novel vectors, and report an
    honest census:

    - ``n_batch``: input rows;
    - ``n_degenerate``: zero-norm vectors DROPPED up front (cosine is
      undefined for them, so no dup check can hold — ingesting them
      would re-append one copy per crash replay);
    - ``n_inbatch_dups``: rows collapsed inside the batch — exact
      copies, plus near-dups (cosine ≥ tau) between batch rows whose
      centroid CELL matches (the same recall model as the store probe:
      cross-cell batch near-dups are missed exactly like cross-cell
      store near-dups), smaller vec_id kept;
    - ``n_dups_vs_store``: survivors that matched the store above tau
      via :func:`probe_ivf_store`'s partition-pruned probe;
    - ``n_ingested``: what was appended.

    Cost per increment: the in-batch prune pairs only within centroid
    cells (Σ per-cell²  — bounded by the batch, not the corpus), the
    store probe scans nprobe/K of the corpus, and the append is one
    assignment pass — all independent of corpus size. Recall caveat
    inherited from IVF probing on both channels (raise ``nprobe`` or
    pair with the sign-LSH channel where recall dominates). Run
    :func:`ivf_skew_report` / :func:`rebalance_ivf_store` on a
    maintenance cadence as appends concentrate."""
    b = batch.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("enorm")
    ).localCheckpoint()
    n_batch = b.count()
    ok = b.where(F.col("enorm") > 0)
    n_degenerate = n_batch - ok.count()

    # exact in-batch collapse (smallest vec_id per identical vector)
    wd = W.partitionBy(F.col("embedding").cast("array<double>")).orderBy(
        "vec_id"
    )
    uniq = (
        ok.withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    # near-dup in-batch collapse, IVF-consistent: pair only rows whose
    # nearest store centroid matches, keep the smaller vec_id
    cents = spark.read.parquet(f"{path}/centroids")
    assigned = _assign_to_centroids(uniq, cents).localCheckpoint()
    a = assigned.select(
        "list_label", F.col("vec_id").alias("vid_a"),
        F.col("embedding").alias("va"), F.col("enorm").alias("na"),
    )
    bb = assigned.select(
        "list_label", F.col("vec_id").alias("vid_b"),
        F.col("embedding").alias("vb"), F.col("enorm").alias("nb"),
    )
    inbatch_near = (
        a.join(bb, "list_label")
        .where(F.col("vid_b") < F.col("vid_a"))
        .where(
            _cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
            >= tau
        )
        .select(F.col("vid_a").alias("vec_id"))
        .distinct()
    )
    pruned = assigned.join(inbatch_near, "vec_id", "left_anti").select(
        "vec_id", "embedding"
    )
    n_pruned = pruned.count()
    n_inbatch_dups = (n_batch - n_degenerate) - n_pruned

    dups = incremental_near_dups(
        spark, path, pruned, nprobe=nprobe, tau=tau
    ).select("new_id").distinct()
    n_store_dups = dups.count()
    novel = pruned.join(
        dups, pruned.vec_id == dups.new_id, "left_anti"
    ).localCheckpoint()
    n_novel = novel.count()
    if n_novel:
        append_ivf_store(spark, path, novel)
    return {
        "n_batch": n_batch,
        "n_degenerate": n_degenerate,
        "n_inbatch_dups": n_inbatch_dups,
        "n_dups_vs_store": n_store_dups,
        "n_ingested": n_novel,
    }
