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
    <path>/lists/list_label=<k>/ (vec_id, embedding, enorm) per cell

Search cost is therefore |probed partitions| / K of the corpus per
query batch, independent of total corpus size — the defining IVF
property, here enforced by the storage layout instead of a runtime
filter. All scoring is JVM-side (``zip_with`` dot products inside
whole-stage codegen); no Python appears anywhere in the flow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

from proteofav_spark.operators.llm_queries import _norm_col as _norm, label_centroids

NPROBE_DEFAULT = 4
TOPK_DEFAULT = 5


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a: Column, b: Column, na: Column, nb: Column) -> Column:
    return F.round(_dot(a, b) / (na * nb), 6)


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

    c = F.broadcast(
        embeddings.sparkSession.read.parquet(f"{path}/centroids")
    )
    ev = embeddings.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("enorm")
    )
    # nearest centroid per vector: max(struct) argmax — map-side combine
    # reduces each vector's K scores before the exchange, no window sort
    assigned = (
        ev.crossJoin(c)
        .select(
            "vec_id",
            "embedding",
            "enorm",
            "list_label",
            _cosine(
                F.col("embedding"), F.col("cvec"), F.col("enorm"), F.col("cnorm")
            ).alias("cc"),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cc"),
                    (-F.col("list_label")).alias("nl"),
                    F.col("embedding"),
                    F.col("enorm"),
                )
            ).alias("m")
        )
        .select(
            "vec_id",
            F.col("m.embedding").alias("embedding"),
            F.col("m.enorm").alias("enorm"),
            (-F.col("m.nl")).alias("list_label"),
        )
    )
    assigned.write.mode("overwrite").partitionBy("list_label").parquet(
        f"{path}/lists"
    )


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
    cents = F.broadcast(spark.read.parquet(f"{path}/centroids"))
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
    pairs = probes.collect()  # bounded: |queries| x nprobe rows
    labels = sorted({r["list_label"] for r in pairs})
    by_q = {}
    for r in pairs:
        by_q.setdefault(r["qid"], set()).add(r["list_label"])

    lists = spark.read.parquet(f"{path}/lists").where(
        F.col("list_label").isin(labels)  # static partition prune
    )
    # per-query probed-list membership as a broadcast literal map, so a
    # query only scores vectors from ITS probed cells
    # schema derived from the inputs, not a fixed literal: qid keeps the
    # caller's id type (string doc ids persist fine in the store, so the
    # probe must accept them too) and list_label mirrors the centroid table
    probe_schema = T.StructType(
        [
            T.StructField("qid", queries.schema["qid"].dataType),
            T.StructField("list_label", cents.schema["list_label"].dataType),
        ]
    )
    probe_rows = spark.createDataFrame(
        [(qid, lbl) for qid, ls in by_q.items() for lbl in sorted(ls)],
        probe_schema,
    )
    wr = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        lists.join(F.broadcast(probe_rows), "list_label")  # adds qid per probe
        .join(F.broadcast(q), "qid")  # adds qvec, qnorm
        .select(
            "qid",
            "vec_id",
            _cosine(
                F.col("embedding"), F.col("qvec"), F.col("enorm"), F.col("qnorm")
            ).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= topk)
    )


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
