"""LLM-data-pipeline operators over the ``documents`` and ``embeddings``
tables: deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup), text analysis (tokens, quality, language-ID,
fingerprints), and embedding similarity search (brute-force cosine top-k,
per-label centroids, hyperplane-LSH ANN, IVF coarse-quantizer ANN).

Every operator is a declarative DataFrame plan and carries a DuckDB oracle
computing the *identical* deterministic function — hash functions are
polynomial-mod constructions expressible in both engines. Python appears in
exactly one hot path: the near-dup pair cosine, where an Arrow-batched
Pandas UDF measures ~2× faster than the JVM higher-order-function fold
(dense vector math vectorizes in numpy).

Scale notes (100 TB design):
- shingle/minhash pipelines shuffle once on the shingle/bucket key; band
  buckets bound candidate pairs, so the join never goes N².
- the brute-force k-NN broadcasts the (tiny) query set against the corpus —
  a map-only pass plus one top-k aggregation; the LSH variant buckets first.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from proteofav_spark.queries import fan_out, half_up_ratio, load, register

# Session-scoped ANN index cache. An IVF / LSH vector index is TRAINED
# once per corpus and then serves many queries — centroids, inverted
# lists and bucket tables are index artifacts, not per-query state, so
# rebuilding them on every search (as a naive per-call plan would) bills
# index construction to query latency. Entries hold localCheckpoint-ed
# frames keyed on (query family, corpus INPUT-FILE LISTING) — the same
# staleness contract as fan_out's probe memo: rewriting the corpus at
# the same path changes the file listing (new part-file names), so the
# stale index is never served, and retired listings are evicted so the
# cache stays bounded by the number of LIVE corpora, not every corpus
# ever seen. Entries are only valid for the session that materialized
# them — a restarted session rebuilds. This is the DataFrame analogue of
# a vector store keeping its trained quantizer resident; at 100 TB the
# same artifacts would persist as Parquet (centroid-partitioned lists)
# rather than executor block storage.
_INDEX_CACHE: dict = {}


class TempDirArtifact:
    """A cached index value that is a directory on local disk (e.g. a
    written Z-order lake or persisted store) rather than executor
    blocks. Eviction removes the directory so in-place corpus rewrites
    don't leak one temp tree per rewrite."""

    __slots__ = ("path",)

    def __init__(self, path: str):
        self.path = path


def _release_index(val) -> None:
    """Free the executor storage behind an evicted index entry: walk the
    cached value (a DataFrame or any container of them) and unpersist
    each frame's checkpoint blocks. Best-effort — a frame whose session
    already stopped just no-ops."""
    if isinstance(val, TempDirArtifact):
        import shutil

        shutil.rmtree(val.path, ignore_errors=True)
    elif isinstance(val, DataFrame):
        try:
            val.unpersist(blocking=False)
        except Exception:
            pass
    elif isinstance(val, dict):
        for v in val.values():
            _release_index(v)
    elif isinstance(val, (list, tuple, set)):
        for v in val:
            _release_index(v)


def evict_indexes_for_dir(marker: str) -> int:
    """Release every cached index artifact whose corpus lives under a
    directory containing ``marker``; returns the eviction count. Used
    by the bench's clean-build re-measure (a cached artifact otherwise
    makes a per-SF 'cold build' unmeasurable at the base SF, whose
    artifacts were built during the headline phase)."""
    n = 0
    for k in [k for k in _INDEX_CACHE if any(marker in d for d in k[1])]:
        _release_index(_INDEX_CACHE.pop(k)[1])
        n += 1
    return n


def _session_index(spark: SparkSession, family: str, corpus: DataFrame, build):
    import os

    try:
        listing: tuple = tuple(sorted(corpus.inputFiles()))
    except Exception:
        listing = ()
    if not listing:
        # non-file source (createDataFrame/LocalRelation returns an EMPTY
        # inputFiles() list, not an error): no stable identity, never
        # cache — an empty-listing key would collide every in-memory
        # corpus of the same family onto one stale index
        return build()
    dirs = tuple(sorted({os.path.dirname(f) for f in listing}))
    key = (family, dirs, listing)
    hit = _INDEX_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    # same family + same directories but a different file listing = the
    # corpus was rewritten in place: those entries can never hit again.
    # Unpersist the localCheckpoint-ed frames before dropping the dict
    # slot — a checkpoint's executor blocks live until session end
    # otherwise, so evicting only the key would leak storage on every
    # corpus rewrite.
    for k in [k for k in _INDEX_CACHE if k[:2] == (family, dirs) and k != key]:
        _release_index(_INDEX_CACHE.pop(k)[1])
    val = build()
    if hit is not None:
        # same key but a different session owned it (two live sessions
        # alternating over one corpus): release the old checkpoint blocks
        # before dropping the only reference — the overwrite path leaks
        # exactly like eviction otherwise
        _release_index(hit[1])
    _INDEX_CACHE[key] = (spark, val)
    return val

P_MOD = 1_000_003  # prime modulus for polynomial hashes
N_HASHES = 12      # minhash signature length
N_BANDS = 4        # LSH bands (3 rows per band)
ROWS_PER_BAND = N_HASHES // N_BANDS
# fixed affine hash parameters (a, b) for minhash permutations
HASH_AB = [(17 * i + 3, 101 * i + 7) for i in range(1, N_HASHES + 1)]

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


# ---------------------------------------------------------------------------
# shared deterministic building blocks (Spark side)
# ---------------------------------------------------------------------------

def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokens with empties dropped — identical to the oracle's
    regexp_split + filter."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def poly_hash_col(s: Column) -> Column:
    """Polynomial string hash: fold (h*31 + codepoint) mod P over the
    characters. Matches the DuckDB oracle's list_reduce construction."""
    chars = F.filter(F.split(s, ""), lambda ch: ch != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % P_MOD,
    )


def shingles_col(text: str = "text", k: int = 3) -> Column:
    """k-token shingles joined by single spaces."""
    toks = tokens_col(text)
    n = F.size(toks)
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )).otherwise(F.array())


def _sql_tokens(expr: str = "text") -> str:
    return f"list_filter(regexp_split_to_array({expr}, '\\s+'), t -> t <> '')"


def _sql_poly_hash(expr: str) -> str:
    """DuckDB polynomial hash of a string expression (same fold as
    poly_hash_col)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_filter(regexp_split_to_array({expr}, ''), c -> c <> ''), "
        f"c -> CAST(unicode(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {P_MOD})"
    )


def _sql_shingles(expr: str = "text", k: int = 3) -> str:
    toks = _sql_tokens(expr)
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(generate_series(1, len({toks}) - {k - 1}), "
        f"i -> array_to_string({toks}[i:i+{k - 1}], ' ')) "
        f"ELSE [] END"
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_hash",
    """
    SELECT md5(text) AS text_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep the lowest doc_id per
    group. One shuffle on the 128-bit content hash at any scale."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )


_JACCARD_SQL = f"""
    WITH sh AS (
      SELECT doc_id, UNNEST(list_distinct({_sql_shingles('text')})) AS shingle
      FROM documents WHERE doc_id < 200
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST((2 * n_shared * 10000 + u) // (2 * u) AS BIGINT)
               / 10000.0 AS jaccard
    FROM (
      SELECT p.doc_a, p.doc_b, p.n_shared,
             sa.n_sh + sb.n_sh - p.n_shared AS u
      FROM pairs p
      JOIN sizes sa ON p.doc_a = sa.doc_id
      JOIN sizes sb ON p.doc_b = sb.doc_id
      WHERE CAST(p.n_shared AS DOUBLE)
            / (sa.n_sh + sb.n_sh - p.n_shared) >= 0.08)
"""


@register("dedup_ngram_jaccard", _JACCARD_SQL)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates by 3-token-shingle Jaccard ≥ τ. The pair join is
    keyed on the shingle (inverted index), so only documents sharing a
    shingle ever meet — no N² comparison."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    # one shingle evaluation for the whole query (guide §1.2): the doc →
    # distinct-shingle-array projection materializes once (lazy
    # localCheckpoint; the first consumer's action computes it), and BOTH
    # the inverted index and the two size sides read the materialized
    # arrays. The former shape re-derived the shingle HOF from the scan
    # three times (pairs path + each aliased broadcast side — ReuseExchange
    # cannot unify them because the rename projects sit inside the
    # BroadcastExchange subtrees), costing 3 scans + 3 shingle passes.
    sh_arr = d.select(
        "doc_id", F.array_distinct(shingles_col()).alias("sh")
    ).localCheckpoint(eager=False)
    sh = sh_arr.select("doc_id", F.explode("sh").alias("shingle"))
    # n_sh = |distinct shingles| = size of the materialized array: the
    # former explode + groupBy(doc_id) count (one exchange per aliased
    # side) becomes a map-only projection. Docs with zero shingles gain a
    # n_sh=0 row the old groupBy never emitted; both consumers are inner
    # joins against pair-generating docs (≥1 shared shingle), so the extra
    # rows cannot reach the output.
    sizes = sh_arr.select("doc_id", F.size("sh").cast("long").alias("n_sh"))
    # inverted index: groupBy(shingle) + in-array pair combination — one
    # shuffle on the shingle key and the shingle expressions evaluate once,
    # where a self-join would re-derive them on both sides.
    grouped = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = (
        grouped.select(F.explode(_pair_structs_col()).alias("p"))
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= 0.08)  # threshold on the RAW ratio — double
        # division of identical ints is engine-identical; only the
        # EMITTED value needs the integer half-up (review r8: 1/32-style
        # unions sit on a true 5th-decimal half under round(double, 4))
        .select(
            "doc_a", "doc_b", "n_shared",
            (F.col("n_a") + F.col("n_b") - F.col("n_shared")).alias("_u"),
        )
        .select(
            "doc_a", "doc_b",
            half_up_ratio("n_shared", "_u", 4).alias("jaccard"),
        )
    )


SHINGLE_B = 10007  # token-hash combination base for 3-token shingle hashes


def _sql_shingle_hashes() -> str:
    """DuckDB: token polynomial hashes, combined 3-at-a-time into shingle
    hashes — sh_i = ((th_i*B + th_{i+1}) % P * B + th_{i+2}) % P."""
    th = f"list_transform({_sql_tokens('text')}, t -> {_sql_poly_hash('t')})"
    return (
        f"CASE WHEN len({th}) >= 3 THEN "
        f"list_distinct(list_transform(generate_series(1, len({th}) - 2), "
        f"i -> (({th}[i] * {SHINGLE_B} + {th}[i+1]) % {P_MOD} * {SHINGLE_B} "
        f"+ {th}[i+2]) % {P_MOD})) ELSE [] END"
    )


def shingle_hashes_from(th: Column) -> Column:
    """Combine an already-materialized token-hash array column into 3-token
    shingle hashes. ``th`` MUST be a plain column reference — passing the
    hash expression inline would re-evaluate it per array element (no CSE
    inside lambda bodies)."""
    n = F.size(th)
    combined = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: (
            (F.element_at(th, i) * SHINGLE_B + F.element_at(th, i + 1))
            % P_MOD * SHINGLE_B + F.element_at(th, i + 2)
        ) % P_MOD,
    )
    return F.when(n >= 3, F.array_distinct(combined)).otherwise(
        F.array().cast("array<bigint>")
    )


def _minhash_sig_sql() -> str:
    hashes = ", ".join(
        f"CASE WHEN len(sh) = 0 THEN {P_MOD} ELSE "
        f"list_min(list_transform(sh, h -> ({a} * h + {b}) % {P_MOD})) END AS mh{j}"
        for j, (a, b) in enumerate(HASH_AB)
    )
    return f"""
      SELECT doc_id, {hashes} FROM (
        SELECT doc_id, {_sql_shingle_hashes()} AS sh
        FROM documents)
    """


BUCKET_CAP = 64   # max docs per LSH sub-bucket in the pair stage
MAX_SPLITS = 64   # salt-split bound: buckets beyond CAP·MAX_SPLITS docs skip

_MINHASH_SQL = f"""
    WITH sig AS ({_minhash_sig_sql()}),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {band} AS band, "
        + " || '_' || ".join(
            f"CAST(mh{band * ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        )
        + " AS bucket FROM sig"
        for band in range(N_BANDS)
      )}
    ),
    sz AS (
      SELECT band, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM bands
      GROUP BY band, bucket
      HAVING COUNT(*) BETWEEN 2 AND {BUCKET_CAP * MAX_SPLITS}
    ),
    salted AS (
      SELECT b.doc_id, b.band, b.bucket,
             {_sql_poly_hash("CAST(b.doc_id AS VARCHAR)")}
               % ((s.c + {BUCKET_CAP - 1}) // {BUCKET_CAP}) AS salt
      FROM bands b JOIN sz s USING (band, bucket)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(DISTINCT a.band) AS BIGINT) AS n_bands_shared
    FROM salted a JOIN salted b
      ON a.band = b.band AND a.bucket = b.bucket AND a.salt = b.salt
         AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
"""


@lru_cache(maxsize=1)
def _minhash_static_cols() -> tuple:
    """The MinHash signature pipeline's Column expressions, built ONCE.

    Unresolved Columns are immutable name-bound trees, so they are safe
    to share across DataFrames — and building them is NOT free: every
    ``F.``-call is a py4j round trip and each higher-order lambda is a
    Python→Catalyst conversion, ~0.4 s per build for this pipeline.
    Query functions are re-invoked per run (bench reruns, composed
    pipelines like cc_clusters→consensus), so the construction cost is
    hoisted here and paid once per process."""
    th_expr = F.transform(tokens_col(), lambda t: poly_hash_col(t)).alias("th")
    sh_expr = shingle_hashes_from(F.col("th")).alias("sh")
    sig_cols = [
        F.when(F.size("sh") == 0, F.lit(P_MOD).cast("long"))
        .otherwise(
            F.array_min(F.transform("sh", lambda h: (F.lit(a) * h + F.lit(b)) % P_MOD))
        )
        .alias(f"mh{j}")
        for j, (a, b) in enumerate(HASH_AB)
    ]
    bucket_arr = F.array(
        *[
            F.concat_ws(
                "_",
                *[
                    F.col(f"mh{band * ROWS_PER_BAND + r}").cast("string")
                    for r in range(ROWS_PER_BAND)
                ],
            )
            for band in range(N_BANDS)
        ]
    )
    return th_expr, sh_expr, sig_cols, bucket_arr


def _minhash_signatures_jvm(d: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh11): token char-fold poly hash → shingle combine →
    12 affine min-hashes, as JVM expressions. The higher-order-function
    lambdas evaluate interpreted per array element (HOFs sit outside
    whole-stage codegen) — measured ~0.5 s of the dedup stage at
    sf0.1/local[32] — but this is still the right arm HERE:

    - r12 rejected an Arrow token-hash kernel (JVM fold 0.21 s vs kernel
      0.44 s at 32-way — dispatch dominated the one step it replaced);
    - r13 re-adjudicated with a WHOLE-pipeline vectorized numpy kernel
      (tools/ab_minhash_kernel.py, equality-gated row-identical): the
      kernel computes a 5000-doc batch in 0.17 s single-threaded, yet
      LOSES end-to-end — noop-timed dedup_minhash_lsh medians 1.486 s
      (kernel) vs 1.256 s (JVM) at local[32], 1.170 vs 1.158 at local[8],
      and on a 32×-inflated corpus (1.5 MB text/task) 11.2 s vs 2.6 s,
      degrading run-over-run. A trivial mapInArrow PASSTHROUGH costs
      ~1.7 s over the bare scan at 32 tasks in this sandbox: the
      JVM↔Python boundary (socket syscalls + fresh-page faults under the
      VM's lazily-faulted snapshot memory) prices every Arrow crossing
      at ~50 ms/task, so no kernel, however fast, can win until per-task
      payloads are orders of magnitude larger than this bench's. Keep
      the decision measurable with the A/B tool before flipping."""
    # materialize token hashes once per doc, then combine into shingle
    # hashes — two projection steps so nothing re-evaluates per element.
    th_expr, sh_expr, sig_cols, _ = _minhash_static_cols()
    th = d.select("doc_id", th_expr)
    sh = th.select("doc_id", sh_expr)
    return sh.select("doc_id", *sig_cols)


# hot-path binding (A/B-swappable; see tools/ab_minhash_kernel.py)
_minhash_signatures = _minhash_signatures_jvm


def minhash_band_buckets(d: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) rows for a frame with (doc_id, text):
    token polynomial hashes → 3-token shingle hashes → 12 affine
    min-hashes → 4 banded bucket keys, posexploded. Every step is a
    map-only projection, so this works identically on batch frames and
    Structured-Streaming frames (see streaming/corpus.py)."""
    _, _, _, bucket_arr = _minhash_static_cols()
    sig = _minhash_signatures(d)
    # all band buckets in ONE projection + posexplode: the signature
    # pipeline (token hash → shingle hash → 12 min-hashes) evaluates once
    # per document — a band-wise union would re-evaluate it per branch.
    return sig.select("doc_id", F.posexplode(bucket_arr).alias("band", "bucket"))


@lru_cache(maxsize=4)
def _pair_structs_col(a: str = "doc_a", b: str = "doc_b") -> Column:
    """All ordered in-array pairs of a sorted ``ids`` array as
    (a, b) structs — the bucket→pairs combination step shared by the
    MinHash, Jaccard inverted-index, and embedding-LSH pipelines.
    Cached: the nested HOF lambdas are the most py4j-expensive
    expression in the module."""
    return F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias(a), y.alias(b)),
            ),
        )
    )


def minhash_lsh_pairs(
    d: DataFrame,
    cap: int = BUCKET_CAP,
    max_splits: int = MAX_SPLITS,
    observation=None,
) -> DataFrame:
    """Candidate near-dup pairs for a (doc_id, text) frame via banded
    MinHash-LSH, with the pair stage bounded by a bucket-size cap.

    Buckets larger than ``cap`` are SALT-SPLIT, not skipped: each is
    partitioned into ``ceil(size/cap)`` deterministic sub-buckets (doc-id
    polynomial hash mod nsplit — the same arithmetic in the DuckDB
    oracle) and pairs are emitted within sub-buckets only. Per-bucket
    work stays O(cap·size) instead of O(size²), and recall on
    duplicate-heavy buckets survives: the docs in a signature-collision
    bucket are mutually similar, so same-sub-bucket pairs still link
    every doc into one cluster under connected components. Only buckets
    beyond ``cap·max_splits`` docs (boilerplate pathologies — exact
    duplicates belong to ``dedup_exact_hash`` upstream) are skipped.

    Scale shape: per-row bucket sizes come from a PARTITIONED window
    count over (band, bucket) — one exchange, spill-capable buffering —
    so no task ever materializes an unbounded bucket the way a
    collect-then-filter would, and the salted ``groupBy (band, bucket,
    salt)`` reuses that exchange (hash partitioning on a subset of the
    grouping keys already co-locates every group). Collected arrays are
    ≤ cap·max_splits elements by construction. ``observation`` (a
    pyspark ``Observation`` or a metric-name string) records split/skip
    accounting so production runs see the recall trade in the query
    metrics instead of silently losing it."""
    hard_cap = cap * max_splits
    # both window functions share ONE (partition, order) spec — the count
    # gets an explicit unbounded frame to keep whole-partition semantics —
    # so the plan sorts once and runs a single Window operator
    w = W.partitionBy("band", "bucket").orderBy("doc_id")
    pre = minhash_band_buckets(d).select(
        "doc_id",
        "band",
        "bucket",
        F.count(F.lit(1))
        .over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("sz"),
        # first-row indicator so observe can count BUCKETS from row-grain
        # metrics without a second aggregation pass
        (F.row_number().over(w) == 1).alias("rn1"),
    )
    if observation is not None:
        over = F.col("sz") > hard_cap
        split = (F.col("sz") > cap) & (F.col("sz") <= hard_cap)
        pre = pre.observe(
            observation,
            F.coalesce(
                F.sum((over & F.col("rn1")).cast("long")), F.lit(0).cast("long")
            ).alias("overflow_buckets"),
            F.coalesce(
                F.sum(over.cast("long")), F.lit(0).cast("long")
            ).alias("overflow_docs"),
            F.coalesce(
                F.sum((split & F.col("rn1")).cast("long")), F.lit(0).cast("long")
            ).alias("split_buckets"),
            F.coalesce(
                F.sum(split.cast("long")), F.lit(0).cast("long")
            ).alias("split_docs"),
        )
    salted = (
        pre.filter((F.col("sz") >= 2) & (F.col("sz") <= hard_cap))
        .withColumn("nsplit", F.expr(f"(sz + {cap - 1}) div {cap}"))
        .withColumn(
            "salt",
            poly_hash_col(F.col("doc_id").cast("string")) % F.col("nsplit"),
        )
    )
    grouped = (
        salted.groupBy("band", "bucket", "salt")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    raw = grouped.select("band", F.explode(_pair_structs_col()).alias("p")).select(
        "band", "p.doc_a", "p.doc_b"
    )
    # (doc_a, doc_b, band) is UNIQUE in the raw stream: a document has
    # exactly one bucket (and one salt) per band, so a pair can co-occur
    # at most once per band — plain count equals count-distinct, and
    # dropping the distinct-expand saves an entire exchange round.
    return raw.groupBy("doc_a", "doc_b").agg(
        F.count("band").alias("n_bands_shared")
    )


@register("dedup_minhash_lsh", _MINHASH_SQL)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH candidate pairs: shingle → polynomial hash →
    12 affine min-hashes → 4 bands of 3 → bucket equi-join. Signature
    computation is map-only; the pair stage shuffles on the band-bucket
    key. Mega-buckets (> BUCKET_CAP docs) are salt-split into bounded
    sub-buckets with split/skip accounting — see minhash_lsh_pairs.
    ``fan_out`` spreads the signature projection when the scan
    under-splits (one small parquet here; measured −38% on the pair
    stage at sf0.1) and is a no-op on a well-split production scan."""
    d = fan_out(load(spark, sf_dir, "documents"))
    return minhash_lsh_pairs(d, observation="minhash_lsh_overflow")


def _simhash_sql(bits: int = 16) -> str:
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    combine = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST(1 AS BIGINT) << {b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
      WITH tok AS (
        SELECT doc_id, UNNEST(list_transform({_sql_tokens('text')},
                              t -> {_sql_poly_hash('t')})) AS th
        FROM documents),
      bitsums AS (SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id)
      SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM bitsums
    """


@lru_cache(maxsize=1)
def _simhash_static_cols(bits: int = 16) -> tuple:
    """SimHash's static expressions, built once (same py4j-cost rationale
    as ``_minhash_static_cols``)."""
    tok_expr = F.explode(
        F.transform(tokens_col(), lambda t: poly_hash_col(t))
    ).alias("th")
    bit_sums = tuple(
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    )
    combine = None
    for b in range(bits):
        term = F.when(
            F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        combine = term if combine is None else (combine + term)
    return tok_expr, bit_sums, combine.cast("long").alias("simhash")


@register("dedup_simhash", _simhash_sql())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: token polynomial hashes vote ±1 per bit;
    the signature packs the sign bits. Map-only + one per-doc aggregation."""
    tok_expr, bit_sums, simhash = _simhash_static_cols()
    d = load(spark, sf_dir, "documents")
    sums = d.select("doc_id", tok_expr).groupBy("doc_id").agg(*bit_sums)
    return sums.select("doc_id", simhash)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@register(
    "text_token_stats",
    f"""
    SELECT doc_id, n_tokens, n_chars_measured, n_distinct_tokens,
           CAST((2 * n_distinct_tokens * 1000000 + n_tokens)
                // (2 * n_tokens) AS BIGINT) / 1000000.0 AS distinct_ratio
    FROM (
      SELECT doc_id,
             CAST(len({_sql_tokens('text')}) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars_measured,
             CAST(len(list_distinct({_sql_tokens('text')})) AS BIGINT)
                 AS n_distinct_tokens
      FROM documents)
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + type/token ratio — all JVM expressions; the
    ratio rounds in exact BIGINT half-up (round(int/int, 6) is the
    2^a·5^b boundary cousin — review r8)."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_chars_measured",
        "n_distinct_tokens",
        half_up_ratio("n_distinct_tokens", "n_tokens", 6).alias(
            "distinct_ratio"
        ),
    )


_SW_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@register(
    "text_quality_score",
    f"""
    SELECT doc_id,
           CAST((2 * nsw * 1000000 + ntok) // (2 * ntok) AS BIGINT)
               / 1000000.0 AS stopword_ratio,
           CAST((2 * nch * 1000000 + ntok) // (2 * ntok) AS BIGINT)
               / 1000000.0 AS avg_token_span,
           CASE WHEN ntok BETWEEN 20 AND 120
                 AND CAST(nsw AS DOUBLE) / ntok >= 0.05
                THEN 'keep' ELSE 'flag' END AS quality_bucket
    FROM (
      SELECT doc_id,
             CAST(len({_sql_tokens('text')}) AS BIGINT) AS ntok,
             CAST(len(list_filter({_sql_tokens('text')},
                  t -> list_contains({_SW_LIST_SQL}, t))) AS BIGINT) AS nsw,
             CAST(length(text) AS BIGINT) AS nch
      FROM documents)
    """,
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + length gates → keep/flag buckets
    (the classic pretraining-corpus filter shape). Emitted ratios round
    in exact BIGINT half-up (the int/int boundary cousin); the bucket
    threshold compares the RAW ratio, which is engine-identical as one
    IEEE division of identical integers."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    mid = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("ntok"),
        n_sw.cast("bigint").alias("nsw"),
        F.length("text").cast("bigint").alias("nch"),
    )
    keep = (
        (F.col("ntok") >= 20)
        & (F.col("ntok") <= 120)
        & (F.col("nsw").cast("double") / F.col("ntok") >= 0.05)
    )
    return mid.select(
        "doc_id",
        half_up_ratio("nsw", "ntok", 6).alias("stopword_ratio"),
        half_up_ratio("nch", "ntok", 6).alias("avg_token_span"),
        F.when(keep, "keep").otherwise("flag").alias("quality_bucket"),
    )


_LANG_MARKERS = {
    "en": ("the", "a", "is"),
    "es": ("el", "la", "es"),
    "fr": ("le", "la", "est"),
    "de": ("der", "die", "ist"),
}


def _lang_score_sql(lang: str) -> str:
    words = "[" + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang]) + "]"
    return (
        f"CAST(len(list_filter({_sql_tokens('text')}, "
        f"t -> list_contains({words}, t))) AS BIGINT)"
    )


@register(
    "text_lang_id",
    f"""
    SELECT doc_id,
           {_lang_score_sql('en')} AS score_en,
           {_lang_score_sql('es')} AS score_es,
           CASE WHEN {_lang_score_sql('en')} >= {_lang_score_sql('es')}
                THEN 'en' ELSE 'es' END AS lang_guess
    FROM documents
    """,
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (deterministic argmax over marker
    counts; the oracle checks the computation, not ground truth)."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()

    def score(lang: str) -> Column:
        words = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(words, t))).cast(
            "bigint"
        )

    return d.select(
        "doc_id",
        score("en").alias("score_en"),
        score("es").alias("score_es"),
        F.when(score("en") >= score("es"), "en").otherwise("es").alias("lang_guess"),
    )


@register(
    "text_fingerprint",
    f"""
    SELECT doc_id, {_sql_poly_hash('text')} AS fingerprint,
           {_sql_poly_hash("lower(text)")} AS fingerprint_normalized
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: rolling polynomial hash of the raw and
    case-normalized text."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        poly_hash_col(F.col("text")).alias("fingerprint"),
        poly_hash_col(F.lower(F.col("text"))).alias("fingerprint_normalized"),
    )


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------

@register(
    "knn_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT q.qid, e.vec_id,
             round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) AS cosine
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY cosine DESC, vec_id) AS rk
      FROM scored)
    SELECT qid, vec_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 10
    """,
)
def q_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (tiny) query set, map-side
    dot products via zip_with/aggregate, then a rank-limited top-k per
    query (_topk_per_query — the per-qid window never sorts the whole
    scored corpus). This is the exact baseline the IVF/LSH/SQ8/PQ variants
    approximate."""
    e = load(spark, sf_dir, "embeddings")
    # norms once per vector (corpus side) and once per query — the old
    # inline form recomputed the query norm for every corpus row
    ev = e.select(
        "vec_id", "embedding", _norm_col(F.col("embedding")).alias("enorm")
    )
    q = ev.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"),
        F.col("enorm").alias("qnorm"),
    )
    joined = ev.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    scored = joined.select(
        "qid", "vec_id",
        pair_cosine_udf(4)("embedding", "qv", "enorm", "qnorm").alias("cosine"),
    )
    topk = _topk_per_query(scored, 10, [F.desc("cosine"), F.asc("vec_id")])
    return topk.select(
        "qid", "vec_id", "cosine", F.col("prk").cast("bigint").alias("rk")
    )


@register(
    "embedding_label_centroids",
    """
    WITH expl AS (
      SELECT label, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings)
    SELECT label, CAST(dim AS INT) AS dim, round(AVG(v), 6) AS centroid
    FROM expl WHERE dim <= 8 GROUP BY label, dim
    """,
)
def q_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors via positional explode + groupBy — the
    k-means-style reduction over array columns."""
    e = load(spark, sf_dir, "embeddings")
    expl = e.select(
        "label", F.posexplode("embedding").alias("dim0", "v")
    ).withColumn("dim", (F.col("dim0") + 1).cast("int"))
    return (
        expl.filter(F.col("dim") <= 8)
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"))
    )


# ---------------------------------------------------------------------------
# ANN: random-hyperplane LSH buckets (the scale path over brute force)
# ---------------------------------------------------------------------------

N_TABLES = 6   # independent LSH tables for the ANN query (multi-probe recall)
PLANES_PER_TABLE = 4
DIM = 64
# Bucket-depth adaptivity for the embedding near-dup query: per-table
# buckets can deepen from PLANES_PER_TABLE up to MAX_BITS sign bits. The
# deepening planes draw FRESH coefficient rows past the low-bit block, so
# the low PLANES_PER_TABLE bits — and therefore every ANN query's bucket
# ids — are unchanged at any depth.
#
# r10 re-tuning (VERDICT r9 #2 — the tail-segment falsification CONFIRMED
# the trap): the old 8-bit ladder bottomed out by sf0.3x, after which
# candidate pairs grow as n²/cells over a FIXED 6·2⁸ = 1,536 cells
# (measured: 54k → 485k → 5.39M pairs at sf0.1/0.3x/1.0x — pairs/vec
# 27 → 81 → 269 against the 32 target; the ~1.44 tail-segment exponent
# was the onset of that quadratic). The ladder now runs to 14 bits, and
# the near-dup path uses N_TABLES_DEDUP = 12 tables because depth and
# table count trade off against RECALL: per-table collision for a
# true pair at angle θ is (1-θ/π)^depth, so at the production τ≈0.9
# (θ≈25.8°, p≈0.856) the modeled candidate recall 1-(1-p^k)^L is
#   depth  8: 0.983   depth 12: 0.867   depth 14: 0.765   (L = 12)
# versus 0.64 at depth 12 with the old L = 6. Beyond depth 14 hold a
# recall target R by growing tables as L ≈ ln(1-R)/ln(1-p^k) — the
# standard LSH frontier; both constants are module-level and every
# consumer (Arrow kernel, Spark fold, DuckDB oracle) regenerates from
# them.
#
# r12 SCALE-AWARE LADDER (VERDICT r11 #1 — the committed SCALING_r11
# tau probe measured segment exponent 1.753 sf1.0x→sf2.0x with the
# probe pinned at the old 14-bit cap at BOTH scales: a capped ladder
# makes candidate pairs grow as n²/cells again, the exact trap the r10
# re-tuning fixed one tier down). The ladder now runs past the 14-bit
# recall design point to MAX_BITS = 18, and recall is HELD at the
# design value R ≈ 0.766 by growing the table count along the frontier
# L(k) = ceil(ln(1-R)/ln(1-p^k)) — TABLES_FOR_DEPTH below, computed at
# import so the Arrow kernel, the Spark fold and the DuckDB oracle all
# inline the same integers (12 tables through depth 14 — the historical
# behavior, bit-identical — then 17 at depth 16 and 23 at depth 18).
# Frontier tables past the base 12 cost extra bucket-kernel work and
# extra candidate volume ONLY when the occupancy probe actually deepens
# past 14, i.e. only on corpora whose size demands it; the probe itself
# always runs over the base tables so the depth choice is
# table-count-independent. At genuine 100 TB (≳2^20 vectors/partition
# of near-dup scope) raise MAX_BITS further — the frontier formula and
# the layered plane layout extend without moving any existing plane.
N_TABLES_DEDUP = 12
BASE_BITS = 14  # the L=12 recall design point (the pre-r12 ladder cap)
EXTRA_PLANES = BASE_BITS - PLANES_PER_TABLE
MAX_BITS = 18
# 1-bit rungs above the design point: the probe picks the shallowest
# rung whose estimated pairs fit the linear 32·n envelope, so between
# rungs candidate count grows as n²/cells — 2-bit spacing lets it swing
# 4× between doubling scales (the residual superlinearity SCALING_r11
# measured INSIDE the envelope); 1-bit spacing halves the swing at the
# cost of two more (trivial) probe re-aggregations
DEPTH_LADDER = (PLANES_PER_TABLE, 6, 8, 10, 12, BASE_BITS, 15, 16, 17, MAX_BITS)
TARGET_PAIRS_PER_VEC = 32  # occupancy probe target: mean candidate pairs/vector

# LSH frontier: per-plane collision probability for a true pair at the
# production threshold τ=0.9 and the recall achieved by the (depth 14,
# L 12) design point; deeper rungs grow L to hold that recall.
_P_DESIGN = 1.0 - math.acos(0.9) / math.pi            # ≈ 0.8564
_RECALL_DESIGN = 1.0 - (1.0 - _P_DESIGN**BASE_BITS) ** N_TABLES_DEDUP
TABLES_FOR_DEPTH: dict[int, int] = {
    d: (
        N_TABLES_DEDUP
        if d <= BASE_BITS
        else max(
            N_TABLES_DEDUP,
            math.ceil(
                math.log1p(-_RECALL_DESIGN) / math.log1p(-(_P_DESIGN**d))
            ),
        )
    )
    for d in DEPTH_LADDER
}
MAX_TABLES = TABLES_FOR_DEPTH[MAX_BITS]

# Layered coefficient-row layout: every historical plane keeps its
# pre-r12 index — low bits (j < 4) for the base tables first, then the
# r10 deepening block (4 ≤ j < 14), then the r12 deep block
# (14 ≤ j < 18), then all planes of the frontier extra tables. Deepening
# the ladder or growing tables therefore never moves an existing
# hyperplane: ANN bucket ids (bits 0..3, tables 0..5) and every
# previously-probed depth's buckets are bit-identical to r10/r11.
_LOW_BLOCK = N_TABLES_DEDUP * PLANES_PER_TABLE
_MID_BLOCK = _LOW_BLOCK + N_TABLES_DEDUP * EXTRA_PLANES
_DEEP_BLOCK = _MID_BLOCK + N_TABLES_DEDUP * (MAX_BITS - BASE_BITS)


def _plane_index(table_no: int, j: int) -> int:
    """Global coefficient-row index for sign bit ``j`` of LSH table
    ``table_no``. Bits below PLANES_PER_TABLE keep the original contiguous
    layout — tables 0..5 bits 0..3 are rows 0..23 exactly as before the
    r10 re-tuning, so the ANN query's bucket ids are untouched; deepening
    bits allocate fresh rows after the low-bit block of all
    N_TABLES_DEDUP tables (r10 block for bits 4..13, r12 block for bits
    14..17), and the frontier extra tables (table_no ≥ 12) allocate all
    their planes after every base-table row."""
    if table_no < N_TABLES_DEDUP:
        if j < PLANES_PER_TABLE:
            return table_no * PLANES_PER_TABLE + j
        if j < BASE_BITS:
            return _LOW_BLOCK + table_no * EXTRA_PLANES + (j - PLANES_PER_TABLE)
        return _MID_BLOCK + table_no * (MAX_BITS - BASE_BITS) + (j - BASE_BITS)
    return _DEEP_BLOCK + (table_no - N_TABLES_DEDUP) * MAX_BITS + j


def _plane_coef(j: int, d: int) -> int:
    """Deterministic integer hyperplane coefficients in [-3, 3], shared
    with the oracle (the values are inlined as literals on both sides,
    so any Python-computable hash works). Mixed with an avalanche hash:
    a LINEAR form like ``(j*31 + d*17) % 7`` makes plane j's coefficient
    row depend only on ``j mod 7`` — 24 nominal planes collapse to 7
    distinct hyperplanes and the "independent" LSH tables correlate,
    which measured out at ~0.45 near-dup recall vs brute force. The
    hashed planes restore the (1-θ/π)^k per-table collision model:
    measured near-dup recall at τ=0.35 goes 0.45 → 0.63 (theory: 0.60
    for pairs exactly at the threshold angle; ~0.99 at production
    τ≈0.9). |coef| ≤ 3 keeps every
    float32-embedding × coef product exact in double (the Arrow kernel's
    bit-identity argument)."""
    x = (j * 2654435761 + d * 40503) & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 2246822519) & 0xFFFFFFFF
    x ^= x >> 13
    return (x % 7) - 3


def _sql_bucket(table_no: int, col: str = "embedding", bits: int = PLANES_PER_TABLE) -> str:
    """Bucket id for one LSH table as a DuckDB expression. The projection
    is ``list_dot_product(CAST(emb AS DOUBLE[]), <coef literal>)`` — a
    flat list literal instead of the old 64-term unrolled ``CAST*+``
    chain (r12: the unrolled form's depth-64 AST made DuckDB's binder
    superlinear once the frontier tables grew the oracle past 400
    planes; the list form binds ~12× faster). Bit-identity is preserved:
    ``list_dot_product`` accumulates strictly left-to-right, matching
    the Arrow kernel's ``np.cumsum`` and the Spark ``aggregate`` fold —
    pinned over every plane family by
    tests/test_multimodal_llm.py::test_duckdb_list_dot_bit_identity."""
    terms = " + ".join(
        "(CASE WHEN round(list_dot_product(CAST("
        + col
        + " AS DOUBLE[]), ["
        + ",".join(
            str(float(_plane_coef(_plane_index(table_no, j), d)))
            for d in range(1, DIM + 1)
        )
        + f"]::DOUBLE[]), 6) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return f"CAST({terms} AS BIGINT)"


def _plane_array(table_no: int, j: int) -> Column:
    return F.array(
        *[
            F.lit(float(_plane_coef(_plane_index(table_no, j), d)))
            for d in range(1, DIM + 1)
        ]
    )


def bucket_col(table_no: int, col: str = "embedding", bits: int = PLANES_PER_TABLE) -> Column:
    """Spark twin of :func:`_sql_bucket`: sign bits of the hyperplane
    projections packed into a per-table bucket id. Projections run as
    ``zip_with``+``aggregate`` loops over coefficient array literals —
    loop-based codegen instead of a 64-term unrolled expression tree."""
    emb = F.col(col)
    total = None
    for j in range(bits):
        dot = F.aggregate(
            F.zip_with(emb, _plane_array(table_no, j), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(F.round(dot, 6) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        total = bit if total is None else total + bit
    return total.cast("bigint")


def _buckets_udf(
    bits: int = PLANES_PER_TABLE, n_tables: int = N_TABLES, first_table: int = 0
):
    """Arrow-batched kernel computing bucket ids for tables
    ``first_table .. n_tables-1`` per vector, ``bits`` sign bits per
    table. 3× faster than the JVM
    higher-order-function fold (the multiply-adds interpret per element
    in HOF lambdas; numpy vectorizes them), and bit-identical to it: each
    embedding×coefficient product is EXACT in double (24-bit float32
    mantissa × |coef| ≤ 3 stays under 53 bits), so only addition order can
    round — and ``np.cumsum`` forces the same left-fold order as
    ``F.aggregate`` and the oracle's left-associated ``+`` chain (np.sum's
    pairwise order would not). Equivalence to :func:`bucket_col` is pinned
    by a test at both PLANES_PER_TABLE and MAX_BITS depths.
    ``first_table`` lets the frontier path compute ONLY the extra tables
    the probed depth demands — the base-table bands are already
    checkpointed by then."""
    from pyspark.sql.functions import pandas_udf

    tables = range(first_table, n_tables)
    coef = np.array(
        [
            [float(_plane_coef(_plane_index(t, j), d)) for d in range(1, DIM + 1)]
            for t in tables
            for j in range(bits)
        ]
    )
    weights = np.array([1 << j for j in range(bits)], dtype=np.int64)
    n_out = len(tables)

    @pandas_udf("array<long>")
    def buckets_udf(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)  # np.stack raises on empty
        E = np.stack(emb.values).astype(np.float64)
        # Sequential left-fold accumulated per DIMENSION: acc_d =
        # acc_{d-1} + E[:, d]·coef[:, d] runs the SAME additions in the
        # SAME order as the old cumsum form (and as F.aggregate / the
        # oracle's left-associated chain), so the dots are bit-identical
        # — but the [batch, planes, DIM] float64 intermediate the cumsum
        # materialized (≈ batch·planes·8·DIM bytes; >1 GB per 10k-row
        # batch at the 216-plane dedup depth) shrinks to one
        # [batch, planes] accumulator, ~DIM× less memory traffic
        # (guide §4.2 — batch kernels should be vectorized AND bounded).
        coefT = np.ascontiguousarray(coef.T)         # [DIM, planes]
        dots = E[:, 0, None] * coefT[0][None, :]     # exact products, d = 0
        for dd in range(1, E.shape[1]):
            dots += E[:, dd, None] * coefT[dd][None, :]
        signs = (np.round(dots, 6) > 0).astype(np.int64)
        b = signs.reshape(len(E), n_out, bits) @ weights
        return pd.Series(list(b))

    # deterministic in fact, but the flag stops Catalyst inlining the
    # aliased column into downstream predicates and running the Arrow
    # kernel once per reference (same reasoning as the pair-cosine UDF)
    return buckets_udf.asNondeterministic()


def banded_embeddings(
    e: DataFrame,
    bits: int = PLANES_PER_TABLE,
    n_tables: int = N_TABLES,
    first_table: int = 0,
) -> DataFrame:
    """One row per (vector, LSH table): all ``first_table..n_tables-1``
    bucket ids computed
    in a single Arrow-batched projection (:func:`_buckets_udf`), then
    ``posexplode`` into (tbl, bucket) rows. One scan and one Python eval
    stage instead of an n_tables-way union — the union form would run the
    kernel once per branch."""
    withb = e.select(
        "vec_id", "embedding",
        _buckets_udf(bits, n_tables, first_table)("embedding").alias("bk"),
    )
    return withb.select(
        "vec_id",
        "embedding",
        F.posexplode("bk").alias("tbl0", "bucket"),
    ).select(
        "vec_id",
        "embedding",
        (F.col("tbl0") + F.lit(first_table)).alias("tbl"),
        "bucket",
    )


COSINE_DUP_TAU = 0.35  # synthetic embeddings top out ~0.51; production ~0.9


def pair_cosine_udf(decimals: int):
    """Shared Arrow-batched pairwise-cosine kernel:
    ``(vec_a, vec_b, norm_a, norm_b) -> round(cos, decimals)``. ~2×
    faster than the JVM ``zip_with``+``aggregate`` fold (dense vector
    math vectorizes in numpy; HOF lambdas interpret per element) and
    agreement-safe against the oracle: ``np.cumsum`` reproduces the
    sequential left-fold accumulation order, and at the 4/6 dp rounding
    the engines' remaining last-ulp sum-order noise is invisible.
    Marked nondeterministic so Catalyst pins ONE evaluation feeding both
    downstream filters and the output instead of inlining the expression
    into each consumer (two ArrowEvalPython nodes)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cosp(
        va: pd.Series, vb: pd.Series, na: pd.Series, nb: pd.Series
    ) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")  # np.stack raises on empty
        A = np.stack(va.values).astype(np.float64)
        B = np.stack(vb.values).astype(np.float64)
        dots = np.cumsum(A * B, axis=1)[:, -1]
        return pd.Series(np.round(dots / (na.values * nb.values), decimals))

    return cosp.asNondeterministic()


def int_dot_udf():
    """Arrow-batched exact integer dot product over two code arrays:
    ``(codes_a, codes_b) -> Σ a_d·b_d`` as BIGINT. Same numpy-vs-JVM
    rationale as :func:`pair_cosine_udf` (dense vector math vectorizes;
    the zip_with+aggregate fold interprets per element — measured ~25%
    off the IVF store's quantized-prefilter stage at 1.6M candidate
    rows), but WITHOUT any rounding discipline to manage: integer
    addition is order-independent, so the kernel is bit-identical to
    the JVM fold and the DuckDB SUM by construction (pinned in
    tests/test_ann_store.py). Magnitude bound: |codes| ≤ 127, so a
    64-dim dot is ≤ 64·127² ≈ 1.03e6 — int64 never saturates.
    Nondeterministic mark for the same single-evaluation reason as the
    cosine kernel."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def idot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="int64")  # np.stack raises on empty
        A = np.stack(a.values).astype(np.int64)
        B = np.stack(b.values).astype(np.int64)
        return pd.Series((A * B).sum(axis=1))

    return idot.asNondeterministic()


def adaptive_bucket_mask(
    bands: DataFrame, target_pairs_per_vec: int = TARGET_PAIRS_PER_VEC
) -> int:
    """Choose the SHALLOWEST ``DEPTH_LADDER`` bucket depth whose estimated
    candidate-pair count (Σ k·(k-1)/2 over buckets) stays within
    ``target_pairs_per_vec`` per vector, given a full-depth (MAX_BITS)
    (vec_id, tbl, bucket) frame. Returns the chosen bit mask.

    A fixed bucket width is data-blind: 4-bit buckets on a low-cosine-
    spread corpus produced ~650k candidate pairs from 2k vectors, while
    deep buckets on a well-spread corpus would cost recall for nothing.
    The probe is fully DISTRIBUTED (r10 — the old form collected the
    full-depth bucket-count table to the driver, fine at 2^8 buckets but
    not a driver scalar once the ladder runs to 2^MAX_BITS): one
    aggregation to per-cell counts, then one tiny re-aggregation per
    ladder rung over that already-aggregated frame; only ONE number per
    rung ever reaches the driver. Estimates accumulate in DECIMAL(38,0)
    — at 100 TB a single hot cell's k·(k-1)/2 alone can pass 2⁶³, and
    ANSI mode would abort a BIGINT sum (same discipline as
    ``sum_units_wide``). Deterministic integer arithmetic throughout,
    mirrored verbatim in the DuckDB oracle's ``pick`` CTE. Corpora that
    are genuinely duplicate-heavy bottom out at the deepest depth with
    exactly the pair count their duplicate structure demands."""
    cnt = bands.groupBy("tbl", "bucket").agg(F.count(F.lit(1)).alias("c"))
    # ONE probe job (r14 — guide §1.2/§5): the former scheme materialized
    # cnt (one job), collected the corpus stats (one job), then walked the
    # ladder with one sequential driver round-trip PER RUNG — up to 11
    # jobs before any pair work starts, and at 100 TB up to 10 re-reads
    # of the cell-count frame. Exploding each cell row to every rung and
    # re-aggregating per (depth, tbl, masked bucket) computes every
    # rung's estimate AND the stats in a single pass; the rung sums are
    # integer/decimal arithmetic identical to the per-rung form, so the
    # shallowest-depth choice is unchanged. The explode is over the
    # ALREADY-aggregated cell counts (≤ |cells| rows), never the corpus.
    k = F.col("k").cast("decimal(38,0)")
    per_rung = (
        cnt.select(
            "tbl",
            "bucket",
            "c",
            F.explode(F.array(*[F.lit(d) for d in DEPTH_LADDER])).alias("depth"),
        )
        .groupBy(
            "depth",
            "tbl",
            # mask = 2^depth - 1, depth ≤ MAX_BITS so int arithmetic
            F.col("bucket").bitwiseAND(F.expr("shiftleft(1, depth) - 1")).alias("b"),
        )
        .agg(F.sum("c").alias("k"))
        .groupBy("depth")
        .agg(
            F.sum(k * (k - 1) / 2).alias("est"),
            F.sum("k").alias("total"),
            F.countDistinct("tbl").alias("L"),
        )
        .collect()
    )
    rows = {int(r["depth"]): r for r in per_rung}
    if not rows:
        return (1 << MAX_BITS) - 1  # empty corpus: same terminal mask as before
    any_row = rows[next(iter(rows))]
    n = int(any_row["total"] or 0) // max(int(any_row["L"] or 1), 1)
    target = target_pairs_per_vec * max(n, 1)
    for depth in DEPTH_LADDER:
        est = rows[depth]["est"] if depth in rows else None
        if est is not None and int(est) <= target:
            return (1 << depth) - 1
    return (1 << MAX_BITS) - 1


def _emb_dup_sql() -> str:
    """Oracle for the adaptive-depth embedding near-dup: buckets at full
    MAX_BITS depth, the same occupancy-probe depth choice as
    :func:`adaptive_bucket_mask` expressed as CTEs, then SALT-SPLIT
    masked cells (the identical vec-id polynomial-hash sub-cell
    arithmetic as the Spark side and the minhash oracle), candidate
    pairs within sub-cells, and exact cosine ≥ τ. Frontier extra tables
    (r12): each table past the base N_TABLES_DEDUP is a union branch
    guarded on the picked mask — DuckDB evaluates its bucket expression
    only when the probe actually chose the depth whose
    TABLES_FOR_DEPTH demands that table, exactly mirroring the Spark
    path's lazy extra-table build."""
    b_union = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, "
        f"{_sql_bucket(t, bits=MAX_BITS)} AS bucket FROM embeddings"
        for t in range(N_TABLES_DEDUP)
    )

    def _guard(t: int) -> int:
        # smallest ladder mask at which extra table t participates
        d = min(d for d in DEPTH_LADDER if TABLES_FOR_DEPTH[d] > t)
        return (1 << d) - 1

    bx_union = " UNION ALL ".join(
        f"SELECT e.vec_id, e.embedding, {t} AS tbl, "
        f"{_sql_bucket(t, col='e.embedding', bits=MAX_BITS)} AS bucket "
        f"FROM embeddings e, pick p WHERE p.mask >= {_guard(t)}"
        for t in range(N_TABLES_DEDUP, MAX_TABLES)
    )

    def est(mask: int) -> str:
        return (
            f"(SELECT CAST(SUM(k*(k-1)//2) AS BIGINT) FROM "
            f"(SELECT CAST(SUM(c) AS BIGINT) AS k FROM cnt "
            f"GROUP BY tbl, bucket & {mask}))"
        )

    masks = [(1 << d) - 1 for d in DEPTH_LADDER]
    est_cols = ", ".join(f"{est(m)} AS est{i}" for i, m in enumerate(masks[:-1]))
    cases = " ".join(
        f"WHEN est{i} <= {TARGET_PAIRS_PER_VEC} * n THEN {m}"
        for i, m in enumerate(masks[:-1])
    )
    # MATERIALIZED hints: DuckDB inlines CTEs by default, and every one
    # of the frontier bx branches references pick → cnt → b — without
    # materialization the binder re-binds the 12 full-depth bucket
    # expressions once per branch (measured: minutes of bind time;
    # materialized: ~1 s)
    return f"""
    WITH b AS MATERIALIZED ({b_union}),
    cnt AS MATERIALIZED (SELECT tbl, bucket, CAST(COUNT(*) AS BIGINT) AS c
            FROM b GROUP BY tbl, bucket),
    pick AS MATERIALIZED (
      SELECT CASE {cases} ELSE {masks[-1]} END AS mask
      FROM (SELECT {est_cols},
                   (SELECT CAST(SUM(c) AS BIGINT) FROM cnt) // {N_TABLES_DEDUP} AS n)
    ),
    bx AS ({bx_union}),
    mb AS (
      SELECT b.vec_id, b.embedding, b.tbl, b.bucket & p.mask AS bucket
      FROM (SELECT * FROM b UNION ALL SELECT * FROM bx) b, pick p),
    sz AS (
      SELECT tbl, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM mb
      GROUP BY tbl, bucket
      HAVING COUNT(*) BETWEEN 2 AND {BUCKET_CAP * MAX_SPLITS}),
    salted AS (
      SELECT m.vec_id, m.embedding, m.tbl, m.bucket,
             {_sql_poly_hash("CAST(m.vec_id AS VARCHAR)")}
               % ((s.c + {BUCKET_CAP - 1}) // {BUCKET_CAP}) AS salt
      FROM mb m JOIN sz s USING (tbl, bucket)),
    cand AS (
      SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b,
             x.embedding AS ea, y.embedding AS eb
      FROM salted x JOIN salted y
        ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.salt = y.salt
           AND x.vec_id < y.vec_id),
    scored AS (
      SELECT vec_a, vec_b,
             round(list_cosine_similarity(CAST(ea AS DOUBLE[]), CAST(eb AS DOUBLE[])), 4) AS cosine
      FROM cand)
    SELECT vec_a, vec_b, cosine
    FROM scored WHERE cosine >= {COSINE_DUP_TAU}
"""


_EMB_DUP_SQL = _emb_dup_sql()


@register("dedup_embedding_cosine", _EMB_DUP_SQL)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: candidate pairs = vectors sharing a
    random-hyperplane LSH bucket in any of the 6 tables (the same
    deterministic planes as the ANN query in their low 4 bits), then
    exact cosine ≥ τ on candidates only. At 100 TB the bucket equi-join
    bounds the pair count — the N² cross join never materializes; bucket
    skew is handled by AQE skew-join since each (tbl, bucket) cell is an
    independent unit of work, and duplicate-heavy mega-cells past
    BUCKET_CAP salt-split into bounded sub-cells (r10 — the same
    backstop as the minhash pipeline, for the corpora that bottom out
    the depth ladder).

    Bucket DEPTH is adaptive: buckets are computed once at MAX_BITS
    depth over N_TABLES_DEDUP tables, a fully distributed occupancy
    probe (one scalar per ladder rung reaches the driver) picks the
    shallowest DEPTH_LADDER depth whose estimated pair count stays
    near-linear, and candidates group on the masked bucket — see
    :func:`adaptive_bucket_mask` and the ladder/recall tuning note on
    the constants. The full-depth bands are
    ``localCheckpoint``ed (id + bucket only, O(n) compact rows) so the
    Arrow bucket kernel runs over the corpus exactly once for both the
    probe and the pair stage.

    Execution shape: the bucket self-join and the pair ``distinct`` carry
    only (vec_id, vec_id) — never the 64-float arrays — so the dedup
    shuffle moves 16-byte rows. Vectors and their (precomputed, once per
    vector) norms are joined back onto the surviving distinct pairs. The
    per-pair dot product is the one place an Arrow-batched Pandas UDF
    beats the JVM higher-order functions (~2× measured: dense vector math
    vectorizes in numpy, while aggregate/zip_with interprets per element);
    ``cumsum`` keeps the accumulation order identical to the engine fold
    and the DuckDB oracle so the 4-decimal rounding never diverges."""
    return dedup_embedding_cosine_frame(
        spark, load(spark, sf_dir, "embeddings")
    )


def dedup_embedding_cosine_frame(
    spark: SparkSession, e: DataFrame, tau: float = COSINE_DUP_TAU
) -> DataFrame:
    """Plan builder behind `dedup_embedding_cosine`, parametrized on the
    similarity threshold τ so the scaling sweep can measure the SAME
    candidate machinery at the production threshold (τ≈0.9) as well as
    the deliberately-low synthetic one (τ=0.35, whose quadratic OUTPUT
    tail is the documented superlinear flag — PERF_NOTES). τ only moves
    the final filter: bucket index, candidate pairs, and cosine scoring
    are byte-identical across thresholds, which is exactly what makes
    the τ≈0.9 run a falsification test for 'the tail is output, not
    machinery'."""

    def _build_index() -> tuple:
        base = (
            banded_embeddings(e, bits=MAX_BITS, n_tables=N_TABLES_DEDUP)
            .select("vec_id", "tbl", "bucket")
            .localCheckpoint()
        )
        # occupancy probe over the BASE tables only — the depth choice is
        # table-count-independent, so probing and table growth never feed
        # back into each other (the oracle's pick CTE mirrors this)
        mask = adaptive_bucket_mask(base)
        n_tables = TABLES_FOR_DEPTH[mask.bit_length()]
        if n_tables <= N_TABLES_DEDUP:
            return base, mask
        # the probe deepened past the L=12 recall design point: grow the
        # table count along the LSH frontier to hold recall — only the
        # EXTRA tables' buckets are computed here (one more Arrow pass
        # over the corpus), and only on corpora whose occupancy demanded
        # the deeper rung
        extra = banded_embeddings(
            e, bits=MAX_BITS, n_tables=n_tables, first_table=N_TABLES_DEDUP
        ).select("vec_id", "tbl", "bucket")
        b = base.unionByName(extra).localCheckpoint()
        base.unpersist(blocking=False)  # superseded by the combined bands
        return b, mask

    # full-depth band table + probed depth are LSH-index artifacts —
    # built once per (session, corpus), reused across calls (see
    # _INDEX_CACHE): repeat runs skip the corpus-wide bucket kernel AND
    # the occupancy probe, paying only the pair + cosine stages
    bands, mask = _session_index(spark, "embdup", e, _build_index)
    # candidate pairs via groupBy(cell) + in-array combination (same
    # pattern as the minhash pipeline): buckets compute once — a self-join
    # would re-derive all the hyperplane projections on both sides.
    #
    # Mega-cell SALT-SPLIT (r10 — the duplicate-heavy backstop the
    # minhash path has had since r7, ported here): the occupancy probe
    # bounds the TYPICAL candidate count by deepening, but a corpus of
    # near-identical vectors bottoms out the ladder with one giant cell
    # per table — collect_list would then materialize an unbounded
    # array in one task and the pair explode goes |cell|². Cells past
    # BUCKET_CAP split into ceil(size/cap) deterministic sub-cells
    # (vec-id polynomial hash — the identical arithmetic as the oracle
    # and the minhash pipeline); per-cell work drops to O(cap·size)
    # while connected components still links every member of a mutually
    # similar cell through its sub-cells. Cells beyond cap·MAX_SPLITS
    # (exact-duplicate pathologies — dedup_exact_hash territory) are
    # skipped. The size window and the salted groupBy share one
    # (tbl, bucket) exchange, same as the minhash plan.
    hard_cap = BUCKET_CAP * MAX_SPLITS
    wc = W.partitionBy("tbl", "bucket").orderBy("vec_id")
    masked = bands.select(
        "vec_id",
        "tbl",
        F.col("bucket").bitwiseAND(F.lit(mask)).alias("bucket"),
    )
    sized = masked.withColumn(
        "sz",
        F.count(F.lit(1)).over(
            wc.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ),
    )
    salted = (
        sized.filter((F.col("sz") >= 2) & (F.col("sz") <= hard_cap))
        .withColumn("nsplit", F.expr(f"(sz + {BUCKET_CAP - 1}) div {BUCKET_CAP}"))
        .withColumn(
            "salt",
            poly_hash_col(F.col("vec_id").cast("string")) % F.col("nsplit"),
        )
    )
    grouped = (
        salted.groupBy("tbl", "bucket", "salt")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        grouped.select(F.explode(_pair_structs_col("vec_a", "vec_b")).alias("p"))
        .select("p.vec_a", "p.vec_b")
        .distinct()
    )

    cos_udf = pair_cosine_udf(4)

    norms = e.select(
        "vec_id", "embedding",
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
    )
    a = norms.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = norms.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    return (
        cand.join(a, on="vec_a").join(b, on="vec_b")
        .select(
            "vec_a", "vec_b",
            cos_udf("ea", "eb", "na", "nb").alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(tau))
    )


_ANN_SQL = f"""
    WITH b AS (
      {" UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, {_sql_bucket(t)} AS bucket "
        f"FROM embeddings"
        for t in range(N_TABLES)
      )}
    ),
    q AS (SELECT vec_id AS qid, embedding AS qv, tbl, bucket
          FROM b WHERE vec_id < 3),
    cand AS (
      SELECT DISTINCT q.qid, b.vec_id, q.qv, b.embedding
      FROM q JOIN b ON q.tbl = b.tbl AND q.bucket = b.bucket
                   AND b.vec_id <> q.qid),
    scored AS (
      SELECT qid, vec_id,
             round(list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(embedding AS DOUBLE[])), 4) AS cosine
      FROM cand),
    ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY cosine DESC, vec_id) AS rk
      FROM scored)
    SELECT qid, vec_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
"""


@register("ann_lsh_bucketed", _ANN_SQL)
def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via multi-table hyperplane LSH: N_TABLES (6)
    independent tables
    of 4 deterministic hyperplanes each; candidates = union of same-bucket
    vectors across tables, then exact cosine re-rank. Multiple small tables
    trade a few extra candidates for recall a single deep table cannot
    reach. At 100 TB the bucket equi-join replaces the brute-force cross
    join; table count / plane depth tune the recall-cost point."""
    e = load(spark, sf_dir, "embeddings")
    # the corpus bucket table is the LSH index: built once per
    # (session, corpus) and reused across searches (_INDEX_CACHE) —
    # id + table + bucket rows only, so the checkpoint is compact and
    # repeat searches skip the corpus-wide bucket kernel
    bands = _session_index(
        spark,
        "lsh_bands",
        e,
        lambda: banded_embeddings(e)
        .select("vec_id", "tbl", "bucket")
        .localCheckpoint(),
    )
    # band the pre-filtered query rows rather than filtering the banded
    # corpus: the Arrow bucket kernel is nondeterministic-flagged, so a
    # filter above it cannot push below — banding e.filter(...) keeps the
    # vec_id predicate at the parquet scan and runs the kernel on 3 rows,
    # not a second full-corpus pass
    q = (
        banded_embeddings(e.filter(F.col("vec_id") < 3))
        .select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"),
            "tbl", "bucket",
        )
    )
    # the distinct dedups candidates that collide in several tables —
    # carry ONLY (qid, vec_id) through it (16-byte rows, same pattern as
    # the near-dup pipeline) and join vectors + once-per-vector norms
    # back onto the surviving pairs
    cand = (
        bands.join(F.broadcast(q.select("qid", "tbl", "bucket")), on=["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    ev = e.select(
        "vec_id", "embedding", _norm_col(F.col("embedding")).alias("enorm")
    )
    qv = ev.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"),
        F.col("enorm").alias("qnorm"),
    )
    scored = (
        cand.join(F.broadcast(qv), on="qid")
        .join(ev, on="vec_id")
        .select(
            "qid", "vec_id",
            pair_cosine_udf(4)("embedding", "qv", "enorm", "qnorm").alias("cosine"),
        )
    )
    topk = _topk_per_query(scored, 5, [F.desc("cosine"), F.asc("vec_id")])
    return topk.select(
        "qid", "vec_id", "cosine", F.col("prk").cast("bigint").alias("rk")
    )


# ---------------------------------------------------------------------------
# ANN: IVF (inverted-file) coarse quantizer — the second scale path
# ---------------------------------------------------------------------------

NPROBE = 8  # coarse cells probed per query


_IVF_SQL = f"""
    WITH expl AS (
      SELECT label, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings),
    cd AS (SELECT label, dim, round(AVG(v), 6) AS c
           FROM expl GROUP BY label, dim),
    cent AS (SELECT label, list(c ORDER BY dim) AS cvec FROM cd GROUP BY label),
    scored AS (
      SELECT e.vec_id, c.label,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) AS cc
      FROM embeddings e CROSS JOIN cent c),
    assign AS (
      SELECT vec_id, label FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY cc DESC, label) AS rn
        FROM scored) WHERE rn = 1),
    probe AS (
      SELECT vec_id AS qid, label FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY cc DESC, label) AS rn
        FROM scored WHERE vec_id < 3) WHERE rn <= {NPROBE}),
    cand AS (
      SELECT DISTINCT p.qid, a.vec_id
      FROM probe p JOIN assign a USING (label)
      WHERE a.vec_id <> p.qid),
    rer AS (
      SELECT c.qid, c.vec_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[])), 4) AS cosine
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.qid
      JOIN embeddings v ON v.vec_id = c.vec_id),
    ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY cosine DESC, vec_id) AS rk
      FROM rer)
    SELECT qid, vec_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
"""


def _norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def label_centroids(e: DataFrame) -> DataFrame:
    """Coarse-quantizer training shared by the session IVF index
    (``ann_ivf_coarse``) and the persisted store (``plans/ann_store``):
    per-``label`` mean vector at 6 dp + its norm, as
    (label, cvec, cnorm). ONE definition so the two indexes can never
    drift in rounding or assembly order — the store's search contract
    depends on assigning vectors exactly like the session index."""
    cd = (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("c"))
    )
    c = cd.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    return c.withColumn("cnorm", _norm_col(F.col("cvec")))


@register("ann_ivf_coarse", _IVF_SQL)
def q_ann_ivf_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a coarse quantizer (per-label centroids, the
    deterministic stand-in for k-means training) partitions the corpus
    into inverted lists; each query probes its NPROBE nearest centroids
    and re-ranks only those lists by exact cosine.

    Scale shape: centroid construction is one partial-agg shuffle over
    (label, dim); the centroid table is tiny and broadcasts; assignment
    is a map-only pass; the probe→list candidate join is an equi-join on
    the centroid id, so the search cost is corpus_fraction ≈ NPROBE/K
    instead of a full scan. This is the textbook IVF layout — at 100 TB
    the inverted lists would live as centroid-partitioned Parquet so a
    probe prunes partitions at the scan."""
    e = load(spark, sf_dir, "embeddings")

    def _build_cents() -> DataFrame:
        # K tiny rows, but DERIVING them scans the corpus — materialize once
        # so the assignment and probe branches don't each recompute the
        # (label, dim) aggregation over the full table
        return label_centroids(e).localCheckpoint()

    # the coarse quantizer is the trained half of an IVF index: built
    # once per (session, corpus), reused across searches (_INDEX_CACHE)
    cents = _session_index(spark, "ivf_cents", e, _build_cents)
    ev = e.select(
        "vec_id", "embedding", _norm_col(F.col("embedding")).alias("enorm")
    )

    def scored_cells(frame: DataFrame) -> DataFrame:
        return frame.crossJoin(F.broadcast(cents)).select(
            "vec_id", "label",
            pair_cosine_udf(6)("embedding", "cvec", "enorm", "cnorm").alias("cc"),
        )

    # assignment scores the whole corpus ONCE; the probe scores only the
    # pre-filtered (tiny) query rows — deriving both from one corpus-wide
    # pass would make the plan score the corpus against the centroids
    # twice (the two consumers prevent stage reuse). The corpus-wide
    # argmax is a partial-aggregated max(struct) — same (cc DESC, label
    # ASC) tie-break as a rank-1 window, without sorting K rows per
    # vector through a window operator: map-side combine reduces each
    # vector's K scores to one row before the exchange. The resulting
    # (vec_id → list) assignment IS the inverted-list half of the IVF
    # index — checkpointed and cached with the centroids, so repeat
    # searches join against materialized lists instead of re-scoring
    # the corpus (a production IVF store persists exactly this table).
    assign = _session_index(
        spark,
        "ivf_lists",
        e,
        lambda: (
            scored_cells(ev)
            .groupBy("vec_id")
            .agg(
                F.max(
                    F.struct(F.col("cc"), (-F.col("label")).alias("nl"))
                ).alias("m")
            )
            .select("vec_id", (-F.col("m.nl")).alias("label"))
            .localCheckpoint()
        ),
    )
    wq = W.partitionBy("vec_id").orderBy(F.desc("cc"), F.asc("label"))
    probe = (
        scored_cells(ev.filter(F.col("vec_id") < 3))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= NPROBE)
        .select(F.col("vec_id").alias("qid"), "label")
    )
    # probe is ≤ |Q|·NPROBE rows by construction (rn ≤ NPROBE) — broadcast
    # it so the inverted lists never shuffle (the planner picked a
    # SortMergeJoin here: `assign` is a checkpointed RDD with no stats, so
    # without the hint BOTH sides paid an exchange + sort for a ≤24-row
    # build side). No distinct needed: `assign` has exactly one label per
    # vec_id and probe's (qid, label) rows are unique, so a (qid, vec_id)
    # pair can arise from at most one (label) match — count semantics are
    # identical with the dedup exchange removed (same argument as the
    # minhash pair stage's dropped distinct-expand).
    cand = (
        assign.join(F.broadcast(probe), on="label")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
    )
    # re-rank: only the (tiny) query vectors broadcast — never the corpus —
    # and each side's norm is the one already computed per vector in ev
    qv = ev.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
        F.col("enorm").alias("qnorm"),
    )
    vv = ev.select(
        "vec_id", F.col("embedding").alias("vvec"),
        F.col("enorm").alias("vnorm"),
    )
    rer = (
        cand.join(F.broadcast(qv), on="qid")
        .join(vv, on="vec_id")
        .select(
            "qid", "vec_id",
            pair_cosine_udf(4)("qvec", "vvec", "qnorm", "vnorm").alias("cosine"),
        )
    )
    topk = _topk_per_query(rer, 5, [F.desc("cosine"), F.asc("vec_id")])
    return topk.select(
        "qid", "vec_id", "cosine", F.col("prk").cast("bigint").alias("rk")
    )


# ---------------------------------------------------------------------------
# ANN: the PERSISTED IVF store, driver-attested (r10)
# ---------------------------------------------------------------------------

# Oracle for the persisted-store probe. Same coarse-quantizer training /
# assignment / probe shape as _IVF_SQL above (the store shares ONE
# label_centroids definition with the session index precisely so this
# holds), with the store's contract differences spelled out:
#   * nprobe = 4 (plans/ann_store.NPROBE_DEFAULT, vs the session
#     index's 8);
#   * the rescore cosine is the store's _cosine — rounded at 6 dp (the
#     session index re-ranks at 4 dp);
#   * no self-exclusion: a corpus vector probing the store finds itself
#     at rk 1 (cosine 1.0) — the store is a retrieval index, not a
#     dedup pipeline.
_IVF_STORE_SQL = """
    WITH expl AS (
      SELECT label, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings),
    cd AS (SELECT label, dim, round(AVG(v), 6) AS c
           FROM expl GROUP BY label, dim),
    cent AS (SELECT label, list(c ORDER BY dim) AS cvec FROM cd GROUP BY label),
    scored AS (
      SELECT e.vec_id, c.label,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) AS cc
      FROM embeddings e CROSS JOIN cent c),
    assign AS (
      SELECT vec_id, label FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY cc DESC, label) AS rn
        FROM scored) WHERE rn = 1),
    probe AS (
      SELECT vec_id AS qid, label FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY cc DESC, label) AS rn
        FROM scored WHERE vec_id < 3) WHERE rn <= 4),
    rer AS (
      SELECT p.qid, a.vec_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(v.embedding AS DOUBLE[])), 6) AS cosine
      FROM probe p JOIN assign a USING (label)
      JOIN embeddings q ON q.vec_id = p.qid
      JOIN embeddings v ON v.vec_id = a.vec_id),
    ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY cosine DESC, vec_id) AS rk
      FROM rer)
    SELECT qid, vec_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
"""


@register("ann_ivf_store_probe", _IVF_STORE_SQL)
def q_ann_ivf_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing signal for the PERSISTED IVF store
    (:mod:`..plans.ann_store`) — the engine's actual 100 TB retrieval
    path, previously pinned only by pytest fixtures (the benched
    ``ann_ivf_coarse`` exercises the session-resident index; same gap
    VERDICT r9 #3 called out for the merge tree).

    Builds the store once per (session, corpus) — train the coarse
    quantizer, assign every vector, write centroid-PARTITIONED parquet
    lists + SQ8 codes — then probes it with the standard 3-query batch
    through :func:`..plans.ann_store.probe_ivf_store`: the probed label
    set becomes a LITERAL isin on the partition column, so the lists
    scan carries a static PartitionFilter and the other K−nprobe
    directories are never opened. The oracle recomputes the identical
    train/assign/probe/re-rank function in SQL, so a green row attests
    the store's PHYSICAL layout round-trip (write → partition-pruned
    read) bit-for-bit, not just the in-memory plan. Scale design: the
    build is one (label, dim) partial-agg + one map-only assignment +
    one partition-by-label write; the probe reads nprobe/K of the
    corpus."""
    from proteofav_spark.plans import ann_store

    e = load(spark, sf_dir, "embeddings")

    def _build() -> TempDirArtifact:
        import tempfile

        path = tempfile.mkdtemp(prefix="pfs_ivf_store_")
        ann_store.build_ivf_store(e, path)
        return TempDirArtifact(path)

    # cached like every other index artifact: the store is built once
    # per (session, corpus file-listing) and serves all later probes.
    # The cached value is a disk artifact, so eviction (an in-place
    # corpus rewrite) rmtree's the superseded store instead of leaking
    # one temp tree per rewrite (r11 — same fix as the Z-order lake).
    path = _session_index(spark, "ivf_store_path", e, _build).path
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ann_store.probe_ivf_store(spark, path, q)
    return out.select(
        "qid", "vec_id", "cosine", F.col("rk").cast("bigint").alias("rk")
    )


BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


@register(
    "text_bpe_token_count",
    f"""
    SELECT doc_id, n_bpe_tokens, n_ws_tokens,
           CAST((2 * n_bpe_tokens * 1000000 + n_ws_tokens)
                // (2 * n_ws_tokens) AS BIGINT) / 1000000.0 AS bpe_per_ws
    FROM (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{BPE_PAT}')) AS BIGINT)
                 AS n_bpe_tokens,
             CAST(len({_sql_tokens('text')}) AS BIGINT) AS n_ws_tokens
      FROM documents)
    """,
)
def q_text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style token counting: a GPT-2-like pre-tokenizer regex (letter
    runs / digit runs / punctuation runs, each absorbing one leading
    space) approximates subword token counts without a vocab — the
    standard cheap cost estimator for LLM training data. The pattern stays
    in the Java∩RE2 common dialect so Spark and the oracle tokenize
    identically. Map-only at any scale."""
    d = load(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(BPE_PAT), 0)
    ws = tokens_col()
    return d.select(
        "doc_id",
        F.size(bpe).cast("bigint").alias("n_bpe_tokens"),
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
    ).select(
        "doc_id",
        "n_bpe_tokens",
        "n_ws_tokens",
        half_up_ratio("n_bpe_tokens", "n_ws_tokens", 6).alias("bpe_per_ws"),
    )


# ---------------------------------------------------------------------------
# k-means (Lloyd) over embeddings — iterative, deterministic
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 5


def _kmeans_assign_udf(c: np.ndarray):
    """Arrow-batched nearest-centroid assignment for a fixed centroid
    matrix ``c`` [k, DIM] (float64): one numpy argmin over a [batch, k]
    squared-distance matrix, ties to the lowest cluster id via argmin's
    first-occurrence rule. Shared by the Lloyd loop (:func:`kmeans_lloyd`)
    and the oracled one-step parity query (`embedding_kmeans_assign`) so
    the production kernel itself sits under the driver's oracle gate."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<cluster: int, dist: double>")
    def _assign(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:
            # np.stack raises on an empty Arrow batch
            return pd.DataFrame(
                {"cluster": pd.Series([], dtype="int32"),
                 "dist": pd.Series([], dtype="float64")}
            )
        E = np.stack(emb.values).astype(np.float64)
        # [batch, k] squared distances; ties break to the lowest
        # cluster id via argmin's first-occurrence rule
        d2 = ((E[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        idx = d2.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": idx.astype("int32"),
             "dist": np.sqrt(d2[np.arange(len(E)), idx])}
        )

    return _assign


def kmeans_lloyd(
    e: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> DataFrame:
    """Deterministic Lloyd k-means over an (vec_id, embedding) frame:
    seeds are the k lowest-``xxhash64(vec_id)`` vectors (reproducible, no
    RNG), then ``iters`` rounds of assign → mean.

    Scale shape: centroids are k×DIM doubles — genuinely tiny at ANY
    corpus size — so each round collects them to the driver and ships
    them back inside an Arrow-batched assignment kernel (one numpy
    argmin over a [batch, k] distance matrix); the only shuffle per
    round is the partial-aggregated per-cluster mean. This is the
    standard driver-coordinated Lloyd loop: iteration count is fixed,
    not data-dependent, and per-round cost is one corpus map + one
    k-row aggregation. Returns (vec_id, cluster, dist) for the final
    assignment.
    """
    from pyspark.sql.functions import pandas_udf

    spark = e.sparkSession
    seeds = (
        e.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        # silently proceeding with < k centroids would reshape the output
        # contract (cluster ids 0..len-1); make the caller choose k ≤ n
        raise ValueError(
            f"k-means needs at least k={k} vectors, frame has {len(seeds)}"
        )
    cents = np.array([r["embedding"] for r in seeds], dtype=np.float64)

    for _ in range(iters):
        assigned = e.select(
            "vec_id", "embedding",
            _kmeans_assign_udf(cents)("embedding").alias("a")
        ).select("vec_id", "embedding", "a.cluster")
        means = (
            assigned.select(
                "cluster", F.posexplode("embedding").alias("d", "x")
            )
            .groupBy("cluster", "d")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("d", "m"))
                ).getField("m").alias("centroid")
            )
            .collect()
        )
        for r in means:
            cents[r["cluster"]] = np.array(r["centroid"], dtype=np.float64)

    return e.select(
        "vec_id", _kmeans_assign_udf(cents)("embedding").alias("a")
    ).select("vec_id", "a.cluster", F.round("a.dist", 4).alias("dist"))


@register("embedding_kmeans")  # iterative — rows-only check by design
def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means cluster assignment for every embedding (see
    :func:`kmeans_lloyd`). No SQL oracle: a fixed-point iteration isn't
    single-query-expressible; correctness is pinned by a pure-numpy
    reference implementation in tests (identical seeds, iterations, and
    tie-breaking)."""
    return kmeans_lloyd(load(spark, sf_dir, "embeddings"))


_KMEANS_ASSIGN_SQL = f"""
    WITH seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
             vec_id AS svid
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K})
    ),
    sdim AS (
      SELECT s.cluster,
             generate_subscripts(e.embedding, 1) AS dim,
             CAST(UNNEST(e.embedding) AS DOUBLE) AS c
      FROM seeds s JOIN embeddings e ON e.vec_id = s.svid
    ),
    edim AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS dim,
             CAST(UNNEST(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    d AS (
      SELECT edim.vec_id, sdim.cluster,
             SUM((edim.v - sdim.c) * (edim.v - sdim.c)) AS d2
      FROM edim JOIN sdim USING (dim)
      GROUP BY edim.vec_id, sdim.cluster
    )
    SELECT vec_id, cluster
    FROM (SELECT vec_id, cluster,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2, cluster) AS rn
          FROM d)
    WHERE rn = 1
"""


@register("embedding_kmeans_assign", _KMEANS_ASSIGN_SQL)
def q_embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic one-step k-means assignment under the driver's
    oracle gate (closes the `embedding_kmeans` rows-only gap, VERDICT r7
    item #5): seeds are the ``KMEANS_K`` lowest-``vec_id`` embeddings —
    SQL-expressible, unlike the Lloyd loop's xxhash64 seeding — and the
    assignment runs through the SAME Arrow-batched kernel the iterative
    query uses (:func:`_kmeans_assign_udf`), so the production argmin
    (float32→float64 exact widening, ties to the lowest cluster id) is
    pinned against an independent engine. Only the cluster id is
    emitted: the distance scalar's summation ORDER differs between
    numpy's dim-ordered fold and SQL's unordered SUM, which is exactly
    the last-ulp divergence the argmin is robust to — PROVIDED every
    vector's best/second-best margin dwarfs that noise. That data
    property is no longer assumed: it is ENFORCED as an invariant
    (tests/test_round9_queries.py pins pairwise-distinct seeds and a
    ≥1e-6 relative margin at every sweep SF — ADVICE r9), so a
    regenerated corpus with a near-equidistant vector fails CI with a
    clear message instead of making this driver row flaky. The Lloyd ITERATION stays numpy-pinned in
    tests (fixed seeds / iterations / tie-breaks); this row makes the
    kernel itself driver-attestable. Scale shape: k×DIM driver-scalar
    seeds (bounded collect, same contract as the Lloyd loop) shipped
    into a map-only Arrow pass — zero shuffles."""
    e = load(spark, sf_dir, "embeddings")
    seeds = (
        e.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(KMEANS_K)
        .collect()
    )
    if len(seeds) < KMEANS_K:
        raise ValueError(
            f"assignment needs at least k={KMEANS_K} vectors, "
            f"frame has {len(seeds)}"
        )
    cents = np.array([r["embedding"] for r in seeds], dtype=np.float64)
    return e.select(
        "vec_id", _kmeans_assign_udf(cents)("embedding").alias("a")
    ).select("vec_id", F.col("a.cluster").alias("cluster"))


# ---------------------------------------------------------------------------
# Embedding compression: int8 scalar quantization with reconstruction error
# ---------------------------------------------------------------------------

_QUANT_SQL = f"""
    WITH x AS (
      SELECT vec_id, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings),
    d AS (SELECT dim, CAST(MIN(v) AS DOUBLE) AS lo, CAST(MAX(v) AS DOUBLE) AS hi
          FROM x GROUP BY dim),
    q AS (
      SELECT x.vec_id,
             CAST(x.v AS DOUBLE) AS v, d.lo, d.hi,
             CASE WHEN d.hi > d.lo
                  THEN floor((CAST(x.v AS DOUBLE) - d.lo) / (d.hi - d.lo) * 255 + 0.5)
                  ELSE 0 END AS code
      FROM x JOIN d USING (dim)),
    r AS (SELECT vec_id,
                 v - (lo + code * ((hi - lo) / 255)) AS err
          FROM q)
    SELECT vec_id, round(sqrt(SUM(err * err) / {DIM}), 6) AS q_rmse
    FROM r GROUP BY vec_id
"""


@register("embedding_quantize_int8", _QUANT_SQL)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the standard
    vector-store compression (4× over float32) — reporting per-vector
    reconstruction RMSE so a pipeline can gate on acceptable error.

    Scale shape: phase 1 aggregates per-dimension min/max (posexplode +
    partial-aggregated groupBy — the shuffle carries at most DIM rows per
    task); the DIM-row result is a bounded driver scalar (same contract
    as the k-means centroids) and ships back as ARRAY LITERALS, making
    phase 2 a pure map-only pass — zero joins, zero shuffles over the
    corpus. Quantize/dequantize arithmetic is written with the identical
    operation order as the oracle (floor(x + 0.5) — no round()
    half-tie-rule divergence; float32→double products exact), so codes
    match bit-for-bit and only the final error-sum order differs, which
    the 6 dp rounding absorbs."""
    e = load(spark, sf_dir, "embeddings")
    stats = (
        e.select(F.posexplode("embedding").alias("dim0", "v"))
        .groupBy("dim0")
        .agg(
            F.min(F.col("v").cast("double")).alias("lo"),
            F.max(F.col("v").cast("double")).alias("hi"),
        )
        .collect()
    )
    lo = [0.0] * DIM
    hi = [0.0] * DIM
    for r in stats:
        lo[r["dim0"]] = r["lo"]
        hi[r["dim0"]] = r["hi"]
    LO = F.array(*[F.lit(x) for x in lo])
    HI = F.array(*[F.lit(x) for x in hi])

    def err_sq(i):
        v = F.element_at(F.col("embedding"), i).cast("double")
        l = F.element_at(LO, i)
        h = F.element_at(HI, i)
        rng = h - l
        code = F.when(
            h > l, F.floor((v - l) / rng * 255 + F.lit(0.5))
        ).otherwise(F.lit(0).cast("bigint"))
        err = v - (l + code * (rng / 255))
        return err * err

    errs = F.transform(F.sequence(F.lit(1), F.lit(DIM)), err_sq)
    rmse = F.sqrt(
        F.aggregate(errs, F.lit(0.0), lambda acc, x: acc + x) / F.lit(DIM)
    )
    return e.select("vec_id", F.round(rmse, 6).alias("q_rmse"))


# ---------------------------------------------------------------------------
# Two-stage retrieval: int8-quantized prefilter + exact rescore
# ---------------------------------------------------------------------------

# Symmetric int8 retrieval codes: code_d = floor(v_d * 127 + 0.5). The
# catalog embeddings are unit-normalized (the standard contract for cosine
# retrieval stores), so components lie in [-1, 1] and codes in [-127, 127],
# and code·code ≈ 127² · cosine — a GLOBAL scale, deliberately NOT the
# per-dim affine grid of embedding_quantize_int8: inner products are not
# invariant under per-dim affine maps (measured: affine codes rank cosine
# top-10 at recall 0.23; symmetric codes at 1.00 from 50 candidates).
# Zero aggregates → bit-identical across Spark, DuckDB, and driver Python.
_CODES_CTE = """
    x AS (SELECT vec_id, UNNEST(embedding) AS v,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings),
    c AS (SELECT vec_id, dim,
                 CAST(floor(CAST(v AS DOUBLE) * 127 + 0.5) AS BIGINT) AS code
          FROM x)
"""

RESCORE_M = 50  # quantized-prefilter candidates per query before exact rescore
RETRIEVE_K = 10


def _codes_expr() -> Column:
    """array<bigint> symmetric int8 codes of ``embedding`` — identical
    operation order as the oracle's ``floor(v * 127 + 0.5)`` (exact
    float32→double widening), so codes match bit-for-bit."""
    return F.transform(
        F.col("embedding"),
        lambda v: F.floor(v.cast("double") * 127 + F.lit(0.5)).cast("bigint"),
    )


def _py_codes(vec: list) -> list[int]:
    """Driver-side twin of :func:`_codes_expr` for the handful of collected
    query/codebook vectors — same IEEE-double operation order."""
    import math

    return [int(math.floor(float(v) * 127 + 0.5)) for v in vec]


def _topk_per_query(scored: DataFrame, k: int, order: list) -> DataFrame:
    """Per-query top-k over a corpus-wide scored frame: ONE window
    partitioned by qid, with the rank filter fused into the plan.

    Scale shape (r13 re-adjudication of the r8 salted two-phase form):
    Spark's rank-limit pushdown (SPARK-37099, on by default via
    ``spark.sql.optimizer.windowGroupLimitThreshold``) plants a
    ``WindowGroupLimit … Partial`` below the exchange — every map task
    keeps only its local top-k per qid BEFORE shuffling, so the per-qid
    sort partition receives ≤ #map_tasks·k rows, never the corpus. The
    hand-rolled salt phase this replaces duplicated exactly that map-side
    prune at the price of a whole extra Exchange + two Sorts per call —
    and, because the partial limit applies per (qid, salt) bucket, its
    phase-1 exchange shipped up to TOPK_SALT× MORE rows per task than the
    single window does. Napkin math at 100 TB (guide §1.3): 1 GB splits →
    ~10⁵ map tasks; k ≤ 100 → ≤ 10⁷ rows ≈ 200 MB per qid partition — one
    ordinary task-sized spillable sort. Measured at sf0.1 (the r8 A/B,
    tools/ab_topk_salt.py): the salt exchange cost ~68 ms/query (~10%).
    Ordering contract unchanged: one total order (tie-break vec_id), so
    ``prk`` matches the oracle's ROW_NUMBER exactly."""
    w_glob = W.partitionBy("qid").orderBy(*order)
    return scored.withColumn("prk", F.row_number().over(w_glob)).filter(
        F.col("prk") <= k
    )


def _rescore_exact(e: DataFrame, topm: DataFrame) -> DataFrame:
    """Exact-cosine rescore of a tiny (qid, vec_id, <score>) candidate
    list: broadcast it back to the full-precision store and compute the
    O(DIM) norm folds only over the survivors — the prefilter exists
    precisely so the exact stage never runs full-corpus compute. Returns
    the candidate columns plus ``cosine`` (4 dp, the knn_cosine_topk
    pairing, proven hash-exact vs DuckDB list_cosine_similarity)."""
    qv = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"),
        _norm_col(F.col("embedding")).alias("qnorm"),
    )
    surv = e.join(F.broadcast(topm), "vec_id")
    return (
        surv.withColumn("enorm", _norm_col(F.col("embedding")))
        .join(F.broadcast(qv), "qid")
        .select(
            *topm.columns,
            pair_cosine_udf(4)("embedding", "qv", "enorm", "qnorm").alias(
                "cosine"
            ),
        )
    )


_RESCORE_SQL = f"""
    WITH {_CODES_CTE},
    q AS (SELECT vec_id AS qid, dim, code AS qcode FROM c WHERE vec_id < 3),
    s AS (SELECT q.qid, c.vec_id, SUM(c.code * q.qcode) AS iscore
          FROM c JOIN q USING (dim) WHERE c.vec_id <> q.qid
          GROUP BY q.qid, c.vec_id),
    m AS (SELECT qid, vec_id, iscore,
                 ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY iscore DESC, vec_id) AS prk
          FROM s),
    r AS (SELECT m.qid, m.vec_id, CAST(m.iscore AS BIGINT) AS iscore,
                 round(list_cosine_similarity(
                     CAST(eq.embedding AS DOUBLE[]),
                     CAST(ec.embedding AS DOUBLE[])), 4) AS cosine
          FROM m
          JOIN embeddings eq ON eq.vec_id = m.qid
          JOIN embeddings ec ON ec.vec_id = m.vec_id
          WHERE m.prk <= {RESCORE_M}),
    k AS (SELECT qid, vec_id, iscore, cosine,
                 ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY cosine DESC, vec_id) AS rk
          FROM r)
    SELECT qid, vec_id, iscore, cosine, CAST(rk AS BIGINT) AS rk
    FROM k WHERE rk <= {RETRIEVE_K}
"""


@register("knn_quantized_rescore", _RESCORE_SQL)
def q_knn_quantized_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval — the standard production pattern scalar-quantized
    vector stores use (FAISS SQ8 / ScaNN first pass): an int8-quantized
    integer-dot-product prefilter picks RESCORE_M candidates per query, then
    only those are rescored with exact full-precision cosine for the final
    top-k.

    Scale shape: the codes table is an INDEX ARTIFACT, materialized once
    per (session, corpus) via the shared _session_index cache (the same
    contract as the LSH bucket table and IVF lists) — repeat searches scan
    the compact codes, never the float store; in production the artifact
    persists as an int8 Parquet projection, 4× smaller than float32 and
    integer-SIMD to scan. The full-precision store is touched for just
    |Q|·RESCORE_M rows via a broadcast join of the (tiny) candidate list
    back to the corpus, with the exact-cosine norms computed only over
    those survivors. The quantizer is stateless (global symmetric scale —
    see _CODES_CTE; no training pass at all); the query set is broadcast.
    Determinism: the prefilter score is exact integer arithmetic, so the
    candidate set (tie-break vec_id) matches the oracle bit-for-bit; the
    rescore reuses the knn_cosine_topk cosine pairing (4 dp, proven
    hash-exact vs list_cosine_similarity). Measured prefilter recall@10
    from RESCORE_M=50 candidates: 1.00 on the catalog corpus
    (tests/test_retrieval_quant.py).

    Extends SURVEY §2's similarity-search scale path (brute-force → LSH →
    IVF) with the compressed-scan tier; same query/corpus contract as
    ``knn_cosine_topk`` (reference has no vector ops — extension)."""
    e = load(spark, sf_dir, "embeddings")
    codes = _session_index(
        spark,
        "sq8_codes",
        e,
        lambda: e.select(
            "vec_id", _codes_expr().alias("codes")
        ).localCheckpoint(),
    )
    qc = codes.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("codes").alias("qcodes")
    )
    iscore = F.aggregate(
        F.zip_with(F.col("codes"), F.col("qcodes"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    cand = (
        codes.crossJoin(F.broadcast(qc))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", iscore.alias("iscore"))
    )
    topm = _topk_per_query(
        cand, RESCORE_M, [F.desc("iscore"), F.asc("vec_id")]
    ).select("qid", "vec_id", "iscore")
    resc = _rescore_exact(e, topm)
    w_k = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        resc.withColumn("rk", F.row_number().over(w_k).cast("bigint"))
        .filter(F.col("rk") <= RETRIEVE_K)
        .select("qid", "vec_id", "iscore", "cosine", "rk")
    )


# ---------------------------------------------------------------------------
# ANN: product quantization with exact-integer ADC scan
# ---------------------------------------------------------------------------

NSUB = 8                    # subspaces (DIM / NSUB dims each)
SUBDIM = DIM // NSUB
PQ_CB_LO, PQ_CB_HI = 100, 116   # sampled-codebook member vec_ids (16)
PQ_K = PQ_CB_HI - PQ_CB_LO
PQ_RERANK = 100             # ADC candidates per query before exact rescore


def _pq_assign_udf(cb_codes: list[list[int]]):
    """Arrow-batched PQ encoder: ``embedding -> array<int>`` of 1-based
    per-subspace nearest-centroid ids. Rationale for the kernel (same as
    pair_cosine_udf): the pure-expression form is PQ_K×NSUB nested
    zip_with/aggregate folds — a ~1.3 MB Catalyst tree whose analysis +
    codegen cost 3-4 s per build and whose HOF lambdas interpret per
    element, while the (N, PQ_K, SUBDIM) numpy broadcast vectorizes the
    whole batch. Bit-parity with the oracle is exact by construction:
    codes are floor(v·127+0.5) in float64 (identical IEEE op order as
    _CODES_CTE), distances are int64 sums of squares, and np.argmin
    returns the FIRST minimum — the lowest centroid id, matching the
    oracle's ORDER BY dist, cid. Pinned row-for-row against a JVM
    expression twin in tests/test_retrieval_quant.py."""
    from pyspark.sql.functions import pandas_udf

    CB = np.asarray(cb_codes, dtype=np.int64).reshape(PQ_K, NSUB, SUBDIM)

    @pandas_udf("array<int>")
    def assign(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="object")
        V = np.stack(emb.values).astype(np.float64)
        C = np.floor(V * 127 + 0.5).astype(np.int64).reshape(
            len(V), NSUB, SUBDIM
        )
        # (N, PQ_K, NSUB) int64 distances; argmin over centroids
        d = ((C[:, None, :, :] - CB[None, :, :, :]) ** 2).sum(axis=3)
        a = d.argmin(axis=1) + 1  # 1-based for element_at
        return pd.Series(list(a.astype(np.int32)))

    # nondeterministic marker pins ONE evaluation (see pair_cosine_udf)
    return assign.asNondeterministic()

_PQ_SQL = f"""
    WITH {_CODES_CTE},
    cb AS (SELECT vec_id AS cid, dim, code FROM c
           WHERE vec_id >= {PQ_CB_LO} AND vec_id < {PQ_CB_HI}),
    asg AS (SELECT c.vec_id, (c.dim - 1) // {SUBDIM} AS s, cb.cid,
                   SUM((c.code - cb.code) * (c.code - cb.code)) AS dist
            FROM c JOIN cb USING (dim)
            GROUP BY c.vec_id, (c.dim - 1) // {SUBDIM}, cb.cid),
    best AS (SELECT vec_id, s, cid FROM (
               SELECT vec_id, s, cid,
                      ROW_NUMBER() OVER (PARTITION BY vec_id, s
                          ORDER BY dist, cid) AS rn
               FROM asg) WHERE rn = 1),
    q AS (SELECT vec_id AS qid, dim, code AS qcode FROM c WHERE vec_id < 3),
    adc AS (SELECT q.qid, (q.dim - 1) // {SUBDIM} AS s, cb.cid,
                   SUM((q.qcode - cb.code) * (q.qcode - cb.code)) AS d
            FROM q JOIN cb USING (dim)
            GROUP BY q.qid, (q.dim - 1) // {SUBDIM}, cb.cid),
    scored AS (SELECT a.qid, b.vec_id, SUM(a.d) AS approx_dist
               FROM best b JOIN adc a ON a.s = b.s AND a.cid = b.cid
               WHERE b.vec_id <> a.qid
               GROUP BY a.qid, b.vec_id),
    m AS (SELECT qid, vec_id, approx_dist,
                 ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY approx_dist, vec_id) AS prk
          FROM scored),
    r AS (SELECT m.qid, m.vec_id, CAST(m.approx_dist AS BIGINT) AS approx_dist,
                 round(list_cosine_similarity(
                     CAST(eq.embedding AS DOUBLE[]),
                     CAST(ec.embedding AS DOUBLE[])), 4) AS cosine
          FROM m
          JOIN embeddings eq ON eq.vec_id = m.qid
          JOIN embeddings ec ON ec.vec_id = m.vec_id
          WHERE m.prk <= {PQ_RERANK}),
    k AS (SELECT qid, vec_id, approx_dist, cosine,
                 ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY cosine DESC, vec_id) AS rk
          FROM r)
    SELECT qid, vec_id, approx_dist, cosine, CAST(rk AS BIGINT) AS rk
    FROM k WHERE rk <= {RETRIEVE_K}
"""


@register("ann_pq_topk", _PQ_SQL)
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization retrieval (Jégou et al., PAMI 2011) with an
    exact-integer ADC scan + exact rescore: split each vector into NSUB
    subspaces, assign every subvector to its nearest codebook centroid,
    score candidates as the sum of per-subspace precomputed query→centroid
    distances (the corpus is scanned as PQ-cell codes, never as raw
    floats), then rescore the PQ_RERANK survivors with full-precision
    cosine — PQ-then-rerank, the shape every production PQ deployment runs.

    Deterministic-oracle variant: both centroids and distances live in the
    symmetric int8-code domain (exact integer L2, ties → lowest centroid
    id), and the codebook is a fixed SAMPLE of the corpus (vec_ids
    [PQ_CB_LO, PQ_CB_HI)) rather than Lloyd-trained — that keeps every
    arithmetic step bit-reproducible in ANSI SQL, at a measured recall cost
    pinned by tests/test_retrieval_quant.py (production would Lloyd-train
    the codebook; the plan shape is identical, and the synthetic corpus —
    i.i.d. near-orthogonal vectors with no cluster structure — is PQ's
    documented worst case).

    Scale shape: after the bounded driver collects (16 codebook rows + |Q|
    query rows, same contract as the k-means seeds) the corpus pass is
    MAP-ONLY — encode + NSUB LUT lookups per row, zero joins, scanning NSUB
    bytes/vector in production (32× compression over float32) — followed by
    a rank-limited top-PQ_RERANK per query (_topk_per_query — no
    per-query global sort over the corpus) and a broadcast join of the
    tiny candidate list back to the full-precision store. This is the missing
    compression tier between ann_lsh_bucketed (bucket pruning) and
    ann_ivf_coarse (partition pruning) in SURVEY §2's similarity-search
    path (reference has no vector ops — extension)."""
    e = load(spark, sf_dir, "embeddings")

    def _build_meta():
        # bounded collects: 16 codebook vectors + |Q|=3 query vectors —
        # index metadata, collected once per (session, corpus)
        cb_rows = sorted(
            e.filter(
                (F.col("vec_id") >= PQ_CB_LO) & (F.col("vec_id") < PQ_CB_HI)
            ).select("vec_id", "embedding").collect(),
            key=lambda r: r["vec_id"],
        )
        q_rows = sorted(
            e.filter(F.col("vec_id") < 3)
            .select("vec_id", "embedding")
            .collect(),
            key=lambda r: r["vec_id"],
        )
        cb = [_py_codes(r["embedding"]) for r in cb_rows]
        if len(cb) != PQ_K:
            # the oracle's cb CTE adapts to however many sampled ids exist;
            # the codebook below must match it exactly or the two engines
            # quantize against different centroids
            raise ValueError(
                f"PQ codebook expects vec_ids [{PQ_CB_LO}, {PQ_CB_HI}) "
                f"present in the corpus; found {len(cb)} of {PQ_K}"
            )
        # adc_lut[qid][s][c] = exact-int L2 between the query's and
        # centroid c's s-th code subvector
        luts = []
        for r in q_rows:
            qc = _py_codes(r["embedding"])
            lut = [
                [
                    sum(
                        (qc[s * SUBDIM + j] - c[s * SUBDIM + j]) ** 2
                        for j in range(SUBDIM)
                    )
                    for c in cb
                ]
                for s in range(NSUB)
            ]
            luts.append((int(r["vec_id"]), lut))
        return (cb, luts)

    cb_codes, lut_rows = _session_index(spark, "pq_meta", e, _build_meta)
    lutdf = spark.createDataFrame(
        lut_rows, "qid bigint, lut array<array<bigint>>"
    )

    # PQ assignment is an INDEX ARTIFACT (encode once, query many — the
    # same contract as the LSH bucket table / IVF lists), materialized per
    # (session, corpus) as compact (vec_id, 8 small ints) rows
    assigned = _session_index(
        spark,
        "pq_assign",
        e,
        lambda: e.select(
            "vec_id", _pq_assign_udf(cb_codes)("embedding").alias("asg")
        ).localCheckpoint(),
    )
    approx = F.aggregate(
        F.sequence(F.lit(1), F.lit(NSUB)),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("lut"), s.cast("int")),
            F.element_at(F.col("asg"), s.cast("int")),
        ),
    )
    scored = (
        assigned.crossJoin(F.broadcast(lutdf))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", approx.alias("approx_dist"))
    )
    topm = _topk_per_query(
        scored, PQ_RERANK, [F.asc("approx_dist"), F.asc("vec_id")]
    ).select("qid", "vec_id", "approx_dist")
    resc = _rescore_exact(e, topm)
    w_k = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        resc.withColumn("rk", F.row_number().over(w_k).cast("bigint"))
        .filter(F.col("rk") <= RETRIEVE_K)
        .select("qid", "vec_id", "approx_dist", "cosine", "rk")
    )


# ---------------------------------------------------------------------------
# Cross-source near-dup leakage matrix
# ---------------------------------------------------------------------------

_XSOURCE_SQL = f"""
    WITH pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_SQL})),
    lab AS (
      SELECT least(da.source, db.source) AS src_a,
             greatest(da.source, db.source) AS src_b
      FROM pairs
      JOIN documents da ON da.doc_id = pairs.doc_a
      JOIN documents db ON db.doc_id = pairs.doc_b)
    SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
    FROM lab GROUP BY src_a, src_b
"""


@register("dedup_crosssource_overlap", _XSOURCE_SQL)
def q_dedup_crosssource_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate LEAKAGE matrix between corpus sources: MinHash-LSH
    candidate pairs labeled with each side's source, folded to an
    unordered (src_a ≤ src_b) source pair and counted. The diagonal is
    intra-source redundancy; off-diagonal mass is cross-source
    contamination — the number a curation pipeline watches when the same
    crawl shows up under two vendors (and the train/eval leakage signal
    when one "source" is a benchmark).

    100 TB shape: the pair set is the bounded LSH-candidate stream
    (bucket-capped, ≪ corpus), so the two doc_id→source lookups are
    equi-joins of a small stream against the corpus's (doc_id, source)
    projection — AQE broadcasts the pair side when it fits, else they
    run as hash joins keyed on doc_id; the final aggregation is
    O(#source²) rows. The corpus itself is never shuffled beyond the
    2-column projection."""
    d = load(spark, sf_dir, "documents")
    src = d.select("doc_id", "source")
    pairs = minhash_lsh_pairs(fan_out(d)).select("doc_a", "doc_b")
    lab = (
        pairs.join(src.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("source", "sa")
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
    )
    return lab.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


# ---------------------------------------------------------------------------
# BM25 full-text relevance search
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_NTERMS = 3   # query = 3 mid-document-frequency corpus terms
BM25_SKIP = 4     # ranks 1..SKIP by df are skipped (stopword-ish)
BM25_TOPK = 20

_BM25_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_sql_tokens("text")}) AS tok FROM documents),
    dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(len) AS avg_len FROM dl),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
    terms AS (
      SELECT tok, df FROM df
      ORDER BY df DESC, tok LIMIT {BM25_NTERMS} OFFSET {BM25_SKIP}),
    tf AS (
      SELECT t.doc_id, t.tok, count(*) AS tf
      FROM toks t JOIN terms USING (tok) GROUP BY 1, 2),
    scored AS (
      SELECT tf.doc_id,
             SUM(ln((stats.n_docs - terms.df + 0.5) / (terms.df + 0.5) + 1)
                 * tf.tf * ({BM25_K1} + 1)
                 / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                    + {BM25_B} * dl.len / stats.avg_len))) AS s
      FROM tf
      JOIN terms USING (tok)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id)
    SELECT doc_id, round(s, 6) AS bm25
    FROM scored ORDER BY s DESC, doc_id LIMIT {BM25_TOPK}
"""


@register("text_bm25_search", _BM25_SQL)
def q_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson-Spärck Jones) full-text relevance ranking — the
    lexical-retrieval counterpart to the embedding ANN family. The query
    is derived deterministically from the corpus itself (the 3
    mid-document-frequency terms after skipping the stopword-ish top 4),
    so the whole operator is a pure function of the table and the DuckDB
    oracle checks every stage: document lengths, IDFs, TF saturation and
    length normalization.

    100 TB shape: the inverted-index build is one shuffle of the token
    stream (per-(doc, term) TFs partial-aggregate map-side); document
    frequencies and lengths are the same aggregates an index build
    maintains incrementally. The query-term table and the (N, avgdl)
    scalars broadcast; scoring touches only postings of query terms —
    the corpus-sized frames never join each other. Top-k is
    TakeOrderedAndProject (per-partition heaps), never a global sort."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("len").alias("avg_len"),
    )
    df_t = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    # ranks SKIP+1..SKIP+NTERMS by (df DESC, tok): two TakeOrdered passes
    # (top SKIP+NTERMS, then the NTERMS smallest of those) — never a
    # global sort, and OFFSET semantics match the oracle exactly
    head = df_t.orderBy(F.col("df").desc(), "tok").limit(BM25_SKIP + BM25_NTERMS)
    terms = head.orderBy(F.col("df").asc(), F.col("tok").desc()).limit(BM25_NTERMS)
    tf = (
        toks.join(F.broadcast(terms.select("tok")), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    tf_sat = (
        F.col("tf") * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1
            * (1 - BM25_B + BM25_B * F.col("len") / F.col("avg_len"))
        )
    )
    scored = (
        tf.join(F.broadcast(terms), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * tf_sat).alias("s"))
    )
    return (
        scored.orderBy(F.col("s").desc(), "doc_id")
        .limit(BM25_TOPK)
        .select("doc_id", F.round("s", 6).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# Substring-span dedup (shared verbatim token spans between documents)
# ---------------------------------------------------------------------------

SPAN_K = 8            # positional shingle width (tokens)
SPAN_OCC_CAP = 50     # skip shingles with more total occurrences (boilerplate)
SPAN_MIN_TOKENS = 20  # report pairs sharing a span at least this long

_SPAN_SQL = f"""
    WITH toks AS (
      SELECT doc_id, {_sql_tokens("text")} AS ts FROM documents),
    sh AS (
      SELECT doc_id, i AS pos,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(ts[i:i+{SPAN_K - 1}], t -> {_sql_poly_hash("t")})),
               (a, b) -> (a * {SHINGLE_B} + b) % {P_MOD}) AS h
      FROM toks, UNNEST(generate_series(1, greatest(len(ts) - {SPAN_K - 1}, 0)))
           AS g(i)
      WHERE len(ts) >= {SPAN_K}),
    occ AS (
      SELECT h FROM sh GROUP BY h
      HAVING count(*) BETWEEN 2 AND {SPAN_OCC_CAP}
         AND count(DISTINCT doc_id) >= 2),
    m AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pa, a.pos - b.pos AS diag
      FROM sh a JOIN sh b USING (h) JOIN occ USING (h)
      WHERE a.doc_id < b.doc_id),
    r AS (
      SELECT doc_a, doc_b, diag, pa,
             pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                     ORDER BY pa) AS grp
      FROM m),
    runs AS (
      SELECT doc_a, doc_b, CAST(count(*) + {SPAN_K - 1} AS BIGINT) AS span
      FROM r GROUP BY doc_a, doc_b, diag, grp)
    SELECT doc_a, doc_b, MAX(span) AS max_span,
           CAST(count(*) AS BIGINT) AS n_spans
    FROM runs WHERE span >= {SPAN_MIN_TOKENS}
    GROUP BY doc_a, doc_b
"""


@register("dedup_substring_span", _SPAN_SQL)
def q_dedup_substring_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim shared-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): document pairs sharing
    an exact token span of ≥ SPAN_MIN_TOKENS, with the maximal shared
    span length — the modality that catches partial copies (quoted
    passages, templated front-matter, concatenated crawls) that
    whole-document MinHash misses.

    Distributed formulation instead of a suffix array: positional
    SPAN_K-token shingle hashes form an inverted index; cross-document
    position matches land on a DIAGONAL (pos_a − pos_b), and a run of m
    consecutive matches on one diagonal is exactly a shared span of
    m + K − 1 tokens — recovered with a per-(pair, diagonal) window +
    gaps-and-islands count, no per-task suffix structures.

    100 TB shape: one shuffle of the positional shingle stream builds
    the index; shingles with more than SPAN_OCC_CAP occurrences
    (boilerplate n-grams — quadratic match blowup, no dedup signal) are
    dropped by the occurrence filter, bounding every bucket's match
    fan-out at CAP²; the run-detection window partitions by
    (pair, diagonal), so state is one diagonal's matches. The oracle
    runs the identical construction in DuckDB."""
    d = fan_out(load(spark, sf_dir, "documents"))
    th = d.select(
        "doc_id",
        F.transform(tokens_col(), lambda t: poly_hash_col(t)).alias("th"),
    )
    n = F.size("th")
    span_hash = F.transform(
        F.sequence(F.lit(1), n - (SPAN_K - 1)),
        lambda i: F.aggregate(
            F.slice("th", i, SPAN_K),
            F.lit(0).cast("long"),
            lambda a, x: (a * SHINGLE_B + x) % P_MOD,
        ),
    )
    sh = (
        th.filter(n >= SPAN_K)
        .select("doc_id", F.posexplode(span_hash).alias("pos0", "h"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    )
    occ = (
        sh.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.countDistinct("doc_id").alias("nd"),
        )
        .filter((F.col("c") >= 2) & (F.col("c") <= SPAN_OCC_CAP) & (F.col("nd") >= 2))
        .select("h")
    )
    keep = sh.join(occ, "h")
    m = (
        keep.alias("a")
        .join(keep.alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            (F.col("a.pos") - F.col("b.pos")).alias("diag"),
        )
        .distinct()
    )
    wd = W.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = (
        m.withColumn("grp", F.col("pa") - F.row_number().over(wd))
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg((F.count(F.lit(1)) + (SPAN_K - 1)).alias("span"))
    )
    return (
        runs.filter(F.col("span") >= SPAN_MIN_TOKENS)
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max("span").alias("max_span"),
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        )
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics (quantizer calibration profile)
# ---------------------------------------------------------------------------

_DIM_STATS_SQL = f"""
    SELECT g.i AS dim0,
           round(avg(CAST(e.embedding AS DOUBLE[])[g.i + 1]), 6) AS mean,
           round(stddev_samp(CAST(e.embedding AS DOUBLE[])[g.i + 1]), 6) AS sd,
           round(min(CAST(e.embedding AS DOUBLE[])[g.i + 1]), 6) AS lo,
           round(max(CAST(e.embedding AS DOUBLE[])[g.i + 1]), 6) AS hi
    FROM embeddings e CROSS JOIN generate_series(0, {DIM - 1}) AS g(i)
    GROUP BY 1
"""


@register("embedding_dim_stats", _DIM_STATS_SQL)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/σ/min/max of the embedding column — the
    calibration profile every quantizer (the int8 path above, PQ
    codebooks) and normalization step reads before touching 100 TB of
    vectors, and the standard drift check between embedding-model
    versions.

    Shape: ``posexplode`` is a map-side expand (DIM rows per vector,
    zero joins — the oracle's generate_series cross join is the SQL
    spelling of the same expand), then ONE partial-aggregated groupBy
    whose key space is exactly DIM rows, so the shuffle carries ≤
    DIM × tasks partial states no matter the corpus size. Float32
    elements are cast to double BEFORE aggregating on both engines;
    mean/stddev accumulate in sum order, so outputs round to 6 dp
    (stddev_samp's two-pass-free Welford merge is the same algorithm in
    Spark and DuckDB)."""
    e = load(spark, sf_dir, "embeddings")
    x = e.select(F.posexplode("embedding").alias("dim0", "v")).select(
        # bigint position to match DuckDB's generate_subscripts/unnest
        # (the local type-parity gate enforces exact output types)
        F.col("dim0").cast("long").alias("dim0"),
        F.col("v").cast("double").alias("v"),
    )
    return x.groupBy("dim0").agg(
        F.round(F.avg("v"), 6).alias("mean"),
        F.round(F.stddev_samp("v"), 6).alias("sd"),
        F.round(F.min("v"), 6).alias("lo"),
        F.round(F.max("v"), 6).alias("hi"),
    )


# ---------------------------------------------------------------------------
# Training-sample token chunking (fixed window + stride, overlap carry)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64    # tokens per training sample
CHUNK_STRIDE = 48  # window stride (64 - 48 = 16-token overlap)

_CHUNK_SQL = f"""
    WITH t AS (SELECT doc_id, {_sql_tokens('text')} AS toks FROM documents),
    s AS (SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks), 1), {CHUNK_STRIDE}))
                     AS start
          FROM t)
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_no,
           CAST(len(toks[start + 1 : start + {CHUNK_SIZE}]) AS BIGINT)
               AS n_tokens,
           array_to_string(toks[start + 1 : start + {CHUNK_SIZE}], ' ')
               AS chunk_text
    FROM s
"""


@register("docs_token_chunking", _CHUNK_SQL)
def q_docs_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slice every document into fixed-size overlapping token windows —
    the training-sample chunker every LLM data pipeline runs between
    curation and tokenizer packing (stride < size keeps boundary context
    in two samples, the standard next-token-prediction recipe; contrast
    pack_token_shards, which packs WHOLE docs to a budget).

    Spark-first shape: tokenize once, explode a bounded
    ``sequence(0, n-1, stride)`` of window starts, ``slice`` each window
    out of the kept token array — all inside one map-only
    whole-stage-codegen stage: chunking is embarrassingly parallel, with
    no groupBy/join/window anywhere. The only exchange is ``fan_out``'s
    few-files repartition (fires at test SF where the corpus is one
    parquet file; a well-split 100 TB scan passes through with zero
    exchanges — same contract as the other text kernels). Row fan-out is
    ceil(len/stride) per doc (bounded by the longest document, not the
    corpus); empty docs emit one empty chunk so no document silently
    disappears from the sample ledger."""
    d = load(spark, sf_dir, "documents")
    t = fan_out(d).select("doc_id", tokens_col("text").alias("toks"))
    s = t.withColumn(
        "start",
        F.explode(
            F.expr(f"sequence(0, greatest(size(toks) - 1, 0), {CHUNK_STRIDE})")
        ),
    )
    win = F.slice(F.col("toks"), F.col("start") + 1, CHUNK_SIZE)
    return s.select(
        "doc_id",
        F.expr(f"start div {CHUNK_STRIDE}").cast("long").alias("chunk_no"),
        F.size(win).cast("long").alias("n_tokens"),
        F.array_join(win, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# TF-IDF-style keyword extraction (exact-integer weighting, top-k per doc)
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3

_TFIDF_SQL = f"""
    WITH tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest({_sql_tokens('text')}) AS term
            FROM documents)
      GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM (SELECT DISTINCT doc_id, term FROM tf) GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * 1000000 // df.df AS score_micro,
             row_number() OVER (
                 PARTITION BY tf.doc_id
                 ORDER BY tf.tf * 1000000 // df.df DESC, tf.term
             ) AS rk
      FROM tf JOIN df USING (term))
    SELECT doc_id, term, tf, df, CAST(score_micro AS BIGINT) AS score_micro,
           CAST(rk AS BIGINT) AS rk
    FROM scored WHERE rk <= {TFIDF_TOP_K}
"""


@register("text_tfidf_top_terms", _TFIDF_SQL)
def q_text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the TF-IDF idea (frequent in THIS
    doc, rare across the corpus) with the weight computed as the exact
    integer ``tf·10⁶ div df`` instead of ``tf·ln(N/df)`` — ln is not
    guaranteed correctly-rounded across engines, and for a fixed corpus
    the tf/df ratio induces the same within-document ranking family
    while keeping every emitted value integer (driver-hash convention).
    Deterministic tie-break on the term string.

    Physical shape: one (doc, term) count shuffle; document frequency
    folds the SAME aggregated frame (distinct is free — (doc, term) is
    already unique post-groupBy) down to |vocab| rows; the df side joins
    back keyed on term; the top-k filter is a doc_id-partitioned
    row_number window on the scored frame — bounded per-doc sort tasks,
    no global sort. At 100 TB the term join is the big exchange and
    skew-prone on stopwords; AQE skew-split applies, and a production
    variant would broadcast the head of the df table (stopword terms)
    exactly like the salted-agg pattern."""
    d = load(spark, sf_dir, "documents")
    tf = (
        fan_out(d)
        .select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_t, "term").withColumn(
        "score_micro", F.expr("tf * 1000000 div df")
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.col("score_micro").cast("long").alias("score_micro"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup-style within-cluster semantic dedup
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.35  # tuned to the synthetic corpus's similarity range

_SEMDEDUP_SQL = f"""
    WITH dropped AS (
      SELECT DISTINCT e1.label, e1.vec_id
      FROM embeddings e1 JOIN embeddings e2
        ON e1.label = e2.label AND e2.vec_id < e1.vec_id
      WHERE round(list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                         CAST(e2.embedding AS DOUBLE[])), 6)
            >= {SEMDEDUP_TAU})
    SELECT e.label, CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(d.vec_id) AS BIGINT) AS n_dropped,
           CAST(count(*) - count(d.vec_id) AS BIGINT) AS n_kept
    FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.vec_id
    GROUP BY 1
"""


@register("dedup_semantic_clusters", _SEMDEDUP_SQL)
def q_dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023, public): the
    corpus is pre-clustered (the ``label`` column — in production, the
    k-means assignment `embedding_kmeans`/`label_centroids` produces),
    and near-duplicates are pruned WITHIN each cluster only: a vector
    is dropped when a LOWER-id cluster-mate sits above the cosine
    threshold, keeping exactly one representative per near-dup chain
    head. Emits the per-cluster keep/drop census.

    100 TB design — this is the published algorithm's actual cost
    model: clustering bounds the quadratic term to Σ(cluster size)²
    instead of N², and K is chosen to keep clusters tractable. The
    self-join keys on the cluster id (one shuffle per side, skew
    handled by AQE); the Arrow pair-cosine kernel scores candidates;
    both census aggregates collapse to K rows before the final join.
    Unlike the LSH near-dup paths (recall limited by banding), within-
    cluster pruning is EXACT for intra-cluster pairs and blind across
    clusters by construction."""
    e = load(spark, sf_dir, "embeddings")
    ev = e.select(
        "label", "vec_id", "embedding",
        _norm_col(F.col("embedding")).alias("enorm"),
    )
    a = ev.select(
        "label", F.col("vec_id").alias("vid_a"),
        F.col("embedding").alias("va"), F.col("enorm").alias("na"),
    )
    b = ev.select(
        "label", F.col("vec_id").alias("vid_b"),
        F.col("embedding").alias("vb"), F.col("enorm").alias("nb"),
    )
    dropped = (
        a.join(b, "label")
        .where(F.col("vid_b") < F.col("vid_a"))
        .select(
            "label", "vid_a",
            pair_cosine_udf(6)("va", "vb", "na", "nb").alias("c"),
        )
        .where(F.col("c") >= SEMDEDUP_TAU)
        .select("label", F.col("vid_a").alias("vec_id"))
        .distinct()
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    totals = ev.groupBy("label").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        totals.join(dropped, "label", "left")
        .select(
            "label",
            "n_total",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_total") - F.coalesce("n_dropped", F.lit(0))).alias(
                "n_kept"
            ),
        )
    )
