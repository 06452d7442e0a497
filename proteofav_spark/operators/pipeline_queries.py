"""Training-data pipeline operators, part 2: temporal joins (as-of,
banded range join), duplicate-cluster resolution (distributed connected
components), corpus sharding (token-budget packing + ordered shard
concatenation), deterministic stratified sampling / train-val-test
splitting, and per-group exact quantiles.

These extend the LLM-pipeline family in ``operators/llm_queries.py``
(BASELINE.json "north_star": operations a 100 TB training-data pipeline
needs beyond the reference's own operator set). Every operator is a
declarative DataFrame plan with a DuckDB oracle; the connected-components
oracle is a recursive CTE, giving an algorithm-independent check of the
iterative Spark implementation.

Timestamp precision contract: ``events.ts`` is parquet timestamp[us] —
Spark reads it as TIMESTAMP_NTZ, DuckDB as naive TIMESTAMP. All temporal
comparisons here run on INTEGER epoch microseconds on both engines
(``unix_micros`` under the UTC session timezone vs ``epoch_us``) so the
two sides compare bit-identical integers, never floats.

Scale notes (100 TB design):
- the as-of join is the union + partitioned carry-forward formulation: ONE
  shuffle on the join key, no range explosion, no per-row binary search —
  the standard distributed as-of shape (Flink temporal joins / kdb aj
  re-expressed as a Spark window).
- the range join buckets time into window-width cells and joins on
  (key, cell±1) — candidate pairs are bounded by cell occupancy, never N².
- connected components is iterative min-label propagation over the (tiny)
  near-dup edge list: each round is one join + one partial-aggregated
  groupBy, lineage cut by localCheckpoint; near-dup graphs have bounded
  component diameter (measured ≤ 9 vertices at sf0.1), so rounds ≤ ~5.
  For adversarial graphs swap in alternating large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce"), same join shape.
- shard packing windows partition by ``lang`` — at 100 TB the partition
  key widens to (lang, date_bucket) so no single ordered partition grows
  unbounded; the cumulative sum itself is the sequential scan Spark's
  window operator already does partition-locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from proteofav_spark.operators.llm_queries import (
    _MINHASH_SQL,
    _sql_poly_hash,
    _sql_tokens,
    poly_hash_col,
    tokens_col,
)
from proteofav_spark.queries import half_up_ratio, load, register, t_us as _t_us

RANGE_W_S = 7200          # range-join half-window: ±2 hours
SHARD_CAP_TOKENS = 256    # token budget per packed training shard
PACK_STREAM_STRIDE = 256  # docs per packing stream (bounds per-task sort)
SPLIT_SALT = "#v"         # salt for train/val/test hash bucketing
SAMPLE_SALT = "#s"        # salt for stratified sampling hash


# ---------------------------------------------------------------------------
# As-of join (latest right row at-or-before each left row, per key)
# ---------------------------------------------------------------------------

_ASOF_SQL = """
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us
               FROM events),
    p AS (SELECT event_id AS purchase_id, user_id, t_us AS p_t
          FROM e WHERE event_type = 'purchase'),
    c AS (SELECT user_id, t_us AS c_t, MAX(event_id) AS click_id
          FROM e WHERE event_type = 'click' GROUP BY 1, 2)
    SELECT p.purchase_id, p.user_id, c.click_id,
           (p.p_t - c.c_t) // 1000000 AS lag_s
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.c_t <= p.p_t
"""


@register("events_asof_join", _ASOF_SQL)
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the latest click by the same user
    at-or-before the purchase time (left join — purchases with no prior
    click keep NULLs).

    Spark has no ASOF JOIN operator; the scalable formulation is the
    union + carry-forward window: tag both sides, union by (key, time,
    tag) with the right side ordered first on time ties (`<=`
    semantics), and carry the last non-null right row forward. One
    shuffle on the key, sequential scan per key partition — against
    DuckDB's native ASOF JOIN as an algorithm-independent oracle. Right
    rows are pre-deduplicated to one per (key, time) (max event_id),
    making the pick at equal timestamps deterministic in both engines."""
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "t_us")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "t_us", F.col("event_id").alias("purchase_id")
    )
    tagged = clicks.select(
        "user_id", "t_us", F.lit(0).alias("tag"), "click_id",
        F.lit(None).cast("long").alias("purchase_id"),
    ).unionByName(
        purchases.select(
            "user_id", "t_us", F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("click_id"), "purchase_id",
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t_us", "tag", "purchase_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged.select(
        "user_id", "t_us", "tag", "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
        F.last(F.when(F.col("tag") == 0, F.col("t_us")), ignorenulls=True)
        .over(w).alias("c_t"),
    )
    return carried.filter(F.col("tag") == 1).select(
        "purchase_id", "user_id", "click_id",
        F.expr("(t_us - c_t) div 1000000").alias("lag_s"),
    )


# ---------------------------------------------------------------------------
# Banded range join (all right rows within ±W of each left row, per key)
# ---------------------------------------------------------------------------

_RANGE_SQL = f"""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us
               FROM events),
    err AS (SELECT event_id, user_id, t_us FROM e WHERE event_type = 'error'),
    clk AS (SELECT event_id AS click_id, user_id, t_us AS c_t
            FROM e WHERE event_type = 'click')
    SELECT err.event_id, err.user_id,
           CAST(COUNT(clk.click_id) AS BIGINT) AS n_nearby_clicks
    FROM err LEFT JOIN clk
      ON err.user_id = clk.user_id
     AND abs(err.t_us - clk.c_t) <= CAST({RANGE_W_S} AS BIGINT) * 1000000
    GROUP BY err.event_id, err.user_id
"""


@register("events_range_join_bucketed", _RANGE_SQL)
def q_events_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: per error event, how many clicks by the same
    user fall within ±2 h. The naive formulation is a per-key cross join
    with an inequality filter — quadratic in events-per-user. The banded
    plan quantizes time into window-width cells: each error probes its
    own cell ±1 (a 3-element explode), clicks are keyed by their own
    cell, and the join is a plain equi-join on (user, cell) followed by
    the exact |Δt| filter. Candidates are bounded by cell occupancy —
    the same grid trick as the spatial contacts join
    (operators/structures.py), in one dimension. The oracle runs the
    naive inequality join, checking the banding logic independently."""
    w_us = RANGE_W_S * 1_000_000
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "t_us",
        F.expr(f"t_us div {w_us}").alias("cell"),
    )
    clk = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("t_us").alias("c_t"),
        F.expr(f"t_us div {w_us}").alias("cell"),
    )
    probes = err.withColumn(
        "cell", F.explode(F.array(F.col("cell") - 1, F.col("cell"), F.col("cell") + 1))
    )
    matches = probes.join(clk, on=["user_id", "cell"]).filter(
        F.abs(F.col("t_us") - F.col("c_t")) <= w_us
    )
    counts = matches.groupBy("event_id").agg(
        F.count("click_id").alias("n_nearby_clicks")
    )
    return err.select("event_id", "user_id").join(counts, "event_id", "left").select(
        "event_id", "user_id",
        F.coalesce("n_nearby_clicks", F.lit(0)).alias("n_nearby_clicks"),
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution: distributed connected components
# ---------------------------------------------------------------------------

_CC_SQL = f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_MINHASH_SQL})
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT src AS v, src AS r FROM edges
      UNION
      SELECT reach.v, e.dst FROM reach JOIN edges e ON e.src = reach.r
    ),
    lab AS (SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v)
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size,
           doc_id = cluster_id AS is_canonical
    FROM lab
"""


@register("dedup_cc_clusters", _CC_SQL)
def q_dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve MinHash-LSH candidate pairs into duplicate CLUSTERS via
    distributed connected components, and elect the min-doc_id canonical
    per cluster — the step that turns pairwise near-dup hits into a
    deduplicated corpus (keep canonicals, drop the rest).

    Implementation: alternating large-star/small-star (``star_components``)
    — O(log² n) rounds regardless of graph diameter, so chain-shaped
    duplicate components at 100 TB converge where plain min-label
    propagation (round count = diameter) would not. The oracle computes
    components by transitive closure in a recursive CTE — a different
    algorithm, so agreement checks the iteration, not just the
    arithmetic."""
    from proteofav_spark.operators.llm_queries import q_dedup_minhash_lsh

    pairs = (
        q_dedup_minhash_lsh(spark, sf_dir)
        .select("doc_a", "doc_b")
        # lazy: the seed's first action (the pre-loop star-forest test)
        # materializes this in the same job — an eager checkpoint here
        # was a whole extra LSH pair-generation pass (r13 optimization)
        .localCheckpoint(eager=False)
    )
    return star_components(pairs)


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star on a canonically-oriented (doc_a > doc_b) distinct edge
    set: every node connects its strictly-LARGER neighbors to the minimum
    of its closed neighborhood. The symmetric view unions the two
    orientations of an already-distinct set, so no distinct pass is
    needed before the groupBy."""
    sym = edges.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(edges.select(F.col("doc_b"), F.col("doc_a")))
    # m(u) = min over closed neighborhood; v > u ≥ m, so output stays
    # oriented doc_a > doc_b
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
    )
    # no distinct here: duplicate (v, m) pairs don't change small-star's
    # groupBy-min, and the round's single dedup happens at the end of
    # small-star — one exchange saved per round
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("doc_a"), F.col("m").alias("doc_b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star on a canonically-oriented (doc_a > doc_b) distinct edge
    set: every node connects its smaller neighbors (and itself) to its
    minimum smaller neighbor. The orientation IS the large→small edge
    direction, so no symmetrize/filter pass is needed; output stays
    oriented doc_a > doc_b."""
    mins = edges.groupBy("doc_a").agg(F.min("doc_b").alias("m"))
    relinked = edges.join(mins, "doc_a").select(
        F.col("doc_b").alias("doc_a"), F.col("m").alias("doc_b")
    )
    selfed = mins.select("doc_a", F.col("m").alias("doc_b"))
    return (
        relinked.union(selfed)
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )


def star_components(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014): each round shrinks every component toward its minimum
    vertex, converging in O(log² n) rounds REGARDLESS of graph diameter —
    the scale-safe replacement for plain min-label propagation, whose
    round count is the diameter (a 100 TB dedup graph with chain-shaped
    components never finishes there; see ``min_label_components``).

    Per round: two groupBy-min shuffles + two equi-joins, all keyed on
    vertex ids, with ``localCheckpoint`` cutting lineage; edges stay
    canonically oriented (doc_a > doc_b) throughout, so no per-round
    symmetrize-distinct passes. Convergence is detected STRUCTURALLY
    after every round (``_is_star_forest``): the fixed points of
    alternating star rounds are exactly the star forests, and an
    oriented edge set is a star forest iff every ``doc_a`` is unique and
    no vertex appears on both edge sides — one cheap aggregation job
    over the just-checkpointed edges. The test is exact AND fires on the
    converging round itself, where the previous signature-comparison
    scheme burned one full (and redundant) extra star round plus an
    ``exceptAll`` confirmation to observe that nothing changed.

    The star loop runs on a CONTRACTED graph: a single min-label seed
    round maps every vertex to its closed-neighborhood minimum and
    rewrites edges between those labels. Cliques and star-shaped
    components — the overwhelmingly common near-dup cluster shapes —
    collapse to nothing in this one round, and path diameters roughly
    halve, so the O(log² n) star loop usually runs 1-2 fewer rounds; the
    star loop remains the closer for adversarial deep components.
    Output: one row per vertex —
    (doc_id, cluster_id, cluster_size, is_canonical).
    """
    def _is_star_forest(e: DataFrame) -> bool:
        """Exact fixed-point test for the star loop. A canonically
        oriented (doc_a > doc_b) edge set is a star forest iff every
        doc_a has exactly one out-edge and its target is a pure sink —
        i.e. no vertex id is duplicated on the doc_a side or present on
        both sides. Orientation then forces each root below its leaves,
        so roots are their components' minima: exactly the terminal
        state of large-star/small-star (Kiveris et al. §3). ONE job —
        a union + groupBy over the already-materialized (checkpointed)
        edge set, a fraction of a star round's 2-groupBy/2-join cost."""
        return (
            e.select(F.col("doc_a").alias("k"), F.lit(1).alias("a"))
            .union(e.select(F.col("doc_b").alias("k"), F.lit(0)))
            .groupBy("k")
            .agg(F.sum("a").alias("na"), F.count(F.lit(1)).alias("nt"))
            .filter((F.col("na") > 1) | ((F.col("na") >= 1) & (F.col("nt") > F.col("na"))))
            .isEmpty()
        )

    canonical = (
        pairs.filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.greatest("doc_a", "doc_b").alias("doc_a"),
            F.least("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    # --- min-label contraction seed -------------------------------------
    # m(v) = min over v's closed neighborhood. Each vertex contracts to
    # its label; the star loop then runs on edges BETWEEN labels only.
    # One groupBy shuffle + two relabel joins — about the cost of one
    # star round — but cliques/stars vanish and path diameters halve.
    # m is itself a vertex of the same component and the global component
    # minimum r has m(r) = r, so component minima are preserved exactly.
    sym = canonical.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(canonical.select(F.col("doc_b"), F.col("doc_a")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        # reused 3× (both relabel joins + final labels); lazy — the
        # seed's star-forest test is the first action and materializes it
        .localCheckpoint(eager=False)
    )
    contracted = (
        canonical.join(
            mins.select(F.col("u").alias("doc_a"), F.col("m").alias("ma")),
            "doc_a",
        )
        .join(
            mins.select(F.col("u").alias("doc_b"), F.col("m").alias("mb")),
            "doc_b",
        )
        .filter(F.col("ma") != F.col("mb"))
        .select(
            F.greatest("ma", "mb").alias("doc_a"),
            F.least("ma", "mb").alias("doc_b"),
        )
        .distinct()
    )
    # the structural test is exact AND meaningful on the contracted
    # edges themselves (the star loop's fixed points are precisely the
    # star forests), so test BEFORE paying any star round: cliques and
    # star-shaped components — the overwhelmingly common near-dup
    # shapes — already collapse to a star forest (often the empty set)
    # under the seed contraction, and the common case then costs only
    # the seed + one tiny test job. The test is a fraction of a star
    # round's 2-groupBy/2-join price, so even when it fails the round
    # it buys back later is pure profit.
    # LAZY localCheckpoint (r13 optimization): the star-forest test that
    # follows every (re)build of the edge set is itself an action whose
    # shuffle map side scans every edge partition, so it doubles as the
    # checkpoint materializer — the former eager-materialize-then-test
    # scheme paid one extra full pass over the edges per round (and at
    # the seed) purely to checkpoint them. The observed row count the
    # old scheme collected is subsumed by the test: an empty edge set IS
    # a star forest (guide §1.2 — remove passes, don't speed them up).
    edges = contracted.localCheckpoint(eager=False)
    rounds = 0
    while not _is_star_forest(edges):
        if rounds >= max_rounds:
            raise RuntimeError(
                "large-star/small-star did not reach a fixed point in "
                f"{max_rounds} rounds — O(log² n) convergence implies an "
                "edge-set cycle bug, not a graph-shape limitation"
            )
        # localCheckpoint EVERY round: both star operators reference their
        # input twice, so an untruncated logical plan quadruples in size
        # per round and driver-side analysis time explodes — the
        # checkpoint resets the tree to a leaf.
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        rounds += 1
    # converged edge set maps contracted label → component-min; compose
    # with the seed labels: v → m(v) → cluster. Roots have no out-edge.
    # ``mins`` doubles as the vertex set (every vertex of the symmetric
    # view has exactly one row) — no separate union-distinct pass needed.
    labels = (
        mins.select(F.col("u").alias("doc_id"), "m")
        .join(
            edges.select(F.col("doc_a").alias("m"), F.col("doc_b").alias("lbl")),
            "m",
            "left",
        )
        .select("doc_id", F.coalesce("lbl", "m").alias("cluster_id"))
    )
    # cluster_size via a partitioned window count: one shuffle on
    # cluster_id, replacing the groupBy + join-back pair (two shuffles)
    return labels.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1))
        .over(W.partitionBy("cluster_id"))
        .alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def min_label_components(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Min-label propagation over an undirected edge list (doc_a, doc_b)
    → one row per vertex: (doc_id, cluster_id, cluster_size,
    is_canonical). Raises if the graph diameter exceeds ``max_rounds``
    rather than returning split components."""
    sym = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b"), F.col("doc_a")))
    # seed with round-1 labels directly: lbl_1(v) = min(v, min neighbors)
    # — the same groupBy shuffle the plain distinct would cost, one full
    # propagation round saved
    labels = (
        sym.groupBy(F.col("src").alias("v"))
        .agg(F.least(F.min("dst"), F.min("src")).alias("lbl"))
        .localCheckpoint()
    )
    changed = 0  # bound for the raise below even when max_rounds == 0
    for _ in range(max_rounds):
        nbr = sym.join(
            labels.withColumnRenamed("v", "src"), "src"
        ).select(F.col("dst").alias("v"), "lbl", F.lit(False).alias("own"))
        # carry each vertex's previous label through the aggregation
        # (labels has exactly one row per v, so min-over-own is that row)
        # — the convergence check becomes a filter over the checkpointed
        # result instead of a labels⋈labels shuffle join every round
        new = (
            labels.withColumn("own", F.lit(True))
            .unionByName(nbr)
            .groupBy("v")
            .agg(
                F.min("lbl").alias("lbl"),
                F.min(F.when(F.col("own"), F.col("lbl"))).alias("old_lbl"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("lbl") != F.col("old_lbl")).count()
        labels = new.select("v", "lbl")
        if changed == 0:
            break
    else:
        # a silent non-converged exit would emit one true component as
        # several cluster_ids (several canonicals) and the downstream
        # keep-canonicals dedup would quietly retain duplicates
        raise RuntimeError(
            "connected-components min-label propagation did not converge "
            f"in {max_rounds} rounds ({changed} labels still changing); "
            "graph diameter exceeds the round cap — switch to the "
            "large-star/small-star variant for this input"
        )
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labels.join(sizes, "lbl").select(
        F.col("v").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        "cluster_size",
        (F.col("v") == F.col("lbl")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# Corpus sharding: token-budget packing + ordered shard concatenation
# ---------------------------------------------------------------------------

_PACK_SQL = f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len({_sql_tokens("text")}) AS BIGINT) AS n_tokens,
             doc_id // {PACK_STREAM_STRIDE} AS stream
      FROM documents),
    l AS (
      SELECT doc_id, lang, n_tokens, stream,
             CAST((SUM(n_tokens) OVER (PARTITION BY lang, stream
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) // {SHARD_CAP_TOKENS} AS BIGINT)
                 AS local_shard
      FROM t),
    s AS (
      SELECT lang, stream, MAX(local_shard) + 1 AS n_shards
      FROM l GROUP BY lang, stream),
    o AS (
      SELECT lang, stream,
             SUM(n_shards) OVER (PARTITION BY lang ORDER BY stream)
                 - n_shards AS off
      FROM s)
    SELECT l.doc_id, l.lang, l.n_tokens,
           CAST(o.off + l.local_shard AS BIGINT) AS shard_id
    FROM l JOIN o ON l.lang = o.lang AND l.stream = o.stream
"""


def packed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to a training shard: within each
    ``(lang, stream)`` packing stream (stream = doc_id div
    PACK_STREAM_STRIDE) ordered by doc_id, a shard is a run of documents
    whose cumulative whitespace-token count stays under SHARD_CAP_TOKENS
    (start-offset rule: shard = floor(preceding-cumsum / cap), so a
    document lands in the shard its first token falls into). Per-stream
    shard counts then roll up into per-stream OFFSETS (one tiny row per
    stream, broadcast back), making shard ids contiguous per lang while
    no sort task ever sees more than STRIDE documents — the composite
    key is what keeps packing scale-safe: with ``lang`` alone the
    English partition of a 100 TB corpus is one task doing one giant
    sort. Shards never span streams (a stream boundary starts a fresh
    shard)."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", "text",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.expr(f"doc_id div {PACK_STREAM_STRIDE}").alias("stream"),
    )
    w = (
        W.partitionBy("lang", "stream")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = t.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "local_shard", F.expr(f"(cum - n_tokens) div {SHARD_CAP_TOKENS}")
    )
    # one row per stream — tiny at any scale (corpus_size / STRIDE), so the
    # offset join broadcasts; the cumulative offset window runs on that
    # tiny frame, not the corpus
    streams = local.groupBy("lang", "stream").agg(
        (F.max("local_shard") + 1).alias("n_shards")
    )
    ow = (
        W.partitionBy("lang")
        .orderBy("stream")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = streams.withColumn(
        "off", F.sum("n_shards").over(ow) - F.col("n_shards")
    ).select("lang", "stream", "off")
    return local.join(F.broadcast(offsets), ["lang", "stream"]).withColumn(
        "shard_id", F.col("off") + F.col("local_shard")
    )


@register("pack_token_shards", _PACK_SQL)
def q_pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment (sequence packing for LLM training
    shards): see :func:`packed_documents` — composite (lang, stream)
    packing key + per-stream offsets, so no ordered partition is
    unbounded at 100 TB."""
    return packed_documents(spark, sf_dir).select(
        "doc_id", "lang", "n_tokens", "shard_id"
    )


_SHARD_CONCAT_SQL = f"""
    WITH c AS ({_PACK_SQL})
    SELECT c.lang, c.shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(c.n_tokens) AS BIGINT) AS shard_tokens,
           md5(string_agg(d.text, chr(30) ORDER BY c.doc_id)) AS shard_md5
    FROM c JOIN documents d ON c.doc_id = d.doc_id
    GROUP BY c.lang, c.shard_id
"""


@register("shard_concat_digest", _SHARD_CONCAT_SQL)
def q_shard_concat_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize packed shards: per (lang, shard), concatenate member
    documents in doc_id order with a RS (0x1e) separator and emit the
    digest + token total — the write-side of shard packing (the digest
    stands in for the shard payload so the oracle compares content, not
    multi-KB strings). Order inside ``collect_list`` is not guaranteed,
    so members collect as (doc_id, text) structs and ``array_sort``
    imposes the order before joining.

    r13 restructure (guide §2.3/§2.4, §8: one pass over the payload,
    decisions on small rows). Composing ``packed_documents`` with the
    shard groupBy planned the corpus subtree TWICE (its ``local`` frame
    feeds both the per-stream offsets rollup and the output join): two
    full document scans, the whitespace tokenizer run twice over every
    text, two corpus-wide (lang, stream) window sorts — and ``text``
    crossed two exchanges (the window exchange, then again inside
    ``collect_list`` partial buffers to the (lang, shard_id) agg).
    Since no shard spans a stream, (lang, shard_id) ≡ (lang, stream,
    local_shard), so the member aggregation can run directly on the
    window's (lang, stream) partitioning — zero new exchanges, text
    moves exactly once — and the per-stream/offset rollup runs on the
    AGGREGATED one-row-per-shard frame instead of the corpus. The tiny
    shard frame is lazily localCheckpoint'ed because it is consumed
    twice (offsets rollup + output join); that single materialization
    is what removes the second corpus pass. shard_id = off + local_shard
    exactly as in ``packed_documents`` (n_shards = max(local_shard)+1
    per stream has the same value on the shard frame as on the doc
    frame), so the output is row-identical to the composed form."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", "text",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.expr(f"doc_id div {PACK_STREAM_STRIDE}").alias("stream"),
    )
    w = (
        W.partitionBy("lang", "stream")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = t.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "local_shard", F.expr(f"(cum - n_tokens) div {SHARD_CAP_TOKENS}")
    )
    members = F.array_sort(
        F.collect_list(F.struct("doc_id", "text"))
    )
    shards = (
        local.groupBy("lang", "stream", "local_shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.md5(
                F.array_join(
                    F.transform(members, lambda m: m["text"]), "\x1e"
                )
            ).alias("shard_md5"),
        )
        .localCheckpoint(eager=False)
    )
    streams = shards.groupBy("lang", "stream").agg(
        (F.max("local_shard") + 1).alias("n_shards")
    )
    ow = (
        W.partitionBy("lang")
        .orderBy("stream")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = streams.withColumn(
        "off", F.sum("n_shards").over(ow) - F.col("n_shards")
    ).select("lang", "stream", "off")
    return shards.join(F.broadcast(offsets), ["lang", "stream"]).select(
        "lang",
        (F.col("off") + F.col("local_shard")).alias("shard_id"),
        "n_docs",
        "shard_tokens",
        "shard_md5",
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling and train/val/test splitting
# ---------------------------------------------------------------------------

def _sample_rate_pct() -> F.Column:
    return F.when(F.col("lang") == "en", F.lit(50)).otherwise(F.lit(25))


_SAMPLE_SQL = f"""
    SELECT doc_id, lang,
           {_sql_poly_hash(f"CAST(doc_id AS VARCHAR) || '{SAMPLE_SALT}'")} % 100
               AS h_bucket
    FROM documents
    WHERE {_sql_poly_hash(f"CAST(doc_id AS VARCHAR) || '{SAMPLE_SALT}'")} % 100
          < CASE WHEN lang = 'en' THEN 50 ELSE 25 END
"""


@register("sample_stratified_hash", _SAMPLE_SQL)
def q_sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a per-stratum rate (50%
    of 'en', 25% of the rest) chosen by a salted polynomial hash of the
    document id — reproducible across runs, engines, and partitionings,
    unlike ``df.sample`` whose output depends on partition layout. This
    is the sampling contract a training pipeline needs: membership is a
    pure function of (id, salt), so reshuffles and retries can't change
    the corpus. Map-only — no shuffle at any scale."""
    d = load(spark, sf_dir, "documents")
    h = poly_hash_col(
        F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT))
    ) % 100
    return (
        d.withColumn("h_bucket", h)
        .filter(F.col("h_bucket") < _sample_rate_pct())
        .select("doc_id", "lang", "h_bucket")
    )


_SPLIT_SQL = f"""
    WITH b AS (
      SELECT lang,
             CAST(len({_sql_tokens("text")}) AS BIGINT) AS n_tokens,
             {_sql_poly_hash(f"CAST(doc_id AS VARCHAR) || '{SPLIT_SALT}'")} % 100
                 AS bucket
      FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM b GROUP BY 1, 2
"""


@register("split_train_val_test", _SPLIT_SQL)
def q_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucketed 80/10/10 train/val/test assignment (salted so it is
    independent of the sampling hash), reported as per-(split, lang) doc
    and token counts. Assignment is a pure function of doc_id — stable
    under re-partitioning, incremental ingest, and engine changes, which
    is what keeps eval sets leak-free over time."""
    d = load(spark, sf_dir, "documents")
    bucket = poly_hash_col(
        F.concat(F.col("doc_id").cast("string"), F.lit(SPLIT_SALT))
    ) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(
            split.alias("split"), "lang",
            F.size(tokens_col()).cast("long").alias("n_tokens"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Per-group exact quantiles
# ---------------------------------------------------------------------------

_QUANTILES_SQL = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.90), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
"""


@register("agg_quantiles_value", _QUANTILES_SQL)
def q_agg_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group continuous quantiles of the event value (Spark
    ``percentile`` ↔ DuckDB ``quantile_cont``, both linear-interpolation;
    outputs round to 6 dp because the two engines' interpolation
    arithmetic differs in the last few ulps). Exact percentile sorts
    per group — fine for low-cardinality groups; at 100 TB with many
    groups the approximate path is ``approx_percentile`` (t-digest
    sketch, mergeable map-side), same call shape."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", 0.25), 6).alias("p25"),
        F.round(F.percentile("value", 0.50), 6).alias("p50"),
        F.round(F.percentile("value", 0.90), 6).alias("p90"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# Product-analytics shapes a training-data/events pipeline needs at scale:
# cohort retention and ordered funnels
# ---------------------------------------------------------------------------

WEEK_US = 7 * 86_400 * 1_000_000

_RETENTION_SQL = f"""
    WITH uw AS (
      SELECT user_id, epoch_us(ts) // {WEEK_US} AS wk
      FROM events GROUP BY 1, 2),
    coh AS (SELECT user_id, MIN(wk) AS cohort_week FROM uw GROUP BY 1)
    SELECT coh.cohort_week,
           uw.wk - coh.cohort_week AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM uw JOIN coh USING (user_id)
    GROUP BY 1, 2
"""


@register("events_retention_cohorts", _RETENTION_SQL)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in every later week they were active — the canonical product-health
    rollup. Two shuffles at any scale: distinct (user, week) activity
    (partial-aggregated), then the per-user first-week join + the final
    (cohort, offset) aggregation; the activity frame is already one row
    per (user, week), so the join fan-out is bounded by active weeks."""
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    return retention_matrix(e)


def retention_matrix(e: DataFrame, bucket_us: int = WEEK_US) -> DataFrame:
    """Library core of the cohort retention query — ``e`` carries
    (user_id, t_us); buckets by ``bucket_us``-wide periods."""
    uw = e.select(
        "user_id", F.expr(f"t_us div {bucket_us}").alias("wk")
    ).distinct()
    coh = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        uw.join(coh, "user_id")
        .groupBy(
            "cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_FUNNEL_SQL = """
    WITH base AS (
      SELECT user_id,
             list(struct_pack(t := epoch_us(ts), et := event_type)) AS evs
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY user_id),
    s1 AS (
      SELECT user_id, evs,
             list_min(list_transform(
               list_filter(evs, e -> e.et = 'view'), e -> e.t)) AS v
      FROM base),
    s2 AS (
      SELECT user_id, evs, v,
             list_min(list_transform(
               list_filter(evs, e -> e.et = 'click' AND e.t > v),
               e -> e.t)) AS c
      FROM s1),
    s3 AS (
      SELECT v, c,
             list_min(list_transform(
               list_filter(evs, e -> e.et = 'purchase' AND e.t > c),
               e -> e.t)) AS p
      FROM s2)
    SELECT 'view' AS stage, CAST(COUNT(v) AS BIGINT) AS n_users FROM s3
    UNION ALL
    SELECT 'view_click', CAST(COUNT(c) AS BIGINT) FROM s3
    UNION ALL
    SELECT 'view_click_purchase', CAST(COUNT(p) AS BIGINT) FROM s3
"""


@register("events_funnel_conversion", _FUNNEL_SQL)
def q_events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked strictly AFTER the
    first view, then purchased strictly after that click — sequence
    semantics a plain per-type count can't express.

    One shuffle: funnel-relevant events (pre-filtered to the 3 stage
    types, which bounds per-user arrays) collect per user, and the
    stage chain evaluates as array higher-order functions — each stage's
    anchor timestamp feeds the next stage's filter, with NULL anchors
    (stage never reached) collapsing the downstream filters to empty.
    A NULL-condition element is dropped by both engines' array filter,
    so the chain needs no explicit null branches."""
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    return funnel_stages(e)


def funnel_stages(
    e: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Library core of the ordered funnel — ``e`` carries (user_id, t_us,
    event_type); returns one (stage, n_users) row per cumulative stage."""
    base = (
        e.filter(F.col("event_type").isin(*stages))
        .groupBy("user_id")
        .agg(
            F.collect_list(
                F.struct(F.col("t_us").alias("t"), F.col("event_type").alias("et"))
            ).alias("evs")
        )
    )
    def first_of(arr, cond):
        return F.array_min(
            F.transform(F.filter(arr, cond), lambda x: x.getField("t"))
        )

    # closure factories, not default-arg lambdas: PySpark derives HOF
    # lambda arity from the signature, so extra bound parameters break it
    def is_stage(sn):
        return lambda x: x.getField("et") == sn

    def is_stage_after(sn, prev_col):
        return lambda x: (x.getField("et") == sn) & (
            x.getField("t") > F.col(prev_col)
        )

    chained = base
    anchors: list[str] = []
    for i, stage_name in enumerate(stages):
        cond = (
            is_stage(stage_name)
            if not anchors
            else is_stage_after(stage_name, anchors[-1])
        )
        col = f"_a{i}"
        chained = chained.withColumn(col, first_of(F.col("evs"), cond))
        anchors.append(col)
    counts = chained.agg(
        *[F.count(c).alias(f"_n{i}") for i, c in enumerate(anchors)]
    )
    stack_args = ", ".join(
        f"'{'_'.join(stages[: i + 1])}', _n{i}" for i in range(len(stages))
    )
    return counts.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS (stage, n_users)"
    )


# ---------------------------------------------------------------------------
# Time-series gap fill + linear interpolation
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000

_GAPFILL_SQL = f"""
    WITH m AS (
      SELECT user_id, epoch_us(ts) // {HOUR_US} AS hr,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    s AS (SELECT user_id, min(hr) AS lo, max(hr) AS hi FROM m GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS hr FROM s),
    g AS (SELECT grid.user_id, grid.hr, m.sc, m.n
          FROM grid LEFT JOIN m USING (user_id, hr)),
    f AS (
      SELECT user_id, hr, sc, n,
        last_value(sc IGNORE NULLS) OVER wp AS psc,
        last_value(n IGNORE NULLS) OVER wp AS pn,
        last_value(CASE WHEN n IS NOT NULL THEN hr END IGNORE NULLS)
            OVER wp AS ph,
        first_value(sc IGNORE NULLS) OVER wf AS nsc,
        first_value(n IGNORE NULLS) OVER wf AS nxn,
        first_value(CASE WHEN n IS NOT NULL THEN hr END IGNORE NULLS)
            OVER wf AS nh
      FROM g
      WINDOW wp AS (PARTITION BY user_id ORDER BY hr
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY hr
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, hr,
           CAST(CASE WHEN n IS NOT NULL
                THEN (2 * sc * 10000 + n) // (2 * n)
                ELSE (2 * (CAST(psc AS HUGEINT) * nxn * (nh - ph)
                           + (CAST(nsc AS HUGEINT) * pn
                              - CAST(psc AS HUGEINT) * nxn) * (hr - ph)) * 10000
                      + CAST(pn AS HUGEINT) * nxn * (nh - ph))
                     // (2 * CAST(pn AS HUGEINT) * nxn * (nh - ph))
                END AS DOUBLE) / 1000000 AS value_filled,
           n IS NOT NULL AS is_observed
    FROM f
"""


@register("events_gapfill_interpolate", _GAPFILL_SQL)
def q_events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an event stream into a dense per-user hourly series:
    aggregate observed hours, generate every hour between each user's
    first and last active hour (``sequence`` + explode — no calendar
    dimension table), and linearly interpolate the missing buckets from
    the surrounding observations — the standard feature-store /
    monitoring "resample + interpolate" primitive.

    100 TB shape: everything keys on user_id — one shuffle to the
    (user, hour) aggregate, one to the per-user span, and the
    fill/interpolate pass is two frame-bounded window specs over the
    SAME (user_id, hr) sort, so Spark plans a single per-user sort with
    no global ordering anywhere. Grid fan-out is bounded by each user's
    own activity span (never min(all)..max(all) × users), so one
    long-lived user cannot explode another's partition; per-user rows =
    span hours, the same row count a time-series store would hold.

    Cross-engine determinism: interpolating double averages puts gap
    midpoints on exact decimal-rounding boundaries, where Spark's
    ``round`` (shortest-repr BigDecimal HALF_UP) and a numeric double
    round systematically disagree in the last digit — so the whole
    computation runs in EXACT integer cents (values carry 2 decimals):
    per-hour (sum_cents, n), linear interpolation as one bigint
    fraction, and HALF_UP discretization to micro-units via
    ``(2·N·10⁴ + D) div (2·D)`` — every intermediate is a bigint both
    engines compute identically, and the final micro-int → double cast
    is exact."""
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    cents = F.round(F.col("value") * 100).cast("long")
    m = e.groupBy(
        "user_id", F.expr(f"t_us div {HOUR_US}").alias("hr")
    ).agg(F.sum(cents).alias("sc"), F.count(F.lit(1)).alias("n"))
    span = m.groupBy("user_id").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    g = grid.join(m, ["user_id", "hr"], "left")
    wp = (
        W.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_hr = F.when(F.col("n").isNotNull(), F.col("hr"))
    f = g.select(
        "user_id", "hr", "sc", "n",
        F.last("sc", ignorenulls=True).over(wp).alias("psc"),
        F.last("n", ignorenulls=True).over(wp).alias("pn"),
        F.last(obs_hr, ignorenulls=True).over(wp).alias("ph"),
        F.first("sc", ignorenulls=True).over(wf).alias("nsc"),
        F.first("n", ignorenulls=True).over(wf).alias("nxn"),
        F.first(obs_hr, ignorenulls=True).over(wf).alias("nh"),
    )
    # the interpolation branch multiplies cents-sums by counts by gap
    # widths before the 10⁴ scale-up — widened to DECIMAL(38,0)
    # (HUGEINT in the oracle) so an adversarial (hot user × long gap)
    # cell can't overflow a bigint product on either engine
    u6 = F.expr(
        "CASE WHEN n IS NOT NULL"
        "  THEN (2 * sc * 10000 + n) div (2 * n)"
        "  ELSE (2 * (CAST(psc AS DECIMAL(38,0)) * nxn * (nh - ph)"
        "             + (CAST(nsc AS DECIMAL(38,0)) * pn"
        "                - CAST(psc AS DECIMAL(38,0)) * nxn) * (hr - ph)) * 10000"
        "        + CAST(pn AS DECIMAL(38,0)) * nxn * (nh - ph))"
        "       div (2 * CAST(pn AS DECIMAL(38,0)) * nxn * (nh - ph)) END"
    )
    return f.select(
        "user_id",
        "hr",
        (u6.cast("double") / 1_000_000).alias("value_filled"),
        F.col("n").isNotNull().alias("is_observed"),
    )


# ---------------------------------------------------------------------------
# Trailing-window anomaly detection (z-score over a RANGE frame)
# ---------------------------------------------------------------------------

ZSCORE_TRAIL_H = 24   # trailing baseline: previous 24 hours
ZSCORE_SPIKE = 2.0    # |z| above this flags a spike

_ZSCORE_SQL = f"""
    WITH m AS (
      SELECT user_id, epoch_us(ts) // {HOUR_US} AS hr,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT user_id, hr, n_events,
             avg(n_events) OVER t AS mu,
             stddev_samp(n_events) OVER t AS sd,
             count(*) OVER t AS n_base
      FROM m
      WINDOW t AS (PARTITION BY user_id ORDER BY hr
                   RANGE BETWEEN {ZSCORE_TRAIL_H} PRECEDING
                             AND 1 PRECEDING))
    SELECT user_id, hr, n_events,
           CASE WHEN sd > 0 THEN round((n_events - mu) / sd, 4) END AS z,
           CAST(n_base AS BIGINT) AS n_baseline_hours,
           COALESCE(sd > 0 AND abs((n_events - mu) / sd) > {ZSCORE_SPIKE},
                    FALSE) AS is_spike
    FROM w
"""


@register("events_anomaly_zscore", _ZSCORE_SQL)
def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly event-rate anomalies: each active hour's event
    count is z-scored against that user's own trailing 24-hour baseline
    and flagged when it deviates more than 2σ — the standard
    rate-monitoring primitive.

    The baseline is a RANGE frame over the integer hour (24 PRECEDING …
    1 PRECEDING), NOT a ROWS frame: users with inactive hours have gaps
    in the (user, hr) grid, and a ROWS frame would silently stretch the
    baseline window across them. One shuffle to the (user, hour) counts;
    the window partitions by user over the same key, and its running
    mean/stddev state is O(frame) per partition. Hours with a flat
    baseline (sd = 0) or no history yield NULL z and never flag."""
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    m = e.groupBy(
        "user_id", F.expr(f"t_us div {HOUR_US}").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    t = (
        W.partitionBy("user_id")
        .orderBy("hr")
        .rangeBetween(-ZSCORE_TRAIL_H, -1)
    )
    mu = F.avg("n_events").over(t)
    sd = F.stddev_samp("n_events").over(t)
    z = (F.col("n_events") - mu) / sd
    return m.select(
        "user_id",
        "hr",
        "n_events",
        F.when(sd > 0, F.round(z, 4)).alias("z"),
        F.count(F.lit(1)).over(t).alias("n_baseline_hours"),
        F.coalesce(
            (sd > 0) & (F.abs(z) > ZSCORE_SPIKE), F.lit(False)
        ).alias("is_spike"),
    )


# ---------------------------------------------------------------------------
# Behavioral transition matrix (event-type bigrams per user)
# ---------------------------------------------------------------------------

_TRANSITIONS_SQL = """
    WITH s AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS dst
      FROM events),
    n AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n_pairs
          FROM s WHERE dst IS NOT NULL GROUP BY 1, 2)
    SELECT src, dst, n_pairs,
           CAST((2 * CAST(n_pairs AS HUGEINT) * 1000000
                 + sum(n_pairs) OVER (PARTITION BY src))
                // (2 * sum(n_pairs) OVER (PARTITION BY src)) AS DOUBLE)
           / 1000000 AS p
    FROM n
"""


@register("events_session_transitions", _TRANSITIONS_SQL)
def q_events_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each consecutive (event, next-event) pair the count
    and the row-normalized transition probability — the standard
    user-behavior-model / next-event-prediction feature.

    100 TB shape: the ``lead`` window partitions by user_id (bounded
    per-user sort tasks, one shuffle), the bigram count partial-
    aggregates map-side down to at most |types|² rows, and the
    normalizing ``sum over (partition by src)`` window runs on that
    tiny aggregated frame — never on the raw events. Ties in ts break
    on event_id so both engines see the same sequence."""
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    seq = W.partitionBy("user_id").orderBy("t_us", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(seq).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    norm = F.sum("n_pairs").over(W.partitionBy("src"))
    # p at 6 dp via the exact-integer round-half-up trick — an integer
    # quotient rounded as (2a+b) div (2b) is bit-identical on every
    # engine, where round(double, 6) diverges on half-way boundaries
    # (the class of bug that cost events_twap its round-3 driver row).
    # n_pairs widens to DECIMAL(38,0) first: past ~4.6e12 transitions
    # per (src,dst) the 2·10⁶-scaled bigint product would overflow on
    # Spark; the oracle widens its numerator to HUGEINT the same way,
    # so both engines stay exact to ~10³⁸.
    return (
        pairs.withColumn("_tot", norm)
        .select(
            "src",
            "dst",
            "n_pairs",
            (
                F.expr(
                    "(2 * CAST(n_pairs AS DECIMAL(38,0)) * 1000000 + _tot)"
                    " div (2 * CAST(_tot AS DECIMAL(38,0)))"
                ).cast("double")
                / 1_000_000
            ).alias("p"),
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP) per user
# ---------------------------------------------------------------------------

_TWAP_SQL = """
    WITH s AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS vc,
             lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dt
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dt) // 1000000 AS BIGINT) AS span_s,
           CAST(sum(vc * dt) AS BIGINT) AS twap_num,
           CAST(sum(dt) AS BIGINT) AS twap_den
    FROM s WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
"""


@register("events_twap", _TWAP_SQL)
def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event value: each value is
    held until the user's next event and weighted by that holding
    duration — the TWAP primitive (prices, sensor readings, resource
    gauges), where a plain AVG would over-weight bursts.

    Cross-engine determinism: values carry 2 decimals, so the weighted
    sum runs in exact integer cents·µs (``sum(vc·dt)`` — bigint on both
    engines, order-independent). The result is emitted as the EXACT
    integer pair ``twap_num`` (cents·µs) / ``twap_den`` (µs) — no float
    division at all, so no engine-specific round-half behavior can
    diverge (the round-3 driver hash mismatch was a ``round(double, 6)``
    half-way boundary; callers compute ``twap_num / (100·twap_den)``
    themselves at whatever precision they need). At 100 TB the bigint
    numerator caps around 9·10¹⁸ (≈ 10⁶ cents × ~10¹² µs-weighted rows
    per user); past that, widen the accumulator to DECIMAL(38,0) — same
    plan shape. One user-partitioned window (bounded sort tasks) + one
    partial-aggregated groupBy."""
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    seq = W.partitionBy("user_id").orderBy("t_us", "event_id")
    s = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
        (F.lead("t_us").over(seq) - F.col("t_us")).alias("dt"),
    ).where(F.col("dt").isNotNull() & (F.col("dt") > 0))
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.expr("sum(dt) div 1000000").alias("span_s"),
        F.sum(F.col("vc") * F.col("dt")).cast("long").alias("twap_num"),
        F.sum("dt").cast("long").alias("twap_den"),
    )


# ---------------------------------------------------------------------------
# Last-touch attribution (purchases credited to the preceding touchpoint)
# ---------------------------------------------------------------------------

ATTR_WINDOW_US = 7 * 86_400 * 1_000_000  # attribution lookback: 7 days

_ATTRIB_SQL = f"""
    WITH s AS (
      SELECT event_type, epoch_us(ts) AS t_us,
             CAST(round(value * 100) AS BIGINT) AS vc,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS) OVER w AS touch,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN epoch_us(ts) END IGNORE NULLS) OVER w AS touch_t
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT COALESCE(CASE WHEN touch_t >= t_us - {ATTR_WINDOW_US}
                         THEN touch END, 'direct') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(vc) AS DOUBLE) / 100.0 AS revenue
    FROM s WHERE event_type = 'purchase'
    GROUP BY 1
"""


@register("events_attribution_last_touch", _ATTRIB_SQL)
def q_events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent preceding view/click within a 7-day
    lookback, else to 'direct' — counts and exact-cents revenue per
    channel.

    The carry-forward is ``last(..., ignorenulls)`` over a
    user-partitioned ROWS frame ending at 1 PRECEDING (the purchase
    itself must not self-attribute): one user-keyed shuffle + bounded
    per-user sort, the same single-pass shape as the as-of join above —
    no per-purchase range join, no re-scan per channel. The final
    rollup partial-aggregates to ≤ |channels| rows."""
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    w = (
        W.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")
    s = e.select(
        "event_type", "t_us",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w).alias("touch"),
        F.last(F.when(is_touch, F.col("t_us")), ignorenulls=True)
        .over(w).alias("touch_t"),
    ).where(F.col("event_type") == "purchase")
    channel = F.coalesce(
        F.when(
            F.col("touch_t") >= F.col("t_us") - ATTR_WINDOW_US, F.col("touch")
        ),
        F.lit("direct"),
    )
    return s.groupBy(channel.alias("channel")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        (F.sum("vc").cast("double") / 100.0).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Skew diagnostic: heavy-hitter keys with frequency share
# ---------------------------------------------------------------------------

SKEW_TOP_N = 20

_SKEW_SQL = f"""
    WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1),
    t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM c)
    SELECT c.user_id, c.n_events,
           CAST((2 * c.n_events * 1000000 + t.total) // (2 * t.total)
                AS BIGINT) / 1000000.0 AS share
    FROM c, t
    ORDER BY c.n_events DESC, c.user_id
    LIMIT {SKEW_TOP_N}
"""


@register("skew_heavy_hitters", _SKEW_SQL)
def q_skew_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of a join/aggregation key: the top-20 most
    frequent user_ids with their share of all events — the diagnostic
    run BEFORE choosing a salting factor or enabling AQE skew-join on a
    100 TB shuffle (a key holding >1% of the data is the classic
    straggler source).

    Plan shape: partial-aggregated key counts (one shuffle), the grand
    total reduced to a one-row broadcast (no unpartitioned window over
    the key frame — at scale that frame has millions of rows), and the
    top-N collapses to TakeOrderedAndProject: per-partition 20-row
    heaps, a 20-row driver merge, no global sort. Ties break on
    user_id so the cut is deterministic across engines."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = c.agg(F.sum("n_events").alias("total"))
    return (
        c.crossJoin(F.broadcast(total))
        # exact BIGINT half-up share — round(int/int, 6) is the 2^a*5^b
        # boundary cousin (review r8)
        .select(
            "user_id", "n_events",
            half_up_ratio("n_events", "total", 6).alias("share"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(SKEW_TOP_N)
    )


# ---------------------------------------------------------------------------
# Engagement rollup: DAU / MAU / stickiness per calendar month
# ---------------------------------------------------------------------------

DAY_US = 86_400_000_000

_DAU_MAU_SQL = f"""
    WITH a AS (
      SELECT DISTINCT year(ts) * 12 + month(ts) - 1 AS mo,
             epoch_us(ts) // {DAY_US} AS d,
             user_id
      FROM events)
    SELECT mo,
           CAST(count(DISTINCT user_id) AS BIGINT) AS mau,
           CAST(count(DISTINCT d) AS BIGINT) AS active_days,
           CAST(count(*) AS BIGINT) AS user_days,
           CAST((2 * count(*) * 1000000
                 + count(DISTINCT d) * count(DISTINCT user_id))
                // (2 * count(DISTINCT d) * count(DISTINCT user_id))
                AS BIGINT) / 1000000.0 AS stickiness
    FROM a GROUP BY mo
"""


@register("events_dau_mau", _DAU_MAU_SQL)
def q_events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement rollup: monthly active users, active days, total
    user-days, and stickiness (mean DAU over active days ÷ MAU — the
    DAU/MAU ratio every growth dashboard tracks), per calendar month.

    One distinct shuffle reduces raw events to (month, day, user) rows;
    the month rollup then runs two exact count-distincts, which Spark
    expands into mergeable two-stage aggregations — no driver state, no
    window. Calendar months use integer year·12+month arithmetic and
    days use integer epoch-day division, so both engines bucket
    identically; the single stickiness division is the only float."""
    e = load(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    a = e.select(
        (F.year(ts) * 12 + F.month(ts) - 1).cast("long").alias("mo"),
        F.expr(f"unix_micros(cast(ts as timestamp)) div {DAY_US}").alias("d"),
        "user_id",
    ).distinct()
    return (
        a.groupBy("mo")
        .agg(
            F.countDistinct("user_id").alias("mau"),
            F.countDistinct("d").alias("active_days"),
            F.count(F.lit(1)).alias("user_days"),
        )
        # exact BIGINT half-up stickiness (the int/int boundary cousin)
        .select(
            "mo", "mau", "active_days", "user_days",
            half_up_ratio(
                "user_days", "(active_days * mau)", 6
            ).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# General as-of join operator: pandas.merge_asof parity on Spark
# ---------------------------------------------------------------------------


def validate_merge_asof_args(
    left_schema,
    right_schema,
    *,
    on: str,
    by: list[str],
    direction: str = "backward",
    tolerance: int | None = None,
    tiebreak: list[str] | None = None,
    right_suffix: str = "_right",
) -> tuple[list[str], list[str]]:
    """The cheap schema/argument contract checks of :func:`merge_asof`,
    callable EAGERLY from wrappers that would otherwise surface them
    mid-run (the streaming enrichment wires merge_asof into a
    foreachBatch, where a bad direction would kill batch 0 inside a
    py4j-wrapped StreamingQueryException instead of a clear ValueError
    at wiring time). Returns (payload columns, tiebreak ordering)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")
    if tolerance is not None:
        from pyspark.sql import types as T

        if not isinstance(left_schema[on].dataType, T.NumericType):
            # the distance arithmetic subtracts on-values and compares
            # to the numeric tolerance literal — a timestamp/date
            # on-column yields an interval and fails at PLAN time,
            # i.e. inside batch 0 for the streaming wrapper, exactly
            # what this eager validator exists to prevent (review r8)
            raise ValueError(
                f"tolerance requires a numeric on-column; {on!r} is "
                f"{left_schema[on].dataType.simpleString()} — convert "
                "event time to epoch units first (see queries.t_us())"
            )
    if left_schema[on].dataType != right_schema[on].dataType:
        # pandas.merge_asof raises on mismatched key dtypes too: a mixed
        # integral/float on-column would otherwise round the float side
        # through the decimal distance widening and silently mis-match
        raise ValueError(
            f"on-column {on!r} type mismatch: left "
            f"{left_schema[on].dataType.simpleString()} vs right "
            f"{right_schema[on].dataType.simpleString()}"
        )
    payload = [
        f.name for f in right_schema if f.name not in set(by) and f.name != on
    ]
    if "_t" in payload:
        # "_t" is the matched-time field inside the internal payload
        # struct; a right column with that name would duplicate the
        # struct field and fail later with an ambiguous-reference error
        raise ValueError("right column '_t' collides with a reserved name")
    ords = tiebreak if tiebreak is not None else payload
    reserved = {"_time", "_tag", "_rp", "_bwd", "_fwd"} | {
        f"_o{i}" for i in range(len(ords))
    }
    left_cols = [f.name for f in left_schema]
    clash = reserved.intersection(left_cols)
    if clash:
        raise ValueError(f"left columns collide with reserved names: {clash}")
    out_names = [f"{on}{right_suffix}"] + [
        c + right_suffix if c in set(left_cols) else c for c in payload
    ]
    dup = sorted(
        {n for n in out_names if n in left_cols or out_names.count(n) > 1}
    )
    if dup:
        raise ValueError(
            f"output columns {dup} collide with left columns or each "
            f"other; pass a different right_suffix"
        )
    return payload, ords


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    direction: str = "backward",
    tolerance: int | None = None,
    tiebreak: list[str] | None = None,
    right_suffix: str = "_right",
) -> DataFrame:
    """General as-of join with ``pandas.merge_asof`` semantics —
    ``backward`` (latest right at-or-before), ``forward`` (earliest
    right at-or-after), ``nearest`` (closer of the two, exact-distance
    ties to backward, as pandas resolves them), each optionally bounded
    by ``tolerance`` in ``on``'s own units. Matches pandas' duplicate-
    timestamp behavior too: backward takes the LAST right row at a
    duplicated time and forward the FIRST, under the deterministic
    ``tiebreak`` ordering (defaults to the right payload columns —
    pass an ingestion-sequence column to reproduce pandas' input-order
    semantics exactly).

    Spark-first (no ASOF operator exists): both sides union into one
    frame and BOTH direction scans run as carry-forward windows over
    the SAME ``by`` partitioning — one keyed exchange total, two
    partition-local sorts, never a join; ``nearest`` costs the same
    shuffle as a single direction. At 100 TB this is the union +
    carry-forward shape of ``events_asof_join`` generalized: per-key
    sequential scans, no range join, no nested loops. Output: every
    left row/column plus the matched right payload (suffixed on name
    collisions) and the matched right time as ``{on}{right_suffix}``.

    ``_time``/``_tag``/``_rp``/``_bwd``/``_fwd``/``_o<i>`` are reserved
    internal names."""
    payload, ords = validate_merge_asof_args(
        left.schema, right.schema, on=on, by=by, direction=direction,
        tolerance=tolerance, tiebreak=tiebreak, right_suffix=right_suffix,
    )
    left_cols = set(left.columns)

    rp = F.struct(
        F.col(on).alias("_t"), *[F.col(c).alias(c) for c in payload]
    )
    r2 = right.select(
        *by,
        F.col(on).alias("_time"),
        F.lit(0).alias("_tag"),
        rp.alias("_rp"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(ords)],
    )
    l2 = left.withColumn("_time", F.col(on)).withColumn(
        "_tag", F.lit(1)
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    frame = (W.unboundedPreceding, W.currentRow)
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    if need_b:
        w_b = (
            W.partitionBy(*by)
            .orderBy(
                F.asc("_time"), F.asc("_tag"),
                *[F.asc(f"_o{i}") for i in range(len(ords))],
            )
            .rowsBetween(*frame)
        )
        u = u.withColumn("_bwd", F.last("_rp", ignorenulls=True).over(w_b))
    if need_f:
        w_f = (
            W.partitionBy(*by)
            .orderBy(
                F.desc("_time"), F.asc("_tag"),
                *[F.desc(f"_o{i}") for i in range(len(ords))],
            )
            .rowsBetween(*frame)
        )
        u = u.withColumn("_fwd", F.last("_rp", ignorenulls=True).over(w_f))

    out = u.filter(F.col("_tag") == 1)
    null_rp = F.lit(None).cast(
        out.schema["_bwd" if need_b else "_fwd"].dataType
    )

    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    int_on = isinstance(
        left.schema[on].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )

    def _dist(a: F.Column, b: F.Column) -> F.Column:
        # the span between two int64 instants can reach 2^64, which
        # overflows BIGINT subtraction (ANSI mode raises) — widen
        # integral on-columns to decimal for the distance arithmetic
        # only; float on-columns saturate to inf instead of
        # overflowing and a decimal cast would truncate them
        if int_on:
            return a.cast("decimal(20,0)") - b.cast("decimal(20,0)")
        return a - b

    if tolerance is not None and int_on:
        from decimal import Decimal

        # a tolerance spanning the full int64 range (up to 2^64) does
        # not fit a LongType literal — lit it as decimal like the
        # distances it compares against
        tol_lit = F.lit(Decimal(tolerance))
    else:
        tol_lit = F.lit(tolerance)

    def _tol(cand, dt):
        if tolerance is None:
            return cand
        return F.when(
            cand.isNotNull() & (dt <= tol_lit), cand
        ).otherwise(null_rp)

    if need_b:
        bwd = _tol(F.col("_bwd"), _dist(F.col("_time"), F.col("_bwd._t")))
    if need_f:
        fwd = _tol(F.col("_fwd"), _dist(F.col("_fwd._t"), F.col("_time")))
    if direction == "backward":
        chosen = bwd
    elif direction == "forward":
        chosen = fwd
    else:
        chosen = (
            F.when(bwd.isNull(), fwd)
            .when(fwd.isNull(), bwd)
            .when(
                _dist(F.col("_time"), bwd["_t"])
                > _dist(fwd["_t"], F.col("_time")),
                fwd,
            )
            .otherwise(bwd)  # exact-distance tie -> backward (pandas)
        )

    sel = [F.col(c) for c in left.columns]
    sel.append(chosen["_t"].alias(f"{on}{right_suffix}"))
    for c in payload:
        out_name = c + right_suffix if c in left_cols else c
        sel.append(chosen[c].alias(out_name))
    return out.select(*sel)


# ---------------------------------------------------------------------------
# merge_asof under the driver's oracle gate (VERDICT r6 item #2): the
# general operator was previously tested only against pandas.merge_asof;
# these two catalog queries put backward+tolerance+by-key and
# nearest+by-key through DuckDB — backward via its native ASOF JOIN,
# forward via the mirrored `<=` ASOF, nearest composed from both with
# the pandas tie rule (exact-distance tie -> backward). Right rows are
# pre-deduplicated to one per (key, time) so the pick at duplicated
# right timestamps is deterministic in both engines (the operator's
# tiebreak handles dup times; an oracle can't observe input order).
# ---------------------------------------------------------------------------

ASOF_TOL_US = 3_600_000_000  # backward-match tolerance: 1 hour in us

_MERGE_ASOF_TOL_SQL = f"""
    WITH e AS (SELECT event_id, user_id, event_type, value,
                      epoch_us(ts) AS t_us
               FROM events),
    p AS (SELECT user_id, event_id AS purchase_id, t_us
          FROM e WHERE event_type = 'purchase'),
    v AS (SELECT user_id, t_us, MAX(event_id) AS view_id,
                 round(MAX(value), 2) AS view_value
          FROM e WHERE event_type = 'view' GROUP BY 1, 2),
    m AS (SELECT p.purchase_id, p.user_id, p.t_us,
                 v.t_us AS vt, v.view_id, v.view_value
          FROM p ASOF LEFT JOIN v
            ON p.user_id = v.user_id AND v.t_us <= p.t_us)
    SELECT purchase_id, user_id, t_us,
           CASE WHEN t_us - vt <= {ASOF_TOL_US} THEN vt END AS t_us_right,
           CASE WHEN t_us - vt <= {ASOF_TOL_US} THEN view_id END AS view_id,
           CASE WHEN t_us - vt <= {ASOF_TOL_US} THEN view_value END
               AS view_value
    FROM m
"""


@register("events_merge_asof_tolerance", _MERGE_ASOF_TOL_SQL)
def q_events_merge_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_asof(direction='backward', tolerance=1h) on the events
    table: every purchase picks the latest view by the same user
    at-or-before it, but only if that view is within the last hour —
    otherwise the matched payload is NULL (pandas.merge_asof tolerance
    semantics). Exercises the general operator's single-exchange
    union + carry-forward plan against DuckDB's native ASOF JOIN with a
    post-join tolerance mask (an algorithm-independent oracle)."""
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "t_us")
        .agg(
            F.max("event_id").alias("view_id"),
            F.round(F.max("value"), 2).alias("view_value"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "t_us"
    )
    return merge_asof(
        purchases, views, on="t_us", by=["user_id"],
        direction="backward", tolerance=ASOF_TOL_US,
    )


_MERGE_ASOF_NEAR_SQL = """
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us
               FROM events),
    err AS (SELECT user_id, event_id AS error_id, t_us
            FROM e WHERE event_type = 'error'),
    c AS (SELECT user_id, t_us, MAX(event_id) AS click_id
          FROM e WHERE event_type = 'click' GROUP BY 1, 2),
    b AS (SELECT err.error_id, err.user_id, err.t_us,
                 c.t_us AS bt, c.click_id AS b_id
          FROM err ASOF LEFT JOIN c
            ON err.user_id = c.user_id AND c.t_us <= err.t_us),
    f AS (SELECT err.error_id, c.t_us AS ft, c.click_id AS f_id
          FROM err ASOF LEFT JOIN c
            ON err.user_id = c.user_id AND c.t_us >= err.t_us)
    SELECT b.error_id, b.user_id, b.t_us,
           CASE WHEN bt IS NULL THEN ft
                WHEN ft IS NULL THEN bt
                WHEN (b.t_us - bt) > (ft - b.t_us) THEN ft
                ELSE bt END AS t_us_right,
           CASE WHEN bt IS NULL THEN f_id
                WHEN ft IS NULL THEN b_id
                WHEN (b.t_us - bt) > (ft - b.t_us) THEN f_id
                ELSE b_id END AS click_id
    FROM b JOIN f USING (error_id)
"""


@register("events_merge_asof_nearest", _MERGE_ASOF_NEAR_SQL)
def q_events_merge_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_asof(direction='nearest') on the events table: every error
    picks the temporally CLOSEST click by the same user, before or
    after, exact-distance ties resolving backward (pandas' rule). The
    operator computes both direction scans over ONE keyed exchange
    (two partition-local sorts, no join); the oracle composes DuckDB's
    backward and forward ASOF JOINs and applies the same tie rule —
    structurally different algorithms, identical answers."""
    e = load(spark, sf_dir, "events").withColumn("t_us", _t_us())
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "t_us")
        .agg(F.max("event_id").alias("click_id"))
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), "t_us"
    )
    return merge_asof(
        errors, clicks, on="t_us", by=["user_id"], direction="nearest"
    )
