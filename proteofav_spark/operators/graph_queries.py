"""Graph analytics beyond connected components: fixed-iteration PageRank
over the customer↔supplier trade graph and triangle counting on the
near-dup graph.

Both are classic iterative/combinatorial graph shapes a general analytics
engine must express:
- PageRank runs a FIXED number of power-iteration rounds so the whole
  computation is a finite relational expression — the DuckDB oracle chains
  one CTE per round, checking every iteration of the Spark plan (unlike
  convergence-looped variants, which have no closed SQL form).
- Triangle counting uses the degree-orientation trick: orienting every
  edge from its (degree, id)-smaller endpoint bounds each vertex's
  out-adjacency near sqrt(m) (Schank & Wagner), so the wedge join never
  explodes on hubs. The oracle enumerates triangles with a plain 3-way
  self-join over canonical a<b<c edges — algorithm-independent agreement.

Cross-engine float discipline (PageRank): per-round mass sums drift by
ulps between engines (summation order); every round's rank is therefore
rounded to 12 dp on BOTH sides — the drift (≲1e-16) is far below the
5e-13 rounding decision boundary, so the engines re-synchronize exactly
each round instead of compounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from proteofav_spark.queries import load, register

PR_DAMP = 0.85
PR_ITERS = 3
PR_ROUND = 12  # per-round re-sync rounding (see module docstring)


def _pr_sql() -> str:
    """PageRank oracle: one CTE per iteration, vertices encoded
    customer→2k, supplier→2k+1."""
    rounds = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        rounds.append(
            f"""r{i} AS (
          SELECT v.v,
                 round((1 - {PR_DAMP}) / nv.n + {PR_DAMP} * COALESCE(m.mass, 0),
                       {PR_ROUND}) AS pr
          FROM verts v CROSS JOIN nv
          LEFT JOIN (
            SELECT e.dst AS v, SUM({prev}.pr / d.deg) AS mass
            FROM edges e
            JOIN {prev} ON {prev}.v = e.src
            JOIN deg d ON d.v = e.src
            GROUP BY e.dst) m ON m.v = v.v)"""
        )
        prev = f"r{i}"
    joined = ",\n        ".join(rounds)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s, c FROM pairs),
    verts AS (SELECT DISTINCT src AS v FROM edges),
    nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM verts),
    deg AS (SELECT src AS v, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT v, round(1.0 / nv.n, {PR_ROUND}) AS pr
           FROM verts CROSS JOIN nv),
        {joined}
    SELECT v,
           CAST((2 * CAST(round(pr * {10 ** PR_ROUND}) AS BIGINT)
                 + {10 ** (PR_ROUND - 6)})
                // {2 * 10 ** (PR_ROUND - 6)} AS BIGINT)
               / 1000000.0 AS pagerank
    FROM {prev}
    """


@register("graph_pagerank_fixed", _pr_sql())
def q_graph_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85) over the
    bipartite customer↔supplier trade graph (an edge per distinct
    (customer, supplier) trading pair; vertex ids disambiguated as
    2·custkey / 2·suppkey+1). Fixed iteration count keeps the operator a
    closed relational expression the oracle can chain CTE-per-round.

    100 TB shape: per round, ONE groupBy-sum shuffle of per-edge mass
    contributions keyed on the destination vertex (map-side partial),
    plus a broadcast of the 1-row vertex count; the degree table joins
    map-side after AQE. The plan grows linearly in rounds (each rank
    frame feeds exactly one successor), so no checkpoint is needed for a
    fixed small iteration count — the convergence-looped variant with
    lineage cuts is ``star_components``'s shape. The graph never
    materializes adjacency lists: contributions stream through the
    edges-ranks join."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s"), F.col("c"))
    )
    verts = edges.select(F.col("src").alias("v")).distinct()
    nv = verts.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    deg = edges.groupBy(F.col("src").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    ranks = verts.crossJoin(F.broadcast(nv)).select(
        "v", F.round(F.lit(1.0) / F.col("n"), PR_ROUND).alias("pr")
    )
    for _ in range(PR_ITERS):
        mass = (
            edges.join(ranks.withColumnRenamed("v", "src"), "src")
            .join(deg.withColumnRenamed("v", "src"), "src")
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("mass"))
        )
        ranks = (
            verts.crossJoin(F.broadcast(nv))
            .join(mass, "v", "left")
            .select(
                "v",
                F.round(
                    (1 - PR_DAMP) / F.col("n")
                    + PR_DAMP * F.coalesce(F.col("mass"), F.lit(0.0)),
                    PR_ROUND,
                ).alias("pr"),
            )
        )
    # final 6-dp cut in exact BIGINT half-up arithmetic: both engines
    # hold the IDENTICAL 12-dp-resynced double, so k = round(pr·10¹²) is
    # the same integer on both sides, but round(pr, 6) of that double
    # diverges whenever digits 7-12 are exactly '500000' (~1 vertex per
    # million — invisible at gate SFs, hundreds of vertices at the 1e9-
    # vertex target; review r8). (2k + 10⁶) div (2·10⁶) never diverges.
    scale = 10**PR_ROUND
    return ranks.select(
        "v",
        F.round(F.col("pr") * scale).cast("long").alias("_k12"),
    ).select(
        "v",
        (
            F.expr(
                f"(2 * _k12 + {scale // 10**6}) div {2 * (scale // 10**6)}"
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("pagerank"),
    )


_TRI_SQL = """
    WITH pairs AS (SELECT doc_a, doc_b FROM ({minhash})),
    e AS (
      SELECT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
      FROM pairs WHERE doc_a <> doc_b GROUP BY 1, 2),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    pv AS (
      SELECT v, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS v FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
      GROUP BY v)
    SELECT v AS doc_id, n_triangles FROM pv
"""


def _tri_oracle() -> str:
    from proteofav_spark.operators.llm_queries import _MINHASH_SQL

    return _TRI_SQL.format(minhash=_MINHASH_SQL)


@register("graph_triangle_count", _tri_oracle())
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts on the MinHash near-dup graph — the
    clustering-coefficient numerator that separates tight duplicate
    cliques from chain-shaped false-positive paths.

    Scale algorithm (Schank-Wagner orientation): orient every edge from
    its (degree, id)-smaller endpoint, so each vertex's OUT-degree is
    O(sqrt(m)) regardless of hub size; wedges are the self-join of the
    oriented adjacency on the wedge center, and each triangle is counted
    exactly once when the wedge closes against a third oriented edge.
    The oracle instead enumerates a<b<c triangles with a plain 3-way
    self-join — two different algorithms, one answer."""
    from proteofav_spark.operators.llm_queries import minhash_lsh_pairs

    from proteofav_spark.queries import fan_out

    d = fan_out(load(spark, sf_dir, "documents"))
    e = (
        minhash_lsh_pairs(d)
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("a"),
            F.greatest("doc_a", "doc_b").alias("b"),
        )
        .distinct()
        .localCheckpoint()  # reused by degree + both join sides
    )
    deg = (
        e.select(F.col("a").alias("v")).unionAll(e.select(F.col("b")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("degb"))
    # orient: lower (deg, id) endpoint -> higher; out-degree O(sqrt(m))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("dega") < F.col("degb"))
                | ((F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("o")
        )
        .select("o.u", "o.w")
    )
    o1 = oriented.select(F.col("u"), F.col("w").alias("w1"))
    o2 = oriented.select(F.col("u"), F.col("w").alias("w2"))
    wedges = o1.join(o2, "u").filter(F.col("w1") < F.col("w2"))
    # close the wedge against the CANONICAL (a < b) edge set: w1 < w2 by
    # construction, so the close is a plain two-key equi-join (an
    # either-orientation check against the oriented set would be an
    # OR-condition nested-loop join)
    closed = wedges.join(
        e.select(F.col("a").alias("w1"), F.col("b").alias("w2")),
        ["w1", "w2"],
        "left_semi",
    )
    tri_v = (
        closed.select(F.col("u").alias("v"))
        .unionAll(closed.select(F.col("w1")))
        .unionAll(closed.select(F.col("w2")))
    )
    return tri_v.groupBy(F.col("v").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


# ---------------------------------------------------------------------------
# Recursive-CTE shape: hierarchical subtree rollup over a derived tree
# ---------------------------------------------------------------------------

_TREE_ROLLUP_SQL = """
    WITH RECURSIVE anc AS (
      SELECT c_custkey AS node, c_custkey AS ancestor FROM customer
      UNION ALL
      SELECT node, ancestor // 10 FROM anc WHERE ancestor > 0
    ), rev AS (
      SELECT o_custkey AS node,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    )
    SELECT a.ancestor,
           count(*) AS n_customers,
           round(CAST(CAST(sum(r.cents) AS BIGINT) AS DOUBLE) / 100, 2)
             AS subtree_revenue
    FROM anc a JOIN rev r ON r.node = a.node
    GROUP BY 1
"""


@register("tree_rollup_recursive", _TREE_ROLLUP_SQL)
def q_tree_rollup_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE query shape (WITH RECURSIVE — the one relational
    construct Spark SQL lacks): roll order revenue up a hierarchy, here
    the derived decimal tree parent(c) = c DIV 10 so both engines build
    the identical structure from the driver tables (an org chart / BOM /
    category taxonomy stand-in). The oracle is DuckDB's literal
    recursive CTE; each output row is one tree node with the customer
    count and exact-cents revenue of its whole subtree.

    Spark-first: the recursion's step function is a PROJECTION
    (ancestor DIV 10), so the ancestor closure unfolds as a FIXED-DEPTH
    union of narrow map-only frames — depth = digits of max(c_custkey),
    one bounded driver scalar, no joins, no shuffles, and no
    per-iteration actions (same closed-form discipline as the PageRank
    oracle). General edge-table recursions use the same loop with a
    keyed self-join per level (see star_components for the
    checkpoint-every-round variant); for 100 TB the closure here is
    depth x |customers| rows of two BIGINTs from map-only work, then
    ONE node-keyed join against the per-customer revenue aggregate and
    one ancestor-keyed rollup. Exchange budget: 2 keyed exchanges
    audited at sf0.1 (PLANS.md — the revenue-side aggregate broadcasts
    into the closure join); 3 keyed exchanges at scale when that
    broadcast falls back to a shuffle join."""
    from functools import reduce

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node")
    )
    max_key = cust.agg(F.max("node")).collect()[0][0]  # bounded scalar
    depth = len(str(max(int(max_key or 0), 1)))  # empty table -> depth 1
    level = cust.select("node", F.col("node").alias("ancestor"))
    parts = [level]
    for _ in range(depth):
        level = level.where(F.col("ancestor") > 0).select(
            "node", F.expr("ancestor DIV 10").alias("ancestor")
        )
        parts.append(level)
    closure = reduce(lambda a, b: a.unionAll(b), parts)
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("node"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    return (
        closure.join(rev, "node")
        .groupBy("ancestor")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("cents").cast("double") / 100, 2).alias(
                "subtree_revenue"
            ),
        )
    )
