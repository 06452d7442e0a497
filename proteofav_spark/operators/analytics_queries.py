"""Analytic query shapes missing from the first 65-query catalog: ranked
top-k per group, pivot / conditional aggregation, a star-schema revenue
join (TPC-H Q5 shape), bounded sliding window frames, and statistical
moment aggregates.

These are "beyond reference" in SURVEY §2 terms — the reference
(ProteoFAV) has no ranking, pivoting, or statistics — but any analytics
engine a reference user would migrate to must expose them, and each one
exercises a distinct Catalyst physical shape worth pinning:

- top-k per group → rank window + filter (no global sort);
- pivot → single-pass conditional aggregation (one shuffle, no
  per-pivot-value scan);
- star join → broadcast dims + one fact shuffle;
- moving average → bounded ROWS frame (running-state, no reshuffle when
  frames share a partitioning);
- moments → single-pass mergeable aggregates (map-side partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from proteofav_spark.queries import (
    cents as _cents,
    half_up_6dp as _half_up_6dp,
    half_up_ratio as _half_up_ratio,
    load,
    register,
    revenue_units as _revenue_u,
    sql_units_to_dollars as _sql_u_to_dollars,
    units_to_dollars as _u_to_dollars,
)


@register(
    "topk_per_group",
    """
    SELECT n_name, c_custkey, c_name, round(c_acctbal, 2) AS acctbal, rk
    FROM (
        SELECT n_name, c_custkey, c_name, c_acctbal,
               row_number() OVER (
                   PARTITION BY n_name
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rk
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    WHERE rk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by account balance per nation.

    Physical shape: broadcast the 25-row nation dim onto the customer
    scan, then ONE shuffle on the window partition key and a per-group
    sort — never a global sort. At 100 TB the rank window's partition key
    (nation) has only 25 values, so the shuffle is skew-prone; for
    high-skew grouped top-k prefer a two-stage scheme (per-input-partition
    top-k via the same window on a salted key, then re-rank the ~25×k×salt
    survivors), which this plan degenerates to automatically once AQE
    splits the skewed reducers. Tie-break on c_custkey makes the rank
    total, so the result is deterministic and oracle-hashable.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rk = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey", "c_name", "c_acctbal")
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 3)
        .select(
            "n_name",
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            # bigint to match DuckDB row_number() exactly — the local
            # type-parity gate (tools/check_oracles.py) enforces this
            F.col("rk").cast("long").alias("rk"),
        )
    )


@register(
    "agg_pivot_status",
    """
    SELECT o_orderpriority,
           CAST(coalesce(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                              FILTER (o_orderstatus = 'F') AS BIGINT), 0)
                AS DOUBLE) / 100.0 AS f_total,
           CAST(coalesce(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                              FILTER (o_orderstatus = 'O') AS BIGINT), 0)
                AS DOUBLE) / 100.0 AS o_total,
           CAST(coalesce(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                              FILTER (o_orderstatus = 'P') AS BIGINT), 0)
                AS DOUBLE) / 100.0 AS p_total,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS f_cnt,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS o_cnt,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS p_cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order value + count by status, one row per priority.

    Expressed as conditional aggregation (``sum(when(...))``) rather than
    ``.pivot()`` so the pivot values are static in the plan: Spark's
    ``pivot`` without an explicit value list runs a separate distinct job
    to discover them (an extra full scan at 100 TB), and even with the
    list it lowers to exactly these conditional aggregates. Single
    shuffle on the group key, map-side partials; zero extra cost per
    pivot column.
    """
    o = load(spark, sf_dir, "orders")

    def tot(status: str):
        # exact cents sum, ONE /100 — a rounded raw double sum drifts
        # with summation order once groups are large enough (~SF 100)
        # for sqrt(n)·eps·|sum| to cross half a cent (review r8)
        return (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == status,
                        _cents("o_totalprice"),
                    )
                ),
                F.lit(0).cast("long"),
            ).cast("double")
            / 100
        )

    def cnt(status: str):
        return F.count(F.when(F.col("o_orderstatus") == status, F.lit(1)))

    return o.groupBy("o_orderpriority").agg(
        tot("F").alias("f_total"),
        tot("O").alias("o_total"),
        tot("P").alias("p_total"),
        cnt("F").alias("f_cnt"),
        cnt("O").alias("o_cnt"),
        cnt("P").alias("p_cnt"),
    )


@register(
    "join_star_revenue",
    """
    SELECT n_name,
           -- sign branch mirrored from units_to_dollars (ADVICE r9)
           CAST(CASE WHEN rev_u >= 0 THEN (rev_u + 50) // 100
                     ELSE -((-(rev_u) + 50) // 100) END
                AS BIGINT) / 100.0 AS revenue,
           n_items
    FROM (
      SELECT n_name,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS rev_u,
             CAST(count(*) AS BIGINT) AS n_items
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY n_name)
    """,
)
def q_join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue by nation for one region.

    Plan strategy for scale: region⨝nation collapses to a ≤25-row
    broadcast dim that prunes BOTH customer and supplier to one region's
    nations BEFORE the fact joins — customer via the dim join, supplier
    via a broadcast semi-join on the same nation keys — so neither side
    carries out-of-region rows into the lineitem join (the
    ``c_nationkey = s_nationkey`` condition still rides along as a
    join-key column, not a post-filter). The date filter on orders
    pushes to the parquet scan. The only large shuffles are the two fact
    joins (orders⨝customer on custkey, lineitem⨝(that) on orderkey);
    supplier broadcasts at sf-test size and AQE decides at production
    size. Revenue agg is map-side partial.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    s = (
        load(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(n.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    oc = o.join(c, o.o_custkey == c.c_custkey)
    ls = li.join(s, li.l_suppkey == s.s_suppkey)
    return (
        ls.join(
            oc,
            (ls.l_orderkey == oc.o_orderkey)
            & (ls.s_nationkey == oc.c_nationkey),
        )
        .groupBy("n_name")
        # exact 1e-4-unit integer sum, integer half-up to cents, ONE
        # exact /100 — round(double-sum, 2) sat on true .xx5 boundaries
        # for ~1% of group sums (the Q9 class; review r8)
        .agg(
            F.sum(_revenue_u()).alias("rev_u"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select("n_name", _u_to_dollars("rev_u").alias("revenue"), "n_items")
    )


@register(
    "window_moving_avg",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ), 6) AS mavg5,
           round(min(value) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ), 6) AS mmin5,
           round(lead(value) OVER (
               PARTITION BY user_id ORDER BY event_id
           ), 6) AS next_value
    FROM events
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame per user: 5-row moving average/min + lead.

    All three windows share one (partitionBy, orderBy) spec, so Catalyst
    computes them in a single Window operator after ONE shuffle on
    user_id — adding frames to an existing spec is free. Bounded ROWS
    frames stream in O(frame) memory per partition; at 100 TB the only
    concern is per-user row count (bounded here: one user's events fit a
    reducer), never total size. event_id is unique per user so the
    ordering is total and lead() deterministic.
    """
    e = load(spark, sf_dir, "events")
    spec = W.partitionBy("user_id").orderBy("event_id")
    frame = spec.rowsBetween(-4, W.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(frame), 6).alias("mavg5"),
        F.round(F.min("value").over(frame), 6).alias("mmin5"),
        F.round(F.lead("value").over(spec), 6).alias("next_value"),
    )


@register(
    "agg_stats_moments",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS mean_value,
           round(stddev_samp(value), 6) AS sd_value,
           round(var_samp(value), 6) AS var_value,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_vu,
           round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per event type in one pass.

    stddev/var/covar/corr are all mergeable (sum, sum-of-squares,
    cross-sum sketches), so Spark computes map-side partials and merges —
    one narrow shuffle of ~|event_type| rows regardless of input size.
    Sample (n-1) variants on both engines; population `skewness`/
    `kurtosis` are deliberately excluded because DuckDB's are
    bias-corrected sample moments and would never hash-match.
    """
    e = load(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.covar_samp(F.col("value"), u), 6).alias("covar_vu"),
        F.round(F.corr(F.col("value"), u), 6).alias("corr_vu"),
    )


@register(
    "agg_monthly_revenue",
    """
    SELECT CAST(strftime(o_orderdate, '%Y%m') AS BIGINT) AS yyyymm,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_agg_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup of order revenue by month (+ quarter tag).

    The month key is emitted as an integer yyyymm, not a truncated
    timestamp — integer group keys hash identically across engines,
    where timestamp rendering differs. Physical shape: one partial-agg
    shuffle keyed by ~|months| values; at 100 TB this is also the
    natural parquet partition key (PARTITIONED BY yyyymm), turning the
    groupBy into a metadata-only scan per partition and enabling
    partition pruning for any date-bounded query.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format("o_orderdate", "yyyyMM").cast("bigint").alias("yyyymm"),
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # exact cents sum, ONE /100 (same drift argument as
            # agg_pivot_status — review r8)
            (F.sum(_cents("o_totalprice")).cast("double") / 100).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_null_safe",
    """
    WITH l AS (SELECT c_custkey, nullif(c_nationkey % 5, 0) AS k FROM customer),
         r AS (SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS k FROM supplier)
    SELECT l.k AS k, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT l.c_custkey) AS BIGINT) AS n_cust,
           CAST(count(DISTINCT r.s_suppkey) AS BIGINT) AS n_supp
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY l.k
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out.

    NULL join keys are endemic in enrichment pipelines (unmapped
    residues, unresolved accessions); a plain equi-join silently drops
    them, so the engine must offer the null-safe variant as a
    first-class join. Spark plans ``eqNullSafe`` as a normal hash join
    (the key hashes as a distinguished null bucket) — same single
    shuffle as ``=``, NOT a fallback to nested-loop. Note the null
    bucket concentrates on one reducer: at scale, count-skew on NULL is
    the classic case for AQE skew-join splitting.
    """
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("lk")
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("rk")
    )
    return (
        c.join(s, F.col("lk").eqNullSafe(F.col("rk")))
        .groupBy(F.col("lk").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct("s_suppkey").alias("n_supp"),
        )
    )


@register(
    "array_hof_kit",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings WHERE vec_id < 200)
    SELECT vec_id,
           CAST(len(list_filter(emb, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_sum(list_transform(emb, x -> abs(x))), 6) AS l1_norm,
           round(list_max(list_transform(emb, x -> abs(x))), 6) AS max_abs,
           CAST((len(list_filter(emb[1:32], x -> x > 0)) >
                 len(list_filter(emb[33:64], x -> x > 0))) AS BOOLEAN)
               AS front_heavy
    FROM e
    """,
)
def q_array_hof_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: filter / transform / fold / slice on
    the embedding column, entirely JVM-side.

    This is the pattern the similarity operators build on: HOFs run
    inside whole-stage codegen with zero Python round-trips, so
    per-element math on array<float> costs one pass over the values —
    the right default before reaching for a Pandas UDF. The float→double
    cast happens FIRST on both engines (DuckDB computes float32
    otherwise; see verify SKILL gotchas).
    """
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    emb = F.transform("embedding", lambda x: x.cast("double"))
    d = e.select("vec_id", emb.alias("emb"))
    absv = F.transform("emb", lambda x: F.abs(x))
    npos = lambda c: F.size(F.filter(c, lambda x: x > 0))  # noqa: E731
    return d.select(
        "vec_id",
        npos(F.col("emb")).cast("bigint").alias("n_pos"),
        F.round(
            F.aggregate(absv, F.lit(0.0), lambda a, x: a + x), 6
        ).alias("l1_norm"),
        F.round(F.array_max(absv), 6).alias("max_abs"),
        (npos(F.slice("emb", 1, 32)) > npos(F.slice("emb", 33, 32))).alias(
            "front_heavy"
        ),
    )


# ---------------------------------------------------------------------------
# SCD2 validity snapshot (gaps-and-islands)
# ---------------------------------------------------------------------------

_SCD2_SQL = """
    WITH h AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             CASE WHEN lag(o_orderstatus) OVER w IS DISTINCT FROM
                       o_orderstatus THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    seg AS (
      SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS seg_id
      FROM h),
    isl AS (
      SELECT o_custkey, seg_id, o_orderstatus,
             min(o_orderdate) AS effective_from,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM seg GROUP BY 1, 2, 3)
    SELECT o_custkey, o_orderstatus, effective_from,
           lead(effective_from) OVER (PARTITION BY o_custkey
                                      ORDER BY seg_id) AS effective_to,
           n_orders,
           lead(effective_from) OVER (PARTITION BY o_custkey
                                      ORDER BY seg_id) IS NULL AS is_current
    FROM isl
"""


@register("orders_scd2_snapshot", _SCD2_SQL)
def q_orders_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 snapshot derived from an event
    history: collapse each customer's order-status timeline into runs of
    constant status (gaps-and-islands) and emit one validity interval
    per run — (effective_from, effective_to, is_current), with
    effective_to = the next run's start (half-open intervals, NULL =
    still current). This is the standard lakehouse "latest-state +
    history" materialization a MERGE-based SCD2 pipeline maintains
    incrementally; here it's the from-scratch batch derivation.

    100 TB shape: every window partitions by o_custkey and the
    change-flag, segment-number and interval steps all share the SAME
    (o_custkey, o_orderdate, o_orderkey) sort order, so Catalyst plans
    ONE exchange + one sort feeding chained Window operators; the
    island aggregation then reuses the o_custkey clustering. No global
    sort, per-partition state is one row (lag / running sum)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load(spark, sf_dir, "orders")
    chg = (
        ~F.lag("o_orderstatus").over(w).eqNullSafe(F.col("o_orderstatus"))
    ).cast("int")
    seg = o.select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey",
        F.sum(chg)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("seg_id"),
    )
    isl = seg.groupBy("o_custkey", "seg_id", "o_orderstatus").agg(
        F.min("o_orderdate").alias("effective_from"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    ws = W.partitionBy("o_custkey").orderBy("seg_id")
    eff_to = F.lead("effective_from").over(ws)
    return isl.select(
        "o_custkey",
        "o_orderstatus",
        "effective_from",
        eff_to.alias("effective_to"),
        "n_orders",
        eff_to.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: unshipped-order shipping priority (top-N revenue)
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1996-07-01"

_SHIP_PRIORITY_SQL = f"""
    SELECT l_orderkey,
           -- sign branch mirrored from units_to_dollars (ADVICE r9)
           CAST(CASE WHEN rev_u >= 0 THEN (rev_u + 50) // 100
                     ELSE -((-(rev_u) + 50) // 100) END
                AS BIGINT) / 100.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM (
      SELECT l.l_orderkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS rev_u,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = '{Q3_SEGMENT}'
        AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF} 00:00:00'
        AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF} 00:00:00'
      GROUP BY 1, 3, 4)
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@register("orders_shipping_priority", _SHIP_PRIORITY_SQL)
def q_orders_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of orders placed before the cutoff in one
    market segment whose lineitems shipped after it — the canonical
    "filtered dim → fact → fact → top-N" OLAP pattern.

    Plan: the segment filter prunes customers BEFORE any join (pushed
    to the parquet scan), the pruned customer side broadcasts, the
    date predicates on orders/lineitem push down to their scans, and
    the final top-10 collapses to TakeOrderedAndProject — no global
    sort. At cluster scale the orders⋈lineitem join shuffles on the
    orderkey both fact tables are naturally clustered by, so AQE can
    coalesce it; the sort key is the ROUNDED revenue (+ orderkey
    tie-break) so the top-N cut is identical across engines."""
    cutoff = f"{Q3_CUTOFF} 00:00:00"
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # exact 1e-4-unit sum then integer half-up — 12 of 610 sf0.01
        # groups sat on a TRUE .xx5 boundary under round(double, 2), 6
        # of them rounding differently across engines; the gate passed
        # only because none reached the top 10 (review r8)
        .agg(F.sum(_revenue_u()).alias("rev_u"))
        .select(
            "l_orderkey",
            _u_to_dollars("rev_u").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Cohort lifetime value (LTV) matrix
# ---------------------------------------------------------------------------

_LTV_SQL = """
    WITH o AS (
      SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mo,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    coh AS (SELECT o_custkey, min(mo) AS cohort_mo FROM o GROUP BY 1)
    SELECT coh.cohort_mo,
           o.mo - coh.cohort_mo AS month_offset,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(o.cents) AS DOUBLE) / 100.0 AS revenue
    FROM o JOIN coh USING (o_custkey)
    GROUP BY 1, 2
"""


@register("customer_ltv_cohort", _LTV_SQL)
def q_customer_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers bucketed by first-order
    month, revenue and order counts accumulated at each month offset —
    the finance twin of the retention matrix (pipeline_queries), on the
    orders fact instead of raw events.

    Month arithmetic is pure integers (year·12 + month) on both
    engines — no date-diff semantics to disagree on — and revenue runs
    in exact integer cents with one final division. Two shuffles at any
    scale: the per-customer min (partial-aggregated) and the
    (cohort, offset) rollup; the cohort join keys on o_custkey, the
    same clustering the first shuffle produced. count(DISTINCT)
    Spark-expands to a two-stage exact aggregation — mergeable, no
    driver state."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("mo"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    coh = o.groupBy("o_custkey").agg(F.min("mo").alias("cohort_mo"))
    return (
        o.join(coh, "o_custkey")
        .groupBy(
            "cohort_mo", (F.col("mo") - F.col("cohort_mo")).alias("month_offset")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            (F.sum("cents").cast("double") / 100.0).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus length profile (histogram by language)
# ---------------------------------------------------------------------------

HIST_BUCKET_CHARS = 200

_DOC_HIST_SQL = f"""
    SELECT lang, bucket, n_docs, total_chars,
           -- HUGEINT numerator: the DuckDB twin of the Spark helper's
           -- DECIMAL(38,0) widening (2·chars·10⁶ wraps int64 at scale)
           CAST((2 * CAST(total_chars AS HUGEINT) * 1000000 + n_docs)
                // (2 * n_docs) AS BIGINT) / 1000000.0 AS avg_chars
    FROM (
      SELECT lang,
             n_chars // {HIST_BUCKET_CHARS} AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY 1, 2)
"""


@register("docs_length_histogram", _DOC_HIST_SQL)
def q_docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: fixed-width document-length histogram per
    language — the profiling pass that sizes curation thresholds
    (length floors/ceilings, packing budgets) before a 100 TB filter
    run. Map-only bucketing + one partial-aggregated groupBy whose
    key space is |langs| × |buckets| — tiny regardless of corpus size;
    the average rounds in exact half-up arithmetic via the shared
    helper (round(bigint/bigint, 6) is the documented 2^a·5^b boundary
    cousin — review r8; the helper's DECIMAL(38,0) numerator also
    removes the silent 2·chars·10⁶ int64 wrap a 100 TB bucket would hit
    — ADVICE r8)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "lang", F.expr(f"n_chars div {HIST_BUCKET_CHARS}").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "lang",
            "bucket",
            "n_docs",
            "total_chars",
            _half_up_6dp("total_chars", "n_docs").alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# CDC upsert (MERGE INTO semantics: update / insert / keep)
# ---------------------------------------------------------------------------

CDC_CUTOFF = "1999-01-01"

_CDC_SQL = f"""
    WITH base AS (
      SELECT o_custkey, o_orderstatus,
             (epoch_us(o_orderdate) // 86400000000) * 1000000000000
               + o_orderkey AS ord,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderdate < TIMESTAMP '{CDC_CUTOFF} 00:00:00' AS is_snap
      FROM orders),
    snap AS (
      SELECT o_custkey, arg_max(o_orderstatus, ord) AS last_status,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM base WHERE is_snap GROUP BY 1),
    chg AS (
      SELECT o_custkey, arg_max(o_orderstatus, ord) AS last_status,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM base WHERE NOT is_snap GROUP BY 1)
    SELECT COALESCE(s.o_custkey, c.o_custkey) AS o_custkey,
           COALESCE(c.last_status, s.last_status) AS last_status,
           COALESCE(s.n_orders, 0) + COALESCE(c.n_orders, 0) AS n_orders,
           CAST(COALESCE(s.cents, 0) + COALESCE(c.cents, 0) AS DOUBLE)
             / 100.0 AS ltv,
           CASE WHEN s.o_custkey IS NULL THEN 'insert'
                WHEN c.o_custkey IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM snap s FULL OUTER JOIN chg c ON s.o_custkey = c.o_custkey
"""


@register("cdc_upsert_apply", _CDC_SQL)
def q_cdc_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a table format: apply a change batch
    (orders on/after the cutoff) onto a keyed snapshot (per-customer
    state before it), emitting the post-merge state plus the action that
    produced each row — update (key in both), insert (change only),
    keep (snapshot only). This is the batch-derivation twin of a
    Delta/Iceberg MERGE, and the shape an incremental lakehouse pipeline
    re-runs per micro-batch.

    Scale shape: both sides reduce to one row per key BEFORE the merge
    (partial-aggregated groupBys), so the full-outer join shuffles
    key-state rows, never raw orders; at 100 TB the snapshot side is
    the big one and AQE picks shuffle vs broadcast from the change
    batch's actual size. The per-key "latest" is ``max_by`` over a
    UNIQUE bigint order (epoch-day · 10¹² + orderkey — collision-free
    and overflow-safe), so both engines pick the same row without any
    tie-rule divergence; money merges in exact integer cents."""
    o = load(spark, sf_dir, "orders")
    ord_col = (
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        * F.lit(1_000_000_000_000)
        + F.col("o_orderkey")
    )
    base = o.select(
        "o_custkey",
        "o_orderstatus",
        ord_col.alias("ord"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (
            F.col("o_orderdate") < F.lit(f"{CDC_CUTOFF} 00:00:00").cast("timestamp")
        ).alias("is_snap"),
    )

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.max_by("o_orderstatus", "ord").alias("last_status"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("cents"),
        )

    s = state(base.where("is_snap")).alias("s")
    c = state(base.where("NOT is_snap")).alias("c")
    j = s.join(c, F.col("s.o_custkey") == F.col("c.o_custkey"), "full_outer")
    return j.select(
        F.coalesce(F.col("s.o_custkey"), F.col("c.o_custkey")).alias("o_custkey"),
        F.coalesce(F.col("c.last_status"), F.col("s.last_status"))
        .alias("last_status"),
        (
            F.coalesce(F.col("s.n_orders"), F.lit(0))
            + F.coalesce(F.col("c.n_orders"), F.lit(0))
        ).alias("n_orders"),
        (
            (
                F.coalesce(F.col("s.cents"), F.lit(0))
                + F.coalesce(F.col("c.cents"), F.lit(0))
            ).cast("double")
            / 100.0
        ).alias("ltv"),
        F.when(F.col("s.o_custkey").isNull(), "insert")
        .when(F.col("c.o_custkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bilateral trade volume between nation pairs
# ---------------------------------------------------------------------------

_TRADE_SQL = """
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           year(l.l_shipdate) AS ship_year,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
    GROUP BY 1, 2, 3
"""


@register("nation_trade_volume", _TRADE_SQL)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border shipping volume by (customer nation,
    supplier nation, year) — the canonical query where ONE dimension
    table participates twice under different roles, so the plan must
    alias it, not share the scan node.

    Plan: customer/supplier/nation are all broadcast dims (two
    independent broadcasts of the aliased nation scan); the only wide
    exchange is lineitem⋈orders on the orderkey, then one
    partial-aggregated rollup whose key space is |nations|² × years.
    The same-nation filter applies pre-aggregation on broadcast-joined
    columns — no extra shuffle. Discounted revenue accumulates in EXACT
    integer 10⁻⁴-dollar units (price cents × (100 − discount
    basis points), both 2-decimal by data contract): per-group sums
    here span hundreds of terms, where a double sum lands on .xx5
    rounding boundaries and a 2 dp round diverges between engines —
    the bigint sum + one final division is bit-identical instead."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        # no broadcast hint: supplier scales with SF (AQE broadcasts
        # while it fits, falls back to shuffle at cluster scale)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .where(F.col("cn_key") != F.col("sn_key"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * (100 - F.round(F.col("l_discount") * 100).cast("long"))
                ).cast("double")
                / 10000.0
            ).alias("volume"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo-class revenue share per month
# ---------------------------------------------------------------------------

PROMO_TYPE = "ECONOMY"

_PROMO_SQL = f"""
    SELECT year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1 AS ship_mo,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(sum(CASE WHEN p.p_type = '{PROMO_TYPE}'
                    THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                    ELSE 0 END) AS DOUBLE) / 10000.0 AS promo_revenue,
           CAST((2 * sum(CASE WHEN p.p_type = '{PROMO_TYPE}'
                         THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                         ELSE 0 END) * 1000000
                 + sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))))
                // (2 * sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100) AS BIGINT))))
                AS DOUBLE) / 1000000 AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
"""


@register("promo_revenue_share", _PROMO_SQL)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the share of each ship-month's revenue coming
    from one part class — conditional aggregation over a fact⋈dim join.

    The part dimension broadcasts (only p_partkey + p_type survive
    pruning), so the fact table never shuffles for the join; the rollup
    partial-aggregates to one row per month. Both the conditional and
    the total revenue accumulate in exact 10⁻⁴-dollar bigints (the
    nation_trade_volume contract) and the share is one final double
    division rounded at 6 dp."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    bp = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    promo_bp = F.when(F.col("p_type") == PROMO_TYPE, bp).otherwise(F.lit(0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
            .cast("long")
            .alias("ship_mo")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(promo_bp).alias("_promo_bp"),
            F.sum(bp).alias("_bp"),
        )
        # share at 6 dp via the exact-integer round-half-up trick
        # ((2a·10⁶+b) div 2b) — engine-independent, unlike
        # round(double, 6) on an exact-rational quotient. The numerator
        # widens to DECIMAL(38,0) BEFORE the 2·10⁶ scale-up: monthly bp
        # sums pass the bigint headroom (~4.6e12) around SF 0.2, and
        # DuckDB's hugeint-promoting sum would survive where a bigint
        # Spark product overflows — decimal keeps both engines exact to
        # ~10³⁸ (div on positive decimals floors like bigint div)
        .select(
            "ship_mo",
            "n_lineitems",
            (F.col("_promo_bp").cast("double") / 10000.0).alias("promo_revenue"),
            (
                F.expr(
                    "(2 * CAST(_promo_bp AS DECIMAL(38,0)) * 1000000 + _bp)"
                    " div (2 * CAST(_bp AS DECIMAL(38,0)))"
                ).cast("double")
                / 1_000_000
            ).alias("promo_share"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-attribute predicate revenue
# ---------------------------------------------------------------------------

_DISJ_SQL = """
    SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#2' AND p.p_size <= 10 AND l.l_quantity <= 25)
       OR (p.p_brand = 'Brand#17' AND p.p_size <= 20 AND l.l_quantity <= 35)
       OR (p.p_type = 'SMALL' AND l.l_quantity >= 10)
"""


@register("disjunctive_predicate_revenue", _DISJ_SQL)
def q_disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of multi-attribute branch
    predicates mixing fact and dimension columns — the classic stress
    test for disjunctive predicate handling.

    The OR spans both tables, so it cannot push below the join; what
    matters at scale is that the join stays a single broadcast hash
    join with the residual disjunction evaluated JVM-side inside the
    join's codegen stage (no union-of-three-joins, no cross join), and
    Catalyst still derives the prunable per-side IsNotNull/partial
    predicates. Revenue in exact bigint basis points."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10) & (F.col("l_quantity") <= 25))
        | ((F.col("p_brand") == "Brand#17") & (F.col("p_size") <= 20) & (F.col("l_quantity") <= 35))
        | ((F.col("p_type") == "SMALL") & (F.col("l_quantity") >= 10))
    )
    bp = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            (F.sum(bp).cast("double") / 10000.0).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join with a correlated non-equi predicate
# ---------------------------------------------------------------------------

_EXISTS_SQL = """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1
"""


@register("orders_exists_semi", _EXISTS_SQL)
def q_orders_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line item shipped after
    the order date, counted per priority — the canonical EXISTS
    decorrelation into a LEFT SEMI join with a mixed equi + non-equi
    condition.

    Spark-first: the semi join hashes on l_orderkey (the equi part) and
    evaluates the shipdate comparison as the join residual — existence
    short-circuits per probe row, the lineitem side never duplicates
    orders, and the priority rollup partial-aggregates to ~5 rows. One
    fact-sized shuffle pair on the join key; no count-distinct, no
    window. At 100 TB both sides shuffle-partition on orderkey (or
    co-locate for free if the lake buckets both tables by orderkey)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hits = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return hits.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: order-count distribution incl. zero-order customers
# ---------------------------------------------------------------------------

_DISTRIB_SQL = """
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM (SELECT c.c_custkey,
                 CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY 1)
    GROUP BY 1
"""


@register("customer_order_distribution", _DISTRIB_SQL)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly N orders —
    including N = 0, which forces a LEFT OUTER join (an inner join would
    silently drop inactive customers, the classic Q13 trap).

    Physical shape: one shuffle keyed on custkey for the outer join +
    per-customer count (count(o_orderkey) skips the null-extended rows),
    then a second ~|distinct N|-sized partial-aggregated rollup. Both
    aggregations are mergeable; no window, no distinct-expansion. At
    100 TB the custkey shuffle dominates and AQE coalesces the tiny
    second exchange."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join
# ---------------------------------------------------------------------------

_RICH_IDLE_SQL = """
    WITH t AS (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                      AS BIGINT) AS sum_cents,
                      CAST(count(*) AS BIGINT) AS n
               FROM customer WHERE c_acctbal > 0)
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 100.0 AS total_bal
    FROM customer c, t
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * t.n > t.sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1998-06-01')
    GROUP BY 1
"""


@register("customers_above_avg_no_orders", _RICH_IDLE_SQL)
def q_customers_above_avg_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers who never ordered — a
    scalar aggregate threshold (global average balance) feeding a filter,
    then a NOT EXISTS (no RECENT orders — the synthetic data gives every
    customer some order, so the anti side carries a date predicate to
    stay non-trivial) decorrelated into a LEFT ANTI join, rolled up by
    market segment — the churn-risk "rich but recently idle" probe.

    Spark-first: the threshold is a 1-row aggregate CROSS-JOINED in
    (Catalyst broadcasts it — BroadcastNestedLoopJoin over one row, NOT
    a cartesian product), so the plan has no driver round-trip and the
    whole query stays one lazy DAG. The "above average" comparison is
    done ENTIRELY in exact integer cents — ``cents(c)·n > sum_cents`` is
    algebraically ``c > avg`` without ever materializing the float
    average, whose summation-order dependence could flip boundary
    customers between engines. The anti join hashes on custkey; orders
    projects to the join key only, so the build side is narrow. At
    100 TB: threshold is O(1) state, anti join shuffles on custkey,
    segment rollup partial-aggregates to ~5 rows (cents·n caps near
    10¹⁸ at ~10⁹ customers; widen to DECIMAL(38,0) past that)."""
    cust = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1998-06-01").cast("timestamp"))
        .select("o_custkey")
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    thresh = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("sum_cents"), F.count(F.lit(1)).alias("n")
    )
    rich = cust.crossJoin(F.broadcast(thresh)).where(
        cents * F.col("n") > F.col("sum_cents")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            .cast("double")
            / 100.0
        ).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier breadth per part class (distinct aggregation)
# ---------------------------------------------------------------------------

_BREADTH_SQL = """
    SELECT p.p_brand, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
    GROUP BY 1, 2
"""


@register("parts_supplier_breadth", _BREADTH_SQL)
def q_parts_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, size) part class — the canonical COUNT(DISTINCT) over a
    fact⋈dim join with a dimension-side exclusion filter.

    Physical shape: the brand filter prunes at the part scan and the
    pruned dim broadcasts, so the fact never shuffles for the join;
    Spark plans the distinct as expand + two-stage aggregate — the first
    stage dedupes (brand, size, suppkey) triples map-side, so the
    exchange carries at most |classes|x|suppliers| rows, not the fact
    table. No window, no global sort. At 100 TB a skew-heavy brand
    would AQE-split; the count itself stays exact (HLL belongs in
    approx_distinct_parts, not here)."""
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load(spark, sf_dir, "part")
        .select("p_partkey", "p_brand", "p_size")
        .where(F.col("p_brand") != "Brand#1")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS: non-hierarchical margin combinations in one pass
# ---------------------------------------------------------------------------

_GSETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 100.0 AS sum_qty,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                AS BIGINT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus))
"""


@register("agg_grouping_sets", _GSETS_SQL)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity totals for an explicit, NON-hierarchical set of margins —
    (flag, status), (flag), (status) — in one pass. ROLLUP can't express
    this (it only nests prefixes) and CUBE computes an unwanted grand
    total; GROUPING SETS is the precise tool, and ``grouping()`` ids
    disambiguate a margin's NULL from a data NULL.

    Physical shape: Catalyst plans one Expand (3 output rows per input
    row, one per grouping set) feeding a single partial-aggregated
    exchange — NOT three scans unioned, which is what a naive
    margin-by-margin rewrite would cost at 100 TB. Quantities accumulate
    in exact integer centi-units."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (
                F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
                .cast("double")
                / 100.0
            ).alias("sum_qty"),
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
            ).cast("long").alias("gid"),
        )
    )


# ---------------------------------------------------------------------------
# ntile quantile bucketing (per-partition rank windows)
# ---------------------------------------------------------------------------

_NTILE_SQL = """
    WITH t AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             ntile(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders)
    SELECT o_orderpriority, CAST(quartile AS BIGINT) AS quartile,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(price_cents) AS BIGINT) AS lo_cents,
           CAST(max(price_cents) AS BIGINT) AS hi_cents
    FROM t
    GROUP BY 1, 2
"""


@register("window_ntile_buckets", _NTILE_SQL)
def q_window_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quartiles of order value within each priority class —
    the ntile window (equal-COUNT buckets, unlike the equal-WIDTH
    histogram and the percentile sketch already in the catalog), rolled
    up to per-bucket count and exact-cent bounds.

    Determinism: ntile assigns by row position, so ties on o_totalprice
    break on o_orderkey — a total order, identical on both engines.
    Physical shape: one shuffle on the window partition key (priority —
    ~5 partitions, each a bounded sort task), then a partial-aggregated
    rollup to at most |priorities|x4 rows. At 100 TB the priority key is
    low-cardinality, so the window shuffle is skew-prone: AQE splits it,
    or a production variant pre-aggregates per (priority, price-range)
    like the salted-agg pattern."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    t = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return t.groupBy(
        "o_orderpriority", F.col("quartile").cast("long").alias("quartile")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("price_cents").alias("lo_cents"),
        F.max("price_cents").alias("hi_cents"),
    )


# ---------------------------------------------------------------------------
# UNPIVOT: wide metric columns -> long (variable, value) rows
# ---------------------------------------------------------------------------

_UNPIVOT_SQL = """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / 100.0 AS qty,
             CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS DOUBLE) / 100.0 AS price,
             CAST(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / 100.0 AS discount
      FROM lineitem GROUP BY 1)
    SELECT l_returnflag, metric, metric_value
    FROM wide
    UNPIVOT (metric_value FOR metric IN (qty, price, discount))
"""


@register("metrics_unpivot_long", _UNPIVOT_SQL)
def q_metrics_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotate a wide per-flag metric table into long (metric, value)
    rows — UNPIVOT/melt, the inverse of the conditional-aggregation
    pivot (`agg_pivot_status`) and the shape every metrics store and
    plotting layer eventually needs.

    Physical shape: the rollup is one partial-aggregated exchange to
    ~|flags| rows; the unpivot itself is an Expand over that TINY
    aggregated frame (|metrics| output rows per input row, zero
    exchanges) — rotating AFTER aggregating is the scale-correct order,
    where melting the raw fact table first would triple the shuffled
    volume for identical output. Sums in exact cents."""
    l = load(spark, sf_dir, "lineitem")

    def cents_sum(col: str):
        return (
            F.sum(F.round(F.col(col) * 100).cast("long")).cast("double") / 100.0
        )

    wide = l.groupBy("l_returnflag").agg(
        cents_sum("l_quantity").alias("qty"),
        cents_sum("l_extendedprice").alias("price"),
        cents_sum("l_discount").alias("discount"),
    )
    return wide.unpivot(
        "l_returnflag", ["qty", "price", "discount"], "metric", "metric_value"
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: HAVING against a share of a global aggregate
# ---------------------------------------------------------------------------

SHARE_THRESHOLD_BP = 500  # keep groups holding > 5.00% of the global total

_VALUE_SHARE_SQL = f"""
    WITH n AS (
      SELECT s_nationkey,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM supplier GROUP BY 1)
    SELECT n.s_nationkey AS nationkey, n.n_suppliers,
           CAST(n.cents AS DOUBLE) / 100.0 AS total_bal
    FROM n
    WHERE n.cents * 10000 > (SELECT sum(cents) FROM n) * {SHARE_THRESHOLD_BP}
"""


@register("supplier_value_share_having", _VALUE_SHARE_SQL)
def q_supplier_value_share_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: nations holding more than a fixed share of the
    global supplier balance — a HAVING clause whose right-hand side is a
    scalar aggregate over the SAME aggregation.

    Spark-first: aggregate once, derive the global total by re-reducing
    the tiny per-nation frame (≤25 rows — never a second scan of the
    fact), broadcast the 1-row total back and filter. The share
    comparison is pure integer arithmetic — ``cents·10⁴ > total·bp`` —
    so no float division exists to diverge between engines (same trick
    as the Q22 threshold). At 100 TB the only fact-sized cost is the
    first groupBy; everything after runs on |groups| rows."""
    s = load(spark, sf_dir, "supplier")
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    per_nation = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers"), F.sum(cents).alias("cents")
    )
    total = per_nation.agg(F.sum("cents").alias("total_cents"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .where(F.col("cents") * 10000 > F.col("total_cents") * SHARE_THRESHOLD_BP)
        .select(
            "nationkey",
            "n_suppliers",
            (F.col("cents").cast("double") / 100.0).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: aggregate -> threshold -> rejoin the fact detail
# ---------------------------------------------------------------------------

BIG_CUSTOMER_CENTS = 400_000_000  # lifetime order value > $4M

_BIG_CUST_SQL = f"""
    WITH c AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cust_cents
      FROM orders GROUP BY 1
      HAVING sum(CAST(round(o_totalprice * 100) AS BIGINT))
             > {BIG_CUSTOMER_CENTS})
    SELECT o.o_orderkey, o.o_custkey,
           CAST(CAST(round(o.o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100.0
               AS order_total,
           CAST(c.cust_cents AS DOUBLE) / 100.0 AS cust_total
    FROM orders o JOIN c ON o.o_custkey = c.o_custkey
"""


@register("orders_big_customer_detail", _BIG_CUST_SQL)
def q_orders_big_customer_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: every order of customers whose LIFETIME order
    value crosses a threshold, with the customer total attached — the
    aggregate → HAVING → rejoin-the-fact pattern (top-spender drilldown,
    whale-account reporting).

    Spark-first: one custkey groupBy (exact cents), the HAVING filter
    shrinks the aggregate to the few qualifying customers, and THAT
    small frame joins back to the fact — no broadcast HINT: at test SF
    Catalyst broadcasts it on statistics (map-side hash join, no
    second fact shuffle), and at 100 TB, if the qualifying set
    outgrows the broadcast threshold, AQE falls back to a shuffle join
    keyed on the same column the aggregate already used — a hard hint
    would force the broadcast and OOM instead. The naive formulation
    (window sum over custkey + filter) would shuffle the whole fact
    into window state; aggregate-then-rejoin moves only |whales|
    rows."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    big = (
        o.groupBy("o_custkey")
        .agg(F.sum(cents).alias("cust_cents"))
        .where(F.col("cust_cents") > BIG_CUSTOMER_CENTS)
        .withColumnRenamed("o_custkey", "_ck")
    )
    return o.join(
        big, o.o_custkey == F.col("_ck")
    ).select(
        "o_orderkey",
        "o_custkey",
        (cents.cast("double") / 100.0).alias("order_total"),
        (F.col("cust_cents").cast("double") / 100.0).alias("cust_total"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated per-group average threshold (decorrelated)
# ---------------------------------------------------------------------------

_SMALL_QTY_SQL = """
    WITH pa AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                 AS sum_qc,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS DOUBLE) / 100.0 AS total_price
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * 5 * pa.n < pa.sum_qc
"""


@register("lineitem_below_avg_qty", _SMALL_QTY_SQL)
def q_lineitem_below_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: line items whose quantity is below 20% of the
    average quantity FOR THAT PART — a correlated scalar subquery
    decorrelated into a per-part aggregate joined back to the fact.

    The threshold comparison is pure integers: ``qty < 0.2·avg`` is
    ``qty_cents·5·n < sum_qty_cents`` — no float average, no division,
    so the boundary rows cannot flip between engines (the Q22/Q11
    trick applied to a correlated predicate). Physical shape: one
    partkey groupBy (map-side partials), and the per-part aggregate
    joins back keyed on partkey — at test SF it broadcasts; at 100 TB
    AQE picks, and both sides already share partkey partitioning from
    the aggregate, so the shuffle join co-locates for free."""
    l = load(spark, sf_dir, "lineitem")
    qc = F.round(F.col("l_quantity") * 100).cast("long")
    pa = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(qc).alias("sum_qc"), F.count(F.lit(1)).alias("n")
    )
    return (
        l.join(pa, l.l_partkey == F.col("_pk"))
        .where(qc * 5 * F.col("n") < F.col("sum_qc"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                .cast("double")
                / 100.0
            ).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# percent_rank / cume_dist with exact-integer emission
# ---------------------------------------------------------------------------

_PCTRANK_SQL = """
    WITH r AS (
      SELECT s_nationkey, s_suppkey,
             rank() OVER w AS rk,
             CAST(count(*) OVER (PARTITION BY s_nationkey) AS BIGINT) AS n
      FROM supplier
      WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey))
    SELECT s_nationkey, s_suppkey,
           CAST(CASE WHEN n = 1 THEN 0
                ELSE (rk - 1) * 1000000 // (n - 1) END AS BIGINT)
               AS pct_rank_micro,
           CAST(rk * 1000000 // n AS BIGINT) AS cume_micro_floor
    FROM r
"""


@register("window_percent_rank_exact", _PCTRANK_SQL)
def q_window_percent_rank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist-style relative positions per nation,
    emitted as EXACT integer micro-units: ``(rank-1)·10⁶ div (n-1)``
    and ``rank·10⁶ div n`` — the built-in double-valued
    ``percent_rank()``/``cume_dist()`` divide on both engines and can
    disagree in the last bits, so the catalog's hashable variant
    derives the same ordering information from rank + partition count
    in integer arithmetic (tie-break on s_suppkey makes rank total).

    Physical shape: both window specs share the nation partitioning, so
    Spark plans ONE exchange and evaluates rank and the partition count
    in the same window stage pair; no global sort."""
    s = load(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    wn = W.partitionBy("s_nationkey")
    # rank() is IntegerType — widen to long BEFORE the 10⁶ scale-up or
    # partitions past ~2147 rows overflow 32-bit (ANSI throw / wrap)
    r = s.select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).cast("long").alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.select(
        "s_nationkey",
        "s_suppkey",
        F.when(F.col("n") == 1, F.lit(0).cast("long"))
        .otherwise(F.expr("(rk - 1) * 1000000 div (n - 1)"))
        .alias("pct_rank_micro"),
        F.expr("rk * 1000000 div n").cast("long").alias("cume_micro_floor"),
    )


# ---------------------------------------------------------------------------
# Multiset set ops: INTERSECT ALL / EXCEPT ALL
# ---------------------------------------------------------------------------

_MULTISET_SQL = """
    WITH a AS (SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'),
         b AS (SELECT l_partkey AS k FROM lineitem WHERE l_linestatus = 'F'),
         i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
         x AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT k) AS BIGINT) AS n_keys FROM i
    UNION ALL
    SELECT 'except_all', CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT k) AS BIGINT) FROM x
"""


@register("set_multiset_ops", _MULTISET_SQL)
def q_set_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — the MULTISET semantics (per-row
    multiplicity min / difference) that the plain set variants already
    in the catalog (`set_intersect_except`) collapse away. The catalog
    summarizes to (rows, distinct keys) per op so the result is tiny
    and hash-stable while still pinning multiplicity arithmetic.

    Physical shape: Catalyst rewrites both ops into a count-per-key
    aggregate on each side + a join computing min/difference of
    multiplicities + a generate replicating rows — one shuffle per
    side keyed on the value, no cartesian anywhere; the final counts
    partial-aggregate to 2 rows."""
    l = load(spark, sf_dir, "lineitem")
    a = l.where(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("k"))
    b = l.where(F.col("l_linestatus") == "F").select(F.col("l_partkey").alias("k"))

    def summarize(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("k").alias("n_keys"),
        ).select(F.lit(op).alias("op"), "n_rows", "n_keys")

    return summarize(a.intersectAll(b), "intersect_all").unionAll(
        summarize(a.exceptAll(b), "except_all")
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: chained EXISTS + NOT EXISTS on one fact
# ---------------------------------------------------------------------------

_WAITING_SQL = """
    WITH l AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 1500 DAY AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F')
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN (SELECT * FROM l WHERE late) l1 ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY 1
"""


@register("suppliers_kept_waiting", _WAITING_SQL)
def q_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): count, per
    supplier, the finished-order line items shipped very late (>1500
    days after the order date — the driver tables carry no
    receipt/commit dates, so lateness is defined against o_orderdate)
    in MULTI-supplier orders where that supplier was the ONLY late one.
    The oracle keeps Q21's literal chained EXISTS + NOT EXISTS over the
    same derived fact — the hardest double-correlation pattern in the
    TPC-H suite, and the shape compliance/attribution queries hit when
    they ask "who alone caused the delay".

    Spark-first decorrelation: instead of two correlated probes per l1
    row, derive per-(order, supplier) late-row counts with ONE
    aggregation, then answer both EXISTS conditions from per-order
    window totals on that already-aggregated frame:

      n_supps >= 2        ==  EXISTS another supplier in the order
      n_late_supps == 1   ==  NOT EXISTS another LATE supplier
      (given this supplier is itself late)

    Physical shape: one orderkey-keyed shuffle pair joins the two
    facts; the (orderkey, suppkey) aggregation and the per-order
    windows REUSE that partitioning (HashPartitioning(orderkey)
    satisfies both clusterings), so nothing reshuffles until the frame
    has collapsed to per-(order, supplier) rows; the s_name rollup
    shuffles ~|suppliers| rows. Two fact-sized exchanges total — the
    correlated probes cost zero extra passes over lineitem."""
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 1500 DAYS")
    ).cast("long")
    per_os = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("is_late").alias("n_late_rows"))
    )
    wo = W.partitionBy("l_orderkey")
    waiters = (
        per_os.withColumn("n_supps", F.count(F.lit(1)).over(wo))
        .withColumn(
            "n_late_supps",
            F.sum((F.col("n_late_rows") > 0).cast("long")).over(wo),
        )
        .where(
            (F.col("n_late_rows") > 0)
            & (F.col("n_supps") >= 2)
            & (F.col("n_late_supps") == 1)
        )
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiters.join(F.broadcast(s), waiters.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: nested IN with a correlated aggregate threshold
# ---------------------------------------------------------------------------

_DOMINANT_SQL = """
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_suppkey, l_partkey
      HAVING 20 * CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             > 3 * (SELECT CAST(sum(CAST(round(l2.l_quantity * 100) AS BIGINT))
                                AS BIGINT)
                    FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
    )
"""


@register("suppliers_dominant_share", _DOMINANT_SQL)
def q_suppliers_dominant_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who moved
    more than 15% of the total shipped quantity of any 'red' part —
    the driver tables carry no partsupp/availqty, so the correlated
    threshold compares a supplier's shipped share against the
    part-wide total instead. The oracle keeps Q20's literal nesting:
    an IN over a grouped subquery whose HAVING holds a CORRELATED
    scalar aggregate, inside another IN for the part filter.

    Spark-first decorrelation: partkey determines the part name, so
    the correlated per-part total equals the total over the SAME
    red-filtered rows — one broadcast part filter, ONE fact
    aggregation to (suppkey, partkey) quantities, and the per-part
    total folds from that already-aggregated frame with a window (the
    classic decorrelate-to-window rewrite). Threshold compares exact
    integer cents (20·q > 3·total), bit-identical on both engines.

    Physical shape: one fact-sized shuffle keyed (l_suppkey,
    l_partkey) with map-side partial agg; the window and the distinct
    supplier set run on the collapsed frame; supplier joins LEFT SEMI
    against that tiny set and nation broadcasts. At 100 TB the only
    heavy exchange is the one keyed aggregation."""
    qc = F.round(F.col("l_quantity") * 100).cast("long")
    red = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    per_sp = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey", "l_partkey", qc.alias("qc"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("qc").alias("qty_c"))
    )
    total = F.sum("qty_c").over(W.partitionBy("l_partkey"))
    dominant = (
        per_sp.withColumn("total_c", total)
        .where(20 * F.col("qty_c") > 3 * F.col("total_c"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: aggregate compared against the max of the same aggregate
# ---------------------------------------------------------------------------

_TOP_SUPPLIER_SQL = """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS rev_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name,
           CAST(rev_c AS DOUBLE) / 10000 AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev_c = (SELECT max(rev_c) FROM rev)
"""


@register("supplier_top_revenue", _TOP_SUPPLIER_SQL)
def q_supplier_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) whose one-year
    revenue equals the MAXIMUM per-supplier revenue — the view-then-
    max-of-view pattern, kept exact by comparing integer cents·(100-d)
    units so the equality is bit-stable (Q15's classic float-equality
    trap: `= max(double)` silently drops ties on some engines).

    Spark-first: ONE shuffled aggregation builds the revenue frame; the
    global max folds from that already-aggregated frame (K rows) as a
    broadcast scalar crossJoin; the equality filter and the supplier
    join run on K rows. The fact is scanned and shuffled exactly once —
    the naive reading of Q15 (re-derive the view inside the subquery)
    would scan it twice. Date bounds push to the parquet scan."""
    qc = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    rev = (
        load(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(qc.cast("decimal(38,0)")).alias("rev_c"))
    )
    mx = rev.agg(F.max("rev_c").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))  # 1-row aggregate scalar
        .where(F.col("rev_c") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c").cast("double") / 10000).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: conditional CASE aggregation over a fact-fact join
# ---------------------------------------------------------------------------

_SHIPCLASS_SQL = """
    SELECT l.l_returnflag AS ship_class,
           CAST(count(*) FILTER (WHERE o.o_orderpriority
                                 IN ('1-URGENT', '2-HIGH')) AS BIGINT)
             AS high_line_count,
           CAST(count(*) FILTER (WHERE o.o_orderpriority
                                 NOT IN ('1-URGENT', '2-HIGH')) AS BIGINT)
             AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
    GROUP BY 1
"""


@register("shipclass_priority_counts", _SHIPCLASS_SQL)
def q_shipclass_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship class (l_returnflag stands in for the
    absent l_shipmode), how many VERY late line items (>365 days after
    the order date) belonged to high- vs low-priority orders — the
    canonical conditional CASE aggregation where one pass produces both
    branch counts.

    Spark-first: the priority predicate folds into two `sum(when(...))`
    branches inside ONE aggregation — no second scan, no pivot, no
    self-join (the anti-pattern is one filtered count per branch, which
    doubles the fact joins). One orderkey-keyed join (AQE picks
    broadcast vs shuffle), partial aggregation collapses to 3 rows
    map-side before a trivial exchange."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: single-table filtered aggregate (the pushdown probe)
# ---------------------------------------------------------------------------

_FORECAST_SQL = """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@register("forecast_revenue_change", _FORECAST_SQL)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the one-table filtered
    aggregate whose entire value at scale is PREDICATE PUSHDOWN — all
    three filters (date range, discount band, quantity cap) must reach
    the parquet scan so row groups outside the year/band are skipped on
    footer stats alone. Revenue in exact integer cents·bp units.

    Plan shape: scan (4 columns, 4 pushed filters) → map-side partial
    sum → 1-row exchange. Zero joins, zero windows — the floor any
    engine must hit; PLANS.md pins the PushedFilters list."""
    l = load(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        F.col("l_discount") * 100
    ).cast("long")
    return (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        # accumulate in DECIMAL(38,0): one year of cents*bp revenue
        # passes int64 around ~1e10 rows; the final BIGINT cast is
        # ANSI-loud if the total truly exceeds it (DuckDB's HUGEINT sum
        # + BIGINT cast fails the same way — symmetric engines)
        .agg(F.sum(rev.cast("decimal(38,0)")).cast("long").alias("revenue_c"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share within a region, by year
# ---------------------------------------------------------------------------

_MKT_SHARE_SQL = """
    WITH flat AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vol_c,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'EUROPE')
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST((2 * CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                                   THEN vol_c ELSE 0 END) AS HUGEINT)
                 * 1000000 + sum(vol_c))
                // (2 * sum(vol_c)) AS BIGINT) AS mkt_share_ppm
    FROM flat GROUP BY 1
"""


@register("nation_market_share", _MKT_SHARE_SQL)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's share of the
    revenue that EUROPE's customers spent, per order year — the
    two-branch conditional share whose numerator is a CASE inside the
    same aggregation as the denominator. Share in exact integer ppm via
    the round-half-up (2a·10⁶+b) div 2b identity (both engines widen
    the numerator past 64 bits: HUGEINT / DECIMAL(38,0)).

    Spark-first: customers prune to the region through two broadcast
    dims BEFORE touching the facts; the two fact-fact joins key on
    orderkey then custkey; supplier+nation broadcast onto the line
    items; one final ≤|years| aggregation. No self-join, no second
    pass for the numerator — the classic Q8 trap is computing the
    nation's revenue separately and re-joining."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    c = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r), n.n_regionkey == r.r_regionkey
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    flat = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # region-pruned customers
        # no broadcast hint: supplier scales with SF (AQE broadcasts
        # while it fits, falls back to shuffle at cluster scale)
        .join(s, l.l_suppkey == s.s_suppkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("vol_c"),
            "supp_nation",
        )
    )
    return flat.groupBy("o_year").agg(
        F.expr(
            # the sums THEMSELVES run in DECIMAL(38,0), not just a
            # post-sum cast: a LONG sum overflows around 1e10 high-value
            # line items per (region, year) while the DuckDB oracle's
            # HUGEINT sum survives — widening inside keeps both exact
            "CAST((2 * sum(CAST(CASE WHEN supp_nation = 'NATION_3'"
            " THEN vol_c ELSE 0 END AS DECIMAL(38,0))) * 1000000"
            " + sum(CAST(vol_c AS DECIMAL(38,0))))"
            " div (2 * sum(CAST(vol_c AS DECIMAL(38,0))))"
            " AS BIGINT)"
        ).alias("mkt_share_ppm")
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item top customers (join + top-N)
# ---------------------------------------------------------------------------

_RETURNED_SQL = """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue_c DESC, c_custkey ASC
    LIMIT 20
"""


@register("returned_item_top_customers", _RETURNED_SQL)
def q_returned_item_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): the 20 customers who
    returned the most revenue in one quarter, with their nation — the
    join-heavy top-N every support dashboard runs.

    Spark-first: returnflag and the quarter push to the two fact
    scans; facts join on orderkey then aggregate per customer BEFORE
    the customer/nation dims attach (aggregate-then-join keeps the dim
    join at |customers-with-returns| rows, not |lineitems|); the top-20
    lands as TakeOrderedAndProject (per-partition heaps + single merge
    — never a global sort). Deterministic tie-break on c_custkey."""
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    ).select("o_orderkey", "o_custkey")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    per_cust = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(rev.cast("decimal(38,0)")).cast("long").alias("revenue_c"))
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        # customer scales with SF — no forced broadcast (AQE decides)
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue_c")
        .orderBy(F.desc("revenue_c"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Exact interpolated group quantiles (percentile parity across engines)
# ---------------------------------------------------------------------------

_MEDIAN_SQL = """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS q25,
           round(quantile_cont(l_quantity, 0.5), 6) AS median,
           round(quantile_cont(l_quantity, 0.75), 6) AS q75
    FROM lineitem GROUP BY 1
"""


@register("agg_exact_median_groups", _MEDIAN_SQL)
def q_agg_exact_median_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated per-group quantiles (q25/median/q75) — the
    continuous-percentile semantics (Spark ``percentile`` ↔ DuckDB
    ``quantile_cont``, both linear interpolation between order
    statistics) that the approx-sketch twin (`agg_quantiles_value`)
    deliberately avoids. Cross-engine exact because interpolation on
    the same sorted multiset is deterministic arithmetic.

    Scale shape: Spark's exact percentile aggregates a per-partition
    value-count map and merges maps at the exchange — memory tracks the
    number of DISTINCT values per group (l_quantity has 50), not rows,
    so this is safe wherever the value domain is bounded; unbounded
    domains should use the approx twin instead. One shuffle, 3 rows."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q75"),
    )


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching (data-cleaning entity resolution)
# ---------------------------------------------------------------------------

FUZZY_SAMPLE_KEYS = 150
FUZZY_MAX_DIST = 2

_FUZZY_SQL = f"""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE a.c_custkey < {FUZZY_SAMPLE_KEYS} AND b.c_custkey < {FUZZY_SAMPLE_KEYS}
      AND levenshtein(a.c_name, b.c_name) <= {FUZZY_MAX_DIST}
"""


@register("fuzzy_name_match_pairs", _FUZZY_SQL)
def q_fuzzy_name_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: candidate entity pairs whose names
    are within Levenshtein distance 2 — the data-cleaning / entity-
    resolution primitive (dirty imports, typo'd joins) the hash-based
    dedup family can't express. Spark's ``levenshtein`` and DuckDB's
    agree exactly (unit-cost edits), so the pair set is oracle-checked
    verbatim.

    The self-join is bounded by an explicit key-range block here (the
    synthetic names carry no other blocking signal); at 100 TB fuzzy
    matching ALWAYS needs a blocking key before the pairwise stage —
    q-gram/phonetic buckets or the MinHash band join (`dedup_minhash_
    lsh`) as the candidate generator, with levenshtein as the verifier
    on the bounded candidate stream. The operator here is that
    verifier stage."""
    c = load(spark, sf_dir, "customer").where(
        F.col("c_custkey") < FUZZY_SAMPLE_KEYS
    ).select("c_custkey", "c_name")
    a = c.select(F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"))
    b = c.select(F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= FUZZY_MAX_DIST)
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy matching: q-gram prefix-filter candidate generator
# (ED-Join-style) feeding the levenshtein verifier — no key-range cap
# ---------------------------------------------------------------------------

FUZZY_BLOCK_Q = 2          # gram width
FUZZY_BLOCK_MAX_DIST = 1   # edit-distance threshold the blocking preserves
_FUZZY_BLOCK_PREFIX = FUZZY_BLOCK_Q * FUZZY_BLOCK_MAX_DIST + 1

_FUZZY_BLOCKED_SQL = f"""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {FUZZY_BLOCK_MAX_DIST}
"""


@register("fuzzy_name_match_blocked", _FUZZY_BLOCKED_SQL)
def q_fuzzy_name_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance join over the FULL customer table: exact
    Levenshtein-
    ≤-1 name pairs, with a LOSSLESS q-gram prefix-filter candidate
    generator replacing `fuzzy_name_match_pairs`' explicit key-range
    block. This is the production candidate-generation stage its
    sibling's docstring promised (ED-Join-family prefix filtering,
    Xiao et al., VLDB'08 — public literature).

    Losslessness (why the oracle can be the literal theta join): an
    edit destroys at most q overlapping grams, so strings a, b with
    ed(a,b) <= D share at least max(|a|,|b|)-q+1-qD gram OCCURRENCES.
    Numbering duplicate grams per string (gram, occ) makes plain set
    intersection equal multiset intersection, and under any shared
    total key order the first |G(s)|-t+1 <= qD+1 keys of each side
    must then intersect (standard prefix-filter theorem; needs
    max(|a|,|b|) >= q(D+1)). Pairs where BOTH strings are shorter than
    q(D+1) chars fall outside the theorem (t < 1) — those strings go
    through a dedicated single-block short-string candidate stream
    instead (bounded: such strings are a corpus-statistics handful;
    zero in this fixed-18-char corpus), and a string long enough to
    have grams but shorter than the prefix length simply keeps ALL its
    grams (row_number <= prefix covers it). Keys are ordered by
    (global frequency, gram, occ) — rarest first — so candidate
    buckets are the rarest grams in the corpus and bucket sizes stay
    bounded. Measured at sf0.01: 152,762 candidate pairs vs 1,124,250
    all-pairs (7.4x pruning; this fixed-format synthetic name corpus
    is near the worst case — 19,500 of those candidates are TRUE
    pairs, so no blocking could prune much further).

    Physical shape — equi-joins only, NO theta self-join: one
    custkey-keyed shuffle computes occurrence numbers AND the
    rarest-first prefix ranks (two windows REUSING the same
    partitioning), the (gram, occ) frequency table folds from the same
    exploded frame and broadcasts back, candidates come from one
    (gram, occ)-keyed equi-join (`key_a < key_b` is a post-join
    filter, not the join predicate), and the pair-distinct collapses
    duplicate candidates before the levenshtein verifier runs once per
    candidate. At 100 TB every exchange is keyed and bounded; the
    plan-invariant test pins zero BroadcastNestedLoopJoin."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    q, prefix_len = FUZZY_BLOCK_Q, _FUZZY_BLOCK_PREFIX
    # strings with no q-grams (len < q) would make sequence() descend and
    # emit garbage grams; strings below q(D+1) can't satisfy the theorem
    # against each other at all — gate gram generation to len >= q and
    # route the short band through its own block below
    gram_arr = F.when(
        F.length("c_name") >= q,
        F.expr(
            f"transform(sequence(1, length(c_name) - {q - 1}),"
            f" i -> substring(c_name, i, {q}))"
        ),
    ).otherwise(F.array())
    grams = (
        c.select(
            "c_custkey",
            "c_name",
            F.posexplode(gram_arr).alias("pos", "gram"),
        )
    )
    w_occ = W.partitionBy("c_custkey", "gram").orderBy("pos")
    keyed = grams.withColumn("occ", F.row_number().over(w_occ))
    freq = keyed.groupBy("gram", "occ").agg(
        F.count(F.lit(1)).alias("gfreq")
    )
    w_rank = W.partitionBy("c_custkey").orderBy("gfreq", "gram", "occ")
    prefix = (
        keyed.join(F.broadcast(freq), ["gram", "occ"])
        .withColumn("rk", F.row_number().over(w_rank))
        .where(F.col("rk") <= prefix_len)
        .select("c_custkey", "c_name", "gram", "occ")
    )
    a = prefix.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        "gram",
        "occ",
    )
    b = prefix.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        "gram",
        "occ",
    )
    cand = (
        a.join(b, ["gram", "occ"])
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "name_a", "name_b")
    )
    # short band: strings below q(D+1) chars pair among themselves
    # through a LENGTH-band equi-join (ed <= D forces |len_a - len_b|
    # <= D, so each side emits its length and length+1 as block keys —
    # every within-band pair meets on at least one key; a LONGER
    # partner of a short string is covered by the prefix join, whose
    # theorem only needs the longer side's length). The key is
    # data-derived, so Catalyst can't constant-fold it away into a
    # nested-loop join the way a literal key would be.
    short = c.where(
        F.length("c_name") <= q * (FUZZY_BLOCK_MAX_DIST + 1) - 1
    ).select(
        "c_custkey",
        "c_name",
        F.explode(
            F.array(F.length("c_name"), F.length("c_name") + 1)
        ).alias("blk"),
    )
    sa = short.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        "blk",
    )
    sb = short.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        "blk",
    )
    cand_short = (
        sa.join(sb, "blk")
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "name_a", "name_b")
    )
    cand = cand.unionByName(cand_short).distinct()
    return (
        cand.select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= FUZZY_BLOCK_MAX_DIST)
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q9 shapes on a DERIVED partsupp: the driver tables carry no
# partsupp, so both engines build the identical (l_partkey, l_suppkey)
# dimension with a deterministic hash-derived integer supplycost
# ---------------------------------------------------------------------------

# the derived-partsupp CTE both oracles share: cost is a pure arithmetic
# function of the join key so Spark and DuckDB agree bit-for-bit
_PARTSUPP_CTE = """
    partsupp AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             100 + (l_partkey * 37 + l_suppkey * 101) % 90000
               AS ps_supplycost_c
      FROM lineitem)
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _PARTSUPP_CTE: distinct (partkey, suppkey)
    pairs actually traded, each with the deterministic integer-cent
    supplycost. One fact-sized shuffle (the distinct); at 100 TB this
    materializes once and is bucketed by ps_partkey for reuse."""
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.distinct()
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            (
                F.lit(100)
                + (F.col("l_partkey") * 37 + F.col("l_suppkey") * 101)
                % 90000
            ).alias("ps_supplycost_c"),
        )
    )


_Q2_SQL = f"""
    WITH {_PARTSUPP_CTE}
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
           round(s.s_acctbal, 2) AS acctbal,
           CAST(ps.ps_supplycost_c AS DOUBLE) / 100 AS supplycost
    FROM part p, partsupp ps, supplier s, nation n, region r
    WHERE p.p_partkey = ps.ps_partkey
      AND s.s_suppkey = ps.ps_suppkey
      AND p.p_size <= 15 AND p.p_type = 'STANDARD'
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost_c = (
        SELECT min(ps2.ps_supplycost_c)
        FROM partsupp ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = p.p_partkey
          AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE')
"""


@register("tpch_q2_min_cost_supplier", _Q2_SQL)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each STANDARD
    size-15 part, the EUROPE supplier(s) whose derived supplycost
    equals the minimum European supplycost for that part. The oracle
    keeps Q2's literal correlated-min subquery over the shared
    derived-partsupp CTE; ties keep every minimal supplier (integer
    cost equality — no float-equality trap).

    Spark-first decorrelation: the correlated `= (SELECT min ...)`
    becomes a min window over the SAME region-filtered frame the outer
    query scans (classic decorrelate-to-window). Supplier⨝nation⨝
    region collapses to one broadcast European-supplier dim; the part
    filter broadcasts and LEFT SEMI prunes partsupp BEFORE the window
    (valid: the correlated subquery is per-part, so rows of other
    parts can never influence a surviving group). Physical shape: one
    (partkey, suppkey)-keyed fact shuffle builds the distinct
    partsupp, one partkey shuffle feeds the min window, dims all
    broadcast — two fact-sized exchanges total, no correlated re-scan.
    """
    ps = _derived_partsupp(spark, sf_dir)
    p = (
        load(spark, sf_dir, "part")
        .where((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    s_eu = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r),
                    n.n_regionkey == r.r_regionkey,
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_costs = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey, "left_semi")
        .join(F.broadcast(s_eu), ps.ps_suppkey == s_eu.s_suppkey)
    )
    w_min = W.partitionBy("ps_partkey")
    return (
        eu_costs.withColumn(
            "min_cost_c", F.min("ps_supplycost_c").over(w_min)
        )
        .where(F.col("ps_supplycost_c") == F.col("min_cost_c"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            (F.col("ps_supplycost_c").cast("double") / 100).alias(
                "supplycost"
            ),
        )
    )


_Q9_SQL = f"""
    WITH {_PARTSUPP_CTE}
    SELECT nation, o_year,
           -- round the exact 1e-4-dollar integer to cents in INTEGER
           -- arithmetic (half away from zero), then one exact /100:
           -- round(sum/10000.0, 2) hits double .xx5 boundaries where
           -- the engines' float-rounding paths diverge (caught by the
           -- below-fold sweep at sf0.001)
           CAST(CASE WHEN su >= 0 THEN (su + 50) // 100
                     ELSE -((-su + 50) // 100) END AS DOUBLE) / 100
               AS sum_profit
    FROM (
        SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
               CAST(sum(
                   CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                   - ps.ps_supplycost_c
                     * CAST(round(l.l_quantity) AS BIGINT) * 100
                 ) AS BIGINT) AS su
    FROM lineitem l
    JOIN partsupp ps ON l.l_partkey = ps.ps_partkey
                    AND l.l_suppkey = ps.ps_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE 'blue%'
    GROUP BY 1, 2
    ) grouped
"""


@register("tpch_q9_profit_rollup", _Q9_SQL)
def q_tpch_q9_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per supplier-nation and
    order-year, the profit on 'blue' parts — revenue in exact
    1e-4-dollar integer units (cents x (100 - discount-cents)) minus
    derived supplycost x quantity in the same units, summed exactly
    and only then converted to rounded dollars. The oracle keeps Q9's
    literal six-table join through the shared derived-partsupp CTE.

    Spark-first: the derived supplycost is a pure function of the
    (l_partkey, l_suppkey) join key, so the partsupp join COLLAPSES to
    a scalar projection on lineitem — the oracle's join returns
    exactly one match per row by construction, and Catalyst can't know
    that, so we apply the rewrite by hand (with a real partsupp table
    this would instead be a bucketed or broadcast dim join). Physical
    shape: part-filter broadcast semi-prunes lineitem at the scan,
    ONE fact-sized shuffle joins orders (the only fact-fact exchange),
    supplier->nation broadcasts, and the rollup aggregates
    map-side-partial onto ~|nations| x |years| groups."""
    qc = lambda col: F.round(F.col(col) * 100).cast("long")  # noqa: E731
    p_blue = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    cost_c = (
        F.lit(100)
        + (F.col("l_partkey") * 37 + F.col("l_suppkey") * 101) % 90000
    )
    amount_u = (
        qc("l_extendedprice") * (F.lit(100) - qc("l_discount"))
        - cost_c * F.round(F.col("l_quantity")).cast("long") * 100
    )
    l = (
        load(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(p_blue),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_orderkey", "l_suppkey", amount_u.alias("amount_u"))
    )
    s_n = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    su = F.col("su")
    cents = F.when(su >= 0, F.expr("(su + 50) div 100")).otherwise(
        -F.expr("(-su + 50) div 100")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s_n), l.l_suppkey == s_n.s_suppkey)
        .groupBy("nation", "o_year")
        .agg(F.sum("amount_u").alias("su"))
        # integer half-away-from-zero to cents, then ONE exact /100 —
        # float round(su/10000.0, 2) diverges between engines on .xx5
        # boundaries (first seen at sf0.001 after the r7 rotation put
        # this query under the below-fold sweep)
        .select(
            "nation", "o_year",
            (cents.cast("double") / 100).alias("sum_profit"),
        )
    )


# ---------------------------------------------------------------------------
# Rounding-boundary tripwire probes (VERDICT r7 item #6)
#
# The Q9 red documented a float-rounding class: round(S/10^4, 2) of an exact
# integer S sits on a TRUE .xx5 boundary whenever S ≡ 50 (mod 100), and the
# two engines' rounding paths (Spark BigDecimal HALF_UP on the binary double
# vs DuckDB) then disagree by one cent. PERF_NOTES also documents the latent
# cousin: round(n/d, 6) hits a 7th-decimal half when the reduced denominator
# is 2^a·5^b with max(a,b) = 7 (e.g. odd n / 128). These two probes FORCE a
# boundary value in every group — 100% of rows sit on the half, vs ~1%
# naturally — and route it through the catalog's sanctioned fix (integer
# half-away-from-zero, then ONE exact division), so any drift in the fix
# pattern, a Spark/DuckDB rounding change, or a regressed helper turns the
# permanent sf0.001+sf0.01 sweeps red instead of waiting for a lucky group
# sum. They sit in the driver window like any other query.
# ---------------------------------------------------------------------------

_PROBE_HALF_CENTS_SQL = """
    WITH g AS (
      SELECT l_returnflag,
             (CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) // 100) * 100 + 50 AS s
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(s AS BIGINT) AS units_boundary,
           CAST((s + 50) // 100 AS BIGINT) / 100.0 AS dollars
    FROM g
"""


@register("probe_round_half_cents", _PROBE_HALF_CENTS_SQL)
def q_probe_round_half_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tripwire probe for the Q9 rounding class: per group, the exact
    integer unit sum is FORCED onto the .xx5 cent boundary
    (``s := (S div 100)*100 + 50``, so s ≡ 50 mod 100 in every group),
    then converted to dollars via the sanctioned integer-cents pattern —
    half away from zero in BIGINT arithmetic, ONE exact /100.0 at the
    end. A naive ``round(s / 10^4, 2)`` here diverges between the
    engines on every single row; the probe stays green only while the
    fix pattern holds bit-for-bit on both sides. Scale shape: one
    map-side-partial groupBy — a probe, not a workload."""
    li = load(spark, sf_dir, "lineitem")
    units = F.round(F.col("l_extendedprice") * 100).cast("long")
    g = (
        li.groupBy("l_returnflag")
        .agg(F.sum(units).alias("su"))
        .select(
            "l_returnflag",
            (F.expr("su div 100") * 100 + 50).alias("s"),
        )
    )
    return g.select(
        "l_returnflag",
        F.col("s").alias("units_boundary"),
        (F.expr("(s + 50) div 100").cast("double") / 100).alias("dollars"),
    )


_PROBE_POW2_SIXTH_SQL = """
    WITH g AS (
      SELECT l_linenumber,
             CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) * 2 + 1
               AS n
      FROM lineitem GROUP BY l_linenumber
    )
    SELECT l_linenumber,
           CAST(n AS BIGINT) AS odd_num,
           -- HUGEINT twin of the Spark DECIMAL(38,0) widening: n is a
           -- group quantity sum, the same class the shared helpers
           -- widened in r9 (n·2e6 wrapped int64 past n≈4.6e12)
           CAST((CAST(n AS HUGEINT) * 2000000 + 128) // 256 AS BIGINT)
               / 1000000.0 AS ratio6
    FROM g
"""


@register("probe_round_pow2_sixth", _PROBE_POW2_SIXTH_SQL)
def q_probe_round_pow2_sixth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tripwire probe for the documented Q9 cousin: ``round(n/128, 6)``
    sits on a TRUE 7th-decimal half for every ODD n (1/128 = 0.0078125 —
    reduced denominator 2^7, max(a,b)=7). The probe forces oddness
    (``n := 2*SUM(qty)+1``) so 100% of groups hit the boundary, then
    rounds to 6 dp via the sanctioned pattern — half-up in BIGINT
    ((2·n·10^6 + 128) div (2·128)), ONE exact /10^6. Scale shape: one
    7-group map-side-partial aggregate."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    g = (
        li.groupBy("l_linenumber")
        .agg((F.sum(qty) * 2 + 1).alias("n"))
    )
    return g.select(
        "l_linenumber",
        F.col("n").alias("odd_num"),
        # DECIMAL(38,0) numerator: n is a group quantity sum — the same
        # int64-overflow class the shared half-up helpers widened in r9
        (
            F.expr("(CAST(n AS DECIMAL(38,0)) * 2000000 + 128) div 256")
            .cast("double")
            / 1000000
        ).alias("ratio6"),
    )


_PROBE_SIGNED_MONEY_SQL = f"""
    WITH g AS (
      SELECT l_returnflag,
             (CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   AS BIGINT) // 100) * 100 + 50 AS b
      FROM lineitem GROUP BY l_returnflag),
    u AS (
      SELECT l_returnflag, b AS s FROM g
      UNION ALL
      SELECT l_returnflag, -b FROM g)
    SELECT l_returnflag,
           CAST(s AS BIGINT) AS units_signed,
           {_sql_u_to_dollars('s')} AS dollars
    FROM u
"""


@register("probe_signed_money_round", _PROBE_SIGNED_MONEY_SQL)
def q_probe_signed_money_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tripwire probe for the SIGNED half of the money-rounding contract
    (ADVICE r9): ``units_to_dollars`` rounds half AWAY FROM ZERO, but
    until r9 every paired oracle emitted bare floor division, so the
    contract was unverified (and silently divergent) for negative unit
    sums — none of which occur in today's revenue data. The probe forces
    a .xx5 boundary unit sum per group (``b ≡ 50 mod 100``) and emits
    BOTH ``+b`` and ``−b`` through the Spark helper and its new
    sign-mirrored SQL twin (:func:`sql_units_to_dollars`), so every row
    exercises one branch on a true half: floor division on the negative
    rows would be one cent off on all of them. Scale shape: one
    map-side-partial groupBy + a 2-row explode per group — a probe."""
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(F.sum(_revenue_u()).alias("su"))
    b = g.select(
        "l_returnflag", (F.expr("su div 100") * 100 + 50).alias("b")
    )
    two = b.select(
        "l_returnflag",
        F.explode(F.array(F.col("b"), -F.col("b"))).alias("s"),
    )
    return two.select(
        "l_returnflag",
        F.col("s").alias("units_signed"),
        _u_to_dollars("s").alias("dollars"),
    )


_PROBE_WIDE_UNITS_SQL = """
    WITH s AS (
      SELECT source,
             CAST(SUM(n_chars) AS BIGINT) * 10000000000 + 1 AS wide_num,
             CAST(count(*) AS BIGINT) AS den
      FROM documents GROUP BY source)
    SELECT source,
           CAST(wide_num AS BIGINT) AS wide_num,
           den,
           CAST((2 * CAST(wide_num AS HUGEINT) * 1000000 + den)
                // (2 * den) AS BIGINT) / 1000000.0 AS ratio6
    FROM s
"""


_WIDE_SUM_FACTOR = 20_000_000

_PROBE_WIDE_MONEY_SQL = f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           -- DuckDB auto-widens SUM(BIGINT) to HUGEINT, the twin of the
           -- Spark side's DECIMAL(38,0) sum; per-row values fit BIGINT
           CAST((SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     * {_WIDE_SUM_FACTOR}) + 500000) // 1000000
                AS BIGINT) AS mega_units
    FROM lineitem GROUP BY l_returnflag
"""


@register("probe_wide_money_sum", _PROBE_WIDE_MONEY_SQL)
def q_probe_wide_money_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tripwire probe for the 100 TB money-SUM regime (review r9): a
    LONG sum of revenue units ANSI-aborts once a group's total passes
    2⁶³ (~9.2e9 rows at ~1e9 units/row — TPC-H-shaped groups reach that
    around 15 TB), so the engine provides :func:`sum_units_wide`
    (DECIMAL(38,0) aggregation; DuckDB twin: SUM's automatic HUGEINT).
    The probe scales each row's units by 2e7 — still int64 per row —
    so every group's SUM exceeds 2⁶³ at EVERY sweep SF; the long-sum
    form provably aborts on exactly this input
    (tests/test_round9_queries.py). Output re-narrows to BIGINT mega
    units (half-up ``div 10⁶``) for the type-aware driver hash. Scale
    shape: one map-side-partial groupBy — a probe."""
    from proteofav_spark.queries import sum_units_wide

    li = load(spark, sf_dir, "lineitem")
    wide = _revenue_u() * F.lit(_WIDE_SUM_FACTOR)
    g = li.groupBy("l_returnflag").agg(
        sum_units_wide(wide).alias("s"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return g.select(
        "l_returnflag",
        "n_rows",
        F.expr("CAST((s + 500000) div 1000000 AS BIGINT)").alias(
            "mega_units"
        ),
    )


@register("probe_half_up_wide_units", _PROBE_WIDE_UNITS_SQL)
def q_probe_half_up_wide_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tripwire probe for the int64-overflow guard on the shared half-up
    helpers (ADVICE r8, medium): ``half_up_ratio``/``half_up_6dp`` now
    compute the scaled numerator in DECIMAL(38,0), because the old
    BIGINT ``2·num·10⁶`` overflowed int64 once num passed ~4.6e12 —
    trivially exceeded by group char sums at the 100 TB target
    (ANSI mode, the Spark 4 default here, ABORTS the job on that
    overflow; legacy non-ANSI wraps silently — verified: the old
    expression throws ARITHMETIC_OVERFLOW on this very probe). The
    probe widens each source's char sum by 10¹⁰
    (``wide_num = SUM(n_chars)·10¹⁰ + 1``, odd, ≥ 6e13 even at
    sf0.001's ~6.3e3-char source minimum), putting the helper's
    internal product at ~10²⁰ — >13× past the int64 wrap point at
    EVERY sweep scale, so reverting the decimal widening
    hash-mismatches this probe immediately instead of waiting for a
    100 TB corpus (the DuckDB twin computes in HUGEINT). The BIGINT
    quotient stays safe: avg_chars·10¹⁶ ≤ 3.7e18 < 2⁶³ on every corpus
    with mean doc length under ~920 chars (driver corpora: ≤367).
    Scale shape: one |sources|-group map-side-partial aggregate — a
    probe."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        (F.sum("n_chars").cast("long") * F.lit(10_000_000_000) + 1).alias(
            "wide_num"
        ),
        F.count(F.lit(1)).alias("den"),
    )
    return s.select(
        "source",
        "wide_num",
        "den",
        _half_up_ratio("wide_num", "den", 6).alias("ratio6"),
    )
