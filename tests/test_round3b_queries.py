"""Semantic invariants for the round-3 batch-2 additions: Markov event
transitions, TWAP, last-touch attribution, the heavy-hitter skew probe,
the TPC-H-Q3-shaped top-N, cohort LTV, the corpus length histogram, and
per-dimension embedding stats. The DuckDB oracles check value parity
against an independent engine; these tests pin the data-independent
semantics."""

import math

import pytest
from pyspark.sql import functions as F

from proteofav_spark.operators.analytics_queries import (
    q_customer_ltv_cohort,
    q_docs_length_histogram,
    q_orders_shipping_priority,
)
from proteofav_spark.operators.llm_queries import DIM, q_embedding_dim_stats
from proteofav_spark.operators.pipeline_queries import (
    SKEW_TOP_N,
    q_events_attribution_last_touch,
    q_events_session_transitions,
    q_events_twap,
    q_skew_heavy_hitters,
)

SF = "/root/testdata/sf0.001"


def test_transitions_probabilities_normalize(spark):
    """Per-source transition probabilities sum to 1 and the total pair
    count is exactly N_events − N_users (each user contributes one
    fewer bigram than events)."""
    rows = q_events_session_transitions(spark, SF).collect()
    by_src: dict[str, float] = {}
    n_pairs = 0
    for r in rows:
        by_src[r["src"]] = by_src.get(r["src"], 0.0) + r["p"]
        n_pairs += r["n_pairs"]
        assert 0.0 < r["p"] <= 1.0
    for src, total in by_src.items():
        assert total == pytest.approx(1.0, abs=1e-4), src
    e = spark.read.parquet(f"{SF}/events.parquet")
    assert n_pairs == e.count() - e.select("user_id").distinct().count()


def test_twap_within_value_envelope(spark):
    """A duration-weighted mean cannot leave [min, max] of the weighted
    values, and every user with ≥2 distinct-ts events appears."""
    res = {r["user_id"]: r for r in q_events_twap(spark, SF).collect()}
    e = spark.read.parquet(f"{SF}/events.parquet")
    env = {
        r["user_id"]: r
        for r in e.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(res) <= set(env)
    for uid, r in res.items():
        # the query emits the TWAP as the exact integer pair
        # twap_num (cents*us) / twap_den (us); reconstruct the mean here
        twap = r["twap_num"] / (100.0 * r["twap_den"])
        # the last event is unweighted, so the envelope over ALL values
        # still bounds the weighted mean of the rest (cents rounding ±0.005)
        assert env[uid]["lo"] - 0.005 <= twap <= env[uid]["hi"] + 0.005
        assert r["n_intervals"] <= env[uid]["n"] - 1
        assert r["span_s"] >= 0
        assert r["twap_den"] > 0


def test_attribution_accounts_for_every_purchase(spark):
    """Channel counts partition the purchase set: every purchase lands
    in exactly one of view/click/direct, and revenue totals match the
    purchases' own value sum to the cent."""
    rows = q_events_attribution_last_touch(spark, SF).collect()
    assert {r["channel"] for r in rows} <= {"view", "click", "direct"}
    e = spark.read.parquet(f"{SF}/events.parquet")
    p = e.where(F.col("event_type") == "purchase")
    assert sum(r["n_purchases"] for r in rows) == p.count()
    total = p.select(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c")
    ).collect()[0]["c"]
    got = round(sum(r["revenue"] for r in rows) * 100)
    assert got == total


def test_skew_profile_is_the_true_top_n(spark):
    """The probe returns the exact top-N keys by count (ties on key),
    with shares that re-multiply to the counts."""
    rows = q_skew_heavy_hitters(spark, SF).collect()
    e = spark.read.parquet(f"{SF}/events.parquet")
    n_total = e.count()
    true = (
        e.groupBy("user_id").count()
        .orderBy(F.desc("count"), "user_id").limit(SKEW_TOP_N).collect()
    )
    assert [(r["user_id"], r["n_events"]) for r in rows] == [
        (r["user_id"], r["count"]) for r in true
    ]
    for r in rows:
        assert r["share"] == pytest.approx(r["n_events"] / n_total, abs=1e-6)


def test_shipping_priority_respects_filters_and_order(spark):
    """Top-10 is revenue-descending, and every returned order passes
    both date predicates and the segment filter."""
    rows = q_orders_shipping_priority(spark, SF).collect()
    assert 0 < len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    seg = {
        r["o_orderkey"]
        for r in o.join(
            c.where(F.col("c_mktsegment") == "BUILDING"),
            o.o_custkey == c.c_custkey,
        ).collect()
    }
    for r in rows:
        assert r["l_orderkey"] in seg
        assert str(r["o_orderdate"]) < "1996-07-01"


def test_ltv_cohort_conserves_revenue(spark):
    """Offsets are non-negative, offset 0 exists for every cohort, and
    total revenue equals the orders table's own total to the cent."""
    rows = q_customer_ltv_cohort(spark, SF).collect()
    cohorts = {r["cohort_mo"] for r in rows}
    zero = {r["cohort_mo"] for r in rows if r["month_offset"] == 0}
    assert zero == cohorts
    assert all(r["month_offset"] >= 0 for r in rows)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    total = o.select(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c")
    ).collect()[0]["c"]
    assert round(sum(r["revenue"] for r in rows) * 100) == total
    assert sum(r["n_orders"] for r in rows) == o.count()


def test_length_histogram_partitions_the_corpus(spark):
    """Histogram cells partition the documents: doc counts and char
    totals re-sum to the corpus, and each cell's average sits inside
    its own bucket bounds."""
    rows = q_docs_length_histogram(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == d.count()
    assert (
        sum(r["total_chars"] for r in rows)
        == d.select(F.sum("n_chars")).collect()[0][0]
    )
    for r in rows:
        lo = r["bucket"] * 200
        assert lo <= r["avg_chars"] < lo + 200


def test_dim_stats_shape_and_envelope(spark):
    """Exactly DIM rows; lo ≤ mean ≤ hi and sd ≥ 0 in every dimension;
    means match a numpy reference within rounding."""
    import numpy as np

    rows = {r["dim0"]: r for r in q_embedding_dim_stats(spark, SF).collect()}
    assert sorted(rows) == list(range(DIM))
    emb = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        ],
        dtype=np.float64,
    )
    mu = emb.mean(axis=0)
    sd = emb.std(axis=0, ddof=1)
    for i, r in rows.items():
        assert r["lo"] <= r["mean"] <= r["hi"]
        assert r["sd"] >= 0
        assert r["mean"] == pytest.approx(mu[i], abs=1e-5)
        assert r["sd"] == pytest.approx(sd[i], abs=1e-5)
        assert not math.isnan(r["mean"])


def test_cdc_upsert_partitions_keys_and_conserves_money(spark):
    """The merged state covers exactly the distinct customer keys, each
    action matches side membership, and post-merge LTV re-sums to the
    orders total to the cent."""
    from proteofav_spark.operators.analytics_queries import (
        CDC_CUTOFF,
        q_cdc_upsert_apply,
    )

    rows = q_cdc_upsert_apply(spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    assert len(rows) == o.select("o_custkey").distinct().count()
    cut = f"{CDC_CUTOFF} 00:00:00"
    snap_keys = {
        r["o_custkey"]
        for r in o.where(F.col("o_orderdate") < cut)
        .select("o_custkey").distinct().collect()
    }
    chg_keys = {
        r["o_custkey"]
        for r in o.where(F.col("o_orderdate") >= cut)
        .select("o_custkey").distinct().collect()
    }
    for r in rows:
        k = r["o_custkey"]
        expected = (
            "update" if k in snap_keys and k in chg_keys
            else "insert" if k in chg_keys else "keep"
        )
        assert r["action"] == expected, k
    total = o.select(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c")
    ).collect()[0]["c"]
    assert round(sum(r["ltv"] for r in rows) * 100) == total
    assert sum(r["n_orders"] for r in rows) == o.count()


def test_trade_volume_excludes_domestic_and_conserves(spark):
    """No (nation, nation) diagonal rows; lineitem counts re-sum to the
    number of cross-nation lineitems; volume matches an exact integer
    recomputation."""
    from proteofav_spark.operators.analytics_queries import (
        q_nation_trade_volume,
    )

    rows = q_nation_trade_volume(spark, SF).collect()
    assert all(r["cust_nation"] != r["supp_nation"] for r in rows)
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
    )
    assert sum(r["n_lineitems"] for r in rows) == j.count()
    total_bp = j.select(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("bp")
    ).collect()[0]["bp"]
    assert round(sum(r["volume"] for r in rows) * 10000) == total_bp


def test_dau_mau_bounds_and_identities(spark):
    """MAU bounds both per-month quantities: active_days ≤ days seen,
    user_days ≤ mau·active_days (so stickiness ≤ 1), user_days ≥ mau,
    and months partition the distinct (user, day) activity set."""
    from proteofav_spark.operators.pipeline_queries import q_events_dau_mau

    rows = q_events_dau_mau(spark, SF).collect()
    assert rows
    e = spark.read.parquet(f"{SF}/events.parquet")
    total_user_days = (
        e.select(
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("d"),
            "user_id",
        )
        .distinct()
        .count()
    )
    assert sum(r["user_days"] for r in rows) == total_user_days
    for r in rows:
        assert r["mau"] <= r["user_days"] <= r["mau"] * r["active_days"]
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["stickiness"] == pytest.approx(
            r["user_days"] / (r["mau"] * r["active_days"]), abs=1e-6
        )


def test_promo_share_bounds_and_totals(spark):
    """Shares live in [0, 1]; month lineitem counts re-sum to the join
    cardinality (= lineitem count, every part key resolves)."""
    from proteofav_spark.operators.analytics_queries import (
        q_promo_revenue_share,
    )

    rows = q_promo_revenue_share(spark, SF).collect()
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert sum(r["n_lineitems"] for r in rows) == l.count()
    for r in rows:
        assert 0.0 <= r["promo_share"] <= 1.0
        assert r["promo_revenue"] >= 0.0


def test_disjunctive_revenue_matches_union_of_branches(spark):
    """The OR-predicate count equals the UNION of the three branch
    selections computed independently (inclusion-exclusion-free check:
    distinct row ids)."""
    from proteofav_spark.operators.analytics_queries import (
        q_disjunctive_predicate_revenue,
    )

    row = q_disjunctive_predicate_revenue(spark, SF).collect()[0]
    # The synthetic lineitem is NOT unique on (l_orderkey, l_linenumber),
    # so tag every row with a genuinely unique id BEFORE branching and
    # union-distinct on that — counts join rows, not business keys.
    l = spark.read.parquet(f"{SF}/lineitem.parquet").withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    p = spark.read.parquet(f"{SF}/part.parquet")
    j = l.join(p, l.l_partkey == p.p_partkey).cache()
    b1 = j.where(
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size") <= 10)
        & (F.col("l_quantity") <= 25)
    )
    b2 = j.where(
        (F.col("p_brand") == "Brand#17")
        & (F.col("p_size") <= 20)
        & (F.col("l_quantity") <= 35)
    )
    b3 = j.where((F.col("p_type") == "SMALL") & (F.col("l_quantity") >= 10))
    union = (
        b1.select("_rid").union(b2.select("_rid")).union(b3.select("_rid")).distinct()
    )
    try:
        assert row["n_lineitems"] == union.count()
    finally:
        j.unpersist()
