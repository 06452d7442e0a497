"""Semantic invariants for the analytics query batch
(operators/analytics_queries.py): ranked top-k per group, pivot /
conditional aggregation, star-join revenue, bounded sliding frames, and
moment aggregates. The DuckDB oracle pins value parity; these tests pin
the invariants that must hold on any data."""

import math

import pytest
from pyspark.sql import functions as F

from proteofav_spark.operators.analytics_queries import (
    q_agg_pivot_status,
    q_agg_stats_moments,
    q_join_star_revenue,
    q_topk_per_group,
    q_window_moving_avg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def topk(spark):
    return q_topk_per_group(spark, SF).collect()


def test_topk_at_most_three_per_nation(topk):
    from collections import Counter

    per_nation = Counter(r["n_name"] for r in topk)
    assert per_nation and all(v <= 3 for v in per_nation.values())


def test_topk_rank_is_dense_and_ordered(topk):
    by_nation = {}
    for r in sorted(topk, key=lambda r: (r["n_name"], r["rk"])):
        by_nation.setdefault(r["n_name"], []).append(r)
    for rows in by_nation.values():
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        bals = [r["acctbal"] for r in rows]
        assert bals == sorted(bals, reverse=True)


def test_pivot_totals_reconcile_with_orders(spark):
    res = q_agg_pivot_status(spark, SF)
    total_cnt = res.select(
        F.sum(F.col("f_cnt") + F.col("o_cnt") + F.col("p_cnt")).alias("n")
    ).first()["n"]
    assert total_cnt == spark.read.parquet(f"{SF}/orders.parquet").count()


def test_pivot_no_null_cells(spark):
    res = q_agg_pivot_status(spark, SF)
    for c in ("f_total", "o_total", "p_total", "f_cnt", "o_cnt", "p_cnt"):
        assert res.filter(F.col(c).isNull()).count() == 0


def test_star_revenue_nations_are_asia_only(spark):
    res = q_join_star_revenue(spark, SF)
    asia = {
        r["n_name"]
        for r in spark.sql(
            f"""SELECT n_name FROM parquet.`{SF}/nation.parquet` n
                JOIN parquet.`{SF}/region.parquet` r
                  ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'"""
        ).collect()
    }
    got = {r["n_name"] for r in res.collect()}
    assert got and got <= asia


def test_star_revenue_plan_broadcasts_dims(spark):
    plan = q_join_star_revenue(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_moving_avg_matches_python_reference(spark):
    res = q_window_moving_avg(spark, SF)
    rows = [
        r.asDict()
        for r in res.filter(F.col("user_id").isin(1, 2, 3))
        .orderBy("user_id", "event_id")
        .collect()
    ]
    src = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("user_id").isin(1, 2, 3))
        .orderBy("user_id", "event_id")
        .collect()
    )
    by_user = {}
    for r in src:
        by_user.setdefault(r["user_id"], []).append(r["value"])
    idx = {}
    for r in rows:
        u = r["user_id"]
        i = idx.get(u, 0)
        vals = by_user[u][max(0, i - 4) : i + 1]
        assert abs(r["mavg5"] - round(sum(vals) / len(vals), 6)) < 1e-6
        assert r["mmin5"] == round(min(vals), 6)
        nxt = by_user[u][i + 1] if i + 1 < len(by_user[u]) else None
        if nxt is None:
            assert r["next_value"] is None
        else:
            assert abs(r["next_value"] - round(nxt, 6)) < 1e-6
        idx[u] = i + 1


def test_stats_moments_corr_bounded_and_consistent(spark):
    for r in q_agg_stats_moments(spark, SF).collect():
        assert r["n"] > 0
        assert r["sd_value"] >= 0
        # var == sd² (rounding gives ~1e-6 slack)
        assert abs(r["var_value"] - r["sd_value"] ** 2) < 1e-4
        if r["corr_vu"] is not None:
            assert -1.0 <= r["corr_vu"] <= 1.0
            assert not math.isnan(r["corr_vu"])


def test_monthly_revenue_reconciles(spark):
    from proteofav_spark.operators.analytics_queries import q_agg_monthly_revenue

    res = q_agg_monthly_revenue(spark, SF)
    tot = res.agg(F.sum("n_orders").alias("n")).first()["n"]
    assert tot == spark.read.parquet(f"{SF}/orders.parquet").count()
    # quarter must be consistent with the month part of yyyymm
    bad = res.filter(
        ((F.col("yyyymm") % 100 - 1) / 3 + 1).cast("bigint") != F.col("qtr")
    ).count()
    assert bad == 0


def test_null_safe_join_keeps_null_group(spark):
    from proteofav_spark.operators.analytics_queries import q_join_null_safe

    rows = {r["k"]: r for r in q_join_null_safe(spark, SF).collect()}
    # nationkey % 5 == 0 exists in the data → a NULL-key group must appear
    assert None in rows
    null_g = rows[None]
    assert null_g["n_pairs"] == null_g["n_cust"] * null_g["n_supp"]


def test_array_hof_matches_python(spark):
    from proteofav_spark.operators.analytics_queries import q_array_hof_kit

    res = {r["vec_id"]: r for r in q_array_hof_kit(spark, SF).collect()}
    src = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < 10)
        .collect()
    )
    assert res
    for r in src:
        emb = [float(x) for x in r["embedding"]]
        got = res[r["vec_id"]]
        assert got["n_pos"] == sum(1 for x in emb if x > 0)
        assert abs(got["l1_norm"] - round(sum(abs(x) for x in emb), 6)) < 1e-5
        assert abs(got["max_abs"] - round(max(abs(x) for x in emb), 6)) < 1e-6
        front = sum(1 for x in emb[:32] if x > 0)
        back = sum(1 for x in emb[32:] if x > 0)
        assert got["front_heavy"] == (front > back)
