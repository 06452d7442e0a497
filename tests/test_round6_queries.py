"""Semantic + plan invariants for the round-6 additions: the blocked
fuzzy-match candidate generator (lossless q-gram prefix filtering) and
the TPC-H Q2/Q9 shapes on the derived partsupp dimension. The DuckDB
oracles check value parity against an independent engine; these tests
pin the data-independent semantics and the plan shapes the 100 TB
claims rest on."""

from pyspark.sql import functions as F

from proteofav_spark.operators.analytics_queries import (
    FUZZY_BLOCK_MAX_DIST,
    q_fuzzy_name_match_blocked,
    q_tpch_q2_min_cost_supplier,
    q_tpch_q9_profit_rollup,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# fuzzy_name_match_blocked
# ---------------------------------------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, d[0] = d[0], i
        for j in range(1, len(b) + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[len(b)]


def test_fuzzy_blocked_is_lossless_vs_all_pairs(spark):
    """The blocking claim: the q-gram prefix filter drops NO true pair.
    Recompute the full unblocked theta join driver-side (sf0.001 is
    150 names) and compare the exact pair sets."""
    names = {
        r["c_custkey"]: r["c_name"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    keys = sorted(names)
    want = {
        (a, b, _levenshtein(names[a], names[b]))
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
        if _levenshtein(names[a], names[b]) <= FUZZY_BLOCK_MAX_DIST
    }
    got = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in q_fuzzy_name_match_blocked(spark, SF).collect()
    }
    assert got == want
    assert want  # non-vacuous: the corpus has true near-duplicate names


def test_fuzzy_blocked_plan_has_no_theta_join(spark):
    """The scale claim: candidates come from a keyed equi-join on
    (gram, occ) — never a BroadcastNestedLoopJoin / CartesianProduct
    theta self-join, at any block size."""
    plan = _plan(q_fuzzy_name_match_blocked(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# tpch_q2_min_cost_supplier
# ---------------------------------------------------------------------------


def test_q2_returns_exactly_the_min_cost_ties(spark):
    """Q2 semantics re-derived literally: for every STANDARD size<=15
    part, the returned suppliers are EXACTLY those European suppliers
    whose derived cost equals the per-part European minimum (all ties
    kept — integer cost equality)."""
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    ps = {
        (r["l_partkey"], r["l_suppkey"])
        for r in l.select("l_partkey", "l_suppkey").distinct().collect()
    }
    cost = {(p, s): 100 + (p * 37 + s * 101) % 90000 for p, s in ps}
    nation = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    europe = {
        r["r_regionkey"]
        for r in spark.read.parquet(f"{SF}/region.parquet").collect()
        if r["r_name"] == "EUROPE"
    }
    supp = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    eu_supp = {
        k for k, nk in supp.items() if nation[nk][1] in europe
    }
    parts = {
        r["p_partkey"]
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
        if r["p_size"] <= 15 and r["p_type"] == "STANDARD"
    }
    by_part: dict[int, list[tuple[int, int]]] = {}
    for (p, s), c in cost.items():
        if p in parts and s in eu_supp:
            by_part.setdefault(p, []).append((c, s))
    want = {
        (p, s)
        for p, cs in by_part.items()
        for c, s in cs
        if c == min(x for x, _ in cs)
    }
    supp_name = {
        r["s_suppkey"]: r["s_name"]
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    got_rows = q_tpch_q2_min_cost_supplier(spark, SF).collect()
    got = {
        (r["p_partkey"], next(k for k, v in supp_name.items() if v == r["s_name"]))
        for r in got_rows
    }
    assert got == want
    # the cost column really is the minimum, in dollars
    for r in got_rows:
        p = r["p_partkey"]
        assert r["supplycost"] == min(c for c, _ in by_part[p]) / 100


def test_q2_plan_two_fact_exchanges_dims_broadcast(spark):
    """The decorrelation claim: one (partkey, suppkey) distinct + one
    partkey window — two fact-sized hash exchanges, every dimension
    broadcast, no correlated re-scan of partsupp."""
    plan = _plan(q_tpch_q2_min_cost_supplier(spark, SF))
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# tpch_q9_profit_rollup
# ---------------------------------------------------------------------------


def test_q9_profit_matches_literal_recompute(spark):
    """Q9 semantics re-derived literally (partsupp join INCLUDED) at
    sf0.001: per (nation, year) exact integer-unit profit sums."""
    l = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    blue = {
        r["p_partkey"]
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
        if r["p_name"].startswith("blue")
    }
    o_year = {
        r["o_orderkey"]: r["o_orderdate"].year
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
    }
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    s_nation = {
        r["s_suppkey"]: nation[r["s_nationkey"]]
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    want: dict[tuple[str, int], int] = {}
    for r in l:
        if r["l_partkey"] not in blue:
            continue
        cost_c = 100 + (r["l_partkey"] * 37 + r["l_suppkey"] * 101) % 90000
        amount = round(r["l_extendedprice"] * 100) * (
            100 - round(r["l_discount"] * 100)
        ) - cost_c * round(r["l_quantity"]) * 100
        key = (s_nation[r["l_suppkey"]], o_year[r["l_orderkey"]])
        want[key] = want.get(key, 0) + amount
    got = {
        (r["nation"], r["o_year"]): r["sum_profit"]
        for r in q_tpch_q9_profit_rollup(spark, SF).collect()
    }
    # integer units -> dollars with exact decimal HALF_UP (Spark's round;
    # Python's float round would banker's-round the .475 boundary down)
    from decimal import ROUND_HALF_UP, Decimal

    want_d = {
        k: float((Decimal(v) / 10000).quantize(Decimal("0.01"), ROUND_HALF_UP))
        for k, v in want.items()
    }
    assert got == want_d
    assert got  # non-vacuous


def test_q9_plan_single_fact_shuffle(spark):
    """The scale claim: the derived supplycost is computed inline (the
    partsupp join collapses — cost is key-functional), part prunes via
    broadcast semi, supplier/nation broadcast; the ONLY fact-sized
    exchange pair is lineitem<->orders, plus the tiny rollup."""
    plan = _plan(q_tpch_q9_profit_rollup(spark, SF))
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_blocked_handles_short_names(spark, tmp_path):
    """Names shorter than q(D+1) chars fall outside the prefix-filter
    theorem (and 1-char names have no grams at all): the short-band
    block must keep the operator lossless on them, and the plan must
    stay free of theta joins."""
    import os

    from proteofav_spark.operators.analytics_queries import (
        q_fuzzy_name_match_blocked,
    )

    names = ["a", "b", "ab", "ac", "abc", "abd", "abcd", "abce",
             "abcde", "zzzzz", "Customer#000000001"]
    rows = [(i, n) for i, n in enumerate(names)]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "c_custkey long, c_name string").write.mode(
        "overwrite"
    ).parquet(os.path.join(sf, "customer.parquet"))

    want = {
        (a, b, _levenshtein(names[a], names[b]))
        for a in range(len(names))
        for b in range(a + 1, len(names))
        if _levenshtein(names[a], names[b]) <= FUZZY_BLOCK_MAX_DIST
    }
    out = q_fuzzy_name_match_blocked(spark, sf)
    got = {(r["key_a"], r["key_b"], r["dist"]) for r in out.collect()}
    assert got == want
    # the short cases really occur: 1-char pair, 2-char pair, 2-vs-3
    assert (0, 1, 1) in want and (2, 3, 1) in want and (2, 4, 1) in want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# tree_rollup_recursive
# ---------------------------------------------------------------------------


def test_tree_rollup_matches_literal_recursion(spark):
    """Recursive-CTE semantics re-derived literally driver-side: every
    ancestor's subtree customer count and exact-cents revenue."""
    from proteofav_spark.operators.graph_queries import (
        q_tree_rollup_recursive,
    )

    cust = [
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    ]
    rev: dict[int, int] = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        rev[r["o_custkey"]] = rev.get(r["o_custkey"], 0) + round(
            r["o_totalprice"] * 100
        )
    want: dict[int, tuple[int, int]] = {}
    for c in cust:
        if c not in rev:
            continue
        node = c
        ancs = [node]
        while node > 0:
            node //= 10
            ancs.append(node)
        for a in ancs:
            n, s = want.get(a, (0, 0))
            want[a] = (n + 1, s + rev[c])
    got = {
        r["ancestor"]: (r["n_customers"], r["subtree_revenue"])
        for r in q_tree_rollup_recursive(spark, SF).collect()
    }
    assert got == {
        a: (n, round(s / 100, 2)) for a, (n, s) in want.items()
    }
    assert 0 in got  # the root aggregates every customer with orders


def test_tree_rollup_plan_is_map_only_closure(spark):
    """The scale claim: the ancestor closure is a fixed-depth union of
    projections — no joins, no shuffles until the revenue join; the
    whole plan carries a bounded number of keyed exchanges and no
    cartesian/nested-loop operators."""
    from proteofav_spark.operators.graph_queries import (
        q_tree_rollup_recursive,
    )

    plan = _plan(q_tree_rollup_recursive(spark, SF))
    assert plan.count("Exchange hashpartitioning") <= 4, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
