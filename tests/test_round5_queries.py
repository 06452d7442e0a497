"""Semantic invariants for the round-5 additions: the Q21 chained
EXISTS + NOT EXISTS decorrelation and the Q20 correlated-share
threshold. The DuckDB oracles check value parity against an independent
engine; these tests pin the data-independent semantics and the plan
shape the 100 TB claims rest on."""

from pyspark.sql import functions as F

from proteofav_spark.operators.analytics_queries import (
    q_forecast_revenue_change,
    q_nation_market_share,
    q_returned_item_top_customers,
    q_shipclass_priority_counts,
    q_supplier_top_revenue,
    q_suppliers_dominant_share,
    q_suppliers_kept_waiting,
)

SF = "/root/testdata/sf0.001"


def test_kept_waiting_matches_literal_double_correlation(spark):
    """Re-derive the result with the LITERAL per-row EXISTS/NOT-EXISTS
    semantics driver-side (small SF) and compare: every (supplier,
    numwait) must match the decorrelated window formulation."""
    o = spark.read.parquet(f"{SF}/orders.parquet").where(
        F.col("o_orderstatus") == "F"
    )
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 1500 DAYS")
            ).alias("late"),
        )
        .collect()
    )
    from collections import defaultdict

    supps, late_supps, late_rows = defaultdict(set), defaultdict(set), []
    for r in rows:
        supps[r["l_orderkey"]].add(r["l_suppkey"])
        if r["late"]:
            late_supps[r["l_orderkey"]].add(r["l_suppkey"])
            late_rows.append((r["l_orderkey"], r["l_suppkey"]))
    expected = defaultdict(int)
    for ok, sk in late_rows:
        others = supps[ok] - {sk}
        other_late = late_supps[ok] - {sk}
        if others and not other_late:  # EXISTS other AND NOT EXISTS other-late
            expected[sk] += 1
    names = {
        r["s_suppkey"]: r["s_name"]
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    want = {}
    for sk, n in expected.items():
        want[names[sk]] = want.get(names[sk], 0) + n
    got = {
        r["s_name"]: r["numwait"]
        for r in q_suppliers_kept_waiting(spark, SF).collect()
    }
    assert got == want


def test_kept_waiting_plan_two_fact_exchanges_max(spark):
    """The decorrelation claim: both correlated probes fold into the one
    aggregation, so the plan carries at most 2 shuffle exchanges keyed
    on fact-sized data (plus the tiny s_name rollup)."""
    df = q_suppliers_kept_waiting(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 3, plan  # ≤2 fact + 1 collapsed s_name rollup
    assert "CartesianProduct" not in plan


def test_dominant_share_threshold_is_exact_share(spark):
    """Every returned supplier really moved >15% of some red part's
    shipped quantity, and at least one non-returned supplier exists
    (the threshold is selective, not vacuous)."""
    got = {r["s_name"] for r in q_suppliers_dominant_share(spark, SF).collect()}
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = spark.read.parquet(f"{SF}/part.parquet").where(
        F.col("p_name").like("red%")
    )
    sp = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"))
        .collect()
    )
    from collections import defaultdict

    tot = defaultdict(int)
    for r in sp:
        tot[r["l_partkey"]] += r["q"]
    dominant_keys = {
        r["l_suppkey"] for r in sp if 20 * r["q"] > 3 * tot[r["l_partkey"]]
    }
    names = {
        r["s_suppkey"]: r["s_name"]
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    assert got == {names[k] for k in dominant_keys}
    assert got  # non-vacuous here; selectivity is pinned at sf0.01 by the
    # oracle sweep (11 of 100 suppliers qualify)


def test_top_revenue_includes_all_ties_at_exact_max(spark):
    """Q15 semantics: every returned supplier's revenue equals the true
    integer-cents maximum (recomputed independently), and ALL suppliers
    at that maximum are returned — the float-equality tie-drop trap."""
    got = q_supplier_top_revenue(spark, SF).collect()
    l = spark.read.parquet(f"{SF}/lineitem.parquet").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    rev = {
        r["l_suppkey"]: r["c"]
        for r in l.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("c")
        )
        .collect()
    }
    mx = max(rev.values())
    winners = {k for k, v in rev.items() if v == mx}
    assert {r["s_suppkey"] for r in got} == winners
    assert all(r["total_revenue"] == mx / 10000 for r in got)


def test_shipclass_counts_partition_the_late_rows(spark):
    """Q12 semantics: high + low per class equals the late-row total per
    class, and summing classes re-derives the overall late-join count —
    one pass, no double counting."""
    got = {
        r["ship_class"]: (r["high_line_count"], r["low_line_count"])
        for r in q_shipclass_priority_counts(spark, SF).collect()
    }
    o = spark.read.parquet(f"{SF}/orders.parquet")
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    late = l.join(o, l.l_orderkey == o.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
    )
    per_class = {
        r["l_returnflag"]: r["n"]
        for r in late.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    assert {k: h + lo for k, (h, lo) in got.items()} == per_class


def test_forecast_revenue_pushes_all_predicates_to_scan(spark):
    """Q6's value is pushdown: the physical plan's parquet scan must
    carry the date range, the discount band and the quantity cap as
    PushedFilters, and read only the four referenced columns."""
    df = q_forecast_revenue_change(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # Spark truncates long filter lists in toString (trailing "...," with
    # no closing bracket) — grab to end-of-line instead
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\r\n]*)", plan))
    for frag in ("IsNotNull(l_shipdate)", "l_discount", "l_quantity"):
        assert frag in pushed, (frag, pushed)
    schema = re.search(r"ReadSchema: struct<([^>]*)", plan).group(1)
    cols = {c.split(":")[0] for c in schema.split(",")}
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_market_share_is_bounded_and_recomposes(spark):
    """Every ppm share sits in [0, 1e6], and recomputing numerator and
    denominator independently re-derives each year's share exactly."""
    got = {r["o_year"]: r["mkt_share_ppm"]
           for r in q_nation_market_share(spark, SF).collect()}
    assert got and all(0 <= v <= 1_000_000 for v in got.values())
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    r = spark.read.parquet(f"{SF}/region.parquet").where(
        F.col("r_name") == "EUROPE"
    )
    nk = {x["n_nationkey"] for x in n.join(
        r, n.n_regionkey == r.r_regionkey).select("n_nationkey").collect()}
    nation_name = {x["n_nationkey"]: x["n_name"] for x in n.collect()}
    supp_nation = {x["s_suppkey"]: nation_name[x["s_nationkey"]]
                   for x in s.collect()}
    cust_in = {x["c_custkey"] for x in c.collect() if x["c_nationkey"] in nk}
    rows = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey", "l_extendedprice", "l_discount",
                F.year("o_orderdate").alias("y"))
        .collect()
    )
    from collections import defaultdict

    num, den = defaultdict(int), defaultdict(int)
    for x in rows:
        if x["o_custkey"] not in cust_in:
            continue
        v = round(x["l_extendedprice"] * 100) * (100 - round(x["l_discount"] * 100))
        den[x["y"]] += v
        if supp_nation[x["l_suppkey"]] == "NATION_3":
            num[x["y"]] += v
    want = {y: (2 * num[y] * 1_000_000 + den[y]) // (2 * den[y]) for y in den}
    assert got == want


def test_top_returned_customers_matches_full_ranking(spark):
    """The TakeOrdered top-20 equals the first 20 rows of the full
    deterministic ranking (revenue desc, custkey asc) — no heap/merge
    boundary artifacts, ties broken identically."""
    got = [(r["c_custkey"], r["revenue_c"])
           for r in q_returned_item_top_customers(spark, SF).collect()]
    assert len(got) == 20
    full = sorted(got, key=lambda t: (-t[1], t[0]))
    assert got == full  # output arrives already ranked
    l = spark.read.parquet(f"{SF}/lineitem.parquet").where(
        F.col("l_returnflag") == "R")
    o = spark.read.parquet(f"{SF}/orders.parquet").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01"))
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long"))
    per = {r["o_custkey"]: r["c"] for r in l.join(
        o, l.l_orderkey == o.o_orderkey
    ).groupBy("o_custkey").agg(F.sum(rev).alias("c")).collect()}
    want = sorted(per.items(), key=lambda t: (-t[1], t[0]))[:20]
    assert got == want


def test_semantic_dedup_census_matches_numpy(spark):
    """SemDeDup semantics re-derived with numpy: per cluster, a vector
    drops iff some lower-id cluster-mate has rounded cosine >= tau;
    census totals partition each cluster (kept + dropped = total), and
    the positive path is non-vacuous at this SF."""
    import numpy as np

    from proteofav_spark.operators.llm_queries import (
        SEMDEDUP_TAU,
        q_dedup_semantic_clusters,
    )

    got = {r["label"]: (r["n_total"], r["n_dropped"], r["n_kept"])
           for r in q_dedup_semantic_clusters(spark, SF).collect()}
    e = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    from collections import defaultdict

    by_label = defaultdict(list)
    for r in e:
        by_label[r["label"]].append(
            (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        )
    want = {}
    for lbl, vecs in by_label.items():
        vecs.sort()
        dropped = 0
        for i, (vid, v) in enumerate(vecs):
            for vid2, v2 in vecs[:i]:
                c = round(float(v @ v2) / (np.linalg.norm(v) * np.linalg.norm(v2)), 6)
                if c >= SEMDEDUP_TAU:
                    dropped += 1
                    break
        want[lbl] = (len(vecs), dropped, len(vecs) - dropped)
    assert got == want
    assert sum(d for _, d, _ in got.values()) > 0  # non-vacuous
    assert all(t == d + k for t, d, k in got.values())


def test_exact_medians_match_numpy_interpolation(spark):
    """Continuous-quantile semantics re-derived with numpy's 'linear'
    interpolation (the same definition both engines implement)."""
    import numpy as np

    from proteofav_spark.operators.analytics_queries import (
        q_agg_exact_median_groups,
    )

    got = {r["l_returnflag"]: (r["q25"], r["median"], r["q75"])
           for r in q_agg_exact_median_groups(spark, SF).collect()}
    rows = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_quantity"
    ).collect()
    from collections import defaultdict

    by = defaultdict(list)
    for r in rows:
        by[r["l_returnflag"]].append(r["l_quantity"])
    for k, vals in by.items():
        want = tuple(
            round(float(np.quantile(np.array(vals), q, method="linear")), 6)
            for q in (0.25, 0.5, 0.75)
        )
        assert got[k] == want, k


def test_fuzzy_pairs_match_python_levenshtein(spark):
    """Pair set re-derived with a reference Python edit-distance —
    engines and the catalog query must agree on every pair and dist."""
    from proteofav_spark.operators.analytics_queries import (
        FUZZY_MAX_DIST,
        FUZZY_SAMPLE_KEYS,
        q_fuzzy_name_match_pairs,
    )

    got = {(r["key_a"], r["key_b"]): r["dist"]
           for r in q_fuzzy_name_match_pairs(spark, SF).collect()}
    names = {r["c_custkey"]: r["c_name"]
             for r in spark.read.parquet(f"{SF}/customer.parquet").where(
                 F.col("c_custkey") < FUZZY_SAMPLE_KEYS).collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    keys = sorted(names)
    want = {}
    for i, ka in enumerate(keys):
        for kb in keys[i + 1:]:
            d = lev(names[ka], names[kb])
            if d <= FUZZY_MAX_DIST:
                want[(ka, kb)] = d
    assert got == want and got
