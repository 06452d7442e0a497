"""Semantic invariants for the round-4 additions: the Q4 EXISTS semi,
the Q13 zero-inclusive order distribution, the Q22 threshold + anti
join, the Q16 distinct-supplier breadth, and the training-sample token
chunker. The DuckDB oracles check value parity against an independent
engine; these tests pin the data-independent semantics."""

import math

import pytest
from pyspark.sql import functions as F

from proteofav_spark.operators.analytics_queries import (
    q_customer_order_distribution,
    q_customers_above_avg_no_orders,
    q_orders_exists_semi,
    q_parts_supplier_breadth,
)
from proteofav_spark.operators.llm_queries import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    q_docs_token_chunking,
    tokens_col,
)

SF = "/root/testdata/sf0.001"


def test_exists_semi_never_exceeds_order_counts(spark):
    """Semi-join semantics: per-priority counts are bounded by the raw
    order counts, and the total equals the number of DISTINCT qualifying
    orders (no duplication from multi-lineitem matches)."""
    rows = {r["o_orderpriority"]: r["n_orders"]
            for r in q_orders_exists_semi(spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    raw = {r["o_orderpriority"]: r["n"]
           for r in o.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
    assert all(rows[k] <= raw[k] for k in rows)
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    direct = (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate))
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert sum(rows.values()) == direct


def test_order_distribution_includes_zero_and_resums(spark):
    """The distribution partitions the customer set (sum of n_customers
    = |customer|) and the weighted sum re-derives |matched orders|."""
    rows = q_customer_order_distribution(spark, SF).collect()
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    assert sum(r["n_customers"] for r in rows) == c.count()
    matched = o.join(
        c, o.o_custkey == c.c_custkey, "left_semi"
    ).count()
    assert sum(r["n_orders"] * r["n_customers"] for r in rows) == matched


def test_above_avg_no_orders_members_verify(spark):
    """Every counted customer individually satisfies BOTH predicates:
    balance above the positive-balance average, and no order on/after
    the cutoff."""
    rows = q_customers_above_avg_no_orders(spark, SF).collect()
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    # the query compares in exact cents (cents*n > sum_cents == c > avg);
    # recompute the same way so boundary rows can't flip on float avg
    pos = [round(r["c_acctbal"] * 100) for r in
           c.where(F.col("c_acctbal") > 0).collect()]
    sum_cents, n = sum(pos), len(pos)
    recent = o.where(F.col("o_orderdate") >= F.lit("1998-06-01").cast("timestamp"))
    members = [
        m
        for m in c.join(recent, c.c_custkey == recent.o_custkey, "left_anti").collect()
        if round(m["c_acctbal"] * 100) * n > sum_cents
    ]
    by_seg = {}
    for m in members:
        by_seg.setdefault(m["c_mktsegment"], []).append(m["c_acctbal"])
    assert {r["c_mktsegment"] for r in rows} == set(by_seg)
    for r in rows:
        assert r["n_customers"] == len(by_seg[r["c_mktsegment"]])
        assert math.isclose(
            r["total_bal"], sum(round(b * 100) for b in by_seg[r["c_mktsegment"]]) / 100
        )


def test_supplier_breadth_bounds(spark):
    """Distinct-count invariants: 1 <= n_suppliers <= min(n_lineitems,
    |supplier|), and the excluded brand never appears."""
    rows = q_parts_supplier_breadth(spark, SF).collect()
    n_supp = spark.read.parquet(f"{SF}/supplier.parquet").count()
    assert rows
    for r in rows:
        assert r["p_brand"] != "Brand#1"
        assert 1 <= r["n_suppliers"] <= min(r["n_lineitems"], n_supp)


def test_token_chunking_reconstructs_documents(spark):
    """Chunk coverage: stride-aligned chunk starts cover every token
    exactly (concatenating each chunk's NON-OVERLAPPED prefix of
    ``stride`` tokens rebuilds the document's token stream), every doc
    emits ceil(max(n,1)/stride) chunks, and no chunk exceeds the window."""
    d = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    toks = {
        r["doc_id"]: r["toks"]
        for r in d.select("doc_id", tokens_col("text").alias("toks")).collect()
    }
    chunks = {}
    for r in q_docs_token_chunking(spark, SF).collect():
        if r["doc_id"] in toks:
            chunks.setdefault(r["doc_id"], {})[r["chunk_no"]] = r
    for doc_id, tk in toks.items():
        got = chunks[doc_id]
        n = len(tk)
        expect_chunks = max(1, math.ceil(max(n, 1) / CHUNK_STRIDE)) if n else 1
        # starts are 0, stride, ... <= n-1 (one empty chunk for empty docs)
        n_starts = len(range(0, max(n - 1, 0) + 1, CHUNK_STRIDE)) if n else 1
        assert len(got) == n_starts, (doc_id, n)
        rebuilt = []
        for i in sorted(got):
            r = got[i]
            assert r["n_tokens"] <= CHUNK_SIZE
            words = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert len(words) == r["n_tokens"]
            assert words == tk[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_SIZE]
            rebuilt.extend(words[:CHUNK_STRIDE])
        assert rebuilt == tk


def test_grouping_sets_margins_consistent(spark):
    """Margin arithmetic: each single-column margin re-sums the detail
    rows, and the gid separates the three grouping sets."""
    from proteofav_spark.operators.analytics_queries import q_agg_grouping_sets

    rows = q_agg_grouping_sets(spark, SF).collect()
    detail = [r for r in rows if r["gid"] == 0]
    by_flag = {r["l_returnflag"]: r for r in rows if r["gid"] == 1}
    by_status = {r["l_linestatus"]: r for r in rows if r["gid"] == 2}
    assert detail and by_flag and by_status
    for f, m in by_flag.items():
        assert m["l_linestatus"] is None
        assert m["n_items"] == sum(
            d["n_items"] for d in detail if d["l_returnflag"] == f
        )
        assert m["sum_qty"] == pytest.approx(
            sum(d["sum_qty"] for d in detail if d["l_returnflag"] == f)
        )
    for s, m in by_status.items():
        assert m["l_returnflag"] is None
        assert m["n_items"] == sum(
            d["n_items"] for d in detail if d["l_linestatus"] == s
        )
    # no grand-total row (that's CUBE's job)
    assert not [r for r in rows if r["gid"] == 3]


def test_tfidf_ranks_rare_terms_over_stopwords(spark):
    """Weighting sanity on a constructed corpus: a term unique to one
    doc must outrank a corpus-wide stopword with equal tf; ranks are
    1..k, scores non-increasing per doc, and score_micro == tf*1e6//df."""
    import os
    import tempfile

    from proteofav_spark.operators.llm_queries import (
        TFIDF_TOP_K,
        q_text_tfidf_top_terms,
    )

    docs = [
        (0, "common common rareword rareword", "en", "s", 30),
        (1, "common common othertok othertok", "en", "s", 30),
        (2, "common common common filler", "en", "s", 28),
    ]
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    rows = q_text_tfidf_top_terms(spark, tmp).collect()
    by_doc = {}
    for r in rows:
        assert r["score_micro"] == r["tf"] * 1_000_000 // r["df"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        assert len(doc_rows) <= TFIDF_TOP_K
        scores = [r["score_micro"] for r in doc_rows]
        assert scores == sorted(scores, reverse=True)
    # doc 0: rareword (tf=2, df=1) must beat common (tf=2, df=3)
    top0 = by_doc[0][0]
    assert top0["term"] == "rareword" and top0["df"] == 1


def test_ntile_buckets_equidepth_and_ordered(spark):
    """ntile semantics: per priority the four buckets partition the
    orders with sizes differing by at most 1 (larger buckets first),
    and cent-bounds are non-overlapping in quartile order."""
    from proteofav_spark.operators.analytics_queries import q_window_ntile_buckets

    rows = q_window_ntile_buckets(spark, SF).collect()
    by_prio = {}
    for r in rows:
        by_prio.setdefault(r["o_orderpriority"], []).append(r)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    totals = {r["o_orderpriority"]: r["n"] for r in
              o.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
    for prio, bucket_rows in by_prio.items():
        bucket_rows.sort(key=lambda r: r["quartile"])
        assert [r["quartile"] for r in bucket_rows] == [1, 2, 3, 4]
        sizes = [r["n_orders"] for r in bucket_rows]
        assert sum(sizes) == totals[prio]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)  # big buckets first
        for a, b in zip(bucket_rows, bucket_rows[1:]):
            assert a["hi_cents"] <= b["lo_cents"]
        for r in bucket_rows:
            assert r["lo_cents"] <= r["hi_cents"]


def test_unpivot_long_matches_wide(spark):
    """The long frame carries exactly |flags| x 3 rows and each
    (flag, metric) value equals the wide aggregate recomputed directly."""
    from proteofav_spark.operators.analytics_queries import q_metrics_unpivot_long

    rows = q_metrics_unpivot_long(spark, SF).collect()
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    flags = [r["l_returnflag"] for r in l.select("l_returnflag").distinct().collect()]
    assert len(rows) == len(flags) * 3
    got = {(r["l_returnflag"], r["metric"]): r["metric_value"] for r in rows}
    for flag in flags:
        sub = l.where(F.col("l_returnflag") == flag)
        for metric, col in (("qty", "l_quantity"), ("price", "l_extendedprice"),
                            ("discount", "l_discount")):
            cents = sub.agg(
                F.sum(F.round(F.col(col) * 100).cast("long")).alias("c")
            ).collect()[0]["c"]
            assert got[(flag, metric)] == cents / 100.0


def test_value_share_having_members_and_share(spark):
    """Every kept nation's integer-share condition re-verifies against
    independently recomputed totals, and no dropped nation qualifies."""
    from proteofav_spark.operators.analytics_queries import (
        SHARE_THRESHOLD_BP,
        q_supplier_value_share_having,
    )

    rows = {r["nationkey"]: r for r in
            q_supplier_value_share_having(spark, SF).collect()}
    s = spark.read.parquet(f"{SF}/supplier.parquet").collect()
    cents = {}
    counts = {}
    for r in s:
        cents[r["s_nationkey"]] = cents.get(r["s_nationkey"], 0) + round(r["s_acctbal"] * 100)
        counts[r["s_nationkey"]] = counts.get(r["s_nationkey"], 0) + 1
    total = sum(cents.values())
    qualifying = {k for k, v in cents.items() if v * 10000 > total * SHARE_THRESHOLD_BP}
    assert set(rows) == qualifying
    for k, r in rows.items():
        assert r["n_suppliers"] == counts[k]
        assert r["total_bal"] == cents[k] / 100.0


def test_big_customer_detail_rejoin_complete(spark):
    """Every row's cust_total re-sums that customer's orders, the
    threshold holds, and ALL orders of a qualifying customer appear."""
    from proteofav_spark.operators.analytics_queries import (
        BIG_CUSTOMER_CENTS,
        q_orders_big_customer_detail,
    )

    rows = q_orders_big_customer_detail(spark, SF).collect()
    assert rows
    o = spark.read.parquet(f"{SF}/orders.parquet").collect()
    per_cust_cents = {}
    per_cust_orders = {}
    for r in o:
        per_cust_cents[r["o_custkey"]] = (
            per_cust_cents.get(r["o_custkey"], 0) + round(r["o_totalprice"] * 100)
        )
        per_cust_orders.setdefault(r["o_custkey"], set()).add(r["o_orderkey"])
    whales = {k for k, v in per_cust_cents.items() if v > BIG_CUSTOMER_CENTS}
    got_orders = {}
    for r in rows:
        assert r["o_custkey"] in whales
        assert r["cust_total"] == per_cust_cents[r["o_custkey"]] / 100.0
        got_orders.setdefault(r["o_custkey"], set()).add(r["o_orderkey"])
    assert got_orders == {k: per_cust_orders[k] for k in whales}


def test_below_avg_qty_members_exact(spark):
    """Q17 shape: the count equals a driver-side recomputation of the
    integer predicate qty_cents*5*n < sum_qty_cents per part."""
    from proteofav_spark.operators.analytics_queries import q_lineitem_below_avg_qty

    row = q_lineitem_below_avg_qty(spark, SF).collect()[0]
    l = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    agg = {}
    for r in l:
        qc = round(r["l_quantity"] * 100)
        s, n = agg.get(r["l_partkey"], (0, 0))
        agg[r["l_partkey"]] = (s + qc, n + 1)
    expect_n, expect_cents = 0, 0
    for r in l:
        qc = round(r["l_quantity"] * 100)
        s, n = agg[r["l_partkey"]]
        if qc * 5 * n < s:
            expect_n += 1
            expect_cents += round(r["l_extendedprice"] * 100)
    assert row["n_lineitems"] == expect_n
    assert row["total_price"] == expect_cents / 100.0


def test_percent_rank_exact_matches_python(spark):
    """The integer micro-unit emissions reproduce percent_rank/cume_dist
    (floored) computed from scratch with the same total order."""
    from proteofav_spark.operators.analytics_queries import (
        q_window_percent_rank_exact,
    )

    rows = q_window_percent_rank_exact(spark, SF).collect()
    s = spark.read.parquet(f"{SF}/supplier.parquet").collect()
    by_nation = {}
    for r in s:
        by_nation.setdefault(r["s_nationkey"], []).append(r)
    expect = {}
    for nk, members in by_nation.items():
        members.sort(key=lambda r: (r["s_acctbal"], r["s_suppkey"]))
        n = len(members)
        # rank with ties on (acctbal): same acctbal+suppkey is unique so
        # rank == position+1 except true acctbal ties share min position
        for i, m in enumerate(members):
            rk = 1 + sum(
                1 for x in members
                if (x["s_acctbal"], x["s_suppkey"]) < (m["s_acctbal"], m["s_suppkey"])
            )
            pct = 0 if n == 1 else (rk - 1) * 1_000_000 // (n - 1)
            expect[(nk, m["s_suppkey"])] = (pct, rk * 1_000_000 // n)
    for r in rows:
        assert (r["pct_rank_micro"], r["cume_micro_floor"]) == expect[
            (r["s_nationkey"], r["s_suppkey"])
        ]


def test_multiset_ops_multiplicity_arithmetic(spark):
    """intersect_all rows = sum over keys of min(count_a, count_b);
    except_all rows = sum of max(0, count_a - count_b)."""
    from collections import Counter

    from proteofav_spark.operators.analytics_queries import q_set_multiset_ops

    rows = {r["op"]: r for r in q_set_multiset_ops(spark, SF).collect()}
    l = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    ca = Counter(r["l_partkey"] for r in l if r["l_returnflag"] == "R")
    cb = Counter(r["l_partkey"] for r in l if r["l_linestatus"] == "F")
    inter = {k: min(ca[k], cb[k]) for k in ca if k in cb and min(ca[k], cb[k]) > 0}
    exc = {k: ca[k] - cb.get(k, 0) for k in ca if ca[k] - cb.get(k, 0) > 0}
    assert rows["intersect_all"]["n_rows"] == sum(inter.values())
    assert rows["intersect_all"]["n_keys"] == len(inter)
    assert rows["except_all"]["n_rows"] == sum(exc.values())
    assert rows["except_all"]["n_keys"] == len(exc)
