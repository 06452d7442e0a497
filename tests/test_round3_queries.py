"""Semantic invariants for the round-3 additions: corpus unigram-LM
quality scoring, cross-source near-dup overlap, time-series gap fill /
interpolation, and the SCD2 validity snapshot. The DuckDB oracles check
value parity against an independent engine; these tests pin the
data-independent semantics."""

import pytest
from pyspark.sql import functions as F

from proteofav_spark.operators.analytics_queries import q_orders_scd2_snapshot
from proteofav_spark.operators.curation import q_text_unigram_logprob
from proteofav_spark.operators.llm_queries import (
    minhash_lsh_pairs,
    q_dedup_crosssource_overlap,
)
from proteofav_spark.operators.pipeline_queries import (
    q_events_gapfill_interpolate,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# text_unigram_logprob
# ---------------------------------------------------------------------------

def test_unigram_logprob_bounds_and_coverage(spark):
    """Every document scores, n_tokens matches an independent tokenizer
    pass, and avg_nll is within the Laplace-smoothed LM's hard bounds:
    0 < nll(t) ≤ ln(N+V+1) for every token, hence also for the mean."""
    import math

    res = q_text_unigram_logprob(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    assert len(res) == n_docs
    toks = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n"),
    )
    expected = {r["doc_id"]: r["n"] for r in toks.collect()}
    corpus_n = sum(expected.values())
    # V ≤ distinct tokens ≤ N, so ln(N+V+1) ≤ ln(2N+1) bounds every nll
    hi = math.log(2 * corpus_n + 1)
    for r in res:
        assert r["n_tokens"] == expected[r["doc_id"]]
        assert 0.0 < r["avg_nll"] <= hi


def test_unigram_logprob_rarity_ordering(spark):
    """A document made of the corpus's rarest tokens must score a higher
    avg_nll than one made of its most common tokens — the property the
    quality filter exists for."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    freq = (
        docs.select(
            F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias(
                "tok"
            )
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("c", "tok")
        .collect()
    )
    rare, common = freq[0]["tok"], freq[-1]["tok"]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        probe = docs.sparkSession.createDataFrame(
            [(10_000_000, " ".join([rare] * 5), "xx", "probe", 1),
             (10_000_001, " ".join([common] * 5), "xx", "probe", 1)],
            schema=docs.schema,
        )
        docs.unionByName(probe).write.parquet(
            os.path.join(td, "documents.parquet")
        )
        out = {
            r["doc_id"]: r["avg_nll"]
            for r in q_text_unigram_logprob(docs.sparkSession, td).collect()
        }
    assert out[10_000_000] > out[10_000_001]


# ---------------------------------------------------------------------------
# dedup_crosssource_overlap
# ---------------------------------------------------------------------------

def test_crosssource_overlap_conserves_pairs(spark):
    """The matrix is unordered-canonical (src_a ≤ src_b) and its n_pairs
    total equals the candidate-pair count it was folded from."""
    res = q_dedup_crosssource_overlap(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_pairs = minhash_lsh_pairs(docs).count()
    assert sum(r["n_pairs"] for r in res) == n_pairs
    assert all(r["src_a"] <= r["src_b"] for r in res)
    assert all(r["n_pairs"] > 0 for r in res)


# ---------------------------------------------------------------------------
# events_gapfill_interpolate
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gapfill(spark):
    return q_events_gapfill_interpolate(spark, SF).collect()


def test_gapfill_dense_per_user_spans(gapfill):
    """Output hours per user form a contiguous range whose endpoints are
    observed (never extrapolated), with no duplicates."""
    by_user = {}
    for r in gapfill:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        hrs = sorted(r["hr"] for r in rows)
        assert hrs == list(range(hrs[0], hrs[-1] + 1))
        first = min(rows, key=lambda r: r["hr"])
        last = max(rows, key=lambda r: r["hr"])
        assert first["is_observed"] and last["is_observed"]


def test_gapfill_interpolation_between_neighbors(gapfill):
    """Every filled value lies within [min, max] of the two observations
    bracketing its gap, and values inside one gap progress monotonically
    (linear interpolation between two fixed endpoints)."""
    by_user = {}
    for r in gapfill:
        by_user.setdefault(r["user_id"], []).append(r)
    checked_gaps = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: r["hr"])
        i = 0
        while i < len(rows):
            if rows[i]["is_observed"]:
                i += 1
                continue
            j = i
            while not rows[j]["is_observed"]:
                j += 1
            lo_v = rows[i - 1]["value_filled"]
            hi_v = rows[j]["value_filled"]
            gap = [r["value_filled"] for r in rows[i:j]]
            lo, hi = min(lo_v, hi_v), max(lo_v, hi_v)
            # micro-unit HALF_UP discretization moves a value < 1e-6
            assert all(lo - 1e-6 <= v <= hi + 1e-6 for v in gap)
            ordered = gap if hi_v >= lo_v else gap[::-1]
            assert all(
                a <= b + 1e-6 for a, b in zip(ordered, ordered[1:])
            )
            checked_gaps += 1
            i = j
    assert checked_gaps > 0


# ---------------------------------------------------------------------------
# orders_scd2_snapshot
# ---------------------------------------------------------------------------

def test_scd2_intervals_partition_history(spark):
    """Per customer: intervals chain (effective_to == next
    effective_from), exactly one open (is_current) interval, adjacent
    runs change status, and n_orders adds up to the customer's orders."""
    res = q_orders_scd2_snapshot(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    per_cust = {
        r["o_custkey"]: r["n"]
        for r in orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_cust = {}
    for r in res:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    assert set(by_cust) == set(per_cust)
    for cust, rows in by_cust.items():
        rows.sort(key=lambda r: r["effective_from"])
        assert sum(r["n_orders"] for r in rows) == per_cust[cust]
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] and rows[-1]["effective_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["effective_to"] == b["effective_from"]
            assert a["o_orderstatus"] != b["o_orderstatus"]


# ---------------------------------------------------------------------------
# text_bm25_search
# ---------------------------------------------------------------------------

def test_bm25_matches_reference_scoring(spark):
    """The distributed BM25 equals a from-scratch single-machine
    implementation (pure Python) on the same corpus — term selection,
    IDF, TF saturation, length normalization and top-k tie-breaks."""
    import math
    from collections import Counter

    from proteofav_spark.operators.llm_queries import (
        BM25_B,
        BM25_K1,
        BM25_NTERMS,
        BM25_SKIP,
        BM25_TOPK,
        q_text_bm25_search,
    )

    res = [(r["doc_id"], r["bm25"]) for r in q_text_bm25_search(spark, SF).collect()]
    docs = {
        r["doc_id"]: r["text"].split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    n_docs = len(docs)
    avg_len = sum(len(t) for t in docs.values()) / n_docs
    df = Counter()
    for toks in docs.values():
        df.update(set(toks))
    ranked = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
    terms = dict(ranked[BM25_SKIP : BM25_SKIP + BM25_NTERMS])
    scores = {}
    for doc_id, toks in docs.items():
        tf = Counter(t for t in toks if t in terms)
        s = 0.0
        for tok, f in tf.items():
            idf = math.log((n_docs - terms[tok] + 0.5) / (terms[tok] + 0.5) + 1)
            s += idf * f * (BM25_K1 + 1) / (
                f + BM25_K1 * (1 - BM25_B + BM25_B * len(toks) / avg_len)
            )
        if s > 0:
            scores[doc_id] = s
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOPK]
    assert [d for d, _ in res] == [d for d, _ in expect]
    for (_, got), (_, want) in zip(res, expect):
        assert abs(got - want) < 1e-6


# ---------------------------------------------------------------------------
# events_anomaly_zscore
# ---------------------------------------------------------------------------

def test_zscore_trailing_range_frame(spark):
    """The z-score uses a RANGE (not ROWS) trailing frame: the baseline
    for hour h covers exactly hours [h-24, h-1] that the user was
    active, verified against a per-user dict reference; spikes only ever
    flag with a positive-variance baseline."""
    import statistics

    from proteofav_spark.operators.pipeline_queries import (
        ZSCORE_SPIKE,
        ZSCORE_TRAIL_H,
        q_events_anomaly_zscore,
    )

    rows = q_events_anomaly_zscore(spark, SF).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], {})[r["hr"]] = r
    for u, hrs in by_user.items():
        counts = {h: r["n_events"] for h, r in hrs.items()}
        for h, r in hrs.items():
            base = [
                counts[b]
                for b in range(h - ZSCORE_TRAIL_H, h)
                if b in counts
            ]
            assert r["n_baseline_hours"] == len(base)
            if len(base) >= 2 and statistics.stdev(base) > 0:
                z = (r["n_events"] - statistics.mean(base)) / statistics.stdev(base)
                assert abs(r["z"] - round(z, 4)) <= 1e-9
                assert r["is_spike"] == (abs(z) > ZSCORE_SPIKE)
            else:
                assert r["z"] is None
                assert r["is_spike"] is False


# ---------------------------------------------------------------------------
# dedup_substring_span
# ---------------------------------------------------------------------------

def test_substring_span_detects_known_span(spark, tmp_path):
    """A planted verbatim span is recovered with its exact token length;
    docs sharing nothing (or < SPAN_MIN_TOKENS tokens) never pair."""
    from proteofav_spark.operators.llm_queries import (
        SPAN_MIN_TOKENS,
        q_dedup_substring_span,
    )

    shared = " ".join(f"w{i}" for i in range(SPAN_MIN_TOKENS + 5))  # 25 tokens
    rows = [
        (1, "alpha beta " + shared + " gamma delta", "en", "s0", 1),
        (2, "one two three four five " + shared, "en", "s1", 1),
        # shares only a sub-threshold prefix of the span
        (3, " ".join(f"w{i}" for i in range(SPAN_MIN_TOKENS - 2)) + " zzz", "en", "s2", 1),
        (4, "totally unrelated words only here nothing shared at all "
            "padding padding padding padding padding", "en", "s3", 1),
    ]
    df = spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    res = {
        (r["doc_a"], r["doc_b"]): (r["max_span"], r["n_spans"])
        for r in q_dedup_substring_span(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in res
    assert res[(1, 2)][0] == SPAN_MIN_TOKENS + 5
    # doc 3's overlap with 1/2 is SPAN_MIN_TOKENS-2 < threshold
    assert all(3 not in pair and 4 not in pair for pair in res)


# ---------------------------------------------------------------------------
# graph_pagerank_fixed / graph_triangle_count
# ---------------------------------------------------------------------------

def test_pagerank_mass_and_floor(spark):
    """Rank mass stays ~1 (no dangling vertices in an edge-derived
    vertex set) and every vertex keeps at least the teleport floor
    (1-d)/N; customers and suppliers both present."""
    from proteofav_spark.operators.graph_queries import PR_DAMP, q_graph_pagerank_fixed

    rows = q_graph_pagerank_fixed(spark, SF).collect()
    n = len(rows)
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-3  # per-round 12dp rounding drift only
    floor = (1 - PR_DAMP) / n
    assert all(r["pagerank"] >= floor - 1e-9 for r in rows)
    assert any(r["v"] % 2 == 0 for r in rows) and any(r["v"] % 2 == 1 for r in rows)


def test_triangle_count_matches_bruteforce(spark):
    """The oriented-wedge triangle count equals a brute-force Python
    enumeration of the same near-dup graph."""
    from itertools import combinations

    from proteofav_spark.operators.llm_queries import minhash_lsh_pairs
    from proteofav_spark.operators.graph_queries import q_graph_triangle_count

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    edges = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in minhash_lsh_pairs(docs).collect()
        if r["doc_a"] != r["doc_b"]
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    for v, nb in adj.items():
        for x, y in combinations(sorted(nb), 2):
            if (min(x, y), max(x, y)) in edges:
                expect[v] = expect.get(v, 0) + 1
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in q_graph_triangle_count(spark, SF).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Empty-input hardening: new operators must return empty frames, not raise
# ---------------------------------------------------------------------------

def test_new_document_operators_handle_empty_corpus(spark, tmp_path):
    from proteofav_spark.operators.curation import q_text_unigram_logprob
    from proteofav_spark.operators.llm_queries import (
        q_dedup_crosssource_overlap,
        q_dedup_substring_span,
        q_text_bm25_search,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.limit(0).write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    for q in (
        q_text_unigram_logprob,
        q_dedup_crosssource_overlap,
        q_dedup_substring_span,
        q_text_bm25_search,
    ):
        assert q(spark, sf).count() == 0, q.__name__


def test_new_event_operators_handle_empty_events(spark, tmp_path):
    from proteofav_spark.operators.pipeline_queries import (
        q_events_anomaly_zscore,
        q_events_gapfill_interpolate,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.limit(0).write.parquet(str(tmp_path / "events.parquet"))
    sf = str(tmp_path)
    assert q_events_gapfill_interpolate(spark, sf).count() == 0
    assert q_events_anomaly_zscore(spark, sf).count() == 0
