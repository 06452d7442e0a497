"""Property-based tests (hypothesis) for the generic core ops and the
deterministic hash kernels — coverage beyond the reference's example-based
suite (SURVEY §5 notes the reference has no property testing).

Strategy sizes are kept small: each example pays a Spark job, so we cap
example counts and let hypothesis shrink within that budget.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ids = st.integers(min_value=0, max_value=50)
words = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=12
)


@given(rows=st.lists(st.tuples(ids, st.lists(words, max_size=4)), max_size=12))
@settings(**SETTINGS)
def test_split_then_merge_roundtrips_value_sets(spark, rows):
    """splitting_up_by_key then merging_down_by_key_arrays preserves each
    row's multi-value set (as a set — order/duplicates collapse, matching
    the reference's distinct-gathering merging_down semantics)."""
    from proteofav_spark.core import (
        merging_down_by_key_arrays, splitting_up_by_key,
    )

    rows = [(i, vals) for i, (_, vals) in enumerate(rows)]
    df = spark.createDataFrame(
        pd.DataFrame({"row_id": [r[0] for r in rows],
                      "xrefs_id": [r[1] for r in rows]}),
        schema="row_id: long, xrefs_id: array<string>",
    )
    split = splitting_up_by_key(df, "xrefs_id")
    # reference parity (r11): an EMPTY list drops the row entirely in
    # the split (the reference's list branch iterates nothing), so only
    # rows with values round-trip
    expected = {r[0]: sorted(set(r[1])) for r in rows if r[1]}
    merged = merging_down_by_key_arrays(split.withColumn(
        "xrefs_id", F.col("xrefs_id")), key="row_id")
    got = {
        r["row_id"]: sorted(r["xrefs_id"])
        for r in merged.select("row_id", "xrefs_id").collect()
    }
    assert got == expected


@given(vals=st.lists(st.one_of(st.none(), words), min_size=1, max_size=10))
@settings(**SETTINGS)
def test_drop_empty_cols_single_value_hoisting(spark, vals):
    """A column is dropped iff its non-null distinct count is exactly 1,
    and the hoisted attribute carries that value (parity:
    drop_empty_cols proteofav/mergers.py:385-399)."""
    from proteofav_spark.core import drop_empty_cols

    df = spark.createDataFrame(
        pd.DataFrame({"probe": pd.Series(vals, dtype="object"),
                      "keep_me": [str(i) for i in range(len(vals))]}),
        schema="probe: string, keep_me: string",
    )
    out, hoisted = drop_empty_cols(df)
    distinct = {v for v in vals if v is not None}
    # reference parity (r11): EXACTLY one non-null distinct value drops
    # (unless it's '?'); all-null columns STAY like the reference keeps
    # its all-NaN columns
    if len(distinct) == 1 and next(iter(distinct)) != "?":
        assert "probe" not in out.columns
        assert hoisted["probe"] == next(iter(distinct))
    else:
        assert "probe" in out.columns


@given(s=words)
@settings(**SETTINGS)
def test_poly_hash_matches_python_fold(spark, s):
    """The JVM polynomial hash equals the plain-Python fold for any
    printable-ASCII string (the cross-engine determinism contract the
    DuckDB oracles rely on)."""
    from proteofav_spark.operators.llm_queries import P_MOD, poly_hash_col

    expected = 0
    for ch in s:
        expected = (expected * 31 + ord(ch)) % P_MOD
    got = (
        spark.createDataFrame([(s,)], "s: string")
        .select(poly_hash_col(F.col("s")).alias("h"))
        .first()["h"]
    )
    assert got == expected


@given(
    nums=st.lists(
        st.one_of(st.none(), st.text(alphabet="0123456789", min_size=1, max_size=6),
                  words),
        min_size=1, max_size=8,
    )
)
@settings(**SETTINGS)
def test_constrain_types_try_cast_never_loses_rows(spark, nums):
    """constrain_column_types keeps every row, and applies the
    reference's ALL-OR-NOTHING per-column astype (r12 —
    proteofav/utils.py:184-199, pinned live by the hypothesis
    differential): an int target casts only when every cell is castable
    and none is NULL (pandas int64 cannot hold NaN); otherwise the whole
    column keeps its original strings."""
    from proteofav_spark.core import constrain_column_types

    df = spark.createDataFrame(
        pd.DataFrame({"v": pd.Series(nums, dtype="object")}),
        schema="v: string",
    )
    out = constrain_column_types(df, {"v": "bigint"})
    assert out.count() == len(nums)
    got = [r["v"] for r in out.collect()]
    castable = all(
        v is not None and v.isdigit() and len(v) <= 18 for v in nums
    )
    if castable:
        assert got == [int(v) for v in nums]
    else:
        assert got == list(nums)  # column kept verbatim, rows intact


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "ee", "ff"]),
            max_size=24,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_gram_run_stats_matches_counter_reference(spark, docs):
    """The sorted run-length fold must agree with a plain Counter over
    the same gram multiset: maxrun == most-common count, dup == total
    occurrences of grams seen more than once — for arbitrary token
    streams including empties and all-identical runs."""
    from collections import Counter

    from proteofav_spark.operators.curation import _gram_run_stats

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    from proteofav_spark.operators.llm_queries import shingles_col

    out = {
        r["doc_id"]: (r["s"]["maxrun"], r["s"]["dup"])
        for r in df.select(
            "doc_id", _gram_run_stats(shingles_col("text", 2)).alias("s")
        ).collect()
    }
    for i, toks in enumerate(docs):
        grams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        c = Counter(grams)
        maxrun = max(c.values(), default=0)
        dup = sum(v for v in c.values() if v > 1)
        assert out[i] == (maxrun, dup), (i, toks)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        max_size=25,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_star_components_matches_python_union_find(spark, edges):
    """star_components agrees with a driver-side union-find on arbitrary
    random graphs (self loops and duplicate/reversed edges included)."""
    from proteofav_spark.operators.pipeline_queries import star_components

    clean = [(a, b) for a, b in edges if a != b]
    if not clean:
        return
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in clean:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in parent}

    df = spark.createDataFrame(clean, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"] for r in star_components(df).collect()
    }
    assert got == expected


@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),          # user
            st.integers(min_value=0, max_value=100),        # t_us
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_funnel_stages_matches_python_reference(spark, evs):
    """Ordered-funnel stage counts must equal a direct Python scan:
    first view, first click strictly after it, first purchase strictly
    after that — for every random event log, including duplicate
    timestamps, out-of-order stages, and users missing stages."""
    from proteofav_spark.operators.pipeline_queries import funnel_stages

    rows = [
        (i, u, t, et) for i, (u, t, et) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": [r[1] for r in rows],
                "t_us": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
            }
        ),
        schema="event_id: long, user_id: long, t_us: long, event_type: string",
    )
    got = {r["stage"]: r["n_users"] for r in funnel_stages(df).collect()}

    def first_after(events, stage, lo):
        ts = [t for t, et in events if et == stage and (lo is None or t > lo)]
        return min(ts) if ts else None

    expect = {"view": 0, "view_click": 0, "view_click_purchase": 0}
    by_user: dict = {}
    for _, u, t, et in rows:
        by_user.setdefault(u, []).append((t, et))
    for events in by_user.values():
        v = first_after(events, "view", None)
        c = first_after(events, "click", v) if v is not None else None
        p = first_after(events, "purchase", c) if c is not None else None
        expect["view"] += v is not None
        expect["view_click"] += c is not None
        expect["view_click_purchase"] += p is not None
    assert got == expect


@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),     # user
            st.integers(min_value=0, max_value=30),    # period
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_retention_matrix_matches_python_reference(spark, evs):
    """Cohort retention rows must equal a direct Python computation for
    every random (user, period) activity log."""
    from proteofav_spark.operators.pipeline_queries import retention_matrix

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [u for u, _ in evs],
                "t_us": [p * 10 for _, p in evs],
            }
        ),
        schema="user_id: long, t_us: long",
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_matrix(df, bucket_us=10).collect()
    }
    first = {}
    for u, p in evs:
        first[u] = min(first.get(u, p), p)
    expect: dict = {}
    for u, p in set(evs):
        key = (first[u], p - first[u])
        expect[key] = expect.get(key, 0) + 1
    assert got == expect


# ---------------------------------------------------------------------------
# Gap-fill integer HALF_UP discretization (events_gapfill_interpolate)
# ---------------------------------------------------------------------------

@given(
    sp=st.integers(min_value=0, max_value=10**6),
    np_=st.integers(min_value=1, max_value=500),
    sn=st.integers(min_value=0, max_value=10**6),
    nn=st.integers(min_value=1, max_value=500),
    h=st.integers(min_value=2, max_value=1000),
    g=st.integers(min_value=1, max_value=999),
)
@settings(max_examples=300, deadline=None)
def test_gapfill_halfup_formula_is_exact(sp, np_, sn, nn, h, g):
    """The bigint interpolation formula in events_gapfill_interpolate —
    u6 = (2·N·10⁴ + D) div (2·D) with N, D the exact integer-cent
    fraction of pv + (nv−pv)·g/h — equals Fraction-exact HALF_UP
    rounding of the true interpolated value to micro-units, for any
    cent sums, counts, gap offset and gap width. This is the property
    that makes the query engine-identical by construction."""
    from fractions import Fraction

    if g >= h:
        g = h - 1
    pv = Fraction(sp, 100 * np_)
    nv = Fraction(sn, 100 * nn)
    true = pv + (nv - pv) * Fraction(g, h)
    # Fraction-exact HALF_UP to 1e-6 units
    scaled = true * 10**6
    want = (scaled.numerator * 2 + scaled.denominator) // (2 * scaled.denominator)
    n_int = sp * nn * h + (sn * np_ - sp * nn) * g
    d_int = np_ * nn * h
    got = (2 * n_int * 10_000 + d_int) // (2 * d_int)
    assert got == want


@given(
    a=st.integers(min_value=0, max_value=10**30),
    b=st.integers(min_value=1, max_value=10**30),
)
@settings(max_examples=300, deadline=None)
def test_round_half_up_integer_identity(a, b):
    """The exact-integer rounding identity every money/probability
    quotient in the catalog relies on: (2·a·10⁶ + b) div (2·b) equals
    round-half-UP of a/b at 6 decimals, computed without any float —
    verified against Fraction arithmetic (floats can't represent the
    operands at these magnitudes)."""
    from fractions import Fraction

    got = (2 * a * 1_000_000 + b) // (2 * b)
    q = Fraction(a, b) * 1_000_000
    floor_q = q.numerator // q.denominator
    frac = q - floor_q
    expect = floor_q + (1 if frac >= Fraction(1, 2) else 0)
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # qid
            st.integers(min_value=0, max_value=200),    # vec_id
            st.integers(min_value=-50, max_value=50),   # score
        ),
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_two_phase_topk_equals_single_window(spark, rows, k):
    """_topk_per_query (r13: one per-qid window, rank-limit pushdown
    supplying the map-side prune) must match a driver-side Python
    reference ranking exactly — the engine-independent oracle also
    covers the salted two-phase form this replaced, so the rewrite is
    pinned to the same output contract."""
    from proteofav_spark.operators.llm_queries import _topk_per_query

    # dedup (qid, vec_id) so the tie-break key is unique per partition —
    # the production contract (vec_id is a primary key)
    seen = set()
    uniq = []
    for q, v, s in rows:
        if (q, v) not in seen:
            seen.add((q, v))
            uniq.append((q, v, s))
    if not uniq:
        return
    df = spark.createDataFrame(uniq, "qid int, vec_id int, score int")
    order = [F.desc("score"), F.asc("vec_id")]
    got = sorted(
        (r["qid"], r["vec_id"], r["score"], r["prk"])
        for r in _topk_per_query(df, k, order).collect()
    )
    ref = []
    by_q: dict[int, list] = {}
    for q, v, s in uniq:
        by_q.setdefault(q, []).append((v, s))
    for q, vs in by_q.items():
        for rk, (v, s) in enumerate(
            sorted(vs, key=lambda t: (-t[1], t[0]))[:k], start=1
        ):
            ref.append((q, v, s, rk))
    assert got == sorted(ref)


# ---------------------------------------------------------------------------
# Rounding-boundary arithmetic: the integer half-away-from-zero identities
# the probe queries (and the Q9 fix pattern) rest on
# ---------------------------------------------------------------------------


@given(st.integers(min_value=0, max_value=10**15))
def test_integer_half_up_cents_matches_decimal(s):
    """(s + 50) div 100 IS decimal ROUND_HALF_UP of s/100 for any
    non-negative integer unit sum — the sanctioned pattern both engines
    compute bit-identically (probe_round_half_cents; tpch_q9)."""
    from decimal import ROUND_HALF_UP, Decimal

    want = int(
        (Decimal(s) / 100).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )
    assert (s + 50) // 100 == want


@given(st.integers(min_value=0, max_value=10**9))
def test_integer_half_up_sixth_decimal_matches_decimal(n):
    """(2·n·10^6 + 128) div 256 IS decimal ROUND_HALF_UP of n/128 at
    6 dp scaled by 10^6 — the probe_round_pow2_sixth pattern (general
    form: (2·a·10^k + d) div (2·d) for round(a/d, k))."""
    from decimal import ROUND_HALF_UP, Decimal

    want = int(
        (Decimal(n) / 128 * 10**6).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )
    assert (2 * n * 10**6 + 128) // 256 == want


def test_row_selector_empty_collection_means_no_rows(spark):
    """isin with an EMPTY collection means 'match nothing' (the
    reference's df[col.isin([])] semantic); Spark's Column.isin() with
    zero arguments raises instead — review r9 pinned the guard."""
    from proteofav_spark.core import EmptyTableError, row_selector

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    out = row_selector(df, "v", (), check_empty=False)
    assert out.count() == 0
    with pytest.raises(EmptyTableError):
        row_selector(df, "v", [], check_empty=True)
    # and reverse=True of 'nothing' is everything
    assert row_selector(df, "v", set(), reverse=True).count() == 2


# tokens over a quote-bearing alphabet, no double quotes — so wrapping
# in double quotes is always a VALID CIF encoding for tokens that need
# quoting (contain whitespace or start with a quote char)
_cif_token = st.text(
    alphabet=st.characters(whitelist_categories=(), whitelist_characters="abcxyz0189'. _-"),
    min_size=1,
    max_size=10,
).filter(lambda t: not t.isspace())


def _render_cif_line(tokens):
    out = []
    for t in tokens:
        if (" " in t) or t[0] in "'\"":
            out.append(f'"{t}"')  # t carries no double quote by alphabet
        else:
            out.append(t)
    return " ".join(out)


@given(tokens=st.lists(_cif_token, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_cif_tokenizer_roundtrips_rendered_lines(tokens):
    """Round-trip property for the terminator-aware CIF tokenizer
    (review r9): any token list rendered with valid CIF quoting —
    including tokens with embedded spaces, embedded single quotes
    ('it's ok' shapes), leading quotes, and bare mid-token quotes
    (5'-end) — must tokenize back EXACTLY. Pure-Python twin
    (cif_split_py) under test; the JVM _cif_tokens shares the regex
    verbatim and is pinned by the parser fixtures."""
    from proteofav_spark.sources.structures import cif_split_py

    line = _render_cif_line(tokens)
    assert cif_split_py(line) == tokens, line


# writer-side alphabet: BOTH quote kinds, spaces, and comment/reserved
# lead chars — everything the r10 quote-aware writer must protect.
# Values carrying both quote kinds have no single-line CIF spelling and
# the writer raises on them by contract, so they are filtered here.
_cif_value = st.text(
    alphabet=st.characters(
        whitelist_categories=(),
        whitelist_characters="abcxyz0189'\". _-#;$",
    ),
    min_size=1,
    max_size=12,
).filter(
    lambda t: not t.isspace() and not ("'" in t and '"' in t)
)


@given(vals=st.lists(_cif_value, min_size=1, max_size=6))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cif_writer_quoting_roundtrips_through_tokenizer(spark, vals):
    """Write-side twin of the tokenizer round-trip (review r10): the
    quote-aware writer's rendered atom line must tokenize back to the
    EXACT input values for any spellable value — embedded spaces,
    either quote kind (not both), leading comment chars, leading
    quotes. This pins the writer and the parser as mutual inverses, so
    a quoting-rule drift on either side fails here instead of silently
    corrupting a round-trip at some future fixture."""
    from proteofav_spark.sinks.writers import mmcif_atom_lines
    from proteofav_spark.sources.structures import cif_split_py

    cols = [f"c{i}" for i in range(len(vals))]
    df = spark.createDataFrame([tuple(vals)], cols)
    _, body = mmcif_atom_lines(df)
    line = body.collect()[0]["value"]
    assert cif_split_py(line) == list(vals), line
