"""merge_asof (operators/pipeline_queries.py) vs pandas.merge_asof —
the reference implementation IS the oracle: randomized keyed series are
joined in all three directions, with and without tolerance, and the
results must agree row-for-row (pandas' input-order duplicate handling
reproduced via an explicit sequence tiebreak column). Plan invariants
pin the one-exchange, no-join shape."""

import numpy as np
import pandas as pd
import pytest

from proteofav_spark.operators.pipeline_queries import merge_asof


def _random_frames(seed: int, n_left=200, n_right=150, n_keys=5):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.integers(0, 1000, n_left).astype("int64"),
            "lv": rng.integers(0, 100, n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "t": rng.integers(0, 1000, n_right).astype("int64"),
            "v": rng.integers(0, 10_000, n_right),
        }
    )
    right["seq"] = np.arange(len(right))  # pandas' input order, explicit
    return left, right


def _expected(left, right, direction, tolerance):
    kw = {"direction": direction}
    if tolerance is not None:
        kw["tolerance"] = tolerance
    exp = pd.merge_asof(
        left.sort_values(["t", "k"], kind="stable"),
        right.sort_values(["t", "seq"], kind="stable"),
        on="t",
        by="k",
        **kw,
    )
    return {
        (r.k, r.t, r.lv): (None if pd.isna(r.v) else int(r.v))
        for r in exp.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 50])
def test_matches_pandas(spark, direction, tolerance):
    left, right = _random_frames(seed=11)
    # drop duplicate (k, t, lv) left rows so the comparison dict keys
    # are unique (duplicates would collapse identical matches anyway)
    left = left.drop_duplicates(["k", "t", "lv"])
    want = _expected(left, right, direction, tolerance)
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    out = merge_asof(
        sl, sr, on="t", by=["k"], direction=direction,
        tolerance=tolerance, tiebreak=["seq"],
    ).collect()
    got = {(r["k"], r["t"], r["lv"]): r["v"] for r in out}
    assert got == want
    # the matched right time is consistent with the direction
    for r in out:
        if r["t_right"] is None:
            continue
        if direction == "backward":
            assert r["t_right"] <= r["t"]
        elif direction == "forward":
            assert r["t_right"] >= r["t"]
        if tolerance is not None:
            assert abs(r["t_right"] - r["t"]) <= tolerance


def test_duplicate_right_timestamps_match_pandas(spark):
    """Backward picks the LAST duplicate at a time, forward the FIRST —
    pandas' stable input-order behavior under the seq tiebreak."""
    left = pd.DataFrame({"k": [1, 1, 1], "t": [10, 20, 30], "lv": [0, 1, 2]})
    right = pd.DataFrame(
        {"k": [1, 1], "t": [20, 20], "v": [111, 222], "seq": [0, 1]}
    )
    for direction in ("backward", "forward", "nearest"):
        want = _expected(left, right, direction, None)
        out = merge_asof(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="t", by=["k"], direction=direction, tiebreak=["seq"],
        ).collect()
        got = {(r["k"], r["t"], r["lv"]): r["v"] for r in out}
        assert got == want, direction


def test_nearest_tie_goes_backward(spark):
    left = pd.DataFrame({"k": [1], "t": [20], "lv": [0]})
    right = pd.DataFrame(
        {"k": [1, 1], "t": [15, 25], "v": [1, 2], "seq": [0, 1]}
    )
    out = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="t", by=["k"], direction="nearest", tiebreak=["seq"],
    ).collect()
    assert out[0]["v"] == 1 and out[0]["t_right"] == 15


def test_name_collision_suffix_and_reserved_guard(spark):
    left = pd.DataFrame({"k": [1], "t": [10], "v": [5]})
    right = pd.DataFrame({"k": [1], "t": [8], "v": [7]})
    out = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="t", by=["k"],
    ).collect()[0]
    assert out["v"] == 5 and out["v_right"] == 7 and out["t_right"] == 8
    with pytest.raises(ValueError, match="reserved"):
        merge_asof(
            spark.createDataFrame(pd.DataFrame({"k": [1], "t": [1], "_tag": [0]})),
            spark.createDataFrame(right),
            on="t", by=["k"],
        )
    with pytest.raises(ValueError, match="direction"):
        merge_asof(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="t", by=["k"], direction="sideways",
        )


def test_plan_one_keyed_exchange_no_join(spark):
    """The scale claim: both direction scans share the by-partitioning —
    ONE hash exchange over the unioned frame, zero join operators, even
    for nearest."""
    left, right = _random_frames(seed=13)
    out = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="t", by=["k"], direction="nearest", tiebreak=["seq"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for op in ("SortMergeJoin", "BroadcastHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan, op


# ---------------------------------------------------------------------------
# Adversarial cases (VERDICT r6 item #8)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_all_duplicate_timestamps(spark, direction):
    """Every row on BOTH sides shares one timestamp: the match is decided
    entirely by the dup-time tiebreak (backward=last right in seq order,
    forward=first; nearest tie -> backward)."""
    left = pd.DataFrame({"k": [1, 1, 2], "t": [5, 5, 5], "lv": [0, 1, 2]})
    right = pd.DataFrame(
        {"k": [1, 1, 2, 2], "t": [5, 5, 5, 5], "v": [10, 20, 30, 40],
         "seq": [0, 1, 2, 3]}
    )
    want = _expected(left, right, direction, None)
    out = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="t", by=["k"], direction=direction, tiebreak=["seq"],
    ).collect()
    got = {(r["k"], r["t"], r["lv"]): r["v"] for r in out}
    assert got == want, direction


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_tolerance_zero_exact_matches_only(spark, direction):
    """tolerance=0 keeps only exact-time matches (pandas accepts 0)."""
    left = pd.DataFrame({"k": [1, 1, 1], "t": [10, 20, 30], "lv": [0, 1, 2]})
    right = pd.DataFrame(
        {"k": [1, 1], "t": [10, 29], "v": [7, 8], "seq": [0, 1]}
    )
    want = _expected(left, right, direction, 0)
    out = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="t", by=["k"], direction=direction, tolerance=0,
        tiebreak=["seq"],
    ).collect()
    got = {(r["k"], r["t"], r["lv"]): r["v"] for r in out}
    assert got == want, direction
    # only the exact-time left row matched
    assert sum(v is not None for v in got.values()) == 1


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_empty_right_partitions_and_empty_right(spark, direction):
    """Keys with no right rows at all yield NULL payloads (per-key empty
    partitions), and a fully EMPTY right frame yields all-NULL matches —
    the union/window plan must not fail on either."""
    left = pd.DataFrame(
        {"k": [1, 2, 3], "t": [10, 20, 30], "lv": [0, 1, 2]}
    )
    right = pd.DataFrame({"k": [2], "t": [19], "v": [5], "seq": [0]})
    out = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="t", by=["k"], direction=direction, tiebreak=["seq"],
    ).collect()
    got = {r["k"]: r["v"] for r in out}
    assert got[1] is None and got[3] is None
    assert (got[2] == 5) == (direction != "forward")

    empty_right = spark.createDataFrame(
        [], "k bigint, t bigint, v bigint, seq bigint"
    )
    out2 = merge_asof(
        spark.createDataFrame(left), empty_right,
        on="t", by=["k"], direction=direction, tiebreak=["seq"],
    ).collect()
    assert len(out2) == 3
    assert all(r["v"] is None and r["t_right"] is None for r in out2)


def test_nearest_distance_overflow_probe(spark):
    """Timestamps near +/-2^63: the two candidate distances each exceed
    int64 range (span up to 2^64), which would raise an ANSI overflow
    (or wrap, silently inverting the comparison) if computed in BIGINT.
    The operator widens integral on-columns to decimal for distance
    arithmetic, so the mathematically-nearer side must win. pandas
    itself overflows here, so the oracle is exact Python int arithmetic."""
    hi = 2**63 - 10
    lo = -(2**63) + 10
    # left at 0: backward candidate at lo (dist 2^63-10), forward at
    # hi-5 (dist 2^63-15) -> forward is nearer by 5
    left = pd.DataFrame({"k": [1], "t": [0], "lv": [0]})
    right = pd.DataFrame(
        {"k": [1, 1], "t": [lo, hi - 5], "v": [1, 2], "seq": [0, 1]}
    )
    out = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="t", by=["k"], direction="nearest", tiebreak=["seq"],
    ).collect()
    assert out[0]["v"] == 2 and out[0]["t_right"] == hi - 5
    # and with the backward side nearer instead
    right2 = pd.DataFrame(
        {"k": [1, 1], "t": [lo + 7, hi], "v": [1, 2], "seq": [0, 1]}
    )
    out2 = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right2),
        on="t", by=["k"], direction="nearest", tiebreak=["seq"],
    ).collect()
    assert out2[0]["v"] == 1 and out2[0]["t_right"] == lo + 7
    # tolerance comparison at the same extremes must not overflow either
    out3 = merge_asof(
        spark.createDataFrame(left), spark.createDataFrame(right2),
        on="t", by=["k"], direction="backward", tolerance=2**63 + 100,
        tiebreak=["seq"],
    ).collect()
    assert out3[0]["v"] == 1


def test_output_name_collision_raises(spark):
    """ADVICE r6: _bwd/_fwd are reserved, and a pre-existing left column
    equal to the matched-time alias (or a suffixed payload name) must
    raise instead of silently duplicating/clobbering."""
    right = pd.DataFrame({"k": [1], "t": [8], "v": [7]})
    for bad in ("_bwd", "_fwd"):
        with pytest.raises(ValueError, match="reserved"):
            merge_asof(
                spark.createDataFrame(
                    pd.DataFrame({"k": [1], "t": [1], bad: [0]})
                ),
                spark.createDataFrame(right),
                on="t", by=["k"],
            )
    with pytest.raises(ValueError, match="collide with left"):
        merge_asof(
            spark.createDataFrame(
                pd.DataFrame({"k": [1], "t": [1], "t_right": [0]})
            ),
            spark.createDataFrame(right),
            on="t", by=["k"],
        )
    with pytest.raises(ValueError, match="collide with left"):
        merge_asof(
            spark.createDataFrame(
                pd.DataFrame({"k": [1], "t": [1], "v": [2], "v_right": [0]})
            ),
            spark.createDataFrame(right),
            on="t", by=["k"],
        )


def test_contract_guards_from_review(spark):
    """Round-7 review findings: mismatched on-column dtypes, a right
    payload named _t, and negative tolerance must all raise clearly."""
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [10], "lv": [0]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [8], "v": [7]}))
    right_float = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": [8.0], "v": [7]})
    )
    with pytest.raises(ValueError, match="type mismatch"):
        merge_asof(left, right_float, on="t", by=["k"])
    with pytest.raises(ValueError, match="tolerance"):
        merge_asof(left, right, on="t", by=["k"], tolerance=-1)
    right_t = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": [8], "_t": [9], "v": [7]})
    )
    with pytest.raises(ValueError, match="_t"):
        merge_asof(left, right_t, on="t", by=["k"])


# ---------------------------------------------------------------------------
# Property-based parity (hypothesis): randomized series, all directions
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ts = st.integers(min_value=-20, max_value=20)  # tight range -> many dups


@given(
    left_rows=st.lists(
        st.tuples(st.integers(0, 2), _ts), min_size=1, max_size=12
    ),
    right_rows=st.lists(
        st.tuples(st.integers(0, 2), _ts, st.integers(0, 99)), max_size=12
    ),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.sampled_from([None, 0, 3]),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_matches_pandas(spark, left_rows, right_rows, direction,
                                 tolerance):
    """Hypothesis-shrunk parity with pandas.merge_asof over tiny dup-heavy
    keyed series: the discrete adversarial tests above pin known traps;
    this hunts for unknown ones (empty right, all-dup times, keys on one
    side only, zero tolerance all arise naturally here)."""
    left = pd.DataFrame(
        {"k": [r[0] for r in left_rows], "t": [r[1] for r in left_rows]}
    ).drop_duplicates(["k", "t"])
    left["lv"] = range(len(left))
    right = pd.DataFrame(
        {"k": [r[0] for r in right_rows], "t": [r[1] for r in right_rows],
         "v": [r[2] for r in right_rows]}
    )
    right["seq"] = range(len(right))
    left = left.astype({"k": "int64", "t": "int64"})
    right = right.astype({"k": "int64", "t": "int64", "v": "int64"})
    want = _expected(left, right, direction, tolerance)
    sr = (
        spark.createDataFrame(right)
        if len(right)
        else spark.createDataFrame([], "k bigint, t bigint, v bigint, seq bigint")
    )
    out = merge_asof(
        spark.createDataFrame(left), sr, on="t", by=["k"],
        direction=direction, tolerance=tolerance, tiebreak=["seq"],
    ).collect()
    got = {(r["k"], r["t"], r["lv"]): r["v"] for r in out}
    assert got == want
