"""Semantic invariants for the round-9 additions: the signed-money
rounding probe (both helper branches on true .xx5 halves), the
wide-units overflow probe (forces the regime where the pre-r9 BIGINT
half-up helpers overflowed int64), and the k-means assignment
inter-seed margin invariant (ADVICE r9: the cross-engine argmin parity
rests on margins dwarfing summation-order noise — enforce that data
property instead of assuming it)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


# ---------------------------------------------------------------------------
# probe_signed_money_round
# ---------------------------------------------------------------------------


def test_signed_probe_exercises_both_branches_on_boundaries(spark):
    """Every group emits a +boundary and a −boundary row (s ≡ ±50 mod
    100, a TRUE .xx5 half in both directions), and the emitted dollars
    equal integer half-AWAY-FROM-ZERO — floor division (the pre-r9
    oracle pattern) would be one cent low on every negative row."""
    from proteofav_spark.queries import all_queries

    rows = all_queries()["probe_signed_money_round"](spark, SF).collect()
    assert rows
    by_flag: dict[str, list[int]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r["units_signed"])
    for flag, ss in by_flag.items():
        assert len(ss) == 2 and min(ss) == -max(ss) > -(2**63), flag
    for r in rows:
        s = r["units_signed"]
        assert abs(s) % 100 == 50
        away = (abs(s) + 50) // 100
        expect = (away if s >= 0 else -away) / 100.0
        assert r["dollars"] == expect, (s, r["dollars"], expect)
        if s < 0:
            # floor division would differ by exactly one cent here
            assert r["dollars"] != ((s + 50) // 100) / 100.0


# ---------------------------------------------------------------------------
# probe_half_up_wide_units
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_wide_units_probe_forces_old_overflow_regime(spark, sf_dir):
    """The probe is only a tripwire if its numerators actually cross the
    pre-r9 overflow point (2·num·10⁶ > 2⁶³−1 ⇔ num > ~4.6e12) at EVERY
    sweep SF — and stay within the BIGINT quotient bound on the way
    out. Also pins the emitted ratio against exact integer half-up."""
    from proteofav_spark.queries import all_queries

    rows = all_queries()["probe_half_up_wide_units"](spark, sf_dir).collect()
    assert rows
    wrap = (2**63 - 1) // 2_000_000  # num above this overflowed pre-r9
    for r in rows:
        num, den = r["wide_num"], r["den"]
        assert num > wrap, (r["source"], num)
        q = (2 * num * 1_000_000 + den) // (2 * den)  # exact (Python int)
        assert q < 2**63
        assert r["ratio6"] == q / 1_000_000.0


def test_old_bigint_helper_form_overflows_on_probe_input(spark):
    """Regression direction-check: the PRE-r9 helper expression really
    does overflow on this probe's numerators (ANSI mode aborts; this is
    what a revert of the DECIMAL(38,0) widening would reinstate)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ArithmeticException

    from proteofav_spark.queries import load

    d = load(spark, SF, "documents")
    s = d.groupBy("source").agg(
        (F.sum("n_chars").cast("long") * F.lit(10_000_000_000) + 1).alias(
            "wide_num"
        ),
        F.count(F.lit(1)).alias("den"),
    )
    old = s.select(
        F.expr("(2 * wide_num * 1000000L + den) div (2 * den)").alias("x")
    )
    with pytest.raises((ArithmeticException, Py4JJavaError)):
        old.collect()


# ---------------------------------------------------------------------------
# embedding_kmeans_assign: inter-seed margin invariant (ADVICE r9)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", SFS)
def test_kmeans_assign_margin_dwarfs_summation_noise(spark, sf_dir):
    """The cross-engine parity of embedding_kmeans_assign rests on
    numpy's dim-ordered float64 distance fold and DuckDB's unordered
    SUM agreeing THROUGH the argmin: that holds exactly when every
    vector's best/second-best distance gap dwarfs summation-order
    noise (≲1e-12 relative for DIM-length float64 folds). This test
    turns the docstring's data claim into an enforced invariant: if a
    regenerated corpus ever contains a near-equidistant vector, THIS
    fails with a clear message instead of the driver gate going flaky
    (ADVICE r9). Ties-by-duplication (gap == 0 with identical seed
    rows) would also be caught — seeds must be pairwise distinct."""
    from proteofav_spark.operators.llm_queries import KMEANS_K

    rows = sorted(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cents = np.array(
        [r["embedding"] for r in rows[:KMEANS_K]], dtype=np.float64
    )
    # seeds pairwise distinct (a duplicated seed makes gap 0 for its
    # own row and the argmin purely tie-break-dependent)
    for i in range(KMEANS_K):
        for j in range(i + 1, KMEANS_K):
            assert ((cents[i] - cents[j]) ** 2).sum() > 0, (i, j)
    worst_rel = np.inf
    for r in rows:
        e = np.array(r["embedding"], dtype=np.float64)
        d2 = np.sort(((cents - e) ** 2).sum(axis=1))
        gap, scale = d2[1] - d2[0], max(d2[1], 1.0)
        worst_rel = min(worst_rel, gap / scale)
    # 1e-6 relative: ~six orders of magnitude above float64
    # summation-order noise, far below any real cluster separation
    assert worst_rel > 1e-6, (
        f"min relative best/second-best margin {worst_rel:.2e} at "
        f"{sf_dir} — the unordered-SUM oracle argmin is no longer "
        "robust; quantize d2 on both engines or regenerate seeds"
    )


# ---------------------------------------------------------------------------
# probe_wide_money_sum: the 100 TB money-SUM regime
# ---------------------------------------------------------------------------


def test_wide_money_sum_exceeds_long_range_and_matches_python(spark):
    """The probe's group sums must actually exceed 2^63 (else it
    tripwires nothing), the emitted mega-units must equal exact Python
    integer arithmetic, and the plain LONG sum must ANSI-abort on the
    very same input — the failure mode sum_units_wide exists to
    remove."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ArithmeticException

    from proteofav_spark.queries import all_queries, load, revenue_units

    rows = all_queries()["probe_wide_money_sum"](spark, SF).collect()
    assert rows
    li = load(spark, SF, "lineitem").select(
        "l_returnflag",
        revenue_units().alias("u"),
    ).collect()
    sums: dict[str, int] = {}
    for r in li:
        sums[r["l_returnflag"]] = sums.get(r["l_returnflag"], 0) + r["u"]
    for r in rows:
        s = sums[r["l_returnflag"]] * 20_000_000
        assert s > 2**63 - 1, r["l_returnflag"]  # past int64 at this SF
        assert r["mega_units"] == (s + 500_000) // 1_000_000

    wide = revenue_units() * F.lit(20_000_000)
    long_sum = (
        load(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum(wide).alias("s"))
    )
    with pytest.raises((ArithmeticException, Py4JJavaError)):
        long_sum.collect()
