"""Physical-plan invariants — the 100 TB design rules, enforced as tests.

These don't execute the queries (explain only), so the whole catalog
checks in seconds at sf0.001.
"""

import pytest

from proteofav_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )


def test_no_cartesian_products_anywhere(spark):
    """No registered query may plan a CartesianProduct. Tiny-side cross
    joins must go through broadcast (BroadcastNestedLoopJoin), which is
    bounded by the broadcast size; a CartesianProduct shuffles both
    sides and is never acceptable at scale."""
    offenders = []
    for name in all_queries():
        if _plan_has(spark, name, "CartesianProduct"):
            offenders.append(name)
    assert offenders == [], offenders


def test_no_row_at_a_time_python_udfs(spark):
    """Python must only appear as Arrow-batched evaluation
    (ArrowEvalPython / mapInPandas); plain BatchEvalPython is the
    row-at-a-time serialization path, ~10-100x slower."""
    offenders = []
    for name in all_queries():
        if _plan_has(spark, name, "BatchEvalPython"):
            offenders.append(name)
    assert offenders == [], offenders


_PLANS: dict[str, str] = {}


def _plan_has(spark, name: str, needle: str) -> bool:
    if name not in _PLANS:
        _PLANS[name] = _plan(spark, name)
    return needle in _PLANS[name]


@pytest.mark.parametrize(
    "name, forbidden",
    [
        ("join_merge_tree", "SortMergeJoin"),   # dims broadcast, fact left
        ("join_star_revenue", "SortMergeJoin"), # dims broadcast at this SF
        ("scalar_map_lookup", "Exchange"),      # map-literal lookup is map-only
        ("text_token_stats", "Exchange"),       # pure projection
        ("text_pii_scrub", "Exchange"),         # map-only regex scrub
        ("sample_weighted_hash", "Exchange"),   # stateless hash acceptance
    ],
)
def test_plan_shape_invariants(spark, name, forbidden):
    assert not _plan_has(spark, name, forbidden), (
        f"{name} plan unexpectedly contains {forbidden}"
    )


@pytest.mark.parametrize(
    "name, required",
    [
        # the order-date predicate must reach the parquet scan
        ("join_star_revenue", "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
        # the status isin-filter pushes down
        ("filter_isin", "In(o_orderstatus, [F,O]"),
    ],
)
def test_predicates_reach_scans(spark, name, required):
    assert _plan_has(spark, name, required), (
        f"{name} plan is missing expected fragment: {required}"
    )
