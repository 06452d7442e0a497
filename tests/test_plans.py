"""Physical-plan invariants — the 100 TB design rules, enforced as tests.

These don't execute the queries (explain only), so the whole catalog
checks in seconds at sf0.001.
"""

import re

import pytest

from proteofav_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    # include_retired: retired twins left the DRIVER catalog (capacity
    # policy, r9) but bench.py still times them — the plan invariants
    # keep applying to every runnable query
    df = all_queries(include_retired=True)[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )


def test_no_cartesian_products_anywhere(spark):
    """No registered query may plan a CartesianProduct. Tiny-side cross
    joins must go through broadcast (BroadcastNestedLoopJoin), which is
    bounded by the broadcast size; a CartesianProduct shuffles both
    sides and is never acceptable at scale."""
    offenders = []
    for name in all_queries(include_retired=True):
        if _plan_has(spark, name, "CartesianProduct"):
            offenders.append(name)
    assert offenders == [], offenders


def test_no_row_at_a_time_python_udfs(spark):
    """Python must only appear as Arrow-batched evaluation
    (ArrowEvalPython / mapInPandas); plain BatchEvalPython is the
    row-at-a-time serialization path, ~10-100x slower."""
    offenders = []
    for name in all_queries(include_retired=True):
        if _plan_has(spark, name, "BatchEvalPython"):
            offenders.append(name)
    assert offenders == [], offenders


_PLANS: dict[str, str] = {}


def _plan_has(spark, name: str, needle: str) -> bool:
    if name not in _PLANS:
        _PLANS[name] = _plan(spark, name)
    return needle in _PLANS[name]


def test_no_unpartitioned_global_sorts(spark):
    """No registered query may plan a GLOBAL sort — at 100 TB a global
    sort is a full-data range-shuffle into one total order, and one
    straggler partition bounds the job. Ordered output must be either
    per-partition (sortWithinPartitions / window partitionBy — bounded
    sort tasks) or a top-N, which Spark plans as TakeOrderedAndProject
    (per-partition heaps + a k-row driver merge): a logical
    ``Sort [...], true`` is therefore only acceptable when the physical
    plan shows it collapsed into TakeOrderedAndProject."""
    offenders = []
    for name in all_queries(include_retired=True):
        plan = _full_plan(spark, name)
        if re.search(r"Sort \[[^\]]+\], true", plan) and (
            "TakeOrderedAndProject" not in plan
        ):
            offenders.append(name)
    assert offenders == [], offenders


def test_no_unpartitioned_windows(spark):
    """Every window function must carry a partition spec: an
    unpartitioned window funnels the ENTIRE input through a single
    window partition (one task, unbounded buffer) — the classic
    silent-at-test-scale, fatal-at-100 TB plan shape. Detected from
    ``windowspecdefinition(...)`` in the analyzed plan: a spec whose
    first argument is already an ordering (or a frame) has no
    partitioning columns."""
    offenders = []
    spec_re = re.compile(
        r"windowspecdefinition\(([^()]*(?:\([^()]*\))?[^()]*)\)"
    )
    for name in all_queries(include_retired=True):
        plan = _full_plan(spark, name)
        for m in spec_re.finditer(plan):
            first = m.group(1).split(",")[0]
            if (
                " ASC" in first
                or " DESC" in first
                or first.startswith("specifiedwindowframe")
            ):
                offenders.append(name)
                break
    assert offenders == [], offenders


def _full_plan(spark, name: str) -> str:
    if name not in _PLANS:
        _PLANS[name] = _plan(spark, name)
    return _PLANS[name]


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


# ---------------------------------------------------------------------------
# Domain-path (ProteoFAV) plan invariants: the same 100 TB rules that govern
# the catalog also hold for the bioinformatics pipeline — filter_structures,
# residues_aggregation on a multi-structure frame, add_contacts, and the
# mmCIF⟕DSSP⟕SIFTS merge tree.
# ---------------------------------------------------------------------------

REF = "/root/reference/tests/testdata"


def _domain_plans(spark):
    """Build (name, DataFrame) pairs for the reference-path operators."""
    from proteofav_spark.operators.structures import (
        add_contacts,
        filter_structures,
        residues_aggregation,
    )
    from proteofav_spark.plans.mergers import table_merger
    from proteofav_spark.sources.dssp import parse_dssp_residues, filter_dssp
    from proteofav_spark.sources.sifts import parse_sifts_residues, filter_sifts
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    atoms = parse_mmcif_atoms(spark, f"{REF}/mmcif/2w4o.cif")
    filtered = filter_structures(atoms, chains=("A",), atoms=("CA",))
    merged = table_merger(
        filtered,
        filter_dssp(parse_dssp_residues(spark, f"{REF}/dssp/2w4o.dssp"), chains=("A",)),
        filter_sifts(parse_sifts_residues(spark, f"{REF}/sifts/2w4o.xml"), chains=("A",)),
    )
    # multi-structure lake frame: two parses unioned -> source_file varies
    multi = parse_mmcif_atoms(spark, f"{REF}/mmcif/2w4o.cif").unionByName(
        parse_mmcif_atoms(spark, f"{REF}/mmcif/2pah.cif"), allowMissingColumns=True
    )
    return [
        ("filter_structures", filtered),
        ("table_merger_2w4o", merged),
        ("residues_aggregation_multi", residues_aggregation(multi)),
        ("add_contacts", add_contacts(filter_structures(atoms, chains=("A",)))),
    ]


def _domain_plan_text(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )


def test_domain_plans_obey_scale_invariants(spark):
    """The ProteoFAV path plans like the catalog must: no cartesian
    product, no row-at-a-time Python, no non-top-N GLOBAL sort (the
    single-structure orderBy('id') tail is exercised via the
    multi-structure frame, which must take the partition-scoped branch),
    and no unpartitioned window."""
    spec_re = re.compile(r"windowspecdefinition\(([^()]*(?:\([^()]*\))?[^()]*)\)")
    offenders = []
    for name, df in _domain_plans(spark):
        plan = _domain_plan_text(spark, df)
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython"))
        if re.search(r"Sort \[[^\]]+\], true", plan) and (
            "TakeOrderedAndProject" not in plan
        ):
            offenders.append((name, "global Sort"))
        for m in spec_re.finditer(plan):
            first = m.group(1).split(",")[0]
            if (
                " ASC" in first
                or " DESC" in first
                or first.startswith("specifiedwindowframe")
            ):
                offenders.append((name, "unpartitioned window"))
                break
    assert offenders == [], offenders


# Physical shuffle budget per headline query, measured at the current
# plan shapes (sf0.001, extended explain, physical section only). These
# are CEILINGS: a future edit that adds an exchange to a hot query must
# consciously raise the budget here — shuffle-count discipline is the
# core 100 TB design rule, so regressions should fail CI, not surface
# in a bench round later. (Index-cached ANN queries may plan FEWER
# exchanges when the session cache is warm; <= handles both states.)
EXCHANGE_BUDGET = {
    "join_merge_tree": 5,
    "join_star_revenue": 8,
    "agg_pricing_summary": 1,
    "window_moving_avg": 1,
    "agg_residue_rollup": 1,
    "window_reset_id": 1,
    "window_dedup_adjacent": 1,
    "events_tumbling_window": 1,
    "dedup_exact_hash": 1,
    # r13 single-eval restructure: the doc -> distinct-shingle-array frame
    # materializes once (lazy localCheckpoint) and n_sh = size(sh), so the
    # two aliased size-side groupBy exchanges are gone: 6 -> 4
    # (inverted-index groupBy + pair agg + the two size broadcasts)
    "dedup_ngram_jaccard": 4,
    "dedup_minhash_lsh": 3,
    "dedup_simhash": 1,
    "text_token_stats": 0,
    "text_fingerprint": 0,
    # r13: the salted local-top-k exchange is gone from every retrieval
    # query — _topk_per_query is one per-qid window whose map-side prune
    # comes from Spark's rank-limit pushdown (WindowGroupLimit Partial),
    # so each consumer's budget drops by one keyed exchange
    "knn_cosine_topk": 2,    # 1 keyed (per-qid window) + 1 broadcast
    "ann_lsh_bucketed": 5,
    # r13: probe side broadcast (was a 2-exchange SortMergeJoin) and the
    # provably-redundant candidate distinct dropped: 10 -> 7
    "ann_ivf_coarse": 7,
    # 1 keyed top-M + 1 keyed global + broadcasts (query codes/LUTs,
    # candidate list into the rescore, query vectors)
    "knn_quantized_rescore": 5,
    "ann_pq_topk": 5,
    "dedup_embedding_cosine": 4,
    "spatial_contacts_grid": 2,
    "sessionize_events_gap": 1,
    "events_asof_join": 2,
    "events_merge_asof_tolerance": 2,  # right-dedup agg + the asof window
    "events_range_join_bucketed": 3,
    "dedup_cc_clusters": 3,
    # r13 single-pass restructure: member agg reuses the (lang, stream)
    # window partitioning; the corpus subtree sits behind a lazy
    # localCheckpoint, leaving the tiny offsets rollup + broadcast join
    "shard_concat_digest": 3,
    "text_repetition_metrics": 0,
    "contamination_ngram_overlap": 5,
    # non-headline, budget-pinned after PLANS.md recorded a statistics-
    # driven 2->3 keyed-exchange drift (the region-pruned customer join
    # flipped from broadcast to shuffle when its derived-size estimate
    # crossed the threshold): 3 keyed + 5 broadcast exchanges is the
    # honest at-scale shape — customer is NOT broadcastable at 100 TB —
    # and this pin catches any further growth (this count includes
    # BroadcastExchange nodes, like every entry above)
    "nation_market_share": 8,
    # r9 exactness probes: one map-side-partial aggregation each — a
    # probe that grows a shuffle stops being a probe
    "probe_signed_money_round": 1,
    "probe_half_up_wide_units": 1,
    "probe_wide_money_sum": 1,
}


def test_headline_exchange_budgets(spark):
    over = {}
    for name, budget in EXCHANGE_BUDGET.items():
        plan = _full_plan(spark, name)
        phys = plan.split("== Physical Plan ==")[-1]
        n = phys.count("Exchange")
        if n > budget:
            over[name] = (n, budget)
    assert over == {}, f"shuffle-count regressions (got, budget): {over}"


# The r13 single-window top-k restructure made every retrieval query's
# scale safety depend on Spark's rank-limit pushdown (SPARK-37099): the
# map-side prune the retired salted two-phase form provided explicitly
# now comes from the WindowGroupLimit physical rule. EXCHANGE_BUDGET
# cannot see that distinction (same exchange count either way), so pin
# the node itself — a disabled rule (windowGroupLimitThreshold <= 0) or
# a Spark version without it would silently plan unbounded per-qid
# sorts.
RANK_LIMITED = [
    "knn_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf_coarse",
    "ann_ivf_store_probe",
    "knn_quantized_rescore",
    "ann_pq_topk",
]


def test_retrieval_rank_limit_pushdown(spark):
    missing = []
    for name in RANK_LIMITED:
        phys = _full_plan(spark, name).split("== Physical Plan ==")[-1]
        if "WindowGroupLimit" not in phys:
            missing.append(name)
    assert missing == [], (
        f"rank-limit pushdown (WindowGroupLimit) absent from: {missing}"
    )
