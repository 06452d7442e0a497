"""Generate PLANS.md: a physical-plan audit of the headline queries.

For each headline query this prints the scan/exchange/broadcast/codegen
shape extracted from ``.explain("formatted")`` so the 100 TB design claims
are checkable against what Catalyst actually planned, at the current SF,
plus the AQE-final plan notes where relevant.

Run: python tools/plan_audit.py [sf_dir]   (writes PLANS.md at repo root)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALE_NOTES = {
    "join_merge_tree": (
        "fact joins carry no broadcast hint — AQE broadcasts orders/customer "
        "while they fit and falls back to shuffle joins at cluster scale; "
        "nation/region are hinted (constant-size dims)."
    ),
    "agg_pricing_summary": (
        "partial aggregation before the single exchange; scan reads only the "
        "6 referenced columns with the shipdate predicate pushed."
    ),
    "window_dedup_adjacent": (
        "window partitioned by l_orderkey — no global sort; scales with the "
        "number of groups, not total rows."
    ),
    "dedup_minhash_lsh": (
        "signatures compute once (posexplode over band buckets, not a "
        "band-wise union); bucket sizes come from a partitioned window "
        "count (one exchange, spill-capable — no unbounded collect_list), "
        "mega-buckets salt-split into ceil(size/cap) sub-buckets whose "
        "groupBy reuses the window exchange, and pair generation happens "
        "inside the salted-bucket groupBy — wide exchanges: bucket window "
        "+ final-pair aggregation."
    ),
    "dedup_embedding_cosine": (
        "bucket depth adaptive over a 14-bit ladder on 12 tables (r10 "
        "re-tune — the old 8-bit ladder bottomed out by sf0.3x and "
        "candidate pairs went n^2/1,536-cells: 54k->485k->5.39M "
        "measured; now depth climbs 10->12->14 across the sweep and "
        "pairs/vec stays ~13-15): full-depth bands checkpoint once per "
        "(session, corpus) as an LSH-index artifact; the occupancy "
        "probe is fully distributed (per-cell counts aggregate once, "
        "each ladder rung re-aggregates that frame, ONE decimal(38,0) "
        "scalar per rung reaches the driver — a 100 TB hot cell can't "
        "ANSI-abort a bigint sum); the pair shuffle carries only "
        "(vec_id, vec_id); embeddings and precomputed norms join back "
        "onto surviving pairs. Recall/depth frontier on the constants "
        "(production-tau modeled recall 0.98/0.87/0.77 at depths "
        "8/12/14 with L=12; hold a target R deeper by growing "
        "L ~ ln(1-R)/ln(1-p^k))."
    ),
    "join_lake_merge_tree": (
        "the lake-wide merge path (plans/mergers.lake_table_merger): "
        "every structure-level join key gains entry_id so residues "
        "only match within their own entry, and NO side carries a "
        "broadcast hint — AQE picks the strategy, and on bucketed lake "
        "tables ((entry, chain, resnum) buckets) the merge is proven "
        "exchange-free in the executed plan (tests/test_lake.py). The "
        "three synthetic sides pre-aggregate to unique keys so the "
        "left joins cannot fan out."
    ),
    "spatial_contacts_grid": (
        "half-neighborhood grid equi-join replaces the N-squared theta join: "
        "the probe explodes to 14 (not 27) neighbor cells so each unordered "
        "pair is generated once and symmetrized inline (r13); the cell key "
        "partitions the shuffle and AQE splits skewed cells."
    ),
    "ann_lsh_bucketed": (
        "bucket equi-join against a broadcast query set; the corpus "
        "bucket table is an index artifact checkpointed once per "
        "(session, corpus) — repeat searches skip the corpus kernel."
    ),
    "ann_ivf_coarse": (
        "centroid table broadcasts; probe→inverted-list candidate join is "
        "an equi-join on the centroid id, scanning ~NPROBE/K of the "
        "corpus. Centroids AND inverted lists are trained-index "
        "artifacts, checkpointed once per (session, corpus)."
    ),
    "ann_ivf_store_probe": (
        "the PERSISTED store path: centroids/lists live as parquet "
        "(lists PARTITIONED BY list_label), the probed label set is a "
        "LITERAL isin on the partition column so the scan carries a "
        "static PartitionFilter — K−nprobe directories are never listed. "
        "Store build (train + assign + partitioned write) happens once "
        "per (session, corpus); the plan below is the warm probe."
    ),
    "knn_quantized_rescore": (
        "the int8 codes table is an index artifact checkpointed once per "
        "(session, corpus) — repeat searches scan the compact codes "
        "(persisted as an int8 projection in production: 4× smaller than "
        "float32), never the float store; prefilter is an exact integer "
        "dot against a broadcast query set, JVM codegen; top-M is one "
        "rank-limited per-qid window (Spark 4 WindowGroupLimit map-side "
        "prune — r13 replaced the salted two-phase form); only "
        "the |Q|×50 survivors touch the full-precision store, via broadcast "
        "joins of the tiny candidate list, with norms over survivors only."
    ),
    "ann_pq_topk": (
        "PQ assignment is an index artifact checkpointed once per "
        "(session, corpus) (Arrow-batched numpy encode — see "
        "_pq_assign_udf's rationale); repeat searches scan (vec_id, 8 "
        "cells) rows (NSUB bytes/vector in production — 32× compression) "
        "with a LUT-sum per row and one rank-limited per-qid window (Spark 4 "
        "WindowGroupLimit map-side prune — r13), zero joins until the |Q|×100 rerank candidates "
        "broadcast back to the full-precision store. Codebook and "
        "per-query LUTs are bounded driver metadata (16 + |Q| rows), "
        "also session-cached."
    ),
    "shard_concat_digest": (
        "packing window partitioned by the composite (lang, stream) key — "
        "stream = doc_id div STRIDE bounds every sort task to STRIDE docs; "
        "per-stream shard offsets come from a tiny per-stream aggregate "
        "broadcast back, so shard ids stay contiguous per lang without a "
        "global sort."
    ),
    "dedup_cc_clusters": (
        "min-label contraction seed (cliques/stars collapse in one round, "
        "path diameters halve) + alternating large-star/small-star: "
        "O(log^2 n) rounds regardless of component diameter; each round is "
        "two groupBy-min shuffles + two equi-joins on vertex ids with "
        "localCheckpoint lineage cuts. Convergence is an exact structural "
        "star-forest test (unique doc_a, disjoint sides — one small job "
        "over the checkpointed edges) checked BEFORE the first round too, "
        "so clique/star graphs converge at the seed with zero star "
        "rounds. LSH pair stage is salt-split with observe() split/skip "
        "metrics."
    ),
    "join_star_revenue": (
        "region⨝nation collapses to a broadcast dim; customer joins it and "
        "supplier left-semi-joins the same nation keys, so both are pruned "
        "to the region BEFORE the fact joins; order-date predicate pushed "
        "to the parquet scan."
    ),
    "text_unigram_logprob": (
        "corpus shuffles on token once (partial-aggregated counts); the "
        "vocabulary caps at top-V via TakeOrderedAndProject (per-partition "
        "heaps — never a global sort) so the model side is broadcast-sized "
        "for any token-tail shape; N/V ride along as a 1-row broadcast and "
        "the scoring join is map-side."
    ),
    "dedup_crosssource_overlap": (
        "the bounded LSH candidate-pair stream looks up doc_id→source "
        "twice against the corpus's 2-column projection (AQE broadcasts "
        "the pair side when it fits); final aggregate is O(#source^2) rows "
        "— the corpus itself never shuffles."
    ),
    "events_gapfill_interpolate": (
        "everything keys on user_id: (user, hour) aggregate, per-user "
        "span, then two frame-bounded window specs over ONE per-user sort; "
        "grid fan-out bounded by each user's own activity span. All "
        "arithmetic is exact integer cents with bigint HALF_UP "
        "discretization — engine-identical rounding by construction."
    ),
    "suppliers_kept_waiting": (
        "Q21 decorrelation: one orderkey-keyed fact join; the (order, "
        "supplier) aggregation and both per-order windows reuse that "
        "clustering in the shuffle regime (HashPartitioning(orderkey) "
        "satisfies the superset groupings), so the chained EXISTS + NOT "
        "EXISTS costs zero extra lineitem passes; s_name rollup runs on "
        "the collapsed frame."
    ),
    "suppliers_dominant_share": (
        "Q20 decorrelation: broadcast red-part filter, one (suppkey, "
        "partkey) fact aggregation with map-side partials; the correlated "
        "per-part total folds from the collapsed frame via a window, the "
        "threshold compares exact integer cents, supplier left-semi-joins "
        "the tiny dominant set."
    ),
    "supplier_top_revenue": (
        "Q15 shape: the fact scans/shuffles ONCE into the per-supplier "
        "revenue frame; max-of-view is a 1-row broadcast scalar crossJoin "
        "and the equality filter compares exact integer cents (no float "
        "tie-drop); date bounds pushed to the scan."
    ),
    "shipclass_priority_counts": (
        "Q12 shape: both priority branches fold into one aggregation as "
        "sum(when(...)) — a single fact join and a 3-row exchange instead "
        "of one filtered pass per branch."
    ),
    "forecast_revenue_change": (
        "Q6: all three predicates pushed to the scan (footer-stat row-group "
        "skipping carries the query at scale); 4-column ReadSchema; zero "
        "joins, 1-row exchange."
    ),
    "nation_market_share": (
        "Q8: region prunes customers through broadcast dims before the "
        "fact joins; CASE numerator shares the denominator's aggregation; "
        "supplier join unforced (AQE broadcast while it fits)."
    ),
    "returned_item_top_customers": (
        "Q10: returnflag + quarter pushed to both fact scans, aggregate-"
        "then-join keeps dims at |customers-with-returns| rows, top-20 via "
        "TakeOrderedAndProject."
    ),
    "dedup_semantic_clusters": (
        "self-join keys on the cluster id (bounded quadratic by cluster "
        "size — the SemDeDup cost model); Arrow pair-cosine kernel; both "
        "census aggregates collapse to K rows before the final join."
    ),
    "orders_scd2_snapshot": (
        "change-flag, segment-number and interval windows share one "
        "(custkey, date, key) sort → a single exchange feeds chained "
        "Window operators; island aggregation reuses the custkey "
        "clustering. Per-partition window state is one row."
    ),
    "text_bm25_search": (
        "inverted-index build is one token-stream shuffle with map-side "
        "partial TFs; query terms + (N, avgdl) scalars broadcast, so "
        "scoring touches only query-term postings; top-k is "
        "TakeOrderedAndProject — corpus-sized frames never join each "
        "other, no global sort."
    ),
    "events_anomaly_zscore": (
        "RANGE (not ROWS) trailing frame over integer hours, so inactive "
        "hours do not stretch the baseline; one shuffle to (user, hour) "
        "counts and the window reuses the user clustering with O(frame) "
        "running state."
    ),
    "dedup_substring_span": (
        "positional shingle inverted index (one shuffle); the occurrence "
        "filter drops boilerplate shingles so bucket match fan-out is "
        "bounded at CAP^2; diagonal run detection is a window partitioned "
        "by (pair, diagonal) — no suffix arrays, no global sort."
    ),
    "graph_pagerank_fixed": (
        "one groupBy-sum shuffle per round keyed on the destination "
        "vertex (map-side partials); vertex count broadcasts; plan grows "
        "linearly in the fixed round count, no checkpoint needed."
    ),
    "graph_triangle_count": (
        "degree orientation bounds out-adjacency at O(sqrt(m)) before the "
        "wedge self-join; the close is a two-key equi-join against the "
        "canonical edge set — no OR-condition nested loop."
    ),
    "events_session_transitions": (
        "lead window partitions by user (bounded sort tasks); bigram "
        "counts partial-aggregate to <= |types|^2 rows and the "
        "normalizing window runs on that tiny frame only."
    ),
    "events_twap": (
        "weighted sum in exact integer cents*us — bigint accumulation is "
        "order-independent, one user-partitioned window + one "
        "partial-aggregated groupBy."
    ),
    "events_attribution_last_touch": (
        "ignorenulls carry-forward over a 1-PRECEDING user frame: one "
        "user-keyed shuffle, no per-purchase range join; rollup "
        "partial-aggregates to |channels| rows."
    ),
    "skew_heavy_hitters": (
        "grand total reduced to a one-row broadcast instead of an "
        "unpartitioned window over the key frame; top-N collapses to "
        "TakeOrderedAndProject."
    ),
    "orders_shipping_priority": (
        "segment-pruned customer side broadcasts; date predicates pushed "
        "to both fact scans; top-10 is per-partition heaps + a 10-row "
        "driver merge."
    ),
    "customer_ltv_cohort": (
        "cohort join keys on o_custkey — the clustering the per-customer "
        "min shuffle already produced; revenue in exact cents."
    ),
    "docs_length_histogram": (
        "map-only bucketing; groupBy key space is |langs| x |buckets| so "
        "the exchange carries near-constant partial states."
    ),
    "embedding_dim_stats": (
        "posexplode map-side expand, one partial-aggregated groupBy with "
        "exactly DIM output rows — shuffle size is DIM x tasks regardless "
        "of corpus size."
    ),
    "cdc_upsert_apply": (
        "both sides reduce to one row per key before the full-outer "
        "merge, so the join shuffles key-state rows, never raw orders; "
        "per-key latest via max_by over a unique bigint order."
    ),
    "nation_trade_volume": (
        "nation participates twice as independently-broadcast aliases; "
        "the only wide exchange is lineitem⋈orders on the orderkey; "
        "revenue accumulates in exact 1e-4-dollar bigints."
    ),
    "events_dau_mau": (
        "one distinct shuffle to (month, day, user) rows, then a "
        "month rollup with two-stage mergeable exact count-distincts "
        "— no window, no driver state."
    ),
    "promo_revenue_share": (
        "part dim broadcasts (p_partkey + p_type after pruning) so the "
        "fact never shuffles for the join; one month-keyed partial-agg "
        "rollup; promo share computed via the exact-integer "
        "round-half-up trick, no float-rounding boundary."
    ),
    "disjunctive_predicate_revenue": (
        "the OR spans both tables so it cannot push below the join; one "
        "broadcast hash join with the residual disjunction inside the "
        "join's codegen stage — no union-of-joins, no cross join."
    ),
    "orders_exists_semi": (
        "EXISTS decorrelated to a left-semi hash join on l_orderkey with "
        "the shipdate comparison as the join residual — existence "
        "short-circuits per probe row, lineitem never duplicates orders."
    ),
    "customer_order_distribution": (
        "left-outer custkey join keeps zero-order customers; both "
        "rollups mergeable, second exchange is ~|distinct N| rows."
    ),
    "customers_above_avg_no_orders": (
        "1-row scalar threshold broadcast (BroadcastNestedLoopJoin over "
        "one row, not a cartesian), left-anti join on custkey with a "
        "date-pruned narrow build side, exact-cent balances."
    ),
    "parts_supplier_breadth": (
        "brand exclusion prunes at the part scan, pruned dim broadcasts; "
        "COUNT DISTINCT plans as expand + two-stage agg so the exchange "
        "carries deduped (brand,size,suppkey) triples, not the fact."
    ),
    "docs_token_chunking": (
        "map-only: tokenize once, explode bounded sequence of window "
        "starts, slice per window — no groupBy/join/window; the single "
        "exchange is fan_out's few-files repartition, absent on a "
        "well-split production scan. Row fan-out bounded by "
        "ceil(len/stride) per doc."
    ),
    "agg_grouping_sets": (
        "one Expand (3 rows per input, one per grouping set) into a "
        "single partial-aggregated exchange — not three unioned scans; "
        "grouping() ids disambiguate margin NULLs."
    ),
    "text_tfidf_top_terms": (
        "one (doc,term) count shuffle; df folds the same frame to "
        "|vocab| rows; term-keyed join back (stopword-skewed — AQE "
        "splits); top-k via doc-partitioned row_number, no global sort; "
        "weights exact integers (tf*1e6 div df), no ln()."
    ),
    "window_ntile_buckets": (
        "one window shuffle on the ~5-value priority key (bounded "
        "per-partition sorts, skew-prone — AQE splits), then a "
        "partial-aggregated rollup to |priorities|x4 rows; ntile ties "
        "break on o_orderkey so both engines agree."
    ),
    "metrics_unpivot_long": (
        "rotate AFTER aggregating: one partial-agg exchange to |flags| "
        "rows, then the unpivot Expand runs on that tiny frame with "
        "zero exchanges — melting the raw fact first would 3x the "
        "shuffled volume."
    ),
    "supplier_value_share_having": (
        "aggregate once; the global total re-reduces the <=25-row "
        "per-nation frame (never a second fact scan) and broadcasts "
        "back; the share test is integer cents*1e4 > total*bp — no "
        "float division anywhere."
    ),
    "orders_big_customer_detail": (
        "one custkey groupBy in exact cents; HAVING shrinks to the "
        "whale set, which Catalyst broadcasts on statistics (no hard "
        "hint: AQE can fall back to a shuffle join when the set "
        "outgrows the threshold) — no second fact shuffle; a "
        "window-sum formulation would shuffle the whole fact."
    ),
    "lineitem_below_avg_qty": (
        "correlated avg decorrelated to a partkey aggregate joined "
        "back; threshold is integer qty_cents*5*n < sum — no float "
        "average; both join sides share partkey partitioning from the "
        "aggregate."
    ),
    "window_percent_rank_exact": (
        "rank and partition count share one nation-keyed exchange "
        "(same partition spec); relative positions emitted as exact "
        "integer micro-units — built-in percent_rank/cume_dist divide "
        "in doubles and can differ in the last bits across engines."
    ),
    "set_multiset_ops": (
        "Catalyst rewrites INTERSECT/EXCEPT ALL to per-side count "
        "aggregates + a multiplicity join + generate — one value-keyed "
        "shuffle per side, no cartesian; final counts reduce to 2 rows."
    ),
}

# round-3 additions audited alongside the headline set: not benched (the
# headline total stays comparable round-over-round) but plan-documented
EXTRA = [
    "events_retention_cohorts",
    "events_funnel_conversion",
    "embedding_quantize_int8",
    "text_unigram_logprob",
    "dedup_crosssource_overlap",
    "events_gapfill_interpolate",
    "orders_scd2_snapshot",
    "text_bm25_search",
    "events_anomaly_zscore",
    "dedup_substring_span",
    "graph_pagerank_fixed",
    "graph_triangle_count",
    "events_session_transitions",
    "events_twap",
    "events_attribution_last_touch",
    "skew_heavy_hitters",
    "orders_shipping_priority",
    "customer_ltv_cohort",
    "docs_length_histogram",
    "embedding_dim_stats",
    "cdc_upsert_apply",
    "nation_trade_volume",
    "events_dau_mau",
    "promo_revenue_share",
    "disjunctive_predicate_revenue",
    # round-4 additions
    "orders_exists_semi",
    "customer_order_distribution",
    "customers_above_avg_no_orders",
    "parts_supplier_breadth",
    "docs_token_chunking",
    "agg_grouping_sets",
    "text_tfidf_top_terms",
    "window_ntile_buckets",
    "metrics_unpivot_long",
    "supplier_value_share_having",
    "orders_big_customer_detail",
    "lineitem_below_avg_qty",
    "window_percent_rank_exact",
    "set_multiset_ops",
    # round-5 additions
    "suppliers_kept_waiting",
    "suppliers_dominant_share",
    "supplier_top_revenue",
    "shipclass_priority_counts",
    "forecast_revenue_change",
    "nation_market_share",
    "returned_item_top_customers",
    "dedup_semantic_clusters",
    "agg_exact_median_groups",
    "fuzzy_name_match_pairs",
    # round-6 additions
    "fuzzy_name_match_blocked",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_profit_rollup",
    "tree_rollup_recursive",
    # round-9 additions (exactness probes — trivial aggregates, audited
    # so the doc shows they stay map-side-partial and shuffle-minimal)
    "probe_signed_money_round",
    "probe_half_up_wide_units",
    "probe_wide_money_sum",
]


def audit(sf_dir: str) -> str:
    from bench import HEADLINE
    from proteofav_spark.queries import all_queries
    from proteofav_spark.session import get_spark

    spark = get_spark("plan_audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    # include_retired: the audit list predates the r9 retirements and
    # retired twins still run in bench — keep auditing their plans
    qs = all_queries(include_retired=True)
    out = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Auto-generated by `tools/plan_audit.py` at `{sf_dir}`. For each",
        "query: what reached the Parquet scan (column pruning + pushed",
        "filters), how many exchanges the plan has, which joins broadcast,",
        "and how much of the pipeline runs inside whole-stage codegen.",
        "",
    ]
    simple = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    for name in HEADLINE + EXTRA:
        df = qs[name](spark, sf_dir)
        # collect() executes THIS DataFrame's queryExecution (count() would
        # build a separate one), so AQE finalizes and codegen ids appear
        df.collect()
        qe = df._jdf.queryExecution()
        full = qe.explainString(mode)
        # operator counts come from the FINAL adaptive tree only (the
        # "Initial Plan" section repeats every operator); scan details are
        # deduped, since initial and final plans share the same scans
        tree = full.split("Initial Plan")[0]
        splan = qe.explainString(simple).split("Initial Plan")[0]
        # greedy to end-of-line: nested types (array<float>) contain '>'
        scans = list(dict.fromkeys(re.findall(r"ReadSchema: struct<(.*)>", full)))
        pushed = list(dict.fromkeys(
            p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", full) if p
        ))
        n_ex = len(re.findall(r"\bExchange\b", tree))
        n_bhj = len(re.findall(r"BroadcastHashJoin", tree))
        n_smj = len(re.findall(r"SortMergeJoin", tree))
        # whole operator names only — 'ArrowEvalPython' must count once,
        # not once for 'ArrowEval' plus once for 'Python'
        n_py = len(re.findall(r"ArrowEvalPython|BatchEvalPython", tree))
        n_wsc = len(set(re.findall(r"\*\((\d+)\)", splan)))
        out.append(f"## {name}")
        out.append("")
        out.append(
            f"- exchanges: {n_ex} | broadcast joins: {n_bhj} | "
            f"sort-merge joins: {n_smj} | wholestage-codegen spans: {n_wsc} | "
            f"python operators: {n_py}"
        )
        for s in scans:
            out.append(f"- scan schema: `{s[:160]}`")
        for p in pushed:
            out.append(f"- pushed filters: `{p[:160]}`")
        note = SCALE_NOTES.get(name)
        if note:
            out.append(f"- scale note: {note}")
        out.append("")
    return "\n".join(out)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    text = audit(sf)
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as f:
        f.write(text + "\n")
    print(f"wrote {path} ({len(text.splitlines())} lines)")
