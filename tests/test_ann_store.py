"""Persisted IVF vector store: the partition-pruned 100 TB path the
session-cached index docstrings promise. Proofs: (a) the lists scan
carries the static partition filter (and Spark's derived DPP); (b)
results equal a numpy reference restricted to the probed cells."""

import numpy as np
from pyspark.sql import functions as F

from proteofav_spark.plans.ann_store import (
    build_ivf_store,
    probe_ivf_store,
)

SF = "/root/testdata/sf0.001"


def test_ivf_store_partition_pruned_search(spark, tmp_path):
    path = str(tmp_path / "ivf")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)

    n_labels = e.select("label").distinct().count()
    queries = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    nprobe, topk = 2, 5
    out = probe_ivf_store(spark, path, queries, nprobe=nprobe, topk=topk)
    rows = out.collect()

    # (a) the lists scan carries a static partition filter over at most
    # |queries| * nprobe labels — the FileSourceScan prunes the other
    # directories at listing time (inputFiles() reflects the unpruned
    # relation, so the scan node's PartitionFilters is the evidence)
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"list_label#\d+ IN \(([^)]+)\)", plan)
    assert m and "PartitionFilters" in plan, plan
    probed_labels = {int(x) for x in m.group(1).split(",")}
    assert 0 < len(probed_labels) <= 3 * nprobe < n_labels

    # (b) numpy reference: same centroid training, same probe rule,
    # same rounding — results must match exactly
    data = {r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
            for r in e.collect()}
    by_label = {}
    for vid, (vec, lbl) in data.items():
        by_label.setdefault(lbl, []).append(vid)
    cents = {
        lbl: np.round(
            np.mean([np.array(data[v][0], dtype=np.float64) for v in vids], axis=0), 6
        )
        for lbl, vids in by_label.items()
    }
    # assignment as the store computes it (cosine to centroid, argmax,
    # ties to smaller label)
    assign = {}
    for vid, (vec, _) in data.items():
        scored = sorted(
            (
                (round(float(vec @ c) / (np.linalg.norm(vec) * np.linalg.norm(c)), 6), -lbl)
                for lbl, c in cents.items()
            ),
            reverse=True,
        )
        assign[vid] = -scored[0][1]
    got = {}
    for r in rows:
        got.setdefault(r["qid"], []).append((r["rk"], r["vec_id"], r["cosine"]))
    for qid in (0, 1, 2):
        qv = data[qid][0]
        probes = sorted(
            (
                (round(float(qv @ c) / (np.linalg.norm(qv) * np.linalg.norm(c)), 6), -lbl)
                for lbl, c in cents.items()
            ),
            reverse=True,
        )[:nprobe]
        probed = {-p[1] for p in probes}
        cand = [v for v, lbl in assign.items() if lbl in probed]
        ranked = sorted(
            (
                (
                    -round(float(qv @ data[v][0]) / (np.linalg.norm(qv) * np.linalg.norm(data[v][0])), 6),
                    v,
                )
                for v in cand
            ),
        )[:topk]
        expect = [(i + 1, v, -c) for i, (c, v) in enumerate(ranked)]
        assert sorted(got[qid]) == [(rk, v, round(c, 6)) for rk, v, c in expect], qid

    # (c) Spark ALSO derives a dynamic-pruning expression from the
    # probe join on the partition column — both pruning mechanisms
    # (static literal isin + DPP) are active on the lists scan
    assert "dynamicpruningexpression" in plan


def test_probe_accepts_string_ids(spark, tmp_path):
    """The probe derives its (qid, list_label) literal-frame schema from
    the inputs, so non-integer ids — e.g. document-hash qids — work end
    to end, matching what the store itself already persists."""
    path = str(tmp_path / "ivf_str")
    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
        "embedding",
        "label",
    )
    build_ivf_store(e, path)
    queries = e.where(F.col("vec_id") == "doc-5").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    rows = probe_ivf_store(spark, path, queries, nprobe=2, topk=3).collect()
    assert rows and all(r["qid"] == "doc-5" for r in rows)
    # the query vector itself lives in a probed cell -> rank-1 self hit
    assert ("doc-5", 1.0) in {(r["vec_id"], r["cosine"]) for r in rows}


def test_incremental_near_dups_flags_known_vector(spark, tmp_path):
    """A batch containing an exact copy of a corpus vector must flag it
    at cosine 1.0 against that corpus_id; a fresh random-ish vector far
    from the corpus flags nothing."""
    from proteofav_spark.plans.ann_store import incremental_near_dups

    path = str(tmp_path / "ivf2")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)
    known = e.where(F.col("vec_id") == 7).collect()[0]["embedding"]
    far = [1000.0 if i == 0 else 0.0 for i in range(len(known))]
    batch = spark.createDataFrame(
        [(100000, known), (100001, far)],
        "vec_id long, embedding array<float>",
    )
    out = incremental_near_dups(spark, path, batch, nprobe=3, tau=0.95).collect()
    flagged = {(r["new_id"], r["corpus_id"]) for r in out}
    assert (100000, 7) in flagged
    exact = [r["cosine"] for r in out if (r["new_id"], r["corpus_id"]) == (100000, 7)]
    assert exact == [1.0]
    # the far vector must flag NOTHING: its true max cosine against the
    # whole corpus is below tau (verified driver-side, so the negative
    # assertion is meaningful, not a vacuous filter restatement)
    corpus = [np.array(r["embedding"], dtype=np.float64) for r in e.collect()]
    fv = np.array(far, dtype=np.float64)
    best = max(
        float(fv @ v) / (np.linalg.norm(fv) * np.linalg.norm(v)) for v in corpus
    )
    assert best < 0.95
    assert not any(r["new_id"] == 100001 for r in out)


def test_skewed_append_triggers_split_and_probes_still_prune(spark, tmp_path):
    """Maintenance path: appends concentrated on one centroid push its
    list over budget; the skew report flags exactly that list; rebalance
    splits it into two non-empty children (old label + one fresh label);
    and the probe afterwards still partition-prunes and still finds an
    exact self-match inside the split region."""
    from proteofav_spark.plans.ann_store import (
        append_ivf_store,
        ivf_list_stats,
        ivf_skew_report,
        rebalance_ivf_store,
    )

    path = str(tmp_path / "ivf_maint")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)

    base = {r["list_label"]: r["n_rows"] for r in ivf_list_stats(spark, path).collect()}
    hot = max(base, key=lambda l: (base[l], -l))
    m = base[hot]

    # 3 appended copies of the hot list's members (new ids, identical
    # vectors -> deterministic same-list assignment): list grows to 4m
    members = spark.read.parquet(f"{path}/lists").where(
        F.col("list_label") == hot
    )
    qid = members.select(F.min("vec_id")).collect()[0][0]
    for i in (1, 2, 3):
        batch = members.select(
            (F.col("vec_id") + 100000 * i).alias("vec_id"), "embedding"
        )
        append_ivf_store(spark, path, batch)

    budget = 2 * m
    rep = ivf_skew_report(spark, path, row_budget=budget)
    assert rep["hot"] == [hot]
    assert rep["max"] == 4 * m and rep["max_label"] == hot

    res = rebalance_ivf_store(spark, path, row_budget=budget)
    assert list(res["split"]) == [hot] and not res["unsplit"]
    new_label = res["split"][hot]

    after = {r["list_label"]: r["n_rows"] for r in ivf_list_stats(spark, path).collect()}
    # a real two-way split: both children non-empty, members conserved
    assert after[hot] + after[new_label] == 4 * m
    assert 0 < after[hot] < 4 * m and 0 < after[new_label] < 4 * m
    # untouched lists unchanged by the dynamic-partition overwrite
    for lbl, n in base.items():
        if lbl != hot:
            assert after[lbl] == n
    # centroid table gained exactly the one fresh label
    cents = spark.read.parquet(f"{path}/centroids")
    assert cents.count() == len(base) + 1
    assert cents.where(F.col("list_label") == new_label).count() == 1

    # probe a vector FROM the split region: still pruned, still found
    queries = e.where(F.col("vec_id") == qid).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = probe_ivf_store(spark, path, queries, nprobe=2, topk=8)
    rows = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_label" in plan
    # the vector and its 3 appended clones all sit in a probed child
    exact = {r["vec_id"] for r in rows if r["cosine"] == 1.0}
    assert qid in exact


def test_rebalance_leaves_unsplittable_duplicate_list_intact(spark, tmp_path):
    """A hot list of exact duplicates cannot split geometrically (the
    two seeds coincide, ties all break to child 0): rebalance must
    report it under 'unsplit' and leave the store bit-for-bit usable —
    same label set, same membership, probes still work. This pins the
    one-sided-split guard (a naive remap would strand every member
    under a new label while the old partition kept its stale copy)."""
    from proteofav_spark.plans.ann_store import (
        append_ivf_store,
        ivf_list_stats,
        rebalance_ivf_store,
    )

    path = str(tmp_path / "ivf_dup")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)
    base = {r["list_label"]: r["n_rows"] for r in ivf_list_stats(spark, path).collect()}
    hot = min(base)  # any list; we make it hot with pure duplicates
    one = spark.read.parquet(f"{path}/lists").where(
        F.col("list_label") == hot
    ).orderBy("vec_id").limit(1).collect()[0]
    n_dups = 3 * max(base.values())
    clones = spark.range(n_dups).select(
        (F.col("id") + 500000).alias("vec_id"),
        F.lit(one["embedding"]).alias("embedding"),
    )
    append_ivf_store(spark, path, clones)

    res = rebalance_ivf_store(spark, path, row_budget=max(base.values()) * 2)
    # the duplicate pile may or may not split depending on what else sat
    # in the list; the invariants that must hold either way:
    after = {r["list_label"]: r["n_rows"] for r in ivf_list_stats(spark, path).collect()}
    assert sum(after.values()) == sum(base.values()) + n_dups  # no dup/loss
    cents = spark.read.parquet(f"{path}/centroids")
    assert cents.count() == len(after)  # every list has exactly one centroid
    assert set(res["unsplit"]).isdisjoint(res["split"])
    for lbl in res["unsplit"]:
        assert after[lbl] == base[lbl] + (n_dups if lbl == hot else 0)
    # the store still probes end to end
    q = e.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    assert probe_ivf_store(spark, path, q, nprobe=2, topk=3).count() > 0


def test_ingest_with_dedup_appends_only_novel(spark, tmp_path):
    """Composed ingest: a batch mixing an exact store duplicate, an
    in-batch exact pair, an in-batch NEAR-dup (same centroid cell,
    cosine above tau but not byte-identical), a zero-norm degenerate
    and a genuinely novel vector ingests exactly the novel content with
    an honest per-category census; re-ingesting the same batch ingests
    nothing (idempotent increment, degenerates included)."""
    from proteofav_spark.plans.ann_store import (
        build_ivf_store,
        ingest_with_dedup,
        ivf_list_stats,
    )

    path = str(tmp_path / "ivf_ingest")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)
    n0 = sum(r["n_rows"] for r in ivf_list_stats(spark, path).collect())

    known = e.where(F.col("vec_id") == 7).collect()[0]["embedding"]
    novel = [100.0 + i for i in range(len(known))]
    near = [x * 1.0000001 for x in novel]  # cosine ~1, not identical
    zero = [0.0] * len(known)
    batch = spark.createDataFrame(
        [
            (900001, known),          # exact dup of the store
            (900002, novel),          # novel (kept: smallest id of group)
            (900003, novel),          # in-batch EXACT duplicate
            (900004, near),           # in-batch NEAR duplicate
            (900005, zero),           # degenerate: no cosine identity
        ],
        "vec_id long, embedding array<float>",
    )
    res = ingest_with_dedup(spark, path, batch, nprobe=3, tau=0.999)
    assert res == {
        "n_batch": 5,
        "n_degenerate": 1,
        "n_inbatch_dups": 2,
        "n_dups_vs_store": 1,
        "n_ingested": 1,
    }
    n1 = sum(r["n_rows"] for r in ivf_list_stats(spark, path).collect())
    assert n1 == n0 + 1

    # idempotent re-ingest: the just-appended vector is now a store dup;
    # the zero vector must be dropped again, not re-appended
    res2 = ingest_with_dedup(spark, path, batch, nprobe=3, tau=0.999)
    assert res2["n_ingested"] == 0 and res2["n_degenerate"] == 1
    n2 = sum(r["n_rows"] for r in ivf_list_stats(spark, path).collect())
    assert n2 == n1


def test_compaction_merges_small_files_probes_unchanged(spark, tmp_path):
    """The ingest-cadence maintenance path: per-batch appends accumulate
    small files inside each list partition; compact_ivf_store merges
    them (per-list file sizing in one job), leaves already-compact
    lists untouched, conserves every row, and changes NOTHING a probe
    can observe — same results, partition pruning + DPP still active."""
    from proteofav_spark.plans.ann_store import (
        append_ivf_store,
        compact_ivf_store,
        ivf_file_stats,
        ivf_list_stats,
    )

    path = str(tmp_path / "ivf_compact")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)

    # 4 small append batches -> every touched partition gains >=4 files
    for i in (1, 2, 3, 4):
        batch = e.limit(20).select(
            (F.col("vec_id") + 100000 * i).alias("vec_id"), "embedding"
        )
        append_ivf_store(spark, path, batch)

    before_files = ivf_file_stats(path)
    before_rows = {
        r["list_label"]: r["n_rows"]
        for r in ivf_list_stats(spark, path).collect()
    }
    assert max(n for n, _ in before_files.values()) >= 4

    queries = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    before_probe = sorted(
        (r["qid"], r["rk"], r["vec_id"], r["cosine"])
        for r in probe_ivf_store(spark, path, queries, nprobe=2, topk=5).collect()
    )

    # generous target: every multi-file list should merge to ONE file
    res = compact_ivf_store(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert res["compacted"], res
    after_files = ivf_file_stats(path)

    for label, (nf, _nb) in before_files.items():
        if label in res["compacted"]:
            assert after_files[label][0] < nf
            assert after_files[label][0] == 1
        else:
            # skipped lists byte-identical (never rewritten)
            assert after_files[label] == before_files[label]

    # every row conserved per list
    after_rows = {
        r["list_label"]: r["n_rows"]
        for r in ivf_list_stats(spark, path).collect()
    }
    assert after_rows == before_rows

    # probe: identical results, pruning + DPP still fire on the scan
    out = probe_ivf_store(spark, path, queries, nprobe=2, topk=5)
    after_probe = sorted(
        (r["qid"], r["rk"], r["vec_id"], r["cosine"]) for r in out.collect()
    )
    assert after_probe == before_probe
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_label" in plan
    assert "dynamicpruningexpression" in plan


def test_rebalance_can_finish_with_compaction(spark, tmp_path):
    """rebalance_ivf_store(compact_target_file_bytes=...) runs the
    compaction pass in the same maintenance window and reports it."""
    from proteofav_spark.plans.ann_store import (
        append_ivf_store,
        ivf_file_stats,
        rebalance_ivf_store,
    )

    path = str(tmp_path / "ivf_maint2")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)
    for i in (1, 2, 3):
        batch = e.limit(15).select(
            (F.col("vec_id") + 100000 * i).alias("vec_id"), "embedding"
        )
        append_ivf_store(spark, path, batch)

    # row budget high enough that nothing splits: the compaction still runs
    res = rebalance_ivf_store(
        spark, path, row_budget=10**6,
        compact_target_file_bytes=64 * 1024 * 1024,
    )
    assert res["split"] == {} and "compaction" in res
    assert res["compaction"]["compacted"]
    files = ivf_file_stats(path)
    assert max(n for n, _ in files.values()) == 1


# ---------------------------------------------------------------------------
# Quantized probe: IVF partition pruning x SQ8 compressed scan
# ---------------------------------------------------------------------------


def _queries(e):
    return e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_quantized_probe_exact_with_unbounded_prefilter(spark, tmp_path):
    """With prefilter_m covering every probed-cell member the quantized
    probe must EQUAL probe_ivf_store row-for-row — same candidates, same
    6-dp cosine, same (cosine DESC, vec_id) ranks."""
    from proteofav_spark.plans.ann_store import probe_ivf_store_quantized

    path = str(tmp_path / "ivf")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)
    q = _queries(e)
    exact = sorted(map(tuple, probe_ivf_store(spark, path, q).collect()))
    quant = sorted(
        map(
            tuple,
            probe_ivf_store_quantized(
                spark, path, q, prefilter_m=10**6
            ).collect(),
        )
    )
    assert quant == exact and exact


def test_int_dot_kernel_bit_identical_to_jvm_fold(spark, tmp_path):
    """The Arrow int-dot kernel in the quantized prefilter must equal
    the JVM zip_with/aggregate fold row-for-row — exact integer
    arithmetic, no rounding envelope. Run over the real prefilter
    frame so the pin covers the production join shape."""
    from proteofav_spark.operators.llm_queries import int_dot_udf
    from proteofav_spark.plans.ann_store import (
        _codes_i8,
        _probe_selection,
    )

    path = str(tmp_path / "ivf")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)
    q, lists, probes = _probe_selection(spark, path, _queries(e), 4)
    qq = q.select("qid", _codes_i8(F.col("qvec")).alias("qcodes"))
    base = (
        lists.select("vec_id", "list_label", "codes")
        .join(F.broadcast(probes), "list_label")
        .join(F.broadcast(qq), "qid")
    )
    jvm = F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("qcodes"), lambda a, b: a.cast("bigint") * b
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    a = sorted(
        map(tuple, base.select("qid", "vec_id", jvm.alias("s")).collect())
    )
    b = sorted(
        map(
            tuple,
            base.select(
                "qid", "vec_id",
                int_dot_udf()(F.col("codes"), F.col("qcodes")).alias("s"),
            ).collect(),
        )
    )
    assert a == b and a


def test_quantized_probe_batch_path_equals_exact(spark, tmp_path):
    """The ADAPTIVE rescore's batch path (|Q|·prefilter_m over the
    literal-pushdown cap — the streaming-enrich shape): the composed
    lazy plan must equal probe_ivf_store row-for-row, exactly like the
    point-query literal path. 300 queries × m=50 = 15,000 > the 10k cap
    forces the lazy branch; m then raised to cover every probed cell so
    strict equality (not just recall) is the assertion."""
    from proteofav_spark.plans.ann_store import probe_ivf_store_quantized

    path = str(tmp_path / "ivf")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)
    q = e.where(F.col("vec_id") < 300).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = sorted(map(tuple, probe_ivf_store(spark, path, q).collect()))
    quant = sorted(
        map(
            tuple,
            probe_ivf_store_quantized(
                spark, path, q, prefilter_m=10**6
            ).collect(),
        )
    )
    assert quant == exact and len(exact) >= 300


def test_quantized_probe_compressed_scan_prunes_columns_and_partitions(
    spark, tmp_path
):
    """Plan evidence for BOTH stages. Prefilter (audited via the exposed
    lazy stage — the probe collects it, so it never appears in the
    returned plan): reads ONLY (vec_id, codes) from the pruned partitions
    — a codes-only ReadSchema, no float embedding bytes — under the
    static partition filter. Rescore (the returned plan): the float scan
    carries the literal survivor-id In(vec_id, ...) pushdown so
    row-group stats skip non-candidate float bytes (lists are written
    vec_id-sorted to make those stats selective)."""
    import re

    from proteofav_spark.plans.ann_store import (
        _quantized_prefilter,
        probe_ivf_store_quantized,
    )

    path = str(tmp_path / "ivf")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)

    def _fmt(df):
        df.collect()
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    _, _, topm = _quantized_prefilter(spark, path, _queries(e), 4, 50)
    pre = _fmt(topm)
    scans = re.findall(r"ReadSchema: struct<([^\n]*)>", pre)
    codes_scans = [s for s in scans if "codes:array<tinyint>" in s]
    assert codes_scans, scans
    assert all("embedding" not in s for s in codes_scans), codes_scans
    assert "PartitionFilters" in pre and re.search(
        r"list_label#\d+ IN \(", pre
    ), pre

    plan = _fmt(probe_ivf_store_quantized(spark, path, _queries(e)))
    assert re.search(r"PushedFilters: \[In\(vec_id", plan), plan
    assert "PartitionFilters" in plan and re.search(
        r"list_label#\d+ IN \(", plan
    ), plan
    assert "codes" not in plan  # prefilter never re-runs in the rescore


def test_quantized_probe_recall_and_store_lifecycle(spark, tmp_path):
    """Default prefilter_m: measured recall 1.0 vs the exact probe on the
    catalog corpus (floor 0.8 guards regressions). Codes survive append
    and rebalance+compaction (every list-rewrite path), and the quantized
    probe stays exactly equal to the exact probe with unbounded m after
    maintenance."""
    from proteofav_spark.plans.ann_store import (
        append_ivf_store,
        probe_ivf_store_quantized,
        rebalance_ivf_store,
    )

    path = str(tmp_path / "ivf")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_store(e, path)
    q = _queries(e)

    ex = {}
    for r in probe_ivf_store(spark, path, q).collect():
        ex.setdefault(r["qid"], set()).add(r["vec_id"])
    got = {}
    for r in probe_ivf_store_quantized(spark, path, q).collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = [len(got[k] & ex[k]) / len(ex[k]) for k in ex]
    assert sum(recalls) / len(recalls) >= 0.8, recalls

    # append + hot-list split + compaction must all preserve codes
    hot = e.where(F.col("vec_id") >= 400).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    append_ivf_store(spark, path, hot)
    rebalance_ivf_store(
        spark, path, row_budget=120, compact_target_file_bytes=1 << 20
    )
    lists = spark.read.parquet(f"{path}/lists")
    assert "codes" in lists.schema.fieldNames()
    assert lists.where(F.col("codes").isNull()).count() == 0
    exact = sorted(map(tuple, probe_ivf_store(spark, path, q).collect()))
    quant = sorted(
        map(
            tuple,
            probe_ivf_store_quantized(
                spark, path, q, prefilter_m=10**6
            ).collect(),
        )
    )
    assert quant == exact


def test_old_store_raises_then_backfill_enables_quantized_probe(
    spark, tmp_path
):
    """A pre-codes store (simulated by stripping the column and the meta
    flag) must raise a clear error from the quantized probe, keep appends
    schema-consistent (no codes written into the old layout), and upgrade
    in place via backfill_codes."""
    import pytest as _pytest

    from proteofav_spark.plans import ann_store as A

    path = str(tmp_path / "ivf")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    A.build_ivf_store(e, path)
    old = (
        spark.read.parquet(f"{path}/lists").drop("codes").localCheckpoint()
    )
    old.write.mode("overwrite").partitionBy("list_label").parquet(
        f"{path}/lists"
    )
    spark.createDataFrame(
        [(A._store_embed_type(spark, path),)], "embedding_type string"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    A._STORE_CODES_CACHE.pop(path, None)
    A._EMBED_TYPE_CACHE.pop(path, None)
    spark.catalog.refreshByPath(f"{path}/lists")
    spark.catalog.refreshByPath(f"{path}/meta")

    q = _queries(e)
    with _pytest.raises(ValueError, match="no SQ8 codes"):
        A.probe_ivf_store_quantized(spark, path, q).collect()
    # append into the OLD layout must not write a codes column
    A.append_ivf_store(
        spark,
        path,
        e.where(F.col("vec_id") >= 495).select(
            (F.col("vec_id") + 20_000).alias("vec_id"), "embedding"
        ),
    )
    assert "codes" not in spark.read.parquet(f"{path}/lists").schema.fieldNames()

    A.backfill_codes(spark, path)
    assert "codes" in spark.read.parquet(f"{path}/lists").schema.fieldNames()
    exact = sorted(map(tuple, probe_ivf_store(spark, path, q).collect()))
    quant = sorted(
        map(
            tuple,
            A.probe_ivf_store_quantized(
                spark, path, q, prefilter_m=10**6
            ).collect(),
        )
    )
    assert quant == exact


def test_backfill_rerun_repairs_crash_window_state(spark, tmp_path):
    """Crash-recovery contract of backfill_codes: if it dies AFTER the
    lists overwrite but BEFORE the meta write (its own write ordering),
    the store is fully coded but meta still says pre-codes — and an
    append routed by that stale flag writes NULL-codes rows into coded
    partitions. A rerun must (a) fill exactly the NULL codes, (b) flip
    the on-disk meta flag so OTHER sessions see a coded store, and
    (c) restore exact probe equality."""
    from proteofav_spark.plans import ann_store as A

    path = str(tmp_path / "ivf")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    A.build_ivf_store(e, path)
    # simulate the crash window: lists keep codes, meta loses the flag
    spark.createDataFrame(
        [(A._store_embed_type(spark, path),)], "embedding_type string"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    A._STORE_CODES_CACHE.pop(path, None)
    spark.catalog.refreshByPath(f"{path}/meta")
    # stale-flag append: writes code-less rows into the coded layout
    A.append_ivf_store(
        spark,
        path,
        e.where(F.col("vec_id") >= 495).select(
            (F.col("vec_id") + 30_000).alias("vec_id"), "embedding"
        ),
    )
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.where(F.col("codes").isNull()).count() == 5  # the damage

    A.backfill_codes(spark, path)
    # (a) NULLs repaired, coded rows untouched
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.where(F.col("codes").isNull()).count() == 0
    # (b) the ON-DISK flag is fixed — a fresh session must see it
    meta = spark.read.parquet(f"{path}/meta")
    assert "has_codes" in meta.schema.fieldNames()
    assert meta.collect()[0]["has_codes"] is True
    A._STORE_CODES_CACHE.pop(path, None)
    assert A._store_has_codes(spark, path) is True
    # (c) probe equality holds over the repaired store
    q = _queries(e)
    exact = sorted(map(tuple, probe_ivf_store(spark, path, q).collect()))
    quant = sorted(
        map(
            tuple,
            A.probe_ivf_store_quantized(
                spark, path, q, prefilter_m=10**6
            ).collect(),
        )
    )
    assert quant == exact


def test_backfill_rerun_with_fully_coded_lists_fixes_meta_cheaply(
    spark, tmp_path
):
    """The other crash shape: lists fully coded, meta stale, NO damaged
    appends — the rerun must fix meta WITHOUT rewriting any list file."""
    import glob
    import os

    from proteofav_spark.plans import ann_store as A

    path = str(tmp_path / "ivf")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    A.build_ivf_store(e, path)
    spark.createDataFrame(
        [(A._store_embed_type(spark, path),)], "embedding_type string"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    A._STORE_CODES_CACHE.pop(path, None)
    spark.catalog.refreshByPath(f"{path}/meta")

    files_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/lists/**/*.parquet", recursive=True)
    }
    A.backfill_codes(spark, path)
    files_after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/lists/**/*.parquet", recursive=True)
    }
    assert files_after == files_before  # no list rewrite
    A._STORE_CODES_CACHE.pop(path, None)
    assert A._store_has_codes(spark, path) is True


def test_append_survives_zero_row_meta(spark, tmp_path):
    """ADVICE r9: a meta directory that exists but yields ZERO rows (a
    concurrent meta rewrite caught mid-commit) must keep the cached
    flag and let the append proceed — the old ``collect()[0]`` raised
    IndexError and crashed every subsequent append."""
    from proteofav_spark.plans import ann_store as A

    path = str(tmp_path / "ivf")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    A.build_ivf_store(e, path)
    # pre-codes store with a correctly-cached False flag
    old = (
        spark.read.parquet(f"{path}/lists").drop("codes").localCheckpoint()
    )
    old.write.mode("overwrite").partitionBy("list_label").parquet(
        f"{path}/lists"
    )
    meta_schema = "embedding_type string, has_codes boolean"
    spark.createDataFrame(
        [(A._store_embed_type(spark, path), False)], meta_schema
    ).write.mode("overwrite").parquet(f"{path}/meta")
    A._STORE_CODES_CACHE[path] = False
    spark.catalog.refreshByPath(f"{path}/lists")

    # mid-commit rewrite: meta dir present, zero readable rows
    spark.createDataFrame([], meta_schema).write.mode("overwrite").parquet(
        f"{path}/meta"
    )
    A.append_ivf_store(  # must not raise
        spark,
        path,
        e.where(F.col("vec_id") < 3).select(
            (F.col("vec_id") + 40_000).alias("vec_id"), "embedding"
        ),
    )
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.where(F.col("vec_id") >= 40_000).count() == 3
    assert "codes" not in lists.schema.fieldNames()  # pre-codes layout kept
    # cold-cache load under the same zero-row meta: falls back to lists
    # schema inference instead of IndexError
    A._STORE_CODES_CACHE.pop(path, None)
    A._EMBED_TYPE_CACHE.pop(path, None)
    assert A._store_has_codes(spark, path) is False
