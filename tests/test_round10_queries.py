"""Semantic invariants for the round-10 additions: the persisted IVF
store's driver-facing probe (ann_ivf_store_probe) and the Z-order lake
round-trip (lake_zorder_roundtrip). The DuckDB oracles pin cross-engine
value equality; these tests pin the properties the oracles can't see —
self-retrieval through the PHYSICAL store, exact agreement between the
store probe and the session-index arithmetic, round-trip row fidelity of
the clustered lake, and the Z-key's bit-interleave structure."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ann_ivf_store_probe
# ---------------------------------------------------------------------------


def test_store_probe_retrieves_self_at_rank_one(spark):
    """A corpus vector probing the persisted store must find ITSELF at
    rk 1 with cosine 1.0 — its own list is always its nearest probed
    cell, and nothing in the probed partitions can outscore cosine 1.
    This is the retrieval-index contract the docstring states (no
    self-exclusion), and it fails loudly if the partition-pruned scan
    ever drops the query's own list."""
    from proteofav_spark.queries import all_queries

    rows = all_queries()["ann_ivf_store_probe"](spark, SF).collect()
    assert rows
    tops = {r["qid"]: r for r in rows if r["rk"] == 1}
    assert set(tops) == {0, 1, 2}
    for qid, r in tops.items():
        assert r["vec_id"] == qid
        assert r["cosine"] == pytest.approx(1.0, abs=1e-6)
    # full contract shape: 5 ranked rows per query, ranks 1..5
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r["rk"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_store_probe_matches_fresh_unpruned_rescore(spark, tmp_path):
    """The partition-pruned store probe must equal a rescore that scans
    the WHOLE lists tree (no pruning) over the same probed labels —
    i.e. pruning changes I/O, never results. Built fresh in tmp_path so
    the pin is independent of the session cache."""
    from proteofav_spark.plans import ann_store

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "store")
    ann_store.build_ivf_store(e, path)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pruned = sorted(
        map(tuple, ann_store.probe_ivf_store(spark, path, q).collect())
    )

    # unpruned twin: same probe selection, but candidates come from a
    # full lists scan joined on list_label (no isin partition filter)
    qn = q.select("qid", "qvec", ann_store._norm(F.col("qvec")).alias("qnorm"))
    cents = F.broadcast(spark.read.parquet(f"{path}/centroids"))
    from pyspark.sql import Window as W

    wq = W.partitionBy("qid").orderBy(F.desc("cc"), F.asc("list_label"))
    probes = (
        qn.crossJoin(cents)
        .select(
            "qid",
            "list_label",
            ann_store._cosine(
                F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")
            ).alias("cc"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= ann_store.NPROBE_DEFAULT)
        .select("qid", "list_label")
    )
    lists = spark.read.parquet(f"{path}/lists")
    wr = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    full = (
        lists.join(probes, "list_label")
        .join(qn, "qid")
        .select(
            "qid",
            "vec_id",
            ann_store._cosine(
                F.col("embedding"), F.col("qvec"), F.col("enorm"), F.col("qnorm")
            ).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= ann_store.TOPK_DEFAULT)
    )
    unpruned = sorted(map(tuple, full.collect()))
    assert pruned == unpruned


# ---------------------------------------------------------------------------
# lake_zorder_roundtrip
# ---------------------------------------------------------------------------


def test_zorder_roundtrip_preserves_the_filtered_row_set(spark):
    """The rows the query returns from the CLUSTERED files must be
    exactly the rows a direct filter on the original table yields —
    the range-partition/sort/write path may reorder, never lose,
    duplicate, or mutate."""
    from proteofav_spark.queries import all_queries

    got = all_queries()["lake_zorder_roundtrip"](spark, SF)
    direct = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(
            F.col("user_id").between(2, 11) & F.col("value").between(50.0, 150.0)
        )
        .select("event_id", "user_id", "value")
    )
    a = sorted((r["event_id"], r["user_id"], r["value"]) for r in got.collect())
    b = sorted(map(tuple, direct.collect()))
    assert a == b and len(a) > 0


def test_zkey_interleave_structure(spark):
    """Structural pin on the Morton key: 32 bits wide (16 per
    dimension), even bits carry user_id, odd bits carry value — so
    de-interleaving the key recovers each dimension's quantized value
    exactly. Catches any drift in morton_col's bit layout that the
    value-hash oracle would also catch, but with a readable failure."""
    from proteofav_spark.queries import all_queries

    rows = all_queries()["lake_zorder_roundtrip"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    b = ev.agg(
        F.min(F.col("user_id").cast("double")).alias("lo_u"),
        F.max(F.col("user_id").cast("double")).alias("hi_u"),
        F.min(F.col("value").cast("double")).alias("lo_v"),
        F.max(F.col("value").cast("double")).alias("hi_v"),
    ).collect()[0]
    top = (1 << 16) - 1
    span_u = (b["hi_u"] - b["lo_u"]) or 1.0
    span_v = (b["hi_v"] - b["lo_v"]) or 1.0
    for r in rows:
        z = r["zkey"]
        assert 0 <= z < (1 << 32)
        qu = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        qv = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        exp_u = min(top, max(0, int((r["user_id"] - b["lo_u"]) / span_u * top)))
        exp_v = min(top, max(0, int((r["value"] - b["lo_v"]) / span_v * top)))
        assert qu == exp_u, (r["event_id"], qu, exp_u)
        assert qv == exp_v, (r["event_id"], qv, exp_v)


# ---------------------------------------------------------------------------
# remove_partial_residues: the stateful dup-seq recurrence (review r10)
# ---------------------------------------------------------------------------


def _atom_rows(runs):
    """Build synthetic atom rows: runs = [(comp, seq, atoms)] in file
    order, one tail residue appended by callers when the last-run
    exemption would otherwise mask the case under test."""
    rows, ln = [], 0
    for comp, seq, atoms in runs:
        for a in atoms:
            rows.append(("ATOM", comp, seq, a, ln))
            ln += 1
    return rows


def _survivor_seqs(spark, runs):
    from proteofav_spark.operators.structures import remove_partial_residues

    df = spark.createDataFrame(
        _atom_rows(runs),
        "group_PDB string, auth_comp_id string, auth_seq_id string,"
        " auth_atom_id string, line_no bigint",
    )
    out = remove_partial_residues(df)
    got = {
        (r["auth_comp_id"], r["auth_seq_id"])
        for r in out.select("auth_comp_id", "auth_seq_id").distinct().collect()
    }
    return sorted(got, key=lambda cs: (int(cs[1]), cs[0]))


GLY_FULL = ["N", "CA", "C", "O"]


def test_dup_seq_after_dropped_run_survives(spark):
    """Reference recurrence (proteofav/structures.py:457-473): a run
    dropped for MISSING atoms does not set next_res_for_rm, so a
    complete run repeating its seq_id SURVIVES. The pre-r10 stateless
    lag(_seq)==_seq rule wrongly dropped both."""
    runs = [
        ("GLY", "5", ["N", "CA"]),   # missing atoms -> dropped
        ("GLY", "5", GLY_FULL),      # dup seq of a DROPPED run -> kept
        ("GLY", "6", GLY_FULL),      # tail (last-run exemption holder)
    ]
    assert _survivor_seqs(spark, runs) == [("GLY", "5"), ("GLY", "6")]


def test_equal_seq_chain_alternates_drops(spark):
    """Three complete equal-seq runs: the reference drops only the
    SECOND (flag consumed by the drop, re-armed by the third boundary
    against a now-surviving predecessor... which is the last run and
    exempt). The stateless rule dropped runs 2 AND 3."""
    runs = [
        ("GLY", "7", GLY_FULL),
        ("ALA", "7", ["N", "CA", "C", "O", "CB"]),
        ("GLY", "7", GLY_FULL),
        ("GLY", "8", GLY_FULL),      # tail
    ]
    # run1 kept, run2 dropped (dup of survivor), run3 kept (dup of a
    # DROPPED run), tail kept
    assert _survivor_seqs(spark, runs) == [
        ("GLY", "7"),
        ("GLY", "8"),
    ]


def test_simple_dup_still_dropped(spark):
    """The common case the old rule got right must stay right: a
    complete run repeating a complete SURVIVOR's seq_id is dropped."""
    runs = [
        ("GLY", "9", GLY_FULL),
        ("ALA", "9", ["N", "CA", "C", "O", "CB"]),  # dup of survivor -> dropped
        ("GLY", "10", GLY_FULL),     # tail
    ]
    assert _survivor_seqs(spark, runs) == [("GLY", "9"), ("GLY", "10")]


def test_default_atom_sets_match_reference_exactly():
    """r10 review finding: AA_DEFAULT_ATOMS carried chemically-complete
    sets where the reference deliberately omits terminal atoms
    (ARG NH1/NH2, TYR OH, TRP CH2 — frequently unresolved in density and
    NOT counted as missing by proteofav/library.py:221-242). Pin the
    whole table against the reference source so the sets can never
    drift apart again."""
    import ast

    from proteofav_spark.library import AA_DEFAULT_ATOMS

    src = open("/root/reference/proteofav/library.py").read()
    ref = None
    for node in ast.parse(src).body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if getattr(t, "id", None) == "aa_default_atoms":
                    ref = ast.literal_eval(node.value)
    assert ref is not None
    assert set(ref) == set(AA_DEFAULT_ATOMS)
    for aa in ref:
        assert sorted(ref[aa]) == sorted(AA_DEFAULT_ATOMS[aa]), aa


def test_partial_residue_removal_differential_vs_reference(spark):
    """DIFFERENTIAL parity: run the reference's own _remove_partial_residues
    (pure pandas; its unrelated scipy/requests_cache imports stubbed) on
    2w4o chain A and compare the surviving CA residue set row-for-row with
    our window-based pipeline. This is the strongest pin the fixture suite
    has — it executes the reference LOOP, not a recorded expectation, so
    any future drift in the run segmentation, the atom sets, the stateful
    dup-seq recurrence, or the last-run exemption fails here first."""
    import sys
    import types
    import warnings

    sys.modules.setdefault("scipy", types.ModuleType("scipy"))
    sys.modules.setdefault(
        "scipy.spatial", types.SimpleNamespace(cKDTree=None)
    )
    rc = types.ModuleType("requests_cache")
    rc.install_cache = lambda *a, **k: None
    sys.modules.setdefault("requests_cache", rc)
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from proteofav.structures import (
                _remove_partial_residues as ref_rpr,
                parse_mmcif_atoms as ref_parse,
            )

            t = ref_parse("/root/reference/tests/testdata/mmcif/2w4o.cif")
            t = t[t.pdbx_PDB_model_num == t.pdbx_PDB_model_num.iloc[0]]
            t = t[t.auth_asym_id == "A"]
            t = t[t.type_symbol != "H"]
            ref_out = ref_rpr(t.copy())
            ref_ca = sorted(
                ref_out[ref_out.auth_atom_id == "CA"].auth_seq_id.astype(str)
            )
    finally:
        sys.path.remove("/root/reference")

    from proteofav_spark.operators.structures import filter_structures
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    m = filter_structures(
        parse_mmcif_atoms(
            spark, "/root/reference/tests/testdata/mmcif/2w4o.cif"
        ),
        chains=("A",),
        atoms=("CA",),
        remove_partial_res=True,
    )
    ours = sorted(r["auth_seq_id"] for r in m.select("auth_seq_id").collect())
    assert ours == ref_ca and len(ours) == 254
