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
