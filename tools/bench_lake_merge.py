"""Bucketed-vs-unbucketed timing for the lake merge tree (VERDICT r10
#8): tests/test_lake.py proves the exchange-free PLAN on toy frames;
this gives the zero-exchange path a NUMBER at bench scale.

Synthesizes an sf0.1-sized structure lake (default 500 entries x 400
residues x 10 atoms = 2M atom rows + 200k-row DSSP and SIFTS sides —
the mmCIF:DSSP volume ratio of a real lake), then times the same
``lake_table_merger`` tree three ways:

  plain      — parquet sides, AQE defaults (what a user gets with no
               layout work: sort-merge joins with exchanges on both
               sides, or AQE broadcast if a side fits)
  plain-smj  — parquet sides, broadcast disabled (the honest 100 TB
               shape: at lake scale NO side fits in an executor, so
               this is the plan the bucketed layout competes against)
  bucketed   — all three sides staged once via write_bucketed_table on
               their (entry, resnum, chain) join keys, broadcast
               disabled; asserts the executed plan has ZERO Exchange

Staging cost (the bucketed writes) is reported separately, like the
index builds in SCALING_r*.json: it is the one-off layout investment
the per-query savings amortize against.

Usage: python tools/bench_lake_merge.py [entries] [residues] [atoms]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from proteofav_spark.plans.lake import write_bucketed_table  # noqa: E402
from proteofav_spark.plans.mergers import lake_table_merger  # noqa: E402
from proteofav_spark.session import get_spark  # noqa: E402

N_BUCKETS = 32
ATOM_KEYS = ("entry_id", "auth_seq_id_full", "auth_asym_id")
DSSP_KEYS = ("entry_id", "RES_FULL", "CHAIN_FULL")
SIFTS_KEYS = ("entry_id", "PDB_dbResNum", "PDB_dbChainId")


def synth_lake(spark, entries: int, residues: int, atoms_per_res: int):
    """Deterministic multi-entry lake sides keyed exactly like the real
    ingest (entry_id + chain + full residue number, string-typed)."""
    n_atoms = entries * residues * atoms_per_res
    base = spark.range(n_atoms)
    eid = F.concat(F.lit("e"), (F.col("id") / (residues * atoms_per_res))
                   .cast("long").cast("string"))
    res = ((F.col("id") / atoms_per_res).cast("long") % residues).cast("string")
    chain = F.lit("A")
    atoms = base.select(
        eid.alias("entry_id"),
        res.alias("auth_seq_id_full"),
        chain.alias("auth_asym_id"),
        (F.col("id") % 37).cast("double").alias("Cartn_x"),
        (F.col("id") % 41).cast("double").alias("Cartn_y"),
        F.lit("ATOM").alias("group_PDB"),
    )
    per_res = spark.range(entries * residues)
    eid_r = F.concat(F.lit("e"), (F.col("id") / residues).cast("long").cast("string"))
    res_r = (F.col("id") % residues).cast("string")
    dssp = per_res.select(
        eid_r.alias("entry_id"),
        res_r.alias("RES_FULL"),
        F.lit("A").alias("CHAIN_FULL"),
        (F.col("id") % 8).cast("string").alias("SS"),
        (F.col("id") % 200).cast("double").alias("ACC"),
    )
    sifts = per_res.select(
        eid_r.alias("entry_id"),
        res_r.alias("PDB_dbResNum"),
        F.lit("A").alias("PDB_dbChainId"),
        F.concat(F.lit("P"), (F.col("id") % 100).cast("string")).alias(
            "UniProt_dbAccessionId"
        ),
        (F.col("id") % residues + 1).cast("string").alias("UniProt_dbResNum"),
    )
    return atoms, dssp, sifts


def timed_merge(spark, atoms, dssp, sifts, n_runs: int = 3) -> tuple[float, str]:
    times = []
    plan = ""
    for _ in range(n_runs):
        t0 = time.perf_counter()
        merged = lake_table_merger(atoms, dssp_table=dssp, sifts_table=sifts)
        n = merged.count()
        times.append(time.perf_counter() - t0)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert n > 0
    return round(min(times), 3), plan


def main() -> None:
    entries = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    residues = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    apr = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("bench_lake_merge")
    import tempfile

    work = tempfile.mkdtemp(prefix="pfs_lakemerge_")
    out: dict = {
        "metric": "lake_merge_bucketed_vs_plain",
        "rows_atoms": entries * residues * apr,
        "rows_side": entries * residues,
        "n_buckets": N_BUCKETS,
    }
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        a, d, s = synth_lake(spark, entries, residues, apr)
        paths = {}
        for name, df in (("atoms", a), ("dssp", d), ("sifts", s)):
            p = os.path.join(work, name)
            df.write.parquet(p)
            paths[name] = p
        rd = {k: spark.read.parquet(v) for k, v in paths.items()}

        t_plain, _ = timed_merge(spark, rd["atoms"], rd["dssp"], rd["sifts"])
        out["plain_sec"] = t_plain

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t_smj, plan_smj = timed_merge(spark, rd["atoms"], rd["dssp"], rd["sifts"])
        out["plain_smj_sec"] = t_smj
        out["plain_smj_exchanges"] = plan_smj.count("Exchange")

        t0 = time.perf_counter()
        write_bucketed_table(rd["atoms"], "lkm_atoms", ATOM_KEYS,
                             n_buckets=N_BUCKETS, sort_cols=ATOM_KEYS)
        write_bucketed_table(rd["dssp"], "lkm_dssp", DSSP_KEYS,
                             n_buckets=N_BUCKETS, sort_cols=DSSP_KEYS)
        write_bucketed_table(rd["sifts"], "lkm_sifts", SIFTS_KEYS,
                             n_buckets=N_BUCKETS, sort_cols=SIFTS_KEYS)
        out["bucket_stage_sec"] = round(time.perf_counter() - t0, 3)

        t_bkt, plan_bkt = timed_merge(
            spark,
            spark.table("lkm_atoms"),
            spark.table("lkm_dssp"),
            spark.table("lkm_sifts"),
        )
        out["bucketed_sec"] = t_bkt
        out["bucketed_exchanges"] = plan_bkt.count("Exchange")
        assert out["bucketed_exchanges"] == 0, "bucketed plan shuffled!"
        assert "SortMergeJoin" in plan_bkt
        out["speedup_vs_smj"] = round(t_smj / t_bkt, 2)
        out["merges_to_amortize_staging"] = (
            round(out["bucket_stage_sec"] / max(t_smj - t_bkt, 1e-9), 1)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for t in ("lkm_atoms", "lkm_dssp", "lkm_sifts"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree("spark-warehouse", ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
