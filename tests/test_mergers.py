"""End-to-end merge tests — the P0 flagship query.

Mirror of the reference's tests/test_mergers.py:174-190: 2w4o chain A,
CA atoms only, mmCIF ⟕ DSSP ⟕ SIFTS = 278 rows; plus the BioUnit
(2pah_bio) suffixed-chain merge path.
"""

from pyspark.sql import functions as F

from proteofav_spark.operators.structures import select_structures
from proteofav_spark.plans.mergers import (
    Tables,
    TableMergerError,
    mmcif_dssp_table_merger,
    table_merger,
)
from proteofav_spark.sources.dssp import select_dssp
from proteofav_spark.sources.sifts import select_sifts
from proteofav_spark.sources.validation import select_validation


def test_merge_2w4o_chain_a_ca(spark, refdata):
    mmcif = select_structures(
        spark, f"{refdata}/mmcif/2w4o.cif",
        models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
    )
    dssp = select_dssp(
        spark, f"{refdata}/dssp/2w4o.dssp", chains=("A",), add_rsa_class=True
    )
    sifts = select_sifts(spark, f"{refdata}/sifts/2w4o.xml", chain_auth=("A",))

    merged = table_merger(mmcif_table=mmcif, dssp_table=dssp, sifts_table=sifts)
    rows = merged.orderBy("id").collect()
    assert len(rows) == 278  # reference tests/test_mergers.py:187-190
    first = rows[0]
    assert first["label_atom_id"] == "CA"
    assert first["CHAIN"] == "A"
    assert first["PDB_dbChainId"] == "A"
    assert first["UniProt_dbAccessionId"] is not None
    # joined DSSP and SIFTS residue numbers agree with the atom table
    assert first["RES_FULL"] == first["auth_seq_id_full"]
    assert first["PDB_dbResNum"] == first["auth_seq_id_full"]


def test_merge_full_six_table_shape(spark, refdata):
    mmcif = select_structures(
        spark, f"{refdata}/mmcif/2pah.cif",
        models="first", atoms=("CA",), lines=("ATOM",),
    )
    dssp = select_dssp(spark, f"{refdata}/dssp/2pah.dssp")
    sifts = select_sifts(spark, f"{refdata}/sifts/2pah.xml")
    validation = select_validation(
        spark, f"{refdata}/validation/2pah_validation.xml"
    )

    t = Tables()
    merged = t.merge(mmcif=mmcif, dssp=dssp, sifts=sifts, validation=validation)
    assert merged.count() > 0
    row = merged.orderBy("id").first()
    # chain level
    assert "label_asym_id" in merged.columns
    assert "CHAIN_FULL" in merged.columns
    assert "PDB_entityId" in merged.columns
    # residue level
    assert row["label_seq_id_full"] is not None
    assert row["RES"] == "118"
    assert row["PDB_dbResNum"] == "118"
    assert row["validation_resnum_full"] == "118"
    assert abs(row["validation_rsr"] - 0.242) < 1e-9
    assert row["UniProt_dbResName"] == "V"


def test_merge_left_join_nulls_preserved(spark, refdata):
    """Residues missing from DSSP keep their atom rows (left-join nulls)."""
    mmcif = select_structures(
        spark, f"{refdata}/mmcif/2pah.cif",
        models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
    )
    dssp = select_dssp(spark, f"{refdata}/dssp/2pah.dssp", chains=("A",))
    merged = mmcif_dssp_table_merger(mmcif, dssp)
    assert merged.count() == mmcif.count()


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_mmcif_dssp_data_dependent_key_choice(spark):
    """Hard part #4 (SURVEY §7): the DSSP join key is chosen by probing
    the two tables' chain-id sets (parity: proteofav/mergers.py:82-88).
    BioUnit atoms carry suffixed chains ('AA','AB') plus the original
    chain ('A'); DSSP may know either naming."""
    mmcif = _mk(
        spark,
        [("1", "AA", "A", "CA"), ("2", "AB", "A", "CA")],
        "auth_seq_id_full: string, auth_asym_id: string, "
        "orig_auth_asym_id: string, label_atom_id: string",
    )
    dssp_orig = _mk(
        spark, [("1", "A", "H"), ("2", "A", "E")],
        "RES_FULL: string, CHAIN_FULL: string, SS: string",
    )
    dssp_suffixed = _mk(
        spark, [("1", "AA", "H"), ("2", "AB", "E")],
        "RES_FULL: string, CHAIN_FULL: string, SS: string",
    )
    # chain sets differ ({'AA','AB'} vs {'A'}) → join on orig chain id
    m1 = mmcif_dssp_table_merger(mmcif, dssp_orig)
    assert {r["SS"] for r in m1.collect()} == {"H", "E"}
    # chain sets match → join on the suffixed chain id
    m2 = mmcif_dssp_table_merger(mmcif, dssp_suffixed)
    assert {r["SS"] for r in m2.collect()} == {"H", "E"}
    # wrong pairing: suffixed atoms against suffixed-unaware key choice
    # would null out — prove the probe actually flips the key by checking
    # each merge matched every row
    assert m1.filter(F.col("SS").isNull()).count() == 0
    assert m2.filter(F.col("SS").isNull()).count() == 0


def test_merge_3mn5_insertion_code_fallback(spark, refdata):
    """3mn5: SIFTS carries ins-coded resnums (65A/65B/65C) — the case
    that drove the reference's legacy merge into its insertion-code
    except-branch (proteofav/mergers.py:316-322). With
    legacy_resnum_key=True the probe detects the codes and falls back to
    the composite key, so the result matches the modern composite-key
    merge exactly."""
    from proteofav_spark.plans.mergers import mmcif_sifts_table_merger

    mmcif = select_structures(
        spark, f"{refdata}/mmcif/3mn5.cif",
        models="first", atoms=("CA",), lines=("ATOM",),
    )
    sifts = select_sifts(spark, f"{refdata}/sifts/3mn5.xml")
    modern = mmcif_sifts_table_merger(mmcif, sifts)
    legacy = mmcif_sifts_table_merger(mmcif, sifts, legacy_resnum_key=True)
    assert legacy.count() == modern.count() == mmcif.count()
    key = ["auth_asym_id", "auth_seq_id_full"]
    assert (
        legacy.select(*key, "PDB_dbResNum").exceptAll(
            modern.select(*key, "PDB_dbResNum")
        ).count() == 0
    )


def test_merge_2pah_legacy_plain_key(spark, refdata):
    """2pah has no insertion codes anywhere, so the legacy option keeps
    the reference's primary plain-resnum key — and (r13) the reference's
    try-branch ORIENTATION: SIFTS drives the left join
    (proteofav/mergers.py:312-314, `sifts_table.merge(table,
    how='left')`), so every SIFTS residue survives — including residues
    with no matching CA atom — while the modern tree stays mmCIF-left.
    Pinned live by tests/test_reference_differential.py::
    test_legacy_merge_tables_sequence_check_differential (335 vs 329 on
    chain A)."""
    from proteofav_spark.plans.mergers import mmcif_sifts_table_merger

    mmcif = select_structures(
        spark, f"{refdata}/mmcif/2pah.cif",
        models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
    )
    sifts = select_sifts(spark, f"{refdata}/sifts/2pah.xml")
    modern = mmcif_sifts_table_merger(mmcif, sifts)
    legacy = mmcif_sifts_table_merger(mmcif, sifts, legacy_resnum_key=True)
    assert legacy.count() == sifts.count()  # sifts-left keeps all residues
    assert modern.count() == mmcif.count()  # mmcif-left keeps all atoms
    # the MATCHED pairs are identical between the two orientations
    matched_legacy = legacy.filter(F.col("auth_seq_id").isNotNull()).count()
    matched_modern = modern.filter(F.col("PDB_dbResNum").isNotNull()).count()
    assert matched_legacy == matched_modern > 0


def test_lake_table_merger_scopes_by_entry(spark, refdata):
    """The lake-wide merge tree (review r9): a two-entry frame merged
    through lake_table_merger must equal the per-entry single-structure
    merges row-for-row, while the per-structure tree over the SAME
    frames cross-matches same-numbered residues across entries (the
    silent trap the entry-scoped keys exist to close). Also pins the
    scale plan shape: no forced broadcast on the lake path."""
    from proteofav_spark.plans.mergers import lake_table_merger

    from proteofav_spark.plans.lake import entry_id_col

    def staged(entry):
        # entry_id derives from each reader's source_file (the lake
        # staging path) — proving the derivation, not a test literal
        mmcif = select_structures(
            spark, f"{refdata}/mmcif/{entry}.cif",
            models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
        ).withColumn("entry_id", entry_id_col())
        dssp = select_dssp(
            spark, f"{refdata}/dssp/{entry}.dssp", chains=("A",)
        ).withColumn("entry_id", entry_id_col())
        return mmcif, dssp

    (m1, d1), (m2, d2) = staged("2pah"), staged("2w4o")
    atoms = m1.unionByName(m2, allowMissingColumns=True)
    dssp = d1.unionByName(d2, allowMissingColumns=True)

    lake = lake_table_merger(atoms, dssp_table=dssp)
    # per-entry equality against the reference-parity single merges
    for entry, (m, d) in (("2pah", (m1, d1)), ("2w4o", (m2, d2))):
        single = table_merger(
            mmcif_table=m.drop("entry_id"), dssp_table=d.drop("entry_id")
        )
        got = lake.filter(F.col("entry_id") == entry)
        assert got.count() == single.count(), entry
        key = ["auth_seq_id_full", "auth_asym_id"]
        pairs_single = {
            tuple(r) for r in single.select(*key, "SS").collect()
        }
        pairs_lake = {tuple(r) for r in got.select(*key, "SS").collect()}
        assert pairs_lake == pairs_single, entry
    # the naive per-structure tree over the same multi-entry frames
    # CROSS-matches residues across entries: strictly more rows
    naive = table_merger(
        mmcif_table=atoms.drop("entry_id"), dssp_table=dssp.drop("entry_id")
    )
    assert naive.count() > lake.count()
    # scale shape: the lake path must not carry a forced broadcast hint
    plan = lake._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"
        )
    )
    analyzed = plan.split("== Optimized Logical Plan ==")[0]
    # the logical-plan HINT's absence is the contract; the physical
    # strategy stays AQE's call (it MAY still broadcast a small side)
    assert "UnresolvedHint broadcast" not in analyzed


def test_lake_table_merger_requires_entry_column(spark, refdata):
    import pytest

    from proteofav_spark.plans.mergers import lake_table_merger

    mmcif = select_structures(
        spark, f"{refdata}/mmcif/2pah.cif",
        models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
    )
    with pytest.raises(TableMergerError, match="entry_id"):
        lake_table_merger(mmcif)
