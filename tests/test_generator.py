"""Tables.generate orchestration + sequence checks + SIFTS add_dbs."""

import pytest
from pyspark.sql import functions as F

from proteofav_spark.plans.generator import (
    SequenceCheckError,
    SourcePaths,
    TablesGenerator,
    check_sequence_consistency,
)
from proteofav_spark.sources.sifts import parse_sifts_residues


def test_generate_and_merge(spark, refdata):
    gen = TablesGenerator(spark)
    merged = gen.generate(
        SourcePaths(
            mmcif=f"{refdata}/mmcif/2w4o.cif",
            dssp=f"{refdata}/dssp/2w4o.dssp",
            sifts=f"{refdata}/sifts/2w4o.xml",
        ),
        chains=("A",), atoms=("CA",), lines=("ATOM",),
        merge_tables=True, sequence_check="raise",
    )
    assert merged.count() == 278
    # sequence check passed without raising → sequences agree
    assert check_sequence_consistency(merged, "dssp", "warn") == 0
    assert check_sequence_consistency(merged, "sifts", "warn") == 0


def test_generate_unmerged_tuple(spark, refdata):
    gen = TablesGenerator(spark)
    tables = gen.generate(
        SourcePaths(
            mmcif=f"{refdata}/mmcif/2pah.cif",
            dssp=f"{refdata}/dssp/2pah.dssp",
        ),
        chains=("A",),
    )
    mmcif, dssp, sifts, validation, annotation, variants = tables
    assert mmcif is not None and dssp is not None
    assert sifts is None and validation is None
    assert mmcif.count() > 0 and dssp.count() > 0


def test_sequence_check_detects_corruption(spark, refdata):
    """2w4o_with_error.cif carries a deliberately corrupted sequence
    (reference edge case tests/test_mergers.py:293-303)."""
    gen = TablesGenerator(spark)
    with pytest.raises(SequenceCheckError):
        gen.generate(
            SourcePaths(
                mmcif=f"{refdata}/mmcif/2w4o_with_error.cif",
                dssp=f"{refdata}/dssp/2w4o.dssp",
            ),
            chains=("A",), atoms=("CA",), lines=("ATOM",),
            merge_tables=True, sequence_check="raise",
        )


def test_sifts_add_dbs_versions(spark, refdata):
    df = parse_sifts_residues(spark, f"{refdata}/sifts/2pah.xml", add_dbs=True)
    first = df.orderBy("line_no").first()
    assert first["UniProt_dbVersion"] is not None
    assert first["CATH_dbVersion"] is not None
    # without add_dbs the columns stay null
    df2 = parse_sifts_residues(spark, f"{refdata}/sifts/2pah.xml")
    assert df2.filter(F.col("UniProt_dbVersion").isNotNull()).count() == 0


def test_sequence_check_skipped_for_multi_atom(spark, refdata):
    """Reference parity (proteofav/mergers.py:286): sequence checks only
    run on single-atom tables — the corrupted entry must NOT raise when no
    atom filter is applied (per-atom multiplicity would distort counts)."""
    gen = TablesGenerator(spark)
    merged = gen.generate(
        SourcePaths(
            mmcif=f"{refdata}/mmcif/2w4o_with_error.cif",
            dssp=f"{refdata}/dssp/2w4o.dssp",
        ),
        chains=("A",), lines=("ATOM",),  # all atoms → check skipped
        merge_tables=True, sequence_check="raise",
    )
    assert merged.count() > 0


def test_sequence_check_rejects_bad_mode_without_merge(spark, refdata):
    gen = TablesGenerator(spark)
    with pytest.raises(ValueError):
        gen.generate(
            SourcePaths(mmcif=f"{refdata}/mmcif/2pah.cif"),
            merge_tables=False, sequence_check="riase",
        )


def test_merge_tables_from_bare_uniprot_id(spark, refdata, tmp_path, monkeypatch):
    """Legacy merge_tables auto-resolution end to end under mocks: a bare
    UniProt accession resolves to its top best-structure (canned PDBe
    JSON), sources stage through the facade downloaders (file:// mmCIF +
    SIFTS, pre-staged DSSP), and the fixed merge tree runs. r13: the
    legacy plain-key branch is SIFTS-left like the reference's
    (mergers.py:312-314), so every chain-A SIFTS residue survives —
    including those without a resolved CA atom — and exactly 278 of them
    (the reference-pinned CA count) carry atom columns."""
    import json

    from proteofav_spark.config import defaults
    from proteofav_spark.plans.generator import merge_tables

    def fake_fetch(url, **kw):
        assert url.endswith("mappings/best_structures/P29373")
        return json.dumps(
            {"P29373": [
                {"pdb_id": "2w4o", "chain_id": "A", "coverage": 0.97},
                {"pdb_id": "2l4o", "chain_id": "B", "coverage": 0.5},
            ]}
        ).encode()

    stage = tmp_path / "stage"
    stage.mkdir()
    for attr in ("db_mmcif", "db_sifts", "db_dssp"):
        monkeypatch.setattr(defaults, attr, str(stage))
    monkeypatch.setattr(defaults, "pdbe_fetch", f"file://{refdata}/mmcif/")
    # SIFTS xml isn't gzipped in the fixtures — serve it as a plain file
    # under the .xml name via a sifts_fetch override that drops the .gz
    import shutil

    shutil.copyfile(f"{refdata}/sifts/2w4o.xml", stage / "2w4o.xml")
    shutil.copyfile(f"{refdata}/dssp/2w4o.dssp", stage / "2w4o.dssp")
    # fresh facade state so memoized identifiers from other tests can't leak
    from proteofav_spark import facade

    for src in (facade.mmCIF, facade.SIFTS, facade.DSSP):
        src._identifier = src._filename = src._table = None
        src._spark = spark

    merged = merge_tables(
        spark, uniprot_id="P29373",
        atoms=("CA",), lines=("ATOM",), dssp=True, sifts=True,
        fetch=fake_fetch,
    )
    assert merged.filter(F.col("auth_seq_id").isNotNull()).count() == 278
    assert merged.count() == 349  # all chain-A SIFTS residues (sifts-left)
    assert merged.filter(
        F.col("label_asym_id").isNotNull() & (F.col("label_asym_id") != "A")
    ).count() == 0


def test_merge_tables_per_accession_variants(spark, refdata, tmp_path, monkeypatch):
    """The legacy per-accession loop: variants stage for EVERY UniProt
    accession named by the SIFTS mapping (2w4o → Q16566), union, and join
    into the merged table — residues covered by the variant positions
    carry the xref id, the rest stay null."""
    import json

    from proteofav_spark.config import defaults
    from proteofav_spark.plans.generator import merge_tables, sifts_accessions

    stage = tmp_path / "stage"
    stage.mkdir()
    for attr in ("db_mmcif", "db_sifts", "db_dssp", "db_lake"):
        monkeypatch.setattr(defaults, attr, str(stage))
    import shutil

    shutil.copyfile(f"{refdata}/mmcif/2w4o.cif", stage / "2w4o.cif")
    shutil.copyfile(f"{refdata}/sifts/2w4o.xml", stage / "2w4o.xml")
    payload = {
        "accession": "Q16566",
        "entryName": "KCC4_HUMAN",
        "features": [
            {
                "type": "VARIANT", "begin": "34", "end": "34",
                "wildType": "A", "alternativeSequence": "T",
                "consequenceType": "missense_variant",
                "xrefs": [{"name": "dbSNP", "id": "rs_test_1"}],
            }
        ],
    }
    (stage / "Q16566.json").write_text(json.dumps(payload))
    from proteofav_spark import facade

    for src in (facade.mmCIF, facade.SIFTS, facade.Variants):
        src._identifier = src._filename = src._table = None
        src._spark = spark

    merged = merge_tables(
        spark, pdb_id="2w4o", chains=("A",), atoms=("CA",), lines=("ATOM",),
        sifts=True, variants=True,
    )
    assert "xrefs_id" in merged.columns
    hit = merged.filter(F.col("xrefs_id") == "rs_test_1")
    assert hit.count() >= 1
    assert hit.first()["UniProt_dbAccessionId"] == "Q16566"
    # the probe used to drive the loop sees exactly the one accession
    from proteofav_spark.sources.sifts import select_sifts

    assert sifts_accessions(select_sifts(spark, str(stage / "2w4o.xml"))) == [
        "Q16566"
    ]


def test_sequence_check_masks_unknown_residues(spark):
    """Modified residues our 1-letter map renders as 'X' are masked on
    BOTH sides — an 'X' position must never count as a mismatch."""
    merged = spark.createDataFrame(
        [("M3L", "K"), ("ALA", "A"), ("GLY", "G")],
        "label_comp_id: string, AA: string",
    )
    assert check_sequence_consistency(merged, "dssp", "raise") == 0


def test_tables_merge_accumulates_sources(spark, refdata):
    """TablesGenerator.merge parity with the reference's _Tables.merge
    (proteofav/mergers.py:586-604): each call updates only the sources it
    names and re-merges the ACCUMULATED set — a later merge(sifts=...)
    reuses the mmcif/dssp stored by the earlier call."""
    from proteofav_spark.operators.structures import filter_structures
    from proteofav_spark.plans.generator import TablesGenerator
    from proteofav_spark.sources.dssp import filter_dssp, parse_dssp_residues
    from proteofav_spark.sources.sifts import filter_sifts, parse_sifts_residues
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    m = filter_structures(
        parse_mmcif_atoms(spark, f"{refdata}/mmcif/2w4o.cif"),
        chains=("A",), atoms=("CA",),
    )
    d = filter_dssp(
        parse_dssp_residues(spark, f"{refdata}/dssp/2w4o.dssp"), chains=("A",)
    )
    s = filter_sifts(
        parse_sifts_residues(spark, f"{refdata}/sifts/2w4o.xml"), chains=("A",)
    )
    g = TablesGenerator(spark)
    two = g.merge(mmcif=m, dssp=d)
    assert two.count() == m.count()  # mmcif ⟕ dssp keeps every atom
    assert "SS" in two.columns and "PDB_dbResNum" not in two.columns
    three = g.merge(sifts=s)  # reuses the stored mmcif + dssp
    assert "SS" in three.columns and "PDB_dbResNum" in three.columns
    assert three.count() == 278  # the reference-pinned flagship merge
