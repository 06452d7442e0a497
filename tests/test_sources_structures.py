"""Reader golden tests against the reference fixture corpus.

Pinned values mirror the reference's own assertions
(tests/test_structures.py:119-143 — 2pah mmCIF: 5317 atoms,
row 1 label_asym_id == 'A').
"""

from pyspark.sql import functions as F

from proteofav_spark.sources.structures import parse_mmcif_atoms, parse_pdb_atoms


def test_parse_mmcif_atoms_2pah(spark, refdata):
    df = parse_mmcif_atoms(spark, f"{refdata}/mmcif/2pah.cif")
    assert df.count() == 5317
    row = df.orderBy("id").first()
    assert row["label_asym_id"] == "A"
    assert row["group_PDB"] == "ATOM"
    assert row["id"] == 1
    assert abs(row["Cartn_x"] - (-7.069)) < 1e-9
    assert row["auth_seq_id"] == "118"
    assert row["pdbx_PDB_model_num"] == "1"
    # excluded by default
    assert "pdbx_formal_charge" not in df.columns


def test_parse_mmcif_atoms_hetatm(spark, refdata):
    df = parse_mmcif_atoms(spark, f"{refdata}/mmcif/2pah.cif")
    het = df.filter(F.col("group_PDB") == "HETATM")
    assert het.count() > 0
    assert het.filter(F.col("label_comp_id") == "FE").count() == 2


def test_parse_pdb_atoms_2pah(spark, refdata):
    df = parse_pdb_atoms(spark, f"{refdata}/pdb/2pah.pdb")
    assert df.count() == 5317
    row = df.orderBy("id").first()
    assert row["label_atom_id"] == "N"
    assert row["label_comp_id"] == "VAL"
    assert row["auth_asym_id"] == "A"
    assert row["auth_seq_id"] == "118"
    assert row["label_alt_id"] == "."
    assert row["pdbx_PDB_ins_code"] == "?"
    assert row["pdbx_PDB_model_num"] == "1"
    assert abs(row["Cartn_x"] - (-7.069)) < 1e-9


def test_mmcif_pdb_same_coordinates(spark, refdata):
    cif = parse_mmcif_atoms(spark, f"{refdata}/mmcif/2pah.cif")
    pdb = parse_pdb_atoms(spark, f"{refdata}/pdb/2pah.pdb")
    # PDB TER records consume atom serials, so `id` diverges between the two
    # formats mid-file; compare the coordinate multisets instead.
    a = cif.select("Cartn_x", "Cartn_y", "Cartn_z")
    b = pdb.select("Cartn_x", "Cartn_y", "Cartn_z")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
