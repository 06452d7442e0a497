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


# ---------------------------------------------------------------------------
# Review-r8 regressions: quote-aware mmCIF tokens, per-file MODEL scope,
# glob header validation
# ---------------------------------------------------------------------------

_MMCIF_HEADER = "\n".join(
    f"_atom_site.{k}"
    for k in (
        "group_PDB id type_symbol label_atom_id label_alt_id label_comp_id "
        "label_asym_id label_entity_id label_seq_id pdbx_PDB_ins_code "
        "Cartn_x Cartn_y Cartn_z occupancy B_iso_or_equiv "
        "auth_seq_id auth_comp_id auth_asym_id auth_atom_id "
        "pdbx_PDB_model_num"
    ).split()
)


def _write_mini_cif(path, rows):
    path.write_text(
        "data_MINI\nloop_\n" + _MMCIF_HEADER + "\n"
        + "\n".join(rows) + "\n#\n"
    )


def test_mmcif_quoted_atom_names_strip_quotes(spark, tmp_path):
    """PDBx double-quotes nucleic-acid atom names ('C1'' etc.): the
    tokenizer must treat a quoted value as ONE field and strip the
    quotes — a bare whitespace split keeps them and shifts every later
    column (review r8; the reference gets this via pandas quotechar)."""
    f = tmp_path / "mini.cif"
    _write_mini_cif(
        f,
        [
            'ATOM 1 C "C1\'" . U A 1 1 ? 1.0 2.0 3.0 1.00 10.0 1 U A "C1\'" 1',
            "ATOM 2 N N . SER A 1 2 ? 4.0 5.0 6.0 1.00 11.0 2 SER A N 1",
        ],
    )
    df = parse_mmcif_atoms(spark, str(f))
    rows = {int(r["id"]): r for r in df.collect()}
    assert rows[1]["label_atom_id"] == "C1'"
    assert abs(float(rows[1]["Cartn_x"]) - 1.0) < 1e-9  # no column shift
    assert rows[2]["label_atom_id"] == "N"


def test_mmcif_quoted_value_with_embedded_quote(spark, tmp_path):
    """CIF terminates a quoted value only at quote + WHITESPACE (or
    EOL), so an embedded quote ('it's ok' style, here in a comp id)
    stays inside ONE field. The pre-r9 tokenizer ended the field at the
    first closing quote regardless, splitting such values and shifting
    every later column — the exact failure mode the quote-aware
    tokenizer exists to prevent (ADVICE r9)."""
    f = tmp_path / "mini.cif"
    _write_mini_cif(
        f,
        [
            # label_comp_id = "A'B C" via embedded-quote single quoting
            "ATOM 1 C CA . 'A'B C' A 1 1 ? 1.0 2.0 3.0 1.00 10.0 "
            "1 'A'B C' A CA 1",
            "ATOM 2 N N . SER A 1 2 ? 4.0 5.0 6.0 1.00 11.0 2 SER A N 1",
        ],
    )
    df = parse_mmcif_atoms(spark, str(f))
    rows = {int(r["id"]): r for r in df.collect()}
    assert rows[1]["label_comp_id"] == "A'B C"
    assert abs(float(rows[1]["Cartn_x"]) - 1.0) < 1e-9  # no column shift
    assert rows[1]["pdbx_PDB_model_num"] == "1"
    assert rows[2]["label_comp_id"] == "SER"


def test_mmcif_glob_differing_headers_raise(spark, tmp_path):
    import pytest

    a = tmp_path / "a.cif"
    _write_mini_cif(
        a, ["ATOM 1 N N . SER A 1 1 ? 1 2 3 1.0 9.0 1 SER A N 1"]
    )
    (tmp_path / "b.cif").write_text(
        "data_B\nloop_\n_atom_site.group_PDB\n_atom_site.id\nATOM 1\n#\n"
    )
    with pytest.raises(ValueError, match="differing _atom_site headers"):
        parse_mmcif_atoms(spark, str(tmp_path / "*.cif"))


_PDB_ATOM = (
    "ATOM      1  N   SER A   1      27.130  14.993   4.179  1.00 10.00"
    "           N"
)


def test_pdb_glob_model_numbers_do_not_leak_across_files(spark, tmp_path):
    """A glob where file A is an NMR entry (MODEL 20) and file B carries
    no MODEL records: B's atoms must default to model '1', not inherit
    A's marker through an unpartitioned carry-forward window
    (review r8)."""
    (tmp_path / "a.pdb").write_text(f"MODEL       20\n{_PDB_ATOM}\nENDMDL\n")
    (tmp_path / "b.pdb").write_text(f"{_PDB_ATOM}\n")
    df = parse_pdb_atoms(spark, str(tmp_path / "*.pdb"))
    by_file = {
        r["source_file"].rsplit("/", 1)[-1]: r["pdbx_PDB_model_num"]
        for r in df.select("source_file", "pdbx_PDB_model_num").collect()
    }
    assert by_file["a.pdb"] == "20"
    assert by_file["b.pdb"] == "1"
