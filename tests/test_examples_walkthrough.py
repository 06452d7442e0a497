"""End-to-end twin of the reference's ``Examples.ipynb`` (VERDICT r8
item #8 — the one reference artifact with no direct mirror).

Follows the notebook cell by cell on the reference's OWN fixture files
(network "downloads" are file:// twins through the real facade
Downloader path, so staging, gzip handling, and cache naming are all
exercised): stage → read each source → filter/aggregate → write a PDB
from the mmCIF table → discover the UniProt accession from SIFTS →
annotation (phospho-site shape from use case 1) → full table_merger →
the Tables.generate automation → Chimera attribute export. One test,
documented step-for-step, so a reference user can diff their notebook
against this file section by section (README links here).
"""

import gzip
import os
import shutil

from pyspark.sql import functions as F

PDB_ID = "2pah"


def test_examples_notebook_walkthrough(spark, refdata, tmp_path, monkeypatch):
    from proteofav_spark import facade
    from proteofav_spark.config import defaults

    out_dir = tmp_path / "tmp"
    out_dir.mkdir()

    # -- Examples.ipynb cell 7: download mmCIF + PDB ---------------------
    # (file:// twins of the PDBe endpoints; the SIFTS one is gzipped
    # exactly like the real EBI endpoint, driving the decompress path)
    remote = tmp_path / "remote"
    remote.mkdir()
    shutil.copyfile(f"{refdata}/mmcif/{PDB_ID}.cif", remote / "m.cif")
    shutil.copyfile(f"{refdata}/pdb/{PDB_ID}.pdb", remote / "p.pdb")
    with open(f"{refdata}/sifts/{PDB_ID}.xml", "rb") as fin, gzip.open(
        remote / "s.xml.gz", "wb"
    ) as fout:
        shutil.copyfileobj(fin, fout)

    out_mmcif = str(out_dir / f"{PDB_ID}.cif")
    out_pdb = str(out_dir / f"{PDB_ID}.pdb")
    out_sifts = str(out_dir / f"{PDB_ID}.xml")

    class FileMMCIF(facade._MMCIF):
        def url(self, identifier, bio_unit=False):
            return "file://" + str(remote / "m.cif")

    class FilePDB(facade._PDB):
        def url(self, identifier, **kw):
            return "file://" + str(remote / "p.pdb")

    class FileSIFTS(facade._SIFTS):
        def url(self, identifier, **kw):
            # .gz suffix drives the Downloader's decompress branch,
            # like the real SIFTS endpoint URL
            return "file://" + str(remote / "s.xml.gz")

    mmCIF, PDB, SIFTS = FileMMCIF(spark), FilePDB(spark), FileSIFTS(spark)
    mmCIF.download(identifier=PDB_ID, filename=out_mmcif)
    PDB.download(identifier=PDB_ID, filename=out_pdb)
    SIFTS.download(identifier=PDB_ID, filename=out_sifts)
    assert os.path.exists(out_mmcif) and os.path.exists(out_pdb)
    assert os.path.exists(out_sifts)  # arrived decompressed

    # -- cells 9/12: load structures ------------------------------------
    mmcif = mmCIF.read(filename=out_mmcif)
    assert "Cartn_x" in mmcif.columns and mmcif.count() > 0
    pdb = PDB.read(filename=out_pdb)
    # PDB column names mimic the mmCIF schema (notebook cell 12's point)
    assert set(pdb.columns) <= set(mmcif.columns)

    # -- cells 16/21/25: SIFTS, DSSP, Validation records -----------------
    sifts = SIFTS.read(filename=out_sifts)
    assert sifts.count() > 0
    dssp = facade._DSSP(spark).read(f"{refdata}/dssp/{PDB_ID}.dssp")
    assert dssp.count() > 0
    validation = facade._Validation(spark).read(
        f"{refdata}/validation/{PDB_ID}_validation.xml"
    )
    assert validation.count() > 0

    # -- cell 29: CA-only single-chain selection -------------------------
    from proteofav_spark.operators.structures import (
        filter_structures,
        residues_aggregation,
    )

    mmcif_sel = filter_structures(
        mmcif, models="first", chains=("A",), atoms=("CA",),
        add_res_full_col=True, reset_atom_id_flag=True,
        remove_hydrogens=True,
    )
    n_ca = mmcif_sel.count()
    assert n_ca > 0
    assert mmcif_sel.select("label_atom_id").distinct().collect()[0][0] == "CA"

    # -- cell 31: residue aggregation (centroid) --------------------------
    agg = residues_aggregation(mmcif, agg_method="centroid", category="auth")
    assert 0 < agg.count() < mmcif.count()

    # -- cell 33: write a PDB-formatted file from the mmCIF table ---------
    from proteofav_spark.sinks.writers import write_pdb_from_table

    new_out_pdb = str(out_dir / f"{PDB_ID}_new.pdb")
    write_pdb_from_table(mmcif_sel, new_out_pdb)
    reread = facade._PDB(spark).read(new_out_pdb)
    assert reread.count() == n_ca  # roundtrip keeps every selected atom

    # -- cell 35: UniProt accession discovered from SIFTS -----------------
    uniprot_ids = [
        r[0]
        for r in sifts.select("UniProt_dbAccessionId").distinct().collect()
        if r[0] is not None
    ]
    assert "P00439" in uniprot_ids  # 2pah is human PAH

    # -- cells 39 + 52-54: annotation load and phospho-site shape ---------
    from proteofav_spark.sources.annotation import parse_gff_features

    annotation = parse_gff_features(
        spark, f"{refdata}/annotation/P00439.gff"
    )
    assert annotation.count() > 0
    # use case 1's filter shape: feature rows whose Note marks a site
    # class, with START as the residue selector (P00439 carries Iron
    # metal-binding annotations in the fixture)
    metal_starts = [
        r["START"]
        for r in annotation.filter(
            F.exists("Note", lambda n: n.startswith("Iron"))
        ).collect()
    ]
    assert metal_starts  # a non-empty residue selector, as in cell 54

    # -- cell 48: full manual merge ---------------------------------------
    from proteofav_spark.plans.mergers import table_merger
    from proteofav_spark.sources.dssp import filter_dssp
    from proteofav_spark.sources.sifts import filter_sifts
    from proteofav_spark.sources.validation import filter_validation

    merged = table_merger(
        filter_structures(
            mmcif, models="first", chains=("A",), atoms=("CA",),
            lines=("ATOM",),
        ),
        filter_dssp(dssp, chains=("A",)),
        filter_sifts(sifts, chain_auth=("A",)),
        filter_validation(validation, chains=("A",)),
        None,
        None,
    )
    n_merged = merged.count()
    assert n_merged > 0
    # structure + DSSP + SIFTS + validation columns all present
    for col in ("Cartn_x", "SS", "UniProt_dbResNum", "validation_rsr"):
        assert col in merged.columns, col

    # -- cell 50: the Tables.generate automation ---------------------------
    from proteofav_spark.plans.generator import SourcePaths, TablesGenerator

    table = TablesGenerator(spark).generate(
        SourcePaths(
            mmcif=out_mmcif,
            dssp=f"{refdata}/dssp/{PDB_ID}.dssp",
            sifts=out_sifts,
            validation=f"{refdata}/validation/{PDB_ID}_validation.xml",
        ),
        chains=("A",), atoms=("CA",), lines=("ATOM",),
        merge_tables=True, sequence_check="ignore",
    )
    assert table.count() == n_merged  # automation == the manual pipeline

    # -- use case 1's analytics tail (cells 60-63), Spark-side -------------
    obs = table.filter(F.col("UniProt_dbResNum").isNotNull())
    b_all = obs.agg(F.avg("B_iso_or_equiv")).first()[0]
    assert b_all is not None and b_all > 0

    # -- beyond the notebook's end: Chimera attribute export ---------------
    from proteofav_spark.sinks.writers import make_chimera_attribute_file

    attr = make_chimera_attribute_file(
        obs.select("auth_seq_id", "B_iso_or_equiv"),
        value_col="B_iso_or_equiv",
        residue_col="auth_seq_id",
    )
    assert attr.startswith("# Generated with proteofav_spark")
    assert "attribute: B_iso_or_equiv" in attr
