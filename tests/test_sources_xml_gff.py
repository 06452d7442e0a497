"""SIFTS / validation / GFF reader golden tests (reference fixtures)."""

from pyspark.sql import functions as F

from proteofav_spark.sources.annotation import (
    annotation_aggregation,
    parse_gff_features,
)
from proteofav_spark.sources.sifts import filter_sifts, parse_sifts_residues
from proteofav_spark.sources.validation import (
    filter_validation,
    parse_validation_residues,
)


def test_parse_sifts_2pah(spark, refdata):
    df = parse_sifts_residues(spark, f"{refdata}/sifts/2pah.xml")
    rows = df.orderBy("line_no").collect()
    assert len(rows) > 300
    first = rows[0]
    assert first["PDB_dbAccessionId"] == "2pah"
    assert first["PDB_dbResNum"] == "118"
    assert first["PDB_dbResName"] == "VAL"
    assert first["PDB_dbChainId"] == "A"
    assert first["UniProt_dbAccessionId"] == "P00439"
    assert first["UniProt_dbResNum"] == "118"
    assert first["UniProt_dbResName"] == "V"
    assert first["CATH_dbAccessionId"] == "1.10.800.10"
    assert first["PDB_entityId"] == "A"
    assert first["PDB_Annotation"] == "Observed"
    assert first["PDB_codeSecondaryStructure"] == "T"
    assert first["PDB_nameSecondaryStructure"] == "loop"
    # excluded sources never appear
    assert not [c for c in df.columns if c.startswith(("InterPro", "GO_", "NCBI", "EC_"))]


def test_sifts_regions(spark, refdata):
    df = parse_sifts_residues(spark, f"{refdata}/sifts/2pah.xml")
    first = df.orderBy("line_no").first()
    assert first["UniProt_regionId"] == "1"
    assert first["UniProt_regionStart"] > 0
    assert first["UniProt_regionEnd"] >= first["UniProt_regionStart"]


def test_filter_sifts_chain(spark, refdata):
    df = parse_sifts_residues(spark, f"{refdata}/sifts/2pah.xml")
    out = filter_sifts(df, chains=("A",))
    assert out.select("PDB_entityId").distinct().collect()[0][0] == "A"
    out2 = filter_sifts(df, uniprot=("P00439",))
    assert out2.count() > 0


def test_parse_validation_2pah(spark, refdata):
    df = parse_validation_residues(spark, f"{refdata}/validation/2pah_validation.xml")
    rows = df.orderBy("line_no").collect()
    first = rows[0]
    assert first["validation_chain"] == "A"
    assert first["validation_resnum"] == "118"
    assert first["validation_resname"] == "VAL"
    assert abs(first["validation_rsr"] - 0.242) < 1e-9
    assert first["validation_model"] == 1


def test_filter_validation_res_full(spark, refdata):
    df = parse_validation_residues(spark, f"{refdata}/validation/2pah_validation.xml")
    out = filter_validation(df, chains=("A",))
    first = out.orderBy("line_no").first()
    assert first["validation_resnum_full"] == "118"


def test_parse_gff_p00439(spark, refdata):
    df = parse_gff_features(spark, f"{refdata}/annotation/P00439.gff")
    rows = df.orderBy("line_no").collect()
    assert rows[0]["NAME"] == "P00439"
    assert rows[0]["TYPE"] == "Chain"
    assert rows[0]["START"] == 1 and rows[0]["END"] == 452
    assert rows[0]["ID"] == ["PRO_0000205548"]
    assert rows[0]["Note"] == ["Phenylalanine-4-hydroxylase"]
    # URL-decoded %3B
    metal = [r for r in rows if r["TYPE"] == "Metal binding"][0]
    assert metal["Note"][0].startswith("Iron")
    assert ";" in metal["Note"][0] or "Iron" == metal["Note"][0].split(";")[0].strip()


def test_annotation_aggregation(spark, refdata):
    df = parse_gff_features(spark, f"{refdata}/annotation/P00439.gff")
    agg = annotation_aggregation(df, identifier="P00439")
    assert set(agg.columns) == {"annotation", "site", "accession"}
    # Chain/Helix/Beta strand/Turn dropped by default
    assert agg.filter(F.col("annotation").contains("Chain")).count() == 0
    row16 = agg.filter(F.col("site") == "16").first()
    assert "Modified residue" in row16["annotation"]
    # a site covered by a Natural variant
    assert agg.filter(F.col("annotation").contains("Natural variant:")).count() > 0


def test_annotation_aggregation_ungrouped(spark, refdata):
    df = parse_gff_features(spark, f"{refdata}/annotation/P00439.gff")
    agg = annotation_aggregation(df, identifier="P00439", group_residues=False)
    assert set(agg.columns) == {"idx", "annotation", "site", "accession"}
    assert agg.count() > agg.select("idx").distinct().count()
