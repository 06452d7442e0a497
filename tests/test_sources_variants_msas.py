"""Variants flattening + MSA reader tests."""

import json

import pytest
from pyspark.sql import functions as F

from proteofav_spark.core import merging_down_by_key, splitting_up_by_key
from proteofav_spark.sources.msas import read_msas
from proteofav_spark.sources.variants import (
    flatten_structs,
    flatten_uniprot_variants,
    uniprot_vars_ensembl_vars_merger,
)

UNIPROT_PAYLOAD = {
    "accession": "P00439",
    "entryName": "PH4H_HUMAN",
    "taxid": 9606,
    "features": [
        {
            "type": "VARIANT",
            "begin": "118",
            "end": "118",
            "wildType": "V",
            "alternativeSequence": "A",
            "consequenceType": "missense_variant",
            "sourceType": "large_scale_study",
            "somaticStatus": 0,
            "frequency": 0.001,
            "polyphenScore": 0.31,
            "siftScore": 0.14,
            "xrefs": [
                {"name": "ExAC", "id": "rs776442422"},
                {"name": "TOPMed", "id": "rs776442422"},
            ],
        },
        {
            "type": "VARIANT",
            "begin": "120",
            "end": "120",
            "wildType": "W",
            "alternativeSequence": "C",
            "consequenceType": "missense_variant",
            "sourceType": "uniprot",
            "somaticStatus": 0,
            "frequency": 0.002,
            "polyphenScore": 0.9,
            "siftScore": 0.01,
            "xrefs": [{"name": "dbSNP", "id": "rs000001"}],
        },
    ],
}


@pytest.fixture(scope="module")
def uniprot_vars_raw(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("vars") / "P00439.json"
    p.write_text(json.dumps(UNIPROT_PAYLOAD))
    return spark.read.json(str(p))


def test_flatten_structs_arrays(uniprot_vars_raw):
    df = uniprot_vars_raw.select(F.explode("features").alias("feature"))
    flat = flatten_structs(df)
    assert "feature_xrefs_id" in flat.columns
    row = flat.filter(F.col("feature_begin") == "118").first()
    assert row["feature_xrefs_id"] == ["rs776442422", "rs776442422"]


def test_flatten_uniprot_variants(uniprot_vars_raw):
    out = flatten_uniprot_variants(uniprot_vars_raw)
    rows = {r["xrefs_id"]: r for r in out.collect()}
    assert "rs776442422" in rows
    r = rows["rs776442422"]
    assert r["begin"] == "118"
    assert abs(r["siftScore"] - 0.14) < 1e-9
    assert r["accession"] == "P00439"
    # two xref entries with the same id collapse to one row
    assert out.count() == 2


def test_split_and_merge_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", ["x", "y"]), ("b", ["x"])], ["val", "xrefs_id"]
    )
    split = splitting_up_by_key(df, "xrefs_id")
    assert split.count() == 3
    merged = merging_down_by_key(split, "xrefs_id")
    row_x = merged.filter(F.col("xrefs_id") == "x").first()
    # 'x' maps to values a and b → collapsed to a multi-value cell
    assert "a" in row_x["val"] and "b" in row_x["val"]


def test_vars_merger_outer(spark):
    u = spark.createDataFrame(
        [("118", "118", "rs1", 0.1, "missense_variant", 0.2, 0.3, "ExAC")],
        ["begin", "end", "xrefs_id", "frequency", "consequenceType",
         "siftScore", "polyphenScore", "xrefs_name"],
    )
    e = spark.createDataFrame(
        [("118", "118", "rs1", 0.1, "missense_variant", 0.2, 0.3, "ENSP1"),
         ("120", "120", "rs2", 0.5, "synonymous_variant", 0.6, 0.7, "ENSP1")],
        ["begin", "end", "xrefs_id", "frequency", "consequenceType",
         "siftScore", "polyphenScore", "translation"],
    )
    out = uniprot_vars_ensembl_vars_merger(u, e)
    assert out.count() == 2
    r1 = out.filter(F.col("xrefs_id") == "rs1").first()
    assert r1["xrefs_name"] == "ExAC"
    assert r1["translation"] == "ENSP1"
    r2 = out.filter(F.col("xrefs_id") == "rs2").first()
    assert r2["xrefs_name"] is None


def test_read_msas_stockholm_pfam(spark, refdata):
    df = read_msas(spark, f"{refdata}/msas/PF00118.sth", seq_format="stockholm")
    rows = df.collect()
    assert len(rows) > 5
    byname = {r["raw_description"]: r for r in rows}
    rec = byname["B9LRY6_HALLT/27-514"]
    assert rec["Name"] == "B9LRY6_HALLT"
    assert rec["Start"] == 27
    assert rec["End"] == 514
    assert rec["Source"] == "Pfam"
    assert len(rec["Sequence"]) > 100


def test_read_msas_clustal(spark, tmp_path):
    """Clustal interleaved blocks reassemble per name; conservation lines,
    blank lines, and trailing cumulative counts drop; Pfam-style
    name/start-end descriptions parse as in stockholm."""
    aln = tmp_path / "toy.aln"
    aln.write_text(
        "CLUSTAL 2.1 multiple sequence alignment\n"
        "\n"
        "B9LRY6_HALLT/27-514      MKSELIVN-AGP 12\n"
        "Q9XYZ1_ECOLI/1-100       MKT-LIVNQAGP 12\n"
        "                         ** .****  **\n"
        "\n"
        "B9LRY6_HALLT/27-514      KRTTSGIL 20\n"
        "Q9XYZ1_ECOLI/1-100       KRSTSGI- 19\n"
    )
    df = read_msas(spark, str(aln), seq_format=None)  # guess from .aln
    rows = {r["raw_description"]: r for r in df.collect()}
    assert set(rows) == {"B9LRY6_HALLT/27-514", "Q9XYZ1_ECOLI/1-100"}
    rec = rows["B9LRY6_HALLT/27-514"]
    assert rec["Sequence"] == "MKSELIVN-AGPKRTTSGIL"
    assert rows["Q9XYZ1_ECOLI/1-100"]["Sequence"] == "MKT-LIVNQAGPKRSTSGI-"
    assert rec["Seq_Format"] == "clustal"
    assert rec["Name"] == "B9LRY6_HALLT"
    assert rec["Start"] == 27 and rec["End"] == 514
    # reference parity: non-fasta/non-stockholm formats parse via the
    # generic description path, Source='GenericParser' (review r8)
    assert rec["Source"] == "GenericParser"


def test_read_msas_phylip(spark, tmp_path):
    """Interleaved PHYLIP: 10-char name field in block 1, name-less
    continuation blocks map back by line order mod N, whitespace inside
    sequence chunks drops."""
    phy = tmp_path / "toy.phy"
    phy.write_text(
        " 3 20\n"
        "seq_one   MKSEL IVNAG\n"
        "seq_two   MKT-L IVNQA\n"
        "seq_three MKSEL IVNAG\n"
        "\n"
        "P KRTTSGIL-\n"
        "G KRSTSGI--\n"
        "P KRTTSGILX\n"
    )
    df = read_msas(spark, str(phy), seq_format=None)  # guess from .phy
    rows = {r["raw_description"]: r for r in df.collect()}
    assert set(rows) == {"seq_one", "seq_two", "seq_three"}
    assert rows["seq_one"]["Sequence"] == "MKSELIVNAGPKRTTSGIL-"
    assert rows["seq_two"]["Sequence"] == "MKT-LIVNQAGKRSTSGI--"
    assert rows["seq_three"]["Sequence"] == "MKSELIVNAGPKRTTSGILX"
    assert rows["seq_one"]["Seq_Format"] == "phylip"
    with pytest.raises(ValueError, match="PHYLIP"):
        bad = tmp_path / "bad.phy"
        bad.write_text("notanumber here\nACGT\n")
        read_msas(spark, str(bad), seq_format="phylip")


def test_read_msas_fasta_cath(spark, refdata):
    df = read_msas(spark, f"{refdata}/msas/1.50.10.100_1318.fasta")
    rows = df.collect()
    assert len(rows) > 1
    first = [r for r in rows if "1hm3A01" in r["raw_description"]][0]
    assert first["Source"] == "CATH"
    assert first["pdb_id"] == "1hm3"
    assert first["chain_id"] == "A"
    assert first["domain_id"] == "1hm3A01"
    assert first["Start"] == 27 and first["End"] == 338
    assert first["Seq_Format"] == "fasta"
    assert "-" in first["Sequence"]


def test_merging_down_null_array_cells_stay_null(spark):
    """ADVICE r12 low: the NULL-key passthrough must leave a NULL array
    cell NULL (the reference keeps NaN verbatim), agreeing with the
    single-row non-null-key group (try_element_at over an empty
    collect_list → NULL). Both paths, same frame."""
    from pyspark.sql import Row, types as T

    schema = T.StructType([
        T.StructField("xrefs_id", T.StringType()),
        T.StructField("vals", T.ArrayType(T.StringType())),
    ])
    df = spark.createDataFrame(
        [
            Row(xrefs_id=None, vals=None),      # NULL-key passthrough
            Row(xrefs_id="a", vals=None),       # single-row group
            Row(xrefs_id="b", vals=["x", "y"]),  # keeps the column array
        ],
        schema,
    )
    out = {r["xrefs_id"]: r["vals"] for r in merging_down_by_key(df, "xrefs_id").collect()}
    assert out[None] is None
    assert out["a"] is None
    assert sorted(out["b"]) == ["x", "y"]
