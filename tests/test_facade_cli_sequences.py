"""Facade protocol, CLI, config, sequence functions, variant extras."""

import glob
import json

import pytest
from pyspark.sql import functions as F

from proteofav_spark.cli import main as cli_main
from proteofav_spark.config import Defaults, defaults
from proteofav_spark.facade import DSSP, mmCIF
from proteofav_spark.functions.sequences import (
    check_sequence_expr,
    compare_sequences_expr,
    count_mismatches_expr,
    get_sequence,
)
from proteofav_spark.operators.variants_extra import (
    flatten_icgc_variants,
    parse_uniprot_variants,
    preferred_mapping,
)


def test_config_defaults():
    assert defaults.api_pdbe.startswith("https://")
    assert defaults.db_mmcif  # tmp dir fallback
    d = Defaults()
    d.api_pdbe = "http://example.org/"
    assert d.api_pdbe == "http://example.org/"


def test_facade_select_local_file(spark, refdata):
    src = mmCIF.__class__(spark)
    table = src.read(f"{refdata}/mmcif/2pah.cif", models="first", chains=("A",))
    assert table.count() > 0
    d = DSSP.__class__(spark)
    t2 = d.read(f"{refdata}/dssp/2pah.dssp", chains=("A",))
    assert t2.count() > 0


def test_facade_identifier_required(spark):
    src = mmCIF.__class__(spark)
    with pytest.raises(ValueError):
        src.identifier()
    with pytest.raises(ValueError):
        src.filename()


def test_get_sequence(spark, refdata):
    from proteofav_spark.operators.structures import select_structures

    df = select_structures(
        spark, f"{refdata}/mmcif/2pah.cif",
        models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
    )
    seq = get_sequence(df).first()["sequence"]
    assert seq.startswith("VPWFP")  # 2pah chain A starts V118 P119 W120 F121 P122
    assert len(seq) == 329


def test_get_sequence_modified_residues(spark, refdata):
    """2pm7 is selenomethionine-substituted: 9 MSE residues in chain A.
    With the full scop_3to1 map they resolve to 'M' (reference output
    pinned by running proteofav.structures.get_sequence on this fixture),
    not the 'X' a subset map would degrade to."""
    from proteofav_spark.operators.structures import select_structures

    df = select_structures(
        spark, f"{refdata}/mmcif/2pm7_updated.cif",
        models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
    )
    seq = get_sequence(df).first()["sequence"]
    assert len(seq) == 345
    assert seq.startswith("APTWYGEPSPAAHWAFGGKLVQITPDGKGVSITNPKISGLESNTTLSE")
    assert seq.endswith("EVKTEKARVLIASG")
    assert "X" not in seq  # every MSE resolved via the full map
    assert df.filter(F.col("auth_comp_id") == "MSE").count() == 9


def test_aa3to1_full_map(spark):
    """Tail entries of the full scop_3to1 map: modified residues resolve
    to their parent letter; multi-residue chromophore values emit 'X'
    (reference len(aa1)==1 guard, proteofav/structures.py:700-710)."""
    from proteofav_spark.functions.derived import aa3to1_expr
    from proteofav_spark.library import SCOP_3TO1

    assert len(SCOP_3TO1) == 1299
    rows = spark.createDataFrame(
        [("MSE",), ("PTR",), ("SEP",), ("AYG",), ("ZZZZ",), ("ALA",)],
        ["comp"],
    ).select(aa3to1_expr("comp").alias("aa1")).collect()
    assert [r["aa1"] for r in rows] == ["M", "Y", "S", "X", "X", "A"]


def test_sequence_compare(spark):
    df = spark.createDataFrame(
        [("ABCDEF", "ABCDEF"), ("ABCDEF", "ABCDEG"), ("ABC", "AXC")],
        ["a", "b"],
    )
    rows = df.select(
        count_mismatches_expr("a", "b").alias("mm"),
        compare_sequences_expr("a", "b", n_mismatches=1).alias("ok"),
    ).collect()
    assert [r["mm"] for r in rows] == [0, 1, 1]
    assert [r["ok"] for r in rows] == [True, True, True]


def test_check_sequence(spark):
    df = spark.createDataFrame([("AC?DZ*-",)], ["s"])
    out = df.select(check_sequence_expr("s").alias("c")).first()["c"]
    assert out == "ACXDX--"  # Z (Glx) is non-canonical -> X


def test_parse_uniprot_variants(spark, refdata):
    from proteofav_spark.sources.annotation import (
        annotation_aggregation,
        parse_gff_features,
    )

    gff = parse_gff_features(spark, f"{refdata}/annotation/P00439.gff")
    agg = annotation_aggregation(
        gff, identifier="P00439", query_type="Natural variant"
    )
    out = parse_uniprot_variants(agg)
    assert set(out.columns) == {"site", "accession", "disease", "transition", "ids"}
    some = out.filter(F.size("transition") > 0).first()
    assert "->" in some["transition"][0]


def test_flatten_icgc_variants(spark, tmp_path):
    payload = {
        "hits": [
            {
                "id": "MU1", "mutation": "A>T", "affectedDonorCountTotal": 3,
                "transcripts": [
                    {"id": "ENST0001", "consequence": {
                        "aaMutation": "E295A", "type": "missense"}},
                    {"id": "ENST0002", "consequence": {
                        "aaMutation": "E10*", "type": "stop_gained"}},
                ],
            }
        ]
    }
    p = tmp_path / "icgc.json"
    p.write_text(json.dumps(payload))
    raw = spark.read.option("multiLine", True).json(str(p))
    out = flatten_icgc_variants(raw, "ENST0001")
    row = out.first()
    assert row["aaMutation"] == "E295A"
    assert row["ref"] == "E" and row["position"] == "295" and row["new"] == "A"
    assert out.count() == 1


def test_preferred_mapping(spark):
    df = spark.createDataFrame(
        [("P1", 0.9, 0.8), ("P2", 0.9, 0.9), ("P3longer", 0.9, 0.9)],
        ["uniprot_id", "identity", "coverage"],
    )
    best = preferred_mapping(df, "uniprot_id").first()["preferred_id"]
    assert best == "P2"  # max score, then shortest id


def test_cli_identifier_mode(spark, refdata, tmp_path, monkeypatch):
    """--pdb identifier mode: sources stage via the facade cache dirs
    (pre-staged here), the merge runs, and CSV lands — the reference
    CLI's resolve-and-merge contract (proteofav/main.py)."""
    import shutil

    from proteofav_spark import facade
    from proteofav_spark.config import defaults

    stage = tmp_path / "stage"
    stage.mkdir()
    for attr in ("db_mmcif", "db_sifts", "db_dssp"):
        monkeypatch.setattr(defaults, attr, str(stage))
    shutil.copyfile(f"{refdata}/mmcif/2w4o.cif", stage / "2w4o.cif")
    shutil.copyfile(f"{refdata}/sifts/2w4o.xml", stage / "2w4o.xml")
    shutil.copyfile(f"{refdata}/dssp/2w4o.dssp", stage / "2w4o.dssp")
    for src in (facade.mmCIF, facade.SIFTS, facade.DSSP):
        src._identifier = src._filename = src._table = None
        src._spark = spark

    out = str(tmp_path / "merged_id_csv")
    rc = cli_main([
        out, "--pdb", "2w4o", "--add-dssp",
        "--chain", "A", "--atom", "CA", "--lines", "ATOM",
        "--format", "csv",
    ])
    assert rc == 0
    files = glob.glob(f"{out}/*.csv")
    assert files
    header = open(files[0]).readline()
    assert "RES_FULL" in header and "PDB_dbResNum" in header
    assert sum(1 for _ in open(files[0])) - 1 == 278


def test_cli_end_to_end(spark, refdata, tmp_path):
    out = str(tmp_path / "merged_csv")
    rc = cli_main([
        out,
        "--mmcif", f"{refdata}/mmcif/2w4o.cif",
        "--dssp", f"{refdata}/dssp/2w4o.dssp",
        "--sifts", f"{refdata}/sifts/2w4o.xml",
        "--chain", "A", "--atom", "CA", "--lines", "ATOM",
        "--format", "csv",
    ])
    assert rc == 0
    files = glob.glob(f"{out}/*.csv")
    assert files
    header = open(files[0]).readline()
    assert "auth_seq_id_full" in header and "RES_FULL" in header
    n_lines = sum(1 for _ in open(files[0])) - 1
    assert n_lines == 278
