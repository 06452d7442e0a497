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
    df = spark.createDataFrame([("AC?DZ*-ac",)], ["s"])
    out = df.select(check_sequence_expr("s").alias("c")).first()["c"]
    # reference alphabet (aa_codes_1to3_extended): Z (Glx) KEPT, '?'/'*'
    # and lowercase -> X, '-' kept
    assert out == "ACXDZX-XX"
    out2 = df.select(
        check_sequence_expr("s", new_gap_symbol=".").alias("c")
    ).first()["c"]
    assert out2 == "ACXDZX.XX"


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
    # identifier mode routes through the LEGACY merge_tables, whose
    # plain-key branch is SIFTS-left like the reference's (C17, r13):
    # all 349 chain-A SIFTS residues survive, vs the path-mode modern
    # tree's 278 CA atoms (test_cli_end_to_end below)
    assert sum(1 for _ in open(files[0])) - 1 == 349


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


# ---------------------------------------------------------------------------
# Review-r9 facade/downloader fixes: overwrite re-download, url-kwarg
# routing with per-artifact cache names, atomic cache staging
# ---------------------------------------------------------------------------


def _file_mmcif(tmp_path, monkeypatch, asym_src, bio_src=None):
    """An _MMCIF whose url() serves local file:// fixtures, staged into
    an isolated cache dir."""
    from proteofav_spark import facade

    monkeypatch.setattr(defaults, "db_mmcif", str(tmp_path / "cache"))
    (tmp_path / "cache").mkdir(exist_ok=True)

    class _FileMMCIF(facade._MMCIF):
        def url(self, identifier, bio_unit=False):
            return "file://" + (bio_src if bio_unit else asym_src)

    return _FileMMCIF


def test_facade_select_overwrite_redownloads(spark, tmp_path, monkeypatch, refdata):
    """Reference parity: select(overwrite=True) must RE-download an
    already-staged file (the old guard skipped download whenever the
    cache file existed, so a corrupted/stale staging could never be
    refreshed through the facade)."""
    import shutil

    src = str(tmp_path / "remote.cif")
    shutil.copyfile(f"{refdata}/mmcif/2pah.cif", src)
    cls = _file_mmcif(tmp_path, monkeypatch, src)

    s = cls(spark)
    t1 = s.select("2pah", models="first", chains=("A",), atoms=("CA",))
    n1 = t1.count()
    assert n1 > 0
    staged = tmp_path / "cache" / "2pah.cif"
    assert staged.exists()

    # corrupt the staged copy; a plain re-select must NOT re-download...
    staged.write_text("data_corrupt\n#\n")
    import pytest as _pytest

    with _pytest.raises(Exception):
        s.select("2pah", models="first").count()
    # ...but overwrite=True must refresh from the source and succeed
    t2 = s.select(
        "2pah", overwrite=True, models="first", chains=("A",), atoms=("CA",)
    )
    assert t2.count() == n1


def test_facade_bio_unit_stages_separate_artifact(spark, tmp_path, monkeypatch, refdata):
    """bio_unit routes to url()/staged_path from select(): the bio unit
    lands as <id>_bio.cif (reference structures.py:756) and never reads
    or clobbers the asym-unit cache — previously the kwarg never left
    read() and a bio-unit select silently parsed the asym file."""
    import gzip as _gzip
    import shutil

    asym = str(tmp_path / "asym.cif")
    shutil.copyfile(f"{refdata}/mmcif/2pah.cif", asym)
    # bio fixture: the 2w4o entry gzipped (the bio endpoint serves .gz)
    bio = str(tmp_path / "bio.cif.gz")
    with open(f"{refdata}/mmcif/2w4o.cif", "rb") as fin, _gzip.open(
        bio, "wb"
    ) as fout:
        shutil.copyfileobj(fin, fout)

    from proteofav_spark import facade

    monkeypatch.setattr(defaults, "db_mmcif", str(tmp_path / "cache"))
    (tmp_path / "cache").mkdir(exist_ok=True)

    class _FileMMCIF(facade._MMCIF):
        def url(self, identifier, bio_unit=False):
            # the generic downloader keys decompression off the .gz
            # suffix, exactly like the real bio endpoint URL
            return "file://" + (bio if bio_unit else asym)

    s = _FileMMCIF(spark)
    plain = s.select("2pah", models="first", chains=("A",), atoms=("CA",))
    n_plain = plain.count()
    biot = s.select(
        "2pah", bio_unit=True, models="first", chains=("A",), atoms=("CA",)
    )
    assert (tmp_path / "cache" / "2pah.cif").exists()
    assert (tmp_path / "cache" / "2pah_bio.cif").exists()
    assert biot.count() != n_plain  # genuinely different artifacts


def test_downloader_failed_fetch_leaves_no_cache_file(tmp_path):
    """Atomic staging: a failed/interrupted download must not strand a
    file under the FINAL cache name (exists-and-not-overwrite would
    then treat the truncated artifact as staged forever)."""
    from proteofav_spark.fetchers import Downloader

    target = tmp_path / "entry.cif"
    with pytest.raises(Exception):
        Downloader(
            "file://" + str(tmp_path / "no_such_source.cif"), str(target)
        )
    assert not target.exists()
    assert list(tmp_path.glob("*.part*")) == []


def test_lake_bulk_parse_matches_interactive_on_quoted_names(spark, tmp_path):
    """The bulk lake ingest and the interactive parser share ONE
    tokenizer: a quoted atom name ("C1'") must not shift columns in
    either path (review r9 — the bulk path was a bare str.split)."""
    from proteofav_spark.plans.lake import parse_mmcif_atoms_many

    hdr = "\n".join(
        f"_atom_site.{k}"
        for k in (
            "group_PDB id type_symbol label_atom_id label_alt_id "
            "label_comp_id label_asym_id label_entity_id label_seq_id "
            "pdbx_PDB_ins_code Cartn_x Cartn_y Cartn_z occupancy "
            "B_iso_or_equiv auth_seq_id auth_comp_id auth_asym_id "
            "auth_atom_id pdbx_PDB_model_num"
        ).split()
    )
    (tmp_path / "lk").mkdir()
    (tmp_path / "lk" / "x1.cif").write_text(
        "data_X1\nloop_\n" + hdr + "\n"
        'ATOM 1 C "C1\'" . U A 1 1 ? 1.5 2.0 3.0 1.00 10.0 1 U A "C1\'" 1\n'
        "#\n"
    )
    df = parse_mmcif_atoms_many(spark, str(tmp_path / "lk"))
    row = df.collect()[0]
    assert row["label_atom_id"] == "C1'"
    assert abs(row["Cartn_x"] - 1.5) < 1e-9  # no column shift
    assert row["entry_id"] == "x1"


# ---------------------------------------------------------------------------
# Review-r10 (ADVICE) facade/downloader fixes: MSA select filename routing,
# direct-download url-kwarg cache names, aln_source cache keys, unique
# staging temps
# ---------------------------------------------------------------------------


def _file_msa(tmp_path, monkeypatch, refdata):
    """An _MSA whose url() serves local file:// fixtures per format."""
    from proteofav_spark import facade

    monkeypatch.setattr(defaults, "db_msas", str(tmp_path / "msacache"))
    (tmp_path / "msacache").mkdir(exist_ok=True)

    class _FileMSA(facade._MSA):
        def url(self, identifier, aln_source="pfam", seq_format=None, **kw):
            src = (
                f"{refdata}/msas/1.50.10.100_1318.fasta"
                if seq_format == "fasta"
                else f"{refdata}/msas/PF00118.sth"
            )
            return "file://" + src

    return _FileMSA


def test_msa_select_fasta_reads_and_never_poisons_stockholm_cache(
    spark, tmp_path, monkeypatch, refdata
):
    """ADVICE r10 high: MSA.select(id, seq_format='fasta') must download
    to the SAME path read() targets. Previously _MSA.download reset
    self._filename and recomputed it without url kwargs, so the fasta
    payload landed in the Stockholm cache slot: the read crashed AND a
    later stockholm select parsed fasta as Stockholm."""
    from proteofav_spark import facade  # noqa: F401

    cls = _file_msa(tmp_path, monkeypatch, refdata)
    s = cls(spark)
    # cath serves uncompressed over file:// (pfam is always gunzipped)
    fa = s.select("FAM1", aln_source="cath", seq_format="fasta")
    assert fa.count() > 0
    assert fa.first()["Seq_Format"] == "fasta"
    cache = tmp_path / "msacache"
    assert (cache / "FAM1.cath.fasta").exists()
    # the Stockholm slot must not exist yet — no cross-format poisoning
    assert not (cache / "FAM1.cath.sth").exists()

    st = s.select("FAM1", aln_source="cath")
    assert st.first()["Seq_Format"] == "stockholm"
    assert (cache / "FAM1.cath.sth").read_text().startswith("# STOCKHOLM")


def test_msa_staged_path_distinguishes_aln_source(tmp_path, monkeypatch):
    """ADVICE r10 low: a pfam and a cath alignment for the same
    identifier+format are distinct artifacts with distinct cache files."""
    from proteofav_spark import facade

    monkeypatch.setattr(defaults, "db_msas", str(tmp_path))
    p = facade.MSA.staged_path("PF00118", aln_source="pfam")
    c = facade.MSA.staged_path("PF00118", aln_source="cath")
    assert p != c
    assert p.endswith("PF00118.pfam.sth") and c.endswith("PF00118.cath.sth")


def test_direct_download_routes_url_kwargs_to_cache_name(
    spark, tmp_path, monkeypatch, refdata
):
    """ADVICE r10 medium: a direct mmCIF.download(id, bio_unit=True)
    must stage at the bio path (<id>_bio.cif), never clobber the asym
    slot nor return the asym file as the 'already staged' bio unit."""
    import gzip as _gzip
    import shutil

    asym = str(tmp_path / "asym.cif")
    shutil.copyfile(f"{refdata}/mmcif/2pah.cif", asym)
    bio = str(tmp_path / "bio.cif.gz")
    with open(f"{refdata}/mmcif/2w4o.cif", "rb") as fin, _gzip.open(
        bio, "wb"
    ) as fout:
        shutil.copyfileobj(fin, fout)
    cls = _file_mmcif(tmp_path, monkeypatch, asym, bio)

    s = cls(spark)
    # stage the asym unit first — the buggy path then treated the asym
    # file as the "already staged" bio unit
    p_asym = s.download("2pah")
    assert p_asym.endswith("2pah.cif")
    p_bio = s.download("2pah", bio_unit=True)
    assert p_bio.endswith("2pah_bio.cif")
    assert (tmp_path / "cache" / "2pah_bio.cif").exists()
    # asym cache intact (not clobbered by the bio payload)
    asym_head = (tmp_path / "cache" / "2pah.cif").read_text()[:200]
    bio_head = (tmp_path / "cache" / "2pah_bio.cif").read_text()[:200]
    assert asym_head != bio_head


def test_downloader_staging_is_unique_per_writer(tmp_path, refdata):
    """ADVICE r10 low: staging temps are unique per writer — a foreign
    in-flight '<filename>.part' from a concurrent process must survive
    another writer's download + cleanup (the old fixed name was shared,
    so the first finisher deleted the other's in-flight copy)."""
    from proteofav_spark.fetchers import Downloader

    target = tmp_path / "entry.cif"
    foreign = tmp_path / "entry.cif.part"
    foreign.write_text("someone else's in-flight download")
    Downloader("file://" + f"{refdata}/mmcif/2pah.cif", str(target))
    assert target.exists() and target.stat().st_size > 1000
    assert foreign.read_text() == "someone else's in-flight download"
