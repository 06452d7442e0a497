"""URL builders + staging downloader (network-free: file:// and injected
fetchers only). Parity: proteofav/variants.py:52-224,481-514,
structures.py:646-657, sifts.py:441-453, msas.py:452-527."""

import gzip
import json

import pytest

from proteofav_spark import fetchers
from proteofav_spark.config import defaults


def test_url_builders_structures():
    assert fetchers.url_mmcif("2pah") == f"{defaults.pdbe_fetch}2pah.cif"
    assert fetchers.url_mmcif("2pah", bio_unit=True).endswith(
        "2pah-assembly-1.cif.gz"
    )
    assert fetchers.url_pdb("2pah") == f"{defaults.pdbe_fetch}pdb2pah.ent"
    assert fetchers.url_sifts("2pah") == f"{defaults.sifts_fetch}2pah.xml.gz"
    assert fetchers.url_pdbe_summary("2pah") == (
        f"{defaults.api_pdbe}pdb/entry/summary/2pah"
    )


def test_url_builders_ensembl():
    assert fetchers.url_ensembl_sequence("ENSP00000448059") == (
        f"{defaults.api_ensembl}sequence/id/ENSP00000448059?type=protein"
    )
    assert fetchers.url_ensembl_sequence("ENSP1", protein=False).endswith(
        "sequence/id/ENSP1"
    )
    assert fetchers.url_uniprot_ensembl_xref("P00439") == (
        f"{defaults.api_ensembl}xrefs/symbol/homo_sapiens/P00439"
    )
    assert fetchers.url_uniprot_ensembl_xref("P00439", species="mus_musculus")
    with pytest.raises(ValueError, match="not valid"):
        fetchers.url_uniprot_ensembl_xref("P00439", species="homo_erectus")
    assert fetchers.url_ensembl_uniprot_xref("ENSP1") == (
        f"{defaults.api_ensembl}xrefs/id/ENSP1"
    )


def test_url_builders_uniprot():
    assert fetchers.url_uniprot_species("P00439") == (
        f"{defaults.api_uniprot}?query=P00439&columns=organism&format=tab"
    )
    assert fetchers.url_uniprot_id_from_name("PH4H_HUMAN") == (
        f"{defaults.api_uniprot}?query=PH4H_HUMAN&columns=id&format=list"
    )
    url = fetchers.url_uniprot_info("P00439")
    assert url.startswith(f"{defaults.api_uniprot}?query=accession:P00439")
    assert "format=tab" in url and "id%2Centry%20name" in url
    assert "columns=id%2Csequence&" in fetchers.url_uniprot_info(
        "P00439", cols="sequence"
    )


def test_url_builders_msas():
    assert fetchers.url_msa_pfam("PF00118") == (
        f"{defaults.pfam_fetch}family/PF00118/alignment/seed/gzipped"
    )
    with pytest.raises(ValueError):
        fetchers.url_msa_pfam("PF00118", aln_size="tiny")
    cath = fetchers.url_msa_cath("1.50.10.100_1318", seq_format="fasta")
    assert cath == (
        f"{defaults.cath_fetch}superfamily/1.50.10.100/funfam/1318"
        "/files/seed_alignment.fasta?max_sequences=200"
    )
    with pytest.raises(ValueError, match="CATH ID"):
        fetchers.url_msa_cath("nounderscore")
    assert fetchers.url_msa("PF00118") == fetchers.url_msa_pfam("PF00118")
    assert fetchers.url_msa(
        "1.50.10.100_1318", aln_source="cath"
    ) == fetchers.url_msa_cath("1.50.10.100_1318")
    with pytest.raises(ValueError, match="CATH/Pfam"):
        fetchers.url_msa("x", aln_source="ebi")


def test_fetch_and_resolve_best_structures():
    payload = {"P00439": [
        {"pdb_id": "2pah", "chain_id": "A", "coverage": 0.9},
        {"pdb_id": "1j8u", "chain_id": "B", "coverage": 0.7},
    ]}

    def fake(url, **kw):
        assert url == fetchers.url_sifts_best("P00439")
        return json.dumps(payload).encode()

    assert fetchers.fetch_best_structures("P00439", fetch=fake) == payload["P00439"]
    assert fetchers.resolve_best_structure("P00439", fetch=fake) == ("2pah", "A")
    empty = lambda url, **kw: b'{"P00439": null}'  # noqa: E731
    with pytest.raises(ValueError, match="Best structures not available"):
        fetchers.resolve_best_structure("P00439", fetch=empty)


def test_downloader_file_scheme(tmp_path):
    src = tmp_path / "src.txt"
    src.write_text("payload")
    dst = tmp_path / "dst.txt"
    fetchers.Downloader(f"file://{src}", str(dst))
    assert dst.read_text() == "payload"
    # skip-if-exists: source content change must NOT propagate
    src.write_text("changed")
    fetchers.Downloader(f"file://{src}", str(dst))
    assert dst.read_text() == "payload"
    # decompress path
    gz = tmp_path / "x.gz"
    gz.write_bytes(gzip.compress(b"unzipped"))
    out = tmp_path / "x.txt"
    fetchers.Downloader(f"file://{gz}", str(out), decompress=True)
    assert out.read_bytes() == b"unzipped"


def test_uniprot_info_table(spark):
    from proteofav_spark.sources.variants import uniprot_info_table

    raw = (
        "Entry\tEntry name\tStatus\tLength\n"
        "P00439\tPH4H_HUMAN\treviewed\t452\n"
        "P12345\tOTHER_HUMAN\treviewed\t99\n"
    )
    df = uniprot_info_table(spark, raw.encode(), uniprot_id="P00439")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["Entry name"] == "PH4H_HUMAN"
    assert rows[0]["Length"] == "452"
    # no selector: both rows
    assert uniprot_info_table(spark, raw).count() == 2
    import pytest as _pytest

    from proteofav_spark.core import EmptyTableError

    with _pytest.raises(EmptyTableError):
        uniprot_info_table(spark, "Entry\tEntry name\n")


def test_msa_facade_pfam_staging(spark, tmp_path, monkeypatch):
    """Pfam MSA staging: the download is GZIPPED Stockholm behind a URL
    with no .gz suffix — the facade must decompress it and stage under a
    .sth name so read()'s format guessing parses it."""
    import gzip

    from proteofav_spark import facade

    sth = (
        "# STOCKHOLM 1.0\n"
        "B9LRY6_HALLT/27-514  MKSELIVNAGP\n"
        "Q9XYZ1_ECOLI/1-100   MKT-LIVNQAG\n"
        "//\n"
    )
    served = tmp_path / "served"
    served.mkdir()
    # file://-servable layout mirroring family/<id>/alignment/seed/gzipped
    payload_dir = served / "family" / "PF00118" / "alignment" / "seed"
    payload_dir.mkdir(parents=True)
    (payload_dir / "gzipped").write_bytes(gzip.compress(sth.encode()))
    monkeypatch.setattr(defaults, "pfam_fetch", f"file://{served}/")
    stagedir = tmp_path / "msas"
    stagedir.mkdir()
    monkeypatch.setattr(defaults, "db_msas", str(stagedir))
    facade.MSA._identifier = facade.MSA._filename = facade.MSA._table = None
    facade.MSA._spark = spark

    fname = facade.MSA.download("PF00118")
    # r10: the alignment source is part of the cache name — a pfam and a
    # cath alignment for the same identifier must never share a slot
    assert fname.endswith("PF00118.pfam.sth")
    df = facade.MSA.read(fname)
    rows = {r["raw_description"]: r for r in df.collect()}
    assert rows["B9LRY6_HALLT/27-514"]["Sequence"] == "MKSELIVNAGP"
    assert rows["B9LRY6_HALLT/27-514"]["Seq_Format"] == "stockholm"


def _summary_payload(pdb_id, assemblies):
    return json.dumps(
        {pdb_id: [{"assemblies": assemblies}]}
    ).encode()


def test_preferred_assembly_id_resolution(monkeypatch):
    """get_preferred_assembly_id parity (proteofav/structures.py:660-687):
    >1 assembly → the 'preferred' one; exactly one → its id; any
    failure (network, shape, no preferred flag) → '1'."""
    calls = []

    def fake_fetch(url, **kw):
        calls.append(url)
        return _summary_payload(
            "5hvp",
            [
                {"assembly_id": "1", "preferred": False},
                {"assembly_id": "3", "preferred": True},
            ],
        )

    monkeypatch.setattr(fetchers, "fetch_from_url_or_retry", fake_fetch)
    assert fetchers.get_preferred_assembly_id("5hvp") == "3"
    assert calls == [fetchers.url_pdbe_summary("5hvp")]

    monkeypatch.setattr(
        fetchers,
        "fetch_from_url_or_retry",
        lambda url, **kw: _summary_payload(
            "2pah", [{"assembly_id": "2", "preferred": False}]
        ),
    )
    # single assembly: its id wins even without the preferred flag
    assert fetchers.get_preferred_assembly_id("2pah") == "2"

    def boom(url, **kw):
        raise OSError("network down")

    monkeypatch.setattr(fetchers, "fetch_from_url_or_retry", boom)
    assert fetchers.get_preferred_assembly_id("2pah") == "1"

    # multiple assemblies, NONE flagged preferred: reference leaves
    # pref_assembly unbound (NameError caught) → '1'; ours StopIteration
    monkeypatch.setattr(
        fetchers,
        "fetch_from_url_or_retry",
        lambda url, **kw: _summary_payload(
            "9xyz",
            [
                {"assembly_id": "4", "preferred": False},
                {"assembly_id": "5", "preferred": False},
            ],
        ),
    )
    assert fetchers.get_preferred_assembly_id("9xyz") == "1"


def test_url_mmcif_bio_unit_assembly_selection(monkeypatch):
    """url_mmcif BioUnit parity (proteofav/structures.py:995-1006):
    bio_unit_id routes into the assembly URL; bio_unit_preferred
    resolves via the PDBe summary endpoint."""
    assert fetchers.url_mmcif("5hvp", bio_unit=True, bio_unit_id="2").endswith(
        "5hvp-assembly-2.cif.gz"
    )
    monkeypatch.setattr(
        fetchers, "get_preferred_assembly_id", lambda ident: "3"
    )
    assert fetchers.url_mmcif(
        "5hvp", bio_unit=True, bio_unit_preferred=True
    ).endswith("5hvp-assembly-3.cif.gz")
    # preferred resolution never touches the asym-unit path
    assert fetchers.url_mmcif("5hvp") == f"{defaults.pdbe_fetch}5hvp.cif"


def test_facade_mmcif_preferred_assembly(monkeypatch, tmp_path):
    """_MMCIF facade: bio_unit_preferred resolves the assembly ONCE
    (memoized across staged_path+url), stages non-default assemblies at
    a distinct cache slot, and falls back to the _bio slot for '1'."""
    from proteofav_spark.facade import _MMCIF

    monkeypatch.setattr(defaults, "db_mmcif", str(tmp_path))
    n = {"calls": 0}

    def fake_pref(ident):
        n["calls"] += 1
        return "3"

    monkeypatch.setattr(fetchers, "get_preferred_assembly_id", fake_pref)
    s = _MMCIF()
    p = s.staged_path("5hvp", bio_unit=True, bio_unit_preferred=True)
    u = s.url("5hvp", bio_unit=True, bio_unit_preferred=True)
    assert p.endswith("5hvp_bio-assembly-3.cif")
    assert u.endswith("5hvp-assembly-3.cif.gz")
    assert n["calls"] == 1  # memoized across the two calls
    # explicit non-preferred id needs no lookup and its own cache slot
    assert s.staged_path("5hvp", bio_unit=True, bio_unit_id="2").endswith(
        "5hvp_bio-assembly-2.cif"
    )
    # assembly 1 (the default) keeps the reference's _bio slot
    assert s.staged_path("5hvp", bio_unit=True).endswith("5hvp_bio.cif")
    assert n["calls"] == 1
