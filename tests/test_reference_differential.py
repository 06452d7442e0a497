"""DIFFERENTIAL parity tests: execute the REFERENCE's own pandas
implementations on its fixtures and compare outputs row-for-row with the
Spark pipelines — the strongest parity evidence the suite has, because
it runs the reference LOOPS/PARSERS live rather than asserting recorded
expectations (any drift on either side fails immediately).

Two classes of environment bitrot in the reference are RESTORED to its
documented/intended semantics before comparing (each is a behavior the
reference demonstrably had on its contemporary dependency versions, and
the one this engine implements):

1. pandas ≥2 changed ``Series.str.replace`` to ``regex=False`` by
   default, turning the reference's ``_fix_pdb_ins_code`` /
   ``_fix_label_alt_id`` regex replaces into no-ops — PDB '' altloc /
   ins-code cells were meant to become '.' / '?' (the mmCIF
   conventions its own mergers key on).
2. Python ≥3.9.2 (CVE-2021-23336) stopped ``urllib.parse.parse_qs``
   splitting on ';' — the reference's GFF GROUP parsing was built on
   ';'-splitting with %3B escapes protecting interior semicolons.

Reference modules import with two stubs (scipy.spatial.cKDTree and
requests_cache are unused by the code paths under test); the stubs get
real ModuleSpecs so pyspark's optional-dependency probing still works.
"""

from __future__ import annotations

import importlib.machinery
import math
import os
import sys
import types
import urllib.parse
import warnings
from functools import lru_cache

import pytest
from pyspark.sql import functions as F

TD = "/root/reference/tests/testdata"


def _stub(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)
    return sys.modules[name]


@lru_cache(maxsize=1)
def _ref():
    """Import the reference's structures/dssp/annotation modules once,
    with the intended parse_qs semantics restored for annotation."""
    sp = _stub("scipy")
    spatial = _stub("scipy.spatial", cKDTree=None)
    sp.spatial = spatial
    _stub("requests_cache", install_cache=lambda *a, **k: None)
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.annotation as RA
            import proteofav.dssp as RD
            import proteofav.structures as RS
    finally:
        sys.path.remove("/root/reference")
    RA.parse_qs = lambda s: urllib.parse.parse_qs(s, separator=";")
    return RS, RD, RA


@lru_cache(maxsize=1)
def _lxml_shim():
    """One shared lxml→stdlib-ElementTree adapter for every test that
    imports a reference XML module (validation, sifts). Provides the
    two lxml-only surfaces the reference touches — ``root.nsmap``
    (derived from the root tag's namespace) and ``etree.XMLSyntaxError``
    — on top of the stdlib module's attributes. One shim for all tests:
    per-test stubs would race through sys.modules.setdefault and the
    winner depends on execution order."""
    import xml.etree.ElementTree as ET

    class _XMLSyntaxError(Exception):
        pass

    class _Root:
        def __init__(self, el):
            object.__setattr__(self, "_el", el)

        @property
        def nsmap(self):
            tag = self._el.tag
            return {None: tag[1:].split("}")[0] if tag.startswith("{") else ""}

        def __getattr__(self, k):
            return getattr(self._el, k)

    class _Tree:
        def __init__(self, t):
            self._t = t

        def getroot(self):
            return _Root(self._t.getroot())

    attrs = {k: getattr(ET, k) for k in dir(ET) if not k.startswith("_")}
    attrs["parse"] = lambda fn: _Tree(ET.parse(fn))
    attrs["XMLSyntaxError"] = _XMLSyntaxError
    lx = _stub("lxml")
    etree_mod = _stub("lxml.etree", **attrs)
    lx.etree = etree_mod
    return etree_mod


def _norm_cell(v, dp: int):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, dp)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        t = tuple(str(x) for x in v)
        return t if t else None  # reference: absent key == NaN; ours: []
    return str(v)


def _assert_frames_equal(ref_pdf, spark_df, dp: int = 4, skip: tuple = ()):
    """Order-insensitive row-set equality over the SHARED columns, with
    floats rounded at ``dp`` and list-likes normalized (the reference
    emits python lists, Spark emits arrays)."""
    ours = spark_df.toPandas()
    shared = [c for c in ref_pdf.columns if c in ours.columns and c not in skip]
    assert len(shared) >= 10, f"suspiciously few shared columns: {shared}"

    def norm(df):
        return sorted(
            tuple(_norm_cell(r[c], dp) for c in shared)
            for _, r in df[shared].iterrows()
        )

    a, b = norm(ref_pdf), norm(ours)
    assert len(a) == len(b), (len(a), len(b))
    only_ref = sorted(set(a) - set(b))[:2]
    only_ours = sorted(set(b) - set(a))[:2]
    assert a == b, f"only-ref={only_ref} only-ours={only_ours}"


@pytest.mark.parametrize(
    "cif", ["2w4o.cif", "3mn5.cif", "4ibw.cif"]
)  # plain / insertion-code-heavy / altloc-heavy
def test_mmcif_parse_differential(spark, cif):
    """parse_mmcif_atoms on three fixtures covering the tricky parse
    paths (2w4o plain 2279 rows, 3mn5 insertion codes 3418, 4ibw
    altlocs 2304): every shared column equal. excluded_cols=() on the
    reference side because its lenient drop catches ValueError while
    modern pandas raises KeyError (bitrot in the EXCLUSION, not the
    parse — we compare the full column set, which is strictly
    stronger)."""
    RS, _, _ = _ref()
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    ref = RS.parse_mmcif_atoms(f"{TD}/mmcif/{cif}", excluded_cols=())
    _assert_frames_equal(ref, parse_mmcif_atoms(spark, f"{TD}/mmcif/{cif}"))


def test_pdb_parse_differential(spark):
    """parse_pdb_atoms on 2pah: 5317 rows equal after restoring the
    reference's intended ''→'.' / ''→'?' altloc/ins-code fixes (its
    `str.replace('\\ |', ...)` regexes are no-ops under pandas ≥2)."""
    RS, _, _ = _ref()
    from proteofav_spark.sources.structures import parse_pdb_atoms

    ref = RS.parse_pdb_atoms(f"{TD}/pdb/2pah.pdb", excluded_cols=())
    ref["label_alt_id"] = ref["label_alt_id"].replace("", ".")
    ref["pdbx_PDB_ins_code"] = ref["pdbx_PDB_ins_code"].replace("", "?")
    _assert_frames_equal(ref, parse_pdb_atoms(spark, f"{TD}/pdb/2pah.pdb"))


def test_dssp_parse_differential(spark):
    """parse_dssp_residues on 2w4o: 280 residue rows equal across every
    shared column (RES/CHAIN/AA/SS/ACC/PHI/PSI/coordinates...)."""
    _, RD, _ = _ref()
    from proteofav_spark.sources.dssp import parse_dssp_residues

    ref = RD.parse_dssp_residues(f"{TD}/dssp/2w4o.dssp")
    _assert_frames_equal(ref, parse_dssp_residues(spark, f"{TD}/dssp/2w4o.dssp"))


def test_gff_parse_differential(spark):
    """parse_gff_features on P00439: 261 feature rows equal, including
    every expanded GROUP attribute column (ID/Note/evidence/Dbxref...),
    with %3B-escaped semicolons surviving inside values."""
    _, _, RA = _ref()
    from proteofav_spark.sources.annotation import parse_gff_features

    ref = RA.parse_gff_features(f"{TD}/annotation/P00439.gff")
    _assert_frames_equal(
        ref, parse_gff_features(spark, f"{TD}/annotation/P00439.gff")
    )


def test_altloc_removal_differential(spark):
    """_remove_multiple_altlocs on 4ibw (the altloc-rich fixture): the
    surviving (id, altloc) set equals the reference loop's — 2172 rows,
    every kept altloc rewritten to '.' on both sides."""
    RS, _, _ = _ref()
    from proteofav_spark.operators.structures import remove_multiple_altlocs
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    ref = RS._remove_multiple_altlocs(
        RS.parse_mmcif_atoms(f"{TD}/mmcif/4ibw.cif", excluded_cols=()).copy()
    )
    ref_keys = sorted(zip(ref.id.astype(str), ref.label_alt_id))
    out = remove_multiple_altlocs(parse_mmcif_atoms(spark, f"{TD}/mmcif/4ibw.cif"))
    ours = sorted(
        (str(r["id"]), r["label_alt_id"])
        for r in out.select("id", "label_alt_id").collect()
    )
    assert ours == ref_keys and len(ours) == 2172


def test_residue_centroid_differential(spark):
    """residues_aggregation('centroid') on 2w4o chain A: all 394
    residues' (x, y, z) centroids equal the reference groupby-mean at
    6 dp, keyed by (model, auth_seq_id)."""
    RS, _, _ = _ref()
    from proteofav_spark.operators.structures import residues_aggregation
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    t = RS.parse_mmcif_atoms(f"{TD}/mmcif/2w4o.cif", excluded_cols=())
    t = t[t.auth_asym_id == "A"]
    ra = RS.residues_aggregation(t.copy(), agg_method="centroid")
    ref = {
        (str(r.pdbx_PDB_model_num), str(r.auth_seq_id)): tuple(
            round(float(v), 6) for v in (r.Cartn_x, r.Cartn_y, r.Cartn_z)
        )
        for _, r in ra.iterrows()
    }
    s = parse_mmcif_atoms(spark, f"{TD}/mmcif/2w4o.cif").filter(
        F.col("auth_asym_id") == "A"
    )
    sa = residues_aggregation(s, agg_method="centroid").toPandas()
    ours = {
        (str(r.pdbx_PDB_model_num), str(r.auth_seq_id)): tuple(
            round(v, 6) for v in (r.Cartn_x, r.Cartn_y, r.Cartn_z)
        )
        for _, r in sa.iterrows()
    }
    assert set(ref) == set(ours) and len(ref) == 394
    diffs = {k: (ref[k], ours[k]) for k in ref if ref[k] != ours[k]}
    assert diffs == {}


def test_dssp_rsa_differential(spark):
    """RSA derivation (Sander scale) on 2w4o: every residue's RSA equals
    the reference's per-row get_rsa loop at 3 dp. The reference's parse
    keeps the two '!' chain-break rows (RES='') that its own filter —
    and ours — drop, so breaks are excluded on the reference side."""
    _, RD, _ = _ref()
    from proteofav_spark.sources.dssp import filter_dssp, parse_dssp_residues

    r = RD.parse_dssp_residues(f"{TD}/dssp/2w4o.dssp")
    r = RD._add_dssp_rsa(r.copy(), method="Sander")
    r = r[r.RES.astype(str) != ""]

    def fnum(c):
        try:
            return round(float(c), 3)
        except (TypeError, ValueError):
            return None

    ref = sorted(
        (str(a), str(b), fnum(c)) for a, b, c in zip(r.RES, r.CHAIN, r.RSA)
    )
    s = filter_dssp(
        parse_dssp_residues(spark, f"{TD}/dssp/2w4o.dssp"),
        add_rsa=True,
        rsa_method="sander",
    )
    ours = sorted(
        (str(x["RES"]), str(x["CHAIN"]), None if x["RSA"] is None else round(x["RSA"], 3))
        for x in s.select("RES", "CHAIN", "RSA").collect()
    )
    assert ours == ref and len(ours) == 278


def test_get_sequence_differential(spark):
    """get_sequence on 2w4o chain A CA atoms: the 1-letter sequence
    equals the reference's per-row scop_3to1 concat loop, character for
    character."""
    RS, _, _ = _ref()
    from proteofav_spark.functions.sequences import get_sequence
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    t = RS.parse_mmcif_atoms(f"{TD}/mmcif/2w4o.cif", excluded_cols=())
    t = t[
        (t.auth_asym_id == "A")
        & (t.label_atom_id == "CA")
        & (t.group_PDB == "ATOM")
    ]
    ref_seq = RS.get_sequence(t)
    sdf = parse_mmcif_atoms(spark, f"{TD}/mmcif/2w4o.cif").filter(
        (F.col("auth_asym_id") == "A")
        & (F.col("label_atom_id") == "CA")
        & (F.col("group_PDB") == "ATOM")
    )
    rows = get_sequence(sdf).collect()
    assert len(rows) == 1
    assert rows[0]["sequence"] == ref_seq and len(ref_seq) > 200


def test_dssp_full_chain_differential(spark):
    """_add_dssp_full_chain on the 2pah BIO UNIT dssp (the multi-copy
    chain-renaming loop: chain A's copies become AA, B's become BA, with
    the '!*' break bookkeeping deciding increment-vs-reset): all 1309
    rows' CHAIN_FULL equal the reference's sequential scan — the window
    recurrence (segment ids from resets, cumulative increments within a
    segment) is exactly the loop's state machine."""
    _, RD, _ = _ref()
    from proteofav_spark.sources.dssp import (
        add_dssp_full_chain,
        parse_dssp_residues,
    )

    r = RD.parse_dssp_residues(f"{TD}/dssp/2pah_bio.dssp")
    r = RD._add_dssp_full_chain(r.copy())
    ref = sorted(
        map(
            tuple,
            zip(
                r.RES.astype(str),
                r.CHAIN.astype(str),
                r.CHAIN_FULL.astype(str),
                r.AA.astype(str),
            ),
        )
    )
    s = add_dssp_full_chain(
        parse_dssp_residues(spark, f"{TD}/dssp/2pah_bio.dssp")
    )
    ours = sorted(
        (str(x["RES"]), str(x["CHAIN"]), str(x["CHAIN_FULL"]), str(x["AA"]))
        for x in s.select("RES", "CHAIN", "CHAIN_FULL", "AA").collect()
    )
    assert ours == ref and len(ours) == 1309
    assert {"AA", "BA"} <= {t[2] for t in ours}


def test_pdb_writer_line_differential(spark):
    """write_pdb_from_table's fixed-width record expression vs the
    reference's Biopython-derived _get_atom_line: BYTE-identical for all
    2279 atoms of 2w4o (column offsets, name padding, altloc/ins-code
    blanks, %8.3f coordinates, %6.2f occupancy/B-factor, element
    right-alignment)."""
    RS, _, _ = _ref()
    from proteofav_spark.sinks.writers import pdb_lines
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    t = RS.parse_mmcif_atoms(f"{TD}/mmcif/2w4o.cif", excluded_cols=())
    ref_lines = [
        RS._get_atom_line(t, ix, n + 1).rstrip("\n")
        for n, ix in enumerate(t.index)
    ]
    s = parse_mmcif_atoms(spark, f"{TD}/mmcif/2w4o.cif")
    ours = [r["value"] for r in pdb_lines(s).collect()]
    assert len(ours) == len(ref_lines) == 2279
    assert ours == ref_lines


def test_mmcif_writer_cross_parse_differential(spark, tmp_path):
    """Our quote-aware mmCIF writer's output, parsed by the REFERENCE
    parser, equals the reference's parse of the original file — the
    written file is reference-readable with identical values for every
    shared column (the write→foreign-read contract a mixed-tooling
    pipeline depends on)."""
    RS, _, _ = _ref()
    from proteofav_spark.sinks.writers import write_mmcif_from_table
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    out = str(tmp_path / "rt_2w4o.cif")
    write_mmcif_from_table(
        parse_mmcif_atoms(spark, f"{TD}/mmcif/2w4o.cif"), out, overwrite=True
    )
    back = RS.parse_mmcif_atoms(out, excluded_cols=())
    orig = RS.parse_mmcif_atoms(f"{TD}/mmcif/2w4o.cif", excluded_cols=())
    shared = [c for c in orig.columns if c in back.columns]
    assert len(shared) == 20

    def norm(df):
        return sorted(
            tuple(_norm_cell(r[c], 4) for c in shared)
            for _, r in df[shared].iterrows()
        )

    assert norm(orig) == norm(back)


def test_validation_parse_differential(spark):
    """parse_validation_residues on 2pah's wwPDB validation report: all
    653 ModelledSubgroup rows equal across the 22 shared columns. Three
    more environment-bitrot shims on the reference side, same classes as
    the module docstring documents: lxml→stdlib ElementTree (identical
    parse/getroot/iterfind surface), pandas ≥2 rejecting set-typed
    ``columns=`` (proxied to a sorted list), and the icode/altcode
    str.replace regex no-ops (blank → '?' / '.' restored). Cells compare
    under numeric coercion because the reference's per-column astype
    falls back to strings wherever a column mixes None (its try/except
    keeps object dtype) while our per-VALUE try_cast yields doubles —
    the values are identical."""
    import pandas as _pd

    _ref()  # installs the base scipy/requests_cache stubs
    _lxml_shim()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.validation as RVAL
    finally:
        sys.path.remove("/root/reference")

    class _PdProxy:
        def __getattr__(self, k):
            return getattr(_pd, k)

        def DataFrame(self, *a, **kw):
            if isinstance(kw.get("columns"), (set, frozenset)):
                kw["columns"] = sorted(kw["columns"])
            return _pd.DataFrame(*a, **kw)

    RVAL.pd = _PdProxy()

    from proteofav_spark.sources.validation import parse_validation_residues

    ref = RVAL.parse_validation_residues(
        f"{TD}/validation/2pah_validation.xml", excluded_cols=()
    )
    ref["validation_icode"] = ref["validation_icode"].replace(
        {"": "?", " ": "?"}
    )
    ref["validation_altcode"] = ref["validation_altcode"].replace(
        {"": ".", " ": "."}
    )
    ours = parse_validation_residues(
        spark, f"{TD}/validation/2pah_validation.xml"
    ).toPandas()
    shared = [c for c in ref.columns if c in ours.columns]
    assert len(shared) >= 20

    def cell(v):
        if v is None:
            return None
        if isinstance(v, float) and math.isnan(v):
            return None
        try:
            return round(float(v), 4)
        except (TypeError, ValueError):
            return str(v)

    def norm(df):
        return sorted(
            tuple(cell(r[c]) for c in shared) for _, r in df[shared].iterrows()
        )

    a, b = norm(ref), norm(ours)
    assert len(a) == len(b) == 653
    assert a == b, (sorted(set(a) - set(b))[:1], sorted(set(b) - set(a))[:1])


@pytest.mark.parametrize("xml", ["2w4o.xml", "3mn5.xml"])
def test_sifts_parse_differential(spark, xml):
    """parse_sifts_residues on the reference's SIFTS fixtures: every row
    equal across all shared columns (UniProt/PDB/CATH/SCOP/Pfam
    cross-references, region annotations, residue details). The
    reference side runs with excluded_cols=() so it also emits the
    InterPro/GO/EC/NCBI families both defaults exclude — the comparison
    covers the shared (default-visible) surface. lxml is shimmed with a
    stdlib-ElementTree adapter providing the two lxml-only surfaces the
    code touches (root.nsmap, etree.XMLSyntaxError); pandas.io.json's
    removed json_normalize alias is restored for the variants import
    sifts pulls in."""
    import pandas as _pd
    import pandas.io.json as _pij

    _ref()  # base scipy/requests_cache stubs
    if not hasattr(_pij, "json_normalize"):
        _pij.json_normalize = _pd.json_normalize
    _lxml_shim()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.sifts as RSI
    finally:
        sys.path.remove("/root/reference")

    from proteofav_spark.sources.sifts import parse_sifts_residues

    ref = RSI.parse_sifts_residues(f"{TD}/sifts/{xml}", excluded_cols=())
    ours = parse_sifts_residues(spark, f"{TD}/sifts/{xml}").toPandas()
    shared = [c for c in ref.columns if c in ours.columns]
    assert len(shared) >= 25

    def cell(v):
        if v is None:
            return None
        if isinstance(v, float) and math.isnan(v):
            return None
        try:
            return round(float(v), 4)
        except (TypeError, ValueError):
            return str(v)

    def norm(df):
        return sorted(
            tuple(cell(r[c]) for c in shared) for _, r in df[shared].iterrows()
        )

    a, b = norm(ref), norm(ours)
    assert len(a) == len(b) > 300
    assert a == b, (sorted(set(a) - set(b))[:1], sorted(set(b) - set(a))[:1])


def test_flagship_merge_differential(spark):
    """CAPSTONE: the reference's ENTIRE flagship pipeline run live —
    parse_mmcif_atoms → filter_structures(chain A, CA) ⟕
    parse_dssp_residues → filter_dssp ⟕ parse_sifts_residues →
    filter_sifts, composed by the reference's own table_merger — equals
    our pipeline row-for-row: 278 merged residues, 65 shared columns
    (atom records, DSSP SS/ACC/RSA angles, SIFTS cross-references). This
    is the end-to-end equivalence the 278-row count pin approximated."""
    import pandas as _pd
    import pandas.io.json as _pij

    RS, RD, _ = _ref()
    if not hasattr(_pij, "json_normalize"):
        _pij.json_normalize = _pd.json_normalize
    _lxml_shim()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.mergers as RM
            import proteofav.sifts as RSI
    finally:
        sys.path.remove("/root/reference")

    from proteofav_spark.operators.structures import filter_structures
    from proteofav_spark.plans.mergers import table_merger
    from proteofav_spark.sources.dssp import filter_dssp, parse_dssp_residues
    from proteofav_spark.sources.sifts import filter_sifts, parse_sifts_residues
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    m_ref = RS.filter_structures(
        RS.parse_mmcif_atoms(f"{TD}/mmcif/2w4o.cif", excluded_cols=()),
        chains=("A",),
        atoms=("CA",),
    )
    d_ref = RD.filter_dssp(
        RD.parse_dssp_residues(f"{TD}/dssp/2w4o.dssp"), chains=("A",)
    )
    s_ref = RSI.filter_sifts(
        RSI.parse_sifts_residues(f"{TD}/sifts/2w4o.xml", excluded_cols=()),
        chains=("A",),
    )
    merged_ref = RM.table_merger(
        mmcif_table=m_ref, dssp_table=d_ref, sifts_table=s_ref
    )

    m = filter_structures(
        parse_mmcif_atoms(spark, f"{TD}/mmcif/2w4o.cif"),
        chains=("A",),
        atoms=("CA",),
    )
    d = filter_dssp(parse_dssp_residues(spark, f"{TD}/dssp/2w4o.dssp"), chains=("A",))
    s = filter_sifts(
        parse_sifts_residues(spark, f"{TD}/sifts/2w4o.xml"), chains=("A",)
    )
    ours = table_merger(m, d, s).toPandas()

    shared = [c for c in merged_ref.columns if c in ours.columns]
    assert len(shared) >= 60

    def cell(v):
        if v is None:
            return None
        if isinstance(v, float) and math.isnan(v):
            return None
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            t = tuple(str(x) for x in v)
            return t if t else None
        try:
            return round(float(v), 4)
        except (TypeError, ValueError):
            return str(v)

    def norm(df):
        return sorted(
            tuple(cell(r[c]) for c in shared) for _, r in df[shared].iterrows()
        )

    a, b = norm(merged_ref), norm(ours)
    assert len(a) == len(b) == 278
    assert a == b, (sorted(set(a) - set(b))[:1], sorted(set(b) - set(a))[:1])


# ---------------------------------------------------------------------------
# MSA readers + variants flatteners (round 11: the last two parser
# families previously pinned only by recorded-expectation fixtures)
# ---------------------------------------------------------------------------

class _Rec:
    """Minimal stand-in for a Biopython SeqRecord: only the three
    attributes the reference touches (msas.py:84-90)."""

    def __init__(self, rid, desc, seq):
        self.id, self.description, self.seq = rid, desc, seq


def _alignio_read(fn, fmt):
    """Biopython-absent AlignIO.read shim (same pattern as the lxml
    shim): a deliberately independent ~20-line parser for the two
    fixture formats, so the differential still executes the reference's
    read_msas assembly + all description-regex families live."""
    recs = []
    if fmt == "fasta":
        cur, seqs = None, []
        for line in open(fn):
            line = line.rstrip("\n")
            if line.startswith(">"):
                if cur is not None:
                    recs.append(_Rec(cur.split()[0], cur, "".join(seqs)))
                cur, seqs = line[1:], []
            elif line.strip():
                seqs.append(line.strip())
        if cur is not None:
            recs.append(_Rec(cur.split()[0], cur, "".join(seqs)))
    elif fmt == "stockholm":
        order, seqs = [], {}
        for line in open(fn):
            line = line.rstrip("\n")
            if not line.strip() or line.startswith(("#", "//")):
                continue
            name, chunk = line.split(None, 1)
            if name not in seqs:
                order.append(name)
                seqs[name] = []
            seqs[name].append(chunk.strip())
        recs = [_Rec(n, n, "".join(seqs[n])) for n in order]
    else:  # pragma: no cover - fixtures are fasta/stockholm only
        raise ValueError(fmt)
    return recs


@lru_cache(maxsize=1)
def _ref_msas_vars():
    """Import the reference's msas/variants modules with three more
    bitrot restorations: pandas≥2 removed ``pandas.io.json.
    json_normalize`` (module-level import in variants.py:9) and
    ``DataFrame.append`` (merging_down_by_key, utils.py:281-306 — the
    restored shim is the documented pd.concat equivalent), and
    Biopython is absent (AlignIO shimmed like lxml)."""
    import pandas as pd
    import pandas.io.json as pij

    _ref()  # annotation/config stubs first (shared scipy/requests_cache)
    _lxml_shim()  # mergers → sifts/validation import lxml at module load
    if not hasattr(pij, "json_normalize"):
        pij.json_normalize = pd.json_normalize
    if not hasattr(pd.DataFrame, "append"):
        pd.DataFrame.append = lambda self, other, **k: pd.concat([self, other])
    bio = _stub("Bio")
    alignio = _stub("Bio.AlignIO", read=_alignio_read)
    bio.AlignIO = alignio
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.mergers as RMG
            import proteofav.msas as RM
            import proteofav.variants as RV
    finally:
        sys.path.remove("/root/reference")
    return RM, RV, RMG


def _msa_cell(v):
    """MSA-table cell normalizer. The reference str-constrains every
    non-Start/End column (msas.py:103-105), so its missing values
    surface as the literal string 'nan' — normalize those (and true
    NaN/None) to None; integral floats (Start/End upcast by NaN rows)
    compare as ints."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return str(int(v)) if v == int(v) else str(round(v, 6))
    s = str(v)
    return None if s == "nan" else s


@pytest.mark.parametrize(
    "msa,min_cols",
    [
        ("PF00118.sth", 7),           # Pfam stockholm: Name/Accession/Start/End
        ("1.20.1070.10_7072.sth", 9),  # CATH stockholm: domains + name-less ids
        ("1.50.10.100_1318.fasta", 11),  # CATH fasta: cath|version|domain + biomap
    ],
)
def test_msa_read_differential(spark, msa, min_cols):
    """read_msas on the reference's three MSA fixtures: the reference's
    own reader + all six description-parser regex families
    (proteofav/msas.py:67-109,163-390) execute live (get_uniprot_id=False
    — the network accession overwrite is out of scope offline) and every
    shared column matches row-for-row, including the quirky ones: the
    generic identifier regex's post-underscore Accession ('B9LRY6_HALLT'
    → 'HALLT'), the CATH-domain pdb/chain/domain split, and the
    unconditional Source='CATH' stockholm fallback."""
    RM, _, _ = _ref_msas_vars()
    from proteofav_spark.sources.msas import read_msas

    ref = RM.read_msas(f"{TD}/msas/{msa}", get_uniprot_id=False)
    ours = read_msas(spark, f"{TD}/msas/{msa}").toPandas()
    shared = [c for c in ref.columns if c in ours.columns]
    assert len(shared) >= min_cols, shared

    def norm(df):
        return sorted(
            (
                tuple(_msa_cell(r[c]) for c in shared)
                for _, r in df[shared].iterrows()
            ),
            key=lambda t: tuple((x is None, str(x)) for x in t),
        )

    a, b = norm(ref), norm(ours)
    assert len(a) == len(b), (len(a), len(b))
    assert a == b, (
        sorted(set(a) - set(b))[:1],
        sorted(set(b) - set(a))[:1],
    )


# The reference's OWN recorded API payloads (verbatim from
# reference/tests/test_variants.py:227-301 — public test fixtures): a
# UniProt Proteins-API variants response and two Ensembl REST
# overlap/translation responses.
_EBI_VARS_P17612 = """{"accession":"P17612", "entryName":"KAPCA_HUMAN", "sequence":
"MGNAAAAKKGSEQESVKEFLAKAKEDFLKKWESPAQNTAHLDQFERIKTLGTGSFGRVMLVKHKETGNHYAMKILDKQKVVKLKQIEHTLNEKRILQAVNFPFLVKLEFSFKDNSNLYMVMEYVPGGEMFSHLRRIGRFSEPHARFYAAQIVLTFEYLHSLDLIYRDLKPENLLIDQQGYIQVTDFGFAKRVKGRTWTLCGTPEYLAPEIILSKGYNKAVDWWALGVLIYEMAAGYPPFFADQPIQIYEKIVSGKVRFPSHFSSDLKDLLRNLLQVDLTKRFGNLKNGVNDIKNHKWFATTDWIAIYQRKVEAPFIPKFKGPGDTSNFDDYEEEEIRVSINEKCGKEFSEF",                    "sequenceChecksum":"13793750284533818795", "taxid":9606,                   "features":[{"type":"VARIANT","ftId":"VAR_040591","alternativeSequence":"V","begin":"41","end":"41","xrefs":[{"name":"dbSNP","id":"rs56029020","url":"http://www.ncbi.nlm.nih.gov/SNP/snp_ref.cgi?type=rs&rs=rs56029020"},{"name":"Ensembl","id":"rs56029020","url":"http://www.ensembl.org/id/rs56029020"}],"wildType":"L","somaticStatus":0,"consequenceType":"missense","sourceType":"uniprot"},{"type":"VARIANT","alternativeSequence":"I","begin":"252","end":"252","xrefs":[{"name":"ExAC","id":"rs760535486","url":"http://exac.broadinstitute.org/awesome?query=rs760535486"}],"wildType":"V","polyphenPrediction":"benign","polyphenScore":0.025,"siftPrediction":"tolerated","siftScore":0.21,"somaticStatus":0,"cytogeneticBand":"19p13.12","consequenceType":"missense", "genomicLocation":"NC_000019.10:g.14097372C>T","sourceType":"large_scale_study"}]} """

_ENS_TRANSCRIPT_VARS = """[{"polyphen":0.908,"sift":0.06,"feature_type":"transcript_variation","clinical_significance":[],"Parent":"ENST00000288602","codons":"Cca/Gca","end":622,"seq_region_name":"ENSP00000288602","residues":"P/A","minor_allele_frequency":null,"id":"rs746074624","translation":"ENSP00000288602","allele":"G/C","type":"missense_variant","start":622},{"polyphen":0.95,"sift":0,"feature_type":"transcript_variation","clinical_significance":["pathogenic"],"Parent":"ENST00000288602","codons":"Gca/Cca","end":246,"seq_region_name":"ENSP00000288602","residues":"A/P","minor_allele_frequency":null,"id":"rs180177034","translation":"ENSP00000288602","allele":"C/G","type":"missense_variant","start":246}]"""

_ENS_SOMATIC_VARS = """[{"polyphen":null,"sift":null,"feature_type":"somatic_transcript_variation","clinical_significance":[],"Parent":"ENST00000288602","codons":"","end":433,"seq_region_name":"ENSP00000288602","residues":"","minor_allele_frequency":null,"id":"COSM3832072","translation":"ENSP00000288602","allele":"COSMIC_MUTATION","type":"coding_sequence_variant","start":433},{"polyphen":null,"sift":null,"feature_type":"somatic_transcript_variation","clinical_significance":[],"Parent":"ENST00000288602","codons":"","end":698,"seq_region_name":"ENSP00000288602","residues":"","minor_allele_frequency":null,"id":"COSM452456","translation":"ENSP00000288602","allele":"COSMIC_MUTATION","type":"coding_sequence_variant","start":698}]"""


class _fake_resp:
    """The reference's flatteners accept a requests Response (list
    payloads arrive via .json(), variants.py:674-678)."""

    def __init__(self, data):
        self._d = data

    def json(self):
        return self._d


def _vars_cell(v, dp=6):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, dp)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # elements recurse through the SAME normalization — a singleton
        # [0.9] must equal the reference's scalar 0.9, not the string
        # '0.9' (r12 fuzz caught the str() shortcut here)
        t = tuple(sorted((_vars_cell(x, dp) for x in v), key=repr))
        if not t:
            return None  # reference: [] stays; ours: [] — both → None
        # the reference unwraps singleton lists PER ROW
        # (refactor_key_val_singletons); a Spark column has ONE type, so
        # ours stays array<> when any row is multi-valued — normalize
        # singleton containers to their element for comparison
        return t[0] if len(t) == 1 else t
    return str(v)


def _none_safe_key(t):
    return tuple((x is None, str(x)) for x in t)


def _vars_compare(ref_pdf, spark_df, min_cols):
    ours = spark_df.toPandas()
    shared = [c for c in ref_pdf.columns if c in ours.columns]
    assert len(shared) >= min_cols, shared

    def norm(df):
        return sorted(
            (
                tuple(_vars_cell(r[c]) for c in shared)
                for _, r in df[shared].iterrows()
            ),
            key=_none_safe_key,
        )

    a, b = norm(ref_pdf), norm(ours)
    assert len(a) == len(b), (len(a), len(b))
    assert a == b, (sorted(set(a) - set(b), key=repr)[:1], sorted(set(b) - set(a), key=repr)[:1])


def _spark_json(spark, tmp_path, payload: str, name: str):
    import json as _json

    data = _json.loads(payload)
    p = tmp_path / name
    if isinstance(data, list):
        p.write_text("\n".join(_json.dumps(r) for r in data))
    else:
        p.write_text(_json.dumps(data))
    return spark.read.json(str(p))


def test_uniprot_variants_flatten_differential(spark, tmp_path):
    """flatten_uniprot_variants_ebi (proteofav/variants.py:622-661 +
    flatten_nested_structure/refactor_key_val_singletons,
    utils.py:310-353) executes live on the reference's own P17612
    payload and matches our schema-driven flatten_structs pipeline
    row-for-row — including the duplicate-xref collapse (dbSNP+Ensembl
    both carrying rs56029020 fold to one row) and the int begin/end vs
    string begin/end type normalization."""
    import json as _json

    _, RV, _ = _ref_msas_vars()
    from proteofav_spark.sources.variants import flatten_uniprot_variants

    ref = RV.flatten_uniprot_variants_ebi(_json.loads(_EBI_VARS_P17612))
    ours = flatten_uniprot_variants(
        _spark_json(spark, tmp_path, _EBI_VARS_P17612, "p17612.json")
    )
    assert len(ref) == 2
    _vars_compare(ref, ours, min_cols=15)


@pytest.mark.parametrize(
    "payload,name",
    [(_ENS_TRANSCRIPT_VARS, "transcript"), (_ENS_SOMATIC_VARS, "somatic")],
)
def test_ensembl_variants_flatten_differential(spark, tmp_path, payload, name):
    """flatten_ensembl_variants (proteofav/variants.py:664-700) live on
    the reference's own transcript/somatic payloads: the
    ensembl→uniprot column renames, type constraining, and xrefs_id
    split/merge round-trip match row-for-row (clinical_significance
    empty lists and NaN sift/polyphen normalize identically)."""
    import json as _json

    _, RV, _ = _ref_msas_vars()
    from proteofav_spark.sources.variants import flatten_ensembl_variants

    ref = RV.flatten_ensembl_variants(_fake_resp(_json.loads(payload)))
    ours = flatten_ensembl_variants(
        _spark_json(spark, tmp_path, payload, f"{name}.json")
    )
    assert len(ref) == 2
    _vars_compare(ref, ours, min_cols=12)


def test_ensembl_variants_synonymous_filter_differential(spark, tmp_path):
    """synonymous=False routes through the reference's
    row_selector(reverse=True) (variants.py:695-698, utils.py:97-126):
    pandas `!=` keeps NaN consequence rows — pin that OUR filter keeps
    NULLs too, on a payload with a synonymous, a missense, and a
    null-consequence record."""
    import json as _json

    _, RV, _ = _ref_msas_vars()
    from proteofav_spark.sources.variants import flatten_ensembl_variants

    base = _json.loads(_ENS_TRANSCRIPT_VARS)
    base[0]["type"] = "synonymous_variant"
    base[1]["type"] = None
    payload = _json.dumps(base)
    ref = RV.flatten_ensembl_variants(
        _fake_resp(_json.loads(payload)), synonymous=False
    )
    ours = flatten_ensembl_variants(
        _spark_json(spark, tmp_path, payload, "syn.json"), synonymous=False
    )
    assert len(ref) == 1  # only the synonymous row drops; NaN row stays
    _vars_compare(ref, ours, min_cols=12)


def test_vars_merger_differential(spark, tmp_path):
    """Capstone for the variants family: the reference's OWN
    uniprot_vars_ensembl_vars_merger (proteofav/mergers.py:193-219)
    composes its two live flatteners, ours composes ours, and the outer
    7-key merge + xrefs_id collapse match row-for-row."""
    import json as _json

    _, RV, RMG = _ref_msas_vars()
    from proteofav_spark.sources.variants import (
        flatten_ensembl_variants,
        flatten_uniprot_variants,
        uniprot_vars_ensembl_vars_merger,
    )

    # the P17612 payload carries no 'frequency' field and the reference
    # merger REQUIRES all 7 merge keys (mergers.py:203-216) — inject one
    # per feature so both engines run the same 7-key outer merge
    upayload = _json.loads(_EBI_VARS_P17612)
    for i, feat in enumerate(upayload["features"]):
        feat["frequency"] = 0.001 * (i + 1)
    ref_u = RV.flatten_uniprot_variants_ebi(upayload)
    ref_e = RV.flatten_ensembl_variants(_fake_resp(_json.loads(_ENS_TRANSCRIPT_VARS)))
    # minor_allele_frequency is all-null in this payload → pandas≥2
    # leaves an object column of Nones and refuses the float-vs-object
    # merge key; float-cast restores the contemporary merge behavior
    ref_e["frequency"] = ref_e["frequency"].astype(float)
    ref = RMG.uniprot_vars_ensembl_vars_merger(ref_u, ref_e)

    u = flatten_uniprot_variants(
        _spark_json(spark, tmp_path, _json.dumps(upayload), "u.json")
    )
    e = flatten_ensembl_variants(
        _spark_json(spark, tmp_path, _ENS_TRANSCRIPT_VARS, "e.json")
    )
    ours = uniprot_vars_ensembl_vars_merger(u, e)
    assert len(ref) == 4
    _vars_compare(ref, ours, min_cols=20)


# ---------------------------------------------------------------------------
# round 11, batch 2: the reference functions not yet executed live —
# remaining residues_aggregation methods, the composed filter_dssp /
# filter_validation option sets, and the three per-source mergers the
# flagship capstone does not traverse (validation / annotation / variants)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1)
def _ref_more():
    """Validation + mergers, imported once with the shared shims, plus
    the validation module's own pandas≥2 restorations (set-typed
    ``columns=`` proxy — same shim the parse differential documents)."""
    import pandas as _pd
    import pandas.io.json as _pij

    _ref()
    if not hasattr(_pij, "json_normalize"):
        _pij.json_normalize = _pd.json_normalize
    _lxml_shim()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.mergers as RMG
            import proteofav.validation as RVA
    finally:
        sys.path.remove("/root/reference")

    class _PdProxy:
        def __getattr__(self, k):
            return getattr(_pd, k)

        def DataFrame(self, *a, **kw):
            if isinstance(kw.get("columns"), (set, frozenset)):
                kw["columns"] = sorted(kw["columns"])
            return _pd.DataFrame(*a, **kw)

    RVA.pd = _PdProxy()
    return RVA, RMG


def _coerce_cell(v, dp: int = 4):
    """Numeric-coercing normalizer (same rationale as the validation
    parse differential: the reference's per-column astype falls back to
    strings where a column mixes None, ours try_casts per value)."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # sorted: the reference's tuple(set(...)) order is arbitrary
        t = tuple(sorted(str(x) for x in v))
        if not t:
            return None
        # per-row singleton unwrap vs one-typed Spark column — same
        # normalization (and rationale) as _vars_cell above
        return t[0] if len(t) == 1 else t
    try:
        return round(float(v), dp)
    except (TypeError, ValueError):
        return str(v)


def _assert_frames_equal_coerced(ref_pdf, spark_df, dp: int = 4,
                                 min_shared: int = 10):
    ours = spark_df.toPandas()
    shared = [c for c in ref_pdf.columns if c in ours.columns]
    assert len(shared) >= min_shared, shared

    def norm(df):
        return sorted(
            (
                tuple(_coerce_cell(r[c], dp) for c in shared)
                for _, r in df[shared].iterrows()
            ),
            key=_none_safe_key,
        )

    a, b = norm(ref_pdf), norm(ours)
    assert len(a) == len(b), (len(a), len(b))
    assert a == b, (sorted(set(a) - set(b))[:1], sorted(set(b) - set(a))[:1])


@pytest.mark.parametrize("method", ["backbone_centroid", "first"])
def test_residues_aggregation_methods_differential(spark, method):
    """residues_aggregation's remaining deterministic methods run live
    (proteofav/structures.py:483-512): 'backbone_centroid' (CA/N/C/O
    pre-filter then mean) and 'first' (pandas groupby 'first' ↔ our
    min_by over file order). Every shared column equal at 4 dp on 2w4o
    chain A — the centroid method has its own 6-dp test above."""
    RS, _, _ = _ref()
    from proteofav_spark.operators.structures import residues_aggregation
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    t = RS.parse_mmcif_atoms(f"{TD}/mmcif/2w4o.cif", excluded_cols=())
    ref = RS.residues_aggregation(
        t[t.auth_asym_id == "A"].copy(), agg_method=method
    )
    s = parse_mmcif_atoms(spark, f"{TD}/mmcif/2w4o.cif").filter(
        F.col("auth_asym_id") == "A"
    )
    ours = residues_aggregation(s, agg_method=method).toPandas()
    # keyed float-isclose comparison instead of rounded set-equality:
    # pandas mean and Spark avg agree to ~1e-12, but a 4-atom backbone
    # mean can land exactly on a decimal .5 boundary where ANY fixed-dp
    # rounding splits the two engines apart
    shared = [c for c in ref.columns if c in ours.columns and c != "index"]
    assert len(shared) >= 10, shared

    def keyed(df):
        return {
            (
                str(r["pdbx_PDB_model_num"]),
                str(r["auth_asym_id"]),
                str(r["auth_seq_id"]),
            ): r
            for _, r in df.iterrows()
        }

    kr, ko = keyed(ref), keyed(ours)
    assert set(kr) == set(ko) and len(kr) == len(ref) == len(ours)
    for k, r in kr.items():
        o = ko[k]
        for c in shared:
            a, b = r[c], o[c]
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (k, c, a, b)
            else:
                fa, fb = None, None
                try:
                    fa, fb = float(a), float(b)
                except (TypeError, ValueError):
                    pass
                if fa is not None and fb is not None:
                    assert math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9), (
                        k, c, a, b,
                    )
                else:
                    assert str(a) == str(b), (k, c, a, b)


def test_residues_aggregation_unique_differential(spark):
    """residues_aggregation('unique'): the reference emits per-group
    numpy arrays in order of appearance; our column-typed twin emits a
    SORTED distinct list rendered as a string (a Spark cell has one
    type). Compare as sets per group on the string columns where the
    rendering is unambiguous (atom ids / residue names contain no
    commas), plus the 'first id' contract."""
    RS, _, _ = _ref()
    from proteofav_spark.operators.structures import residues_aggregation
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    t = RS.parse_mmcif_atoms(f"{TD}/mmcif/2w4o.cif", excluded_cols=())
    ref = RS.residues_aggregation(
        t[t.auth_asym_id == "A"].copy(), agg_method="unique"
    )
    s = parse_mmcif_atoms(spark, f"{TD}/mmcif/2w4o.cif").filter(
        F.col("auth_asym_id") == "A"
    )
    ours = residues_aggregation(s, agg_method="unique").toPandas()

    def key(df, model, seq):
        return df[
            (df["pdbx_PDB_model_num"].astype(str) == str(model))
            & (df["auth_seq_id"].astype(str) == str(seq))
        ].iloc[0]

    assert len(ref) == len(ours)
    for _, r in ref.iterrows():
        o = key(ours, r["pdbx_PDB_model_num"], r["auth_seq_id"])
        for col in ("label_atom_id", "auth_comp_id", "type_symbol"):
            ref_set = sorted({str(v) for v in r[col]})
            got = o[col]
            assert got.startswith("[") and got.endswith("]"), got
            got_set = sorted(got[1:-1].split(", ")) if got != "[]" else []
            assert got_set == ref_set, (col, r["auth_seq_id"], got, ref_set)
        assert str(o["id"]) == str(r["id"])  # 'first id' contract


def test_filter_dssp_composed_differential(spark):
    """The composed filter_dssp option set run live
    (proteofav/dssp.py:342-411): full-chain rename + SS fill + reduced
    SS + RSA + RSA class + chain selection + LINE renumber in ONE call —
    the individual extensions have their own diffs above, this pins
    their composition order on 2w4o chain A."""
    _, RD, _ = _ref()
    from proteofav_spark.sources.dssp import filter_dssp, parse_dssp_residues

    ref = RD.filter_dssp(
        RD.parse_dssp_residues(f"{TD}/dssp/2w4o.dssp"),
        chains=("A",),
        add_ss_reduced=True,
        add_rsa_class=True,
        reset_res_id=True,
    )
    ours = filter_dssp(
        parse_dssp_residues(spark, f"{TD}/dssp/2w4o.dssp"),
        chains=("A",),
        add_ss_reduced=True,
        add_rsa_class=True,
        reset_res_id=True,
    )
    _assert_frames_equal(ref, ours, dp=3)


def test_validation_merge_differential(spark):
    """mmcif_validation_table_merger run live
    (proteofav/mergers.py:103-138) over the reference's own
    filter_validation output (validation.py:142-175, res_full added) and
    its chain-A CA mmCIF selection — the one per-source merger family
    the flagship capstone does not traverse."""
    RS, _, _ = _ref()
    RVA, RMG = _ref_more()
    from proteofav_spark.operators.structures import filter_structures
    from proteofav_spark.plans.mergers import mmcif_validation_table_merger
    from proteofav_spark.sources.structures import parse_mmcif_atoms
    from proteofav_spark.sources.validation import (
        filter_validation,
        parse_validation_residues,
    )

    m_ref = RS.filter_structures(
        RS.parse_mmcif_atoms(f"{TD}/mmcif/2pah.cif", excluded_cols=()),
        chains=("A",),
        atoms=("CA",),
    )
    v_raw = RVA.parse_validation_residues(
        f"{TD}/validation/2pah_validation.xml"
    )
    # same icode/altcode bitrot restoration as the parse differential:
    # the reference's str.replace regexes are no-ops under pandas≥2, and
    # filter_validation's res_full (resnum + icode minus '?') needs the
    # intended '?' or every key grows a trailing space and nothing joins
    v_raw["validation_icode"] = v_raw["validation_icode"].replace(
        {"": "?", " ": "?"}
    )
    v_raw["validation_altcode"] = v_raw["validation_altcode"].replace(
        {"": ".", " ": "."}
    )
    v_ref = RVA.filter_validation(v_raw, chains=("A",))
    ref = RMG.mmcif_validation_table_merger(m_ref, v_ref)

    m = filter_structures(
        parse_mmcif_atoms(spark, f"{TD}/mmcif/2pah.cif"),
        chains=("A",),
        atoms=("CA",),
    )
    v = filter_validation(
        parse_validation_residues(
            spark, f"{TD}/validation/2pah_validation.xml"
        ),
        chains=("A",),
    )
    ours = mmcif_validation_table_merger(m, v)
    assert len(ref) > 100
    # the validation columns must actually join (not an all-NULL left)
    assert ref["validation_rsrz"].notna().sum() > 100
    _assert_frames_equal_coerced(ref, ours, dp=3)


def test_sifts_annotation_merge_differential(spark):
    """sifts_annotation_table_merger run live
    (proteofav/mergers.py:141-164) over the reference's own aggregated
    GFF annotation (filter_annotation(annotation_agg=True), one row per
    residue with ', '-joined labels) left-joined onto the 2pah SIFTS
    residues by (accession, site)."""
    _, _, RA = _ref()
    _, RMG = _ref_more()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.sifts as RSI
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.plans.mergers import sifts_annotation_table_merger
    from proteofav_spark.sources.annotation import (
        filter_annotation,
        parse_gff_features,
    )
    from proteofav_spark.sources.sifts import parse_sifts_residues

    s_ref = RSI.parse_sifts_residues(f"{TD}/sifts/2pah.xml", excluded_cols=())
    a_ref = RA.filter_annotation(
        RA.parse_gff_features(f"{TD}/annotation/P00439.gff"),
        identifier="P00439",
        annotation_agg=True,
    )
    ref = RMG.sifts_annotation_table_merger(s_ref, a_ref)

    s = parse_sifts_residues(spark, f"{TD}/sifts/2pah.xml")
    a = filter_annotation(
        parse_gff_features(spark, f"{TD}/annotation/P00439.gff"),
        identifier="P00439",
        annotation_agg=True,
    )
    # DELIBERATE divergence, normalized for comparison: the reference's
    # _annotation_writer str-formats the parse_qs LIST values straight
    # into the annotation string ("Natural variant: ['In HPA. F->L']
    # (['VAR_069776'])" — python list reprs leaking into user-facing
    # text); we emit the joined scalars. Strip the brackets/quotes from
    # both sides so everything else about the writer template, interval
    # explosion, residue grouping, and the merge keys still compares.
    # Second deliberate divergence: the reference's `if not gff_row.ID`
    # is False for NaN (NaN is truthy), so rows MISSING an ID/Note take
    # the has-value branch and format the literal "nan" into the text
    # ("Sequence conflict: E->G (nan)"); we treat NULL as absent.
    import re as _re

    def _unrepr(s):
        if not isinstance(s, str):
            return s
        s = _re.sub(r"[\[\]']", "", s)
        return s.replace(" (nan)", "").replace(": nan", "")

    ref["annotation"] = ref["annotation"].map(_unrepr)
    ours = sifts_annotation_table_merger(s, a).withColumn(
        "annotation", F.regexp_replace("annotation", r"[\[\]']", "")
    )
    assert len(ref) > 300
    # the annotated rows must actually hit (left join with real matches)
    assert ref["site"].notna().sum() > 50
    _assert_frames_equal_coerced(ref, ours, dp=3)


def test_sifts_variants_merge_differential(spark, tmp_path):
    """sifts_variants_table_merger run live
    (proteofav/mergers.py:167-190): the reference's own flattened
    UniProt variants (accession re-pointed at P00439 with begins inside
    2pah's UniProt residue range so the left join HITS) merged onto the
    2pah SIFTS residues by (accession, begin), with the reference's
    in-merger begin→str cast."""
    import json as _json

    _, RV, _ = _ref_msas_vars()
    _, RMG = _ref_more()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.sifts as RSI
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.plans.mergers import sifts_variants_table_merger
    from proteofav_spark.sources.sifts import parse_sifts_residues
    from proteofav_spark.sources.variants import flatten_uniprot_variants

    payload = _json.loads(_EBI_VARS_P17612)
    payload["accession"] = "P00439"
    for feat, begin in zip(payload["features"], ("118", "120")):
        feat["begin"] = begin
        feat["end"] = begin
    vars_json = _json.dumps(payload)

    s_ref = RSI.parse_sifts_residues(f"{TD}/sifts/2pah.xml", excluded_cols=())
    v_ref = RV.flatten_uniprot_variants_ebi(_json.loads(vars_json))
    ref = RMG.sifts_variants_table_merger(s_ref, v_ref)

    s = parse_sifts_residues(spark, f"{TD}/sifts/2pah.xml")
    v = flatten_uniprot_variants(
        _spark_json(spark, tmp_path, vars_json, "p00439v.json")
    )
    ours = sifts_variants_table_merger(s, v)
    assert len(ref) > 300
    assert ref["xrefs_id"].notna().sum() >= 2  # the join hit both variants
    _assert_frames_equal_coerced(ref, ours, dp=4)


def test_filter_structures_composed_differential(spark):
    """The composed filter_structures option set run live on the
    altloc-heavy fixture (proteofav/structures.py:777-860): first-model
    select + ATOM lines + altloc removal + partial-residue removal +
    atom-id reset + res_full + altloc label, all in ONE call — the two
    removal loops have individual diffs above; this pins their
    composition ORDER (altlocs drop before the partial-residue run
    detection sees the table, so a residue completed only across
    altlocs survives identically on both sides)."""
    RS, _, _ = _ref()
    from proteofav_spark.operators.structures import filter_structures
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    ref = RS.filter_structures(
        RS.parse_mmcif_atoms(f"{TD}/mmcif/4ibw.cif", excluded_cols=()),
        models="first",
        lines=("ATOM",),
        remove_altloc=True,
        remove_partial_res=True,
        add_atom_altloc=True,
    )
    ours = filter_structures(
        parse_mmcif_atoms(spark, f"{TD}/mmcif/4ibw.cif"),
        models="first",
        lines=("ATOM",),
        remove_altloc=True,
        remove_partial_res=True,
        add_atom_altloc_col=True,
    )
    assert len(ref) > 1000
    _assert_frames_equal(ref, ours, dp=4)


def test_chimera_writers_differential(spark):
    """The Chimera exporters run live (proteofav/visualise.py:14-79):
    the attribute file's SEMANTIC content — attribute name, match mode,
    recipient, and the full per-residue (:res, value) assignment set —
    equals the reference's on the 2w4o chain-A DSSP SS column, and the
    command file is byte-identical. Header cosmetics differ
    deliberately (generator banner; the reference's triple-quoted
    template leaks 4-space indentation into its header lines), so the
    comparison parses both files instead of diffing raw text."""
    _, RD, _ = _ref()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.visualise as RVIS
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.sinks.writers import (
        make_chimera_attribute_file,
        make_chimera_command_file,
    )
    from proteofav_spark.sources.dssp import filter_dssp, parse_dssp_residues

    d_ref = RD.filter_dssp(
        RD.parse_dssp_residues(f"{TD}/dssp/2w4o.dssp"), chains=("A",)
    )
    col = d_ref.set_index("RES")["SS"]
    ref_text = RVIS.make_chimera_attribute_file(col)

    d = filter_dssp(
        parse_dssp_residues(spark, f"{TD}/dssp/2w4o.dssp"), chains=("A",)
    )
    our_text = make_chimera_attribute_file(d, value_col="SS", residue_col="RES")

    def parse(text):
        fields, pairs = {}, []
        for ln in text.splitlines():
            s = ln.strip()
            if s.startswith("#") or not s:
                continue
            if ":" in s and not s.startswith(":") and "\t" not in ln:
                k, _, v = s.partition(":")
                fields[k.strip()] = v.strip()
            elif ":" in s:
                res, _, val = s.lstrip("\t:").partition("\t")
                pairs.append((res, val))
        return fields, sorted(pairs)

    rf, rp = parse(ref_text)
    of, op = parse(our_text)
    assert rf["attribute"] == "SS" and of["attribute"] == "SS"
    assert rf["match mode"] == of["match mode"]
    assert rf["recipient"] == of["recipient"] == "residues"
    assert len(rp) > 200
    assert rp == op

    # command file: identical template logic, byte-identical output
    ref_cmd = RVIS.make_chimera_command_file(
        "2w4o.cif", content="defattr SS.chimera_attrFile"
    )
    our_cmd = make_chimera_command_file(
        "2w4o.cif", content="defattr SS.chimera_attrFile"
    )
    assert ref_cmd == our_cmd


# ---------------------------------------------------------------------------
# randomized differential: the stateful partial-residue loop (the one
# reference operator where r10's review found two live parity bugs —
# the dup-seq recurrence and the atom-completeness sets)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# soak knob: the randomized differentials default to small example counts
# for suite speed; export PROTEOFAV_SPARK_FUZZ_SCALE=5 (etc.) to multiply
# every fuzz family's budget for an out-of-band soak run
_FUZZ_SCALE = int(os.environ.get("PROTEOFAV_SPARK_FUZZ_SCALE", "1"))


def _ex(n: int) -> int:
    return n * _FUZZ_SCALE

_RUN = st.tuples(
    st.sampled_from(["GLY", "ALA", "SER", "HOH"]),  # HOH: non-AA passthrough
    st.sampled_from(["1", "2", "3"]),               # small → consecutive dups
    st.sampled_from(["ATOM", "HETATM"]),
    # atom subset mask over the residue's 5-atom candidate pool: 0 =>
    # empty run would vanish, so min 1
    st.integers(1, 31),
)


@given(runs=st.lists(_RUN, min_size=1, max_size=10))
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_remove_partial_residues_property_vs_reference(spark, runs):
    """Hypothesis-shrunk parity with the reference's OWN
    _remove_partial_residues loop (proteofav/structures.py:430-480) on
    tiny adversarial tables: consecutive equal-seq runs (the stateful
    alternation), missing-atom runs interleaved with complete ones,
    HETATM and non-AA passthrough rows, and the never-validated final
    run all arise naturally. The r10 bugs (stateless dup-seq rule;
    over-strict atom sets) would both fail this within a few examples."""
    import pandas as _pd

    RS, _, _ = _ref()
    from proteofav_spark.library import AA_DEFAULT_ATOMS
    from proteofav_spark.operators.structures import remove_partial_residues

    pool = {
        "GLY": ["N", "CA", "C", "O", "OXT"],
        "ALA": ["N", "CA", "C", "O", "CB"],
        "SER": ["N", "CA", "C", "O", "CB"],  # OG deliberately absent
        "HOH": ["O", "H1", "H2", "OXT", "CB"],
    }
    assert set(AA_DEFAULT_ATOMS["GLY"]) == {"N", "CA", "C", "O"}
    rows, n = [], 0
    for comp, seq, group, mask in runs:
        atoms = [a for i, a in enumerate(pool[comp]) if mask >> i & 1]
        for atom in atoms:
            rows.append(("f", n, group, comp, seq, atom))
            n += 1

    pdf = _pd.DataFrame(
        rows,
        columns=[
            "source_file", "line_no", "group_PDB",
            "auth_comp_id", "auth_seq_id", "auth_atom_id",
        ],
    )
    ref = RS._remove_partial_residues(pdf.copy())
    ref_kept = sorted(ref["line_no"].tolist())

    sdf = spark.createDataFrame(
        rows,
        ["source_file", "line_no", "group_PDB",
         "auth_comp_id", "auth_seq_id", "auth_atom_id"],
    )
    ours_kept = sorted(
        r["line_no"] for r in remove_partial_residues(sdf).collect()
    )
    assert ours_kept == ref_kept, (rows, ref_kept, ours_kept)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["N", "CA"]),
            st.sampled_from([".", "A", "B"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_remove_altlocs_property_vs_reference(spark, rows):
    """Hypothesis-shrunk parity with the reference's OWN
    _remove_multiple_altlocs loop (proteofav/structures.py:397-427):
    random interleavings of '.'/'A'/'B' altlocs over two atom names
    exercise the forward-scan semantics (runs broken by '.' rows or a
    different atom, chains ending at the table edge where the loop's
    KeyError break fires) — both the surviving row set AND the final
    label_alt_id values (every survivor rewritten to '.') must equal."""
    import pandas as _pd

    RS, _, _ = _ref()
    from proteofav_spark.operators.structures import remove_multiple_altlocs

    pdf = _pd.DataFrame(
        [(i, atom, alt) for i, (atom, alt) in enumerate(rows)],
        columns=["line_no", "label_atom_id", "label_alt_id"],
    )
    ref = RS._remove_multiple_altlocs(pdf.copy())
    ref_out = sorted(zip(ref["line_no"], ref["label_alt_id"]))

    sdf = spark.createDataFrame(
        [("f", i, atom, alt) for i, (atom, alt) in enumerate(rows)],
        ["source_file", "line_no", "label_atom_id", "label_alt_id"],
    )
    ours = remove_multiple_altlocs(sdf).collect()
    our_out = sorted((r["line_no"], r["label_alt_id"]) for r in ours)
    assert our_out == ref_out, (rows, ref_out, our_out)


@given(
    rows=st.lists(
        st.tuples(
            # key cell: None | scalar | list of 0-2 keys (empty list is
            # the trap: the reference's split loop emits NO row for it)
            st.one_of(
                st.none(),
                st.sampled_from(["x", "y"]),
                st.lists(st.sampled_from(["x", "y", "z"]), max_size=2),
            ),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_split_merge_property_vs_reference(spark, rows):
    """Hypothesis-shrunk parity with the reference's OWN
    splitting_up_by_key → merging_down_by_key composition
    (proteofav/utils.py:223-306) on random frames mixing scalar / None /
    list / EMPTY-list key cells and None values — the value-dedup order,
    null-dropping-when-multi, and empty-list-drops-the-row semantics all
    arise. Cells compare under the singleton/sort normalization (the
    reference's tuple(set(...)) order is arbitrary; ours is sorted)."""
    import pandas as _pd

    RS, _, _ = _ref()
    # merging_down_by_key uses DataFrame.append — restore the pandas≥2
    # removal (same shim _ref_msas_vars installs)
    if not hasattr(_pd.DataFrame, "append"):
        _pd.DataFrame.append = lambda self, other, **k: _pd.concat(
            [self, other]
        )
    _ref()  # installs the scipy/requests_cache stubs utils.py imports
    sys.path.insert(0, "/root/reference")
    try:
        import proteofav.utils as RU
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.core import merging_down_by_key, splitting_up_by_key
    from pyspark.sql import types as T

    pdf = _pd.DataFrame(rows, columns=["xrefs_id", "val"])
    ref = RU.merging_down_by_key(
        RU.splitting_up_by_key(pdf, key="xrefs_id"), key="xrefs_id"
    )

    # Spark's one-typed key column: scalars lift to 1-element arrays
    # (the reference treats scalar and [scalar] identically in split)
    def lift(v):
        if v is None:
            return None
        return [v] if isinstance(v, str) else list(v)

    schema = T.StructType([
        T.StructField("xrefs_id", T.ArrayType(T.StringType())),
        T.StructField("val", T.StringType()),
    ])
    sdf = spark.createDataFrame(
        [(lift(k), v) for k, v in rows], schema
    )
    ours = merging_down_by_key(
        splitting_up_by_key(sdf, key="xrefs_id"), key="xrefs_id"
    ).toPandas()

    def norm(df):
        return sorted(
            (
                (_coerce_cell(r["xrefs_id"]), _coerce_cell(r["val"]))
                for _, r in df.iterrows()
            ),
            key=_none_safe_key,
        )

    a, b = norm(ref), norm(ours)
    assert a == b, (rows, a, b)


@given(
    seq=st.text(
        alphabet="ACDZzqX?.*-bJU5 ",
        min_size=0,
        max_size=24,
    ),
    new_gap=st.sampled_from(["-", "."]),
)
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_check_sequence_property_vs_reference(spark, seq, new_gap):
    """Hypothesis parity with the reference's check_sequence
    (proteofav/utils.py:356-372) over strings mixing canonical letters,
    extended ambiguity codes, lowercase, digits, spaces, './*' and gaps
    — the r11 fix target (the old expr uppercased, dropped B/Z/J/U/O,
    and gap-mapped './*')."""
    _ref()  # scipy/requests_cache stubs BEFORE importing utils
    _ref()  # installs the scipy/requests_cache stubs utils.py imports
    sys.path.insert(0, "/root/reference")
    try:
        import proteofav.utils as RU
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.functions.sequences import check_sequence_expr

    ref = RU.check_sequence(seq, new_gap_symbol=new_gap)
    df = spark.createDataFrame([(seq,)], ["s"])
    got = df.select(
        check_sequence_expr("s", new_gap_symbol=new_gap).alias("c")
    ).first()["c"]
    assert (got or "") == ref, (seq, new_gap, ref, got)


@given(
    rows=st.lists(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=8,
    ),
    value=st.one_of(
        st.just("first"),
        st.sampled_from(["a", "b", "z"]),
        st.lists(st.sampled_from(["a", "b", "z"]), max_size=2).map(tuple),
    ),
    reverse=st.booleans(),
)
@settings(
    max_examples=_ex(20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_row_selector_property_vs_reference(spark, rows, value, reverse):
    """Hypothesis parity with the reference's row_selector
    (proteofav/utils.py:97-133) over NaN-bearing columns and every value
    shape (scalar / tuple / 'first') × reverse — the pandas semantics
    being pinned: NaN rows are DROPPED by == / isin but KEPT by the
    reverse (!= / ~isin) forms, and the 'first' branch ignores reverse
    entirely."""
    import numpy as _np
    import pandas as _pd

    RS, _, _ = _ref()
    _ref()  # installs the scipy/requests_cache stubs utils.py imports
    sys.path.insert(0, "/root/reference")
    try:
        import proteofav.utils as RU
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.core import EmptyTableError, row_selector

    pdf = _pd.DataFrame(
        {"line_no": range(len(rows)),
         "k": [_np.nan if r is None else r for r in rows]}
    )
    if value == "first" and pdf["k"].empty:
        return
    try:
        ref = RU.row_selector(pdf, key="k", value=value, reverse=reverse)
        ref_kept = sorted(ref["line_no"].tolist())
    except ValueError:  # the reference's own empty-result guard
        ref_kept = []

    from pyspark.sql import types as _T

    schema = _T.StructType([
        _T.StructField("line_no", _T.LongType()),
        _T.StructField("k", _T.StringType()),
    ])
    sdf = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], schema
    )
    try:
        out = row_selector(
            sdf, "k", value, reverse=reverse,
            order_col="line_no", check_empty=False,
        )
        ours_kept = sorted(r["line_no"] for r in out.collect())
    except EmptyTableError:
        ours_kept = []
    assert ours_kept == ref_kept, (rows, value, reverse, ref_kept, ours_kept)


@given(
    blocks=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),       # block chain id
            st.integers(1, 3),                  # residues in the block
            st.booleans(),                       # prepend a '!' gap row
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dssp_full_chain_property_vs_reference(spark, blocks):
    """Hypothesis parity with the reference's _add_dssp_full_chain
    (proteofav/dssp.py:153-194): random chain-block sequences separated
    by '!*' terminator rows, with optional '!' gap rows, exercise the
    BioUnit suffix counter's increment-on-same-chain /
    reset-on-chain-change / skip-markers semantics. (No leading or
    trailing '!*': the reference indexes ix±1 unguarded and would
    KeyError — a file-shape that real DSSP output never produces.)"""
    import pandas as _pd

    _, RD, _ = _ref()
    from proteofav_spark.sources.dssp import add_dssp_full_chain

    rows = []
    for i, (chain, size, gap) in enumerate(blocks):
        if i > 0:
            # terminator row between blocks: DSSP emits the PREVIOUS
            # chain's id on the '!*' line
            rows.append((blocks[i - 1][0], "!*"))
        if gap:
            rows.append((chain, "!"))
        rows.extend((chain, "G") for _ in range(size))

    pdf = _pd.DataFrame(rows, columns=["CHAIN", "AA"])
    ref = RD._add_dssp_full_chain(pdf.copy())
    ref_full = list(ref["CHAIN_FULL"])

    sdf = spark.createDataFrame(
        [("f", i, c, a) for i, (c, a) in enumerate(rows)],
        ["source_file", "line_no", "CHAIN", "AA"],
    )
    out = add_dssp_full_chain(sdf).orderBy("line_no").collect()
    our_full = [r["CHAIN_FULL"] for r in out]
    assert our_full == ref_full, (rows, ref_full, our_full)


@given(
    cols=st.dictionaries(
        keys=st.sampled_from(["p", "q", "r"]),
        values=st.lists(
            st.one_of(st.none(), st.sampled_from(["a", "b", "?"])),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_drop_empty_cols_property_vs_reference(spark, cols):
    """Hypothesis parity with the reference's drop_empty_cols block
    (proteofav/mergers.py:385-399, reached via table_merger): a column
    is hoisted to an attribute iff it has EXACTLY one non-null distinct
    value AND that value is not '?' (the reference keeps all-NaN columns
    and '?'-only columns in the table)."""
    import pandas as _pd

    _ref()
    from proteofav_spark.core import drop_empty_cols

    pdf = _pd.DataFrame({k: list(v) for k, v in cols.items()})
    # the reference's block is keyword-gated inside merge_tables
    # (proteofav/mergers.py:385-399) and needs a full multi-table
    # pipeline to reach — execute the loop verbatim instead
    ref = pdf.copy()
    for col in list(ref):
        value = ref[col].dropna().unique()
        if value.shape[0] == 1:
            if value[0] == "?":
                continue
            del ref[col]

    from pyspark.sql import types as _T

    schema = _T.StructType(
        [_T.StructField(k, _T.StringType()) for k in cols]
    )
    sdf = spark.createDataFrame(
        list(zip(*[cols[k] for k in cols])) if cols else [], schema
    )
    out, attrs = drop_empty_cols(sdf)
    assert sorted(out.columns) == sorted(ref.columns), (
        cols, sorted(ref.columns), sorted(out.columns), attrs,
    )


def test_scalar_kit_grid_differential(spark):
    """Exhaustive grid differential for the three DSSP scalar helpers run
    live: get_rsa over EVERY 1-letter residue code the reference's
    extended alphabet knows (plus lowercase/unknown) × all three ASA
    methods × several ACC values; get_rsa_class incl. the exact 5.0/25.0
    boundaries; the 8-state→HEC- SS reduction over every DSSP code. The
    reference returns '' where the typed column yields NULL — normalized
    here, everything else must match exactly (3-dp RSA values compare
    under isclose to absorb python banker's-rounding vs Spark HALF_UP on
    boundary-landing quotients)."""
    _, RD, _ = _ref()
    from proteofav_spark.functions.derived import (
        rsa_class_expr,
        rsa_expr,
        ss_reduce_expr,
    )

    letters = list("ACDEFGHIKLMNPQRSTVWYXBZJUO") + ["a", "?"]
    accs = [0.0, 10.0, 55.5, 123.4]
    methods = ["Sander", "Miller", "Wilke"]
    rows = [
        (f"{m}:{aa}:{acc}", aa, acc, m)
        for m in methods for aa in letters for acc in accs
    ]
    df = spark.createDataFrame(rows, ["k", "aa", "acc", "m"])
    for m in methods:
        got = {
            r["k"]: r["rsa"]
            for r in df.filter(F.col("m") == m)
            .select("k", rsa_expr("acc", "aa", method=m.lower()).alias("rsa"))
            .collect()
        }
        for aa in letters:
            for acc in accs:
                ref = RD.get_rsa(acc, aa, method=m)
                ours = got[f"{m}:{aa}:{acc}"]
                if ref == "":
                    assert ours is None, (m, aa, acc, ours)
                else:
                    assert ours is not None and abs(ours - ref) < 1e-6, (
                        m, aa, acc, ref, ours,
                    )

    rsa_vals = [0.0, 4.999, 5.0, 24.999, 25.0, 100.0, None]
    df2 = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rsa_vals)], "i: long, rsa: double"
    )
    got2 = {
        r["i"]: r["c"]
        for r in df2.select("i", rsa_class_expr("rsa").alias("c")).collect()
    }
    for i, v in enumerate(rsa_vals):
        ref = RD.get_rsa_class(v) if v is not None else "-"
        assert got2[i] == ref, (v, ref, got2[i])

    ss_codes = ["H", "E", "G", "I", "B", "C", "T", "S", "", " ", "Z"]
    df3 = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ss_codes)], "i: long, SS: string"
    )
    got3 = {
        r["i"]: r["c"]
        for r in df3.select("i", ss_reduce_expr("SS").alias("c")).collect()
    }
    import pandas as _pd

    ref3 = RD._add_dssp_ss_reduced(_pd.DataFrame({"SS": ss_codes}))
    for i, want in enumerate(ref3["SS_CLASS"]):
        assert got3[i] == want, (ss_codes[i], want, got3[i])


def test_annotation_aggregation_paths_differential(spark):
    """annotation_aggregation's other parameter paths run live
    (proteofav/annotation.py:67-103): group_residues=False (one row per
    feature-residue) and an explicit query_type filter. The exploded
    (residue, annotation) pair multiset matches on both paths. DELIBERATE
    divergence documented here: the reference's UNGROUPED `site` column
    is `table.index.astype(str)` — the exploded frame's RangeIndex, i.e.
    the ROW POSITION, not the residue — while ours keeps the residue
    number; the comparison therefore keys on `idx`, which both sides
    agree is the residue."""
    import re as _re

    _, _, RA = _ref()
    from proteofav_spark.sources.annotation import (
        annotation_aggregation,
        parse_gff_features,
    )

    def _unrepr(s):
        if not isinstance(s, str):
            return s
        s = _re.sub(r"[\[\]']", "", s)
        return s.replace(" (nan)", "").replace(": nan", "")

    ref_gff = RA.parse_gff_features(f"{TD}/annotation/P00439.gff")
    gff = parse_gff_features(spark, f"{TD}/annotation/P00439.gff")

    # ungrouped: per feature-residue rows
    ref_u = RA.annotation_aggregation(
        ref_gff, identifier="P00439", group_residues=False
    )
    ours_u = annotation_aggregation(
        gff, identifier="P00439", group_residues=False
    ).collect()
    a = sorted((int(r["idx"]), _unrepr(r["annotation"])) for _, r in ref_u.iterrows())
    b = sorted((int(r["idx"]), _unrepr(r["annotation"])) for r in ours_u)
    assert len(a) == len(b) > 250
    assert a == b, (a[:2], b[:2])

    # query_type: single feature family selected before the explode
    ref_q = RA.annotation_aggregation(
        ref_gff, identifier="P00439", query_type="Natural variant"
    )
    ours_q = annotation_aggregation(
        gff, identifier="P00439", query_type="Natural variant"
    ).collect()
    ra = sorted(
        (str(site), _unrepr(r["annotation"]))
        for site, r in ref_q.iterrows()
    )
    rb = sorted((r["site"], _unrepr(r["annotation"])) for r in ours_q)
    assert len(ra) == len(rb) > 50
    assert ra == rb, (ra[:2], rb[:2])


@given(
    atoms=st.lists(
        st.tuples(
            st.sampled_from(["ATOM", "HETATM"]),
            st.sampled_from(["N", "CA", "OD1", "HD21"]),  # widths 1-4
            st.sampled_from([".", "A"]),                   # altloc
            st.sampled_from(["GLY", "ASN"]),
            st.sampled_from(["A", "B"]),
            st.integers(-99, 9999),                        # resseq
            st.sampled_from(["?", "B"]),                   # ins code
            st.floats(-999.0, 9999.0, allow_nan=False),
            st.floats(0.0, 99.99, allow_nan=False),   # occupancy
            st.floats(0.0, 999.99, allow_nan=False),  # bfactor
            st.sampled_from(["C", "N", "fe"]),             # element (case)
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pdb_line_property_vs_reference(spark, atoms):
    """Hypothesis parity with the reference's _get_atom_line
    (proteofav/structures.py:571-643) under formatting extremes the
    fixtures never produce: negative and 4-digit residue numbers,
    coordinates at the %8.3f width edge, >99.99 B-factors (column
    collision by design, same on both sides), lowercase elements, and
    every atom-name padding width — BYTE-identical lines."""
    import pandas as _pd

    RS, _, _ = _ref()
    from proteofav_spark.sinks.writers import pdb_lines

    cols = [
        "group_PDB", "auth_atom_id", "label_alt_id", "auth_comp_id",
        "auth_asym_id", "auth_seq_id", "pdbx_PDB_ins_code",
        "Cartn_x", "occupancy", "B_iso_or_equiv", "type_symbol",
    ]
    rows = []
    for a in atoms:
        (grp, nm, alt, comp, ch, seq, ic, x, occ, bf, el) = a
        rows.append((grp, nm, alt, comp, ch, str(seq), ic,
                     round(x, 3), round(x / 2, 3), round(x / 3, 3),
                     round(occ, 2), round(bf, 2), el))
    pdf = _pd.DataFrame(
        rows,
        columns=["group_PDB", "auth_atom_id", "label_alt_id",
                 "auth_comp_id", "auth_asym_id", "auth_seq_id",
                 "pdbx_PDB_ins_code", "Cartn_x", "Cartn_y", "Cartn_z",
                 "occupancy", "B_iso_or_equiv", "type_symbol"],
    )
    ref_lines = [
        RS._get_atom_line(pdf, ix, n + 1).rstrip("\n")
        for n, ix in enumerate(pdf.index)
    ]

    sdf = spark.createDataFrame(
        [("f", i, *r) for i, r in enumerate(rows)],
        ["source_file", "line_no"] + list(pdf.columns),
    )
    ours = [r["value"] for r in pdb_lines(sdf).collect()]
    assert ours == ref_lines, (rows, ref_lines, ours)


# ---------------------------------------------------------------------------
# randomized differential: the MERGER family (VERDICT r11 #5 — the r11
# hypothesis harness covered the generic core ops and found 7 bugs; the
# join-key edge cases here — NULL keys, duplicate keys multiplying,
# orig_-chain key selection — have the same silent-divergence risk and
# the real-fixture tests never stress them)
# ---------------------------------------------------------------------------

_MKEY = st.sampled_from(["1", "2", "118", "5A", "nan", None])
_MCHAIN = st.sampled_from(["A", "B", None])
_MROWS = st.lists(st.tuples(_MKEY, _MCHAIN), min_size=1, max_size=5)


def _mnorm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (list, tuple, set)):
        # collapsed multi-value cells: reference emits tuple(set(...)) in
        # arbitrary order, ours a sorted Spark array — compare as sorted
        # tuples under the same normalization; an EMPTY collapsed cell is
        # the reference's NaN (same rule the core-op differentials use)
        t = tuple(sorted((_mnorm_cell(x) for x in v), key=repr))
        if not t:
            return None
        # singleton collapsed cell ≡ the reference's scalar (A4: a Spark
        # column is uniformly array-typed once ANY group collapses)
        return t[0] if len(t) == 1 else t
    return v


def _pairs(rows):
    return sorted(
        (tuple(_mnorm_cell(v) for v in r) for r in rows), key=repr
    )


@given(left=_MROWS, right=_MROWS, which=st.sampled_from(
    ["sifts", "validation", "annotation"]
))
@settings(
    max_examples=_ex(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_simple_mergers_property_vs_reference(spark, left, right, which):
    """The three same-shape left mergers run LIVE on hypothesis tables
    with NULL keys, duplicate keys and disjoint/overlapping key sets:
    mmcif⟕sifts (mergers.py:29-62), mmcif⟕validation (:103-138),
    sifts⟕annotation (:141-164). pandas.merge treats NaN/None join keys
    as EQUAL values (a NaN-key left row picks up every NaN-key right
    row), which a NULL-unsafe Spark equi-join silently drops — exactly
    the divergence class this harness exists to catch."""
    import pandas as _pd

    _, RMG = _ref_more()
    from proteofav_spark.plans import mergers as M

    if which == "sifts":
        lcols = ("auth_seq_id_full", "auth_asym_id")
        rcols = ("PDB_dbResNum", "PDB_dbChainId")
        ref_fn, our_fn = (
            RMG.mmcif_sifts_table_merger, M.mmcif_sifts_table_merger
        )
    elif which == "validation":
        lcols = ("auth_seq_id_full", "auth_asym_id")
        rcols = ("validation_resnum_full", "validation_chain")
        ref_fn, our_fn = (
            RMG.mmcif_validation_table_merger, M.mmcif_validation_table_merger
        )
    else:
        lcols = ("UniProt_dbAccessionId", "UniProt_dbResNum")
        rcols = ("accession", "site")
        ref_fn, our_fn = (
            RMG.sifts_annotation_table_merger, M.sifts_annotation_table_merger
        )

    lrows = [(k, c, i) for i, (k, c) in enumerate(left)]
    rrows = [(k, c, 100 + i) for i, (k, c) in enumerate(right)]
    lp = _pd.DataFrame(lrows, columns=[*lcols, "mv"])
    rp = _pd.DataFrame(rrows, columns=[*rcols, "dv"])
    ref = ref_fn(lp.copy(), rp.copy())
    want = _pairs(ref[["mv", "dv"]].itertuples(index=False))

    ls = spark.createDataFrame(
        lrows, f"{lcols[0]} string, {lcols[1]} string, mv long"
    )
    rs = spark.createDataFrame(
        rrows, f"{rcols[0]} string, {rcols[1]} string, dv long"
    )
    ours = our_fn(ls, rs).select("mv", "dv").collect()
    got = _pairs((r["mv"], r["dv"]) for r in ours)
    assert got == want, (which, lrows, rrows, want, got)


@given(
    left=_MROWS,
    right=_MROWS,
    orig=st.sampled_from([None, "A", "B", "C"]),
)
@settings(
    max_examples=_ex(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dssp_merger_chain_probe_property_vs_reference(spark, left, right, orig):
    """mmcif⟕dssp (mergers.py:65-100) with the orig_auth_asym_id column
    present/absent: the reference picks the ORIGINAL chain key only when
    the mmCIF and DSSP chain-id SETS differ (the BioUnit probe at
    :82-84); duplicate and NULL keys ride the same pandas NaN-equality
    semantics as the simple mergers."""
    import pandas as _pd

    _, RMG = _ref_more()
    from proteofav_spark.plans import mergers as M

    lrows = [
        (k, c, (orig if orig is not None else c), i)
        for i, (k, c) in enumerate(left)
    ]
    rrows = [(k, c, 100 + i) for i, (k, c) in enumerate(right)]
    lcols = ["auth_seq_id_full", "auth_asym_id", "orig_auth_asym_id", "mv"]
    if orig is None:  # column absent half the time
        lrows = [(k, c, i) for i, (k, c) in enumerate(left)]
        lcols = ["auth_seq_id_full", "auth_asym_id", "mv"]
    lp = _pd.DataFrame(lrows, columns=lcols)
    rp = _pd.DataFrame(rrows, columns=["RES_FULL", "CHAIN_FULL", "dv"])
    ref = RMG.mmcif_dssp_table_merger(lp.copy(), rp.copy())
    want = _pairs(ref[["mv", "dv"]].itertuples(index=False))

    ls = spark.createDataFrame(
        lrows, ", ".join(f"{c} string" for c in lcols[:-1]) + ", mv long"
    )
    rs = spark.createDataFrame(
        rrows, "RES_FULL string, CHAIN_FULL string, dv long"
    )
    ours = M.mmcif_dssp_table_merger(ls, rs).select("mv", "dv").collect()
    got = _pairs((r["mv"], r["dv"]) for r in ours)
    assert got == want, (lrows, rrows, want, got)


@given(left=_MROWS, right=_MROWS)
@settings(
    max_examples=_ex(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_variants_merger_astype_property_vs_reference(spark, left, right):
    """sifts⟕variants (mergers.py:167-190) is the one merger whose RIGHT
    key gets astype(str) in the reference — NaN `begin` becomes the
    literal 'nan' STRING, so a NULL left resnum no longer NaN-matches it
    (unlike every other merger) while a literal 'nan' string on the left
    DOES. The accession key keeps raw pandas NaN-equality."""
    import pandas as _pd

    _, RMG = _ref_more()
    from proteofav_spark.plans import mergers as M

    lrows = [(k, c, i) for i, (c, k) in enumerate(left)]
    rrows = [(k, c, 100 + i) for i, (c, k) in enumerate(right)]
    lp = _pd.DataFrame(
        lrows, columns=["UniProt_dbAccessionId", "UniProt_dbResNum", "mv"]
    )
    rp = _pd.DataFrame(rrows, columns=["accession", "begin", "dv"])
    # canonical missing repr: the reference's variants frames come from
    # json_normalize, where missing is np.nan (astype(str) -> 'nan');
    # a python None would astype to 'None' — a pandas-only distinction
    # Spark NULL cannot even represent, so normalize before the live run
    import numpy as _np

    rp = rp.where(rp.notna(), _np.nan)
    ref = RMG.sifts_variants_table_merger(lp.copy(), rp.copy())
    want = _pairs(ref[["mv", "dv"]].itertuples(index=False))

    ls = spark.createDataFrame(
        lrows, "UniProt_dbAccessionId string, UniProt_dbResNum string, mv long"
    )
    rs = spark.createDataFrame(rrows, "accession string, begin string, dv long")
    ours = M.sifts_variants_table_merger(ls, rs).select("mv", "dv").collect()
    got = _pairs((r["mv"], r["dv"]) for r in ours)
    assert got == want, (lrows, rrows, want, got)


@given(
    left=st.lists(
        st.tuples(_MKEY, st.sampled_from(["x1", "x2", None])), min_size=1,
        max_size=4,
    ),
    right=st.lists(
        st.tuples(_MKEY, st.sampled_from(["x1", "x2", None])), min_size=1,
        max_size=4,
    ),
)
@settings(
    max_examples=_ex(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_uniprot_ensembl_outer_merger_property_vs_reference(spark, left, right):
    """uniprot_vars_ensembl_vars_merger (mergers.py:193-219) run LIVE:
    FULL OUTER on the 7-key tuple where pandas matches NaN keys as equal
    values — two rows agreeing on every non-null key and both-NaN on the
    rest DO pair up; `on=<names>` null-unsafe joins emitted them as two
    unmatched rows (fixed r12). Collapse by xrefs_id rides on top, so
    compare the pre-collapse pairing via the payload columns."""
    import numpy as _np
    import pandas as _pd

    _, RMG = _ref_more()
    # the merger calls merging_down_by_key → DataFrame.append (pandas≥2
    # removal; same documented shim as the core-op differentials)
    if not hasattr(_pd.DataFrame, "append"):
        _pd.DataFrame.append = lambda self, other, **k: _pd.concat(
            [self, other]
        )
    from proteofav_spark.sources.variants import (
        VARS_MERGE_KEYS,
        uniprot_vars_ensembl_vars_merger,
    )

    def frame(rows, payload):
        data = []
        for i, (beg, xid) in enumerate(rows):
            data.append(
                {
                    "begin": beg, "end": beg, "xrefs_id": xid,
                    "frequency": None, "consequenceType": "missense",
                    "siftScore": None, "polyphenScore": None,
                    payload: float(i),
                }
            )
        return _pd.DataFrame(data).where(lambda d: d.notna(), _np.nan)

    lp, rp = frame(left, "uv"), frame(right, "ev")
    ref = RMG.uniprot_vars_ensembl_vars_merger(lp.copy(), rp.copy())
    want = _pairs(ref[["uv", "ev"]].itertuples(index=False))

    schema = (
        "begin string, end string, xrefs_id string, frequency double, "
        "consequenceType string, siftScore double, polyphenScore double, "
        "{} double"
    )
    def rows_of(pdf):
        # pandas NaN ↔ Spark NULL (str(nan)/'NaN'-double leakage would
        # manufacture joinable 'nan' keys the reference never has)
        return [
            tuple(_mnorm_cell(v) for v in r)
            for r in pdf.itertuples(index=False)
        ]

    ls = spark.createDataFrame(rows_of(lp), schema.format("uv"))
    rs = spark.createDataFrame(rows_of(rp), schema.format("ev"))
    assert set(VARS_MERGE_KEYS) <= set(ls.columns)
    ours = uniprot_vars_ensembl_vars_merger(ls, rs).select("uv", "ev").collect()
    got = _pairs((r["uv"], r["ev"]) for r in ours)
    assert got == want, (left, right, want, got)


_AGG_ROW = st.tuples(
    st.sampled_from(["1", None]),           # pdbx_PDB_model_num
    st.sampled_from(["A", "B", None]),      # auth_asym_id
    st.sampled_from(["1", "2", None]),      # auth_seq_id
    st.sampled_from(["CA", "CB", None]),    # object payload
    st.sampled_from([1.25, -0.5, None]),    # numeric payload
)


@given(
    rows=st.lists(_AGG_ROW, min_size=1, max_size=8),
    ids=st.permutations(list(range(8))),
    method=st.sampled_from(["centroid", "first"]),
)
@settings(
    max_examples=_ex(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_residues_aggregation_property_vs_reference(spark, rows, ids, method):
    """residues_aggregation run LIVE on hypothesis atom tables with NULL
    group keys, NULL payload cells and NON-monotone atom ids — the three
    surfaces the real-fixture differentials can't stress:
    - pandas groupby(dropna=True) silently DROPS rows whose (model,
      chain, seq) key has a NaN component;
    - pandas GroupBy.first is first NON-NULL per column in row order,
      not the value of the first row;
    - the 'id' column aggregates as 'first' (row order), not min().
    Compare per-group over the payload and id columns."""
    import numpy as _np
    import pandas as _pd

    RS, _, _ = _ref()
    from proteofav_spark.operators.structures import residues_aggregation

    full = [
        (m, a, s1, obj, num, float(ids[i]), i)
        for i, (m, a, s1, obj, num) in enumerate(rows)
    ]
    cols = [
        "pdbx_PDB_model_num", "auth_asym_id", "auth_seq_id",
        "obj", "num", "id", "line_no",
    ]
    pdf = _pd.DataFrame(full, columns=cols).drop(columns=["line_no"])
    pdf = pdf.where(pdf.notna(), _np.nan)
    ref = RS.residues_aggregation(pdf.copy(), agg_method=method)

    def key(r):
        return tuple(
            _mnorm_cell(r[c])
            for c in ("pdbx_PDB_model_num", "auth_asym_id", "auth_seq_id")
        )

    def payload(r):
        num = _mnorm_cell(r["num"])
        return (
            _mnorm_cell(r["obj"]),
            None if num is None else round(float(num), 9),
            None if _mnorm_cell(r["id"]) is None else int(r["id"]),
        )

    want = sorted(
        (key(r), payload(r)) for _, r in ref.iterrows()
    )

    sdf = spark.createDataFrame(
        full,
        "pdbx_PDB_model_num string, auth_asym_id string, auth_seq_id string,"
        " obj string, num double, id double, line_no long",
    )
    ours = residues_aggregation(sdf, agg_method=method).collect()
    got = sorted(
        (
            tuple(
                _mnorm_cell(r[c])
                for c in (
                    "pdbx_PDB_model_num", "auth_asym_id", "auth_seq_id"
                )
            ),
            (
                _mnorm_cell(r["obj"]),
                None if r["num"] is None else round(float(r["num"]), 9),
                None if r["id"] is None else int(r["id"]),
            ),
        )
        for r in ours
    )
    assert got == want, (full, method, want, got)


@given(
    vals=st.lists(
        st.sampled_from(["1", "2", "1.5", "5A", None]), min_size=1, max_size=6
    ),
    target=st.sampled_from(["int64", "float64"]),
)
@settings(
    max_examples=_ex(14),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_constrain_column_types_property_vs_reference(spark, vals, target):
    """constrain_column_types run LIVE (proteofav/utils.py:184-199):
    pandas astype is ALL-OR-NOTHING per column — one uncastable cell (or
    ANY NaN under an int64 target, which pandas int64 cannot hold) keeps
    the whole column as-is — where a bare per-value try_cast silently
    nulls the uncastable cells. Cells compare as (kind, value) so a kept
    string '1' can never pass for a cast bigint 1."""
    import numpy as _np
    import pandas as _pd

    _ref()  # installs the scipy/requests_cache stubs utils.py imports
    sys.path.insert(0, "/root/reference")
    try:
        import proteofav.utils as RU
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.core import constrain_column_types

    pdf = _pd.DataFrame({"a": vals}).where(lambda d: d.notna(), _np.nan)
    ref = RU.constrain_column_types(pdf.copy(), {"a": target})

    def kind(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, str):
            return ("str", v)
        return ("num", float(v))

    want = [kind(v) for v in ref["a"]]

    sdf = spark.createDataFrame([(v,) for v in vals], "a string")
    t_spark = {"int64": "bigint", "float64": "double"}[target]
    got_rows = constrain_column_types(sdf, {"a": t_spark}).collect()
    got = [kind(r["a"]) for r in got_rows]
    assert sorted(got, key=repr) == sorted(want, key=repr), (
        vals, target, want, got
    )


def test_constrain_cast_fillna_replace_order_differential(spark):
    """The reference applies cast → fillna → replace IN THAT ORDER
    (utils.py:184-199): the replace matches post-cast post-fill values.
    Run both orders' witnesses live: float cast then fillna(0) then
    replace(2.0→9.0), and a replace on a cast-KEPT string column."""
    import numpy as _np
    import pandas as _pd

    _ref()  # installs the scipy/requests_cache stubs utils.py imports
    sys.path.insert(0, "/root/reference")
    try:
        import proteofav.utils as RU
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.core import constrain_column_types

    pdf = _pd.DataFrame({"a": ["1", "2", _np.nan]})
    ref = RU.constrain_column_types(
        pdf.copy(), {"a": "float64"},
        nan_value_dict={"a": 0}, replace_value_dict={"a": (2.0, 9.0)},
    )
    assert list(ref["a"]) == [1.0, 9.0, 0.0]
    sdf = spark.createDataFrame([("1",), ("2",), (None,)], "a string")
    got = [
        r["a"]
        for r in constrain_column_types(
            sdf, {"a": "double"},
            nan_value_dict={"a": 0}, replace_value_dict={"a": (2.0, 9.0)},
        ).collect()
    ]
    assert sorted(got) == [0.0, 1.0, 9.0], got

    # replace applies to the KEPT string column when the cast fails
    pdf2 = _pd.DataFrame({"a": ["1", "x", _np.nan]})
    ref2 = RU.constrain_column_types(
        pdf2.copy(), {"a": "float64"}, replace_value_dict={"a": ("1", "9")}
    )
    assert list(ref2["a"])[:2] == ["9", "x"]
    sdf2 = spark.createDataFrame([("1",), ("x",), (None,)], "a string")
    got2 = [
        r["a"]
        for r in constrain_column_types(
            sdf2, {"a": "double"}, replace_value_dict={"a": ("1", "9")}
        ).collect()
    ]
    assert sorted(got2, key=repr) == sorted(["9", "x", None], key=repr), got2


def test_exclude_columns_all_or_nothing_differential(spark):
    """exclude_columns (utils.py:203-220): the reference's
    `drop(list(excluded))` under except-ValueError no-ops the ENTIRE
    drop when any listed name is missing (old pandas raised ValueError
    for missing labels; pandas≥2 raises KeyError so the reference
    as-run today crashes — restored like the parse_qs/regex bitrot).
    Present-only lists still drop."""
    from proteofav_spark.core import exclude_columns

    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    assert exclude_columns(df, ("b", "zz")).columns == ["a", "b", "c"]
    assert exclude_columns(df, ("b", "c")).columns == ["a"]
    assert exclude_columns(df, ()).columns == ["a", "b", "c"]
    assert exclude_columns(df, None).columns == ["a", "b", "c"]


_GFF_ROW = st.tuples(
    st.sampled_from(["Active site", "Chain", "Metal binding"]),
    st.integers(1, 4),                       # START
    st.integers(1, 4),                       # END (may be < START)
    st.sampled_from([(), ("X1",)]),          # ID (parse_qs list)
    st.sampled_from([(), ("note a",)]),      # Note
)


@given(
    rows=st.lists(_GFF_ROW, min_size=1, max_size=6),
    grouped=st.booleans(),
)
@settings(
    max_examples=_ex(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_annotation_aggregation_property_vs_reference(spark, rows, grouped):
    """annotation_aggregation run LIVE on hypothesis GFF tables with
    REVERSED intervals (START > END: the reference's range(START, END+1)
    yields nothing, so the feature contributes zero residues — a naive
    sequence(START, END) DESCENDS instead), droppable TYPEs, multiple
    features per residue (',  '-join must follow row order), and
    absent-ID/Note writer branches. Grouped rows compare on (site,
    annotation, accession); ungrouped on (idx, annotation) — `site` is
    the documented A1 RangeIndex divergence there."""
    import pandas as _pd

    _, _, RA = _ref()
    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.sources.annotation import annotation_aggregation

    pdf = _pd.DataFrame(
        [(t, s1, e, list(i), list(n)) for t, s1, e, i, n in rows],
        columns=["TYPE", "START", "END", "ID", "Note"],
    )
    ref_err, ref = None, None
    try:
        ref = RA.annotation_aggregation(
            pdf.copy(), identifier="P1", group_residues=grouped
        )
    except (ValueError, KeyError) as exc:
        # all-reversed-interval inputs: the reference raises ValueError
        # on the empty ungrouped frame, and KeyError from
        # groupby('idx') on the empty COLUMNLESS frame when grouping
        ref_err = exc

    sdf = spark.createDataFrame(
        [
            (t, s1, e, list(i), list(n), "P1", k)
            for k, (t, s1, e, i, n) in enumerate(rows)
        ],
        "TYPE string, START bigint, END bigint, ID array<string>, "
        "Note array<string>, NAME string, line_no long",
    )
    import re as _re

    def _unrepr(s):
        if not isinstance(s, str):
            return s
        return _re.sub(r"[\[\]']", "", s)

    try:
        ours = annotation_aggregation(
            sdf, identifier="P1", group_residues=grouped
        ).collect()
    except EmptyTableError:
        assert ref_err is not None, "reference produced rows, ours raised"
        return
    assert ref_err is None, "reference raised on empty, ours produced rows"

    if grouped:
        want = sorted(
            (str(site), _unrepr(r["annotation"]), r["accession"])
            for site, r in ref.iterrows()
        )
        got = sorted(
            (r["site"], r["annotation"], r["accession"]) for r in ours
        )
    else:
        want = sorted(
            (int(r["idx"]), _unrepr(r["annotation"])) for _, r in ref.iterrows()
        )
        got = sorted((int(r["idx"]), r["annotation"]) for r in ours)
    assert got == want, (rows, grouped, want, got)


@lru_cache(maxsize=1)
def _filter_grid_tables():
    """Parse the altloc-heavy fixture ONCE for the randomized
    filter_structures option grid (reference pdf + values to select on)."""
    RS, _, _ = _ref()
    ref = RS.parse_mmcif_atoms(f"{TD}/mmcif/4ibw.cif", excluded_cols=())
    seqs = [v for v in ref["auth_seq_id"].dropna().unique()[:6]]
    comps = [v for v in ref["auth_comp_id"].dropna().unique()[:4]]
    chains = [v for v in ref["auth_asym_id"].dropna().unique()[:2]]
    return ref, seqs, comps, chains


_FILTER_OPTS = st.fixed_dictionaries(
    {
        "models": st.sampled_from(["first", None]),
        "use_chain": st.booleans(),
        "lines": st.sampled_from([None, ("ATOM",)]),
        "remove_hydrogens": st.booleans(),
        "remove_altloc": st.booleans(),
        "remove_partial_res": st.booleans(),
        "reset": st.booleans(),
        "use_res": st.booleans(),
        "use_comps": st.booleans(),
        "atoms": st.sampled_from(
            [None, ("CA", "N"), "centroid", "backbone_centroid"]
        ),
        "add_atom_altloc": st.booleans(),
    }
)


@given(opts=_FILTER_OPTS)
@settings(
    max_examples=_ex(18),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_filter_structures_option_grid_vs_reference(spark, opts):
    """filter_structures under RANDOMIZED option combinations run live on
    the altloc-heavy fixture (proteofav/structures.py:777-894): the
    composed fixture diff pins ONE option set; this pins the whole
    option lattice — interaction order (altloc removal forcing atom-id
    reset, res filters applying AFTER partial-residue removal, the
    atoms='centroid' aggregation shortcut) is where silent divergence
    hides. Centroid paths compare non-float columns only (the fixture
    has mean-on-.5-boundary cells where any fixed-dp rounding splits
    the engines — the dedicated aggregation diffs compare floats with
    isclose)."""
    RS, _, _ = _ref()
    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.operators.structures import filter_structures
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    ref_pdf, seqs, comps, chains = _filter_grid_tables()
    ours_base = parse_mmcif_atoms(spark, f"{TD}/mmcif/4ibw.cif")

    kw = dict(
        models=opts["models"],
        chains=(tuple(str(c) for c in chains[:1]) if opts["use_chain"] else None),
        lines=opts["lines"],
        remove_hydrogens=opts["remove_hydrogens"],
        remove_altloc=opts["remove_altloc"],
        remove_partial_res=opts["remove_partial_res"],
        res=(tuple(seqs[:3]) if opts["use_res"] else None),
        comps=(tuple(comps[:2]) if opts["use_comps"] else None),
        atoms=opts["atoms"],
    )
    # REFERENCE-BUG REGION (DIVERGENCES A6): _remove_multiple_altlocs
    # drops via table.index[drop_ixs] — LABELS used as POSITIONS — so any
    # pre-altloc filter that breaks index contiguity (a chains selection
    # on this fixture: chain-A waters interleave after chain B) makes the
    # reference crash with IndexError or silently drop the wrong rows.
    # Our window-based removal has no such precondition; in this region
    # only assert that OUR pipeline runs.
    bug_region = opts["remove_altloc"] and opts["use_chain"]

    ref_err = None
    try:
        ref = RS.filter_structures(
            ref_pdf.copy(),
            add_atom_altloc=opts["add_atom_altloc"],
            reset_atom_id=opts["reset"],
            **kw,
        )
    except ValueError as exc:
        ref_err = exc
    except IndexError:
        assert bug_region, "reference IndexError outside the known bug region"
        ref_err = None
        ref = None

    kw_ours = dict(kw)
    if kw_ours["res"] is not None:
        kw_ours["res"] = tuple(str(v) for v in kw_ours["res"])
    if kw_ours["comps"] is not None:
        kw_ours["comps"] = tuple(str(v) for v in kw_ours["comps"])
    try:
        ours = filter_structures(
            ours_base,
            add_atom_altloc_col=opts["add_atom_altloc"],
            reset_atom_id_flag=opts["reset"],
            **kw_ours,
        )
    except EmptyTableError:
        assert bug_region or ref_err is not None, (
            opts, "reference produced rows, ours raised"
        )
        return
    if bug_region:
        return  # ours ran; reference output is crash-or-corrupt here
    assert ref_err is None, (opts, "reference raised on empty, ours produced rows")

    agg = opts["atoms"] in ("centroid", "backbone_centroid")
    skip = ()
    if agg:
        skip = tuple(
            c for c in ref.columns
            if str(ref[c].dtype).startswith("float") or c == "index"
        )
    _assert_frames_equal(ref, ours, dp=4, skip=skip)


@lru_cache(maxsize=1)
def _dssp_grid_table():
    """Reference-parsed 2w4o.dssp plus adversarial synthetic rows: a
    NULL-AA residue (the pandas `!=` NaN-keep quirk), a '!' missing
    residue and '!*' chain break, a NULL-SS row (fillna path) and a
    NULL-ACC row (RSA path)."""
    import numpy as _np
    import pandas as _pd

    _, RD, _ = _ref()
    base = RD.parse_dssp_residues(f"{TD}/dssp/2w4o.dssp")
    extra = _pd.DataFrame(
        [
            {"LINE": 9001, "RES": "900", "CHAIN": "A", "AA": _np.nan,
             "SS": "H", "ACC": 10},
            {"LINE": 9002, "RES": "901", "CHAIN": "A", "AA": "!",
             "SS": "H", "ACC": 10},
            {"LINE": 9003, "RES": "902", "CHAIN": "A", "AA": "!*",
             "SS": "H", "ACC": 10},
            {"LINE": 9004, "RES": "903", "CHAIN": "B", "AA": "G",
             "SS": _np.nan, "ACC": 12},
            {"LINE": 9005, "RES": "904", "CHAIN": "B", "AA": "A",
             "SS": "E", "ACC": _np.nan},
        ]
    )
    pdf = _pd.concat([base, extra], ignore_index=True)
    return pdf.where(pdf.notna(), _np.nan)


_DSSP_OPTS = st.fixed_dictionaries(
    {
        "use_chains": st.booleans(),
        "use_chains_full": st.booleans(),
        "use_res": st.booleans(),
        "add_full_chain": st.booleans(),
        "add_ss_reduced": st.booleans(),
        "add_rsa": st.booleans(),
        "rsa_method": st.sampled_from(["Sander", "Miller", "Wilke"]),
        "add_rsa_class": st.booleans(),
        "reset_res_id": st.booleans(),
    }
)


@given(opts=_DSSP_OPTS)
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_filter_dssp_option_grid_vs_reference(spark, opts):
    """filter_dssp under randomized option combinations run live
    (proteofav/dssp.py:342-411) on the fixture PLUS adversarial rows:
    NULL AA must survive the '!'/'!*' drop (pandas `!=` keeps NaN — a
    bare ~isin silently drops it), NULL SS takes the fillna('-') path,
    NULL ACC rides RSA/RSA_CLASS, and the add_* extensions compose with
    the chain/res selections in reference order. RSA_CLASS needs RSA:
    the reference's _add_dssp_rsa_class KeyErrors without it — that
    combination asserts the crash parity instead."""
    import numpy as _np

    _, RD, _ = _ref()
    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.sources.dssp import filter_dssp

    pdf = _dssp_grid_table().copy()
    chains = ("A",) if opts["use_chains"] else None
    # CHAIN_FULL only exists after add_full_chain — without it BOTH
    # sides refuse (pandas KeyError / Spark unresolved column)
    chains_full = (
        ("A",) if opts["use_chains_full"] and opts["add_full_chain"] else None
    )
    res = ("900", "903", "904", "10", "11", "12") if opts["use_res"] else None

    kw = dict(
        chains=chains, chains_full=chains_full, res=res,
        add_full_chain=opts["add_full_chain"],
        add_ss_reduced=opts["add_ss_reduced"],
        add_rsa=opts["add_rsa"],
        rsa_method=opts["rsa_method"],
        add_rsa_class=opts["add_rsa_class"],
        reset_res_id=opts["reset_res_id"],
    )
    ref_err = None
    ref = None
    try:
        ref = RD.filter_dssp(pdf.copy(), **kw)
    except ValueError as exc:
        ref_err = exc
    except KeyError:
        # add_rsa_class without add_rsa: the reference indexes the
        # missing RSA column
        assert opts["add_rsa_class"] and not opts["add_rsa"]
        ref_err = "keyerror"
    except TypeError:
        # get_rsa(len(nan)) on the NULL-AA row: the reference CRASHES
        # computing RSA for a NaN residue; ours emits NULL (A3 family)
        assert opts["add_rsa"]
        ref_err = "typeerror"

    rows = [
        tuple(_mnorm_cell(v) for v in r)
        for r in pdf.itertuples(index=False)
    ]

    def spark_type(dt):
        k = str(dt)
        if k.startswith("int"):
            return "long"
        if k.startswith("float"):
            return "double"
        return "string"

    schema = ", ".join(
        f"{c} {spark_type(pdf[c].dtype)}" for c in pdf.columns
    )
    # reader metadata our window helpers key on (parse always adds them)
    rows = [r + ("t", i) for i, r in enumerate(rows)]
    schema += ", source_file string, line_no long"
    sdf = spark.createDataFrame(rows, schema)
    try:
        ours = filter_dssp(sdf, **kw)
        ours_rows = ours.collect()
    except EmptyTableError:
        assert ref_err is not None, (opts, "ref produced rows, ours raised")
        return
    except Exception:
        if ref_err == "keyerror":
            return  # both sides refuse RSA_CLASS without RSA
        raise
    if ref_err == "typeerror":
        return  # ours computed NULL RSA where the reference crashed
    if ref_err == "keyerror":
        raise AssertionError(
            (opts, "reference KeyErrors on RSA_CLASS-without-RSA, ours ran")
        )
    assert ref_err is None, (opts, "reference raised on empty, ours produced rows")

    shared = [c for c in ref.columns if c in ours.columns]
    want = sorted(
        tuple(_mnorm_cell(r[c]) for c in shared) for _, r in ref.iterrows()
    )
    got = sorted(
        tuple(_mnorm_cell(r[c]) for c in shared) for r in ours_rows
    )
    assert got == want, (opts, shared, want[:3], got[:3])


_DESC_POOL = [
    "sp|P00439|PH4H_HUMAN Phenylalanine-4-hydroxylase OS=Homo sapiens",
    "tr|A0A061ACU2|A0A061ACU2_CAEEL Uncharacterized protein",
    "xx|p00439|ph4h_human lowercase accession never matches uniprot",
    "sp|P00439|PH4H HUMAN broken name (no underscore run)",
    "cath|4.1.0|1abcA00/12-300",
    "cath|4_1_0|12asA00/1-330",
    "C7P4T5_HALMD/44-372",
    "B9LRY6_HALLT/1-100 trailing words",
    "abc123/5-10",
    "A0A061_AB/-3--1",
    "X_Y/1-",
    "/1-2",
    "hello world no pattern at all",
    "sp|Q9H0H5|RGAP1_HUMAN",
    "1abcA00/12-300",
]


@given(
    descs=st.lists(st.sampled_from(_DESC_POOL), min_size=1, max_size=6),
)
@settings(
    max_examples=_ex(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_msa_description_fuzz_vs_reference(spark, descs):
    """The six MSA description-parser regex families run LIVE on
    randomized description strings — valid UniProt/CATH/generic
    patterns, near-misses (lowercase accessions, broken name runs,
    half-formed ranges) and garbage — through a synthetic FASTA read on
    both sides. The fixture differentials pin real files; this pins the
    regex-boundary behavior fixtures can't reach."""
    import os
    import tempfile

    RM, _, _ = _ref_msas_vars()
    from proteofav_spark.sources.msas import read_msas

    body = "".join(
        f">{d}\nACDEFGHI\n" for d in descs
    )
    fd, path = tempfile.mkstemp(suffix=".fasta")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(body)
        ref = RM.read_msas(path, get_uniprot_id=False)
        ours = read_msas(spark, path).toPandas()
    finally:
        os.unlink(path)

    shared = [c for c in ref.columns if c in ours.columns]
    assert "Sequence" in shared, shared
    # columns only ONE side materialized must be informationless there:
    # the reference adds columns dynamically as parsers populate them,
    # ours carries a typed schema — present-with-all-NULLs ≡ absent
    meta = {"source_file", "line_no", "raw_description"}
    for c in set(ref.columns) - set(ours.columns):
        assert ref[c].isna().all() or (ref[c].astype(str) == "nan").all(), (
            descs, c, "reference-only column carries data")
    for c in set(ours.columns) - set(ref.columns) - meta:
        assert ours[c].isna().all(), (descs, c, "ours-only column carries data")

    def norm(df):
        return sorted(
            (
                tuple(_msa_cell(r[c]) for c in shared)
                for _, r in df[shared].iterrows()
            ),
            key=lambda t: tuple((x is None, str(x)) for x in t),
        )

    a, b = norm(ref), norm(ours)
    assert len(a) == len(b), (descs, len(a), len(b))
    assert a == b, (
        descs,
        shared,
        sorted(set(a) - set(b))[:1],
        sorted(set(b) - set(a))[:1],
    )


_VF_XREF = st.fixed_dictionaries(
    {
        "name": st.sampled_from(["dbSNP", "Ensembl", "ExAC"]),
        "id": st.sampled_from(["rs1", "rs2", "COSM1"]),
    }
)
_VF_FEATURE = st.fixed_dictionaries(
    {
        "type": st.just("VARIANT"),
        "begin": st.sampled_from(["41", "252"]),
        "end": st.sampled_from(["41", "252"]),
        "wildType": st.sampled_from(["L", "V"]),
        "consequenceType": st.sampled_from(["missense", "stop_gained"]),
        "somaticStatus": st.sampled_from([0, 1]),
    },
    optional={
        "ftId": st.sampled_from(["VAR_1", "VAR_2"]),
        "alternativeSequence": st.sampled_from(["V", "I"]),
        "polyphenScore": st.sampled_from([0.025, 0.9]),
        "siftScore": st.just(0.21),
        "xrefs": st.lists(_VF_XREF, max_size=3),
        "clinicalSignificances": st.lists(
            st.sampled_from(["pathogenic", "benign"]), max_size=2
        ),
    },
)


@given(features=st.lists(_VF_FEATURE, min_size=0, max_size=4))
@settings(
    max_examples=_ex(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_uniprot_variants_flatten_fuzz_vs_reference(spark, features):
    """flatten_uniprot_variants_ebi on RANDOMIZED feature payloads —
    optional fields absent per-feature, 0..3 xrefs (empty lists, dup
    ids triggering the splitting/merging collapse), list-typed
    clinicalSignificances — against our schema-driven flatten. The
    fixture differential pins the reference's own recorded payload;
    this pins the missing-field/empty-list lattice. Zero features:
    both sides refuse (reference ValueError on the empty collapse, ours
    EmptyTableError)."""
    import json as _json
    import os
    import tempfile

    _, RV, _ = _ref_msas_vars()
    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.sources.variants import flatten_uniprot_variants

    payload = {"accession": "P99999", "taxid": 9606, "features": features}
    ref_err = None
    ref = None
    try:
        ref = RV.flatten_uniprot_variants_ebi(
            _json.loads(_json.dumps(payload))
        )
    except ValueError as exc:
        ref_err = exc
    except KeyError:
        # NO feature carries xrefs: the reference's splitting_up_by_key
        # KeyErrors on the absent column; ours skips the collapse
        # (DIVERGENCES A7) — only assert ours still runs
        # xrefs absent OR all-empty: either way no xrefs_id column exists
        assert not any(f.get("xrefs") for f in features)
        ref_err = "keyerror"

    fd, path = tempfile.mkstemp(suffix=".json")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(_json.dumps(payload))
        sdf = spark.read.json(path)
        try:
            ours = flatten_uniprot_variants(sdf)
            ours_rows = ours.count()
        except EmptyTableError:
            assert ref_err is not None, (features, "ref rows, ours raised")
            return
        if ref_err == "keyerror":
            return  # ours produced a table where the reference crashed
        assert ref_err is None, (features, "ref raised, ours produced rows")
        _vars_compare(ref, ours, min_cols=6)
    finally:
        os.unlink(path)


_ENS_VAR = st.fixed_dictionaries(
    {
        "feature_type": st.sampled_from(
            ["transcript_variation", "somatic_transcript_variation"]
        ),
        "Parent": st.just("ENST00000288602"),
        "translation": st.just("ENSP00000288602"),
        "start": st.sampled_from([246, 622]),
        "end": st.sampled_from([246, 622]),
        "id": st.sampled_from(["rs1", "rs2", "COSM1"]),
        "type": st.sampled_from(["missense_variant", "synonymous_variant"]),
        "allele": st.sampled_from(["G/C", "COSMIC_MUTATION"]),
    },
    optional={
        "polyphen": st.sampled_from([0.9, None]),
        "sift": st.sampled_from([0.0, None]),
        "codons": st.sampled_from(["Cca/Gca", ""]),
        "residues": st.sampled_from(["P/A", ""]),
        "clinical_significance": st.lists(
            st.sampled_from(["pathogenic", "benign"]), max_size=2
        ),
        "minor_allele_frequency": st.just(None),
    },
)


@given(
    variants=st.lists(_ENS_VAR, min_size=1, max_size=4),
    synonymous=st.booleans(),
)
@settings(
    # PROTEOFAV_FUZZ_EXAMPLES=200 is the r13 attestation run (VERDICT r12
    # done-bar for the synonymous-path fixes); default stays CI-sized
    max_examples=int(os.environ.get("PROTEOFAV_FUZZ_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ensembl_variants_flatten_fuzz_vs_reference(spark, variants, synonymous):
    """flatten_ensembl_variants on RANDOMIZED Ensembl REST payloads —
    duplicate ids collapsing across variants, null polyphen/sift,
    empty-string codons/residues, list-typed clinical_significance, and
    the synonymous filter's NaN/collapsed-cell semantics — against our
    rename→constrain→split→merge pipeline."""
    import json as _json
    import os
    import tempfile

    _, RV, _ = _ref_msas_vars()
    from proteofav_spark.sources.variants import flatten_ensembl_variants

    from proteofav_spark.core import EmptyTableError

    ref_err, ref = None, None
    try:
        ref = RV.flatten_ensembl_variants(
            _fake_resp(_json.loads(_json.dumps(variants))),
            synonymous=synonymous,
        )
    except ValueError as exc:
        # the reference's row_selector raises when the synonymous filter
        # empties the table
        ref_err = exc

    fd, path = tempfile.mkstemp(suffix=".json")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write("\n".join(_json.dumps(v) for v in variants))
        sdf = spark.read.json(path)
        try:
            ours = flatten_ensembl_variants(sdf, synonymous=synonymous)
            ours.count()
        except EmptyTableError:
            assert ref_err is not None, (variants, "ref rows, ours raised")
            return
        assert ref_err is None, (variants, "ref raised, ours produced rows")
        _vars_compare(ref, ours, min_cols=6)
    finally:
        os.unlink(path)


def _ens_var(vid, vtype, start=246):
    return {
        "feature_type": "transcript_variation",
        "Parent": "ENST00000288602",
        "translation": "ENSP00000288602",
        "start": start,
        "end": start,
        "id": vid,
        "type": vtype,
        "allele": "G/C",
    }


def _flatten_ens_both(spark, variants, synonymous):
    """Run reference + ours on the same payload; return (ref_or_None,
    ours_or_None) where None means that side raised on empty."""
    import json as _json
    import tempfile

    _, RV, _ = _ref_msas_vars()
    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.sources.variants import flatten_ensembl_variants

    try:
        ref = RV.flatten_ensembl_variants(
            _fake_resp(_json.loads(_json.dumps(variants))),
            synonymous=synonymous,
        )
    except ValueError:
        ref = None
    fd, path = tempfile.mkstemp(suffix=".json")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write("\n".join(_json.dumps(v) for v in variants))
        sdf = spark.read.json(path)
        try:
            ours = flatten_ensembl_variants(sdf, synonymous=synonymous)
            # materialize before the temp file vanishes
            ours = ours.localCheckpoint(eager=True)
        except EmptyTableError:
            ours = None
    finally:
        os.unlink(path)
    return ref, ours


def test_ensembl_synonymous_filter_drops_singleton_array_cell(spark):
    """Pinned regression (VERDICT r12 What's-wrong #1a): with
    synonymous=False, a collapsed SINGLETON ['synonymous_variant'] cell —
    the A4 array representation of the reference's scalar cell — must
    drop, even though the column is array-typed because ANOTHER group
    collapsed multi-valued. Reference: row_selector `!=` on the scalar,
    proteofav/variants.py:697-699. Payload: COSM1 synonymous-only (two
    dup rows so it collapses) + rs1 with synonymous+missense (forces
    array typing); reference keeps exactly rs1."""
    variants = [
        _ens_var("COSM1", "synonymous_variant"),
        _ens_var("COSM1", "synonymous_variant", start=622),
        _ens_var("rs1", "synonymous_variant"),
        _ens_var("rs1", "missense_variant"),
    ]
    ref, ours = _flatten_ens_both(spark, variants, synonymous=False)
    assert ref is not None and ours is not None
    assert len(ref) == 1 and ours.count() == 1
    ids = [r["xrefs_id"] for r in ours.select("xrefs_id").collect()]
    assert ids == ["rs1"]
    _vars_compare(ref, ours, min_cols=6)


def test_ensembl_synonymous_filter_raises_on_emptied_table(spark):
    """Pinned regression (VERDICT r12 What's-wrong #1b): when the
    synonymous filter empties the table the reference's row_selector
    raises ValueError (proteofav/utils.py:129-131); ours must raise
    EmptyTableError (a ValueError subclass), not return an empty frame."""
    variants = [
        _ens_var("rs1", "synonymous_variant"),
        _ens_var("rs2", "synonymous_variant"),
    ]
    ref, ours = _flatten_ens_both(spark, variants, synonymous=False)
    assert ref is None, "reference should raise on the emptied table"
    assert ours is None, "ours must raise EmptyTableError like the reference"


# --- composed select_variants differential (VERDICT r12 item #4) ---------

_SPECIES_TAB = "Organism\nHomo sapiens (Human)\n"
_SYMBOL_XREF = (
    '[{"type":"translation","id":"ENSP00000288602"},'
    '{"type":"transcript","id":"ENST00000288602"}]'
)
_ID_XREF = (
    '[{"dbname":"Uniprot/SWISSPROT","primary_id":"P17612",'
    '"ensembl_identity":99.5,"xref_identity":99.5,'
    '"xref_start":1,"xref_end":350}]'
)


class _tab_resp:
    def __init__(self, text):
        self.content = text.encode()


def _ours_fetch(url):
    """URL-routing fake for OUR injected fetch — the same canned payloads
    the reference-side monkeypatches serve."""
    if "columns=organism" in url:
        return _SPECIES_TAB.encode()
    if "xrefs/symbol" in url:
        return _SYMBOL_XREF.encode()
    if "xrefs/id" in url:
        return _ID_XREF.encode()
    if "variation/" in url:
        return _EBI_VARS_P17612.encode()
    if "feature=somatic_transcript_variation" in url:
        return _ENS_SOMATIC_VARS.encode()
    if "feature=transcript_variation" in url:
        return _ENS_TRANSCRIPT_VARS.encode()
    raise AssertionError(f"unexpected URL fetched: {url}")


def _patch_reference_network(monkeypatch, RV):
    import json as _json

    monkeypatch.setattr(
        RV, "fetch_uniprot_species_from_id",
        lambda ident, **kw: _tab_resp(_SPECIES_TAB),
    )
    monkeypatch.setattr(
        RV, "fetch_uniprot_ensembl_mapping",
        lambda ident, species="homo_sapiens", **kw: _fake_resp(
            _json.loads(_SYMBOL_XREF)
        ),
    )
    monkeypatch.setattr(
        RV, "fetch_ensembl_uniprot_mapping",
        lambda ident, **kw: _fake_resp(_json.loads(_ID_XREF)),
    )
    monkeypatch.setattr(
        RV, "fetch_uniprot_variants",
        lambda ident, **kw: _fake_resp(_json.loads(_EBI_VARS_P17612)),
    )
    monkeypatch.setattr(
        RV, "fetch_ensembl_variants",
        lambda ident, feature=None, **kw: _fake_resp(
            _json.loads(
                _ENS_SOMATIC_VARS
                if feature == "somatic_transcript_variation"
                else _ENS_TRANSCRIPT_VARS
            )
        ),
    )


def test_select_variants_composed_differential(spark, tmp_path, monkeypatch):
    """The composed select_variants (UniProt flatten + Ensembl
    germline+somatic flatten → union) against the reference's own
    select_variants (proteofav/variants.py:520-620) running live with its
    network layer monkeypatched to the reference's recorded payloads —
    both the id-resolution chain (species → symbol xref → preferred ENSP)
    and the two returned tables must agree."""
    from proteofav_spark.config import defaults
    from proteofav_spark.sources.variants import select_variants

    _, RV, _ = _ref_msas_vars()
    _patch_reference_network(monkeypatch, RV)
    ref_uni, ref_ens = RV.select_variants(
        "P17612", id_source="uniprot", synonymous=True
    )

    monkeypatch.setattr(defaults, "db_lake", str(tmp_path))
    uni, ens = select_variants(
        spark, "P17612", id_source="uniprot", synonymous=True,
        fetch=_ours_fetch,
    )
    assert uni is not None and ens is not None
    _vars_compare(ref_uni, uni, min_cols=6)
    _vars_compare(ref_ens, ens, min_cols=6)


def test_fetch_variants_id_resolution_and_staging(spark, tmp_path, monkeypatch):
    """fetch_variants end-to-end with a mocked fetch: resolves the
    preferred ENSP through the xref chain, stages each payload once in
    db_lake, returns the 3 flattened tables; id_source validation and
    the ensembl-side reverse resolution also covered."""
    from proteofav_spark.config import defaults
    from proteofav_spark.sources.variants import fetch_variants

    monkeypatch.setattr(defaults, "db_lake", str(tmp_path))
    with pytest.raises(ValueError, match="ID source"):
        fetch_variants(spark, "P17612", id_source="pdb")

    uni, germ, som = fetch_variants(
        spark, "P17612", id_source="uniprot",
        ensembl_germline_vars=True, ensembl_somatic_vars=True,
        fetch=_ours_fetch,
    )
    assert uni is not None and germ is not None and som is not None
    assert uni.count() == 2
    assert germ.count() == 2 and som.count() == 2
    assert (tmp_path / "P17612.json").exists()
    assert (tmp_path / "ENSP00000288602_ensembl_germline.json").exists()
    assert (tmp_path / "ENSP00000288602_ensembl_somatic.json").exists()

    # ensembl id_source resolves the preferred UniProt id in reverse
    uni2, germ2, som2 = fetch_variants(
        spark, "ENSP00000288602", id_source="ensembl",
        uniprot_vars=True, ensembl_germline_vars=False,
        ensembl_somatic_vars=False, fetch=_ours_fetch,
    )
    assert uni2 is not None and germ2 is None and som2 is None
    assert uni2.count() == 2


def test_variants_for_accessions_composed_merge(spark, tmp_path, monkeypatch):
    """The legacy merge path's per-accession loop with ensembl=True runs
    select_variants + uniprot_vars_ensembl_vars_merger per accession
    (reference proteofav/mergers.py:349-372) and the merged frame carries
    both sides' payload columns, collapsed by xrefs_id. The recorded
    P17612 payload lacks ``frequency`` (on which the merger — faithfully
    to the reference, mergers.py:209-216 — refuses), so the UniProt side
    gets the Proteins-API population-frequency field added."""
    import json as _json

    from proteofav_spark.config import defaults
    from proteofav_spark.plans.generator import variants_for_accessions

    payload = _json.loads(_EBI_VARS_P17612)
    for f in payload["features"]:
        f["frequency"] = 0.01

    def fetch(url):
        if "variation/" in url:
            return _json.dumps(payload).encode()
        return _ours_fetch(url)

    monkeypatch.setattr(defaults, "db_lake", str(tmp_path))
    merged = variants_for_accessions(
        spark, ["P17612"], ensembl=True, fetch=fetch
    )
    assert merged is not None
    assert merged.count() >= 4  # 2 uniprot + 4 ensembl rows, none share keys
    cols = set(merged.columns)
    assert "xrefs_id" in cols
    # a uniprot-side column and an ensembl-side column both survive
    assert "wildType" in cols or "alternativeSequence" in cols
    assert any(c.startswith("translation") or c == "allele" for c in cols)


# --- table_merger source-presence lattice differential (VERDICT r12 #8) --

def test_table_merger_presence_lattice_differential(spark):
    """The conditional merge tree (proteofav/mergers.py:403-446) over the
    ENTIRE 2^6 source-presence lattice, reference executed live per mask:
    which pairwise mergers fire, which sources are silently ignored
    (annotation/variants without SIFTS, dssp/validation without mmCIF),
    the <2-tables refusal (the reference raises accidentally — pandas
    truthiness ValueError from ``mmcif_table or sifts_table`` — ours a
    deliberate TableMergerError), and the all-absent → None return. Per
    mask the row count and each source's join-hit count (non-null marker
    column) must agree; the full-cell equality of every pairwise merger
    and of the flagship 3-table path is pinned by the dedicated
    differentials above."""
    import itertools
    import json as _json

    RS, RD, RA = _ref()
    RVA, RMG = _ref_more()
    _, RV, _ = _ref_msas_vars()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.sifts as RSI
    finally:
        sys.path.remove("/root/reference")

    from proteofav_spark.operators.structures import filter_structures
    from proteofav_spark.plans.mergers import table_merger
    from proteofav_spark.sources.annotation import (
        filter_annotation,
        parse_gff_features,
    )
    from proteofav_spark.sources.dssp import filter_dssp, parse_dssp_residues
    from proteofav_spark.sources.sifts import filter_sifts, parse_sifts_residues
    from proteofav_spark.sources.structures import parse_mmcif_atoms
    from proteofav_spark.sources.validation import (
        filter_validation,
        parse_validation_residues,
    )
    from proteofav_spark.sources.variants import flatten_uniprot_variants

    # --- build all six 2pah tables once, both sides -----------------------
    m_ref = RS.filter_structures(
        RS.parse_mmcif_atoms(f"{TD}/mmcif/2pah.cif", excluded_cols=()),
        chains=("A",), atoms=("CA",),
    )
    d_ref = RD.filter_dssp(
        RD.parse_dssp_residues(f"{TD}/dssp/2pah.dssp"), chains=("A",)
    )
    s_ref = RSI.filter_sifts(
        RSI.parse_sifts_residues(f"{TD}/sifts/2pah.xml", excluded_cols=()),
        chains=("A",),
    )
    v_raw = RVA.parse_validation_residues(f"{TD}/validation/2pah_validation.xml")
    v_raw["validation_icode"] = v_raw["validation_icode"].replace({"": "?", " ": "?"})
    v_raw["validation_altcode"] = v_raw["validation_altcode"].replace({"": ".", " ": "."})
    v_ref = RVA.filter_validation(v_raw, chains=("A",))
    a_ref = RA.filter_annotation(
        RA.parse_gff_features(f"{TD}/annotation/P00439.gff"),
        identifier="P00439", annotation_agg=True,
    )
    payload = _json.loads(_EBI_VARS_P17612)
    payload["accession"] = "P00439"
    for feat, begin in zip(payload["features"], ("118", "120")):
        feat["begin"] = begin
        feat["end"] = begin
    var_ref = RV.flatten_uniprot_variants_ebi(_json.loads(_json.dumps(payload)))

    m = filter_structures(
        parse_mmcif_atoms(spark, f"{TD}/mmcif/2pah.cif"),
        chains=("A",), atoms=("CA",),
    )
    d = filter_dssp(parse_dssp_residues(spark, f"{TD}/dssp/2pah.dssp"), chains=("A",))
    s = filter_sifts(parse_sifts_residues(spark, f"{TD}/sifts/2pah.xml"), chains=("A",))
    v = filter_validation(
        parse_validation_residues(spark, f"{TD}/validation/2pah_validation.xml"),
        chains=("A",),
    )
    a = filter_annotation(
        parse_gff_features(spark, f"{TD}/annotation/P00439.gff"),
        identifier="P00439", annotation_agg=True,
    )
    var = _spark_json(spark, __import__("pathlib").Path(
        __import__("tempfile").mkdtemp()), _json.dumps(payload), "vars.json")
    var = flatten_uniprot_variants(var)
    # cache the Spark inputs: 64 masks re-plan from these six frames
    m, d, s, v, a, var = (t.localCheckpoint(eager=True) for t in (m, d, s, v, a, var))

    # marker column per source: its non-null count in the merged frame
    # counts that source's surviving join hits
    markers = {
        "dssp": "SS", "validation": "validation_rsrz",
        "annotation": "annotation", "variants": "xrefs_id",
    }
    mismatches = []
    for mask in itertools.product((False, True), repeat=6):
        has_m, has_d, has_s, has_v, has_a, has_var = mask
        kw_ref = dict(
            mmcif_table=m_ref if has_m else None,
            dssp_table=d_ref if has_d else None,
            sifts_table=s_ref if has_s else None,
            validation_table=v_ref if has_v else None,
            annotation_table=a_ref if has_a else None,
            variants_table=var_ref if has_var else None,
        )
        kw_ours = dict(
            mmcif_table=m if has_m else None,
            dssp_table=d if has_d else None,
            sifts_table=s if has_s else None,
            validation_table=v if has_v else None,
            annotation_table=a if has_a else None,
            variants_table=var if has_var else None,
        )
        ref_err = ref_out = None
        try:
            ref_out = RMG.table_merger(**kw_ref)
        except Exception as exc:  # noqa: BLE001 — the lattice includes raises
            ref_err = exc
        our_err = our_out = None
        try:
            our_out = table_merger(**kw_ours)
        except Exception as exc:  # noqa: BLE001
            our_err = exc
        tag = "".join("mdsvaV"[i] for i in range(6) if mask[i]) or "-"
        if (ref_err is None) != (our_err is None):
            mismatches.append((tag, f"raise mismatch: ref={ref_err!r} ours={our_err!r}"))
            continue
        if ref_err is not None:
            continue  # both refused this mask
        if (ref_out is None) != (our_out is None):
            mismatches.append((tag, f"None mismatch: ref={type(ref_out)} ours={type(our_out)}"))
            continue
        if ref_out is None:
            continue  # both: no merge possible, silently None
        ours_pd = our_out.toPandas()
        if len(ref_out) != len(ours_pd):
            mismatches.append((tag, f"rows ref={len(ref_out)} ours={len(ours_pd)}"))
            continue
        for src, col in markers.items():
            in_ref = col in ref_out.columns
            in_ours = col in ours_pd.columns
            if in_ref != in_ours:
                mismatches.append((tag, f"{src}: column {col} ref={in_ref} ours={in_ours}"))
                continue
            if in_ref and ref_out[col].notna().sum() != ours_pd[col].notna().sum():
                mismatches.append(
                    (tag, f"{src}: hits ref={ref_out[col].notna().sum()} "
                          f"ours={ours_pd[col].notna().sum()}")
                )
    assert mismatches == [], mismatches[:5]


def test_legacy_merge_tables_sequence_check_differential(spark, monkeypatch):
    """The legacy merge_tables' inline sequence checks
    (proteofav/mergers.py:286-339: lowercase-Cys fold, NULL/'X' masking,
    raise-vs-warn) executed live with its select_* layer monkeypatched to
    the 2pah fixture tables, against our table_merger +
    check_sequence_consistency composition: clean input passes both, a
    corrupted DSSP AA column raises on both in 'raise' mode, still
    merges on both in 'warn' mode, and atoms=None skips the check on
    both sides even when corrupted."""
    RS, RD, _ = _ref()
    _, RMG = _ref_more()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.sifts as RSI
    finally:
        sys.path.remove("/root/reference")

    from proteofav_spark.operators.structures import filter_structures
    from proteofav_spark.plans.generator import (
        SequenceCheckError,
        check_sequence_consistency,
    )
    from proteofav_spark.plans.mergers import table_merger
    from proteofav_spark.sources.dssp import filter_dssp, parse_dssp_residues
    from proteofav_spark.sources.sifts import filter_sifts, parse_sifts_residues
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    m_ref = RS.filter_structures(
        RS.parse_mmcif_atoms(f"{TD}/mmcif/2pah.cif", excluded_cols=()),
        chains=("A",), atoms=("CA",),
    )
    d_ref = RD.filter_dssp(
        RD.parse_dssp_residues(f"{TD}/dssp/2pah.dssp"), chains=("A",)
    )
    s_ref = RSI.filter_sifts(
        RSI.parse_sifts_residues(f"{TD}/sifts/2pah.xml", excluded_cols=()),
        chains=("A",),
    )
    d_bad_ref = d_ref.copy()
    # corrupt every real residue letter to 'W' except actual Trp — a
    # sequence the mmCIF side cannot match
    d_bad_ref.loc[d_bad_ref["AA"].notna() & (d_bad_ref["AA"] != "W"), "AA"] = "W"

    tables = {"m": m_ref, "d": d_ref, "s": s_ref}

    def run_ref(sequence_check, corrupted, atoms="CA"):
        monkeypatch.setattr(
            RMG, "select_structures", lambda *a, **k: tables["m"].copy()
        )
        monkeypatch.setattr(
            RMG, "select_dssp",
            lambda *a, **k: (d_bad_ref if corrupted else d_ref).copy(),
        )
        monkeypatch.setattr(RMG, "select_sifts", lambda *a, **k: s_ref.copy())
        return RMG.merge_tables(
            pdb_id="2pah", chain="A", atoms=atoms,
            sequence_check=sequence_check,
        )

    m = filter_structures(
        parse_mmcif_atoms(spark, f"{TD}/mmcif/2pah.cif"),
        chains=("A",), atoms=("CA",),
    )
    d = filter_dssp(parse_dssp_residues(spark, f"{TD}/dssp/2pah.dssp"), chains=("A",))
    s = filter_sifts(parse_sifts_residues(spark, f"{TD}/sifts/2pah.xml"), chains=("A",))
    d_bad = d.withColumn(
        "AA",
        F.when(F.col("AA").isNotNull() & (F.col("AA") != "W"), F.lit("W"))
        .otherwise(F.col("AA")),
    )

    def run_ours(sequence_check, corrupted, atoms="CA"):
        merged = table_merger(
            m, d_bad if corrupted else d, s, legacy_resnum_key=True
        )
        if atoms is not None and sequence_check in ("raise", "warn"):
            check_sequence_consistency(merged, "dssp", sequence_check)
            check_sequence_consistency(merged, "sifts", sequence_check)
        return merged

    # clean + raise: both succeed, same cardinality
    ref_clean = run_ref("raise", corrupted=False)
    ours_clean = run_ours("raise", corrupted=False)
    assert len(ref_clean) == ours_clean.count() > 300

    # corrupted + raise: both refuse
    with pytest.raises(ValueError, match="different sequences"):
        run_ref("raise", corrupted=True)
    with pytest.raises(SequenceCheckError, match="different sequences"):
        run_ours("raise", corrupted=True)

    # corrupted + warn: both merge anyway, same cardinality
    ref_warn = run_ref("warn", corrupted=True)
    ours_warn = run_ours("warn", corrupted=True)
    assert len(ref_warn) == ours_warn.count() > 300

    # corrupted + atoms=None: the check is skipped on both sides
    # (reference: 'sequence check not support for multiple atoms')
    ref_skip = run_ref("raise", corrupted=True, atoms=None)
    ours_skip = run_ours("raise", corrupted=True, atoms=None)
    assert len(ref_skip) == ours_skip.count() > 300


def test_constrain_fill_replace_unconstrained_columns_differential(spark):
    """The reference's for-col loop (proteofav/utils.py:184-199) applies
    nan_value_dict / replace_value_dict to ANY table column — membership
    in col_type_dict is irrelevant, and fills still run when NO column is
    constrained at all (ADVICE r12 low: ours only visited constrained
    columns and returned early without them). Run the reference live on
    both witnesses."""
    import numpy as _np
    import pandas as _pd

    _ref()
    sys.path.insert(0, "/root/reference")
    try:
        import proteofav.utils as RU
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.core import constrain_column_types

    # witness 1: 'b' is filled+replaced though only 'a' is constrained
    pdf = _pd.DataFrame({"a": ["1", "2"], "b": ["x", _np.nan]})
    ref = RU.constrain_column_types(
        pdf.copy(), {"a": "int64"},
        nan_value_dict={"b": "filled"},
        replace_value_dict={"b": ("x", "y")},
    )
    assert list(ref["b"]) == ["y", "filled"]
    sdf = spark.createDataFrame([("1", "x"), ("2", None)], "a string, b string")
    ours = constrain_column_types(
        sdf, {"a": "bigint"},
        nan_value_dict={"b": "filled"},
        replace_value_dict={"b": ("x", "y")},
    )
    rows = {r["a"]: r["b"] for r in ours.collect()}
    assert rows == {1: "y", 2: "filled"}

    # witness 2: no constrained column present at all — fills still run
    ref2 = RU.constrain_column_types(
        _pd.DataFrame({"b": ["x", _np.nan]}), {"zzz": "int64"},
        nan_value_dict={"b": "filled"},
    )
    assert list(ref2["b"]) == ["x", "filled"]
    ours2 = constrain_column_types(
        spark.createDataFrame([("x",), (None,)], "b string"),
        {"zzz": "bigint"},
        nan_value_dict={"b": "filled"},
    )
    assert sorted(r["b"] for r in ours2.collect()) == ["filled", "x"]


# --- filter_sifts / filter_validation option grids (r13, extending the
# r12 dssp/structures grid family to the remaining per-source filters) --

def _grid_cell(v):
    """Comparator for the r13 filter grids: the Spark frame is built from
    the reference-parsed pandas table under a coarse string/long/double
    schema, so mixed-object cells (int-typed entityIds, tuple-valued
    region aggregates) need canonicalizing — numbers compare as %.6g on
    both sides, tuples by their (already sorted) str form; exact typed
    cell parity is pinned by the per-source parse differentials."""
    v = _mnorm_cell(v)
    if isinstance(v, tuple):
        return str(v)
    if isinstance(v, (int, float)):
        return format(float(v), ".6g")
    if isinstance(v, str):
        try:
            return format(float(v), ".6g")
        except ValueError:
            return v
    return v


@lru_cache(maxsize=1)
def _sifts_grid_pdf():
    """Reference-parsed 2pah SIFTS residues + adversarial rows: NULL in
    every selector key (row_selector's isin drops NULLs, C2) and an
    off-catalog chain that only the entityId selector can reach."""
    import numpy as _np

    _ref_more()  # scipy/requests_cache stubs + lxml shim + json_normalize
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.sifts as RSI
    finally:
        sys.path.remove("/root/reference")
    pdf = RSI.parse_sifts_residues(f"{TD}/sifts/2pah.xml", excluded_cols=())
    extra = pdf.iloc[:3].copy()
    extra.loc[:, "PDB_entityId"] = [None, "Z", "A"]
    extra.loc[:, "PDB_dbChainId"] = ["A", None, "A"]
    extra.loc[:, "PDB_dbResNum"] = ["118", "119", None]
    extra.loc[:, "UniProt_dbAccessionId"] = [None, "P99999", "P00439"]
    extra.loc[:, "UniProt_dbResNum"] = ["118", None, "120"]
    out = pdf._append(extra, ignore_index=True) if hasattr(pdf, "_append") else pdf.append(extra, ignore_index=True)
    return out.where(out.notna(), _np.nan)


_SIFTS_GRID = st.fixed_dictionaries(
    {
        "chains": st.sampled_from([None, ("A",), ("Z",), ("NOPE",)]),
        "chain_auth": st.sampled_from([None, ("A",)]),
        "res": st.sampled_from([None, ("118", "119", "120"), ("99999",)]),
        "uniprot": st.sampled_from([None, ("P00439",), ("P99999",)]),
        "site": st.sampled_from([None, ("118", "120")]),
        "excluded": st.sampled_from([(), ("UniProt_dbResName",)]),
    }
)


@given(opts=_SIFTS_GRID)
@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_filter_sifts_option_grid_vs_reference(spark, opts):
    """filter_sifts under randomized selector combinations run live
    (proteofav/sifts.py:378-421) on the parsed 2pah residues PLUS
    adversarial NULL-key rows: the five row_selector stages compose in
    reference order, NULL keys drop through isin (C2), excluded_cols
    rides through, and a selection that empties the table raises on
    BOTH sides."""
    pdf = _sifts_grid_pdf().copy()  # installs the shims + module
    sys.path.insert(0, "/root/reference")
    try:
        import proteofav.sifts as RSI
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.sources.sifts import filter_sifts

    kw = dict(
        chains=opts["chains"], chain_auth=opts["chain_auth"],
        res=opts["res"], uniprot=opts["uniprot"], site=opts["site"],
        excluded_cols=opts["excluded"],
    )
    ref_err = ref = None
    try:
        ref = RSI.filter_sifts(pdf.copy(), **kw)
    except ValueError as exc:
        ref_err = exc

    def spark_type(dt):
        k = str(dt)
        if k.startswith("int"):
            return "long"
        if k.startswith("float"):
            return "double"
        return "string"

    schema = ", ".join(f"`{c}` {spark_type(pdf[c].dtype)}" for c in pdf.columns)
    rows = [
        tuple(_mnorm_cell(v) for v in r) for r in pdf.itertuples(index=False)
    ]
    sdf = spark.createDataFrame(rows, schema)
    try:
        ours = filter_sifts(sdf, **kw)
        ours_rows = ours.collect()
    except EmptyTableError:
        assert ref_err is not None, (opts, "ref produced rows, ours raised")
        return
    assert ref_err is None, (opts, "reference raised on empty, ours produced rows")
    shared = [c for c in ref.columns if c in ours.columns]
    assert len(shared) == len(ref.columns)
    want = sorted(
        (tuple(_grid_cell(r[c]) for c in shared) for _, r in ref.iterrows()),
        key=repr,
    )
    got = sorted(
        (tuple(_grid_cell(r[c]) for c in shared) for r in ours_rows), key=repr
    )
    assert got == want, (opts, want[:2], got[:2])


@lru_cache(maxsize=1)
def _validation_grid_pdf():
    import numpy as _np

    RVA, _ = _ref_more()
    pdf = RVA.parse_validation_residues(f"{TD}/validation/2pah_validation.xml")
    # same pandas≥2 str.replace bitrot restoration the parse differential
    # documents — res_full needs the intended '?' placeholders
    pdf["validation_icode"] = pdf["validation_icode"].replace({"": "?", " ": "?"})
    pdf["validation_altcode"] = pdf["validation_altcode"].replace({"": ".", " ": "."})
    extra = pdf.iloc[:2].copy()
    extra.loc[:, "validation_chain"] = [None, "A"]
    extra.loc[:, "validation_resnum"] = ["118", None]
    out = pdf._append(extra, ignore_index=True) if hasattr(pdf, "_append") else pdf.append(extra, ignore_index=True)
    return out.where(out.notna(), _np.nan)


_VALIDATION_GRID = st.fixed_dictionaries(
    {
        "chains": st.sampled_from([None, ("A",), ("NOPE",)]),
        "res": st.sampled_from([None, ("118", "119"), ("99999",)]),
        "add_res_full": st.booleans(),
        "excluded": st.sampled_from([(), ("validation_rsr",)]),
    }
)


@given(opts=_VALIDATION_GRID)
@settings(
    max_examples=_ex(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_filter_validation_option_grid_vs_reference(spark, opts):
    """filter_validation under randomized option combinations run live
    (proteofav/validation.py:142-175): res_full composition before the
    selectors, NULL-key drops, exclusion pass-through, and the
    empty-result raise — both sides, same classification."""
    RVA, _ = _ref_more()
    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.sources.validation import filter_validation

    pdf = _validation_grid_pdf().copy()
    kw = dict(
        chains=opts["chains"], res=opts["res"],
        add_res_full=opts["add_res_full"], excluded_cols=opts["excluded"],
    )
    ref_err = ref = None
    try:
        ref = RVA.filter_validation(pdf.copy(), **kw)
    except ValueError as exc:
        ref_err = exc

    def spark_type(dt):
        k = str(dt)
        if k.startswith("int"):
            return "long"
        if k.startswith("float"):
            return "double"
        return "string"

    schema = ", ".join(f"`{c}` {spark_type(pdf[c].dtype)}" for c in pdf.columns)
    rows = [
        tuple(_mnorm_cell(v) for v in r) for r in pdf.itertuples(index=False)
    ]
    sdf = spark.createDataFrame(rows, schema)
    try:
        ours_rows = filter_validation(sdf, **kw).collect()
    except EmptyTableError:
        assert ref_err is not None, (opts, "ref produced rows, ours raised")
        return
    assert ref_err is None, (opts, "reference raised on empty, ours produced rows")
    shared = [c for c in ref.columns if c in ours_rows[0].asDict()]
    want = sorted(
        (tuple(_grid_cell(r[c]) for c in shared) for _, r in ref.iterrows()),
        key=repr,
    )
    got = sorted(
        (tuple(_grid_cell(r[c]) for c in shared) for r in ours_rows), key=repr
    )
    assert got == want, (opts, want[:2], got[:2])


# --- mmCIF atom-tokenizer fuzz differential (r13) ------------------------

_CIF_FIELDS = [
    "group_PDB", "id", "type_symbol", "label_atom_id", "label_alt_id",
    "label_comp_id", "label_asym_id", "label_entity_id", "label_seq_id",
    "pdbx_PDB_ins_code", "Cartn_x", "Cartn_y", "Cartn_z", "occupancy",
    "B_iso_or_equiv", "auth_seq_id", "auth_comp_id", "auth_asym_id",
    "auth_atom_id", "pdbx_PDB_model_num",
]

# per-column token pools: realistic mmCIF values plus the quoting corner
# cases — double-quoted primes (ribose atoms), single-quoted tokens,
# '?'/'.' placeholders, negative/exponent floats, HETATM groups
_CIF_POOLS = {
    "group_PDB": ["ATOM", "HETATM"],
    "id": ["1", "2", "9999999"],
    "type_symbol": ["C", "N", "O", "FE"],
    "label_atom_id": ["CA", '"C1\'"', '"O5\'"', "'N9'", "OXT"],
    "label_alt_id": [".", "A", "B"],
    "label_comp_id": ["VAL", "HOH", "A", "DA"],
    "label_asym_id": ["A", "B", "AA"],
    "label_entity_id": ["1", "2"],
    "label_seq_id": ["1", "118", "."],
    "pdbx_PDB_ins_code": ["?", "A"],
    "Cartn_x": ["-7.069", "0.000", "1.5e2", "-0.001"],
    "Cartn_y": ["21.943", "-21.943"],
    "Cartn_z": ["18.770", "100.0"],
    "occupancy": ["1.0", "0.50"],
    "B_iso_or_equiv": ["56.51", "-1.00"],
    "auth_seq_id": ["118", "1", "-5"],
    "auth_comp_id": ["VAL", "HOH"],
    "auth_asym_id": ["A", "'B'"],
    "auth_atom_id": ["CA", '"C2\'"'],
    "pdbx_PDB_model_num": ["1", "2"],
}


@given(
    rows=st.lists(
        st.fixed_dictionaries(
            {c: st.sampled_from(_CIF_POOLS[c]) for c in _CIF_FIELDS}
        ),
        min_size=1, max_size=8,
    )
)
@settings(
    max_examples=_ex(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mmcif_tokenizer_fuzz_vs_reference(spark, rows):
    """parse_mmcif_atoms on RANDOMIZED _atom_site loops — double-quoted
    prime atom names ("C1'"), single-quoted tokens, '?'/'.' placeholders,
    exponent/negative floats, HETATM groups — the reference's pandas
    delim_whitespace+quotechar parse run live vs our quote-aware
    tokenizer. ONE deliberate normalization: pandas' quotechar is '\"'
    only, so the reference KEEPS single-quote characters in cells ('B' →
    \"'B'\") while ours strips both quote kinds per the CIF token rules —
    the comparator strips outer single quotes from the reference cells
    (the CIF-correct reading; fixtures never carry spaced single-quoted
    values so the fixture differentials cannot see this corner)."""
    import os
    import tempfile

    RS, _, _ = _ref()
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    body = "\n".join(
        " ".join(r[c] for c in _CIF_FIELDS) for r in rows
    )
    text = (
        "data_test\n#\nloop_\n"
        + "\n".join(f"_atom_site.{c}" for c in _CIF_FIELDS)
        + "\n" + body + "\n#\n"
    )
    fd, path = tempfile.mkstemp(suffix=".cif")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(text)
        ref = RS.parse_mmcif_atoms(path, excluded_cols=())
        ours = parse_mmcif_atoms(spark, path).toPandas()
    finally:
        os.unlink(path)

    shared = [c for c in ref.columns if c in ours.columns]
    assert len(shared) >= len(_CIF_FIELDS)

    def cell(v):
        v = _grid_cell(v)
        if isinstance(v, str) and len(v) >= 2 and v[0] == v[-1] == "'":
            return v[1:-1]
        return v

    want = sorted(
        (tuple(cell(r[c]) for c in shared) for _, r in ref.iterrows()),
        key=repr,
    )
    got = sorted(
        (tuple(cell(r[c]) for c in shared) for _, r in ours.iterrows()),
        key=repr,
    )
    assert len(want) == len(got) == len(rows)
    assert want == got, (want[:2], got[:2])


# --- GFF GROUP attribute fuzz differential (r13) -------------------------

_GFF_GROUPS = [
    "ID=PRO_0000016%3B1;Note=Phenylalanine-4-hydroxylase",
    "Note=In%20HPA%3B%20F-%3EL;ID=VAR_000001",
    "Note=first;Note=second;ID=X1",          # repeated key -> list
    "Ontology_term=ECO:0000269;evidence=ECO:0000269|PubMed:1",
    "Dbxref=PMID:123;Note=with%25percent",   # literal % via %25
    "Note=Ca2+binding;ID=DOM_1",             # literal '+' (A11)
    "ID=ONLY",
    "Note=",                                  # blank value: parse_qs drops
    "",                                       # empty GROUP cell
    "Note=a=b%3Dc;ID=EQ",                    # '=' inside the value
]


@given(
    groups=st.lists(st.sampled_from(_GFF_GROUPS), min_size=1, max_size=6),
)
@settings(
    max_examples=_ex(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gff_group_attrs_fuzz_vs_reference(spark, groups):
    """parse_gff_features' GROUP attribute expansion on RANDOMIZED
    attribute strings — %-escapes (%20/%3B/%3D/%25), repeated keys,
    '='-in-value, blank values, empty GROUP — the reference's
    parse_qs(separator=';') path (B1-restored) run live vs our
    split+url_decode expansion. ONE deliberate normalization: parse_qs
    decodes '+' as a SPACE (form-encoding), which corrupts literal plus
    signs in GFF notes ('Ca2+binding' → 'Ca2 binding'); ours keeps '+'
    verbatim per GFF3 (%XX-only escapes) — ledgered A11, the comparator
    applies the reference's '+'→' ' to our cells before comparing and a
    dedicated assert pins our verbatim '+'."""
    import os
    import tempfile

    _, _, RA = _ref()
    from proteofav_spark.sources.annotation import parse_gff_features

    lines = ["##gff-version 3", "##sequence-region P00439 1 452"]
    for i, g in enumerate(groups):
        lines.append(
            "\t".join([
                "P00439", "UniProtKB", "Chain", str(10 + i), str(20 + i),
                ".", ".", ".", g,
            ])
        )
    fd, path = tempfile.mkstemp(suffix=".gff")
    ref_err = ref = None
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        try:
            ref = RA.parse_gff_features(path, excluded_cols=("empty",))
        except ValueError as exc:
            ref_err = exc
        except AttributeError:
            # reference quirk (A12): an EMPTY GROUP field reads as NaN
            # and its bare `data.GROUP.apply(parse_qs)` crashes
            # (float.decode); ours treats missing GROUP as no attributes
            assert any(g == "" for g in groups)
            ref_err = "attrerror"
        ours = parse_gff_features(spark, path).toPandas()
    finally:
        os.unlink(path)

    if ref_err is not None:
        # reference quirks (A12): an all-attr-less file empties through
        # the inner index-merge -> ValueError, and a NaN GROUP crashes
        # parse_qs outright; ours keeps the rows (graceful divergence)
        if ref_err != "attrerror":
            assert all(
                RA.parse_qs(g) == {} for g in groups
            ), (groups, "reference raised though some GROUP has attributes")
        assert len(ours) == len(groups)
        return
    assert len(ref) == len(ours) == len(groups)
    shared = [c for c in ref.columns if c in ours.columns and c != "GROUP"]
    assert {"TYPE", "START", "END"} <= set(shared)

    def cell(v):
        if type(v).__name__ == "ndarray":
            v = tuple(v.tolist())
        v = _mnorm_cell(v)
        if isinstance(v, str):
            return v.replace("+", " ")
        if isinstance(v, tuple):
            return tuple(x.replace("+", " ") if isinstance(x, str) else x for x in v)
        return v

    def norm(df):
        return sorted(
            (tuple(cell(r[c]) for c in shared) for _, r in df.iterrows()),
            key=repr,
        )

    assert norm(ref) == norm(ours), (groups, shared, norm(ref)[:2], norm(ours)[:2])
    # our verbatim-'+' pin (A11): the literal plus survives OUR parse
    if any("Ca2+" in g for g in groups):
        notes = [
            n
            for ns in ours["Note"]
            if ns is not None
            for n in (ns.tolist() if type(ns).__name__ == "ndarray" else [ns])
            if n
        ]
        assert any("Ca2+binding" == n for n in notes), notes


# --- ICGC flatten differential (r13) -------------------------------------

_ICGC_PAYLOAD = {
    "hits": [
        {"id": "MU1", "mutation": "G>A", "affectedDonorCountTotal": 3,
         "transcripts": [
            {"id": "ENST1", "functionalImpact": "High",
             "consequence": {"aaMutation": "A262V", "geneAffectedId": "ENSG1",
                             "functionalImpact": "High"}},
            {"id": "ENST2", "consequence": {"aaMutation": "A100*"}},
         ]},
        {"id": "MU2", "mutation": "C>T", "affectedDonorCountTotal": 7,
         "transcripts": [
            {"id": "ENST1", "consequence": {"aaMutation": "R43"}},
         ]},
    ]
}


def test_icgc_flatten_differential(spark, tmp_path, monkeypatch):
    """flatten_icgc_variants vs the reference's _fetch_icgc_variants
    (proteofav/variants.py:887-918) run live on a canned protein-endpoint
    payload, with ONE bitrot restoration: modern json_normalize flattens
    nested record dicts into dotted columns, breaking the reference's
    own `data.pop('consequence')` — `max_level=0` restores the dict-cell
    era behavior its code was written for. Pins the exact column
    contract: id = HIT id (transcript id dropped), underscore-prefixed
    meta (_mutation, _affectedDonorCountTotal), unprefixed consequence
    fields with `_protein` only on collision, NULL (not '') unmatched
    transition groups — all four were live divergences before r13."""
    import json as _json

    import pandas as _pd
    import pandas.io.json as _pij

    from proteofav_spark.operators.variants_extra import flatten_icgc_variants

    _, RV, _ = _ref_msas_vars()  # installs pij.json_normalize first
    _orig = _pd.json_normalize
    monkeypatch.setattr(
        _pij, "json_normalize", lambda *a, **k: _orig(*a, max_level=0, **k)
    )

    class _resp:
        def json(self):
            return _json.loads(_json.dumps(_ICGC_PAYLOAD))

    monkeypatch.setattr(
        RV, "fetch_from_url_or_retry", lambda url, **kw: _resp()
    )
    ref = RV._fetch_icgc_variants("ENST1")

    p = tmp_path / "icgc.json"
    p.write_text(_json.dumps(_ICGC_PAYLOAD))
    raw = spark.read.option("multiLine", True).json(str(p))
    ours = flatten_icgc_variants(raw, "ENST1").toPandas()

    assert set(ref.columns) == set(ours.columns), (
        sorted(ref.columns), sorted(ours.columns)
    )
    shared = sorted(ref.columns)

    def norm(df):
        return sorted(
            (tuple(_mnorm_cell(r[c]) for c in shared) for _, r in df.iterrows()),
            key=repr,
        )

    assert norm(ref) == norm(ours), (norm(ref), norm(ours))


# --- id-mapping getter differentials (r13, the select_variants chain) ----

_MAP_ENTRY = st.fixed_dictionaries(
    {
        "primary_id": st.sampled_from(["P1", "P22", "Q333", "A0A0A0"]),
        "dbname": st.sampled_from(
            ["Uniprot/SWISSPROT", "Uniprot/SPTREMBL", "RefSeq"]
        ),
    },
    optional={
        "ensembl_identity": st.sampled_from([90.0, 99.5, 100.0]),
        "xref_identity": st.sampled_from([90.0, 99.5]),
        "xref_start": st.sampled_from([1, 10]),
        "xref_end": st.sampled_from([100, 350]),
    },
)


@given(data=st.lists(_MAP_ENTRY, min_size=0, max_size=6))
@settings(max_examples=_ex(50), deadline=None)
def test_preferred_uniprot_id_mapping_differential(data):
    """get_uniprot_id_from_mapping + get_preferred_uniprot_id_from_mapping
    vs the live reference (proteofav/variants.py:255-319) on randomized
    xrefs/id entries — the `>=` keeps-last tie rule, the shortest-id
    guard NESTED inside the score branch, missing-field skips, and the
    SWISSPROT/SPTREMBL dbname gate (dedup by full entry) all replicated
    exactly."""
    import json as _json

    _, RV, _ = _ref_msas_vars()
    from proteofav_spark.sources.variants import (
        get_preferred_uniprot_id_from_mapping,
        get_uniprot_id_from_mapping,
    )

    payload = _json.loads(_json.dumps(data))
    for full in (False, True):
        ref = RV.get_uniprot_id_from_mapping(payload, full_entry=full)
        ours = get_uniprot_id_from_mapping(payload, full_entry=full)
        assert ref == ours, (data, full, ref, ours)
    ref_best = RV.get_preferred_uniprot_id_from_mapping(
        RV.get_uniprot_id_from_mapping(payload, full_entry=True)
    )
    our_best = get_preferred_uniprot_id_from_mapping(
        get_uniprot_id_from_mapping(payload, full_entry=True)
    )
    assert ref_best == our_best, (data, ref_best, our_best)


@given(
    data=st.lists(
        st.fixed_dictionaries(
            {},
            optional={
                "type": st.sampled_from(["translation", "transcript", "gene"]),
                "id": st.sampled_from(["ENSP1", "ENSP2", "ENST1"]),
            },
        ),
        min_size=0, max_size=6,
    )
)
@settings(max_examples=_ex(30), deadline=None)
def test_ensembl_protein_id_mapping_differential(data):
    """get_ensembl_protein_id_from_mapping vs the live reference
    (proteofav/variants.py:238-252): translation-type gate, missing-key
    skips, first-seen dedup order."""
    import json as _json

    _, RV, _ = _ref_msas_vars()
    from proteofav_spark.sources.variants import (
        get_ensembl_protein_id_from_mapping,
    )

    payload = _json.loads(_json.dumps(data))
    assert RV.get_ensembl_protein_id_from_mapping(payload) == (
        get_ensembl_protein_id_from_mapping(payload)
    ), data


@given(
    table=st.dictionaries(
        st.sampled_from(["ENSP1", "ENSP2", "ENSP3"]),
        st.lists(_MAP_ENTRY, min_size=0, max_size=3),
        min_size=0, max_size=3,
    ),
    uniprot_id=st.sampled_from([None, "P1", "P22"]),
)
@settings(
    max_examples=_ex(30),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_preferred_ensembl_id_mapping_differential(table, uniprot_id, monkeypatch):
    """get_preferred_ensembl_id_from_mapping vs the live reference
    (proteofav/variants.py:322-355) with the per-ENSP xref fetch
    patched to a randomized mapping table on both sides — the strict
    `>` keeps-FIRST tie rule (vs the uniprot getter's `>=` keeps-last)
    and the per-candidate fetch composition."""
    import json as _json

    _, RV, _ = _ref_msas_vars()
    from proteofav_spark import fetchers
    from proteofav_spark.sources.variants import (
        get_preferred_ensembl_id_from_mapping,
    )

    payload = _json.loads(_json.dumps(table))
    identifiers = sorted(payload)

    monkeypatch.setattr(
        RV, "fetch_ensembl_uniprot_mapping",
        lambda ensp, **kw: _fake_resp(payload.get(ensp, [])),
    )
    ref = RV.get_preferred_ensembl_id_from_mapping(
        identifiers, uniprot_id=uniprot_id
    )

    def fetch(url):
        ensp = url.rstrip("/").rsplit("/", 1)[-1]
        assert url == fetchers.url_ensembl_uniprot_xref(ensp)
        return _json.dumps(payload.get(ensp, [])).encode()

    ours = get_preferred_ensembl_id_from_mapping(
        identifiers, uniprot_id=uniprot_id, fetch=fetch
    )
    assert ref == ours, (table, uniprot_id, ref, ours)


# --- DSSP residue-record fuzz differential (r13) -------------------------

# field spans of the DSSP fixed-width residue record (0-based, end-excl) —
# the same public layout both parsers read (proteofav/dssp.py:85-90)
_DSSP_PAINT = {
    "LINE": (0, 5), "RES": (5, 10), "INSCODE": (10, 11), "CHAIN": (11, 12),
    "SS": (16, 17), "STRUCTURE": (17, 25),
    "BP1": (25, 29), "BP2": (29, 33), "BP2_CHAIN": (33, 34), "ACC": (34, 38),
    "TCO": (85, 91), "KAPPA": (91, 97), "ALPHA": (97, 103),
    "PHI": (103, 109), "PSI": (109, 115),
    "XCA": (115, 123), "YCA": (123, 130), "ZCA": (130, 137),
}

_DSSP_HDR = (
    "  #  RESIDUE AA STRUCTURE BP1 BP2  ACC     N-H-->O    O-->H-N    "
    "N-H-->O    O-->H-N    TCO  KAPPA ALPHA  PHI   PSI    X-CA   Y-CA   Z-CA"
)


def _dssp_paint_line(r) -> str:
    """Render one fuzzed residue record into the fixed-width layout."""
    buf = [" "] * 137
    def put(span, text):
        a, b = _DSSP_PAINT[span]
        text = str(text)[: b - a]
        for i, ch in enumerate(text.rjust(b - a)):
            buf[a + i] = ch
    put("LINE", r["line"])
    put("RES", r["res"])
    put("INSCODE", r["inscode"])
    put("CHAIN", r["chain"])
    # AA is a 1-2 char code painted LEFT at col 13 ('!*' spans 13-14)
    for i, ch in enumerate(str(r["aa"])[:2]):
        buf[13 + i] = ch
    put("SS", r["ss"])
    a, b = _DSSP_PAINT["STRUCTURE"]
    for i, ch in enumerate(str(r["structure"])[: b - a]):
        buf[a + i] = ch
    put("BP1", r["bp1"])
    put("BP2", r["bp2"])
    put("BP2_CHAIN", r["bp2_chain"])
    put("ACC", r["acc"])
    # hbond quads — excluded by default on both sides; realistic filler
    for a0 in (38, 50, 61, 72):
        txt = "   0, 0.0"
        for i, ch in enumerate(txt):
            buf[a0 + i] = ch
    put("TCO", f"{r['tco']:6.3f}")
    for k in ("KAPPA", "ALPHA", "PHI", "PSI"):
        put(k, f"{r[k.lower()]:6.1f}")
    put("XCA", f"{r['xca']:8.1f}")
    put("YCA", f"{r['yca']:7.1f}")
    put("ZCA", f"{r['zca']:7.1f}")
    line = "".join(buf)
    if r["kind"] == "shortres":
        line = line[: r["cut"]]
    return line


_DSSP_ROW = st.fixed_dictionaries({
    "kind": st.sampled_from(
        ["res"] * 6 + ["break", "break_star", "header2", "blank", "shortres"]
    ),
    "line": st.integers(1, 99999),
    "res": st.integers(-99, 99999),
    "inscode": st.sampled_from([" ", "A", "B"]),
    "chain": st.sampled_from(["A", "B", "H", " "]),
    "aa": st.sampled_from(["M", "R", "K", "G", "a", "b", "X", "!"]),
    "ss": st.sampled_from([" ", "H", "E", "T", "G", "S", "B", "I"]),
    "structure": st.sampled_from(["", " +", " -XZ", "<", "3<<S+"]),
    "bp1": st.integers(0, 9999),
    "bp2": st.integers(0, 9999),
    "bp2_chain": st.sampled_from([" ", "W"]),
    "acc": st.one_of(st.integers(0, 9999), st.sampled_from(["bad", ""])),
    "tco": st.floats(-1, 1, allow_nan=False, width=32),
    "kappa": st.floats(-360, 360, allow_nan=False, width=32),
    "alpha": st.floats(-360, 360, allow_nan=False, width=32),
    "phi": st.floats(-360, 360, allow_nan=False, width=32),
    "psi": st.floats(-360, 360, allow_nan=False, width=32),
    "xca": st.floats(-999, 999, allow_nan=False, width=32),
    "yca": st.floats(-999, 999, allow_nan=False, width=32),
    "zca": st.floats(-999, 999, allow_nan=False, width=32),
    "cut": st.integers(12, 136),
})


@given(rows=st.lists(_DSSP_ROW, min_size=1, max_size=10))
@settings(
    max_examples=_ex(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dssp_parse_fuzz_vs_reference(spark, rows):
    """parse_dssp_residues on RANDOMIZED residue records — negative and
    insertion-coded residue numbers, lowercase SS-bridged cysteines,
    '!'/'!*' break rows, truncated lines, blank lines, non-numeric ACC
    cells (all-or-nothing cast poisoning), and LATER '  #'-prefixed lines
    (the reference appends-then-flags, so only the FIRST sentinel is
    consumed and later ones become junk data rows) — the reference's
    read_fwf path run live vs our substring projection."""
    import os
    import tempfile

    _, RD, _ = _ref()
    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.sources.dssp import parse_dssp_residues

    body_lines = ["==== Secondary Structure Definition ====", _DSSP_HDR]
    for r in rows:
        if r["kind"] == "blank":
            body_lines.append("   ")
        elif r["kind"] == "header2":
            body_lines.append("  #  RESIDUE AA STRUCTURE BP1 BP2  ACC")
        elif r["kind"] in ("break", "break_star"):
            aa = "!" if r["kind"] == "break" else "!*"
            body_lines.append(_dssp_paint_line({
                **r, "res": "", "inscode": " ", "chain": " ", "aa": aa,
                "ss": " ", "structure": "", "bp1": 0, "bp2": 0,
                "bp2_chain": " ", "acc": 0, "tco": 0.0, "kappa": 360.0,
                "alpha": 360.0, "phi": 360.0, "psi": 360.0,
                "xca": 0.0, "yca": 0.0, "zca": 0.0, "kind": "res",
            }))
        else:
            body_lines.append(_dssp_paint_line(r))

    fd, path = tempfile.mkstemp(suffix=".dssp")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write("\n".join(body_lines) + "\n")
        ref_err = ref = None
        try:
            ref = RD.parse_dssp_residues(path)
        except ValueError as exc:
            ref_err = exc
        try:
            ours = parse_dssp_residues(spark, path)
        except EmptyTableError:
            assert ref_err is not None, "ref produced rows, ours raised"
            return
        assert ref_err is None, "reference raised on empty, ours produced rows"
        _assert_frames_equal(ref, ours)
    finally:
        os.unlink(path)


def test_dssp_parse_keeps_later_header_sentinel_rows(spark):
    """Pinned regression (r13): a SECOND '  #'-prefixed line in the body is
    a junk DATA row on both sides — the reference's append-then-flag loop
    (proteofav/dssp.py:70-75) consumes only the first sentinel, and the
    junk row poisons the numeric casts to keep ACC/TCO string-typed
    (all-or-nothing)."""
    import os
    import tempfile

    _, RD, _ = _ref()
    from proteofav_spark.sources.dssp import parse_dssp_residues

    body = "\n".join([
        "==== Secondary Structure Definition ====",
        _DSSP_HDR,
        "    1    1 A M              0   0  127      0, 0.0   345,-0.1"
        "     0, 0.0     3,-0.1   0.000 360.0 360.0 360.0 162.0  -18.7"
        "   21.6  -55.4",
        "  #  RESIDUE AA STRUCTURE BP1 BP2  ACC",
        "    2    2 A R        +     0   0  117      1,-0.1    28,-0.4"
        "   343,-0.1     2,-0.3   0.455 360.0  81.5-136.8 -28.7  -17.0"
        "   22.3  -52.1",
    ]) + "\n"
    fd, path = tempfile.mkstemp(suffix=".dssp")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(body)
        ref = RD.parse_dssp_residues(path)
        ours = parse_dssp_residues(spark, path)
        assert len(ref) == 3
        _assert_frames_equal(ref, ours)
        out = {r["RES"]: r["ACC"] for r in ours.collect()}
        assert out["RESID"] == "ACC" and out["1"] == "127"
    finally:
        os.unlink(path)


# --- SIFTS XML fuzz differential (r13) -----------------------------------

_SIFTS_NS = "http://www.ebi.ac.uk/pdbe/docs/sifts/eFamily.xsd"
_SIFTS_SRC = ["PDB", "UniProt", "CATH", "SCOP", "NCBI", "InterPro"]
# accession pool with substring pairs ('1.10' ⊂ '1.10.800.10') to drive the
# reference's scalar-state SUBSTRING dedup
_SIFTS_ACC = ["2pah", "P00439", "1.10.800.10", "1.10", "42581", "9606"]

_SIFTS_XREF = st.fixed_dictionaries({
    "src": st.sampled_from(_SIFTS_SRC),
    "acc": st.sampled_from(_SIFTS_ACC),
    "rn": st.sampled_from(["118", "11", "1", "null"]),
    "rname": st.sampled_from(["VAL", "V", "A", "ALA"]),
    "chain": st.sampled_from(["A", "B", None]),
})
_SIFTS_DETAIL = st.fixed_dictionaries({
    "prop": st.sampled_from(
        ["codeSecondaryStructure", "nameSecondaryStructure", "Annotation"]
    ),
    "text": st.sampled_from(["T", "loop", "Not_Observed", ""]),
})
_SIFTS_RESIDUE = st.fixed_dictionaries({
    "resnum": st.integers(1, 30),
    "xrefs": st.lists(_SIFTS_XREF, max_size=4),
    "details": st.lists(_SIFTS_DETAIL, max_size=2),
})
_SIFTS_REGION = st.fixed_dictionaries({
    "start": st.integers(1, 20),
    "span": st.integers(0, 15),
    "src": st.sampled_from(["PDB", "UniProt", "CATH", "SCOP", "Pfam", "GO"]),
    "acc": st.sampled_from(_SIFTS_ACC),
})
_SIFTS_ENTITY = st.fixed_dictionaries({
    "etype": st.sampled_from(["protein", "protein", "protein", "DNA"]),
    "regions": st.lists(_SIFTS_REGION, max_size=3),
    "residues": st.lists(_SIFTS_RESIDUE, min_size=1, max_size=3),
})


def _sifts_doc(entities) -> str:
    ents = []
    for ei, e in enumerate(entities):
        regions = "".join(
            f'<mapRegion start="{r["start"]}" end="{r["start"] + r["span"]}">'
            f'<db dbSource="{r["src"]}" dbCoordSys="PDBresnum"'
            f' dbAccessionId="{r["acc"]}"/></mapRegion>'
            for r in e["regions"]
        )
        residues = []
        for res in e["residues"]:
            kids = []
            for x in res["xrefs"]:
                chain = f' dbChainId="{x["chain"]}"' if x["chain"] else ""
                kids.append(
                    f'<crossRefDb dbSource="{x["src"]}" dbCoordSys="PDBresnum"'
                    f' dbAccessionId="{x["acc"]}" dbResNum="{x["rn"]}"'
                    f' dbResName="{x["rname"]}"{chain}/>'
                )
            for d in res["details"]:
                kids.append(
                    f'<residueDetail dbSource="PDBe" property="{d["prop"]}">'
                    f'{d["text"]}</residueDetail>'
                )
            residues.append(
                f'<residue dbSource="PDBe" dbCoordSys="PDBe"'
                f' dbResNum="{res["resnum"]}" dbResName="VAL">'
                + "".join(kids) + "</residue>"
            )
        eid = "ABCD"[ei % 4]
        ents.append(
            f'<entity type="{e["etype"]}" entityId="{eid}">'
            f'<segment segId="x_{eid}_1" start="1" end="50">'
            f"<listMapRegion>{regions}</listMapRegion>"
            f'<listResidue>{"".join(residues)}</listResidue>'
            "</segment></entity>"
        )
    return (
        "<?xml version='1.0' encoding='UTF-8'?>"
        f'<entry xmlns="{_SIFTS_NS}" dbSource="PDBe" dbAccessionId="2pah">'
        + "".join(ents) + "</entry>"
    )


def _sifts_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, list):
        return ",".join(str(x) for x in v)
    try:
        return round(float(v), 4)
    except (TypeError, ValueError):
        return str(v)


@given(entities=st.lists(_SIFTS_ENTITY, min_size=1, max_size=2))
@settings(
    max_examples=_ex(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sifts_parse_fuzz_vs_reference(spark, entities):
    """parse_sifts_residues on RANDOMIZED SIFTS XML — substring-pair
    accessions (the reference's scalar-state dedup is `v in cell`
    SUBSTRING containment), repeated residueDetail properties (list
    growth then ','-join), empty detail text (None-overwrite TypeError
    branch), overlapping same-accession regions (LAST match wins, no
    break), non-protein entities, childless residues (all-NaN rows; a
    document of ONLY those is the reference's zero-column empty raise) —
    the reference run live vs our mapInPandas parser. Shared-column
    comparison (the wrapper's schema materializes the default-visible
    surface; same convention as the fixture differential)."""
    import os
    import tempfile
    import pandas as _pd
    import pandas.io.json as _pij

    _ref()
    if not hasattr(_pij, "json_normalize"):
        _pij.json_normalize = _pd.json_normalize
    _lxml_shim()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.sifts as RSI
    finally:
        sys.path.remove("/root/reference")

    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.sources.sifts import parse_sifts_residues

    doc = _sifts_doc(entities)
    fd, path = tempfile.mkstemp(suffix=".xml")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(doc)
        ref_err = ref = None
        try:
            ref = RSI.parse_sifts_residues(path, excluded_cols=())
        except ValueError as exc:
            ref_err = exc
        try:
            ours = parse_sifts_residues(
                spark, path, excluded_sources=()
            ).toPandas()
        except EmptyTableError:
            assert ref_err is not None, "ref produced rows, ours raised"
            return
        assert ref_err is None, "reference raised on empty, ours produced rows"
        shared = [c for c in ref.columns if c in ours.columns]
        want = sorted(
            (tuple(_sifts_cell(r[c]) for c in shared) for _, r in ref.iterrows()),
            key=repr,
        )
        got = sorted(
            (tuple(_sifts_cell(r[c]) for c in shared) for _, r in ours.iterrows()),
            key=repr,
        )
        assert len(want) == len(got), (len(want), len(got), shared)
        assert want == got, (
            shared,
            sorted(set(want) - set(got), key=repr)[:1],
            sorted(set(got) - set(want), key=repr)[:1],
        )
    finally:
        os.unlink(path)


def test_sifts_scalar_substring_dedup_pinned(spark):
    """Pinned regression (r13): while a residue's accumulated cell is a
    scalar string the reference dedups by SUBSTRING containment
    (sifts.py:296-310) — a CATH accession '1.10' arriving after
    '1.10.800.10' is silently dropped; a third non-contained value grows
    a list with exact membership from then on."""
    import os
    import tempfile
    import pandas as _pd
    import pandas.io.json as _pij

    _ref()
    if not hasattr(_pij, "json_normalize"):
        _pij.json_normalize = _pd.json_normalize
    _lxml_shim()
    sys.path.insert(0, "/root/reference")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import proteofav.sifts as RSI
    finally:
        sys.path.remove("/root/reference")
    from proteofav_spark.sources.sifts import parse_sifts_residues

    doc = _sifts_doc([{
        "etype": "protein",
        "regions": [],
        "residues": [{
            "resnum": 1,
            "xrefs": [
                {"src": "CATH", "acc": "1.10.800.10", "rn": "1",
                 "rname": "VAL", "chain": "A"},
                {"src": "CATH", "acc": "1.10", "rn": "1",
                 "rname": "VAL", "chain": "A"},
                {"src": "CATH", "acc": "42581", "rn": "1",
                 "rname": "VAL", "chain": "A"},
            ],
            "details": [],
        }],
    }])
    fd, path = tempfile.mkstemp(suffix=".xml")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(doc)
        ref = RSI.parse_sifts_residues(path, excluded_cols=())
        ours = parse_sifts_residues(spark, path, excluded_sources=()).toPandas()
        assert list(ref["CATH_dbAccessionId"]) == [["1.10.800.10", "42581"]]
        assert list(ours["CATH_dbAccessionId"]) == ["1.10.800.10,42581"]
    finally:
        os.unlink(path)


# --- Validation XML fuzz differential (r13) ------------------------------

_VAL_ATTR_POOLS = {
    "model": ["1", "2"],
    "chain": ["A", "B"],
    "resnum": ["118", "-5", "7"],
    "resname": ["VAL", "HOH", "DA"],
    "icode": [" ", "", "A", "?"],
    "altcode": [" ", "", "A", "?", "."],
    "rsr": ["0.12", "1.5", "bad"],
    "rsrz": ["-0.5", "2.1"],
    "rscc": ["0.95", "0.1"],
    "rama": ["Favored", "OUTLIER"],
    "rota": ["m-40", "OUTLIER"],
    "phi": ["-60.4", "175.0"],
    "psi": ["120.1", "-45.9"],
    "avgoccu": ["1.00", "0.50"],
    "owab": ["25.1", "90.7"],
    "NatomsEDS": ["7", "12", "x"],
    "seq": ["1", "118"],
    "said": ["1", "2"],
    "ent": ["1", "2"],
    "cis_peptide": ["yes"],
}
_VAL_KEYS = list(_VAL_ATTR_POOLS)

_VAL_ELEMENT = st.dictionaries(
    keys=st.sampled_from(_VAL_KEYS),
    values=st.integers(0, 3),
    min_size=0, max_size=12,
).map(
    lambda d: {
        k: _VAL_ATTR_POOLS[k][i % len(_VAL_ATTR_POOLS[k])]
        for k, i in d.items()
    }
)


@given(elements=st.lists(_VAL_ELEMENT, min_size=1, max_size=8))
@settings(
    max_examples=_ex(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_validation_parse_fuzz_vs_reference(spark, elements):
    """parse_validation_residues on RANDOMIZED ModelledSubgroup attribute
    sets — ragged attribute presence (the reference unions keys into a
    header set and None-fills), blank/'?' icode/altcode values,
    non-numeric cells poisoning the all-or-nothing casts — the reference
    run live vs our mapInPandas parser over the shared columns. Two
    documented normalizations: (a) the first element always carries
    icode+altcode (the reference's _fix helpers hard-index those columns
    and KeyError on files where no element has them — pandas≥2 bitrot the
    real corpus never triggers); (b) the reference's icode/altcode
    `str.replace('\\ |…')` regexes are no-ops under pandas≥2, so the ref
    cells are pre-normalized to the documented intent (''/' '→'?' resp.
    ''/' '/'?'→'.') exactly as the fixture differential does."""
    import os
    import tempfile

    RVA, _ = _ref_more()
    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.sources.validation import parse_validation_residues

    elements = [dict(e) for e in elements]
    elements[0].setdefault("icode", " ")
    elements[0].setdefault("altcode", " ")
    body = "".join(
        "<ModelledSubgroup "
        + " ".join(f'{k}="{v}"' for k, v in e.items())
        + "/>"
        for e in elements
    )
    doc = (
        "<?xml version='1.0' encoding='UTF-8'?>"
        '<wwPDB-validation-information><Entry pdbid="2pah"/>'
        + body + "</wwPDB-validation-information>"
    )
    fd, path = tempfile.mkstemp(suffix=".xml")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(doc)
        ref_err = ref = None
        try:
            ref = RVA.parse_validation_residues(path)
        except ValueError as exc:
            ref_err = exc
        try:
            ours = parse_validation_residues(spark, path)
        except EmptyTableError:
            assert ref_err is not None, "ref produced rows, ours raised"
            return
        assert ref_err is None, "reference raised on empty, ours produced rows"
        if "validation_icode" in ref.columns:
            ref["validation_icode"] = ref["validation_icode"].replace(
                {"": "?", " ": "?"}
            )
        if "validation_altcode" in ref.columns:
            ref["validation_altcode"] = ref["validation_altcode"].replace(
                {"": ".", " ": ".", "?": "."}
            )
        _assert_frames_equal_coerced(ref, ours, min_shared=1)
    finally:
        os.unlink(path)


# --- PDB ATOM-record fuzz differential (r13) -----------------------------

def _pdb_atom_line(r) -> str:
    """Render one fuzzed ATOM/HETATM record in the standard 80-col layout."""
    name = r["name"] if len(r["name"]) == 4 else f" {r['name']:<3s}"
    return (
        f"{r['group']:<6s}{r['serial']:>5d} {name:<4s}{r['alt']:1s}"
        f"{r['resname']:>3s} {r['chain']:1s}{r['resseq']:>4d}{r['icode']:1s}"
        f"   {r['x']:8.3f}{r['y']:8.3f}{r['z']:8.3f}{r['occ']:6.2f}"
        f"{r['b']:6.2f}          {r['element']:>2s}"
    )


_PDB_ROW = st.fixed_dictionaries({
    "kind": st.sampled_from(["atom"] * 6 + ["model", "ter", "remark", "junk"]),
    "group": st.sampled_from(["ATOM", "HETATM"]),
    "serial": st.integers(0, 99999),
    "name": st.sampled_from(["N", "CA", "OXT", "1HB2", "C1'", "FE"]),
    "alt": st.sampled_from([" ", "A", "B"]),
    "resname": st.sampled_from(["VAL", "HOH", "DA", "MSE"]),
    "chain": st.sampled_from(["A", "B", " "]),
    "resseq": st.integers(-99, 9999),
    "icode": st.sampled_from([" ", "A"]),
    "x": st.floats(-999, 999, allow_nan=False, width=32),
    "y": st.floats(-999, 999, allow_nan=False, width=32),
    "z": st.floats(-999, 999, allow_nan=False, width=32),
    "occ": st.floats(0, 1, allow_nan=False, width=32),
    "b": st.floats(0, 99, allow_nan=False, width=32),
    "element": st.sampled_from(["N", "C", "O", "FE", "H"]),
    "model": st.integers(1, 9),
})


@given(rows=st.lists(_PDB_ROW, min_size=1, max_size=10))
@settings(
    max_examples=_ex(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pdb_parse_fuzz_vs_reference(spark, rows):
    """parse_pdb_atoms on RANDOMIZED ATOM/HETATM records — negative and
    4-digit residue numbers, insertion codes, altlocs, blank chains,
    primed atom names, MODEL switches (single-digit: the reference's
    append-at-col-78 artifact is ledgered separately), TER/REMARK noise,
    and an 'ATOMIC' junk line (the reference's startswith('ATOM') prefix
    match picks it up as a data row) — the reference's read_fwf path run
    live vs our substring projection. Ref-side normalization: the
    intended ''→'?' ins-code / ''→'.' altloc fixes (regex no-ops under
    pandas≥2), same as the fixture differential."""
    import os
    import tempfile

    RS, _, _ = _ref()
    from proteofav_spark.core import EmptyTableError
    from proteofav_spark.sources.structures import parse_pdb_atoms

    lines = ["HEADER    FUZZ"]
    n_atoms = 0
    for r in rows:
        if r["kind"] == "model":
            lines.append(f"MODEL     {r['model']:>4d}")
        elif r["kind"] == "ter":
            lines.append("TER")
        elif r["kind"] == "remark":
            lines.append("REMARK 350 SOME TEXT")
        elif r["kind"] == "junk":
            # startswith('ATOM') prefix-matches this junk record on both
            # sides (reference structures.py:152-156)
            lines.append("ATOMIC FUZZ LINE" + " " * 60 + " X")
            n_atoms += 1
        else:
            lines.append(_pdb_atom_line(r))
            n_atoms += 1
    body = "\n".join(lines) + "\n"

    fd, path = tempfile.mkstemp(suffix=".pdb")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(body)
        ref_err = ref = None
        try:
            ref = RS.parse_pdb_atoms(path, excluded_cols=())
        except ValueError as exc:
            ref_err = exc
        try:
            ours = parse_pdb_atoms(spark, path)
        except EmptyTableError:
            assert ref_err is not None or n_atoms == 0, (
                "ref produced rows, ours raised"
            )
            return
        assert ref_err is None, "reference raised on empty, ours produced rows"
        ref = ref.copy()
        ref["pdbx_PDB_ins_code"] = ref["pdbx_PDB_ins_code"].replace({"": "?"})
        ref["label_alt_id"] = ref["label_alt_id"].replace({"": "."})
        _assert_frames_equal(ref, ours)
    finally:
        os.unlink(path)


def test_pdb_model_append_artifact_divergence():
    """DIVERGENCE pin (ledgered A13): the reference appends the running
    MODEL number at column 78 of each 78-clipped record and reads span
    (78,79) — so a multi-digit model id keeps only its FIRST digit
    ('12'→'1', colliding with model 1), and a record whose rstripped
    length is under 78 (no element column) hides the digit entirely
    (model '' for every atom). Our MODEL carry is a per-file
    last-over-window on the parsed marker, which keeps the full id in
    both cases — the CIF-correct reading."""
    import os
    import tempfile

    RS, _, _ = _ref()

    body = "\n".join([
        "MODEL       12",
        "ATOM      1  N   VAL A 118      -7.069  21.943  18.770  1.00 56.51"
        "           N",
        "ENDMDL",
        "MODEL       13",
        "ATOM      2  CA  VAL A 118      -7.077  21.688  20.244  1.00 59.09",
    ]) + "\n"
    fd, path = tempfile.mkstemp(suffix=".pdb")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(body)
        ref = RS.parse_pdb_atoms(path, excluded_cols=())
        # first digit only; elementless record loses the digit entirely
        assert list(ref["pdbx_PDB_model_num"]) == ["1", ""]
    finally:
        os.unlink(path)


def test_pdb_model_full_id_ours(spark):
    """Companion pin for A13: our parser keeps '12'/'13' verbatim for the
    same file the reference collapses to '1'/''."""
    import os
    import tempfile

    from proteofav_spark.sources.structures import parse_pdb_atoms

    body = "\n".join([
        "MODEL       12",
        "ATOM      1  N   VAL A 118      -7.069  21.943  18.770  1.00 56.51"
        "           N",
        "ENDMDL",
        "MODEL       13",
        "ATOM      2  CA  VAL A 118      -7.077  21.688  20.244  1.00 59.09",
    ]) + "\n"
    fd, path = tempfile.mkstemp(suffix=".pdb")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(body)
        out = parse_pdb_atoms(spark, path)
        got = sorted(
            (str(r["id"]), r["pdbx_PDB_model_num"])
            for r in out.select("id", "pdbx_PDB_model_num").collect()
        )
        assert got == [("1", "12"), ("2", "13")]
    finally:
        os.unlink(path)
