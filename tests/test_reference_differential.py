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
