"""Reference edge-case corpus (SURVEY §5): one named test per tricky PDB
entry, mirroring tests/test_mergers.py:192-256 in the reference — each
asserts the end-to-end merge is non-empty (the reference's own bar), plus
entry-specific invariants where the reference pins them.
"""

import pytest
from pyspark.sql import functions as F

from proteofav_spark.plans.generator import SourcePaths, TablesGenerator


def _merge(spark, refdata, pdb, chains, dssp=None, sifts=True, **kw):
    paths = SourcePaths(
        mmcif=f"{refdata}/mmcif/{pdb}.cif",
        dssp=f"{refdata}/dssp/{dssp or pdb.split('_')[0]}.dssp",
        sifts=f"{refdata}/sifts/{pdb.split('_')[0]}.xml" if sifts else None,
    )
    return TablesGenerator(spark).generate(
        paths, chains=chains, merge_tables=True, **kw
    )


def test_merge_3mn5_insertion_codes(spark, refdata):
    """Insertion-code entry (reference tests/test_mergers.py:199-220): the
    full 3-source merge is non-empty and every row carries a well-formed
    auth_seq_id_full join key (icode-free rows equal the bare seq id)."""
    merged = _merge(spark, refdata, "3mn5", ("A",))
    n = merged.count()
    assert n > 0
    assert merged.filter(
        F.col("auth_seq_id_full") == F.col("auth_seq_id").cast("string")
    ).count() == n


def test_merge_3fqd_no_pdbe_label_seq_id(spark, refdata):
    """3fqd's updated mmCIF lacks pdbe_label_seq_id
    (reference tests/test_mergers.py:222-225)."""
    merged = _merge(spark, refdata, "3fqd_updated", ("A",), dssp="3fqd")
    assert merged.count() > 0


def test_merge_3ehk_lowercase_cys_dssp(spark, refdata):
    """Lowercase DSSP letters mark SS-bridge cysteines
    (reference tests/test_mergers.py:227-230): they must merge and map
    back to CYS positions."""
    merged = _merge(spark, refdata, "3ehk_updated", ("D",), dssp="3ehk",
                    sifts=False)
    assert merged.count() > 0
    aa = F.col("AA")
    lower = merged.filter(
        aa.isNotNull() & (aa == F.lower(aa)) & (aa != F.upper(aa))
    )
    assert {r["label_comp_id"] for r in lower.select("label_comp_id").collect()} \
        <= {"CYS"}


def test_merge_4abo_dssp_missing_first_residue(spark, refdata):
    """DSSP table starts after the first mmCIF residue
    (reference tests/test_mergers.py:243-246): left join keeps the atom
    rows, the missing residue's DSSP columns stay null."""
    merged = _merge(spark, refdata, "4abo_updated", ("A",), dssp="4abo",
                    sifts=False)
    assert merged.count() > 0
    assert merged.filter(F.col("AA").isNull()).count() > 0


def test_merge_4why_dssp_object_index(spark, refdata):
    """4why's DSSP carries non-numeric residue numbers
    (reference tests/test_mergers.py:248-251)."""
    merged = _merge(spark, refdata, "4why_updated", ("K",), dssp="4why")
    assert merged.count() > 0


def test_merge_2pm7_missing_residues(spark, refdata):
    """Missing residues in the middle of the chain
    (reference tests/test_mergers.py:253-256)."""
    merged = _merge(spark, refdata, "2pm7_updated", ("D",), dssp="2pm7")
    assert merged.count() > 0


def test_4v9d_dssp_excessive_chains_parse(spark, refdata):
    """>1-char BioUnit chains, 4v9d (reference tests/test_mergers.py:233-241;
    its suffix expectation is the reference's own expectedFailure at
    tests/test_dssp.py:95-114). Reference semantics: the counter suffix
    fires only when the SAME chain letter flanks a ``!*`` break — 4v9d's
    breaks all sit between different letters, so CHAIN_FULL == CHAIN there,
    while 2pah_bio's repeated chains do get suffixed."""
    from proteofav_spark.sources.dssp import (
        add_dssp_full_chain, parse_dssp_residues,
    )

    d = add_dssp_full_chain(
        parse_dssp_residues(spark, f"{refdata}/dssp/4v9d.dssp")
    )
    assert d.count() > 0
    assert d.filter(F.col("CHAIN_FULL") != F.col("CHAIN")).count() == 0

    bio = add_dssp_full_chain(
        parse_dssp_residues(spark, f"{refdata}/dssp/2pah_bio.dssp")
    )
    assert bio.filter(F.length("CHAIN_FULL") > 1).count() > 0
    # suffixing never rewrites the base chain id
    assert bio.filter(
        (F.length("CHAIN_FULL") > 1)
        & (F.substring("CHAIN_FULL", 1, 1) != F.col("CHAIN"))
    ).count() == 0
