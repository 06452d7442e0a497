"""The fixed merge tree: (mmcif ⟕ dssp ⟕ validation) ⟕ (sifts ⟕ annotation ⟕
variants) — lazy Catalyst plans with broadcast-friendly sides.

All join keys are cast to STRING on both sides (reference convention:
proteofav/mergers.py:179,280-281,311 — '118' joins '118', never int 118).
The per-protein side tables (DSSP/SIFTS/validation/annotation/variants) are
tiny relative to the atom table, so they get explicit ``broadcast`` hints;
at 100 TB the atom table partitioning (by structure id) is untouched and no
shuffle happens on any enrichment join.

Parity targets:
- mmcif_sifts_table_merger       proteofav/mergers.py:29-62
- mmcif_dssp_table_merger        proteofav/mergers.py:65-100 (data-dependent
  key choice via chain-set probes :82-84)
- mmcif_validation_table_merger  proteofav/mergers.py:103-138
- sifts_annotation_table_merger  proteofav/mergers.py:141-164
- sifts_variants_table_merger    proteofav/mergers.py:167-190
- table_merger                   proteofav/mergers.py:403-446
- Tables facade                  proteofav/mergers.py:576-632
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class TableMergerError(ValueError):
    pass


_META_COLS = ("line_no", "source_file")


def _prep_right(right: DataFrame) -> DataFrame:
    """Drop reader-metadata columns from the broadcast side so the joined
    table keeps exactly one (left) ordering column."""
    return right.drop(*_META_COLS)


def _str(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("string"))
    return df


def _left_join_on(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    broadcast: bool = True,
    null_safe: bool = True,
) -> DataFrame:
    """``null_safe=True`` (the default for every reference-parity merger)
    joins with ``<=>``: pandas.merge treats NaN/None join keys as EQUAL
    values — a NaN-key left row picks up every NaN-key right row — and a
    NULL-unsafe equi-join silently drops exactly those matches (found
    live by the r12 merger hypothesis differentials;
    tests/test_reference_differential.py pins all five mergers).
    ``EqualNullSafe`` is a supported hash-join key expression, so the
    plan shape (broadcast/SMJ) is unchanged. ``null_safe=False`` is for
    the lake tree, where the semantics are ours to define and NULL
    residue keys must NOT cross-match within an entry."""
    left = _str(left, *left_keys)
    right = _str(_prep_right(right), *right_keys)
    cond = None
    for lk, rk in zip(left_keys, right_keys):
        clause = (
            left[lk].eqNullSafe(right[rk])
            if null_safe
            else (left[lk] == right[rk])
        )
        cond = clause if cond is None else (cond & clause)
    # broadcast=False is the LAKE-scale path (lake_table_merger): the
    # residue-level sides grow with the lake (~atoms/10) and must
    # shuffle or ride bucketing — AQE still broadcasts any side that is
    # genuinely small at runtime, so dropping the hint never pessimizes
    # the single-structure case, it only stops forcing an OOM at scale
    return left.join(
        F.broadcast(right) if broadcast else right, on=cond, how="left"
    )


def mmcif_sifts_table_merger(
    mmcif_table: DataFrame,
    sifts_table: DataFrame,
    category: str = "auth",
    legacy_resnum_key: bool = False,
) -> DataFrame:
    """mmCIF ⟕ SIFTS on (residue-number, chain).

    Default key: ``{category}_seq_id_full`` (seq id + insertion code) vs
    ``PDB_dbResNum`` — the modern composite key that is correct whether or
    not insertion codes occur.

    ``legacy_resnum_key=True`` reproduces the legacy ``merge_tables``
    behavior (parity: proteofav/mergers.py:311-322): try the PLAIN
    residue-number key first, and only when the data carries insertion
    codes (the condition that made the reference's pandas merge raise and
    fall into its except-branch: ins-coded mmCIF rows or non-integer
    SIFTS resnums) fall back to the composite seq-id+ins-code key. The
    probe is two cheap filter-counts on the (broadcast-small) inputs.

    Orientation follows the reference's two branches EXACTLY (found by
    the r13 legacy sequence-check differential, 335 vs 329 rows on 2pah):
    the try-branch puts SIFTS on the LEFT (`sifts_table.merge(table,
    how='left')`, mergers.py:312-314 — unmatched SIFTS residues, e.g.
    unresolved in the structure, SURVIVE), while the ins-code
    except-branch puts mmCIF on the left (mergers.py:317-322). The
    modern default key stays mmCIF-left."""
    seq, asym, orig = (
        f"{category}_seq_id_full", f"{category}_asym_id", f"orig_{category}_asym_id"
    )
    if not (
        seq in mmcif_table.columns
        and asym in mmcif_table.columns
        and "PDB_dbResNum" in sifts_table.columns
        and "PDB_dbChainId" in sifts_table.columns
    ):
        raise TableMergerError(
            "Not possible to merge mmCIF and SIFTS table! "
            "Some of the necessary columns are missing..."
        )
    chain_key = orig if orig in mmcif_table.columns else asym
    left_res_key = seq
    if legacy_resnum_key:
        plain = f"{category}_seq_id"
        ins_coded_mmcif = (
            plain in mmcif_table.columns
            and "pdbx_PDB_ins_code" in mmcif_table.columns
            and mmcif_table.filter(
                ~F.coalesce(F.col("pdbx_PDB_ins_code"), F.lit("?")).isin("?", "")
            ).limit(1).count() > 0
        )
        ins_coded_sifts = (
            sifts_table.filter(
                ~F.col("PDB_dbResNum").cast("string").rlike(r"^-?[0-9]+$")
            ).limit(1).count() > 0
        )
        if not (ins_coded_mmcif or ins_coded_sifts) and plain in mmcif_table.columns:
            return _left_join_on(
                sifts_table, mmcif_table,
                ["PDB_dbResNum", "PDB_dbChainId"], [plain, chain_key],
            )
    return _left_join_on(
        mmcif_table, sifts_table,
        [left_res_key, chain_key], ["PDB_dbResNum", "PDB_dbChainId"],
    )


def mmcif_dssp_table_merger(
    mmcif_table: DataFrame, dssp_table: DataFrame, category: str = "auth"
) -> DataFrame:
    seq, asym, orig = (
        f"{category}_seq_id_full", f"{category}_asym_id", f"orig_{category}_asym_id"
    )
    if not (
        seq in mmcif_table.columns
        and asym in mmcif_table.columns
        and "RES_FULL" in dssp_table.columns
        and "CHAIN_FULL" in dssp_table.columns
    ):
        raise TableMergerError(
            "Not possible to merge mmCIF and DSSP table! "
            "Some of the necessary columns are missing..."
        )
    chain_key = asym
    if orig in mmcif_table.columns:
        # data-dependent key selection: use the original (pre-BioUnit) chain
        # id only when the two tables' chain-id sets differ — two cheap
        # collect_set probes before plan construction (mergers.py:82-84)
        mm_chains = {
            r[0] for r in mmcif_table.select(asym).distinct().collect()
        }
        dssp_chains = {
            r[0] for r in dssp_table.select("CHAIN_FULL").distinct().collect()
        }
        if mm_chains != dssp_chains:
            chain_key = orig
    return _left_join_on(
        mmcif_table, dssp_table, [seq, chain_key], ["RES_FULL", "CHAIN_FULL"]
    )


def mmcif_validation_table_merger(
    mmcif_table: DataFrame, validation_table: DataFrame, category: str = "auth"
) -> DataFrame:
    seq, asym, orig = (
        f"{category}_seq_id_full", f"{category}_asym_id", f"orig_{category}_asym_id"
    )
    if not (
        seq in mmcif_table.columns
        and asym in mmcif_table.columns
        and "validation_resnum_full" in validation_table.columns
        and "validation_chain" in validation_table.columns
    ):
        raise TableMergerError(
            "Not possible to merge mmCIF and Validation table! "
            "Some of the necessary columns are missing..."
        )
    chain_key = orig if orig in mmcif_table.columns else asym
    return _left_join_on(
        mmcif_table,
        validation_table,
        [seq, chain_key],
        ["validation_resnum_full", "validation_chain"],
    )


def sifts_annotation_table_merger(
    sifts_table: DataFrame, annotation_table: DataFrame
) -> DataFrame:
    if not (
        "UniProt_dbAccessionId" in sifts_table.columns
        and "UniProt_dbResNum" in sifts_table.columns
        and "accession" in annotation_table.columns
        and "site" in annotation_table.columns
    ):
        raise TableMergerError(
            "Not possible to merge SIFTS and Annotation table! "
            "Some of the necessary columns are missing..."
        )
    return _left_join_on(
        sifts_table,
        annotation_table,
        ["UniProt_dbAccessionId", "UniProt_dbResNum"],
        ["accession", "site"],
    )


def sifts_variants_table_merger(
    sifts_table: DataFrame, variants_table: DataFrame
) -> DataFrame:
    if not (
        "UniProt_dbAccessionId" in sifts_table.columns
        and "UniProt_dbResNum" in sifts_table.columns
        and "accession" in variants_table.columns
        and "begin" in variants_table.columns
    ):
        raise TableMergerError(
            "Not possible to merge SIFTS and Variants table! "
            "Some of the necessary columns are missing..."
        )
    # the ONE merger whose right key the reference astype(str)s
    # (mergers.py:179): NaN `begin` becomes the literal 'nan' STRING, so
    # a NULL left resnum no longer NaN-matches it (unlike every other
    # merger) while a literal 'nan' string on the left DOES — replicate
    # by coalescing the cast to 'nan' (r12 hypothesis differential)
    variants_table = variants_table.withColumn(
        "begin", F.coalesce(F.col("begin").cast("string"), F.lit("nan"))
    )
    return _left_join_on(
        sifts_table,
        variants_table,
        ["UniProt_dbAccessionId", "UniProt_dbResNum"],
        ["accession", "begin"],
    )


def table_merger(
    mmcif_table: DataFrame | None = None,
    dssp_table: DataFrame | None = None,
    sifts_table: DataFrame | None = None,
    validation_table: DataFrame | None = None,
    annotation_table: DataFrame | None = None,
    variants_table: DataFrame | None = None,
    legacy_resnum_key: bool = False,
) -> DataFrame:
    """Fixed merge tree (parity: proteofav/mergers.py:403-446). The largest
    table (atoms) stays on the left of every join; residue-level sides merge
    among themselves first, then one final left join — Catalyst broadcasts
    every right side. ``legacy_resnum_key`` selects the legacy plain-resnum
    SIFTS key with insertion-code fallback (see mmcif_sifts_table_merger).

    SCOPE: single structure per call, like the reference (whose tables
    are one parsed file each). The join keys carry no structure id and
    every right side is broadcast-hinted, so feeding MULTI-structure
    frames through this tree silently cross-matches same-numbered
    residues across entries and force-broadcasts lake-sized sides —
    use :func:`lake_table_merger` for that regime (review r9)."""
    available = [
        t
        for t in (
            mmcif_table, dssp_table, sifts_table,
            validation_table, annotation_table, variants_table,
        )
        if t is not None
    ]
    if len(available) < 2 and (mmcif_table is not None or sifts_table is not None):
        raise TableMergerError("At least two Tables are needed in order to merge...")

    table = None
    if mmcif_table is not None:
        if dssp_table is not None:
            mmcif_table = mmcif_dssp_table_merger(mmcif_table, dssp_table)
        if validation_table is not None:
            mmcif_table = mmcif_validation_table_merger(mmcif_table, validation_table)
        table = mmcif_table
    if sifts_table is not None:
        if annotation_table is not None:
            sifts_table = sifts_annotation_table_merger(sifts_table, annotation_table)
        if variants_table is not None:
            sifts_table = sifts_variants_table_merger(sifts_table, variants_table)
        table = sifts_table
    if mmcif_table is not None and sifts_table is not None:
        table = mmcif_sifts_table_merger(
            mmcif_table, sifts_table, legacy_resnum_key=legacy_resnum_key
        )
    return table


def lake_table_merger(
    mmcif_table: DataFrame,
    dssp_table: DataFrame | None = None,
    sifts_table: DataFrame | None = None,
    validation_table: DataFrame | None = None,
    annotation_table: DataFrame | None = None,
    variants_table: DataFrame | None = None,
    entry_col: str = "entry_id",
) -> DataFrame:
    """Multi-structure (lake-wide) merge tree — the 100 TB twin of
    :func:`table_merger`, which is single-structure by reference
    parity and carries two silent scale traps (review r9):

    1. **Structure scoping.** The per-structure mergers join on
       (residue-number, chain) alone, so a frame holding MANY
       structures cross-matches every same-numbered residue of every
       same-lettered chain across entries — silently wrong rows, at
       lake scale mostly wrong rows. Here every structure-level join
       key gains ``entry_col``, so residues only ever match within
       their own entry. (The UniProt-keyed annotation/variants joins
       need no scoping: accessions are globally unique.)
    2. **Forced broadcast.** The per-structure tree broadcast-hints
       every right side — correct when each side is one protein's
       residues, an executor OOM when the DSSP/SIFTS side is the whole
       lake's (~atoms/10). This tree passes ``broadcast=False``: AQE
       still broadcasts a genuinely small side at runtime, and
       bucketed lake tables (``..lake.write_bucketed_table`` on
       (entry, chain, resnum)) make these joins exchange-free.

    Contract: ``mmcif_table`` and every structure-level side
    (DSSP/SIFTS/validation) must carry ``entry_col`` — the bulk lake
    ingest attaches it (``..lake.parse_mmcif_atoms_many``), and every
    per-source reader output stages it in one line via
    ``withColumn("entry_id", ..lake.entry_id_col())`` (they all carry
    ``source_file``). Chain ids must
    be canonical (``auth_asym_id`` — BioUnit-suffix resolution is a
    per-structure staging concern, not re-probed lake-wide).
    Correctness pin: tests/test_mergers.py proves a two-entry merge
    equals the per-entry single-structure merges row-for-row while the
    naive tree over the same frames cross-matches."""
    for name, t in (
        ("mmcif", mmcif_table), ("dssp", dssp_table),
        ("sifts", sifts_table), ("validation", validation_table),
    ):
        if t is not None and entry_col not in t.columns:
            raise TableMergerError(
                f"lake_table_merger: {name} table lacks the structure "
                f"scope column {entry_col!r} — stage it through the "
                "lake ingest (or withColumn a literal per structure)"
            )
    def scoped(left: DataFrame, right: DataFrame,
               lkeys: list[str], rkeys: list[str]) -> DataFrame:
        # the right side carries its own entry column — join through a
        # rename so the output keeps exactly ONE (left) entry column
        tag = "__right_entry"
        right = right.withColumnRenamed(entry_col, tag)
        # null_safe=False is DELIBERATE here (DIVERGENCES.md): the lake
        # tree has no reference twin, and pandas-style NULL-key matching
        # would cross-match every unmapped residue of an entry against
        # every other — a fan-out hazard, not parity
        return _left_join_on(
            left, right, [entry_col, *lkeys], [tag, *rkeys],
            broadcast=False, null_safe=False,
        ).drop(tag)

    table = mmcif_table
    if dssp_table is not None:
        table = scoped(
            table, dssp_table,
            ["auth_seq_id_full", "auth_asym_id"],
            ["RES_FULL", "CHAIN_FULL"],
        )
    if validation_table is not None:
        table = scoped(
            table, validation_table,
            ["auth_seq_id_full", "auth_asym_id"],
            ["validation_resnum_full", "validation_chain"],
        )
    if sifts_table is not None:
        if annotation_table is not None:
            sifts_table = _left_join_on(
                sifts_table, annotation_table,
                ["UniProt_dbAccessionId", "UniProt_dbResNum"],
                ["accession", "site"],
                broadcast=False,
            )
        if variants_table is not None:
            sifts_table = _left_join_on(
                sifts_table, variants_table,
                ["UniProt_dbAccessionId", "UniProt_dbResNum"],
                ["accession", "begin"],
                broadcast=False,
            )
        table = scoped(
            table, sifts_table,
            ["auth_seq_id_full", "auth_asym_id"],
            ["PDB_dbResNum", "PDB_dbChainId"],
        )
    return table


class Tables:
    """Composite facade over the six source tables (parity: _Tables,
    proteofav/mergers.py:576-632). ``merge`` composes the lazy join tree;
    callers supply already-selected DataFrames (the network download stage of
    the reference is a lake-staging concern here)."""

    def __init__(self) -> None:
        self.mmcif = None
        self.dssp = None
        self.sifts = None
        self.validation = None
        self.annotation = None
        self.variants = None
        self.table = None

    def merge(self, mmcif=None, dssp=None, sifts=None, validation=None,
              annotation=None, variants=None) -> DataFrame:
        if mmcif is not None:
            self.mmcif = mmcif
        if dssp is not None:
            self.dssp = dssp
        if sifts is not None:
            self.sifts = sifts
        if validation is not None:
            self.validation = validation
        if annotation is not None:
            self.annotation = annotation
        if variants is not None:
            self.variants = variants
        self.table = table_merger(
            self.mmcif, self.dssp, self.sifts,
            self.validation, self.annotation, self.variants,
        )
        return self.table
