"""table_generator / Tables.generate: produce the six source tables from
staged files and optionally merge them, with sequence-consistency checks.

Parity targets:
- table_generator   proteofav/mergers.py:449-573 (the network fetch stage of
  the reference becomes lake staging — callers point at local files; see
  facade.GenericSource.download for the staging step)
- Tables.generate   proteofav/mergers.py:606-629
- sequence checks   proteofav/mergers.py:286-307, :324-339 — re-expressed
  as mismatch-count probes over the joined table (one filter+count each).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from proteofav_spark.functions.derived import aa3to1_expr
from proteofav_spark.plans.mergers import table_merger


class SequenceCheckError(ValueError):
    pass


@dataclass
class SourcePaths:
    """Local staged file paths for one entry (the post-download state)."""

    mmcif: str | None = None
    dssp: str | None = None
    sifts: str | None = None
    validation: str | None = None
    annotation: str | None = None
    variants: str | None = None


def table_generator(
    spark: SparkSession,
    paths: SourcePaths,
    chains: tuple[str, ...] | None = None,
    res: tuple[str, ...] | None = None,
    sites: tuple[str, ...] | None = None,
    atoms: tuple[str, ...] | None = None,
    lines: tuple[str, ...] | None = None,
    residue_agg: bool = False,
) -> tuple:
    """Select all available source tables with consistent filters.
    Returns the 6-tuple (mmcif, dssp, sifts, validation, annotation,
    variants) with None for absent sources."""
    mmcif = dssp = sifts = validation = annotation = variants = None
    if paths.mmcif:
        from proteofav_spark.operators.structures import select_structures

        mmcif = select_structures(
            spark, paths.mmcif,
            models="first", chains=chains, res=res, atoms=atoms, lines=lines,
            residue_agg=residue_agg,
        )
    if paths.dssp:
        from proteofav_spark.sources.dssp import select_dssp

        dssp = select_dssp(spark, paths.dssp, chains=chains)
    if paths.sifts:
        from proteofav_spark.sources.sifts import select_sifts

        sifts = select_sifts(spark, paths.sifts, chain_auth=chains, res=res)
    if paths.validation:
        from proteofav_spark.sources.validation import select_validation

        validation = select_validation(spark, paths.validation, chains=chains)
    if paths.annotation:
        from proteofav_spark.sources.annotation import select_annotation

        annotation = select_annotation(
            spark, paths.annotation, annotation_agg=True
        )
    if paths.variants:
        from proteofav_spark.sources.variants import flatten_uniprot_variants

        raw = spark.read.option("multiLine", True).json(paths.variants)
        variants = flatten_uniprot_variants(raw)
    return mmcif, dssp, sifts, validation, annotation, variants


def check_sequence_consistency(
    merged: DataFrame,
    pair: str = "dssp",
    mode: str = "warn",
    label: str = "",
) -> int:
    """Compare the residue letters contributed by two sources in the merged
    table; returns the mismatch count and raises/warns per ``mode``.

    dssp pair:  label_comp_id (3-letter → 1) vs AA (lowercase Cys → 'C')
    sifts pair: auth_comp_id (→1) vs PDB_dbResName (→1)
    Null / 'X' positions are ignored, like the reference masks.
    """
    if pair == "dssp":
        left = aa3to1_expr("label_comp_id")
        aa = F.col("AA")
        right = F.when(
            (aa == F.lower(aa)) & (aa != F.upper(aa)), F.lit("C")
        ).otherwise(aa)
        mask = F.col("label_comp_id").isNotNull() & aa.isNotNull()
    elif pair == "sifts":
        left = aa3to1_expr("auth_comp_id")
        right = aa3to1_expr("PDB_dbResName")
        mask = (
            F.col("auth_comp_id").isNotNull()
            & F.col("PDB_dbResName").isNotNull()
        )
    else:
        raise ValueError(f"unknown sequence-check pair: {pair}")
    # 'X' on EITHER side is unknown/ambiguous (the full scop_3to1 map still
    # emits 'X' for unlisted components and chromophore expansions), so such
    # positions are masked like the reference masks 'X' — otherwise an
    # unmapped component would spuriously abort the merge
    mask = mask & (left != "X") & (right != "X")
    n = merged.filter(mask & (left != right)).count()
    if n:
        message = f"{label} Cif and {pair.upper()} files have different sequences."
        if mode == "raise":
            raise SequenceCheckError(message)
        import logging

        logging.getLogger(__name__).warning(message)
    return n


def variants_for_accessions(
    spark: SparkSession, accessions: list[str], overwrite: bool = False,
    ensembl: bool = False, uniprot: bool = True, synonymous: bool = True,
    fetch=None,
) -> DataFrame | None:
    """Stage + flatten UniProt variants for EVERY accession and union them
    (parity: the per-accession loop of legacy merge_tables,
    proteofav/mergers.py:349-382). The loop is driver-side staging over a
    tiny accession list (one REST payload per protein); the resulting
    frame is one relational table, so the downstream join needs no
    per-accession handling.

    ``ensembl=True`` runs the composed select_variants path per
    accession — UniProt flatten + Ensembl germline+somatic flatten/union
    — and outer-merges the two sides via uniprot_vars_ensembl_vars_merger
    exactly as the reference loop does (proteofav/mergers.py:349-372;
    DIVERGENCES A9: the reference forgets ``id_source`` there and its
    own path crashes — we pass 'uniprot', the loop's accession kind)."""
    from proteofav_spark import facade
    from proteofav_spark.sources.variants import (
        flatten_uniprot_variants,
        select_variants,
        uniprot_vars_ensembl_vars_merger,
    )

    out: DataFrame | None = None
    for acc in accessions:
        if ensembl:
            uni, ens = select_variants(
                spark, acc, id_source="uniprot", synonymous=synonymous,
                uniprot_vars=uniprot, fetch=fetch, overwrite=overwrite,
            )
            if uni is not None and ens is not None:
                flat = uniprot_vars_ensembl_vars_merger(uni, ens)
            elif uni is not None:
                flat = uni
            elif ens is not None:
                flat = ens
            else:
                continue
        else:
            path = facade.Variants.download(acc, overwrite=overwrite)
            raw = spark.read.option("multiLine", True).json(path)
            flat = flatten_uniprot_variants(raw)
        out = flat if out is None else out.unionByName(
            flat, allowMissingColumns=True
        )
    return out


def annotations_for_accessions(
    spark: SparkSession, accessions: list[str], overwrite: bool = False
) -> DataFrame | None:
    """Stage + parse UniProt GFF annotation for every accession and union
    (parity: proteofav/mergers.py:349-382, annotation branch)."""
    from proteofav_spark import facade
    from proteofav_spark.sources.annotation import select_annotation

    out: DataFrame | None = None
    for acc in accessions:
        path = facade.Annotation.download(acc, overwrite=overwrite)
        ann = select_annotation(spark, path, annotation_agg=True)
        out = ann if out is None else out.unionByName(
            ann, allowMissingColumns=True
        )
    return out


def sifts_accessions(sifts_table: DataFrame) -> list[str]:
    """Distinct UniProt accessions present in a SIFTS residue table — the
    driver-side probe the legacy per-accession loop iterates (tiny: one
    row per protein chain)."""
    if "UniProt_dbAccessionId" not in sifts_table.columns:
        return []
    return sorted(
        r[0]
        for r in sifts_table.select("UniProt_dbAccessionId").distinct().collect()
        if r[0] is not None
    )


def merge_tables(
    spark: SparkSession,
    uniprot_id: str | None = None,
    pdb_id: str | None = None,
    chains: tuple[str, ...] | None = None,
    res: tuple[str, ...] | None = None,
    atoms: tuple[str, ...] | None = None,
    lines: tuple[str, ...] | None = None,
    dssp: bool = False,
    sifts: bool = True,
    validation: bool = False,
    annotation: bool = False,
    variants: bool = False,
    ensembl_variants: bool = False,
    residue_agg: bool = False,
    overwrite: bool = False,
    fetch=None,
    legacy_resnum_key: bool = True,
):
    """Legacy orchestrated merge: resolve a bare UniProt accession to its
    top-ranked PDB structure via the PDBe best-structures API, stage every
    requested source through the facade downloaders, and return the merged
    table (parity: proteofav/mergers.py:449-573 merge_tables — the
    'uses the first structure' auto-resolution at :481-491).

    ``fetch`` overrides the HTTP fetcher (tests inject canned JSON);
    staged files land in the per-source ``defaults.db_*`` directories,
    which tests point at local fixtures via file:// addresses.
    ``legacy_resnum_key`` (default True, matching the legacy function
    this reproduces) selects the plain-resnum SIFTS key with the
    insertion-code fallback probe — see mmcif_sifts_table_merger."""
    from proteofav_spark import facade
    from proteofav_spark.fetchers import resolve_best_structure

    if not uniprot_id and not pdb_id:
        raise ValueError("Either a UniProt or PDB accession is needed...")
    if uniprot_id and not pdb_id:
        kw = {"fetch": fetch} if fetch is not None else {}
        pdb_id, best_chain = resolve_best_structure(uniprot_id, **kw)
        if chains is None:
            chains = (best_chain,)

    paths = SourcePaths(mmcif=facade.mmCIF.download(pdb_id, overwrite=overwrite))
    if sifts:
        paths.sifts = facade.SIFTS.download(pdb_id, overwrite=overwrite)
    if dssp:
        paths.dssp = facade.DSSP.download(pdb_id, overwrite=overwrite)
    if validation:
        paths.validation = facade.Validation.download(pdb_id, overwrite=overwrite)
    tables = table_generator(
        spark, paths,
        chains=chains, res=res, atoms=atoms, lines=lines,
        residue_agg=residue_agg,
    )
    mmcif_t, dssp_t, sifts_t, validation_t, annotation_t, variants_t = tables
    if variants or ensembl_variants or annotation:
        # per-accession staging loop: EVERY UniProt accession the SIFTS
        # mapping names contributes its variants/annotation (parity:
        # proteofav/mergers.py:349-382), falling back to the requested id
        accs = sifts_accessions(sifts_t) if sifts_t is not None else []
        if not accs and uniprot_id:
            accs = [uniprot_id]
        if (variants or ensembl_variants) and accs:
            # ensembl_variants routes through the composed select_variants
            # per accession (reference add_ensembl_variants,
            # mergers.py:349-372); UniProt-only keeps the facade staging
            variants_t = variants_for_accessions(
                spark, accs, overwrite=overwrite,
                ensembl=ensembl_variants, uniprot=variants, fetch=fetch,
            )
        if annotation and accs:
            annotation_t = annotations_for_accessions(
                spark, accs, overwrite=overwrite
            )
    return table_merger(
        mmcif_t, dssp_t, sifts_t, validation_t, annotation_t, variants_t,
        legacy_resnum_key=legacy_resnum_key,
    )


class TablesGenerator:
    """generate() + merge() in one facade (parity: Tables
    proteofav/mergers.py:576-632)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.tables: tuple = (None,) * 6
        self.table: DataFrame | None = None

    def merge(
        self,
        mmcif: DataFrame | None = None,
        dssp: DataFrame | None = None,
        sifts: DataFrame | None = None,
        validation: DataFrame | None = None,
        annotation: DataFrame | None = None,
        variants: DataFrame | None = None,
    ) -> DataFrame | None:
        """Merge the provided tables AND remember them: each call updates
        only the sources it names, keeping every previously-stored one,
        then re-runs the fixed merge tree over the accumulated set —
        ``merge(mmcif=m, dssp=d)`` followed by ``merge(sifts=s)`` merges
        all three (parity: _Tables.merge, proteofav/mergers.py:586-604)."""
        stored = list(self.tables)
        for i, t in enumerate(
            (mmcif, dssp, sifts, validation, annotation, variants)
        ):
            if t is not None:
                stored[i] = t
        self.tables = tuple(stored)
        self.table = table_merger(*self.tables)
        return self.table

    def generate(
        self,
        paths: SourcePaths,
        merge_tables: bool = False,
        sequence_check: str = "ignore",
        **kwargs,
    ):
        if sequence_check not in ("raise", "warn", "ignore"):
            raise ValueError(
                f"Sequence check method '{sequence_check}' not implemented."
            )
        self.tables = table_generator(self.spark, paths, **kwargs)
        if not merge_tables:
            return self.tables
        mmcif, dssp, sifts, validation, annotation, variants = self.tables
        self.table = table_merger(
            mmcif, dssp, sifts, validation, annotation, variants
        )
        # the reference only sequence-checks single-atom (e.g. CA-only)
        # tables — per-atom row multiplicity would inflate mismatch counts
        # (parity: proteofav/mergers.py:286 'not supported for multiple
        # atoms')
        if sequence_check in ("raise", "warn") and kwargs.get("atoms"):
            if dssp is not None and mmcif is not None:
                check_sequence_consistency(self.table, "dssp", sequence_check)
            if sifts is not None and mmcif is not None:
                check_sequence_consistency(self.table, "sifts", sequence_check)
        return self.table
