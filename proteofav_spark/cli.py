"""Command-line entry point (parity: proteofav/main.py:15-65).

Usage (local files staged in the cache dirs / passed explicitly):

    python -m proteofav_spark.cli --mmcif tests/2pah.cif --dssp tests/2pah.dssp \
        --sifts tests/2pah.xml --chain A --atom CA OUTPUT.csv --format csv
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="proteofav_spark",
        description="Merge protein structure/annotation tables into one "
        "residue/atom-level annotated table (Spark-backed).",
    )
    p.add_argument("output", help="output path (directory for csv/json)")
    # identifier-driven mode (parity: proteofav/main.py --pdb/--uniprot):
    # resolves + stages sources via the facade downloaders, then merges
    p.add_argument("--pdb", help="PDB identifier (stages via cache/download)")
    p.add_argument("--uniprot", help="UniProt accession (best-structure resolution)")
    p.add_argument("--add-dssp", action="store_true", help="merge DSSP")
    p.add_argument("--add-validation", action="store_true", help="merge validation")
    p.add_argument("--add-annotations", action="store_true", help="merge annotation")
    p.add_argument("--add-variants", action="store_true", help="merge variants")
    # path-driven mode (pre-staged local files)
    p.add_argument("--mmcif", help="mmCIF/PDB file path")
    p.add_argument("--dssp", help="DSSP file path")
    p.add_argument("--sifts", help="SIFTS XML file path")
    p.add_argument("--validation", help="validation XML file path")
    p.add_argument("--annotation", help="UniProt GFF file path")
    p.add_argument("--variants", help="UniProt variants JSON file path")
    p.add_argument("--chain", action="append", help="chain id filter")
    p.add_argument("--res", action="append", help="residue id filter")
    p.add_argument("--atom", action="append", help="atom id filter (e.g. CA)")
    p.add_argument("--lines", action="append", choices=["ATOM", "HETATM"])
    p.add_argument(
        "--format", default="csv", choices=["csv", "json", "tab", "parquet"]
    )
    return p


def _stringify_nonatomic(table):
    """Arrays/structs/maps serialize poorly to csv — cast them to string."""
    from pyspark.sql import functions as F, types as T

    for f in table.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType)):
            table = table.withColumn(f.name, F.col(f.name).cast("string"))
    return table


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from proteofav_spark.operators.structures import select_structures
    from proteofav_spark.plans.mergers import table_merger
    from proteofav_spark.session import get_spark
    from proteofav_spark.sinks.writers import write_table

    spark = get_spark("proteofav_spark_cli")
    chains = tuple(args.chain) if args.chain else None

    if args.pdb or args.uniprot:
        from proteofav_spark.plans.generator import merge_tables

        table = merge_tables(
            spark,
            uniprot_id=args.uniprot,
            pdb_id=args.pdb,
            chains=chains,
            res=tuple(args.res) if args.res else None,
            atoms=tuple(args.atom) if args.atom else None,
            lines=tuple(args.lines) if args.lines else None,
            sifts=True,
            dssp=args.add_dssp,
            validation=args.add_validation,
            annotation=args.add_annotations,
            variants=args.add_variants,
        )
        write_table(_stringify_nonatomic(table), args.output, args.format)
        print(f"wrote {args.output} ({args.format})")
        return 0

    mmcif = dssp = sifts = validation = annotation = variants = None
    if args.mmcif:
        mmcif = select_structures(
            spark, args.mmcif,
            models="first", chains=chains,
            res=tuple(args.res) if args.res else None,
            atoms=tuple(args.atom) if args.atom else None,
            lines=tuple(args.lines) if args.lines else None,
        )
    if args.dssp:
        from proteofav_spark.sources.dssp import select_dssp

        dssp = select_dssp(spark, args.dssp, chains=chains)
    if args.sifts:
        from proteofav_spark.sources.sifts import select_sifts

        sifts = select_sifts(spark, args.sifts, chain_auth=chains)
    if args.validation:
        from proteofav_spark.sources.validation import select_validation

        validation = select_validation(spark, args.validation, chains=chains)
    if args.annotation:
        from proteofav_spark.sources.annotation import select_annotation

        annotation = select_annotation(spark, args.annotation, annotation_agg=True)
    if args.variants:
        from proteofav_spark.sources.variants import flatten_uniprot_variants

        raw = spark.read.option("multiLine", True).json(args.variants)
        variants = flatten_uniprot_variants(raw)

    table = table_merger(mmcif, dssp, sifts, validation, annotation, variants)
    if table is None:
        print("nothing to merge: provide at least --mmcif or --sifts", file=sys.stderr)
        return 2
    write_table(_stringify_nonatomic(table), args.output, args.format)
    print(f"wrote {args.output} ({args.format})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
