"""wwPDB validation-report XML reader.

One row per ``ModelledSubgroup`` element, all attributes prefixed
``validation_``. Same distributed shape as the SIFTS reader: wholetext scan →
Arrow-batched ``mapInPandas`` ElementTree parse, one task per file.

Parity targets:
- parse_validation_residues  proteofav/validation.py:21-73
- _add_validation_res_full   proteofav/validation.py:104-117
- filter_validation          proteofav/validation.py:142-175
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from proteofav_spark.core import (
    EmptyTableError,
    constrain_column_types,
    exclude_columns,
    row_selector,
)
from proteofav_spark.functions.derived import add_validation_res_full
from proteofav_spark.library import VALIDATION_TYPES

# canonical attribute set (observed ModelledSubgroup attrs; runtime extras in
# the reference become columns too — here the union schema is fixed and
# unknown attributes are dropped, documented deviation for a stable StructType)
_ATTRS = [
    "model", "chain", "resnum", "resname", "icode", "altcode", "said", "seq",
    "ent", "rsr", "rsrz", "rscc", "rama", "rota", "phi", "psi",
    "avgoccu", "owab", "NatomsEDS", "num-H-reduce", "flippable-sidechain",
    "ligand_geometry_outlier", "ligand_density_outlier", "mogul_angles_rmsz",
    "mogul_bonds_rmsz", "ligRSRnbrMean", "ligRSRnbrStdev", "ligRSRnumnbrs",
    "cis_peptide",
]


def validation_schema() -> T.StructType:
    fields = [
        T.StructField(f"validation_{a.replace('-', '_')}", T.StringType())
        for a in _ATTRS
    ]
    fields.append(T.StructField("line_no", T.LongType()))
    fields.append(T.StructField("source_file", T.StringType()))
    return T.StructType(fields)


def parse_validation_residues(
    spark: SparkSession,
    path: str,
    excluded_cols: tuple[str, ...] | None = None,
    global_parameters: bool = False,
    fix_ins_code: bool = True,
    fix_label_alt_id: bool = True,
) -> DataFrame:
    """Scan validation XML(s) → one row per ModelledSubgroup.

    ``fix_ins_code``/``fix_label_alt_id`` (default True, reference
    parity — proteofav/validation.py:21,57-61,75-100): normalize the
    icode to mmCIF '?' (missing/blank) and the altcode to mmCIF '.'
    (missing/blank/'?'), so downstream merges comparing against
    mmCIF-style codes match (review r8: NULLs matched nothing)."""
    schema = validation_schema()
    names = schema.fieldNames()

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for xml_text, fname in zip(pdf["value"], pdf["source_file"]):
                root = ET.fromstring(xml_text)
                i = 0
                # direct children only: the reference's relative
                # iterfind('ModelledSubgroup') does not recurse
                # (validation.py:43)
                for el in root:
                    if el.tag != "ModelledSubgroup":
                        continue
                    rec = {
                        f"validation_{k.replace('-', '_')}": v
                        for k, v in el.attrib.items()
                        if k in _ATTRS
                    }
                    rec["line_no"] = i
                    rec["source_file"] = fname
                    i += 1
                    rows.append(rec)
            frame = pd.DataFrame(rows)
            for c in names:
                if c not in frame.columns:
                    frame[c] = None
            yield frame[names]

    files = spark.read.text(path, wholetext=True).withColumn(
        "source_file", F.input_file_name()
    )
    table = files.mapInPandas(parse_batch, schema=schema)
    table = exclude_columns(table, excluded_cols)
    if fix_ins_code and "validation_icode" in table.columns:
        ic = F.col("validation_icode")
        table = table.withColumn(
            "validation_icode",
            F.when(ic.isNull() | (F.trim(ic) == ""), "?").otherwise(ic),
        )
    if fix_label_alt_id and "validation_altcode" in table.columns:
        ac = F.col("validation_altcode")
        table = table.withColumn(
            "validation_altcode",
            F.when(
                ac.isNull() | (F.trim(ac) == "") | (ac == "?"), "."
            ).otherwise(ac),
        )
    table = constrain_column_types(table, VALIDATION_TYPES)
    if table.isEmpty():
        # reference parity (proteofav/validation.py:69-71): an XML with
        # no ModelledSubgroup elements raises instead of silently
        # feeding empty joins downstream (review r8)
        raise EmptyTableError(
            f"Validation file {path} resulted in an empty table"
        )
    return table


def filter_validation(
    table: DataFrame,
    excluded_cols: tuple[str, ...] | None = None,
    chains: tuple[str, ...] | None = None,
    res: tuple[str, ...] | None = None,
    add_res_full: bool = True,
    check_empty: bool = True,
) -> DataFrame:
    """Parity: filter_validation proteofav/validation.py:142-175."""
    table = exclude_columns(table, excluded_cols)
    if add_res_full:
        table = add_validation_res_full(table)
    if chains is not None:
        table = row_selector(table, "validation_chain", chains, check_empty=False)
    if res is not None:
        table = row_selector(table, "validation_resnum", res, check_empty=False)
    if check_empty and table.isEmpty():
        raise EmptyTableError("validation filters produced an empty table")
    return table


def select_validation(spark: SparkSession, path: str, **filter_kwargs) -> DataFrame:
    """read → parse → filter (parity: select_validation
    proteofav/validation.py:120-139)."""
    return filter_validation(parse_validation_residues(spark, path), **filter_kwargs)
