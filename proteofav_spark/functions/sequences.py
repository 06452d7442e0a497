"""Sequence-level functions over residue tables.

Parity targets:
- get_sequence        proteofav/structures.py:689-713 (3→1-letter concat)
- get_coordinates     proteofav/structures.py:716-733
- check_sequence      proteofav/utils.py:356-372
- _compare_sequences  proteofav/variants.py:411-427
- _count_mismatches   proteofav/variants.py:430-439
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from proteofav_spark.functions.derived import aa3to1_expr
from proteofav_spark.library import CANONICAL_AA1


def get_sequence(
    df: DataFrame, category: str = "auth", group_by_chain: bool = True
) -> DataFrame:
    """Per-chain 1-letter sequence string from the residue-ordered atom (or
    residue) table — one ordered ``collect_list`` per chain, ambiguous
    residues → 'X'."""
    order = "line_no" if "line_no" in df.columns else "id"
    keys = ["pdbx_PDB_model_num", f"{category}_asym_id"] if group_by_chain else []
    keyed = df.withColumn("_aa1", aa3to1_expr(f"{category}_comp_id"))
    agg = F.concat_ws(
        "",
        F.array_sort(F.collect_list(F.struct(F.col(order), F.col("_aa1")))).getField(
            "_aa1"
        ),
    ).alias("sequence")
    if keys:
        return keyed.groupBy(*keys).agg(agg)
    return keyed.agg(agg)


def get_coordinates_col() -> Column:
    """(x, y, z) as an array<double> column."""
    return F.array(
        F.col("Cartn_x").cast("double"),
        F.col("Cartn_y").cast("double"),
        F.col("Cartn_z").cast("double"),
    )


def check_sequence_expr(seq_col: str, gap_symbol: str = "-") -> Column:
    """Replace non-canonical residue letters with 'X' and remap gaps
    (parity: proteofav/utils.py:356-372)."""
    canon = "".join(sorted(CANONICAL_AA1)) + "X"
    seq = F.upper(F.col(seq_col))
    seq = F.regexp_replace(seq, r"[\-\.\*]", gap_symbol)
    return F.regexp_replace(seq, f"[^{canon}{gap_symbol}]", "X")


def count_mismatches_expr(seq_a: str | Column, seq_b: str | Column) -> Column:
    """Positional mismatch count between two equal-length sequences — a
    ``zip_with`` over the char arrays (the reference zips Python strings,
    proteofav/variants.py:430-439)."""
    a = F.col(seq_a) if isinstance(seq_a, str) else seq_a
    b = F.col(seq_b) if isinstance(seq_b, str) else seq_b
    pairs = F.zip_with(
        F.split(a, ""), F.split(b, ""),
        lambda x, y: F.when(x != y, 1).otherwise(0),
    )
    return F.aggregate(pairs, F.lit(0), lambda acc, x: acc + x)


def compare_sequences_expr(
    seq_a: str, seq_b: str, permissive: bool = True, n_mismatches: int = 0
) -> Column:
    """Boolean equality with tolerance (parity:
    proteofav/variants.py:411-427): permissive compares case-normalized,
    and up to ``n_mismatches`` positional differences are allowed."""
    a = F.upper(F.col(seq_a)) if permissive else F.col(seq_a)
    b = F.upper(F.col(seq_b)) if permissive else F.col(seq_b)
    if n_mismatches:
        return (F.length(a) == F.length(b)) & (
            count_mismatches_expr(a, b) <= n_mismatches
        )
    return a == b
