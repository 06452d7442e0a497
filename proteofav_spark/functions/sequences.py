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


def check_sequence_expr(
    seq_col: str,
    gap_symbol: str = "-",
    new_gap_symbol: str = "-",
    ambiguous: str = "X",
) -> Column:
    """Replace residue letters outside the reference's EXTENDED 1-letter
    alphabet with ``ambiguous``, then remap ``gap_symbol`` →
    ``new_gap_symbol`` (exact parity: proteofav/utils.py:356-372, keyed
    on aa_codes_1to3_extended — so B/Z/J/U/O ambiguity codes are KEPT,
    lowercase is NOT case-folded (→ ambiguous), and '.'/'*' are not in
    the alphabet so they become ambiguous BEFORE any gap remap; a
    non-'-' gap_symbol therefore never survives to the remap, exactly
    like the reference). r11: the old expr uppercased first, dropped
    the extended codes, and gap-mapped './*' — none of which the
    reference does (found by the randomized differential)."""
    extended = "ACDEFGHKILMNPQRSTVYWXBZJUO"
    seq = F.regexp_replace(
        F.col(seq_col), f"[^{extended}-]", ambiguous
    )
    if gap_symbol != new_gap_symbol:
        seq = F.replace(seq, F.lit(gap_symbol), F.lit(new_gap_symbol))
    return seq


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
