"""Derived-column scalar functions — all JVM-side Column expressions.

Every helper here is a pure ``Column -> Column`` builder (stays inside
whole-stage codegen; no Python UDFs). Parity targets noted per function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from proteofav_spark.library import (
    AA_1TO3,
    AA_3TO1,
    ASA_SCALES,
    SS_REDUCE,
    map_literal,
)


def fix_pdb_ins_code(df: DataFrame, col: str = "pdbx_PDB_ins_code") -> DataFrame:
    """Blank/missing insertion codes → ``'?'``.
    Parity: proteofav/structures.py:205-216."""
    c = F.col(col)
    fixed = F.when(c.isNull() | (F.trim(c) == ""), F.lit("?")).otherwise(c)
    return df.withColumn(col, fixed)


def fix_label_alt_id(df: DataFrame, col: str = "label_alt_id") -> DataFrame:
    """Blank/``'?'``/missing altlocs → ``'.'``.
    Parity: proteofav/structures.py:219-230."""
    c = F.col(col)
    fixed = F.when(c.isNull() | (F.trim(c) == "") | (c == "?"), F.lit(".")).otherwise(c)
    return df.withColumn(col, fixed)


def fix_type_symbol(df: DataFrame, col: str = "type_symbol", atom_col: str = "label_atom_id") -> DataFrame:
    """Derive the element symbol from the first uppercase letter of the atom
    name when missing. Parity: proteofav/structures.py:233-252 (row-wise
    apply in the reference → one regexp here)."""
    c = F.col(col)
    derived = F.regexp_extract(F.col(atom_col), "[A-Z]", 0)
    fixed = F.when(c.isNull() | (F.trim(c) == ""), derived).otherwise(c)
    return df.withColumn(col, fixed)


def res_full_expr(seq_col: str, ins_col: str) -> Column:
    """``seq_id + ins_code`` with ``'?'``/null stripped — the residue
    "full id" join key. Parity: proteofav/structures.py:320-337."""
    ins = F.coalesce(F.col(ins_col), F.lit(""))
    return F.concat(
        F.col(seq_col).cast("string"),
        F.regexp_replace(F.trim(ins), r"[?.]", ""),
    )


def add_res_full(df: DataFrame) -> DataFrame:
    """Add label_seq_id_full / auth_seq_id_full.
    Parity: proteofav/structures.py:320-337."""
    out = df
    for cat in ("label", "auth"):
        seq = f"{cat}_seq_id"
        if seq in df.columns:
            out = out.withColumn(
                f"{cat}_seq_id_full", res_full_expr(seq, "pdbx_PDB_ins_code")
            )
    return out


def add_atom_altloc(df: DataFrame) -> DataFrame:
    """``atom_id + '.' + alt_id`` unless altloc is empty/'.'.
    Parity: proteofav/structures.py:340-363."""
    alt = F.col("label_alt_id")
    plain = alt.isNull() | alt.isin(".", "", " ")
    out = df
    for cat in ("label", "auth"):
        atom = f"{cat}_atom_id"
        if atom in df.columns:
            out = out.withColumn(
                f"{cat}_atom_id_full",
                F.when(plain, F.col(atom)).otherwise(F.concat_ws(".", F.col(atom), alt)),
            )
    return out


def add_validation_res_full(df: DataFrame) -> DataFrame:
    """validation_resnum + icode (blank/'?' stripped).
    Parity: proteofav/validation.py:104-117."""
    icode = F.coalesce(F.col("validation_icode"), F.lit(""))
    return df.withColumn(
        "validation_resnum_full",
        F.concat(
            F.col("validation_resnum").cast("string"),
            F.regexp_replace(F.trim(icode), r"[?.]", ""),
        ),
    )


def rsa_expr(acc_col: str, aa1_col: str, method: str = "sander") -> Column:
    """RSA = round(ACC / maxASA[aa] * 100, 3) from a 1-letter residue code.
    Parity: proteofav/dssp.py:249-286 (1-letter → 3-letter → ASA constant
    tables proteofav/library.py:249-271, here ``create_map`` literals; unknown
    residues → NULL where the reference yields '')."""
    to3 = map_literal(AA_1TO3)
    scale = map_literal(ASA_SCALES[method])
    return F.round(
        F.col(acc_col).cast("double") / scale[to3[F.col(aa1_col)]] * 100.0, 3
    )


def rsa_class_expr(rsa_col: str) -> Column:
    """Bucket RSA: ≥25 Surface, 5–25 'Part. Exposed', <5 Core, null → '-'.
    Parity: proteofav/dssp.py:289-315."""
    rsa = F.col(rsa_col)
    return (
        F.when(rsa.isNull(), F.lit("-"))
        .when(rsa >= 25.0, F.lit("Surface"))
        .when((rsa >= 5.0) & (rsa < 25.0), F.lit("Part. Exposed"))
        .when(rsa < 5.0, F.lit("Core"))
        .otherwise(F.lit("-"))
    )


def ss_reduce_expr(ss_col: str) -> Column:
    """Collapse 8-state DSSP secondary structure to H/E/C/-.
    Parity: proteofav/dssp.py:215-246."""
    ss = F.coalesce(F.trim(F.col(ss_col)), F.lit(""))
    m = map_literal(SS_REDUCE)
    return F.coalesce(m[ss], F.lit("-"))


def aa3to1_expr(comp_col: str) -> Column:
    """3-letter → 1-letter amino-acid code, unknown → 'X'. Multi-letter
    map values (chromophore multi-residue expansions) also emit 'X',
    matching the reference's len(aa1) == 1 guard.
    Parity: proteofav/structures.py:689-713 (full scop_3to1 map)."""
    m = map_literal({
        k: (v if len(v) == 1 else "X") for k, v in AA_3TO1.items()
    })
    return F.coalesce(m[F.upper(F.col(comp_col))], F.lit("X"))


def fix_lowercase_cys(df: DataFrame, col: str = "AA") -> DataFrame:
    """DSSP lowercase letters mark SS-bridged cysteines → 'C'.
    Parity: proteofav/mergers.py:290-293 (3ehk edge case)."""
    c = F.col(col)
    is_lower = (c == F.lower(c)) & (c != F.upper(c))
    return df.withColumn(col, F.when(is_lower, F.lit("C")).otherwise(c))
