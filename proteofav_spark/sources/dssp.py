"""DSSP reader + filter pipeline.

Spark-first design: fixed-width ``substring`` projections over a text scan
(JVM-side), and the reference's sequential chain-suffix counter
(proteofav/dssp.py:153-194) re-expressed as a *segmented running sum* window:

- reference semantics: a counter ``c`` starts at -1; at each ``!*``
  chain-break row, ``c += 1`` when the chains before/after the break are
  equal (BioUnit copies of the same chain) else ``c = -1``; non-break rows
  with ``c >= 0`` get ``CHAIN + alphabet[c]`` (A→AA, AZ, A0, … pattern).
- Spark: lag/lead give prev/next chain; "reset" events start a new segment
  (running sum of resets); ``c`` = running count of "increment" events within
  the segment minus 1. All windows partition by ``source_file`` so thousands
  of structures process independently at scale.

Parity targets:
- parse_dssp_residues  proteofav/dssp.py:31-111 (widths :85-90)
- _add_dssp_full_chain proteofav/dssp.py:153-194
- filter_dssp          proteofav/dssp.py:342-411
"""

from __future__ import annotations

from string import ascii_uppercase, digits

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from proteofav_spark.core import (
    EmptyTableError,
    constrain_column_types,
    exclude_columns,
    row_selector,
    with_line_no,
)
from proteofav_spark.functions.derived import (
    rsa_class_expr,
    rsa_expr,
    ss_reduce_expr,
)
from proteofav_spark.library import DSSP_TYPES

# fixed-width (start, end) 0-based spans of the DSSP residue record — public
# DSSP format; same spans the reference reads (proteofav/dssp.py:85-90)
_DSSP_WIDTHS: list[tuple[str, tuple[int, int]]] = [
    ("LINE", (0, 5)),
    ("RES", (5, 10)),
    ("RES_FULL", (5, 11)),
    ("INSCODE", (10, 11)),
    ("CHAIN", (11, 12)),
    ("AA", (12, 15)),
    ("SS", (16, 17)),
    ("STRUCTURE", (17, 25)),
    ("BP1", (25, 29)),
    ("BP2", (29, 33)),
    ("BP2_CHAIN", (33, 34)),
    ("ACC", (34, 38)),
    ("NH_O_1", (38, 45)),
    ("NH_O_1_nrg", (46, 50)),
    ("O_HN_1", (50, 56)),
    ("O_HN_1_nrg", (57, 61)),
    ("NH_O_2", (61, 67)),
    ("NH_O_2_nrg", (68, 72)),
    ("O_HN_2", (72, 78)),
    ("O_HN_2_nrg", (79, 84)),
    ("TCO", (85, 91)),
    ("KAPPA", (91, 97)),
    ("ALPHA", (97, 103)),
    ("PHI", (103, 109)),
    ("PSI", (109, 115)),
    ("X-CA", (115, 123)),
    ("Y-CA", (123, 130)),
    ("Z-CA", (130, 137)),
]

DEFAULT_EXCLUDED_COLS = (
    "LINE", "STRUCTURE", "BP1", "BP2", "BP2_CHAIN",
    "NH_O_1", "NH_O_1_nrg", "O_HN_1", "O_HN_1_nrg",
    "NH_O_2", "NH_O_2_nrg", "O_HN_2", "O_HN_2_nrg",
    "X-CA", "Y-CA", "Z-CA",
)

# BioUnit suffix alphabet: A-Z0-9, then A?-B? (proteofav/dssp.py:168-172)
_ALPHA1 = list(ascii_uppercase + digits)
CHAIN_SUFFIX_ALPHABET = _ALPHA1 + ["A" + k for k in _ALPHA1] + ["B" + k for k in _ALPHA1]

def _file_w():
    return W.partitionBy("source_file").orderBy("line_no")


def parse_dssp_residues(
    spark: SparkSession,
    filename: str,
    excluded_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Scan DSSP fixed-width residue records (after the ``  #`` header
    sentinel) into the canonical per-residue table."""
    text = with_line_no(spark.read.text(filename)).withColumn(
        "source_file", F.input_file_name()
    )
    # rows strictly after the FIRST per-file header sentinel. The reference
    # appends-then-flags (dssp.py:70-75), so a LATER "  #"-prefixed line is
    # kept as a (junk) data row — only the first sentinel is consumed; the
    # running-sentinel count must exceed this row's own contribution
    sentinel = F.col("value").startswith("  #").cast("int")
    seen = F.sum(sentinel).over(_file_w().rowsBetween(W.unboundedPreceding, 0))
    body = (
        text.withColumn("_hdr_seen", seen)
        .filter(F.col("_hdr_seen") > sentinel)
        .drop("_hdr_seen")
        .filter(F.length(F.trim(F.col("value"))) > 0)
    )
    padded = F.rpad(F.col("value"), 140, " ")
    cols = [
        F.trim(F.substring(padded, a + 1, b - a)).alias(name)
        for name, (a, b) in _DSSP_WIDTHS
    ]
    table = body.select(*cols, "line_no", "source_file")
    table = exclude_columns(table, excluded_cols if excluded_cols is not None else DEFAULT_EXCLUDED_COLS)
    table = constrain_column_types(table, DSSP_TYPES)
    if table.isEmpty():
        raise EmptyTableError(f"DSSP file {filename} produced no residue rows")
    return table


def add_dssp_full_chain(table: DataFrame) -> DataFrame:
    """CHAIN_FULL disambiguation for BioUnit chains (see module docstring)."""
    prev_chain = F.lag("CHAIN").over(_file_w())
    next_chain = F.lead("CHAIN").over(_file_w())
    is_break = F.col("AA") == "!*"
    incr = (is_break & (prev_chain == next_chain)).cast("int")
    reset = (is_break & ~(prev_chain.eqNullSafe(next_chain))).cast("int")

    t = table.withColumn("_incr", incr).withColumn("_reset", reset)
    run = _file_w().rowsBetween(W.unboundedPreceding, 0)
    t = t.withColumn("_seg", F.sum("_reset").over(run))
    seg_w = W.partitionBy("source_file", "_seg").orderBy("line_no").rowsBetween(
        W.unboundedPreceding, 0
    )
    t = t.withColumn("_c", F.sum("_incr").over(seg_w) - F.lit(1))

    alphabet = F.array(*[F.lit(a) for a in CHAIN_SUFFIX_ALPHABET])
    # past the end of the alphabet, element_at yields NULL and the
    # suffixed chain would silently vanish from chains_full filters —
    # raise the reference's loud IndexError instead (dssp.py parity:
    # 'Alphabet needs update'; coalesce evaluates raise_error lazily)
    suffix = F.coalesce(
        # try_element_at: NULL on out-of-bounds under EVERY ANSI setting
        # (plain element_at raises an unhelpful index error under ANSI)
        F.try_element_at(alphabet, (F.col("_c") + 1).cast("int")),
        F.raise_error(
            F.lit(
                "Alphabet needs update: more chain copies than "
                "CHAIN_SUFFIX_ALPHABET entries"
            )
        ),
    )
    suffixed = F.concat(F.col("CHAIN"), suffix)
    chain_full = F.when(
        (F.col("_c") >= 0) & ~F.col("AA").isin("!", "!*"), suffixed
    ).otherwise(F.col("CHAIN"))
    return t.withColumn("CHAIN_FULL", chain_full).drop("_incr", "_reset", "_seg", "_c")


def filter_dssp(
    table: DataFrame,
    excluded_cols: tuple[str, ...] | None = None,
    chains: tuple[str, ...] | None = None,
    chains_full: tuple[str, ...] | None = None,
    res: tuple[str, ...] | None = None,
    add_full_chain: bool = True,
    add_ss_reduced: bool = False,
    add_rsa: bool = True,
    rsa_method: str = "sander",
    add_rsa_class: bool = False,
    reset_res_id: bool = False,
    check_empty: bool = True,
) -> DataFrame:
    """Composite DSSP filter pipeline (parity: proteofav/dssp.py:342-411)."""
    table = exclude_columns(table, excluded_cols)
    if add_full_chain:
        table = add_dssp_full_chain(table)
    table = table.withColumn("SS", F.coalesce(F.col("SS"), F.lit("-")))
    if add_ss_reduced:
        table = table.withColumn("SS_CLASS", ss_reduce_expr("SS"))
    if add_rsa:
        table = table.withColumn("RSA", rsa_expr("ACC", "AA", method=rsa_method.lower()))
    if add_rsa_class:
        table = table.withColumn("RSA_CLASS", rsa_class_expr("RSA"))

    # drop missing residues ('!') and chain breaks ('!*') — NULL AA rows
    # are KEPT: the reference's pandas `!=` is True for NaN (the same
    # NaN-comparison quirk as row_selector's reverse — r12 option-grid
    # differential)
    table = table.filter(
        F.col("AA").isNull() | ~F.col("AA").isin("!", "!*")
    )

    if chains is not None:
        table = row_selector(table, "CHAIN", chains, check_empty=False)
    if chains_full is not None:
        table = row_selector(table, "CHAIN_FULL", chains_full, check_empty=False)
    if res is not None:
        table = row_selector(table, "RES", res, check_empty=False)
    if reset_res_id:
        table = table.withColumn("LINE", F.row_number().over(_file_w()))
    if check_empty and table.isEmpty():
        raise EmptyTableError("DSSP filters produced an empty table")
    return table


def check_dssp_key_uniqueness(table: DataFrame) -> bool:
    """(RES_FULL, CHAIN) duplicate probe; the reference only warns
    (proteofav/dssp.py:337-338)."""
    return (
        table.groupBy("RES_FULL", "CHAIN").count().filter(F.col("count") > 1).isEmpty()
    )


def select_dssp(
    spark: SparkSession,
    filename: str,
    excluded_cols: tuple[str, ...] | None = None,
    **filter_kwargs,
) -> DataFrame:
    """read → parse → filter → type-constrain (parity: select_dssp
    proteofav/dssp.py:318-339; the download step is a separate staging
    concern, see sources/fetchers.py)."""
    table = parse_dssp_residues(spark, filename, excluded_cols=excluded_cols)
    return filter_dssp(table, **filter_kwargs)
