"""mmCIF / PDB atom readers — Spark-first text scans.

Strategy (not a port): ``spark.read.text`` keeps one task per file split, the
``_atom_site`` header is a tiny driver-side probe, and the atom records are
projected with JVM-side ``split``/``substring`` expressions so parsing stays
inside whole-stage codegen. Every row carries ``line_no`` (monotone file
order) because downstream operators are order-dependent (SURVEY.md §2.6).

Parity targets:
- parse_mmcif_atoms   proteofav/structures.py:57-115
- parse_pdb_atoms     proteofav/structures.py:118-202 (fixed widths :168-170)
- _mmcif_fields       proteofav/structures.py:255-317
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from proteofav_spark.core import (
    EmptyTableError,
    constrain_column_types,
    exclude_columns,
    with_line_no,
)
from proteofav_spark.functions.derived import (
    fix_label_alt_id,
    fix_pdb_ins_code,
    fix_type_symbol,
)
from proteofav_spark.library import PDBX_TYPES

DEFAULT_EXCLUDED_COLS = (
    "Cartn_x_esd", "Cartn_y_esd", "Cartn_z_esd",
    "occupancy_esd", "B_iso_or_equiv_esd", "pdbx_formal_charge",
)

# PDB fixed-width colspecs (public wwPDB format; same spans as the
# reference uses at proteofav/structures.py:168-170). (start, end) 0-based.
_PDB_HEADER_WIDTHS: list[tuple[str, tuple[int, int]]] = [
    ("group_PDB", (0, 6)),
    ("id", (6, 11)),
    ("label_atom_id", (12, 16)),
    ("label_alt_id", (16, 17)),
    ("label_comp_id", (17, 20)),
    ("label_asym_id", (21, 22)),
    ("label_seq_id_full", (22, 27)),
    ("label_seq_id", (22, 26)),
    ("pdbx_PDB_ins_code", (26, 27)),
    ("Cartn_x", (30, 38)),
    ("Cartn_y", (38, 46)),
    ("Cartn_z", (46, 54)),
    ("occupancy", (54, 60)),
    ("B_iso_or_equiv", (60, 66)),
    ("type_symbol", (76, 78)),
    ("auth_atom_id", (12, 16)),
    ("auth_comp_id", (17, 20)),
    ("auth_asym_id", (21, 22)),
    ("auth_seq_id_full", (22, 27)),
    ("auth_seq_id", (22, 26)),
]


def _read_ordered_text(spark: SparkSession, filename: str) -> DataFrame:
    """Read a text file with a monotone ``line_no``. Partition ordering of a
    single file follows byte offsets, so monotonically_increasing_id sorts to
    file order while remaining fully distributed. ``source_file`` scopes all
    order-dependent windows so a glob of many files processes per-file."""
    return with_line_no(spark.read.text(filename)).withColumn(
        "source_file", F.input_file_name()
    )


# mmCIF tokenization: whitespace-separated fields where a single- or
# double-quoted value may embed spaces (PDBx convention — nucleic-acid
# atom names like "C1'" are double-quoted). Alternation order makes the
# quoted branches win whenever a token STARTS with a quote; a quote
# inside a bare token (5'-end etc.) stays in the \S+ branch, per CIF.
# Terminator-aware (ADVICE r9): CIF ends a quoted value only at a quote
# FOLLOWED BY whitespace/EOL, so an embedded quote ('it's ok') stays
# inside the field — the (?:'[^\s][^']*)* arm consumes quote+non-space
# continuations and the (?=\s|$) lookahead pins the real terminator;
# the old first-closing-quote pattern split such values into multiple
# fields and shifted every later column.
_CIF_TOKEN_RE = (
    r"'[^']*(?:'[^\s][^']*)*'(?=\s|$)"
    r'|"[^"]*(?:"[^\s][^"]*)*"(?=\s|$)'
    r"|\S+"
)


def cif_split_py(line: str) -> list[str]:
    """Python twin of :func:`_cif_tokens` for executor-/driver-side
    parsers (the mmCIF key-value block scan below; the bulk lake ingest
    in plans/lake.py): SAME regex, SAME outer-quote strip, so the two
    ingest paths can never tokenize one line differently (review r9 —
    the lake path was still a bare ``str.split()`` and shifted columns
    on quoted atom names)."""
    import re as _re

    return [
        t[1:-1]
        if len(t) >= 2 and t[0] == t[-1] and t[0] in "'\""
        else t
        for t in _re.findall(_CIF_TOKEN_RE, line)
    ]


def _cif_tokens(col: F.Column) -> F.Column:
    """Quote-aware mmCIF field array with the quote characters STRIPPED —
    the distributed twin of the reference's pandas ``quotechar`` parsing
    (a plain whitespace split keeps the quotes and shifts every column
    after an embedded-space value; review r8)."""
    toks = F.regexp_extract_all(col, F.lit(_CIF_TOKEN_RE), 0)
    return F.transform(
        toks,
        lambda t: F.when(
            (F.length(t) >= 2)
            & (t.rlike("^'.*'$") | t.rlike('^".*"$')),
            t.substr(F.lit(2), F.length(t) - 2),
        ).otherwise(t),
    )


def parse_mmcif_atoms(
    spark: SparkSession,
    filename: str,
    excluded_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Scan mmCIF ``_atom_site`` loop records into the canonical atom table.

    The ``_atom_site.*`` header keys (a handful of lines) are collected
    driver-side; the (large) ATOM/HETATM body is a distributed
    filter + quote-aware-split projection, never leaving the JVM. Glob
    input is accepted when every file carries the SAME ``_atom_site``
    header sequence (one shared projection can then parse all files);
    differing headers raise instead of silently misaligning columns.
    """
    text = _read_ordered_text(spark, filename)
    hdr_rows = (
        text.filter(F.col("value").startswith("_atom_site."))
        .select("source_file", "line_no", "value")
        .collect()
    )
    by_file: dict[str, list[tuple[int, str]]] = {}
    for r in hdr_rows:
        by_file.setdefault(r.source_file, []).append((r.line_no, r.value))
    uniq = {
        tuple(v.split(".", 1)[1].strip() for _, v in sorted(rows))
        for rows in by_file.values()
    }
    if len(uniq) > 1:
        raise ValueError(
            f"files under {filename} carry differing _atom_site headers; "
            "parse them separately (one projection cannot fit both)"
        )
    header = list(next(iter(uniq))) if uniq else []
    if not header:
        raise EmptyTableError(f"no _atom_site loop in {filename}")

    body = text.filter(
        F.col("value").startswith("ATOM") | F.col("value").startswith("HETATM")
    )
    arr = _cif_tokens(F.trim(F.col("value")))
    # F.get (NULL past the end), never getItem: Catalyst may reorder a
    # pushed column predicate (e.g. a chain filter) BEFORE the body
    # filter, evaluating the accessor on non-body lines with fewer
    # tokens — under ANSI, getItem then raises INVALID_ARRAY_INDEX on
    # lines the query was never meant to read
    cols = [F.get(arr, i).alias(name) for i, name in enumerate(header)]
    table = body.select(*cols, "line_no", "source_file")

    table = exclude_columns(table, excluded_cols if excluded_cols is not None else DEFAULT_EXCLUDED_COLS)
    table = constrain_column_types(table, PDBX_TYPES)
    if table.isEmpty():
        raise EmptyTableError(f"mmCIF file {filename} produced no atom rows")
    return table


def parse_pdb_atoms(
    spark: SparkSession,
    filename: str,
    excluded_cols: tuple[str, ...] | None = None,
    fix_label_alt: bool = True,
    fix_ins: bool = True,
    fix_type: bool = True,
) -> DataFrame:
    """Scan legacy fixed-width PDB ATOM/HETATM records into the mmCIF-named
    canonical atom table.

    MODEL-number propagation (the reference tracks a mutable ``modelnumb``
    while streaming lines, proteofav/structures.py:149-158) is a
    ``last(..., ignoreNulls)`` running window over ``line_no`` — the standard
    Spark re-expression of carry-forward state.
    """
    from pyspark.sql import Window as W

    text = _read_ordered_text(spark, filename)
    line = F.col("value")
    model_marker = F.when(
        line.startswith("MODEL"),
        F.split(F.trim(line), r"\s+").getItem(1),
    )
    # partitionBy(source_file): model numbers must not leak across files
    # of a glob, and the per-file window keeps the carry-forward
    # distributed instead of funneling the scan through ONE sort task
    # (review r8 — the module contract at _read_ordered_text promises
    # exactly this scoping)
    w = (
        W.partitionBy("source_file")
        .orderBy("line_no")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    annotated = text.withColumn(
        "pdbx_PDB_model_num",
        F.coalesce(F.last(model_marker, ignorenulls=True).over(w), F.lit("1")),
    )
    body = annotated.filter(line.startswith("ATOM") | line.startswith("HETATM"))

    clipped = F.rpad(F.substring(line, 1, 78), 78, " ")
    cols = [
        F.trim(F.substring(clipped, a + 1, b - a)).alias(name)
        for name, (a, b) in _PDB_HEADER_WIDTHS
    ]
    table = body.select(*cols, "pdbx_PDB_model_num", "line_no", "source_file")

    if fix_ins:
        table = fix_pdb_ins_code(table)
    if fix_label_alt:
        table = fix_label_alt_id(table)
    if fix_type:
        table = fix_type_symbol(table)

    table = exclude_columns(table, excluded_cols if excluded_cols is not None else DEFAULT_EXCLUDED_COLS)
    table = constrain_column_types(table, PDBX_TYPES)
    if table.isEmpty():
        raise EmptyTableError(f"PDB file {filename} produced no atom rows")
    return table


def mmcif_fields(
    spark: SparkSession, filename: str, field_name: str = "exptl."
) -> DataFrame:
    """Generic mmCIF category scan (both ``loop_`` tables and key-value
    blocks) → small DataFrame. Parity: _mmcif_fields
    proteofav/structures.py:255-317. Metadata categories are tiny, so the
    line partition is collected and assembled driver-side, then returned as a
    DataFrame for joining/broadcast."""
    rows = (
        spark.read.text(filename)
        .filter(
            F.col("value").startswith(field_name)
            | F.col("value").startswith("_" + field_name.lstrip("_"))
        )
        .collect()
    )
    prefix = "_" + field_name.lstrip("_")
    header: list[str] = []
    values: list[str] = []
    for r in rows:
        lin = r.value.strip()
        if not lin.startswith(prefix):
            continue
        parts = lin.split(None, 1)
        key = parts[0].split(".", 1)[1]
        header.append(key)
        if len(parts) > 1:
            values.append(parts[1].strip().strip("'\""))
    if values and len(values) == len(header):
        data = [tuple(values)]
    else:
        # loop_ style: data rows follow the header block. Collect ONLY
        # the block — two tiny min() aggregations find its line range
        # (first header line → next '#'), so a metadata lookup on a
        # multi-GB assembly never materializes the atom body on the
        # driver (review r8: the old path collected the whole file).
        lines = with_line_no(spark.read.text(filename))
        lo = (
            lines.filter(F.col("value").startswith(prefix))
            .agg(F.min("line_no").alias("lo"))
            .collect()[0]["lo"]
        )
        if lo is None:
            raise EmptyTableError(f"no {field_name} fields in {filename}")
        hi = (
            lines.filter(
                (F.col("line_no") > lo) & F.col("value").startswith("#")
            )
            .agg(F.min("line_no").alias("hi"))
            .collect()[0]["hi"]
        )
        blk = lines.filter(F.col("line_no") >= lo)
        if hi is not None:
            blk = blk.filter(F.col("line_no") < hi)
        text = [r.value for r in blk.orderBy("line_no").collect()]
        data = []
        in_block = False
        for lin in text:
            if lin.startswith(prefix):
                in_block = True
                continue
            if in_block:
                if lin.startswith(("_", "#", "loop_")):
                    if data:
                        break
                    if lin.startswith(("#", "loop_")):
                        in_block = False
                    continue
                # quote-aware: a quoted value with an embedded space is
                # ONE field (the reference parses these via pandas
                # quotechar; a bare split() mis-counts and drops the row)
                toks = cif_split_py(lin)
                if len(toks) == len(header):
                    data.append(tuple(toks))
    if not header or not data:
        raise EmptyTableError(f"no {field_name} fields in {filename}")
    return spark.createDataFrame(data, header)
