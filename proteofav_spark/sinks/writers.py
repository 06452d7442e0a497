"""Sinks: mmCIF / fixed-width PDB atom-line writers, tabular exports, and
the Chimera visualisation files.

Spark-first: each row formats with JVM-side ``format_string``/``concat_ws``
expressions and lands through ``df.write.text`` — the reference's per-row
``.loc`` printf loop (proteofav/structures.py:555-559) becomes a distributed
map. Single-file output (the reference semantic) uses ``coalesce(1)``;
at scale drop the coalesce and write a sharded directory.

Parity targets:
- write_mmcif_from_table  proteofav/structures.py:515-538
- write_pdb_from_table/_get_atom_line proteofav/structures.py:541-643
  (printf template PDB_FORMAT at :40)
- CLI csv/json/tab sinks  proteofav/main.py:58-65
- Chimera attribute/command files proteofav/visualise.py:14-99
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _order_cols(df: DataFrame) -> list[str]:
    """The shared deterministic output-order key: file order when the
    frame still carries its scan provenance, else the id column."""
    return [c for c in ("source_file", "line_no", "id") if c in df.columns]


def _ordered(df: DataFrame) -> DataFrame:
    order = _order_cols(df)
    return df.orderBy(*order) if order else df


def _cif_token(c: str) -> Column:
    """One CIF data value, quoted when bare emission would corrupt the
    round-trip (review r10 — the write-side twin of the r9 quote-aware
    tokenizer: the reference writer emits ``' '.join(str(v))``
    unquoted, proteofav/structures.py:527-529, so a value containing
    whitespace or starting with a quote/comment char silently shifts
    columns on re-read). Quoting rule mirrors the tokenizer (quote ends
    only at quote+whitespace): prefer ``'...'`` when the value carries
    no single quote, else ``"..."``; a value containing BOTH quote
    kinds has no single-line CIF spelling — fail loudly instead of
    emitting a token the parser would mis-split."""
    v = F.coalesce(F.col(c).cast("string"), F.lit("?"))
    needs = (
        (v == "")
        | v.rlike(r"\s")
        | F.substring(v, 1, 1).isin("'", '"', ";", "#", "$", "[", "]")
    )
    quoted = (
        F.when(~v.contains("'"), F.concat(F.lit("'"), v, F.lit("'")))
        .when(~v.contains('"'), F.concat(F.lit('"'), v, F.lit('"')))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("CIF field has no single-line quoting: "), v
                )
            )
        )
    )
    return F.when(needs, quoted).otherwise(v)


def mmcif_atom_lines(df: DataFrame, exclude_meta: bool = True) -> tuple[list[str], DataFrame]:
    """Header lines + a one-column DataFrame of space-joined atom records."""
    cols = [
        c for c in df.columns
        if not (exclude_meta and c in ("line_no", "source_file"))
    ]
    header = ["data_mmCIF_generated_by_proteofav_spark", "loop_"] + [
        f"_atom_site.{c}" for c in cols
    ]
    body = _ordered(df).select(
        F.concat_ws(" ", *[_cif_token(c) for c in cols]).alias("value")
    )
    return header, body


def write_mmcif_from_table(
    df: DataFrame, filename: str, overwrite: bool = False
) -> None:
    """Serialize the atom table to a single mmCIF file."""
    if os.path.exists(filename) and not overwrite:
        return
    header, body = mmcif_atom_lines(df)
    lines = [r["value"] for r in body.collect()]
    with open(filename, "w") as fh:
        fh.write("\n".join(header + lines))


def pdb_atom_line_expr(category: str = "auth") -> Column:
    """One PDB ATOM/HETATM fixed-width record as a Column expression
    (template parity: PDB_FORMAT proteofav/structures.py:40)."""
    record = F.rpad(F.col("group_PDB"), 6, " ")
    serial = F.format_string("%5d", F.col("_atom_number").cast("int"))
    raw_name = F.col(f"{category}_atom_id")
    name = (
        F.when(F.length(raw_name) == 1, F.concat(F.lit(" "), raw_name, F.lit("  ")))
        .when(F.length(raw_name) == 2, F.concat(F.lit(" "), raw_name, F.lit(" ")))
        .when(F.length(raw_name) == 3, F.concat(F.lit(" "), raw_name))
        .otherwise(F.substring(raw_name, 1, 4))
    )
    altloc = F.when(F.col("label_alt_id") == ".", F.lit(" ")).otherwise(
        F.substring(F.col("label_alt_id"), 1, 1)
    )
    resname = F.format_string("%3s", F.col(f"{category}_comp_id"))
    chain = F.substring(F.col(f"{category}_asym_id"), 1, 1)
    resseq = F.format_string("%4s", F.col(f"{category}_seq_id").cast("string"))
    icode = F.when(F.col("pdbx_PDB_ins_code") == "?", F.lit(" ")).otherwise(
        F.coalesce(F.substring(F.col("pdbx_PDB_ins_code"), 1, 1), F.lit(" "))
    )
    coords = F.format_string(
        "%8.3f%8.3f%8.3f",
        F.col("Cartn_x").cast("double"),
        F.col("Cartn_y").cast("double"),
        F.col("Cartn_z").cast("double"),
    )
    occ = F.format_string("%6.2f", F.col("occupancy").cast("double"))
    bfac = F.format_string("%6.2f", F.col("B_iso_or_equiv").cast("double"))
    element = F.format_string("%2s", F.upper(F.trim(F.col("type_symbol"))))
    return F.concat(
        record, serial, F.lit(" "), name, altloc, resname, F.lit(" "),
        chain, resseq, icode, F.lit("   "), coords, occ, bfac,
        F.lit("      "), F.format_string("%4s", F.lit("")), element, F.lit("  "),
    )


def pdb_lines(df: DataFrame, category: str = "auth") -> DataFrame:
    order = _order_cols(df)
    w = W.orderBy(*order) if order else W.orderBy(F.monotonically_increasing_id())
    numbered = df.withColumn("_atom_number", F.row_number().over(w))
    return numbered.select(pdb_atom_line_expr(category).alias("value"))


def write_pdb_from_table(
    df: DataFrame, filename: str, overwrite: bool = False, category: str = "auth"
) -> None:
    """Serialize the atom table to a single PDB-format file."""
    if os.path.exists(filename) and not overwrite:
        return
    lines = [r["value"] for r in pdb_lines(df, category).collect()]
    with open(filename, "w") as fh:
        fh.write("REMARK 100 PDB generated by proteofav_spark\n")
        fh.write("\n".join(lines))
        fh.write("\n")


def write_pdb_lake(
    df: DataFrame, out_dir: str, category: str = "auth"
) -> None:
    """Distributed per-structure PDB writer: one text-file directory per
    structure under ``out_dir/_structure=<id>/``, written straight from
    the executors — the scale path for serializing a whole atom lake,
    where :func:`write_pdb_from_table` (reference-parity single-file
    writer, proteofav/structures.py:949-965) would collect to the driver.

    Shape: atom serials renumber per structure via a window partitioned
    by the structure key (one shuffle, which also co-locates each
    structure in one task), a per-structure REMARK header row unions in
    with a sort key below every atom line, and the partitioned text sink
    streams each task's sorted rows into its structure's directory. No
    driver materialization at any size."""
    order_col = "line_no" if "line_no" in df.columns else "id"
    struct = F.regexp_extract(F.col("source_file"), r"([^/]+?)(?:\.[^./]+)?$", 1)
    base = df.withColumn("_structure", struct)
    w = W.partitionBy("_structure").orderBy(order_col)
    atoms = base.withColumn("_atom_number", F.row_number().over(w)).select(
        "_structure",
        F.col(order_col).cast("long").alias("_ord"),
        pdb_atom_line_expr(category).alias("value"),
    )
    headers = (
        base.select("_structure")
        .distinct()
        .select(
            "_structure",
            F.lit(-1).cast("long").alias("_ord"),
            F.lit("REMARK 100 PDB generated by proteofav_spark").alias("value"),
        )
    )
    (
        atoms.unionByName(headers)
        .repartition("_structure")
        .sortWithinPartitions("_structure", "_ord")
        .select("_structure", "value")
        .write.partitionBy("_structure")
        .mode("overwrite")
        .text(out_dir)
    )


def write_table(
    df: DataFrame, filename: str, output_format: str = "csv"
) -> None:
    """CLI tabular sinks (parity: proteofav/main.py:58-65). ``tab`` is csv
    with a tab separator. Writes a sharded directory (Spark-native); pass a
    path ending in a directory name."""
    writer = df.coalesce(1).write.mode("overwrite")
    if output_format == "csv":
        writer.option("header", True).csv(filename)
    elif output_format == "tab":
        writer.option("header", True).option("sep", "\t").csv(filename)
    elif output_format == "json":
        writer.json(filename)
    elif output_format == "parquet":
        # same single-shard layout as the text formats: callers pick up
        # one part file regardless of format (review r8 — this branch
        # silently ignored the coalesced writer)
        writer.parquet(filename)
    else:
        raise ValueError(f"unsupported output format: {output_format}")


def make_chimera_attribute_file(
    df: DataFrame,
    value_col: str,
    residue_col: str,
    recipient: str = "residues",
    match_mode: str = "1 - to - 1",
) -> str:
    """Chimera per-residue attribute export (parity:
    proteofav/visualise.py:14-51). Small driver-side render of a
    two-column selection."""
    if recipient not in ("atoms", "residues", "molecules"):
        raise ValueError("The recipient is not supported.")
    if recipient != "residues":
        raise NotImplementedError
    header = (
        f"# Generated with proteofav_spark\n"
        f"attribute: {value_col}\n"
        f"match mode: {match_mode}\n"
        f"recipient: {recipient}\n"
    )
    rows = (
        # deterministic line order: an upstream shuffle otherwise returns
        # partitions in arbitrary order and the attribute file diffs
        # run-to-run (review r8; the reference preserves Series order)
        _ordered(
            df.select(
                residue_col,
                value_col,
                *(c for c in _order_cols(df) if c not in (residue_col, value_col)),
            ).filter(F.col(value_col).isNotNull())
        )
        .select(residue_col, value_col)
        .collect()
    )
    lines = "\n".join(f"\t:{r[0]}\t{r[1]}" for r in rows)
    return header + lines


def make_chimera_command_file(
    filename: str, content: str | list[str] = "",
    color_secondary_structure: bool = True,
) -> str:
    """Parity: proteofav/visualise.py:54-79."""
    line = f"open {filename}\n"
    if isinstance(content, str):
        line += content
    elif hasattr(content, "__iter__"):
        line += "\n".join(content)
    if color_secondary_structure:
        line += "color green,r helix\ncolor yellow,r strand\ncolor gray,r coil\n"
    return line
