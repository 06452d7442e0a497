"""UniProt GFF3 annotation reader + per-residue aggregation.

Spark-first: the GFF is a tab-separated scan (``spark.read.csv``); the
attribute column parses with JVM-side ``split``/``url_decode`` expressions
(no Python); interval→residue expansion is ``explode(sequence(START, END))``
and the per-residue rollup one ``groupBy`` — the reference's per-row Python
explode loop (proteofav/annotation.py:88-90) becomes a linear distributed
plan.

Parity targets:
- parse_gff_features      proteofav/annotation.py:35-64
- annotation_aggregation  proteofav/annotation.py:67-103
- _annotation_writer      proteofav/annotation.py:106-120
- filter_annotation       proteofav/annotation.py:123-138
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from proteofav_spark.core import (
    EmptyTableError,
    constrain_column_types,
    exclude_columns,
)
from proteofav_spark.library import ANNOTATION_TYPES

GFF_COLUMNS = ("NAME", "SOURCE", "TYPE", "START", "END",
               "SCORE", "STRAND", "FRAME", "GROUP")

DEFAULT_DROP_TYPES = ("Helix", "Beta strand", "Turn", "Chain")

# GROUP attribute keys expanded to columns (parse_qs equivalent)
ATTR_KEYS = ("ID", "Note", "Ontology_term", "evidence", "Dbxref")


def _attr_expr(key: str) -> Column:
    """Extract a GFF attribute: elements of ``split(GROUP, ';')`` that start
    with ``key=``, value URL-decoded. Returns array<string> (parse_qs keeps
    lists); empty array when absent.

    parse_qs drop rules replicated exactly (r13 GFF fuzz differential):
    a BLANK raw value (``Note=``) is dropped (keep_blank_values=False
    skips it before decoding — ``Note=%20`` survives, its raw value is
    non-empty) and a BARE key token without ``=`` (``;Note;``) never
    matches (parse_qsl discards pairs with no separator)."""
    kvs = F.split(F.coalesce(F.col("GROUP"), F.lit("")), ";")
    matches = F.filter(
        kvs,
        lambda kv: (F.split(kv, "=").getItem(0) == key)
        & kv.contains("=")
        & (F.regexp_replace(kv, "^[^=]*=", "") != ""),
    )
    # value = text after the FIRST '='; literal '+' is preserved (escaped
    # before url_decode, which would otherwise turn it into a space)
    return F.transform(
        matches,
        # try_url_decode + raw fallback: a malformed percent-escape in ONE
        # attribute (e.g. 'Note=50% identity') must not kill the whole
        # scan — the reference's urllib.unquote is equally lenient
        # (review r8: url_decode raises CANNOT_DECODE_URL)
        lambda kv: F.coalesce(
            F.try_url_decode(
                F.regexp_replace(
                    F.regexp_replace(kv, "^[^=]*=", ""), r"\+", "%2B"
                )
            ),
            F.regexp_replace(kv, "^[^=]*=", ""),
        ),
    ).alias(key)


def parse_gff_features(
    spark: SparkSession,
    filename: str,
    excluded_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Scan UniProt GFF3 (TSV, '#' comment lines skipped) and expand the
    GROUP attribute string into typed columns."""
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in GFF_COLUMNS]
    )
    df = (
        spark.read.csv(filename, sep="\t", schema=schema, comment="#")
        .withColumn("line_no", F.monotonically_increasing_id())
        .withColumn("source_file", F.input_file_name())
    )
    df = df.filter(F.col("TYPE").isNotNull())
    for key in ATTR_KEYS:
        df = df.withColumn(key, _attr_expr(key))
    df = exclude_columns(df, excluded_cols)
    df = constrain_column_types(df, ANNOTATION_TYPES)
    if df.isEmpty():
        raise EmptyTableError(f"GFF file {filename} produced no rows")
    return df


def _annotation_label() -> Column:
    """Render 'TYPE: Note (ID)' with parts omitted when absent
    (parity: _annotation_writer proteofav/annotation.py:106-120)."""
    note = F.array_join(F.col("Note"), ",")
    fid = F.array_join(F.col("ID"), ",")
    has_note = F.size("Note") > 0
    has_id = F.size("ID") > 0
    return (
        F.when(~has_id & ~has_note, F.col("TYPE"))
        .when(~has_id, F.concat(F.col("TYPE"), F.lit(": "), note))
        .when(~has_note, F.concat(F.col("TYPE"), F.lit(" ("), fid, F.lit(")")))
        .otherwise(
            F.concat(F.col("TYPE"), F.lit(": "), note, F.lit(" ("), fid, F.lit(")"))
        )
    )


def annotation_aggregation(
    table: DataFrame,
    identifier: str | None = None,
    query_type: str = "",
    group_residues: bool = True,
    drop_types: tuple[str, ...] = DEFAULT_DROP_TYPES,
    check_empty: bool = True,
) -> DataFrame:
    """Explode each feature interval to per-residue rows and optionally
    collapse to one row per residue with ', '-joined labels.

    Output columns: ``site`` (string residue number), ``accession``,
    ``annotation`` (+ ``idx`` when ``group_residues=False``), matching the
    reference (proteofav/annotation.py:67-103).
    """
    if query_type:
        table = table.filter(F.col("TYPE") == query_type)
    elif drop_types:
        table = table.filter(~F.col("TYPE").isin(*drop_types))

    # range(START, END+1) semantics: a REVERSED interval (START > END)
    # contributes NO residues in the reference — Spark's sequence()
    # would descend instead (r12 hypothesis differential)
    span = F.when(
        F.col("START") <= F.col("END"), F.sequence(F.col("START"), F.col("END"))
    ).otherwise(F.expr("CAST(array() AS array<bigint>)"))
    exploded = table.select(
        F.col("line_no"),
        F.explode(span).alias("idx"),
        _annotation_label().alias("annotation"),
        F.coalesce(F.lit(identifier), F.col("NAME")).alias("accession"),
    )
    if group_residues:
        out = (
            exploded.groupBy("idx", "accession")
            .agg(
                F.concat_ws(
                    ", ",
                    F.array_sort(
                        F.collect_list(F.struct("line_no", "annotation"))
                    ).getField("annotation"),
                ).alias("annotation")
            )
            .withColumn("site", F.col("idx").cast("string"))
            .select("annotation", "site", "accession")
        )
    else:
        out = exploded.withColumn("site", F.col("idx").cast("string")).select(
            "idx", "annotation", "site", "accession"
        )
    if check_empty and out.isEmpty():
        raise EmptyTableError("annotation aggregation produced an empty table")
    return out


def filter_annotation(
    table: DataFrame,
    identifier: str | None = None,
    annotation_agg: bool = False,
    check_empty: bool = True,
    **kwargs,
) -> DataFrame:
    """Parity: filter_annotation proteofav/annotation.py:123-138."""
    if annotation_agg:
        table = annotation_aggregation(
            table, identifier=identifier, check_empty=check_empty, **kwargs
        )
    if check_empty and table.isEmpty():
        raise EmptyTableError("annotation filters produced an empty table")
    return table


def select_annotation(
    spark: SparkSession,
    filename: str,
    identifier: str | None = None,
    **kwargs,
) -> DataFrame:
    """read → parse → filter (parity: select_annotation
    proteofav/annotation.py:141-158)."""
    table = parse_gff_features(spark, filename)
    return filter_annotation(table, identifier=identifier, **kwargs)
