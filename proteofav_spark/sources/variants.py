"""Genetic-variant tables: JSON flattening, normalization, union and the
UniProt⟗Ensembl outer merge.

Spark-first: API payloads (UniProt Proteins API / Ensembl REST shapes) load
via ``spark.read.json`` (or ``createDataFrame`` on an in-memory payload);
nested structs flatten schema-driven into underscore-joined columns
(arrays stay ``ArrayType`` — the Spark-native answer to the reference's
object-dtype tuples); the per-key collapse is one hash aggregation.

Parity targets:
- flatten_nested_structure      proteofav/utils.py:310-336 (schema-driven here)
- flatten_uniprot_variants_ebi  proteofav/variants.py:622-661
- flatten_ensembl_variants      proteofav/variants.py:664-700
- uniprot_vars_ensembl_vars_merger proteofav/mergers.py:193-219
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from proteofav_spark.core import (
    EmptyTableError,
    constrain_column_types,
    exclude_columns,
    merging_down_by_key,
    row_selector,
    splitting_up_by_key,
)
from proteofav_spark.library import ENSEMBL_TO_UNIPROT_RENAMES, VARIANT_TYPES

VARS_MERGE_KEYS = [
    "begin", "end", "xrefs_id", "frequency",
    "consequenceType", "siftScore", "polyphenScore",
]


def flatten_structs(
    df: DataFrame, sep: str = "_", distinct_struct_arrays: bool = False
) -> DataFrame:
    """Recursively flatten struct columns into ``parent_child`` columns and
    project ``array<struct>`` columns into per-subfield arrays
    (``xrefs: array<struct<id,name>>`` → ``xrefs_id``, ``xrefs_name``).

    Schema-driven equivalent of the reference's recursive dict flattener
    (proteofav/utils.py:310-336); runs entirely in the JVM.

    ``distinct_struct_arrays=True`` reproduces the reference flattener's
    leaf dedup for STRUCT-array projections only: flatten_nested_structure
    appends a leaf value under its flattened key only `if values not in
    dictionary[keys]` — three xrefs sharing an id surface as ONE element,
    first-appearance order — while a plain LIST-of-scalars field is
    appended as the whole list, duplicates intact (r12 flattener fuzz
    caught both directions)."""
    while True:
        flat_cols: list[Column] = []
        changed = False
        for field in df.schema.fields:
            name, dtype = field.name, field.dataType
            if isinstance(dtype, T.StructType):
                changed = True
                for sub in dtype.fields:
                    flat_cols.append(
                        F.col(f"`{name}`.`{sub.name}`").alias(f"{name}{sep}{sub.name}")
                    )
            elif isinstance(dtype, T.ArrayType) and isinstance(
                dtype.elementType, T.StructType
            ):
                changed = True
                for sub in dtype.elementType.fields:
                    def _getter(s):
                        return lambda x: x.getField(s)
                    proj = F.transform(F.col(f"`{name}`"), _getter(sub.name))
                    if distinct_struct_arrays:
                        proj = F.array_distinct(proj)
                    flat_cols.append(proj.alias(f"{name}{sep}{sub.name}"))
            else:
                flat_cols.append(F.col(f"`{name}`"))
        if not changed:
            return df
        df = df.select(*flat_cols)


def unwrap_singleton_arrays(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """The reference unwraps 1-element lists to scalars per cell
    (refactor_key_val_singletons, proteofav/utils.py:339-353); a Spark column
    has one type, so the equivalent is: unwrap an ``array<primitive>`` column
    only when *no* row holds more than one element (single max-size probe)."""
    arr_cols = [
        f.name
        for f in df.schema.fields
        if f.name not in keep
        and isinstance(f.dataType, T.ArrayType)
        and not isinstance(f.dataType.elementType, (T.ArrayType, T.StructType))
    ]
    if not arr_cols:
        return df
    sizes = df.agg(*[F.max(F.size(c)).alias(c) for c in arr_cols]).first()
    for c in arr_cols:
        if sizes[c] is not None and sizes[c] <= 1:
            # try_element_at: an EMPTY array row (max size may still be 1
            # via another row) must unwrap to NULL, not abort under ANSI
            # (r12 flattener fuzz)
            df = df.withColumn(c, F.try_element_at(c, F.lit(1)))
    return df


def flatten_uniprot_variants(
    df: DataFrame,
    excluded: tuple[str, ...] = (),
    collapse: bool = True,
) -> DataFrame:
    """UniProt Proteins-API variants payload → canonical variants table.

    Input: one row per accession with a ``features`` array (the raw
    ``spark.read.json`` shape). Steps: explode features (keeping top-level
    accession columns), flatten structs, type-constrain, explode multi-id
    cells, collapse rows sharing ``xrefs_id``.
    """
    top_cols = [c for c in df.columns if c != "features"]
    df = df.select(*top_cols, F.explode("features").alias("feature"))
    # distinct_struct_arrays: the reference's flattener dedups repeated
    # STRUCT-array leaf values (three identical xref ids → one element)
    # while plain scalar-list fields keep raw duplicates — see the
    # flatten_structs docstring (r12 flattener fuzz)
    df = flatten_structs(df, distinct_struct_arrays=True)
    # an EMPTY JSON list never creates its key in the reference flattener
    # (`for e in []` appends nothing → the cell is NaN, which the
    # splitting keep-rule treats as a scalar); project [] → NULL per cell
    # so the absent-vs-empty distinction matches (r12 flattener fuzz)
    for c, t in df.dtypes:
        if t.startswith("array"):
            df = df.withColumn(c, F.when(F.size(c) > 0, F.col(c)))
    # feature_* prefix is an artifact of the explode alias; strip it to match
    # the reference's flat key naming
    renames = {c: c.replace("feature_", "", 1) for c in df.columns if c.startswith("feature_")}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    # the reference unwraps 1-element lists per feature row
    # (refactor_key_val_singletons, variants.py:642) before type
    # constraining — column-typed twin: unwrap when NO row is
    # multi-valued (review r8: this helper existed but was never wired)
    df = unwrap_singleton_arrays(df)
    df = exclude_columns(df, excluded)
    df = constrain_column_types(df, VARIANT_TYPES)
    # when NO feature carries xrefs the reference CRASHES (KeyError from
    # splitting_up_by_key on the absent column) — ours skips the
    # collapse instead (deliberate divergence, DIVERGENCES A7)
    if collapse and "xrefs_id" in df.columns:
        df = splitting_up_by_key(df, key="xrefs_id")
        df = merging_down_by_key(df, key="xrefs_id")
    # reference contract (variants.py:657-658): empty output raises
    if df.isEmpty():
        raise EmptyTableError(
            "Variants collapsing resulted in an empty DataFrame..."
        )
    return df


def flatten_ensembl_variants(
    df: DataFrame,
    excluded: tuple[str, ...] = (),
    synonymous: bool = True,
    collapse: bool = True,
) -> DataFrame:
    """Ensembl REST variants payload → canonical table with UniProt-style
    column names (rename map proteofav/library.py:569-577)."""
    for old, new in ENSEMBL_TO_UNIPROT_RENAMES.items():
        if old in df.columns and old != new:
            df = df.withColumnRenamed(old, new)
    df = exclude_columns(df, excluded)
    df = constrain_column_types(df, VARIANT_TYPES)
    if collapse and "xrefs_id" in df.columns:
        df = splitting_up_by_key(df, key="xrefs_id")
        df = merging_down_by_key(df, key="xrefs_id")
    if not synonymous and "consequenceType" in df.columns:
        # parity with the pandas `!=` (reference variants.py:695-698):
        # NULL consequence rows are KEPT (pandas NaN != value is True),
        # and a collapsed multi-consequence cell — array type after
        # merging_down_by_key — is kept wholesale (the reference's tuple
        # cells never equal the string either); only scalar rows equal
        # to 'synonymous_variant' drop (review r8: the old row_selector
        # raised DATATYPE_MISMATCH on array cells and dropped NULLs)
        if not dict(df.dtypes)["consequenceType"].startswith("array"):
            df = df.filter(
                (F.col("consequenceType") != "synonymous_variant")
                | F.col("consequenceType").isNull()
            )
    return df


def uniprot_vars_ensembl_vars_merger(
    uniprot_vars: DataFrame, ensembl_vars: DataFrame
) -> DataFrame:
    """FULL OUTER join of the two variant tables on the canonical 7-column
    key, then collapse duplicates by ``xrefs_id``.
    Parity: proteofav/mergers.py:193-219."""
    missing_u = [k for k in VARS_MERGE_KEYS if k not in uniprot_vars.columns]
    missing_e = [k for k in VARS_MERGE_KEYS if k not in ensembl_vars.columns]
    if missing_u or missing_e:
        # reference contract (proteofav/mergers.py:209-216): raise loudly —
        # fabricating NULL key columns would silently degrade the outer
        # join into a row-duplicating concat (NULL keys never match)
        from proteofav_spark.plans.mergers import TableMergerError

        raise TableMergerError(
            "Not possible to merge UniProt and Ensembl Vars table! "
            f"Missing merge keys: uniprot={missing_u} ensembl={missing_e}"
        )
    u = uniprot_vars.withColumn("begin", F.col("begin").cast("string")).withColumn(
        "end", F.col("end").cast("string")
    )
    e = ensembl_vars.withColumn("begin", F.col("begin").cast("string")).withColumn(
        "end", F.col("end").cast("string")
    )
    # NULL-SAFE key equality (r12 merger hypothesis differential):
    # pandas.merge matches NaN join keys as equal values, so two rows
    # that agree on every non-null key and are both-NaN on the rest DO
    # pair up in the reference's outer merge — `on=<names>` (null-unsafe)
    # emitted them as two unmatched rows instead. Keys coalesce to one
    # output column per name, exactly like the pandas `on=` contract.
    cond = None
    for k in VARS_MERGE_KEYS:
        clause = u[k].eqNullSafe(e[k])
        cond = clause if cond is None else (cond & clause)
    merged = u.join(e, on=cond, how="outer").select(
        *[F.coalesce(u[k], e[k]).alias(k) for k in VARS_MERGE_KEYS],
        *[u[c] for c in u.columns if c not in VARS_MERGE_KEYS],
        *[e[c] for c in e.columns if c not in VARS_MERGE_KEYS],
    )
    return merging_down_by_key(merged, key="xrefs_id")


def uniprot_info_table(
    spark, raw_tab: str | bytes, uniprot_id: str | None = None
) -> DataFrame:
    """UniProt tab-format query response → one row per entry, optionally
    row-selected to one accession (parity: proteofav/variants.py:481-514
    _uniprot_info — fetch via fetchers.url_uniprot_info, then
    pd.read_table + row_selector('Entry', id) becomes a TSV scan + an
    equality filter)."""
    import io

    import pandas as pd

    from proteofav_spark.core import EmptyTableError

    text = raw_tab.decode() if isinstance(raw_tab, bytes) else raw_tab
    pdf = pd.read_csv(io.StringIO(text), sep="\t", dtype=str)
    if pdf.empty:
        raise EmptyTableError("UniProt info response produced no records")
    df = spark.createDataFrame(pdf)
    if uniprot_id is not None and "Entry" in df.columns:
        df = df.filter(F.col("Entry") == uniprot_id)
    return df
