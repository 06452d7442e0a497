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
        # NULL consequence rows are KEPT (pandas NaN != value is True)
        # and a multi-consequence tuple cell never equals the string, so
        # it is kept; only cells that the reference holds as the SCALAR
        # 'synonymous_variant' drop. Under the A4 typed-array collapse a
        # reference scalar is a SINGLETON array whenever the column stays
        # array-typed (any group collapsed multi-valued), so the scalar
        # drop becomes size==1 AND [0]=='synonymous_variant' — size-0,
        # NULL, and multi-element cells all survive (r13 fix: the r8
        # guard skipped the filter wholesale on array-typed columns).
        if dict(df.dtypes)["consequenceType"].startswith("array"):
            df = df.filter(
                F.col("consequenceType").isNull()
                | ~(
                    (F.size("consequenceType") == 1)
                    & (
                        F.try_element_at(F.col("consequenceType"), F.lit(1))
                        == "synonymous_variant"
                    )
                )
            )
        else:
            df = df.filter(
                (F.col("consequenceType") != "synonymous_variant")
                | F.col("consequenceType").isNull()
            )
        # reference row_selector contract (utils.py:129-131): an emptied
        # table raises — same C16 rule the UniProt flattener applies
        if df.isEmpty():
            raise EmptyTableError(
                "Column consequenceType does not contain "
                "non-'synonymous_variant' value(s)..."
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
    # pandas suffixes shared non-key columns _x/_y (merge default); without
    # it the select emits DUPLICATE output names and the downstream
    # collapse fails on ambiguous references (ADVICE r12 low #4)
    u_payload = [c for c in u.columns if c not in VARS_MERGE_KEYS]
    e_payload = [c for c in e.columns if c not in VARS_MERGE_KEYS]
    shared = set(u_payload) & set(e_payload)
    merged = u.join(e, on=cond, how="outer").select(
        *[F.coalesce(u[k], e[k]).alias(k) for k in VARS_MERGE_KEYS],
        *[u[c].alias(f"{c}_x" if c in shared else c) for c in u_payload],
        *[e[c].alias(f"{c}_y" if c in shared else c) for c in e_payload],
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


# --------------------------------------------------------------------------
# ID-mapping getters + the composed variant orchestration
# (parity: proteofav/variants.py:226-355,520-620 — driver-side REST
# plumbing over tiny payloads; the RESULT tables are Spark DataFrames)
# --------------------------------------------------------------------------

def get_ensembl_species_from_uniprot(tab_text: str | bytes) -> str:
    """Species name from a UniProt organism lookup (tab format) —
    ``genus_species`` lowercased (parity: proteofav/variants.py:226-236)."""
    text = tab_text.decode() if isinstance(tab_text, bytes) else tab_text
    organism = text.split("\n")[1]
    return "_".join(organism.split()[0:2]).lower()


def get_ensembl_protein_id_from_mapping(data) -> list[str]:
    """Ensembl translation ids from an ``xrefs/symbol/`` mapping payload
    (parity: proteofav/variants.py:238-252 — dedup, first-seen order)."""
    ensps: list[str] = []
    for entry in data:
        if entry.get("type") == "translation" and "id" in entry:
            if entry["id"] not in ensps:
                ensps.append(entry["id"])
    return ensps


def get_uniprot_id_from_mapping(data, full_entry: bool = False,
                                uniprot_id: str | None = None):
    """UniProt ids (or full entries) from an ``xrefs/id/`` mapping payload
    (parity: proteofav/variants.py:255-287 — a requested ``uniprot_id``
    short-circuits to ITS entry; otherwise SWISSPROT+SPTREMBL rows in
    first-seen order). Dedup quirk replicated exactly (r13 randomized
    differential): the reference's guard is ``primary_id not in
    uniprots`` against the accumulating LIST — in scalar mode that
    dedups by id, but in full-entry mode the list holds dicts, the id
    never matches, and duplicate entries are ALL kept."""
    uniprots: list = []
    for entry in data:
        if "dbname" not in entry or "primary_id" not in entry:
            continue
        if uniprot_id is not None and entry["primary_id"] == uniprot_id:
            return [entry] if full_entry else [entry["primary_id"]]
        if entry["dbname"] in ("Uniprot/SWISSPROT", "Uniprot/SPTREMBL"):
            if entry["primary_id"] not in uniprots:
                uniprots.append(entry if full_entry else entry["primary_id"])
    return uniprots


def get_preferred_uniprot_id_from_mapping(data) -> str | None:
    """Preferred UniProt id from full xrefs/id entries: maximal
    identity+coverage with ``>=`` keeping the LAST tie and the
    shortest-id guard nested INSIDE the score branch (parity:
    proteofav/variants.py:290-319 — the reference's exact loop quirks,
    driver-side over a handful of entries)."""
    best_match = None
    curr_ix = -1
    prev_identity = 0
    prev_coverage = 0
    prev_id = "-" * 100
    for ix, entry in enumerate(data):
        if not all(
            k in entry
            for k in ("ensembl_identity", "xref_identity", "xref_start", "xref_end")
        ):
            continue
        identity = entry["ensembl_identity"] + entry["xref_identity"]
        coverage = entry["xref_end"] - entry["xref_start"]
        if identity + coverage >= prev_identity + prev_coverage:
            prev_identity = identity
            prev_coverage = coverage
            if len(entry["primary_id"]) < len(prev_id):
                prev_id = entry["primary_id"]
                curr_ix = ix
    if curr_ix != -1 and "primary_id" in data[curr_ix]:
        best_match = data[curr_ix]["primary_id"]
    return best_match


def get_preferred_ensembl_id_from_mapping(
    identifiers, uniprot_id: str | None = None, fetch=None
) -> str | None:
    """Preferred Ensembl id: per candidate ENSP, fetch its xrefs/id
    mapping and score identity+coverage with ``>`` keeping the FIRST tie
    (parity: proteofav/variants.py:322-355)."""
    import json as _json

    from proteofav_spark import fetchers

    if fetch is None:
        fetch = fetchers.fetch_from_url_or_retry
    best_match = None
    curr_ix = -1
    prev_identity = 0
    prev_coverage = 0
    for ix, ensp in enumerate(identifiers):
        info = _json.loads(fetch(fetchers.url_ensembl_uniprot_xref(ensp)))
        data = get_uniprot_id_from_mapping(
            info, full_entry=True, uniprot_id=uniprot_id
        )
        for entry in data:
            if not all(
                k in entry
                for k in ("ensembl_identity", "xref_identity",
                          "xref_start", "xref_end")
            ):
                continue
            identity = entry["ensembl_identity"] + entry["xref_identity"]
            coverage = entry["xref_end"] - entry["xref_start"]
            if identity + coverage > prev_identity + prev_coverage:
                prev_identity = identity
                prev_coverage = coverage
                curr_ix = ix
    if curr_ix != -1:
        best_match = identifiers[curr_ix]
    return best_match


def _stage_payload(url: str, path: str, fetch, overwrite: bool) -> str:
    """Driver-side staging of a REST payload to the cache, atomically
    (same os.replace rule as fetchers.Downloader — review r9)."""
    import os
    import tempfile

    if os.path.exists(path) and not overwrite:
        return path
    data = fetch(url)
    if isinstance(data, str):
        data = data.encode()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(path), prefix=os.path.basename(path) + ".part"
    )
    with os.fdopen(fd, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)
    return path


def fetch_variants(
    spark,
    identifier: str,
    id_source: str | None = None,
    synonymous: bool = True,
    uniprot_vars: bool = True,
    ensembl_germline_vars: bool = False,
    ensembl_somatic_vars: bool = False,
    fetch=None,
    overwrite: bool = False,
):
    """Fetch + flatten variants from the UniProt Proteins API and the
    Ensembl REST API → ``(uni, germline, somatic)`` Spark DataFrames
    (None for absent/failed sources). Parity:
    proteofav/variants.py:550-620 — including the cross-resolution of the
    paired id (uniprot→preferred ENSP via species+symbol xrefs;
    ensembl→preferred UniProt via id xrefs) and the ``return None`` on an
    invalid-species mapping (normalized to a 3-tuple here so callers can
    always unpack — the reference's bare ``return None`` makes its own
    select_variants crash on unpacking)."""
    import json as _json
    import os

    from proteofav_spark import fetchers
    from proteofav_spark.config import defaults

    if fetch is None:
        fetch = fetchers.fetch_from_url_or_retry
    supported = ("uniprot", "ensembl")
    if id_source not in supported:
        raise ValueError(
            "The ID source needs to be provided.\n Pass one of '{}'".format(
                "', '".join(supported)
            )
        )
    if id_source == "uniprot":
        uniprot_id = identifier
        species_tab = fetch(fetchers.url_uniprot_species(identifier))
        species = get_ensembl_species_from_uniprot(species_tab)
        try:
            info = _json.loads(
                fetch(fetchers.url_uniprot_ensembl_xref(identifier, species=species))
            )
        except ValueError:
            return None, None, None
        ensps = get_ensembl_protein_id_from_mapping(info)
        ensembl_id = get_preferred_ensembl_id_from_mapping(
            ensps, uniprot_id=identifier, fetch=fetch
        )
    else:
        ensembl_id = identifier
        info = _json.loads(fetch(fetchers.url_ensembl_uniprot_xref(identifier)))
        data = get_uniprot_id_from_mapping(info, full_entry=True)
        uniprot_id = get_preferred_uniprot_id_from_mapping(data)

    uni = germ = som = None
    cache = defaults.db_lake
    if uniprot_id is not None and uniprot_vars:
        try:
            path = _stage_payload(
                fetchers.url_uniprot_variants(uniprot_id),
                os.path.join(cache, f"{uniprot_id}.json"),
                fetch, overwrite,
            )
            uni = flatten_uniprot_variants(
                spark.read.option("multiLine", True).json(path)
            )
        except (OSError, EmptyTableError):
            uni = None
    if ensembl_id is not None:
        for somatic, wanted in ((False, ensembl_germline_vars),
                                (True, ensembl_somatic_vars)):
            if not wanted:
                continue
            tag = "somatic" if somatic else "germline"
            try:
                path = _stage_payload(
                    fetchers.url_ensembl_variants(ensembl_id, somatic=somatic),
                    os.path.join(cache, f"{ensembl_id}_ensembl_{tag}.json"),
                    fetch, overwrite,
                )
                flat = flatten_ensembl_variants(
                    spark.read.option("multiLine", True).json(path),
                    synonymous=synonymous,
                )
            except (OSError, EmptyTableError):
                flat = None
            if somatic:
                som = flat
            else:
                germ = flat
    return uni, germ, som


def select_variants(
    spark,
    identifier: str,
    id_source: str | None = None,
    synonymous: bool = True,
    uniprot_vars: bool = True,
    ensembl_germline_vars: bool = True,
    ensembl_somatic_vars: bool = True,
    fetch=None,
    overwrite: bool = False,
):
    """Aggregate variants: fetch+flatten all three sources, then union the
    two Ensembl sides → ``(uniprot_table, ensembl_table)`` (None where
    absent). Parity: proteofav/variants.py:520-547 — pd.concat becomes
    ``unionByName(allowMissingColumns=True)``."""
    uni, germ, som = fetch_variants(
        spark, identifier, id_source=id_source, synonymous=synonymous,
        uniprot_vars=uniprot_vars,
        ensembl_germline_vars=ensembl_germline_vars,
        ensembl_somatic_vars=ensembl_somatic_vars,
        fetch=fetch, overwrite=overwrite,
    )
    if germ is not None and som is not None:
        ens = germ.unionByName(som, allowMissingColumns=True)
    elif germ is not None:
        ens = germ
    else:
        ens = som
    return uni, ens
