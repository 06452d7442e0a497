"""Variant-table enrichment operators: annotation regex extraction, ICGC
payload flattening, preferred-mapping argmax.

Parity targets:
- parse_uniprot_variants                 proteofav/variants.py:718-744
- _fetch_icgc_variants (flatten part)    proteofav/variants.py:887-917
- get_preferred_uniprot_id_from_mapping  proteofav/variants.py:290-319
- get_preferred_ensembl_id_from_mapping  proteofav/variants.py:322-355
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from proteofav_spark.sources.variants import flatten_structs

# regex groups mirrored from the reference (variants.py:728-731, :894)
DISEASE_RE = r"In ([a-zA-Z0-9_ ]+)[.;]"
TRANSITION_RE = r"([A-Z]+)->([A-Z]+)"
IDS_RE = r"\(([a-zA-Z0-9_]+)\)"
AA_MUTATION_RE = r"([A-Z])([0-9]+)([A-Z\*])?"


def parse_uniprot_variants(annotation_agg: DataFrame) -> DataFrame:
    """From the per-residue aggregated 'Natural variant' annotation table:
    extract disease names, residue transitions and variant ids as arrays
    (regexp_extract_all — the reference's str.findall)."""
    return annotation_agg.select(
        "site",
        "accession",
        F.regexp_extract_all("annotation", F.lit(DISEASE_RE), 1).alias("disease"),
        F.regexp_extract_all("annotation", F.lit(TRANSITION_RE), 0).alias("transition"),
        F.regexp_extract_all("annotation", F.lit(IDS_RE), 1).alias("ids"),
    )


def flatten_icgc_variants(raw: DataFrame, identifier: str) -> DataFrame:
    """ICGC protein-endpoint payload → one row per transcript consequence
    with the aaMutation transition split out.

    Input: ``spark.read.json`` of the payload (column ``hits`` =
    array<struct{id, mutation, affectedDonorCountTotal, transcripts}>).
    The reference json_normalizes + index-joins (variants.py:900-915);
    here it is two explodes and a struct flatten, all lazy.

    Exact reference column contract (r13 differential against the live
    `_fetch_icgc_variants`, json_normalize restored to its
    dict-cell-preserving ``max_level=0`` era behavior): ``id`` is the
    HIT (mutation) id — the transcript id, constant == ``identifier``
    after the filter, is DROPPED; the json_normalize meta columns keep
    their underscore prefix (``_mutation``,
    ``_affectedDonorCountTotal``); consequence fields expand UNPREFIXED,
    with ``_protein`` suffixed only on collision with a transcript-level
    column (``consequence.apply(pd.Series)`` + ``join(rsuffix=
    '_protein')``); unmatched transition groups are NULL (pandas
    str.extract NaN), never empty strings."""
    hits = raw.select(F.explode("hits").alias("hit"))
    tr = hits.select(
        F.col("hit.id").alias("id"),
        F.col("hit.mutation").alias("_mutation"),
        F.col("hit.affectedDonorCountTotal").alias("_affectedDonorCountTotal"),
        F.explode("hit.transcripts").alias("transcript"),
    )
    tr = tr.filter(F.col("transcript.id") == identifier)
    # transcript-level fields, minus the (constant) transcript id and the
    # consequence struct expanded separately below
    t_fields = [
        f.name
        for f in tr.schema["transcript"].dataType.fields
        if f.name not in ("id", "consequence")
    ]
    has_consequence = any(
        f.name == "consequence" for f in tr.schema["transcript"].dataType.fields
    )
    cols = [
        F.col(f"transcript.`{f}`").alias(f) for f in t_fields
    ] + [F.col("id"), F.col("_mutation"), F.col("_affectedDonorCountTotal")]
    flat = tr.select(*cols, *(
        [F.col("transcript.consequence").alias("__conseq")]
        if has_consequence
        else []
    ))
    if has_consequence:
        taken = set(t_fields) | {"id", "_mutation", "_affectedDonorCountTotal"}
        for f in flat.schema["__conseq"].dataType.fields:
            target = f.name if f.name not in taken else f"{f.name}_protein"
            flat = flat.withColumn(target, F.col(f"__conseq.`{f.name}`"))
        flat = flat.drop("__conseq")
    if "aaMutation" in flat.columns:
        for i, part in enumerate(("ref", "position", "new"), start=1):
            flat = flat.withColumn(
                part,
                F.nullif(
                    F.regexp_extract("aaMutation", AA_MUTATION_RE, i), F.lit("")
                ),
            )
    return flat


def preferred_mapping(
    mappings: DataFrame,
    id_col: str,
    identity_col: str = "identity",
    coverage_col: str = "coverage",
) -> DataFrame:
    """Pick the mapping entry maximizing identity+coverage, tie-broken by
    the shortest id and then by a deterministic total order (greatest
    id) — one ``max_by`` aggregation. Parity note
    (proteofav/variants.py:290-355): the reference's loop is
    INPUT-ORDER-dependent on exact score ties (``>=`` keeps the last
    seen; the length guard keeps the shortest), which has no stable
    distributed meaning — this operator keeps the reference's
    score-then-shortest preference and replaces the loop's
    order-dependent residue with an explicit total order (review r9
    docfix: the docstring previously claimed smallest-id, contradicting
    the implementation)."""
    score = F.col(identity_col) + F.col(coverage_col)
    return mappings.agg(
        F.max_by(
            F.col(id_col),
            F.struct(
                score.alias("s"),
                (-F.length(F.col(id_col))).alias("l"),
                # final tie-break: any total order works; greatest id wins
                F.col(id_col).alias("id"),
            ),
        ).alias("preferred_id")
    )
