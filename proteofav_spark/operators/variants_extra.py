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
    """
    hits = raw.select(F.explode("hits").alias("hit"))
    tr = hits.select(
        F.col("hit.id").alias("id"),
        F.col("hit.mutation").alias("mutation"),
        F.col("hit.affectedDonorCountTotal").alias("affectedDonorCountTotal"),
        F.explode("hit.transcripts").alias("transcript"),
    )
    tr = tr.filter(F.col("transcript.id") == identifier).drop("id")
    flat = flatten_structs(tr)
    renames = {
        c: c.replace("transcript_", "", 1)
        for c in flat.columns
        if c.startswith("transcript_")
    }
    for old, new in renames.items():
        # consequence fields joined with suffix in the reference
        target = new if new not in flat.columns else f"{new}_protein"
        flat = flat.withColumnRenamed(old, target)
    if "consequence_aaMutation" in flat.columns:
        flat = flat.withColumnRenamed("consequence_aaMutation", "aaMutation")
    if "aaMutation" in flat.columns:
        flat = (
            flat.withColumn("ref", F.regexp_extract("aaMutation", AA_MUTATION_RE, 1))
            .withColumn("position", F.regexp_extract("aaMutation", AA_MUTATION_RE, 2))
            .withColumn("new", F.regexp_extract("aaMutation", AA_MUTATION_RE, 3))
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
