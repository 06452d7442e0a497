"""SIFTS XML reader → canonical per-residue cross-DB mapping table.

Spark-first design: ``spark.read.text(paths, wholetext=True)`` yields one row
per XML file, and an Arrow-batched ``mapInPandas`` parser (stdlib
ElementTree) emits residue rows — so a directory of thousands of SIFTS
entries parses with one task per file and no driver bottleneck. Region
containment is resolved during the same pass (the region list per entity is
tiny), mirroring the reference.

Parity targets:
- parse_sifts_residues          proteofav/sifts.py:141-350
- _parse_sifts_regions_from_file proteofav/sifts.py:64-138
- _parse_sifts_dbs_from_file    proteofav/sifts.py:22-61
- filter_sifts                  proteofav/sifts.py:378-421

Reference semantics reproduced:
- default excluded dbSources: InterPro, GO, EC, NCBI (sifts.py:202-203)
- only PDB/UniProt keep dbResNum/dbResName/dbChainId; other sources keep
  only dbAccessionId (sifts.py:259-264)
- repeated values per residue de-dup; multiple distinct values collapse to a
  ','-joined string (the reference keeps Python lists in object cells)
- residueDetail properties → PDB_codeSecondaryStructure /
  PDB_nameSecondaryStructure / PDB_Annotation (default 'Observed')
- region enrichment: {src}_regionId ('-' when absent), {src}_regionStart/End
  (0 when absent), {src}_regionResNum
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections import OrderedDict
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from proteofav_spark.core import EmptyTableError, exclude_columns, row_selector

DEFAULT_EXCLUDED_SOURCES = ("InterPro", "GO", "EC", "NCBI")
REGION_SOURCES = ("PDB", "UniProt", "CATH", "SCOP", "Pfam")

_STR_COLS = [
    "PDB_dbAccessionId", "PDB_dbResNum", "PDB_dbResName", "PDB_dbChainId",
    "UniProt_dbAccessionId", "UniProt_dbResNum", "UniProt_dbResName",
    "CATH_dbAccessionId", "SCOP_dbAccessionId", "Pfam_dbAccessionId",
    "PDB_entityId", "PDB_Annotation",
    "PDB_codeSecondaryStructure", "PDB_nameSecondaryStructure",
]


def sifts_schema() -> T.StructType:
    fields = [T.StructField(c, T.StringType()) for c in _STR_COLS]
    for src in REGION_SOURCES:
        fields.append(T.StructField(f"{src}_regionId", T.StringType()))
        fields.append(T.StructField(f"{src}_regionStart", T.LongType()))
        fields.append(T.StructField(f"{src}_regionEnd", T.LongType()))
        fields.append(T.StructField(f"{src}_regionResNum", T.StringType()))
        fields.append(T.StructField(f"{src}_dbVersion", T.StringType()))
    fields.append(T.StructField("line_no", T.LongType()))
    fields.append(T.StructField("source_file", T.StringType()))
    return T.StructType(fields)


def _local_name(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_regions(root) -> dict:
    """entity_id → source → ordinal(str) → {acc, start, end}."""
    out: dict = {}
    for entity in root.iter():
        if _local_name(entity.tag) != "entity" or entity.get("type") != "protein":
            continue
        entity_id = entity.get("entityId")
        per_source: dict = OrderedDict()
        for region in entity.iter():
            if _local_name(region.tag) != "mapRegion":
                continue
            start = region.get("start")
            end = region.get("end")
            for db in region.iter():
                if _local_name(db.tag) != "db":
                    continue
                source = db.get("dbSource")
                if source is None:
                    continue
                slot = per_source.setdefault(source, OrderedDict())
                slot[str(len(slot) + 1)] = {
                    "acc": db.get("dbAccessionId"),
                    "start": int(start) if start else 0,
                    "end": int(end) if end else 0,
                }
        out[entity_id] = per_source
    return out


def _parse_dbs(root) -> dict:
    """listDB versions per dbSource (parity: _parse_sifts_dbs_from_file
    proteofav/sifts.py:22-61). Only ``<db>`` children of ``<listDB>``
    count — region-level ``<db>`` elements elsewhere in the document carry
    mapping-specific versions, not the source's global one."""
    out: dict = {}
    for el in root.iter():
        if _local_name(el.tag) != "listDB":
            continue
        for child in el:
            if (
                _local_name(child.tag) == "db"
                and child.get("dbSource")
                and child.get("dbVersion") is not None
            ):
                out.setdefault(child.get("dbSource"), child.get("dbVersion"))
    return out


def parse_sifts_xml(
    xml_text: str,
    source_file: str,
    excluded_sources: tuple[str, ...] = DEFAULT_EXCLUDED_SOURCES,
    add_regions: bool = True,
    add_dbs: bool = False,
) -> list[dict]:
    """Pure-Python single-document parser (runs inside executor tasks)."""
    root = ET.fromstring(xml_text)
    regions = _parse_regions(root) if add_regions else {}
    dbs = _parse_dbs(root) if add_dbs else {}
    rows: list[dict] = []
    line_no = 0
    for entity in root.iter():
        if _local_name(entity.tag) != "entity" or entity.get("type") != "protein":
            continue
        entity_id = entity.get("entityId")
        ent_regions = regions.get(entity_id, {})
        for residue in entity.iter():
            if _local_name(residue.tag) != "residue":
                continue
            resnum_s = residue.get("dbResNum")
            try:
                resnum = int(resnum_s)
            except (TypeError, ValueError):
                resnum = None
            # cells hold scalar-or-list, exactly like the reference's
            # OrderedDict accumulator (sifts.py:268-324)
            rec: dict = {}

            def ref_add(key: str, val) -> None:
                # the reference's try/except add (sifts.py:296-310):
                # - absent key → scalar set (KeyError branch)
                # - scalar cell: `v in cell` is SUBSTRING containment
                #   ('A' after 'VAL' silently dropped); a non-contained
                #   value grows a 2-list (AttributeError branch) — except
                #   PDB_Annotation, which is overwritten scalar-to-scalar
                # - list cell: exact membership; append (or overwrite for
                #   PDB_Annotation)
                # - None on either side of `in` → TypeError branch →
                #   overwrite with val
                if key not in rec:
                    rec[key] = val
                    return
                cur = rec[key]
                if isinstance(cur, list):
                    if val in cur:
                        return
                    if key != "PDB_Annotation":
                        cur.append(val)
                    else:
                        rec[key] = val
                    return
                try:
                    contained = val in cur
                except TypeError:
                    rec[key] = val
                    return
                if contained:
                    return
                if key != "PDB_Annotation":
                    rec[key] = [cur, val]
                else:
                    rec[key] = val

            for child in residue:
                tag = _local_name(child.tag)
                if tag == "crossRefDb":
                    source = child.get("dbSource")
                    if source in excluded_sources:
                        # the reference leaves the raw attrib names
                        # un-prefixed for excluded sources, and none contain
                        # '_', so no cell is ever added — but the
                        # per-annotation defaults below still fire
                        source = None
                    for k, v in (
                        child.attrib.items() if source is not None else ()
                    ):
                        if k in ("dbSource", "dbCoordSys"):
                            continue
                        if source not in ("PDB", "UniProt") and k in (
                            "dbResName", "dbResNum", "dbChainId"
                        ):
                            continue
                        # the reference stamps dbVersion on EVERY surviving
                        # attrib iteration, not just dbAccessionId
                        # (sifts.py:286-291)
                        if add_dbs and source in dbs:
                            rec[f"{source}_dbVersion"] = dbs[source]
                        if k == "dbAccessionId" and add_regions and resnum is not None:
                            src_regions = ent_regions.get(source, {})
                            # no break: the reference scans every region and
                            # the LAST containing match wins (sifts.py:266-284)
                            for ordinal, entry in src_regions.items():
                                if entry["acc"] == v and entry["start"] <= resnum <= entry["end"]:
                                    rec[f"{source}_regionId"] = ordinal
                                    rec[f"{source}_regionStart"] = entry["start"]
                                    rec[f"{source}_regionEnd"] = entry["end"]
                                    rec[f"{source}_regionResNum"] = resnum_s
                        ref_add(f"{source}_{k}", v)
                elif tag == "residueDetail":
                    if "PDB" not in excluded_sources:
                        prop = child.get("property")
                        if prop:
                            # the reference re-derives (k, v) once per raw
                            # attrib (dbSource, property) and feeds BOTH
                            # through the generic add — the second is a
                            # self-dedup no-op, so one ref_add suffices
                            ref_add(f"PDB_{prop}", child.text)
                # per-annotation defaults (sifts.py:312-319): they fire after
                # each child, so a residue with ZERO children gets NEITHER —
                # its row is entirely empty
                if "PDB" not in excluded_sources and "PDB_Annotation" not in rec:
                    rec["PDB_Annotation"] = "Observed"
                if "PDB_entityId" not in rec:
                    rec["PDB_entityId"] = entity_id
            for k, vals in list(rec.items()):
                if isinstance(vals, list):
                    rec[k] = ",".join(str(x) for x in vals)
            rec["line_no"] = line_no
            rec["source_file"] = source_file
            line_no += 1
            rows.append(rec)
    return rows


def parse_sifts_residues(
    spark: SparkSession,
    path: str,
    excluded_sources: tuple[str, ...] = DEFAULT_EXCLUDED_SOURCES,
    add_regions: bool = True,
    add_dbs: bool = False,
    excluded_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Distributed SIFTS scan: one executor task per XML file; ``path`` may
    be a single file, directory, or glob."""
    schema = sifts_schema()
    names = schema.fieldNames()

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for xml_text, fname in zip(pdf["value"], pdf["source_file"]):
                out.extend(
                    parse_sifts_xml(
                        xml_text, fname,
                        excluded_sources=excluded_sources,
                        add_regions=add_regions,
                        add_dbs=add_dbs,
                    )
                )
            frame = pd.DataFrame(out)
            for c in names:
                if c not in frame.columns:
                    frame[c] = None
            yield frame[names]

    files = spark.read.text(path, wholetext=True).withColumn(
        "source_file", F.input_file_name()
    )
    table = files.mapInPandas(parse_batch, schema=schema)

    # region fill conventions (sifts.py:333-338)
    for src in REGION_SOURCES:
        table = table.withColumn(
            f"{src}_regionId", F.coalesce(F.col(f"{src}_regionId"), F.lit("-"))
        )
        for suffix in ("regionStart", "regionEnd"):
            table = table.withColumn(
                f"{src}_{suffix}", F.coalesce(F.col(f"{src}_{suffix}"), F.lit(0))
            )
    table = exclude_columns(table, excluded_cols)
    # reference contract (sifts.py:346-348): an empty parse raises. The
    # reference's frame is built from per-residue dicts, so "empty" also
    # covers the zero-COLUMN case — every residue childless, every payload
    # cell absent (pd.DataFrame([{}, {}]).empty is True)
    payload = [
        F.col(c).isNotNull()
        for c in table.columns
        if c not in ("line_no", "source_file")
        and not c.endswith(("_regionId", "_regionStart", "_regionEnd"))
    ]
    has_payload = payload[0]
    for expr in payload[1:]:
        has_payload = has_payload | expr
    if table.filter(has_payload).isEmpty():
        raise EmptyTableError(
            f"SIFTS file {path} resulted in an empty DataFrame"
        )
    return table


def filter_sifts(
    table: DataFrame,
    excluded_cols: tuple[str, ...] | None = None,
    chains: tuple[str, ...] | None = None,
    chain_auth: tuple[str, ...] | None = None,
    res: tuple[str, ...] | None = None,
    uniprot: tuple[str, ...] | None = None,
    site: tuple[str, ...] | None = None,
    check_empty: bool = True,
) -> DataFrame:
    """Parity: filter_sifts proteofav/sifts.py:378-421."""
    table = exclude_columns(table, excluded_cols)
    for key, vals in (
        ("PDB_entityId", chains),
        ("PDB_dbChainId", chain_auth),
        ("PDB_dbResNum", res),
        ("UniProt_dbAccessionId", uniprot),
        ("UniProt_dbResNum", site),
    ):
        if vals is not None:
            table = row_selector(table, key, vals, check_empty=False)
    if check_empty and table.isEmpty():
        raise EmptyTableError("SIFTS filters produced an empty table")
    return table


def select_sifts(
    spark: SparkSession,
    path: str,
    excluded_sources: tuple[str, ...] = DEFAULT_EXCLUDED_SOURCES,
    add_regions: bool = True,
    add_dbs: bool = False,
    **filter_kwargs,
) -> DataFrame:
    """read → parse → filter (parity: select_sifts proteofav/sifts.py:353-375)."""
    table = parse_sifts_residues(
        spark, path, excluded_sources=excluded_sources, add_regions=add_regions,
        add_dbs=add_dbs,
    )
    return filter_sifts(table, **filter_kwargs)
