"""The canonical Parquet lake: bulk ingest of many structure files and the
partitioning/bucketing layout that keeps 100 TB queryable.

Layout rules:
- every source table lands as Parquet partitioned by ``entry_id`` (the
  structure / protein accession) so per-protein pipelines prune to one
  partition and the enrichment joins co-locate;
- dimension-like tables (SIFTS mapping, annotation) are additionally
  bucketable by their join key (``saveAsTable`` + ``bucketBy``) so the
  atom⟕sifts join is shuffle-free on a cluster;
- the interactive readers (sources/*) parse one file per call; the bulk
  path here parses *many* files in one job — one task per file via
  wholetext + Arrow batches, emitting a single canonical-schema DataFrame.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from proteofav_spark.library import PDBX_TYPES

_SPARK_T = {"string": T.StringType(), "bigint": T.LongType(), "double": T.DoubleType()}


def atoms_canonical_schema() -> T.StructType:
    fields = [T.StructField(c, _SPARK_T[t]) for c, t in PDBX_TYPES.items()]
    fields += [
        T.StructField("line_no", T.LongType()),
        T.StructField("source_file", T.StringType()),
        T.StructField("entry_id", T.StringType()),
    ]
    return T.StructType(fields)


def _parse_mmcif_text(text: str, fname: str) -> list[dict]:
    """Single-document mmCIF _atom_site parse (executor-side, one file per
    row of the wholetext scan). Same record semantics as
    sources/structures.parse_mmcif_atoms — including the SAME quote-aware
    tokenizer (review r9: this bulk path was still a bare ``str.split()``,
    so a quoted atom name like \"C1'\" split into extra fields and shifted
    every later column — the exact bug the interactive parser fixed in
    r8; both paths now share ``cif_split_py``)."""
    from proteofav_spark.sources.structures import cif_split_py

    header: list[str] = []
    rows: list[dict] = []
    entry_id = re.sub(r"\.(cif|mmcif)(\.gz)?$", "", os.path.basename(fname))
    line_no = 0
    for raw in text.splitlines():
        if raw.startswith("_atom_site."):
            header.append(raw.split(".", 1)[1].strip())
        elif raw.startswith(("ATOM", "HETATM")):
            toks = cif_split_py(raw)
            rec = dict(zip(header, toks))
            rec["line_no"] = line_no
            rec["source_file"] = fname
            rec["entry_id"] = entry_id
            rows.append(rec)
        line_no += 1
    return rows


def parse_mmcif_atoms_many(spark: SparkSession, path: str) -> DataFrame:
    """Bulk mmCIF ingest: ``path`` is a directory/glob of .cif files; one
    executor task per file; output is one DataFrame in the canonical atom
    schema with ``entry_id`` for partitioning. This is the 100 TB ingest
    path — per-file schema drift is absorbed into the canonical column set
    (missing → null, extras dropped)."""
    schema = atoms_canonical_schema()
    names = schema.fieldNames()
    numeric = {c: t for c, t in PDBX_TYPES.items() if t != "string"}

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for text, fname in zip(pdf["value"], pdf["source_file"]):
                out.extend(_parse_mmcif_text(text, fname))
            frame = pd.DataFrame(out)
            for c in names:
                if c not in frame.columns:
                    frame[c] = None
            for c, t in numeric.items():
                frame[c] = pd.to_numeric(frame[c], errors="coerce")
                if t == "bigint":
                    frame[c] = frame[c].astype("Int64")
            yield frame[names]

    files = spark.read.text(path, wholetext=True).withColumn(
        "source_file", F.input_file_name()
    )
    return files.mapInPandas(parse_batch, schema=schema)


def entry_id_col(source_col: str = "source_file") -> "F.Column":
    """``entry_id`` derived from a reader's ``source_file`` column:
    basename minus the format extension (and the validation report's
    ``_validation`` suffix) — the same derivation the bulk mmCIF ingest
    applies executor-side, exposed as a JVM Column expression so EVERY
    per-source reader output (they all glob + carry ``source_file``)
    can stage into the entry-partitioned lake and feed
    ``..mergers.lake_table_merger`` with consistent scope keys."""
    base = F.element_at(F.split(F.col(source_col), "/"), -1)
    return F.regexp_replace(
        base,
        r"(_validation)?\.(cif|mmcif|pdb|ent|dssp|xml|gff)(\.gz)?$",
        "",
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ("entry_id",)
) -> None:
    """Land a canonical table partitioned by entry id — partition pruning
    makes per-protein reads O(1 partition) regardless of lake size."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Persist as a bucketed managed table: joins/aggregations on the
    bucket key skip the exchange entirely (co-located join at any scale)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name, format="parquet")


def read_lake(spark: SparkSession, path: str, entry_id: str | None = None) -> DataFrame:
    """Read the lake; passing ``entry_id`` prunes to one partition."""
    df = spark.read.parquet(path)
    if entry_id is not None:
        df = df.filter(F.col("entry_id") == entry_id)
    return df


def lake_file_stats(spark: SparkSession, path: str) -> dict:
    """Small-file diagnostics for a parquet lake path: file count, total
    bytes, and mean file size — the inputs to a compaction decision.
    Driver-side filesystem walk (metadata only, no data read)."""
    total = 0
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") or (
                f.startswith("part-") and not f.endswith(".crc")
            ):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return {
        "n_files": n,
        "total_bytes": total,
        "mean_bytes": (total // n) if n else 0,
    }


def compact_lake(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: tuple[str, ...] = (),
) -> dict:
    """Compact a small-file parquet path: rewrite with the file count
    sized so each output file approaches ``target_file_bytes`` (the
    maintenance job every streaming/incremental lake needs — thousands
    of KB-size files turn task scheduling and footer reads into the
    bottleneck long before data volume does).

    The rewrite goes through a temp location and swaps in via two
    renames. Data is never lost: a crash before the swap leaves the
    original untouched; a crash between the renames leaves the full
    original at ``<path>__old`` (restore = one rename). The function
    self-heals on entry — a stale ``__compacting`` dir from a crashed
    write is removed, and a stale ``__old`` with no live ``path`` (crash
    mid-swap) is renamed back before compacting. Returns before/after
    file stats. Partition columns are preserved when given; compaction
    then keys the repartition on them so each partition's files merge
    without cross-partition shuffling of unrelated rows."""
    import shutil

    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__old"
    # recover from a previous crashed run
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)       # crash after swap, before cleanup
        else:
            os.rename(old, path)     # crash mid-swap: restore original

    before = lake_file_stats(spark, path)
    n_out = max(1, -(-before["total_bytes"] // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    writer = df.repartition(n_out, *partition_cols) if partition_cols else (
        df.repartition(n_out)
    )
    w = writer.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = lake_file_stats(spark, path)
    return {"before": before, "after": after, "n_target_files": n_out}


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering for multi-dimensional file skipping
# ---------------------------------------------------------------------------

ZORDER_BITS = 16  # per-dimension quantization (2^16 cells per axis)


def morton_col(
    cols: tuple[str, ...],
    mins: dict[str, float],
    maxs: dict[str, float],
    bits: int = ZORDER_BITS,
) -> "F.Column":
    """Morton (Z-order) key: each column is affinely quantized to a
    ``bits``-bit integer over its [min, max] domain, then the bit
    patterns are interleaved so that points close in ALL dimensions get
    close keys. Pure JVM integer expressions — shifts and masks inside
    whole-stage codegen, no UDF.

    ``len(cols) * bits`` must fit in the 63 value bits of a signed long:
    shifting into bit 63 flips the sign (range ordering inverts at the
    top of the curve) and JVM shifts wrap mod 64 (key collisions), so
    the per-dimension width is auto-reduced to ``63 // len(cols)`` when
    the requested ``bits`` would overflow — e.g. 5 columns at the
    default 16 bits quantize at 12 bits each instead."""
    if len(cols) * bits > 63:
        bits = 63 // len(cols)
        if bits < 1:
            raise ValueError(
                f"morton_col: {len(cols)} dimensions cannot share a 63-bit key"
            )
    quantized = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = float(mins[c]), float(maxs[c])
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit(top).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor((F.col(c).cast("double") - lo) / span * top).cast("long"),
            ),
        )
        quantized.append(q)
    key = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for j, q in enumerate(quantized):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    n_files: int = 16,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as Parquet clustered on the Z-order curve of ``cols``:
    range-partition by the Morton key (equal-size files along the curve)
    and sort within partitions, so every file covers a small hyper-
    rectangle of the key space and its footer min/max statistics prune
    multi-dimensional predicates — the same layout trick as
    ``OPTIMIZE ... ZORDER BY`` in lakehouse table formats, from scratch.

    A single-column sort bounds only that column's per-file range; the
    secondary dimension spans its whole domain in every file, so
    predicates on it skip nothing. Z-order bounds ALL participating
    dimensions at once (tests/test_lake.py pins this on real footer
    stats via pyarrow). Domain bounds come from one bounded min/max
    aggregation — the same driver-scalar contract as the quantizer
    calibrations; at 100 TB the range partitioner's sampling already
    balances file sizes along the curve."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    mins = {c: bounds[f"lo_{c}"] for c in cols}
    maxs = {c: bounds[f"hi_{c}"] for c in cols}
    keyed = df.withColumn("__z", morton_col(cols, mins, maxs, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
