"""JSONL corpus ingestion — the production entry point for LLM training
text (one JSON document per line, typically thousands of .jsonl / .jsonl.gz
dumps). A thin layer over ``spark.read.json`` that encodes the three
pitfalls every 100 TB ingest hits:

1. **Schema inference is a full extra pass.** ``spark.read.json`` with no
   schema SCANS THE ENTIRE INPUT once just to infer types — at corpus
   scale that silently doubles ingest cost. The reader here REQUIRES an
   explicit schema (DDL string or StructType) and refuses to infer.
2. **Malformed lines must quarantine, not kill or vanish.** Web-scale
   dumps always contain truncated/garbage lines. PERMISSIVE mode keeps
   them as a corrupt-record column; :func:`split_corrupt` splits the
   frame into (clean, quarantine) so the pipeline can count/inspect
   rejects instead of either failing the job (FAILFAST) or silently
   dropping rows (DROPMALFORMED — the mode that loses data without a
   trace).
3. **Gzip is not splittable.** A 10 GB ``.jsonl.gz`` file decompresses in
   ONE task; a directory of them gives at most one task per file. The
   reader applies the shared :func:`..queries.fan_out` policy under any
   downstream heavy projection — it repartitions only when the file
   count underfills the cluster, and passes a well-split input through
   untouched.

Doc identity: :func:`with_doc_id` derives a DETERMINISTIC 64-bit id from
the content columns (xxhash64). ``monotonically_increasing_id`` is the
tempting alternative and is wrong for a corpus: it depends on partition
layout, so re-reading the same files with a different split size
renumbers every document and breaks incremental dedup joins.

No reference counterpart (ProteoFAV reads domain formats); extension in
the SURVEY §2.1 sources family, sibling of the parquet lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType,
    multiline: bool = False,
) -> DataFrame:
    """Read a JSONL corpus with an EXPLICIT schema and quarantine-ready
    corrupt handling. Returns the frame with a ``_corrupt`` string
    column: null for clean rows, the raw offending line otherwise —
    feed it to :func:`split_corrupt`.

    The corrupt column is appended to the caller's schema here (Spark
    only populates ``columnNameOfCorruptRecord`` when the read schema
    contains it). ``multiline=False`` (the JSONL contract: one document
    per line) keeps the input line-splittable for uncompressed files."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL}")
    full = schema.add(T.StructField(CORRUPT_COL, T.StringType()))
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multiline)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, materialize: str | None = "cache"
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with ``_corrupt`` dropped, and the
    quarantined raw lines as a one-column frame for counting/inspection.

    Spark DISALLOWS queries against a raw JSON scan whose referenced
    columns reduce to only the corrupt-record column (after column
    pruning, the scan would have nothing to fail on) — so splitting a
    lazy JSON read needs the parse pinned first. ``materialize="cache"``
    (default) does that with ``df.cache()`` — both sides then read the
    one parsed result, which is also what you want operationally (the
    corpus parses ONCE, not once per side). At 100 TB prefer the write-
    through form instead: land the parsed frame in the lake as parquet,
    re-read, and split THAT (parquet scans carry no corrupt-column
    restriction) — pass ``materialize=None`` when the input is already a
    materialized/non-JSON frame."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"frame carries no {CORRUPT_COL} column")
    if materialize == "cache":
        df = df.cache()
    elif materialize is not None:
        raise ValueError(f"unknown materialize mode: {materialize!r}")
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine


def with_doc_id(df: DataFrame, cols: list[str], out: str = "doc_id") -> DataFrame:
    """Deterministic 64-bit document id from the content columns:
    ``xxhash64(concat of cols)`` — stable across reruns, partition
    layouts, and file splits, which partition-dependent
    ``monotonically_increasing_id`` is not. Null-safe (nulls hash as a
    fixed sentinel distinct from empty strings via the separator).
    64-bit collisions are ~p²/2⁶⁵ for p documents — negligible under
    ~10⁸ docs; dedup joins tolerate them as extra candidate checks."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
    return df.withColumn(out, F.xxhash64(F.concat_ws("\x1f", *parts)))


def read_jsonl_documents(
    spark: SparkSession, path: str, fan_out_under_projection: bool = True
) -> DataFrame:
    """The documents-table shape (doc_id, text, lang, source, n_chars)
    from a raw JSONL dump carrying at least ``text`` (lang/source
    optional): quarantine-safe read, deterministic doc ids, and the
    gz-aware fan-out under the n_chars projection. Returns CLEAN rows;
    run :func:`read_jsonl_corpus` + :func:`split_corrupt` directly when
    the reject stream matters."""
    from proteofav_spark.queries import fan_out

    raw = read_jsonl_corpus(
        spark, path, "text string, lang string, source string"
    )
    clean, _ = split_corrupt(raw)
    if fan_out_under_projection:
        clean = fan_out(clean)
    return with_doc_id(clean, ["text", "source"]).select(
        "doc_id", "text", "lang", "source",
        F.length("text").cast("bigint").alias("n_chars"),
    )
