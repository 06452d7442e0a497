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
    return (
        spark.read.schema(corrupt_augmented_schema(schema))
        .options(**jsonl_read_options(multiline))
        .json(path)
    )


def corrupt_augmented_schema(schema: str | T.StructType) -> T.StructType:
    """The caller's schema plus the ``_corrupt`` capture column — shared
    by the batch and streaming readers so the corrupt-record contract
    lives in one place. Copies the StructType (``StructType.add``
    mutates in place, and the schema object belongs to the caller)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL}")
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def jsonl_read_options(multiline: bool = False) -> dict:
    """Reader options shared by the batch and streaming JSONL readers."""
    return {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        "multiLine": str(multiline).lower(),
    }


def split_corrupt(
    df: DataFrame, materialize: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with ``_corrupt`` dropped, and the
    quarantined raw lines as a one-column frame for counting/inspection.

    Spark DISALLOWS queries against a raw JSON scan whose referenced
    columns prune down to only the corrupt-record column (the scan would
    have nothing to fail on) — and column pruning gets there easily:
    ``clean.count()`` discards every output column, leaving just the
    ``_corrupt IS NULL`` filter. Both filters therefore carry an
    always-true KEEP-ALIVE conjunct on the first data column
    (``length(coalesce(cast(c as string), '')) >= 0`` — no Catalyst rule
    folds it), so the scan always references real data and stays lazy
    with NO caching. ``materialize="cache"`` remains available as an
    optimization when BOTH sides are consumed and the parse should run
    once (fits-in-storage corpora); at 100 TB prefer write-through:
    land the parsed frame as parquet and split the re-read (parquet
    scans carry no corrupt-column restriction)."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"frame carries no {CORRUPT_COL} column")
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    if not data_cols:
        raise ValueError("frame carries only the corrupt column")
    if materialize == "cache":
        df = df.cache()
    elif materialize is not None:
        raise ValueError(f"unknown materialize mode: {materialize!r}")
    keep_alive = (
        F.length(F.coalesce(F.col(data_cols[0]).cast("string"), F.lit("")))
        >= 0
    )
    clean = df.where(F.col(CORRUPT_COL).isNull() & keep_alive).drop(
        CORRUPT_COL
    )
    quarantine = df.where(F.col(CORRUPT_COL).isNotNull() & keep_alive).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine


def with_doc_id(df: DataFrame, cols: list[str], out: str = "doc_id") -> DataFrame:
    """Deterministic 64-bit document id from the content columns —
    stable across reruns, partition layouts, and file splits, which
    partition-dependent ``monotonically_increasing_id`` is not.

    The hashed serialization is UNAMBIGUOUS length-prefix framing:
    each column contributes ``v<len>:<value>`` (or ``n`` for null), so
    no choice of values — embedded separators, empty vs null, values
    shifted between adjacent columns — can make distinct rows collide
    deterministically. (Neither naive form survives adversarial
    content: ``concat_ws(sep, ...)`` collides on values containing the
    separator, and multi-arg ``xxhash64(a, b)`` collides on null
    position because a null input leaves Spark's hash accumulator
    unchanged.) Residual collisions are the random ~p²/2⁶⁵ for p
    documents — negligible under ~10⁸ docs; dedup joins tolerate them
    as extra candidate checks."""
    if not cols:
        raise ValueError(
            "with_doc_id needs at least one content column — an empty "
            "list would give every document the same id"
        )
    parts = []
    for c in cols:
        v = F.col(c).cast("string")
        parts.append(
            F.when(v.isNull(), F.lit("n")).otherwise(
                F.concat(F.lit("v"), F.length(v).cast("string"), F.lit(":"), v)
            )
        )
    return df.withColumn(out, F.xxhash64(F.concat(*parts)))


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
    # lazy split (keep-alive conjunct handles the corrupt-column-only
    # restriction): caching a corpus-scale parse here would pin it in
    # executor storage for the whole session with no consumer for the
    # quarantine side
    clean, _ = split_corrupt(raw)
    if fan_out_under_projection:
        clean = fan_out(clean)
    return documents_projection(clean)


DOCUMENTS_SCHEMA = "text string, lang string, source string"


def documents_projection(
    clean: DataFrame, id_cols: list[str] | None = None
) -> DataFrame:
    """The documents-table shape (doc_id, text, lang, source, n_chars)
    from clean (text, lang, source) rows — shared by the batch reader
    and the streaming ingest so the stored schema cannot drift between
    them. ``id_cols`` picks the identity: the batch READER defaults to
    full-row identity (text, lang, source — two differently-labeled
    copies of one text are two rows, and the id must distinguish them);
    the dedup-store INGEST passes ["text"] because the store's identity
    IS content identity (``dedup_store_merger`` keys on sha2(text), so
    the id must agree with what the store collapses)."""
    return with_doc_id(
        clean, id_cols if id_cols is not None else ["text", "lang", "source"]
    ).select(
        "doc_id", "text", "lang", "source",
        F.length("text").cast("bigint").alias("n_chars"),
    )
