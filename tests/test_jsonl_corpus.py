"""JSONL corpus ingestion: explicit-schema reads, corrupt-line
quarantine (counted, not dropped or fatal), deterministic doc ids
across partition layouts, and gzip single-file handling."""

import gzip
import json

import pytest
from pyspark.sql import functions as F

from proteofav_spark.sources.corpus import (
    CORRUPT_COL,
    read_jsonl_corpus,
    read_jsonl_documents,
    split_corrupt,
    with_doc_id,
)

DOCS = [
    {"text": "alpha beta gamma", "lang": "en", "source": "web"},
    {"text": "uno dos tres", "lang": "es", "source": "web"},
    {"text": "one two three four", "lang": "en", "source": "books"},
]
BAD_LINES = ['{"text": "truncated', "not json at all"]


def _write_jsonl(p, docs, bad=(), gz=False):
    lines = [json.dumps(d) for d in docs] + list(bad)
    data = ("\n".join(lines) + "\n").encode()
    if gz:
        p.write_bytes(gzip.compress(data))
    else:
        p.write_bytes(data)


def test_quarantine_splits_corrupt_lines(spark, tmp_path):
    src = tmp_path / "corpus.jsonl"
    _write_jsonl(src, DOCS, bad=BAD_LINES)
    df = read_jsonl_corpus(
        spark, str(src), "text string, lang string, source string"
    )
    clean, quarantine = split_corrupt(df)
    assert clean.count() == len(DOCS)
    assert CORRUPT_COL not in clean.columns
    rejects = sorted(r["raw_line"] for r in quarantine.collect())
    assert rejects == sorted(BAD_LINES)


def test_schema_is_mandatory_and_corrupt_name_reserved(spark, tmp_path):
    src = tmp_path / "c.jsonl"
    _write_jsonl(src, DOCS)
    with pytest.raises(TypeError):
        read_jsonl_corpus(spark, str(src))  # no schema: refuse to infer
    with pytest.raises(ValueError, match=CORRUPT_COL):
        read_jsonl_corpus(spark, str(src), f"text string, {CORRUPT_COL} string")


def test_doc_ids_are_stable_across_partition_layouts(spark, tmp_path):
    """The id must be a pure content function: reading the same corpus
    as one file or as three files yields identical (doc_id, text)."""
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir(), many.mkdir()
    _write_jsonl(one / "all.jsonl", DOCS)
    for i, d in enumerate(DOCS):
        _write_jsonl(many / f"part{i}.jsonl", [d])
    a = {
        (r["doc_id"], r["text"])
        for r in read_jsonl_documents(spark, str(one)).collect()
    }
    b = {
        (r["doc_id"], r["text"])
        for r in read_jsonl_documents(spark, str(many)).collect()
    }
    assert a == b and len(a) == len(DOCS)


def test_with_doc_id_framing_defeats_boundary_ambiguity(spark):
    """Length-prefix framing: no placement of separators, nulls, or
    value boundaries may make distinct rows share a doc_id — the
    failure modes of concat_ws (embedded separators) and multi-arg
    xxhash64 (null position leaves the accumulator unchanged)."""
    rows = [
        ("a", None),        # null vs empty
        ("a", ""),
        ("a\x1f", "b"),     # boundary shift around a control char
        ("a", "\x1fb"),
        (None, "a"),        # null position swap
        ("a", None),        # (dup of row 0 — must match row 0 exactly)
        ("v1:x", ""),       # value that looks like the framing itself
        ("", "v1:x"),
    ]
    df = spark.createDataFrame(rows, "text string, source string")
    ids = [r["doc_id"] for r in with_doc_id(df, ["text", "source"]).collect()]
    assert ids[0] == ids[5]  # identical content -> identical id
    distinct_rows = [ids[i] for i in (0, 1, 2, 3, 4, 6, 7)]
    assert len(set(distinct_rows)) == len(distinct_rows), ids


def test_with_doc_id_rejects_empty_cols(spark):
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(ValueError, match="at least one"):
        with_doc_id(df, [])


def test_reader_does_not_mutate_caller_schema(spark, tmp_path):
    from pyspark.sql import types as T

    src = tmp_path / "c.jsonl"
    _write_jsonl(src, DOCS)
    schema = T.StructType([T.StructField("text", T.StringType())])
    read_jsonl_corpus(spark, str(src), schema)
    assert schema.fieldNames() == ["text"]  # StructType.add mutates; we copy
    read_jsonl_corpus(spark, str(src), schema)  # second use must not raise


def test_lang_participates_in_doc_identity(spark, tmp_path):
    """Same text+source under two langs are two documents — doc_id is
    the downstream per-document key and must not conflate them."""
    src = tmp_path / "c.jsonl"
    _write_jsonl(
        src,
        [
            {"text": "t", "lang": "en", "source": "web"},
            {"text": "t", "lang": "fr", "source": "web"},
        ],
    )
    ids = {r["doc_id"] for r in read_jsonl_documents(spark, str(src)).collect()}
    assert len(ids) == 2


def test_lazy_counts_need_no_cache(spark, tmp_path):
    """Column pruning reduces a count() to just the corrupt-column
    filter, which Spark rejects on raw JSON scans — the keep-alive
    conjunct must keep both sides countable WITHOUT materializing."""
    src = tmp_path / "c.jsonl"
    _write_jsonl(src, DOCS, bad=BAD_LINES)
    raw = read_jsonl_corpus(
        spark, str(src), "text string, lang string, source string"
    )
    clean, quarantine = split_corrupt(raw)  # default: no cache
    assert clean.count() == len(DOCS)
    assert quarantine.count() == len(BAD_LINES)
    assert not raw.is_cached
    assert read_jsonl_documents(spark, str(src)).count() == len(DOCS)


def test_gzip_single_file_reads_and_fans_out(spark, tmp_path):
    """A .jsonl.gz file is one non-splittable partition; the documents
    reader must still produce correct rows, and its fan-out hook spreads
    the downstream projection when the file count underfills the
    cluster."""
    src = tmp_path / "corpus.jsonl.gz"
    _write_jsonl(src, DOCS, gz=True)
    docs = read_jsonl_documents(spark, str(src))
    rows = {r["text"]: r for r in docs.collect()}
    assert set(rows) == {d["text"] for d in DOCS}
    assert rows["alpha beta gamma"]["n_chars"] == len("alpha beta gamma")
    # fan_out repartitioned the 1-file input up to the session parallelism
    assert (
        docs.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_documents_shape_feeds_the_catalog_operators(spark, tmp_path):
    """The reader's output schema matches the driver documents table
    closely enough to run a catalog text operator unchanged."""
    src = tmp_path / "corpus.jsonl"
    _write_jsonl(src, DOCS)
    docs = read_jsonl_documents(spark, str(src))
    assert docs.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,"
        "source:string,n_chars:bigint>"
    )
    # whitespace token count over the ingested frame
    toks = docs.select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens")
    )
    assert {r["n_tokens"] for r in toks.collect()} == {3, 4}


# ---------------------------------------------------------------------------
# Streaming JSONL ingest -> quarantine + exactly-once dedup store
# ---------------------------------------------------------------------------


def test_streaming_jsonl_ingest_end_to_end(spark, tmp_path):
    """Raw dump files stream in, malformed lines quarantine, clean
    documents land in the dedup store exactly once — including
    cross-file duplicates (same content in two source files collapses
    to one stored row) — and a SECOND run over the same source appends
    nothing (offsets committed, nothing pending)."""
    from proteofav_spark.streaming.corpus import run_jsonl_ingest

    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", DOCS[:2], bad=BAD_LINES[:1])
    # file b repeats DOCS[0] verbatim -> cross-file duplicate
    _write_jsonl(src / "b.jsonl", [DOCS[0], DOCS[2]], bad=BAD_LINES[1:])
    store = str(tmp_path / "store")
    quar = str(tmp_path / "quarantine")

    q = run_jsonl_ingest(
        spark, str(src), store, str(tmp_path / "ckpt"), quarantine_path=quar
    )
    q.awaitTermination()

    stored = spark.read.parquet(store)
    assert stored.count() == len(DOCS)  # cross-file dup collapsed
    assert {r["text"] for r in stored.collect()} == {d["text"] for d in DOCS}
    # ingest doc ids are CONTENT identity (text alone — the store's
    # dedup key), matching with_doc_id over just the text column
    expected_ids = {
        r["doc_id"]
        for r in with_doc_id(
            read_jsonl_documents(spark, str(src)).drop("doc_id"), ["text"]
        ).dropDuplicates(["doc_id"]).collect()
    }
    assert {r["doc_id"] for r in stored.collect()} == expected_ids
    quar_rows = spark.read.parquet(quar).collect()
    assert sorted(r["raw_line"] for r in quar_rows) == sorted(BAD_LINES)
    assert {r["reason"] for r in quar_rows} == {"corrupt"}

    # rerun over the same committed source: no pending files, no appends
    q2 = run_jsonl_ingest(
        spark, str(src), store, str(tmp_path / "ckpt"), quarantine_path=quar
    )
    q2.awaitTermination()
    assert spark.read.parquet(store).count() == len(DOCS)


def test_streaming_jsonl_ingest_incremental_files(spark, tmp_path):
    """Files landing AFTER the first run are picked up by the next run
    (offset tracking), and re-shipped duplicate content still merges to
    zero new rows — the store-side exactly-once contract."""
    from proteofav_spark.streaming.corpus import run_jsonl_ingest

    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", DOCS[:2])
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    run_jsonl_ingest(spark, str(src), store, ckpt).awaitTermination()
    assert spark.read.parquet(store).count() == 2

    # a late file: one genuinely new doc + one full duplicate of a.jsonl
    _write_jsonl(src / "late.jsonl", [DOCS[1], DOCS[2]])
    run_jsonl_ingest(spark, str(src), store, ckpt).awaitTermination()
    stored = spark.read.parquet(store)
    assert stored.count() == len(DOCS)
    assert stored.select("doc_id").distinct().count() == len(DOCS)


def test_streaming_ingest_store_identity_is_content_identity(spark, tmp_path):
    """The store dedupes on sha2(text): two differently-labeled copies of
    one text are ONE stored document (first-seen labels win) — and the
    id agrees with what the store collapses, so downstream joins on
    doc_id never dangle."""
    from proteofav_spark.streaming.corpus import run_jsonl_ingest

    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(
        src / "a.jsonl",
        [
            {"text": "t", "lang": "en", "source": "web"},
            {"text": "t", "lang": "fr", "source": "books"},
            {"text": "u", "lang": "en", "source": "web"},
        ],
    )
    store = str(tmp_path / "store")
    run_jsonl_ingest(
        spark, str(src), store, str(tmp_path / "ckpt")
    ).awaitTermination()
    stored = spark.read.parquet(store)
    assert stored.count() == 2  # "t" collapsed
    assert stored.select("doc_id").distinct().count() == 2


def test_streaming_ingest_null_text_rows_quarantine_not_vanish(
    spark, tmp_path
):
    """A well-formed JSON line with null/missing text is storable
    nowhere (the store keys on the content hash) — it must land in the
    quarantine with reason null_text, not silently disappear."""
    import json as _json

    from proteofav_spark.streaming.corpus import run_jsonl_ingest

    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(
        src / "a.jsonl",
        [
            {"text": "kept", "lang": "en", "source": "web"},
            {"lang": "en", "source": "web"},          # no text field
            {"text": None, "lang": "fr", "source": "b"},  # explicit null
        ],
        bad=BAD_LINES[:1],
    )
    store = str(tmp_path / "store")
    quar = str(tmp_path / "quarantine")
    run_jsonl_ingest(
        spark, str(src), store, str(tmp_path / "ckpt"), quarantine_path=quar
    ).awaitTermination()
    assert spark.read.parquet(store).count() == 1
    rows = spark.read.parquet(quar).collect()
    by_reason = {}
    for r in rows:
        by_reason.setdefault(r["reason"], []).append(r["raw_line"])
    assert by_reason["corrupt"] == [BAD_LINES[0]]
    assert len(by_reason["null_text"]) == 2
    for raw in by_reason["null_text"]:
        assert "text" not in _json.loads(raw)  # to_json drops null fields


def test_streaming_source_glob_ignores_stray_files(spark, tmp_path):
    """Non-JSONL directory members (_SUCCESS markers, READMEs) must not
    enter the stream and flood the quarantine."""
    from proteofav_spark.streaming.corpus import run_jsonl_ingest

    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", DOCS[:1])
    (src / "_SUCCESS").write_text("")
    (src / "README.txt").write_text("not a corpus\nfile\n")
    store = str(tmp_path / "store")
    quar = str(tmp_path / "quarantine")
    run_jsonl_ingest(
        spark, str(src), store, str(tmp_path / "ckpt"), quarantine_path=quar
    ).awaitTermination()
    assert spark.read.parquet(store).count() == 1
    import os

    assert not os.path.exists(quar) or spark.read.parquet(quar).count() == 0


def test_jsonl_ingest_merger_replay_idempotent(spark, tmp_path):
    """Crash-replay semantics for the COMPOSED raw-JSONL path (the same
    contract test_dedup_ingest_replay_idempotent pins for the base
    merger): a fully-replayed batch appends nothing to the store; a
    partial-commit crash back-fills only the missing rows; and the
    quarantine doubles on replay — the documented at-least-once reject
    stream."""
    from proteofav_spark.sources.corpus import DOCUMENTS_SCHEMA
    from proteofav_spark.streaming.corpus import jsonl_ingest_merger

    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", DOCS, bad=BAD_LINES)
    store = str(tmp_path / "store")
    quar = str(tmp_path / "quarantine")
    merger = jsonl_ingest_merger(store, quar)

    batch = read_jsonl_corpus(spark, str(src), DOCUMENTS_SCHEMA)
    merger(batch, 0)
    spark.catalog.refreshByPath(store)
    assert spark.read.parquet(store).count() == len(DOCS)
    assert spark.read.parquet(quar).count() == len(BAD_LINES)

    # full replay of the same batch (checkpoint recovery): store no-op,
    # quarantine re-appends (at-least-once, documented)
    merger(read_jsonl_corpus(spark, str(src), DOCUMENTS_SCHEMA), 0)
    spark.catalog.refreshByPath(store)
    assert spark.read.parquet(store).count() == len(DOCS)
    assert spark.read.parquet(quar).count() == 2 * len(BAD_LINES)

    # partial-commit crash: only one doc's rows landed, then the full
    # batch replays — back-fill without duplicates
    store2 = str(tmp_path / "store2")
    merger2 = jsonl_ingest_merger(store2)
    first_text = DOCS[0]["text"]
    partial = read_jsonl_corpus(spark, str(src), DOCUMENTS_SCHEMA).where(
        F.col("text") == first_text
    )
    merger2(partial, 7)
    assert spark.read.parquet(store2).count() == 1
    merger2(read_jsonl_corpus(spark, str(src), DOCUMENTS_SCHEMA), 7)
    spark.catalog.refreshByPath(store2)
    recovered = spark.read.parquet(store2)
    assert recovered.count() == len(DOCS)
    assert recovered.select("doc_id").distinct().count() == len(DOCS)
