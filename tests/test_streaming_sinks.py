"""Streaming (events) + sink (mmCIF/PDB writers) tests."""

from pyspark.sql import functions as F

from proteofav_spark.operators.structures import select_structures
from proteofav_spark.sinks.writers import (
    make_chimera_attribute_file,
    make_chimera_command_file,
    write_mmcif_from_table,
    write_pdb_from_table,
)
from proteofav_spark.sources.structures import parse_mmcif_atoms, parse_pdb_atoms
from proteofav_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_windows,
    sliding_avg,
    stream_static_enrich,
    tumbling_counts,
    with_event_time,
)

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_matches_batch(spark):
    stream = read_events_stream(spark, SF)
    run_to_memory(tumbling_counts(stream), "tumbling_test", output_mode="complete")
    got = spark.sql(
        "SELECT sum(n_events) AS n FROM tumbling_test"
    ).first()["n"]
    batch_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert got == batch_n


def test_stream_sliding_and_session(spark):
    stream = read_events_stream(spark, SF)
    run_to_memory(sliding_avg(stream), "sliding_test", output_mode="complete")
    assert spark.table("sliding_test").count() > 0
    stream2 = read_events_stream(spark, SF)
    run_to_memory(session_windows(stream2), "session_test", output_mode="complete")
    s = spark.table("session_test")
    assert s.count() > 0
    assert s.filter(F.col("session_end") < F.col("session_start")).count() == 0


def test_stream_static_enrich(spark):
    stream = read_events_stream(spark, SF)
    dim = spark.range(0, 10000).select(
        F.col("id").alias("user_id"), (F.col("id") % 5).alias("cohort")
    )
    enriched = stream_static_enrich(stream, dim, "user_id")
    run_to_memory(enriched.select("event_id", "user_id", "cohort"), "enrich_test")
    t = spark.table("enrich_test")
    assert t.filter(F.col("cohort").isNull()).count() == 0


def test_event_time_conversion(spark):
    df = with_event_time(spark.read.parquet(f"{SF}/events.parquet"))
    # compare Spark-side epoch integers — collecting TIMESTAMP values
    # yields driver-local naive datetimes, so a Python-side comparison
    # would depend on the machine's system timezone
    mismatched = df.filter(
        F.unix_micros(F.col("ts").cast("timestamp"))
        != F.unix_micros(F.col("event_ts"))
    ).count()
    assert mismatched == 0


def test_write_mmcif_roundtrip(spark, refdata, tmp_path):
    df = select_structures(
        spark, f"{refdata}/mmcif/2pah.cif",
        models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
    )
    out = str(tmp_path / "out.cif")
    write_mmcif_from_table(df, out, overwrite=True)
    back = parse_mmcif_atoms(spark, out, excluded_cols=())
    assert back.count() == df.count()
    a = df.select("Cartn_x", "auth_seq_id").orderBy("id").collect()
    b = back.select("Cartn_x", "auth_seq_id").orderBy("id").collect()
    assert a == b


def test_write_pdb_roundtrip(spark, refdata, tmp_path):
    df = select_structures(
        spark, f"{refdata}/mmcif/2pah.cif",
        models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
    )
    out = str(tmp_path / "out.pdb")
    write_pdb_from_table(df, out, overwrite=True)
    back = parse_pdb_atoms(spark, out)
    assert back.count() == df.count()
    row = back.orderBy("id").first()
    assert row["label_atom_id"] == "CA"
    assert row["auth_asym_id"] == "A"
    assert row["auth_seq_id"] == "118"


def test_write_pdb_lake_partitioned(spark, refdata, tmp_path):
    """Distributed writer: two structures in one frame come out as two
    per-structure directories, each file byte-identical to the
    single-file writer's output for that structure."""
    import glob

    from proteofav_spark.sinks.writers import write_pdb_lake

    frames = {
        name: select_structures(
            spark, f"{refdata}/mmcif/{name}.cif",
            models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
        )
        for name in ("2pah", "2w4o")
    }
    both = frames["2pah"].unionByName(frames["2w4o"], allowMissingColumns=True)
    out_dir = str(tmp_path / "lake")
    write_pdb_lake(both, out_dir)
    for name, df in frames.items():
        single = str(tmp_path / f"{name}.pdb")
        write_pdb_from_table(df, single, overwrite=True)
        parts = sorted(glob.glob(f"{out_dir}/_structure={name}/part-*"))
        assert len(parts) == 1, parts
        lake_text = open(parts[0]).read()
        assert lake_text == open(single).read()
        back = parse_pdb_atoms(spark, parts[0])
        assert back.count() == df.count()


def test_chimera_files(spark, refdata):
    from proteofav_spark.sources.dssp import select_dssp

    dssp = select_dssp(spark, f"{refdata}/dssp/2pah.dssp", chains=("A",))
    attr = make_chimera_attribute_file(dssp, "RSA", "RES")
    assert attr.startswith("# Generated with proteofav_spark")
    assert "attribute: RSA" in attr
    assert "\t:118\t" in attr
    cmd = make_chimera_command_file("2pah.cif", content="defattr RSA.attr")
    assert cmd.startswith("open 2pah.cif")
    assert "color green,r helix" in cmd


def test_running_user_totals_stateful(spark):
    from proteofav_spark.streaming.events import running_user_totals

    stream = read_events_stream(spark, SF)
    run_to_memory(
        running_user_totals(stream), "stateful_test", output_mode="update"
    )
    t = spark.table("stateful_test")
    assert t.count() > 0
    # final state per user matches the batch rollup
    final = (
        t.groupBy("user_id").agg(F.max("n_events").alias("n")).orderBy("user_id")
    )
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .count()
        .orderBy("user_id")
    )
    got = {r["user_id"]: r["n"] for r in final.collect()}
    expect = {r["user_id"]: r["count"] for r in batch.collect()}
    assert got == expect


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode watermark semantics: a window emits once the watermark
    passes its end, and rows arriving after the watermark has moved past
    them are dropped — the late-data policy of SURVEY §2.10."""
    import datetime as dt

    src = tmp_path / "stream_src"
    src.mkdir()
    chk = str(tmp_path / "chk")

    def write_batch(rows):
        spark.createDataFrame(
            rows, "user_id: long, event_type: string, value: double, event_ts: timestamp"
        ).coalesce(1).write.mode("append").parquet(str(src))

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # batch 1: three rows in the 10:00 window + one far-future row that
    # advances the watermark (2h behind max event time → 12:30) past 11:00
    write_batch([
        (1, "click", 1.0, at(5)), (2, "click", 1.0, at(20)),
        (3, "click", 1.0, at(40)), (9, "click", 1.0, at(270)),
    ])
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, value double, event_ts timestamp"
        ).parquet(str(src))
    )
    agg = (
        stream.withWatermark("event_ts", "2 hours")
        .groupBy(F.window("event_ts", "1 hour").alias("win"))
        .count()
        .select(F.col("win.start").alias("ws"), "count")
    )
    q = (
        agg.writeStream.format("memory").queryName("wm_test")
        .outputMode("append").option("checkpointLocation", chk).start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE row for the already-finalized 10:00 window
        write_batch([(4, "late", 1.0, at(10))])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["ws"].strftime("%H:%M"): r["count"]
        for r in spark.table("wm_test").collect()
    }
    # the 10:00 window emitted with exactly the 3 on-time rows; the late
    # row never reappears (no second emission for 10:00)
    assert got.get("10:00") == 3


def test_stream_exact_dedup_first_seen(spark, tmp_path):
    """Duplicate texts across stream files collapse to one surviving row
    within the watermark horizon."""
    import os

    from proteofav_spark.streaming.corpus import (
        read_documents_stream, stream_exact_dedup,
    )

    d = str(tmp_path / "documents.parquet")
    os.makedirs(d)
    rows1 = [(1, "alpha beta gamma", "en", "s", 16), (2, "delta epsilon", "en", "s", 13)]
    rows2 = [(3, "alpha beta gamma", "en", "s", 16), (4, "zeta eta", "en", "s", 8)]
    schema = "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(d)

    stream = read_documents_stream(spark, str(tmp_path))
    run_to_memory(stream_exact_dedup(stream), "exact_dedup_test")
    out = spark.sql("SELECT text FROM exact_dedup_test").collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["alpha beta gamma", "delta epsilon", "zeta eta"]


def test_stream_collision_candidates_flags_near_dups(spark, tmp_path):
    """A streamed doc sharing shingles with a corpus doc collides in ≥1
    band; a disjoint doc never appears. No stream state involved."""
    import os

    from proteofav_spark.operators.llm_queries import minhash_band_buckets
    from proteofav_spark.streaming.corpus import (
        read_documents_stream, stream_collision_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(100, base, "en", "s", len(base))],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )
    corpus_bands = minhash_band_buckets(corpus)

    d = str(tmp_path / "documents.parquet")
    os.makedirs(d)
    rows = [
        (1, base + " tail", "en", "s", 5),
        (2, "completely different words entirely here now", "en", "s", 5),
    ]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).coalesce(1).write.mode("append").parquet(d)

    stream = read_documents_stream(spark, str(tmp_path))
    run_to_memory(
        stream_collision_candidates(stream, corpus_bands), "collision_test"
    )
    hits = spark.sql("SELECT DISTINCT doc_id, known_doc_id FROM collision_test").collect()
    assert {(r["doc_id"], r["known_doc_id"]) for r in hits} == {(1, 100)}


def test_stream_collision_ignores_shingleless_docs(spark, tmp_path):
    """Docs under 3 tokens share the sentinel MinHash signature; they
    must NOT collide with each other through it."""
    import os

    from proteofav_spark.operators.llm_queries import minhash_band_buckets
    from proteofav_spark.streaming.corpus import (
        read_documents_stream, stream_collision_candidates,
    )

    schema = "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    corpus = spark.createDataFrame([(100, "ok bye", "en", "s", 6)], schema)
    d = str(tmp_path / "documents.parquet")
    os.makedirs(d)
    spark.createDataFrame(
        [(1, "hi there", "en", "s", 8)], schema
    ).coalesce(1).write.mode("append").parquet(d)

    stream = read_documents_stream(spark, str(tmp_path))
    run_to_memory(
        stream_collision_candidates(stream, minhash_band_buckets(corpus)),
        "sentinel_test",
    )
    assert spark.sql("SELECT * FROM sentinel_test").count() == 0


def test_stream_stream_join_matches_batch(spark):
    """The watermarked stream-stream error⨝click join produces exactly the
    rows the equivalent batch join produces on the same data."""
    from proteofav_spark.streaming.events import (
        stream_stream_click_error_join, with_event_time,
    )

    batch = with_event_time(spark.read.parquet(f"{SF}/events.parquet"))
    stream = read_events_stream(spark, SF)
    joined = stream_stream_click_error_join(stream, stream)
    run_to_memory(joined, "ss_join_test")
    got = spark.table("ss_join_test")

    expect = stream_stream_click_error_join.__wrapped__(batch, batch) if hasattr(
        stream_stream_click_error_join, "__wrapped__"
    ) else stream_stream_click_error_join(batch, batch)
    n_expect = expect.count()
    assert n_expect > 0
    assert got.count() == n_expect
    assert got.exceptAll(expect).count() == 0


# ---------------------------------------------------------------------------
# Exactly-once ingest: replay-idempotent MERGE-by-content-hash sink
# ---------------------------------------------------------------------------

def test_dedup_ingest_replay_idempotent(spark, tmp_path):
    """Crash-replay semantics: (a) a real availableNow run lands every
    distinct document exactly once; (b) re-running the SAME merge
    batch (what checkpoint recovery does after a crash) appends
    nothing; (c) a partial-commit crash (half the batch's files
    already visible) back-fills only the missing rows — never
    duplicates."""
    from proteofav_spark.streaming.corpus import (
        dedup_store_merger,
        read_documents_stream,
        run_dedup_ingest,
    )

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_distinct = docs.select("text").distinct().count()

    # (a) full streamed run
    q = run_dedup_ingest(read_documents_stream(spark, sf), store, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(store)
    assert got.count() == n_distinct
    assert got.select("text_hash").distinct().count() == n_distinct

    # (b) replay the same data as one batch: merge must be a no-op
    merger = dedup_store_merger(store)
    merger(docs, 0)
    spark.catalog.refreshByPath(store)
    assert spark.read.parquet(store).count() == n_distinct

    # (c) partial-commit crash: a fresh store where only half the
    # batch's rows landed before the crash; the replayed merge
    # back-fills the other half exactly
    store2 = str(tmp_path / "store2")
    merger2 = dedup_store_merger(store2)
    half = docs.where(F.col("doc_id") % 2 == 0)
    merger2(half, 7)
    n_half = spark.read.parquet(store2).count()
    assert 0 < n_half < n_distinct
    merger2(docs, 7)  # full replay of the interrupted batch
    recovered = spark.read.parquet(store2)
    assert recovered.count() == n_distinct
    assert recovered.select("text_hash").distinct().count() == n_distinct


def test_write_mmcif_quotes_roundtrip_hostile_tokens(spark, tmp_path):
    """Review r10: the writer is the write-side twin of the r9
    quote-aware tokenizer — values containing whitespace or starting
    with a quote/comment char must be emitted QUOTED (the reference
    writes them bare, silently shifting columns on re-read). A value
    with no single-line CIF spelling (both quote kinds + whitespace)
    must fail loudly, never emit a corrupt row."""
    import pytest as _pytest

    from proteofav_spark.sources.structures import parse_mmcif_atoms

    cols = [
        "group_PDB", "id", "label_atom_id", "label_comp_id",
        "auth_asym_id", "auth_seq_id", "Cartn_x",
    ]
    rows = [
        ("ATOM", 1, "C1'", "U", "A", "1", 1.5),      # leading-quote-free, has '
        ("ATOM", 2, "N A", "GLY", "A", "2", 2.5),    # embedded whitespace
        ("ATOM", 3, "'N", "GLY", "A", "3", 3.5),     # LEADING single quote
        ("ATOM", 4, "#X", "GLY", "A", "4", 4.5),     # leading comment char
    ]
    df = spark.createDataFrame(rows, cols)
    out = str(tmp_path / "hostile.cif")
    write_mmcif_from_table(df, out, overwrite=True)
    back = parse_mmcif_atoms(spark, out, excluded_cols=())
    got = {int(r["id"]): r for r in back.collect()}
    assert len(got) == 4
    assert got[1]["label_atom_id"] == "C1'"
    assert got[2]["label_atom_id"] == "N A"     # no column shift
    assert got[3]["label_atom_id"] == "'N"
    assert got[4]["label_atom_id"] == "#X"
    assert [float(got[i]["Cartn_x"]) for i in range(1, 5)] == [
        1.5, 2.5, 3.5, 4.5,
    ]

    # both quote kinds + whitespace: no single-line spelling — loud abort
    bad = spark.createDataFrame(
        [("ATOM", 1, "a'b\" c", "U", "A", "1", 1.5)], cols
    )
    with _pytest.raises(Exception):
        write_mmcif_from_table(bad, str(tmp_path / "bad.cif"), overwrite=True)


def test_write_mmcif_roundtrip_fuzz(spark, tmp_path):
    """Randomized write→read round-trip over the CIF quoting alphabet
    (r13): any value whose characters come from quotes / whitespace /
    comment chars / brackets either round-trips EXACTLY or (both quote
    kinds + whitespace — no single-line CIF spelling) aborts loudly.
    Extends the fixed hostile-token cases with the full combination
    space."""
    import itertools

    from py4j.protocol import Py4JJavaError

    from proteofav_spark.sources.structures import parse_mmcif_atoms

    # every <=3-char string over the hostile alphabet + a few longer ones
    alphabet = ["'", '"', " ", "#", ";", "[", "x"]
    vals = [
        "".join(t)
        for n in (1, 2, 3)
        for t in itertools.product(alphabet, repeat=n)
    ] + ["a'b\" c", "  ", "don't", 'say "hi"', "_tag", "?", "."]
    cols = ["group_PDB", "id", "label_atom_id"]
    for i in range(0, len(vals), 40):
        chunk = vals[i : i + 40]
        rows = [("ATOM", j, v) for j, v in enumerate(chunk)]
        df = spark.createDataFrame(rows, cols)
        out = str(tmp_path / f"fuzz_{i}.cif")
        def needs_quoting(v):
            import re as _re

            return (
                v == ""
                or _re.search(r"\s", v) is not None
                or (v and v[0] in "'\";#$[]")
            )

        unwritable = [
            v for v in chunk
            if needs_quoting(v) and "'" in v and '"' in v
        ]
        if unwritable:
            import pytest as _pytest

            with _pytest.raises((Py4JJavaError, Exception)):
                write_mmcif_from_table(df, out, overwrite=True)
            # the writable remainder must still round-trip on its own
            rows = [("ATOM", j, v) for j, v in enumerate(chunk)
                    if not (needs_quoting(v) and "'" in v and '"' in v)]
            if not rows:
                continue
            df = spark.createDataFrame(rows, cols)
            write_mmcif_from_table(df, out, overwrite=True)
        else:
            write_mmcif_from_table(df, out, overwrite=True)
        back = parse_mmcif_atoms(spark, out, excluded_cols=())
        got = {int(r["id"]): r["label_atom_id"] for r in back.collect()}
        want = {j: v for (_g, j, v) in rows}
        assert got == want, (i, {k: (want.get(k), got.get(k)) for k in set(want) | set(got) if want.get(k) != got.get(k)})
