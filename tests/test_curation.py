"""Edge-case semantics for the corpus-curation operators (part 3):
repetition filters, decontamination, deterministic weighted / mixture
sampling. Driver-table parity is covered by the oracle gate; these pin
behavior on crafted corpora."""

import os
import tempfile

import pytest

from proteofav_spark.operators.curation import (
    q_contamination_ngram_overlap,
    q_sample_weighted_hash,
    q_source_mixture_rebalance,
    q_text_repetition_metrics,
)


def _write_docs(spark, rows):
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def test_repetition_metrics_flag_degenerate_docs(spark):
    """A long 'a b a b …' doc is dominated by one bigram and duplicate
    trigrams → dropped; an all-distinct doc sits exactly at the 0.2
    bigram bound → kept; short docs (< REP_MIN_TOKENS) are not
    assessable for repetition → kept regardless of their fractions."""
    rows = [
        (1, "a b a b a b a b a b", "en", "s", 19),
        (2, " ".join(f"w{i}" for i in range(10)), "en", "s", 30),
        (3, "x", "en", "s", 1),
        (4, "a b a b a", "en", "s", 9),
    ]
    out = {
        r["doc_id"]: r
        for r in q_text_repetition_metrics(spark, _write_docs(spark, rows)).collect()
    }
    assert len(out) == 4
    r1 = out[1]
    assert r1["n_tokens"] == 10
    assert r1["top_bigram_frac"] == 1.0       # "a b" ×5, capped
    assert r1["dup_trigram_frac"] == 1.0      # every trigram duplicated
    assert r1["keep"] == 0
    r2 = out[2]
    assert r2["top_bigram_frac"] == pytest.approx(0.2)   # max count 1 → 2/10
    assert r2["dup_trigram_frac"] == 0.0
    assert r2["keep"] == 1
    r3 = out[3]
    assert (r3["top_bigram_frac"], r3["dup_trigram_frac"], r3["keep"]) == (0.0, 0.0, 1)
    r4 = out[4]
    assert r4["top_bigram_frac"] == pytest.approx(0.8)   # repetitive but short
    assert r4["keep"] == 1


def test_repetition_top_frac_capped_at_one(spark):
    """Overlapping occurrences ('x x …': n-1 hits × 2 tokens > n tokens)
    must not push the fraction past 1."""
    out = q_text_repetition_metrics(
        spark, _write_docs(spark, [(1, " ".join(["x"] * 10), "en", "s", 19)])
    ).collect()[0]
    assert out["top_bigram_frac"] == 1.0
    assert out["keep"] == 0


def test_contamination_flags_only_sharing_corpus_docs(spark):
    """doc 0 is the eval split (0 % 10 == 0); doc 5 embeds one of its
    8-grams → flagged with that one eval doc; doc 7 is disjoint → absent;
    eval docs themselves never appear."""
    shared = " ".join(f"g{i}" for i in range(8))
    rows = [
        (0, shared + " tail0 tail1", "en", "s", 50),
        (5, "pre0 pre1 " + shared, "en", "s", 50),
        (7, " ".join(f"z{i}" for i in range(12)), "en", "s", 40),
    ]
    out = {
        r["doc_id"]: r
        for r in q_contamination_ngram_overlap(spark, _write_docs(spark, rows)).collect()
    }
    assert set(out) == {5}
    assert out[5]["n_shared_ngrams"] == 1
    assert out[5]["n_eval_docs"] == 1


def test_weighted_sample_respects_weight_extremes(spark):
    """weight 1 (n_chars ≥ 500) docs always survive; weight 0 docs never
    do; the hash decision is deterministic across runs."""
    rows = [(i, "t", "en", "s", 500 if i % 2 == 0 else 0) for i in range(40)]
    tmp = _write_docs(spark, rows)
    kept = {r["doc_id"] for r in q_sample_weighted_hash(spark, tmp).collect()}
    assert kept == {i for i in range(40) if i % 2 == 0}
    assert kept == {r["doc_id"] for r in q_sample_weighted_hash(spark, tmp).collect()}
    weights = {r["weight"] for r in q_sample_weighted_hash(spark, tmp).collect()}
    assert weights == {1.0}


def test_mixture_rebalance_rates_track_relative_quality(spark):
    """The best source gets rate 1.0 and keeps every doc; a source at half
    its mean quality gets rate 0.5 and a subsample; counts add up."""
    rows = [(i, "t", "en", "good", 400) for i in range(30)] + [
        (100 + i, "t", "en", "weak", 200) for i in range(30)
    ]
    out = {
        r["source"]: r
        for r in q_source_mixture_rebalance(spark, _write_docs(spark, rows)).collect()
    }
    assert out["good"]["rate"] == 1.0
    assert out["good"]["n_sampled"] == out["good"]["n_orig"] == 30
    assert out["weak"]["rate"] == pytest.approx(0.5)
    assert 0 < out["weak"]["n_sampled"] < 30


def test_accept_hash_uniform_independent_overflow_safe(spark):
    """The acceptance hash must (a) not overflow int64 on doc_ids past
    2^32 (the bare linear congruence crashed under ANSI mode at
    doc_id ≈ 3.5e9), (b) accept ≈ w of an arithmetic-progression id set
    for any weight (the linear form accepted ~100% of stride-430762
    progressions), and (c) be independent across the two samplers'
    constants (the linear hashes were bijections of each other)."""
    from pyspark.sql import functions as F

    from proteofav_spark.operators.curation import _accept_u

    base = 3_474_528_292  # past the old linear-hash overflow threshold
    ids = spark.range(100_000).select(
        (F.col("id") * 430762 + base).alias("doc_id")
    )
    rows = ids.select(
        _accept_u(40503, 12345, 65539).alias("u1"),
        _accept_u(48271, 99991, 69621).alias("u2"),
    ).agg(
        F.avg((F.col("u1") < 0.3).cast("double")).alias("rate1"),
        F.avg((F.col("u2") < 0.3).cast("double")).alias("rate2"),
        F.avg(((F.col("u1") < 0.3) & (F.col("u2") < 0.3)).cast("double")).alias("joint"),
        F.corr("u1", "u2").alias("corr"),
    ).collect()[0]
    assert rows["rate1"] == pytest.approx(0.3, abs=0.02)
    assert rows["rate2"] == pytest.approx(0.3, abs=0.02)
    assert rows["joint"] == pytest.approx(0.09, abs=0.01)
    assert abs(rows["corr"]) < 0.02


def test_pii_scrub_redacts_and_counts_with_oracle_parity(spark):
    """Crafted PII must be counted and redacted — and because the driver
    corpus contains no PII (its gate run exercises only the zero-hit
    path), Spark and the DuckDB oracle are compared here on documents
    with real hits, pinning the Java↔RE2 regex common dialect."""
    import duckdb

    from proteofav_spark.operators.curation import q_text_pii_scrub, scrub_pii
    from proteofav_spark.queries import all_oracles
    from pyspark.sql import functions as F

    pii = (
        "mail alice@example.com or bob.smith+x@sub.domain.org "
        "ip 192.168.0.1 call +1 555-123-4567 done"
    )
    rows = [(1, pii, "en", "s", len(pii)), (2, "no pii here", "en", "s", 11)]
    tmp = _write_docs(spark, rows)

    clean = (
        spark.createDataFrame([(pii,)], "text: string")
        .select(scrub_pii(F.col("text")).alias("c"))
        .collect()[0]["c"]
    )
    assert clean == "mail [EMAIL] or [EMAIL] ip [IP] call [PHONE] done"

    got = {r["doc_id"]: r for r in q_text_pii_scrub(spark, tmp).collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (2, 1, 1)
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_phone"]) == (0, 0, 0)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp}/documents.parquet/*.parquet'"
    )
    for doc_id, n_email, n_ipv4, n_phone, clean_hash in con.execute(
        all_oracles()["text_pii_scrub"]
    ).fetchall():
        r = got[doc_id]
        assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (n_email, n_ipv4, n_phone)
        assert r["clean_hash"] == clean_hash


def test_vocab_top_ngrams_ordered_and_tie_broken(spark):
    """Counts are exact, ordering is (count DESC, gram ASC), and the
    LIMIT cut is deterministic across equal counts."""
    from proteofav_spark.operators.curation import q_vocab_top_ngrams

    rows = [
        (1, "x y x y x y", "en", "s", 11),   # "x y"×3, "y x"×2
        (2, "a b", "en", "s", 3),            # "a b"×1
        (3, "a c", "en", "s", 3),            # "a c"×1
    ]
    out = q_vocab_top_ngrams(spark, _write_docs(spark, rows)).collect()
    got = [(r["gram"], r["n_occurrences"]) for r in out]
    assert got == [("x y", 3), ("y x", 2), ("a b", 1), ("a c", 1)]


def test_dedup_consensus_merges_signal_provenance(spark):
    """Every consensus row carries ≥1 signal; two-signal rows must
    appear in both underlying candidate sets; one-signal rows in exactly
    the one they claim."""
    from proteofav_spark.operators.curation import q_dedup_consensus
    from proteofav_spark.operators.llm_queries import (
        q_dedup_embedding_cosine, q_dedup_minhash_lsh,
    )

    sf = "/root/testdata/sf0.001"
    mh = {(r["doc_a"], r["doc_b"]) for r in q_dedup_minhash_lsh(spark, sf).collect()}
    em = {(r["vec_a"], r["vec_b"]) for r in q_dedup_embedding_cosine(spark, sf).collect()}
    out = q_dedup_consensus(spark, sf).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == mh | em
    for r in out:
        pair = (r["id_a"], r["id_b"])
        assert r["n_signals"] in (1, 2)
        assert (r["n_signals"] == 2) == (pair in mh and pair in em)
        assert (r["n_bands_shared"] > 0) == (pair in mh)
        assert (r["cosine"] is not None) == (pair in em)


def test_curate_chains_all_stages(spark):
    """Repetitive docs drop, PII is scrubbed in survivors, exact dups
    keep the lowest doc_id (post-scrub content), zero-weight docs are
    sampled out."""
    from pyspark.sql import functions as F

    from proteofav_spark.operators.curation import curate

    rows = [
        (1, "x y x y x y x y x y x y", "en", "s", 500),  # repetitive → drop
        (2, "good clean text regarding mail alice@example.com subjects", "en", "s", 500),
        (3, "good clean text about mail bob@other.org topics", "en", "s", 500),
        # scrubs to the same text as 3 → dedup keeps doc 3
        (4, "good clean text about mail carol@third.net topics", "en", "s", 500),
        (5, "short but fine unique wording here", "en", "s", 0),  # weight 0 → drop
    ]
    docs = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    out = curate(docs).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [2, 3]
    texts = {r["doc_id"]: r["text"] for r in out}
    assert "[EMAIL]" in texts[2] and "@" not in texts[2]
    assert texts[3] == "good clean text about mail [EMAIL] topics"


def test_char_entropy_known_values(spark, tmp_path):
    """Pinned entropies: uniform text → 0; two equally-frequent chars →
    ln 2; empty docs drop out."""
    import math
    import os

    from proteofav_spark.operators.curation import q_text_char_entropy

    rows = [
        (1, "aaaa", "en", "s", 4),
        (2, "abab", "en", "s", 4),
        (3, "", "en", "s", 0),
        (4, "abcd", "en", "s", 4),
    ]
    tmp = str(tmp_path)
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    got = {r["doc_id"]: r for r in q_text_char_entropy(spark, tmp).collect()}
    assert set(got) == {1, 2, 4}  # empty text has no char rows
    assert got[1]["char_entropy"] == 0.0
    assert abs(got[2]["char_entropy"] - round(math.log(2), 6)) < 1e-9
    assert abs(got[4]["char_entropy"] - round(math.log(4), 6)) < 1e-9
    assert got[2]["n_distinct_chars"] == 2
    assert got[4]["n_chars_counted"] == 4
