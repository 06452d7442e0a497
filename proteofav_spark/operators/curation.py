"""Training-data pipeline operators, part 3: corpus curation.

Quality filtering and sampling operators a 100 TB pretraining pipeline
runs after dedup (extends ``operators/llm_queries.py`` /
``operators/pipeline_queries.py``; BASELINE.json "north_star"):

- ``text_repetition_metrics`` — Gopher-style intra-document repetition
  filters (Rae et al. 2021, §A1.1): fraction of tokens covered by the
  most frequent word bigram and fraction of trigram occurrences that are
  duplicates, plus the keep/drop verdict.
- ``contamination_ngram_overlap`` — GPT-3-style benchmark decontamination
  (Brown et al. 2020, App. C): flag corpus documents sharing any word
  8-gram with a held-out eval set.
- ``sample_weighted_hash`` — deterministic per-document importance
  sampling: acceptance probability proportional to a quality proxy,
  decided by an arithmetic hash so reruns and retries keep the same rows.
- ``source_mixture_rebalance`` — quality-proportional source mixing
  (DoReMi-lite): per-source acceptance rates from relative mean document
  quality, applied with a second independent hash.

Scale notes (100 TB design):
- Repetition metrics are the canonical two-level aggregation: explode
  n-grams → partial-aggregated count per (doc, k, gram) → per-doc stats.
  Both shuffles key on doc_id(+gram) — no global state, no skew beyond
  document length, and a sentinel gram keeps token-poor documents in the
  output without a second scan of the corpus.
- Decontamination NEVER shuffles the corpus: the eval n-gram set is tiny
  (benchmarks are MBs against a 100 TB corpus) and is broadcast; only
  matching (doc_id, gram) hits — a vanishing fraction — reach the final
  aggregate. Here the eval set is carved from ``documents`` by
  ``doc_id % 10`` for the oracle's benefit; production passes a separate
  benchmark table into :func:`contamination_hits`.
- Both sampling operators are stateless map-side filters: the decision is
  pure arithmetic on (doc_id, per-source rate), so they pipeline into the
  scan with zero shuffle; the per-source rate table is a broadcast of
  O(#sources) rows. Hash-based acceptance (vs ``rand()``) makes the
  sample reproducible under retries and incremental reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from proteofav_spark.operators.llm_queries import (
    _sql_shingles,
    _sql_tokens,
    q_dedup_embedding_cosine as q_dedup_embedding_cosine_ref,
    q_dedup_minhash_lsh as q_dedup_minhash_lsh_ref,
    shingles_col,
    tokens_col,
)
from proteofav_spark.queries import fan_out, load, register

REP_TOP_BIGRAM_MAX = 0.20   # Gopher-ish: drop if top bigram covers >20% of tokens
REP_DUP_TRIGRAM_MAX = 0.30  # drop if >30% of trigram occurrences are duplicates
# below this, a single unique bigram already exceeds the 0.2 threshold
# (2/n > 0.2 for n < 10) — the metric is meaningless, so short docs pass
# the REPETITION check and defer to a separate length/quality filter
REP_MIN_TOKENS = 10
CONTAM_K = 8                # word n-gram order for decontamination
EVAL_EVERY = 10             # synthetic eval split: doc_id % EVAL_EVERY == 0
HASH_MOD = 1000003          # prime modulus for acceptance hashes
_M32 = 1 << 32              # 32-bit mixing domain for the acceptance hash


def _accept_u(m1: int, offset: int, m2: int) -> F.Column:
    """Uniform acceptance value in [0, 1) from integer arithmetic on
    doc_id — exact and identical in Spark and DuckDB (no float hash, no
    rand()), so sampling decisions survive retries and reruns.

    Two multiply-xorshift rounds in a 32-bit domain, NOT a bare linear
    congruence ``(doc_id*a + b) % P``: the linear form (a) overflows
    int64 for doc_id ≥ 2^63/a ≈ 3.5e9 — a crash under Spark's default
    ANSI mode at exactly the corpus sizes this module targets — and
    (b) is affine in doc_id, so ids in an arithmetic progression get
    consecutive acceptance values (a stride near a multiple of
    a^-1 mod P accepts ~100% of docs regardless of weight), and any two
    such "independent" hashes are bijections of each other. The mixer
    keeps every intermediate < 2^48 (mod-2^32 after 16-bit-scale
    multiplies) and measures uniform on consecutive, strided, and >2^32
    id sets with cross-hash correlation ~0 (see tests)."""
    x = F.col("doc_id") % F.lit(_M32)
    x = (x * F.lit(m1) + F.lit(offset)) % F.lit(_M32)
    x = x.bitwiseXOR(F.shiftright(x, 16))
    x = (x * F.lit(m2)) % F.lit(_M32)
    x = x.bitwiseXOR(F.shiftright(x, 16))
    return (x % F.lit(HASH_MOD)) / F.lit(float(HASH_MOD))


def _sql_accept_u(m1: int, offset: int, m2: int) -> str:
    x0 = f"(doc_id % {_M32})"
    x1 = f"((({x0} * {m1}) + {offset}) % {_M32})"
    x2 = f"xor({x1}, ({x1} >> 16))"
    x3 = f"(({x2} * {m2}) % {_M32})"
    x4 = f"xor({x3}, ({x3} >> 16))"
    return f"(({x4} % {HASH_MOD}) / {HASH_MOD}.0)"


# ---------------------------------------------------------------------------
# Gopher-style repetition filters
# ---------------------------------------------------------------------------

_REP_SQL = f"""
    WITH g AS (
      SELECT doc_id,
             len({_sql_tokens("text")}) AS n_tokens,
             UNNEST(list_concat(list_concat(
                 list_transform({_sql_shingles("text", 2)},
                                x -> {{'k': 2, 'gram': x}}),
                 list_transform({_sql_shingles("text", 3)},
                                x -> {{'k': 3, 'gram': x}})),
                 [{{'k': 0, 'gram': ''}}])) AS s
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens, s.k AS k, s.gram AS gram, count(*) AS c
      FROM g GROUP BY ALL),
    p AS (
      SELECT doc_id, n_tokens,
             COALESCE(MAX(CASE WHEN k = 2 THEN c END), 0) AS max2,
             COALESCE(CAST(SUM(CASE WHEN k = 3 THEN c END) AS BIGINT), 0) AS n3,
             COALESCE(CAST(SUM(CASE WHEN k = 3 AND c > 1 THEN c END) AS BIGINT), 0) AS dup3
      FROM c GROUP BY doc_id, n_tokens)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(least(1000000, (max2 * 4000000 + greatest(n_tokens, 1))
                               // (2 * greatest(n_tokens, 1))) AS BIGINT)
               / 1000000.0 AS top_bigram_frac,
           CAST((dup3 * 2000000 + greatest(n3, 1))
                // (2 * greatest(n3, 1)) AS BIGINT)
               / 1000000.0 AS dup_trigram_frac,
           CAST((n_tokens < {REP_MIN_TOKENS}
                 OR (least(1000000, (max2 * 4000000 + greatest(n_tokens, 1))
                                    // (2 * greatest(n_tokens, 1)))
                         <= {round(REP_TOP_BIGRAM_MAX * 1e6)}
                     AND (dup3 * 2000000 + greatest(n3, 1))
                         // (2 * greatest(n3, 1))
                         <= {round(REP_DUP_TRIGRAM_MAX * 1e6)})) AS INT) AS keep
    FROM p
"""


def _gram_run_stats(grams: F.Column) -> F.Column:
    """struct(maxrun, dup) for a gram array: the count of the most
    frequent gram and the number of gram occurrences belonging to
    duplicated grams, via one run-length fold over the sorted array.
    Per-row O(n log n), no nulls/empties assumptions beyond grams being
    non-empty strings (shingles are)."""
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("maxrun"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(a: F.Column, g: F.Column) -> F.Column:
        newrun = F.when(g == a.prev, a.run + 1).otherwise(F.lit(1).cast("long"))
        # a run that just ended with length r > 1 contributes its r
        # occurrences to the duplicate total
        dup_inc = (
            F.when((g != a.prev) & (a.run > 1), a.run).otherwise(F.lit(0).cast("long"))
        )
        return F.struct(
            g.alias("prev"),
            newrun.alias("run"),
            F.greatest(a.maxrun, newrun).alias("maxrun"),
            (a.dup + dup_inc).alias("dup"),
        )

    return F.aggregate(
        F.sort_array(grams),
        acc0,
        step,
        lambda a: F.struct(
            a.maxrun.alias("maxrun"),
            (a.dup + F.when(a.run > 1, a.run).otherwise(F.lit(0).cast("long"))).alias(
                "dup"
            ),
        ),
    )


from functools import lru_cache


@lru_cache(maxsize=1)
def _repetition_raw_cols() -> tuple:
    """The repetition query's INTEGER inputs, built once — the two
    run-length folds are deep HOF lambda trees whose py4j construction
    cost (~0.2 s) would otherwise be re-paid on every query build. The
    fractions and the keep verdict are derived from these by the shared
    integer expressions below (one definition for the catalog query AND
    the curate() pipeline)."""
    b = _gram_run_stats(shingles_col("text", 2))
    t = _gram_run_stats(shingles_col("text", 3))
    return (
        F.size(tokens_col("text")).cast("bigint").alias("n_tokens"),
        b.maxrun.alias("_maxrun2"),
        t.dup.alias("_dup3"),
        F.greatest(
            F.size(shingles_col("text", 3)).cast("bigint"), F.lit(1)
        ).alias("_n3"),
    )


# round(num/den, 6) computed half-up in exact BIGINT arithmetic: a plain
# round(double, 6) of an int/int ratio sits on a TRUE 7th-decimal half
# whenever the reduced denominator is 2^a·5^b (the Q9 cousin class,
# PERF_NOTES — e.g. any doc with 128 tokens), where Spark's BigDecimal
# HALF_UP and DuckDB's binary rounding can disagree by 1e-6 and flip the
# keep verdict. Integer half-up never diverges. count*2/n over-counts
# overlapping occurrences ("x x x x": 3 bigram hits × 2 > 4 tokens) —
# capped at 10^6 so the metric stays a fraction. BIGINT is safe HERE
# (unlike the group-sum helpers, widened to DECIMAL(38,0) in r9): every
# numerator is a PER-DOCUMENT count, so ·4e6 wraps only past a 2.3e12-
# token single document — not reachable from an in-memory string.
_TOP6 = (
    "least(1000000L, (_maxrun2 * 4000000L + greatest(n_tokens, 1L))"
    " div (2L * greatest(n_tokens, 1L)))"
)
_DUP6 = "(_dup3 * 2000000L + _n3) div (2L * _n3)"
_REP_KEEP = (
    f"n_tokens < {REP_MIN_TOKENS} OR "
    f"({_TOP6} <= {round(REP_TOP_BIGRAM_MAX * 1e6)} AND "
    f"{_DUP6} <= {round(REP_DUP_TRIGRAM_MAX * 1e6)})"
)


@register("text_repetition_metrics", _REP_SQL)
def q_text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics and keep/drop verdict: fraction of
    tokens covered by the most frequent word bigram, and fraction of
    trigram occurrences that are duplicates (Gopher repetition filters).

    Shuffle-FREE: both metrics are per-document, so instead of exploding
    n-grams into a two-level groupBy (two shuffles of every gram), each
    document's gram array is sorted and run-length-folded in place —
    one map-only projection that pipelines into the scan and
    parallelizes per input split at any scale (measured 10× over the
    explode+groupBy form at sf0.1). The oracle deliberately keeps the
    explode/GROUP BY formulation: two algorithms, one answer."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", *_repetition_raw_cols()).select(
        "doc_id",
        "n_tokens",
        (F.expr(_TOP6).cast("double") / F.lit(1000000.0)).alias(
            "top_bigram_frac"
        ),
        (F.expr(_DUP6).cast("double") / F.lit(1000000.0)).alias(
            "dup_trigram_frac"
        ),
        F.expr(_REP_KEEP).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def contamination_hits(corpus_grams: DataFrame, eval_grams: DataFrame) -> DataFrame:
    """Corpus documents sharing ≥1 n-gram with the (broadcast) eval set.

    ``corpus_grams``: (doc_id, gram); ``eval_grams``: (eval_id, gram).
    The eval side is benchmarks — MBs against a 100 TB corpus — so it
    broadcasts and the corpus never shuffles; only matching hits reach
    the countDistinct aggregate."""
    return (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_ngrams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


_CONTAM_SQL = f"""
    WITH g AS (
      SELECT doc_id, UNNEST(list_distinct({_sql_shingles("text", CONTAM_K)})) AS gram
      FROM documents),
    e AS (SELECT doc_id AS eval_id, gram FROM g WHERE doc_id % {EVAL_EVERY} = 0),
    c AS (SELECT doc_id, gram FROM g WHERE doc_id % {EVAL_EVERY} <> 0)
    SELECT c.doc_id,
           CAST(count(DISTINCT c.gram) AS BIGINT) AS n_shared_ngrams,
           CAST(count(DISTINCT e.eval_id) AS BIGINT) AS n_eval_docs
    FROM c JOIN e USING (gram)
    GROUP BY c.doc_id
"""


@register("contamination_ngram_overlap", _CONTAM_SQL)
def q_contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style decontamination: corpus documents that share any word
    8-gram with the eval split (here ``doc_id % 10 == 0`` stands in for a
    benchmark table so DuckDB can oracle the whole flow; production calls
    :func:`contamination_hits` with real benchmark grams)."""
    d = fan_out(load(spark, sf_dir, "documents"))

    def grams_of(docs: DataFrame, id_alias: str) -> DataFrame:
        return docs.select(
            F.col("doc_id").alias(id_alias),
            F.explode(F.array_distinct(shingles_col("text", CONTAM_K))).alias(
                "gram"
            ),
        )

    # filter doc_ids BEFORE shingling: the split predicate references only
    # doc_id, but Catalyst does not push it below the Generate(explode) of
    # the shared shingle projection — writing the filter on the raw scan
    # keeps each branch shingling only its own documents (measured ~20%
    # at sf0.1; at 100 TB it is the difference between shingling the
    # corpus twice and once)
    ev = grams_of(d.filter(F.col("doc_id") % EVAL_EVERY == 0), "eval_id")
    corpus = grams_of(d.filter(F.col("doc_id") % EVAL_EVERY != 0), "doc_id")
    return contamination_hits(corpus, ev)


# ---------------------------------------------------------------------------
# End-to-end curation pipeline
# ---------------------------------------------------------------------------

def curate(docs: DataFrame) -> DataFrame:
    """The standard curation chain as ONE composable DataFrame plan:
    repetition filter → PII scrub → exact dedup (keep lowest doc_id per
    content) → weighted acceptance sampling. Input needs (doc_id, text,
    n_chars); output is the surviving rows with ``text`` scrubbed.

    Everything before the dedup window is map-only and fuses into a
    single projection over the scan; the one shuffle is the dedup
    hash-partition. Filters run cheapest-first so each stage sees fewer
    rows: the repetition fold prunes before the regex scrub rewrites,
    and sampling runs last so acceptance is measured on clean, deduped
    text. The repetition verdict is the SAME cached expressions and
    keep predicate the catalog query uses (_repetition_raw_cols /
    _REP_KEEP) — one definition, one cache, no drift."""
    kept = (
        docs.select(docs["*"], *_repetition_raw_cols())
        .filter(F.expr(_REP_KEEP))
        .drop("n_tokens", "_maxrun2", "_dup3", "_n3")
        .withColumn("text", scrub_pii(F.col("text")))
    )
    w = W.partitionBy(F.unhex(F.md5(F.col("text").cast("binary")))).orderBy("doc_id")
    deduped = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    weight = F.least(F.lit(1.0), F.col("n_chars") / F.lit(500.0))
    return deduped.filter(_accept_u(40503, 12345, 65539) < weight)


# ---------------------------------------------------------------------------
# Multi-signal dedup consensus
# ---------------------------------------------------------------------------

def _consensus_sql() -> str:
    from proteofav_spark.operators.llm_queries import _EMB_DUP_SQL, _MINHASH_SQL

    return f"""
    WITH mh AS ({_MINHASH_SQL}),
    emb AS (
      SELECT vec_a AS doc_a, vec_b AS doc_b, cosine FROM ({_EMB_DUP_SQL})
    )
    SELECT doc_a AS id_a, doc_b AS id_b,
           CAST(COALESCE(mh.n_bands_shared, 0) AS BIGINT) AS n_bands_shared,
           emb.cosine AS cosine,
           (CASE WHEN mh.n_bands_shared IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN emb.cosine IS NOT NULL THEN 1 ELSE 0 END) AS n_signals
    FROM mh FULL JOIN emb USING (doc_a, doc_b)
    """


@register("dedup_consensus", _consensus_sql())
def q_dedup_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal near-dup consensus: the full-outer union of the
    MinHash-LSH (text) and embedding-cosine candidate pair sets, with
    per-signal provenance and an agreement count — the production shape
    where several cheap detectors vote before an expensive adjudication
    or human review. doc_id and vec_id coincide by construction in the
    driver tables.

    Scale: both inputs are bucket-bounded candidate sets (never N²), so
    the full-outer equi-join on pair ids shuffles only candidate pairs —
    a vanishing fraction of the corpus; at 100 TB both sides would be
    persisted bucketed by (id_a, id_b) making this join co-located."""
    mh = q_dedup_minhash_lsh_ref(spark, sf_dir).select(
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        "n_bands_shared",
    )
    emb = q_dedup_embedding_cosine_ref(spark, sf_dir).select(
        F.col("vec_a").alias("id_a"), F.col("vec_b").alias("id_b"), "cosine"
    )
    joined = mh.join(emb, ["id_a", "id_b"], "full")
    return joined.select(
        "id_a",
        "id_b",
        F.coalesce(F.col("n_bands_shared"), F.lit(0)).cast("bigint").alias(
            "n_bands_shared"
        ),
        "cosine",
        (
            F.when(F.col("n_bands_shared").isNotNull(), 1).otherwise(0)
            + F.when(F.col("cosine").isNotNull(), 1).otherwise(0)
        ).alias("n_signals"),
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary
# ---------------------------------------------------------------------------

VOCAB_TOP_N = 100

_VOCAB_SQL = f"""
    SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM (SELECT UNNEST({_sql_shingles("text", 2)}) AS gram FROM documents)
    GROUP BY gram
    ORDER BY n_occurrences DESC, gram
    LIMIT {VOCAB_TOP_N}
"""


@register("vocab_top_ngrams", _VOCAB_SQL)
def q_vocab_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-N word bigrams — the frequency pass behind
    vocabulary/BPE-merge construction and corpus drift monitoring.
    Map-side partial counts shrink the shuffle to distinct grams per
    partition, and the ordered LIMIT compiles to TakeOrderedAndProject:
    each partition keeps a 100-row heap and the driver merges heaps —
    no global sort materializes at any scale. (count DESC, gram) is a
    total order, so the cut is deterministic on both engines."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(shingles_col("text", 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "gram")
        .limit(VOCAB_TOP_N)
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# patterns stay in the Java ∩ RE2 common dialect (classes, \d, \b, {m,n})
# so Spark and the DuckDB oracle match identically
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d\- ]{7,14}\d", "[PHONE]"),
)


def scrub_pii(text: F.Column) -> F.Column:
    """Text with emails → [EMAIL], IPv4s → [IP], phone-like digit runs →
    [PHONE], scrubbed in that order (emails first — they contain digits
    and dots the later patterns could bite into). Map-only at any scale."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: F.Column) -> list[F.Column]:
    """One count column per PII class, measured independently on the
    original text (aliased n_<class>)."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def _pii_sql_scrub(expr: str) -> str:
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


_PII_SQL = f"""
    SELECT doc_id,
           {", ".join(
               f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
               for name, pat, _ in PII_PATTERNS
           )},
           md5({_pii_sql_scrub("text")}) AS clean_hash
    FROM documents
"""


@register("text_pii_scrub", _PII_SQL)
def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: per-document counts of each PII class plus the
    hash of the scrubbed text (the hash oracles the full replacement
    output without shipping the text twice). Pure regexp projection —
    pipelines into the scan, shuffle-free at any scale. The synthetic
    corpus contains no PII, so driver counts are 0 and the hash equals
    the raw text's — crafted-document tests exercise the hits."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        *pii_counts(F.col("text")),
        F.md5(scrub_pii(F.col("text")).cast("binary")).alias("clean_hash"),
    )


# ---------------------------------------------------------------------------
# Deterministic weighted / mixture sampling
# ---------------------------------------------------------------------------

_WSAMPLE_SQL = f"""
    SELECT doc_id, source,
           round(least(1.0, n_chars / 500.0), 6) AS weight
    FROM documents
    WHERE {_sql_accept_u(40503, 12345, 65539)} < least(1.0, n_chars / 500.0)
"""


@register("sample_weighted_hash", _WSAMPLE_SQL)
def q_sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling: accept each document with probability equal
    to a quality proxy (length-capped weight), decided by a deterministic
    arithmetic hash. Pipelines into the scan — no shuffle, no state; the
    weight column doubles as the loss/mixture reweight downstream."""
    d = load(spark, sf_dir, "documents")
    w = F.least(F.lit(1.0), F.col("n_chars") / F.lit(500.0))
    return (
        d.filter(_accept_u(40503, 12345, 65539) < w)
        .select("doc_id", "source", F.round(w, 6).alias("weight"))
    )


_MIX_SQL = f"""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_orig,
             CAST(SUM(n_chars) AS BIGINT) AS sc
      FROM documents GROUP BY source),
    s2 AS (
      SELECT source, n_orig,
             -- HUGEINT numerators: the DuckDB twin of the Spark side's
             -- DECIMAL(38,0) widening (sc·2e9 wraps int64 past ~4.6e9
             -- total chars per source — ADVICE r8, medium)
             CAST((CAST(sc AS HUGEINT) * 2000000000 + n_orig)
                  // (2 * n_orig) AS BIGINT) AS a9
      FROM s),
    r AS (
      SELECT source, n_orig,
             CAST(least(1000000,
                        (CAST(a9 AS HUGEINT) * 2000000
                         + (SELECT max(a9) FROM s2))
                        // (2 * (SELECT max(a9) FROM s2))) AS BIGINT)
                 / 1000000.0 AS rate
      FROM s2),
    k AS (
      SELECT d.source, count(*) AS c
      FROM documents d JOIN r USING (source)
      WHERE {_sql_accept_u(48271, 99991, 69621)} < r.rate
      GROUP BY d.source)
    SELECT source, n_orig, rate, CAST(COALESCE(k.c, 0) AS BIGINT) AS n_sampled
    FROM r LEFT JOIN k USING (source)
"""


@register("source_mixture_rebalance", _MIX_SQL)
def q_source_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional source mixing: each source's acceptance rate
    is its mean document quality (mean n_chars as the proxy) relative to
    the best source, applied per-row with a hash independent of the
    weighted-sampling hash. The rate table is O(#sources) rows → computed
    in one tiny aggregate, broadcast back onto the scan; the per-row
    decision is again a shuffle-free map-side filter.

    The rate is computed ENTIRELY in exact BIGINT fixed-point: the mean
    as a 9-dp integer ((2·S·10^9 + n) div 2n), the relative rate as a
    6-dp integer half-up against the max mean, then ONE exact /10^6 —
    review r8 found the previous round(double_ratio, 6) sat in the
    engine-divergent rounding-boundary class (Spark BigDecimal HALF_UP
    vs DuckDB binary rounding), and the rate feeds the acceptance
    FILTER, so a one-ulp disagreement would flip n_sampled. The 9-dp
    intermediate bounds the drift from the true mean ratio at 1e-9
    relative; both scaled numerators compute in DECIMAL(38,0) (DuckDB
    twin: HUGEINT), because the old BIGINT products overflowed int64
    past ~4.6e9 total chars per source / ~4.6e12 a9 — bounds a 100 TB
    corpus exceeds trivially (ADVICE r8, medium: ANSI mode, the Spark 4
    default here, aborts the job on that overflow; legacy non-ANSI
    silently corrupts the rate feeding the acceptance FILTER)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_orig"),
        F.sum("n_chars").cast("bigint").alias("sc"),
    )
    s2 = s.select(
        "source",
        "n_orig",
        F.expr(
            "(CAST(sc AS DECIMAL(38,0)) * 2000000000 + n_orig)"
            " div (2 * n_orig)"
        ).alias("a9"),
    )
    mx = s2.agg(F.max("a9").alias("ma9"))
    rates = s2.crossJoin(F.broadcast(mx)).select(
        "source",
        "n_orig",
        (
            F.expr(
                "least(1000000L, (CAST(a9 AS DECIMAL(38,0)) * 2000000"
                " + ma9) div (2 * ma9))"
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("rate"),
    )
    kept = (
        d.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(_accept_u(48271, 99991, 69621) < F.col("rate"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"))
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_orig",
        "rate",
        F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
    )


# ---------------------------------------------------------------------------
# Character-distribution entropy (quality scoring)
# ---------------------------------------------------------------------------

_ENTROPY_SQL = """
    WITH ch AS (
      SELECT doc_id,
             UNNEST(list_filter(regexp_split_to_array(text, ''), c -> c <> ''))
                 AS ch
      FROM documents),
    cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_chars_counted,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           round(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS char_entropy
    FROM cnt
    GROUP BY doc_id
"""


@register("text_char_entropy", _ENTROPY_SQL)
def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document (nats) — the
    cheap perplexity proxy quality scorers use: gibberish and
    boilerplate sit at the distribution tails. Identity
    H = ln(n) − Σ c·ln(c) / n avoids a per-character probability join;
    the plan is explode → two partial-aggregated groupBys keyed by
    doc_id — no join, scale-linear."""
    d = load(spark, sf_dir, "documents")
    ch = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", ""), lambda c: c != "")).alias("ch"),
    )
    cnt = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    return cnt.groupBy("doc_id").agg(
        n.cast("bigint").alias("n_chars_counted"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
        F.round(
            F.log(n) - F.sum(F.col("c") * F.log("c")) / n, 6
        ).alias("char_entropy"),
    )

# ---------------------------------------------------------------------------
# Model-based quality scoring: corpus unigram language model
# ---------------------------------------------------------------------------

UNIGRAM_VOCAB_V = 50_000  # production knob: top-V tokens kept in the LM


_UNIGRAM_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_sql_tokens("text")}) AS tok FROM documents),
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    vocab AS (
      SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT {UNIGRAM_VOCAB_V}),
    st AS (SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM cnt) AS n,
                  (SELECT count(*) FROM vocab) AS v)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln((COALESCE(vocab.c, 0) + 1.0) / (st.n + st.v + 1))), 6)
               AS avg_nll
    FROM toks LEFT JOIN vocab USING (tok) CROSS JOIN st
    GROUP BY doc_id
"""


@register("text_unigram_logprob", _UNIGRAM_SQL)
def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality score: mean per-token negative log-likelihood
    under a Laplace-smoothed corpus unigram LM — the cheap end of the
    CCNet-style (Wenzek et al. 2020) LM-perplexity filter, with the
    corpus itself as the model. p(t) = (c(t)+1) / (N+V+1), where c is
    the corpus count (0 outside the top-V vocabulary), N the total token
    occurrences and V the vocabulary size (+1 for the OOV class); high
    avg_nll marks gibberish / rare-token soup, low marks boilerplate.

    100 TB shape: the corpus is scanned and shuffled on token once
    (partial-aggregated counts), the vocabulary is CAPPED at top-V by
    (count, token) — TakeOrderedAndProject, per-partition heaps, never a
    global sort — so the model side is provably broadcast-sized no
    matter how heavy the token tail is; N and V ride along as a 1-row
    broadcast. The scoring pass then joins tokens map-side and
    re-aggregates per doc_id. Two corpus shuffles total, model cost
    independent of corpus size."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = cnt.orderBy(F.col("c").desc(), "tok").limit(UNIGRAM_VOCAB_V)
    st = (
        cnt.agg(F.sum("c").cast("bigint").alias("n"))
        .crossJoin(F.broadcast(vocab.agg(F.count(F.lit(1)).alias("v"))))
    )
    nll = -F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("n") + F.col("v") + 1)
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(st))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(nll), 6).alias("avg_nll"),
        )
    )


# ---------------------------------------------------------------------------
# The composed curation pipeline, driver-attested (r10)
# ---------------------------------------------------------------------------

# Driver-facing signal for the COMPOSED pipeline (r10, the 4th and last
# new-registration slot): every stage's arithmetic is individually
# oracle-proven exact (text_repetition_metrics, text_pii_scrub,
# dedup_exact_hash's md5 grouping, sample_weighted_hash), so the composed
# oracle is their literal composition — repetition keep → scrub → lowest-
# doc_id-per-content dedup → hash-acceptance sampling, in curate()'s
# exact stage order.
_CURATE_SQL = f"""
    WITH rep AS (
      SELECT doc_id FROM ({_REP_SQL}) WHERE keep = 1),
    kept AS (
      SELECT d.doc_id, d.lang, d.source, d.n_chars,
             {_pii_sql_scrub("d.text")} AS text
      FROM documents d JOIN rep USING (doc_id)),
    dd AS (
      SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM kept)
    SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
           md5(text) AS clean_hash
    FROM dd
    WHERE rn = 1 AND {_sql_accept_u(40503, 12345, 65539)}
          < least(1.0, n_chars / 500.0)
"""


@register("curation_pipeline", _CURATE_SQL)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing signal for :func:`curate` — the composed end-to-end
    curation chain (repetition filter → PII scrub → exact dedup keeping
    the lowest doc_id per content → deterministic weighted sampling),
    previously pinned only by tests/test_curation.py. The oracle is the
    literal SQL composition of the four stage oracles in the same order,
    so a green row attests the COMPOSITION: stage order, the scrub
    feeding the dedup hash, and the sampling hash running on the deduped
    survivors. ``clean_hash`` digests the scrubbed text so the full
    rewrite output is value-checked without shipping text. Scale shape
    (unchanged from curate()): everything before the dedup window fuses
    into one map-only projection over the scan; the dedup
    hash-partition is the single shuffle; sampling is a map-side
    filter."""
    d = load(spark, sf_dir, "documents")
    out = curate(d)
    return out.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5(F.col("text").cast("binary")).alias("clean_hash"),
    )
