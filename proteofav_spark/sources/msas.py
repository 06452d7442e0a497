"""Multiple-sequence-alignment reader (FASTA / Stockholm) + description
field extraction.

Spark-first: no Biopython. Records are reassembled with distributed
primitives — a running ``sum(is_header)`` window assigns record ids to FASTA
lines, and Stockholm sequence chunks group-concatenate by sequence name —
then the description fields parse with a JVM-side ``regexp_extract`` chain
mirroring the reference's regex hierarchy.

Parity targets:
- read_alignments / read_msas            proteofav/msas.py:32-64, :67-109
- parse_uniprot_fasta_seq_description    proteofav/msas.py:163-204
- parse_pfam_sth_seq_description         proteofav/msas.py:207-231
- parse_cath_sth_seq_description         proteofav/msas.py:234-253
- parse_cath_fasta_seq_description       proteofav/msas.py:256-311
- parse_generic_seq_description          proteofav/msas.py:314-390
  (network-backed UniProt id resolution is out of scope offline —
   get_uniprot_id fetches are a staging concern, not a table op)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from proteofav_spark.core import EmptyTableError, with_line_no

# <Accession-or-Name>/<Start>-<End>
_GENERIC = r"([A-Z0-9]+_?[a-zA-Z0-9]+)/(-?[0-9]+)-(-?[0-9]+)"
_UNIPROT_FASTA = r"([a-zA-Z]+)\|([a-zA-Z0-9]+)\|([A-Z0-9]+_[A-Z0-9]+)"
_CATH_FASTA = r"([a-zA-Z]+)\|([0-9](?:.|-)[0-9](?:.|-)[0-9])\|([a-zA-Z0-9]+/-?[0-9]+--?[0-9]+)"
_CATH_DOMAIN = r"^([a-zA-Z0-9]{4})([a-zA-Z0-9])([0-9][0-9])/"
# Pfam Stockholm: <UPPER>_<UPPER>/<start>-<end> (proteofav/msas.py:219)
_PFAM_STH = r"[A-Z0-9]+_[A-Z0-9]+/-?[0-9]+--?[0-9]+"
# CATH Stockholm: <alnum>/<start>-<end> (proteofav/msas.py:245)
_CATH_STH = r"[a-zA-Z0-9]+/-?[0-9]+--?[0-9]+"


def _file_w():
    return W.partitionBy("source_file").orderBy("line_no")


def read_fasta_records(spark: SparkSession, path: str) -> DataFrame:
    """FASTA → one row per record: (description, Sequence). Record
    reassembly = running count of '>' headers, then one groupBy."""
    text = with_line_no(spark.read.text(path)).withColumn(
        "source_file", F.input_file_name()
    )
    is_header = F.col("value").startswith(">").cast("int")
    rec = F.sum(is_header).over(_file_w().rowsBetween(W.unboundedPreceding, 0))
    df = text.withColumn("rec_id", rec).filter(F.col("rec_id") > 0)
    return (
        df.groupBy("source_file", "rec_id")
        .agg(
            F.min("line_no").alias("line_no"),
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "line_no",
                            F.when(
                                ~F.col("value").startswith(">"), F.trim(F.col("value"))
                            )
                            .otherwise(F.lit(""))
                            .alias("chunk"),
                        )
                    )
                ).getField("chunk"),
            ).alias("Sequence"),
            F.max(
                F.when(
                    F.col("value").startswith(">"),
                    F.regexp_replace(F.col("value"), "^>", ""),
                )
            ).alias("description"),
        )
        .drop("rec_id")
    )


def read_stockholm_records(spark: SparkSession, path: str) -> DataFrame:
    """Stockholm → one row per sequence name; chunks from interleaved blocks
    concatenate in line order. Markup (#…) and terminator (//) lines drop."""
    text = with_line_no(spark.read.text(path)).withColumn(
        "source_file", F.input_file_name()
    )
    v = F.trim(F.col("value"))
    seq_lines = text.filter(
        (F.length(v) > 0) & ~v.startswith("#") & ~v.startswith("//")
    )
    parts = F.split(v, r"\s+")
    df = seq_lines.select(
        "source_file",
        "line_no",
        parts.getItem(0).alias("description"),
        parts.getItem(1).alias("chunk"),
    ).filter(F.col("chunk").isNotNull())
    return df.groupBy("source_file", "description").agg(
        F.min("line_no").alias("line_no"),
        F.concat_ws(
            "",
            F.array_sort(F.collect_list(F.struct("line_no", "chunk"))).getField(
                "chunk"
            ),
        ).alias("Sequence"),
    )


def read_clustal_records(spark: SparkSession, path: str) -> DataFrame:
    """Clustal (.aln/.clw) → one row per sequence name. Layout: a
    'CLUSTAL'/'MUSCLE' header line, then interleaved blocks of
    ``name  chunk [cum_count]`` lines; conservation lines (only
    ``* : .`` and spaces) start with whitespace and drop out with the
    blank lines. Chunks group-concatenate by name in line order —
    the same distributed reassembly shape as Stockholm."""
    text = with_line_no(spark.read.text(path)).withColumn(
        "source_file", F.input_file_name()
    )
    v = F.col("value")
    seq_lines = text.filter(
        (F.length(F.trim(v)) > 0)
        & ~v.rlike(r"^(CLUSTAL|MUSCLE)")   # format header
        & ~v.rlike(r"^\s")                 # conservation / markup lines
    )
    parts = F.split(F.trim(v), r"\s+")
    df = seq_lines.select(
        "source_file",
        "line_no",
        parts.getItem(0).alias("description"),
        parts.getItem(1).alias("chunk"),
    ).filter(F.col("chunk").isNotNull() & ~F.col("chunk").rlike(r"^[0-9]+$"))
    return df.groupBy("source_file", "description").agg(
        F.min("line_no").alias("line_no"),
        F.concat_ws(
            "",
            F.array_sort(F.collect_list(F.struct("line_no", "chunk"))).getField(
                "chunk"
            ),
        ).alias("Sequence"),
    )


def _parse_description(df: DataFrame, seq_format: str) -> DataFrame:
    """Regex hierarchy over the record description → Source / Collection /
    Accession / Name / Start / End / pdb_id / chain_id / domain_id.

    Parity is with the reference's format-GATED dispatch
    (parse_sequence_info_from_description, proteofav/msas.py:112-160):
    fasta tries UniProt then CATH and never falls back to the generic
    parser; stockholm tries Pfam then CATH (whose branch stamps
    Source='CATH' unconditionally, :234-253); only other formats run the
    generic parser on the whole description. The generic pieces
    (Name/Accession/Start/End/domain) therefore come from the BRANCH's
    matched substring, not the raw description — e.g. CATH-fasta's
    nested generic search (:282-288) re-scans inside the cath match, so
    'biomap|4.1.0|b7f28…/29-337' yields the reference's leading-char-
    dropping Accession quirk. The Accession fallback is the reference's
    identifier regex ``([a-zA-Z0-9])+/`` (:324-329): no underscore in
    the class, so 'B9LRY6_HALLT/44-372' → Accession 'HALLT' (offline;
    the network get_uniprot_id overwrite is out of scope)."""
    df = df.withColumnRenamed("description", "raw_description")
    d = F.col("raw_description")
    uni = F.regexp_extract(d, _UNIPROT_FASTA, 0)
    cath_f = F.regexp_extract(d, _CATH_FASTA, 0)
    pfam_m = F.regexp_extract(d, _PFAM_STH, 0)
    cath_s = F.regexp_extract(d, _CATH_STH, 0)

    if seq_format == "fasta":
        # generic fields only via CATH-fasta's nested re-scan; a bare
        # 'P00439/24-145' fasta header parses NOTHING in the reference
        gen = F.regexp_extract(cath_f, _GENERIC, 0)
        source = F.when(uni != "", F.lit("UniProt")).when(
            cath_f != "", F.lit("CATH")
        )
        collection = (
            F.when(uni != "", F.regexp_extract(d, _UNIPROT_FASTA, 1))
            .when(cath_f != "", F.regexp_extract(d, _CATH_FASTA, 1))
        )
        version = F.when(cath_f != "", F.regexp_extract(d, _CATH_FASTA, 2))
        accession = F.when(uni != "", F.regexp_extract(d, _UNIPROT_FASTA, 2))
        name = F.when(uni != "", F.regexp_extract(d, _UNIPROT_FASTA, 3))
        matched = F.when(uni != "", uni).when(cath_f != "", cath_f)
    elif seq_format == "stockholm":
        gen = F.when(pfam_m != "", F.regexp_extract(pfam_m, _GENERIC, 0)).otherwise(
            F.regexp_extract(cath_s, _GENERIC, 0)
        )
        # CATH is the unconditional fallback Source for stockholm —
        # the reference sets it even when nothing else parses
        source = F.when(pfam_m != "", F.lit("Pfam")).otherwise(F.lit("CATH"))
        collection = F.lit(None).cast("string")
        version = F.lit(None).cast("string")
        accession = F.lit(None).cast("string")
        name = F.lit(None).cast("string")
        # only the Pfam branch emits a Description remainder (:228-231);
        # the CATH-sth branch never touches Description
        matched = F.when(pfam_m != "", pfam_m)
    else:  # clustal / phylip: generic descriptions only — the reference
        # routes non-fasta/non-stockholm through
        # parse_generic_seq_description, whose Source is 'GenericParser'
        # (proteofav/msas.py:152-157,384); labeling them Pfam/CATH
        # misattributed a database source (review r8)
        gen = F.regexp_extract(d, _GENERIC, 0)
        source = F.when(gen != "", F.lit("GenericParser"))
        collection = F.lit(None).cast("string")
        version = F.lit(None).cast("string")
        accession = F.lit(None).cast("string")
        name = F.lit(None).cast("string")
        matched = F.when(gen != "", gen)

    # generic pieces from the branch's matched substring
    g_name = F.regexp_extract(gen, r"([A-Z0-9]+_[a-zA-Z0-9]+)/", 1)
    g_ident = F.regexp_extract(gen, r"([a-zA-Z0-9]+)/", 1)
    g_start = F.regexp_extract(gen, _GENERIC, 2)
    g_end = F.regexp_extract(gen, _GENERIC, 3)
    # the domain pattern anchors on the *generic match* (e.g. '1hm3A01/27-338'),
    # not the whole description (reference: proteofav/msas.py:344-352)
    dom = F.regexp_extract(gen, _CATH_DOMAIN, 0)

    out = df.withColumn("Seq_Format", F.lit(seq_format))
    out = out.withColumn("Source", source)
    out = out.withColumn(
        "Collection",
        F.when(dom != "", F.lit("cath")).otherwise(collection),
    )
    out = out.withColumn("Version", version)
    out = out.withColumn(
        "Accession",
        F.coalesce(accession, F.nullif(g_ident, F.lit(""))),
    )
    out = out.withColumn("Name", F.coalesce(name, F.nullif(g_name, F.lit(""))))
    out = out.withColumn("Start", F.nullif(g_start, F.lit("")).cast("bigint"))
    out = out.withColumn("End", F.nullif(g_end, F.lit("")).cast("bigint"))
    out = out.withColumn("pdb_id", F.when(dom != "", F.regexp_extract(gen, _CATH_DOMAIN, 1)))
    out = out.withColumn("chain_id", F.when(dom != "", F.regexp_extract(gen, _CATH_DOMAIN, 2)))
    out = out.withColumn(
        "domain_id",
        F.when(dom != "", F.concat(
            F.regexp_extract(gen, _CATH_DOMAIN, 1),
            F.regexp_extract(gen, _CATH_DOMAIN, 2),
            F.regexp_extract(gen, _CATH_DOMAIN, 3),
        )),
    )
    # reference sets both keys to the same value (:347-348)
    out = out.withColumn("Domain", F.col("domain_id"))
    out = out.withColumn(
        "Description",
        # reference: remainder only when the branch matched AND the
        # description extends beyond the match; else the key is absent
        F.when(
            matched.isNotNull() & (d != matched),
            F.trim(F.replace(d, matched, F.lit(""))),
        ),
    )
    return out


def read_phylip_records(spark: SparkSession, path: str) -> DataFrame:
    """PHYLIP (interleaved or single-block sequential) → one row per
    sequence. Layout: a ``N L`` count header, a first block of
    ``name(10 chars) sequence`` lines, then name-less continuation
    blocks in the same order. Line index mod N assigns continuation
    chunks to sequences; the count header is the only driver-side read
    (two integers)."""
    text = with_line_no(spark.read.text(path)).withColumn(
        "source_file", F.input_file_name()
    )
    # the N-sequence count header is per file; this reader is one-file-
    # per-call (like the reference's AlignIO.read) — a glob with several
    # files would scramble rec = rn % N assignments, so reject it
    n_files = text.select("source_file").distinct().count()
    if n_files > 1:
        raise ValueError(
            f"PHYLIP reader handles one file per call, got {n_files}: {path}"
        )
    head = text.orderBy("line_no").first()
    if head is None:
        raise ValueError(f"not a PHYLIP file (empty file): {path}")
    try:
        n_seqs = int(head["value"].split()[0])
    except (ValueError, IndexError, AttributeError):
        raise ValueError(f"not a PHYLIP file (bad count header): {path}")
    if n_seqs <= 0:
        # 'rn % 0' is NULL in Spark — a zero count would silently produce
        # one garbage record instead of an error (review r8)
        raise ValueError(f"not a PHYLIP file (sequence count {n_seqs}): {path}")
    v = F.col("value")
    seq_lines = (
        text.filter(F.col("line_no") > head["line_no"])
        .filter(F.length(F.trim(v)) > 0)
        .withColumn(
            "rn",
            F.row_number().over(_file_w()) - 1,
        )
        .withColumn("rec", F.col("rn") % n_seqs)
    )
    first_block = seq_lines.filter(F.col("rn") < n_seqs).select(
        "source_file", "rec",
        F.trim(F.substring(v, 1, 10)).alias("description"),
        F.regexp_replace(F.substring(v, 11, 1 << 20), r"\s", "").alias("chunk"),
        "line_no",
    )
    rest = seq_lines.filter(F.col("rn") >= n_seqs).select(
        "source_file", "rec",
        F.lit(None).cast("string").alias("description"),
        F.regexp_replace(v, r"\s", "").alias("chunk"),
        "line_no",
    )
    return (
        first_block.unionByName(rest)
        .groupBy("source_file", "rec")
        .agg(
            F.min("line_no").alias("line_no"),
            F.max("description").alias("description"),
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(F.struct("line_no", "chunk"))
                ).getField("chunk"),
            ).alias("Sequence"),
        )
        .drop("rec")
    )


def guess_seq_format(filename: str) -> str | None:
    """Extension-based MSA format guess (parity:
    proteofav/msas.py:50-58: .fasta/.fa → fasta, .sto/.sth → stockholm,
    .aln/.clw → clustal)."""
    if filename.endswith((".fasta", ".fa")):
        return "fasta"
    if filename.endswith((".sto", ".sth")):
        return "stockholm"
    if filename.endswith((".aln", ".clw")):
        return "clustal"
    if filename.endswith((".phy", ".phylip")):
        return "phylip"
    return None


def read_msas(
    spark: SparkSession,
    filename: str,
    seq_format: str | None = None,
) -> DataFrame:
    """Scan an MSA file → one row per aligned sequence with parsed fields.
    ``seq_format=None`` (the DEFAULT, reference parity — the old 'fasta'
    default mis-parsed a .sth passed without an explicit format into an
    EmptyTableError) guesses from the file extension; format names are
    case-normalized and unknown names fall back to guessing, exactly
    like the reference (proteofav/msas.py:44-59).

    Parity: read_msas proteofav/msas.py:67-109 (formats: fasta,
    stockholm, clustal — proteofav/msas.py:32-64; + phylip).
    """
    if seq_format is not None:
        seq_format = seq_format.lower()
        if seq_format not in (
            "fasta", "stockholm", "sth", "clustal", "clw", "phylip", "phy"
        ):
            seq_format = None
    if seq_format is None:
        seq_format = guess_seq_format(filename)
        if seq_format is None:
            raise ValueError(f"Alignment format unrecognised: {filename}")
    if seq_format == "fasta":
        recs = read_fasta_records(spark, filename)
    elif seq_format in ("stockholm", "sth"):
        recs = read_stockholm_records(spark, filename)
        seq_format = "stockholm"
    elif seq_format in ("clustal", "clw"):
        recs = read_clustal_records(spark, filename)
        seq_format = "clustal"
    elif seq_format in ("phylip", "phy"):
        recs = read_phylip_records(spark, filename)
        seq_format = "phylip"
    else:
        raise ValueError(f"unsupported MSA format: {seq_format}")
    out = _parse_description(recs, seq_format)
    if out.isEmpty():
        raise EmptyTableError(f"MSA file {filename} produced no records")
    return out
