"""Per-source singleton facades with the uniform read / write / select /
download protocol (parity: GenericInputs proteofav/utils.py:457-482 and the
per-source singletons — PDB/mmCIF structures.py:1030-1053, SIFTS
sifts.py:456-474, DSSP dssp.py:432-449, Validation validation.py:195-212,
Annotation annotation.py:178-195, Variants variants.py:703-715, MSA
msas.py:530-546).

``select(identifier)`` = download-if-missing (driver-side staging) →
``read`` (lazy Spark plan) → filter pipeline → canonical DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from proteofav_spark import fetchers
from proteofav_spark.config import defaults


class GenericSource:
    """Shared identifier/filename/table memoization."""

    #: subclasses set: name, db_attr, ext, url_builder
    name = "generic"
    db_attr = "db_lake"
    ext = ""
    #: kwarg names ``select()`` must route to ``download()``/``url()``
    #: instead of ``read()`` (review r9: bio_unit etc. previously never
    #: reached the URL builder from select, so a bio-unit select read
    #: the cached asym-unit file)
    url_kwargs: tuple[str, ...] = ()

    def __init__(self, spark: SparkSession | None = None) -> None:
        self._spark = spark
        self._identifier: str | None = None
        self._filename: str | None = None
        self._table: DataFrame | None = None

    # -- protocol ----------------------------------------------------------
    def spark(self, spark: SparkSession | None = None) -> SparkSession:
        if spark is not None:
            self._spark = spark
        if self._spark is None:
            from proteofav_spark.session import get_spark

            self._spark = get_spark()
        return self._spark

    def identifier(self, identifier: str | None = None) -> str:
        if identifier is not None:
            if identifier != self._identifier:
                # a new entry invalidates the memoized path and table
                self._filename = None
                self._table = None
            self._identifier = identifier
        if self._identifier is None:
            raise ValueError("An Identifier is needed!")
        return self._identifier

    def filename(self, filename: str | None = None) -> str:
        if filename is not None:
            self._filename = filename
        if self._filename is None and self._identifier is not None:
            self._filename = self.staged_path(self._identifier)
        if self._filename is None:
            raise ValueError("A filename is needed!")
        return self._filename

    def staged_path(self, identifier: str, **url_kwargs) -> str:
        """Cache path an identifier stages under; sources whose URL
        kwargs change the artifact (mmCIF bio units, MSA formats)
        override this so distinct artifacts never share a cache file."""
        cache_dir = getattr(defaults, self.db_attr)
        return os.path.join(cache_dir, f"{identifier}{self.ext}")

    def table(self, table: DataFrame | None = None) -> DataFrame:
        if table is not None:
            self._table = table
        if self._table is None:
            raise ValueError("A Spark DataFrame is needed!")
        return self._table

    def download(self, identifier: str | None = None, filename: str | None = None,
                 overwrite: bool = False, **kwargs) -> str:
        ident = self.identifier(identifier)
        if filename is None:
            # review r10 (ADVICE): url kwargs must route to the cache
            # name on EVERY entry point — a direct
            # ``mmCIF.download(id, bio_unit=True)`` previously staged
            # the bio-unit payload at the asym path (or silently
            # returned the existing asym file as "already staged"),
            # violating the per-artifact-cache invariant.
            url_kw = {k: kwargs[k] for k in kwargs if k in self.url_kwargs}
            filename = self.staged_path(ident, **url_kw)
        fname = self.filename(filename)
        if os.path.exists(fname) and not overwrite:
            # already staged — don't even build the URL (sources without a
            # public mirror, e.g. DSSP, stage files out of band)
            return fname
        url = self.url(ident, **kwargs)
        fetchers.Downloader(
            url, fname, decompress=url.endswith(".gz"), overwrite=overwrite,
        )
        return fname

    def url(self, identifier: str, **kwargs) -> str:
        raise NotImplementedError

    def read(self, filename: str | None = None, **kwargs) -> DataFrame:
        raise NotImplementedError

    def select(self, identifier: str | None = None, overwrite: bool = False,
               **kwargs) -> DataFrame:
        """download-if-missing → read → filter pipeline. Review r9
        fixes, both parity divergences from the reference select_*
        functions (e.g. proteofav/structures.py:739-774):
        - ``overwrite=True`` now RE-downloads an already-staged file
          (the reference always reaches Downloader, whose overwrite
          branch re-fetches; the old guard skipped download entirely);
        - kwargs named in ``url_kwargs`` route to download()/url() and
          into ``staged_path`` (a bio-unit select previously built the
          asym-unit URL and cache name)."""
        ident = self.identifier(identifier)
        url_kw = {
            k: kwargs.pop(k) for k in tuple(kwargs) if k in self.url_kwargs
        }
        # select() ALWAYS derives the cache path from the identifier +
        # url kwargs, like the reference's select_* functions (which
        # never consult a memoized filename) — url kwargs select a
        # DIFFERENT artifact (bio unit, fasta MSA) and two artifacts
        # must never share a cache file. Custom local paths go through
        # read()/filename() directly, as in the reference.
        self._filename = fname = self.staged_path(ident, **url_kw)
        if overwrite or not os.path.exists(fname):
            # pass the computed path THROUGH (review r10, ADVICE high):
            # letting download() re-derive it dropped the url kwargs in
            # _MSA.download, which reset self._filename and recomputed
            # the default — a fasta select downloaded to the .sth slot
            # (read() then missed the file AND the fasta payload
            # poisoned the Stockholm cache entry).
            self.download(ident, fname, overwrite=overwrite, **url_kw)
        self._table = self.read(fname, **kwargs)
        return self._table


class _MMCIF(GenericSource):
    name, db_attr, ext = "mmcif", "db_mmcif", ".cif"
    url_kwargs = ("bio_unit", "bio_unit_id", "bio_unit_preferred")

    def _assembly_id(self, identifier, bio_unit_id="1", bio_unit_preferred=False):
        """Resolve the assembly id ONCE per identifier: ``staged_path``
        and ``url`` both need it, and the preferred lookup is a network
        round-trip (PDBe summary API) — memoized so a single select
        fetches the summary exactly once."""
        if not bio_unit_preferred:
            return str(bio_unit_id)
        cache = getattr(self, "_pref_assembly", None)
        if cache is None:
            cache = self._pref_assembly = {}
        if identifier not in cache:
            cache[identifier] = fetchers.get_preferred_assembly_id(identifier)
        return cache[identifier]

    def url(self, identifier, bio_unit=False, bio_unit_id="1",
            bio_unit_preferred=False):
        if bio_unit:
            aid = self._assembly_id(identifier, bio_unit_id, bio_unit_preferred)
            return fetchers.url_mmcif(identifier, bio_unit=True, bio_unit_id=aid)
        return fetchers.url_mmcif(identifier)

    def staged_path(self, identifier, bio_unit=False, bio_unit_id="1",
                    bio_unit_preferred=False, **url_kwargs):
        """Bio units stage as ``<id>_bio.cif`` (parity:
        proteofav/structures.py:756) — a bio-unit select must never
        read or clobber the asym-unit cache file. Non-default
        assemblies stage as ``<id>_bio-assembly-<k>.cif``: the
        reference keeps ONE ``_bio`` slot for every assembly (two
        selects with different ``bio_unit_id`` silently share a cache
        file), which violates this repo's per-artifact-cache invariant
        (reviews r9/r10) — distinct assemblies are distinct artifacts."""
        cache_dir = getattr(defaults, self.db_attr)
        if bio_unit:
            aid = self._assembly_id(identifier, bio_unit_id, bio_unit_preferred)
            stem = (
                f"{identifier}_bio"
                if aid == "1"
                else f"{identifier}_bio-assembly-{aid}"
            )
        else:
            stem = identifier
        return os.path.join(cache_dir, f"{stem}{self.ext}")

    def read(self, filename=None, **kwargs):
        from proteofav_spark.operators.structures import select_structures

        return select_structures(self.spark(), self.filename(filename), **kwargs)

    def write(self, table=None, filename=None, overwrite=False):
        from proteofav_spark.sinks.writers import write_mmcif_from_table

        write_mmcif_from_table(self.table(table), self.filename(filename), overwrite)


class _PDB(_MMCIF):
    name, db_attr, ext = "pdb", "db_pdb", ".pdb"
    url_kwargs = ()  # the PDB-format endpoint serves no bio units

    def url(self, identifier, **kwargs):
        return fetchers.url_pdb(identifier)

    def write(self, table=None, filename=None, overwrite=False):
        from proteofav_spark.sinks.writers import write_pdb_from_table

        write_pdb_from_table(self.table(table), self.filename(filename), overwrite)


class _SIFTS(GenericSource):
    name, db_attr, ext = "sifts", "db_sifts", ".xml"

    def url(self, identifier, **kwargs):
        return fetchers.url_sifts(identifier)

    def read(self, filename=None, **kwargs):
        from proteofav_spark.sources.sifts import select_sifts

        return select_sifts(self.spark(), self.filename(filename), **kwargs)


class _DSSP(GenericSource):
    name, db_attr, ext = "dssp", "db_dssp", ".dssp"

    def url(self, identifier, **kwargs):
        raise NotImplementedError(
            "public DSSP mirrors are gone; generate DSSP locally or stage "
            "files into defaults.db_dssp"
        )

    def read(self, filename=None, **kwargs):
        from proteofav_spark.sources.dssp import select_dssp

        return select_dssp(self.spark(), self.filename(filename), **kwargs)


class _Validation(GenericSource):
    name, db_attr, ext = "validation", "db_validation", "_validation.xml"

    def url(self, identifier, **kwargs):
        return fetchers.url_validation(identifier)

    def read(self, filename=None, **kwargs):
        from proteofav_spark.sources.validation import select_validation

        return select_validation(self.spark(), self.filename(filename), **kwargs)


class _Annotation(GenericSource):
    name, db_attr, ext = "annotation", "db_annotation", ".gff"

    def url(self, identifier, **kwargs):
        return fetchers.url_annotation(identifier)

    def read(self, filename=None, **kwargs):
        from proteofav_spark.sources.annotation import select_annotation

        return select_annotation(self.spark(), self.filename(filename), **kwargs)


class _Variants(GenericSource):
    name, db_attr, ext = "variants", "db_lake", ".json"

    def url(self, identifier, **kwargs):
        return fetchers.url_uniprot_variants(identifier)

    def read(self, filename=None, **kwargs):
        from proteofav_spark.sources.variants import flatten_uniprot_variants

        raw = self.spark().read.option("multiLine", True).json(
            self.filename(filename)
        )
        return flatten_uniprot_variants(raw, **kwargs)

    def fetch(self, identifier=None, **kwargs):
        """Composed 3-source fetch → (uniprot, germline, somatic)
        (parity: _Variants.fetch, proteofav/variants.py:703-708)."""
        from proteofav_spark.sources.variants import fetch_variants

        ident = self.identifier(identifier)
        return fetch_variants(self.spark(), ident, **kwargs)

    def select_all(self, identifier=None, **kwargs):
        """Composed aggregation → (uniprot_table, ensembl_table)
        (parity: _Variants.select, proteofav/variants.py:709-715 —
        named select_all because GenericSource.select keeps the
        single-table UniProt staging contract this facade always had)."""
        from proteofav_spark.sources.variants import select_variants

        ident = self.identifier(identifier)
        return select_variants(self.spark(), ident, **kwargs)


class _MSA(GenericSource):
    name, db_attr, ext = "msa", "db_msas", ".sth"
    url_kwargs = ("aln_source", "seq_format", "aln_size")

    def url(self, identifier, aln_source="pfam", **kwargs):
        return fetchers.url_msa(identifier, aln_source=aln_source, **kwargs)

    def staged_path(self, identifier, aln_source="pfam", seq_format=None,
                    **url_kwargs):
        """Stage under ``<id>.<aln_source>.<ext>`` — the extension
        matches the ACTUAL format so read()'s guessing parses
        correctly, and the source is part of the name because a pfam
        and a cath alignment for the same identifier+format are
        distinct artifacts that must never share a cache file (review
        r10, ADVICE low)."""
        ext = ".fasta" if seq_format == "fasta" else ".sth"
        cache_dir = getattr(defaults, self.db_attr)
        return os.path.join(cache_dir, f"{identifier}.{aln_source}{ext}")

    def download(self, identifier=None, filename=None, overwrite=False,
                 aln_source="pfam", seq_format="stockholm", **kwargs):
        """Pfam alignments arrive GZIPPED (the URL has no .gz suffix, so
        the generic endswith('.gz') probe misses it) and both sources
        serve Stockholm by default — stage decompressed under an
        extension matching the actual format so read()'s guessing
        works. Review r10 (ADVICE high): an explicit ``filename`` is
        kept verbatim; a missing one derives from staged_path WITH the
        url kwargs — the old body reset ``self._filename`` and
        recomputed the kwarg-less default, sending fasta payloads into
        the Stockholm cache slot."""
        ident = self.identifier(identifier)
        if filename is None:
            filename = self.staged_path(
                ident, aln_source=aln_source, seq_format=seq_format
            )
        fname = self.filename(filename)
        if os.path.exists(fname) and not overwrite:
            return fname
        if aln_source == "cath":
            kwargs = {"seq_format": seq_format, **kwargs}
        url = self.url(ident, aln_source=aln_source, **kwargs)
        fetchers.Downloader(
            url, fname,
            decompress=(aln_source == "pfam") or url.endswith(".gz"),
            overwrite=overwrite,
        )
        return fname

    def read(self, filename=None, seq_format=None, **kwargs):
        from proteofav_spark.sources.msas import read_msas

        return read_msas(self.spark(), self.filename(filename), seq_format=seq_format)


mmCIF = _MMCIF()
PDB = _PDB()
SIFTS = _SIFTS()
DSSP = _DSSP()
Validation = _Validation()
Annotation = _Annotation()
Variants = _Variants()
MSA = _MSA()
