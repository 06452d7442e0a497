"""Network staging: per-source download-URL builders and a cached
Downloader. All network I/O is a *driver-side lake-staging concern* — the
Spark plans only ever read local/parquet paths. Offline environments get a
clear error instead of a hang.

Parity targets:
- Downloader                 proteofav/utils.py:402-454
- fetch_from_url_or_retry    proteofav/utils.py:36-94
- download_structures/...    proteofav/structures.py:968-1027,
  sifts.py:424-438, dssp.py:414-429, validation.py:178-192,
  annotation.py:161-175, msas.py:452-527
- API endpoint builders      proteofav/variants.py:52-224, sifts.py:441-453
"""

from __future__ import annotations

import gzip
import os
import shutil
import tempfile
import time
import urllib.request

from proteofav_spark.config import defaults


def fetch_from_url_or_retry(
    url: str,
    retry_in: tuple[int, ...] = (429, 500, 503),
    wait: float = 1.0,
    n_retries: int = 3,
    timeout: float = 30.0,
) -> bytes:
    """Iterative retry-on-status fetch (the reference retries recursively,
    proteofav/utils.py:85-88)."""
    last_err: Exception | None = None
    for _ in range(n_retries):
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as exc:  # type: ignore[attr-defined]
            last_err = exc
            if exc.code in retry_in:
                time.sleep(wait)
                continue
            raise
        except OSError as exc:
            last_err = exc
            time.sleep(wait)
    raise OSError(f"failed to fetch {url} after {n_retries} attempts: {last_err}")


class Downloader:
    """Download to a local cache path, optional gzip decompress, skip when
    present (parity: proteofav/utils.py:402-454).

    The cache file appears ATOMICALLY (staged under a UNIQUE
    ``<filename>.part<random>`` temp name in the same directory, then one
    ``os.replace``) — review r9: the old path wrote the final name
    directly, so a crash mid-write stranded a truncated file that every
    later call treated as already-staged (``exists and not overwrite``)
    and silently parsed. Review r10 (ADVICE low): the staging name is
    unique per writer, not the fixed ``<filename>.part`` — two
    concurrent downloads of the same entry previously shared one staging
    file, and the first finisher's cleanup deleted the other's in-flight
    copy, failing its ``os.replace`` even though its fetch succeeded.
    Leftover ``.part*`` temps from a crash are inert (never re-read) and
    each writer removes only its own."""

    def __init__(
        self, url: str, filename: str, decompress: bool = False, overwrite: bool = False
    ) -> None:
        self.url = url
        self.filename = filename
        if os.path.exists(filename) and not overwrite:
            return
        fd, part = tempfile.mkstemp(
            dir=os.path.dirname(filename) or ".",
            prefix=os.path.basename(filename) + ".part",
        )
        os.close(fd)
        staged = part + (".gz" if decompress else "")
        try:
            if url.startswith("file://"):
                src = url[len("file://"):]
                shutil.copyfile(src, staged)
            else:
                data = fetch_from_url_or_retry(url)
                with open(staged, "wb") as fh:
                    fh.write(data)
            if decompress:
                with gzip.open(staged, "rb") as zin, open(part, "wb") as out:
                    shutil.copyfileobj(zin, out)
                os.remove(staged)
            os.replace(part, filename)
        finally:
            for leftover in (part, part + ".gz"):
                if os.path.exists(leftover):
                    os.remove(leftover)


# --- URL builders (public endpoints; parity cited in module docstring) ----

def url_mmcif(
    identifier: str,
    bio_unit: bool = False,
    bio_unit_id: str = "1",
    bio_unit_preferred: bool = False,
) -> str:
    """AsymUnit or BioUnit mmCIF URL (parity: download_structures,
    proteofav/structures.py:995-1006 — BioUnit fetches
    ``<id>-assembly-<k>.cif.gz``, where ``k`` is ``bio_unit_id`` or, when
    ``bio_unit_preferred``, the PDBe summary API's preferred assembly)."""
    if bio_unit:
        if bio_unit_preferred:
            bio_unit_id = get_preferred_assembly_id(identifier)
        return f"{defaults.bio_fetch}{identifier}-assembly-{bio_unit_id}.cif.gz"
    return f"{defaults.pdbe_fetch}{identifier}.cif"


def get_preferred_assembly_id(identifier: str) -> str:
    """Preferred biological-assembly id from the PDBe entry-summary API
    (parity: proteofav/structures.py:660-687 get_preferred_assembly_id —
    when >1 assembly, the one flagged ``preferred``; exactly one, its id;
    ANY failure (network, shape, no preferred flag) falls back to "1")."""
    import json

    try:
        data = json.loads(fetch_from_url_or_retry(url_pdbe_summary(identifier)))
        assemblies = data[identifier][0]["assemblies"]
        if len(assemblies) > 1:
            pref = next(e["assembly_id"] for e in assemblies if e["preferred"])
        else:
            pref = assemblies[0]["assembly_id"]
        return str(pref)
    except Exception:
        return "1"


def url_pdb(identifier: str) -> str:
    return f"{defaults.pdbe_fetch}pdb{identifier}.ent"


def url_sifts(identifier: str) -> str:
    return f"{defaults.sifts_fetch}{identifier}.xml.gz"


def url_validation(identifier: str) -> str:
    return f"{defaults.validation_fetch}{identifier}_validation.xml"


def url_annotation(identifier: str) -> str:
    return f"{defaults.api_uniprot}{identifier}.gff"


def url_uniprot_variants(identifier: str) -> str:
    return f"{defaults.api_proteins}variation/{identifier}"


def url_ensembl_variants(identifier: str, somatic: bool = False) -> str:
    feature = "somatic_transcript_variation" if somatic else "transcript_variation"
    return (
        f"{defaults.api_ensembl}overlap/translation/{identifier}"
        f"?feature={feature};content-type=application/json"
    )


def url_icgc_variants(identifier: str) -> str:
    return f"{defaults.api_icgc}protein/{identifier}"


def url_pdb_uniprot_sifts_mapping(identifier: str) -> str:
    return f"{defaults.api_pdbe}mappings/uniprot/{identifier}"


def url_sifts_best(identifier: str) -> str:
    return f"{defaults.api_pdbe}mappings/best_structures/{identifier}"


def url_ensembl_sequence(identifier: str, protein: bool = True) -> str:
    """Ensembl sequence-by-id endpoint (parity:
    proteofav/variants.py:101-119)."""
    url = f"{defaults.api_ensembl}sequence/id/{identifier}"
    if protein:
        url += "?type=protein"
    return url


def url_uniprot_ensembl_xref(identifier: str, species: str = "homo_sapiens") -> str:
    """UniProt accession → Ensembl ids via the xrefs/symbol mapping
    (parity: proteofav/variants.py:122-141; species validated against the
    public Ensembl registry)."""
    from proteofav_spark.library import VALID_ENSEMBL_SPECIES

    if species not in VALID_ENSEMBL_SPECIES:
        raise ValueError(f"Provided species {species} is not valid")
    return f"{defaults.api_ensembl}xrefs/symbol/{species}/{identifier}"


def url_ensembl_uniprot_xref(identifier: str) -> str:
    """Ensembl protein id → UniProt ids via xrefs/id (parity:
    proteofav/variants.py:144-161)."""
    return f"{defaults.api_ensembl}xrefs/id/{identifier}"


def url_uniprot_species(identifier: str) -> str:
    """Organism column for a UniProt id, tab format (parity:
    proteofav/variants.py:164-177)."""
    return f"{defaults.api_uniprot}?query={identifier}&columns=organism&format=tab"


def url_uniprot_id_from_name(identifier: str) -> str:
    """UniProt accession list for a protein name (parity:
    proteofav/variants.py:180-193)."""
    return f"{defaults.api_uniprot}?query={identifier}&columns=id&format=list"


_UNIPROT_INFO_COLS = (
    "id", "entry name", "reviewed", "protein names", "genes", "organism",
    "sequence", "length",
)


def url_uniprot_info(identifier: str, cols: tuple[str, ...] | str | None = None) -> str:
    """Tab-format UniProt record query (parity:
    proteofav/variants.py:481-514: default column set, single-column
    shorthand keeps 'id' as the first column)."""
    from urllib.parse import quote

    if not cols:
        cols = _UNIPROT_INFO_COLS
    elif isinstance(cols, str):
        cols = ("id", cols)
    return (
        f"{defaults.api_uniprot}?query=accession:{identifier}"
        f"&columns={quote(','.join(cols))}&format=tab"
    )


def url_pdbe_summary(identifier: str) -> str:
    """PDBe entry-summary endpoint (parity:
    proteofav/structures.py:646-657)."""
    return f"{defaults.api_pdbe}pdb/entry/summary/{identifier}"


def url_msa_pfam(identifier: str, aln_size: str = "seed") -> str:
    """Pfam family alignment download, gzipped Stockholm (parity:
    proteofav/msas.py:511-527)."""
    if aln_size not in ("seed", "full"):
        raise ValueError(f"Pfam alignment size must be seed/full, got {aln_size}")
    return f"{defaults.pfam_fetch}family/{identifier}/alignment/{aln_size}/gzipped"


def url_msa_cath(
    identifier: str, seq_format: str = "stockholm", aln_size: int = 200
) -> str:
    """CATH funfam alignment download for a <Superfamily>_<Funfam> id
    (parity: proteofav/msas.py:480-508)."""
    if "_" not in identifier:
        raise ValueError(
            f"Expected a full <Superfamily>_<Family> CATH ID but got {identifier}"
        )
    superfamily, funfam = identifier.split("_")[0], identifier.split("_")[1]
    out_format = "seed_alignment.fasta" if seq_format == "fasta" else seq_format
    return (
        f"{defaults.cath_fetch}superfamily/{superfamily}/funfam/{funfam}"
        f"/files/{out_format}?max_sequences={aln_size}"
    )


def url_msa(identifier: str, aln_source: str = "pfam", **kwargs) -> str:
    """Dispatch Pfam/CATH MSA download URL (parity:
    proteofav/msas.py:452-477)."""
    if aln_source == "pfam":
        return url_msa_pfam(identifier, **kwargs)
    if aln_source == "cath":
        return url_msa_cath(identifier, **kwargs)
    raise ValueError(
        "Only able to download from CATH/Pfam in fasta/stockholm format..."
    )


def fetch_best_structures(identifier: str, fetch=fetch_from_url_or_retry) -> list[dict]:
    """PDBe best-structures list for a UniProt accession, coverage-ranked
    by the API (parity: proteofav/sifts.py:441-453 sifts_best)."""
    import json

    raw = fetch(url_sifts_best(identifier))
    payload = json.loads(raw)
    return payload.get(identifier) or []


def resolve_best_structure(
    identifier: str, fetch=fetch_from_url_or_retry
) -> tuple[str, str]:
    """(pdb_id, chain_id) of the top-ranked structure for a UniProt id —
    the auto-resolution step of legacy merge_tables (parity:
    proteofav/mergers.py:481-491: 'uses the first structure')."""
    data = fetch_best_structures(identifier, fetch=fetch)
    if not data:
        raise ValueError(
            f"Best structures not available from the PDBe API for {identifier}"
        )
    return data[0]["pdb_id"], data[0]["chain_id"]
