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
    present (parity: proteofav/utils.py:402-454)."""

    def __init__(
        self, url: str, filename: str, decompress: bool = False, overwrite: bool = False
    ) -> None:
        self.url = url
        self.filename = filename
        if os.path.exists(filename) and not overwrite:
            return
        if url.startswith("file://"):
            src = url[len("file://"):]
            shutil.copyfile(src, filename + (".gz" if decompress else ""))
        else:
            data = fetch_from_url_or_retry(url)
            with open(filename + (".gz" if decompress else ""), "wb") as fh:
                fh.write(data)
        if decompress:
            with gzip.open(filename + ".gz", "rb") as zin, open(filename, "wb") as out:
                shutil.copyfileobj(zin, out)
            os.remove(filename + ".gz")


# --- URL builders (public endpoints; parity cited in module docstring) ----

def url_mmcif(identifier: str, bio_unit: bool = False) -> str:
    if bio_unit:
        return f"{defaults.bio_fetch}{identifier}-assembly-1.cif.gz"
    return f"{defaults.pdbe_fetch}{identifier}.cif"


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
