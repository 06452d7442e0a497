"""INI-backed configuration (parity: proteofav/config.py:41-100 +
config.ini). Attributes populate from the packaged defaults and may be
overridden at runtime or from a user INI file."""

from __future__ import annotations

import os
import tempfile
from configparser import ConfigParser

_DEFAULT_INI = """
[Global]
db_pdb = ...
db_mmcif = ...
db_sifts = ...
db_dssp = ...
db_validation = ...
db_annotation = ...
db_msas = ...
db_lake = ...

[Addresses]
api_pdbe = https://www.ebi.ac.uk/pdbe/api/
api_uniprot = https://www.uniprot.org/uniprot/
api_ensembl = https://rest.ensembl.org/
api_icgc = https://dcc.icgc.org/api/v1/
api_proteins = https://www.ebi.ac.uk/proteins/api/
pdbe_fetch = https://www.ebi.ac.uk/pdbe/entry-files/
bio_fetch = https://www.ebi.ac.uk/pdbe/static/entry/download/
sifts_fetch = ftp://ftp.ebi.ac.uk/pub/databases/msd/sifts/xml/
validation_fetch = https://www.ebi.ac.uk/pdbe/entry-files/download/
cath_fetch = http://www.cathdb.info/version/v4_1_0/
pfam_fetch = https://pfam.xfam.org/

[Variables]
contact_email = ...
"""


class Defaults:
    """Runtime-mutable config container.

    >>> from proteofav_spark.config import defaults
    >>> defaults.api_pdbe  # doctest: +ELLIPSIS
    'https://www.ebi.ac.uk/pdbe/api/'
    """

    def __init__(self, config_file: str | None = None) -> None:
        config = ConfigParser()
        if config_file:
            if not os.path.isfile(config_file):
                raise OSError(f"Config file {config_file} not available.")
            config.read(config_file)
        else:
            config.read_string(_DEFAULT_INI)
        self._config = config
        self.config_file = config_file
        for name, value in self:
            setattr(self, name, value)

    def __iter__(self):
        for section in self._config.sections():
            for name, value in self._config.items(section):
                if name.startswith("db") and value == "...":
                    value = tempfile.gettempdir()
                yield name, value

    def update(self, config_file: str) -> None:
        self.__init__(config_file)


defaults = Defaults()
