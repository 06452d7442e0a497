"""Constant lookup tables and per-source type maps.

Everything here is standard public bioinformatics data (amino-acid codes,
maximum solvent accessibility from Miller 1987 / Wilke (Tien 2013) / Sander &
Rost 1994, canonical heavy-atom compositions) re-expressed as plain dicts.
Parity target: proteofav/library.py (constants only; no code shared).

In plans these become either ``F.create_map`` literals (JVM-side lookup, no
Python round-trip) or tiny broadcast DataFrames.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Amino-acid code maps
# ---------------------------------------------------------------------------

AA_3TO1: dict[str, str] = {
    "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C",
    "GLN": "Q", "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I",
    "LEU": "L", "LYS": "K", "MET": "M", "PHE": "F", "PRO": "P",
    "SER": "S", "THR": "T", "TRP": "W", "TYR": "Y", "VAL": "V",
    # common non-standard residues (subset of the reference's 587-entry
    # scop_3to1 map, proteofav/library.py:14-200; unknowns map to 'X')
    "MSE": "M", "SEC": "U", "PYL": "O", "ASX": "B", "GLX": "Z",
    "UNK": "X", "CSO": "C", "PTR": "Y", "SEP": "S", "TPO": "T",
    "MLY": "K", "HYP": "P", "KCX": "K", "CME": "C", "CSD": "C",
    "LLP": "K", "PCA": "E",
}

AA_1TO3: dict[str, str] = {
    "A": "ALA", "R": "ARG", "N": "ASN", "D": "ASP", "C": "CYS",
    "Q": "GLN", "E": "GLU", "G": "GLY", "H": "HIS", "I": "ILE",
    "L": "LEU", "K": "LYS", "M": "MET", "F": "PHE", "P": "PRO",
    "S": "SER", "T": "THR", "W": "TRP", "Y": "TYR", "V": "VAL",
}

CANONICAL_AA1 = set(AA_1TO3)

# ---------------------------------------------------------------------------
# Maximum accessible surface area (Å²) per residue — three published scales.
# Used for RSA = ACC / maxASA * 100 (parity: proteofav/library.py:249-271,
# proteofav/dssp.py:249-286).
# ---------------------------------------------------------------------------

ASA_MILLER: dict[str, float] = {
    "ALA": 113.0, "ARG": 241.0, "ASN": 158.0, "ASP": 151.0, "CYS": 140.0,
    "GLN": 189.0, "GLU": 183.0, "GLY": 85.0, "HIS": 194.0, "ILE": 182.0,
    "LEU": 180.0, "LYS": 211.0, "MET": 204.0, "PHE": 218.0, "PRO": 143.0,
    "SER": 122.0, "THR": 146.0, "TRP": 259.0, "TYR": 229.0, "VAL": 160.0,
}

ASA_WILKE: dict[str, float] = {
    "ALA": 129.0, "ARG": 274.0, "ASN": 195.0, "ASP": 193.0, "CYS": 167.0,
    "GLN": 225.0, "GLU": 223.0, "GLY": 104.0, "HIS": 224.0, "ILE": 197.0,
    "LEU": 201.0, "LYS": 236.0, "MET": 224.0, "PHE": 240.0, "PRO": 159.0,
    "SER": 155.0, "THR": 172.0, "TRP": 285.0, "TYR": 263.0, "VAL": 174.0,
}

ASA_SANDER: dict[str, float] = {
    "ALA": 106.0, "ARG": 248.0, "ASN": 157.0, "ASP": 163.0, "CYS": 135.0,
    "GLN": 198.0, "GLU": 194.0, "GLY": 84.0, "HIS": 184.0, "ILE": 169.0,
    "LEU": 164.0, "LYS": 205.0, "MET": 188.0, "PHE": 197.0, "PRO": 136.0,
    "SER": 130.0, "THR": 142.0, "TRP": 227.0, "TYR": 222.0, "VAL": 142.0,
}

ASA_SCALES = {"miller": ASA_MILLER, "wilke": ASA_WILKE, "sander": ASA_SANDER}

# ---------------------------------------------------------------------------
# Canonical heavy-atom set per amino acid (for partial-residue detection;
# parity: aa_default_atoms, proteofav/library.py:221-242).
# ---------------------------------------------------------------------------

_BB = ["N", "CA", "C", "O"]
AA_DEFAULT_ATOMS: dict[str, list[str]] = {
    "ALA": _BB + ["CB"],
    "ARG": _BB + ["CB", "CG", "CD", "NE", "CZ", "NH1", "NH2"],
    "ASN": _BB + ["CB", "CG", "OD1", "ND2"],
    "ASP": _BB + ["CB", "CG", "OD1", "OD2"],
    "CYS": _BB + ["CB", "SG"],
    "GLN": _BB + ["CB", "CG", "CD", "OE1", "NE2"],
    "GLU": _BB + ["CB", "CG", "CD", "OE1", "OE2"],
    "GLY": _BB,
    "HIS": _BB + ["CB", "CG", "ND1", "CD2", "CE1", "NE2"],
    "ILE": _BB + ["CB", "CG1", "CG2", "CD1"],
    "LEU": _BB + ["CB", "CG", "CD1", "CD2"],
    "LYS": _BB + ["CB", "CG", "CD", "CE", "NZ"],
    "MET": _BB + ["CB", "CG", "SD", "CE"],
    "PHE": _BB + ["CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ"],
    "PRO": _BB + ["CB", "CG", "CD"],
    "SER": _BB + ["CB", "OG"],
    "THR": _BB + ["CB", "OG1", "CG2"],
    "TRP": _BB + ["CB", "CG", "CD1", "CD2", "NE1", "CE2", "CE3", "CZ2", "CZ3", "CH2"],
    "TYR": _BB + ["CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ", "OH"],
    "VAL": _BB + ["CB", "CG1", "CG2"],
}

BACKBONE_ATOMS = ("CA", "N", "C", "O")

# ---------------------------------------------------------------------------
# DSSP 8-state → 3-state secondary-structure reduction
# (parity: proteofav/dssp.py:215-246)
# ---------------------------------------------------------------------------

SS_REDUCE: dict[str, str] = {
    "H": "H", "E": "E",
    "G": "C", "I": "C", "B": "C", "C": "C", "T": "C", "S": "C", "": "C", " ": "C",
}

# Ensembl → UniProt variant column renames (parity: proteofav/library.py:569-577)
ENSEMBL_TO_UNIPROT_RENAMES: dict[str, str] = {
    "id": "xrefs_id",
    "start": "begin",
    "type": "consequenceType",
    "sift": "siftScore",
    "polyphen": "polyphenScore",
    "residues": "residues",
    "frequency": "frequency",
}

# ---------------------------------------------------------------------------
# Per-source declared column types (Spark SQL type names).
# Parity: proteofav/library.py:386-558 ({int:'int64', float:'float64',
# str:'object'} → bigint / double / string). Coercion is try_cast-style:
# constrain_column_types keeps the original column when a cast fails
# (proteofav/utils.py:188-192).
# ---------------------------------------------------------------------------

PDBX_TYPES: dict[str, str] = {
    "group_PDB": "string", "id": "bigint", "type_symbol": "string",
    "label_atom_id": "string", "label_alt_id": "string",
    "label_comp_id": "string", "label_asym_id": "string",
    "label_entity_id": "string", "label_seq_id": "string",
    "pdbx_PDB_ins_code": "string",
    "Cartn_x": "double", "Cartn_y": "double", "Cartn_z": "double",
    "occupancy": "double", "B_iso_or_equiv": "double",
    "pdbx_formal_charge": "string",
    "auth_seq_id": "string", "auth_comp_id": "string",
    "auth_asym_id": "string", "auth_atom_id": "string",
    "pdbx_PDB_model_num": "string",
    "orig_label_asym_id": "string", "orig_auth_asym_id": "string",
}

DSSP_TYPES: dict[str, str] = {
    "LINE": "bigint", "RES": "string", "RES_FULL": "string",
    "INSCODE": "string", "CHAIN": "string", "CHAIN_FULL": "string",
    "AA": "string", "SS": "string", "SS_CLASS": "string",
    "STRUCTURE": "string", "BP1": "string", "BP2": "string",
    "ACC": "bigint", "RSA": "double", "RSA_CLASS": "string",
    "NH_O_1": "string", "O_HN_1": "string", "NH_O_2": "string", "O_HN_2": "string",
    "TCO": "double", "KAPPA": "double", "ALPHA": "double",
    "PHI": "double", "PSI": "double",
    "X-CA": "double", "Y-CA": "double", "Z-CA": "double",
}

VALIDATION_TYPES: dict[str, str] = {
    "validation_model": "bigint", "validation_chain": "string",
    "validation_resnum": "string", "validation_resnum_full": "string",
    "validation_resname": "string", "validation_icode": "string",
    "validation_altcode": "string", "validation_rsr": "double",
    "validation_rsrz": "double", "validation_rscc": "double",
    "validation_rama": "string", "validation_rota": "string",
    "validation_phi": "double", "validation_psi": "double",
    "validation_avgoccu": "double", "validation_owab": "double",
    "validation_NatomsEDS": "bigint", "validation_seq": "string",
    "validation_said": "string", "validation_ent": "string",
}

ANNOTATION_TYPES: dict[str, str] = {
    "NAME": "string", "SOURCE": "string", "TYPE": "string",
    "START": "bigint", "END": "bigint",
    "SCORE": "string", "STRAND": "string", "FRAME": "string",
    "GROUP": "string",
}

VARIANT_TYPES: dict[str, str] = {
    "begin": "string", "end": "string",
    "frequency": "double", "siftScore": "double", "polyphenScore": "double",
    "consequenceType": "string",
}


def map_literal(d: dict) -> F.Column:
    """A dict as a JVM-side ``create_map`` literal column (broadcast-free
    constant lookup usable inside whole-stage codegen)."""
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(d.items())])


def array_map_literal(d: dict[str, list[str]]) -> F.Column:
    """A dict-of-lists as a ``create_map`` of array literals."""
    pairs: list[F.Column] = []
    for k, v in d.items():
        pairs.append(F.lit(k))
        pairs.append(F.array(*[F.lit(x) for x in v]))
    return F.create_map(*pairs)
