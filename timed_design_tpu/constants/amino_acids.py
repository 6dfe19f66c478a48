"""Amino-acid constant tables.

TPU-native re-implementation of the constant surface the reference pulls from
`ampal.amino_acids` (reference: design_utils/utils.py:10-15,
design_utils/analyse_utils.py:14-20). Everything downstream — the rotamer
codec ordering, one-hot label layout, property channels, sequence metrics —
keys off the ordering of ``STANDARD_AMINO_ACIDS`` (alphabetical by one-letter
code), so these tables are the ground truth for the whole framework.

All tables are exposed both as plain dicts (host-side convenience) and as
NumPy arrays ordered by ``AA1`` (device-side lookups: a sequence encoded as
int codes 0..19 can index any per-residue property as one gather).
"""
from __future__ import annotations

import numpy as np

# Ordering: alphabetical by one-letter code. This matches the reference's
# `standard_amino_acids` iteration order, which fixes both the 20-class label
# layout (design_utils/utils.py:355) and the 338-rotamer codec layout
# (design_utils/utils.py:434).
STANDARD_AMINO_ACIDS: dict[str, str] = {
    "A": "ALA", "C": "CYS", "D": "ASP", "E": "GLU", "F": "PHE",
    "G": "GLY", "H": "HIS", "I": "ILE", "K": "LYS", "L": "LEU",
    "M": "MET", "N": "ASN", "P": "PRO", "Q": "GLN", "R": "ARG",
    "S": "SER", "T": "THR", "V": "VAL", "W": "TRP", "Y": "TYR",
}

AA1: tuple[str, ...] = tuple(STANDARD_AMINO_ACIDS.keys())
AA3: tuple[str, ...] = tuple(STANDARD_AMINO_ACIDS.values())
AA1_TO_AA3: dict[str, str] = dict(STANDARD_AMINO_ACIDS)
AA3_TO_AA1: dict[str, str] = {v: k for k, v in STANDARD_AMINO_ACIDS.items()}
AA1_TO_INT: dict[str, int] = {a: i for i, a in enumerate(AA1)}
AA3_TO_INT: dict[str, int] = {a: i for i, a in enumerate(AA3)}
N_AMINO_ACIDS = 20

# Number of chi (side-chain) dihedral angles per residue. Derived from the
# standard chi-atom definitions below; consistent with the reference codec's
# 3**n_chi rotamer fan-out (design_utils/utils.py:437-438) which sums to 338.
CHI_COUNTS: dict[str, int] = {
    "ALA": 0, "CYS": 1, "ASP": 2, "GLU": 3, "PHE": 2,
    "GLY": 0, "HIS": 2, "ILE": 2, "LYS": 4, "LEU": 2,
    "MET": 3, "ASN": 2, "PRO": 2, "GLN": 3, "ARG": 4,
    "SER": 1, "THR": 1, "VAL": 1, "TRP": 2, "TYR": 2,
}

# Side-chain dihedral atom quadruples, standard chi definitions.
# Mirrors the role of ampal's `side_chain_dihedrals` (design_utils/utils.py:10)
# for chi-angle tagging (analyse_utils.py:983 tag_sidechain_dihedrals).
SIDE_CHAIN_DIHEDRALS: dict[str, list[tuple[str, str, str, str]]] = {
    "ARG": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD"),
            ("CB", "CG", "CD", "NE"), ("CG", "CD", "NE", "CZ")],
    "ASN": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "OD1")],
    "ASP": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "OD1")],
    "CYS": [("N", "CA", "CB", "SG")],
    "GLN": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD"),
            ("CB", "CG", "CD", "OE1")],
    "GLU": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD"),
            ("CB", "CG", "CD", "OE1")],
    "HIS": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "ND1")],
    "ILE": [("N", "CA", "CB", "CG1"), ("CA", "CB", "CG1", "CD1")],
    "LEU": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD1")],
    "LYS": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD"),
            ("CB", "CG", "CD", "CE"), ("CG", "CD", "CE", "NZ")],
    "MET": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "SD"),
            ("CB", "CG", "SD", "CE")],
    "PHE": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD1")],
    "PRO": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD")],
    "SER": [("N", "CA", "CB", "OG")],
    "THR": [("N", "CA", "CB", "OG1")],
    "TRP": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD1")],
    "TYR": [("N", "CA", "CB", "CG"), ("CA", "CB", "CG", "CD1")],
    "VAL": [("N", "CA", "CB", "CG1")],
}

# Zimmerman polarity scale. The reference's property-constrained design uses
# `polarity_Zimmerman[r] < 20` as the non-polar/polar split
# (design_utils/utils.py:95,164) — only R, D, E, H, K cross that threshold.
POLARITY_ZIMMERMAN: dict[str, float] = {
    "A": 0.00, "R": 52.00, "N": 3.38, "D": 49.70, "C": 1.48,
    "Q": 3.53, "E": 49.90, "G": 0.00, "H": 51.60, "I": 0.13,
    "L": 0.13, "K": 49.50, "M": 1.43, "F": 0.35, "P": 1.58,
    "S": 1.67, "T": 1.66, "W": 2.10, "Y": 1.61, "V": 0.13,
}

# Coarse formal charge classification (basic: K/R/H = +1, acidic: D/E = -1),
# role of ampal's `residue_charge` in property design (utils.py:97,169).
RESIDUE_CHARGE: dict[str, int] = {
    "A": 0, "C": 0, "D": -1, "E": -1, "F": 0,
    "G": 0, "H": 1, "I": 0, "K": 1, "L": 0,
    "M": 0, "N": 0, "P": 0, "Q": 0, "R": 1,
    "S": 0, "T": 0, "V": 0, "W": 0, "Y": 0,
}

# Average residue (monomer minus water) masses, g/mol; water mass added once
# per chain. Backs `sequence_molecular_weight` (analyse_utils.py:369).
RESIDUE_MW: dict[str, float] = {
    "A": 71.0788, "R": 156.1875, "N": 114.1038, "D": 115.0886,
    "C": 103.1388, "E": 129.1155, "Q": 128.1307, "G": 57.0519,
    "H": 137.1411, "I": 113.1594, "L": 113.1594, "K": 128.1741,
    "M": 131.1926, "F": 147.1766, "P": 97.1167, "S": 87.0782,
    "T": 101.1051, "W": 186.2132, "Y": 163.1760, "V": 99.1326,
}
WATER_MASS = 18.01528

# Molar extinction coefficients at 280 nm (Gill & von Hippel), backing
# `sequence_molar_extinction_280` (analyse_utils.py:370).
RESIDUE_EXT_280: dict[str, int] = {"W": 5690, "Y": 1280, "C": 120}

# Side-chain / terminus pKa values (EMBOSS set) for Henderson–Hasselbalch
# charge and isoelectric point, backing `sequence_charge` /
# `sequence_isoelectric_point` (analyse_utils.py:367-368). The table is a
# module-level constant so a user needing parity with another package's pI
# can swap it wholesale.
PKA_POSITIVE: dict[str, float] = {"Nterm": 8.6, "K": 10.8, "R": 12.5, "H": 6.5}
PKA_NEGATIVE: dict[str, float] = {"Cterm": 3.6, "D": 3.9, "E": 4.1, "C": 8.5, "Y": 10.1}

# Van der Waals radii (Bondi) per element, used by the Gaussian voxelizer to
# set the density spread per atom (role of aposteriori's element radii).
VDW_RADII: dict[str, float] = {"C": 1.7, "N": 1.55, "O": 1.52, "S": 1.8, "H": 1.2, "P": 1.8}

# Mapping of non-standard residue three-letter codes to their closest standard
# residue. Role of aposteriori's UNCOMMON_RESIDUE_DICT (design_utils/
# utils.py:18,381-385): lets datasets containing modified residues load with a
# warning instead of aborting. Covers the common PDB chemical-component
# modifications of the 20 standard residues.
UNCOMMON_RESIDUE_DICT: dict[str, str] = {
    # Modified cysteines
    "CSO": "CYS", "OCS": "CYS", "CSX": "CYS", "CSS": "CYS", "CME": "CYS",
    "CSD": "CYS", "CAS": "CYS", "SMC": "CYS", "SCY": "CYS", "YCM": "CYS",
    "CSW": "CYS", "CSU": "CYS", "CAF": "CYS", "SNC": "CYS",
    # Modified lysines
    "MLY": "LYS", "KCX": "LYS", "LLP": "LYS", "M3L": "LYS", "ALY": "LYS",
    "MLZ": "LYS", "LYZ": "LYS",
    # Modified methionines
    "MSE": "MET", "FME": "MET", "CXM": "MET", "MHO": "MET",
    # Modified histidines
    "HIC": "HIS", "NEP": "HIS", "MHS": "HIS",
    # Modified serines / threonines / tyrosines (phospho etc.)
    "SEP": "SER", "PN2": "SER", "SAC": "SER", "TPO": "THR", "PTR": "TYR",
    "TYS": "TYR", "TYI": "TYR",
    # Modified prolines
    "HYP": "PRO", "PCA": "GLN",
    # Modified arginines / others
    "AGM": "ARG", "ARO": "ARG", "MEN": "ASN", "BFD": "ASP", "PHD": "ASP",
    "CGU": "GLU", "SAR": "GLY", "GL3": "GLY", "ALM": "ALA", "AIB": "ALA",
    "DAL": "ALA", "MAA": "ALA", "FLA": "ALA", "DHA": "ALA",
}

# ---------------------------------------------------------------------------
# Array views (ordered by AA1) for on-device gathers.
# ---------------------------------------------------------------------------
CHI_COUNTS_ARR = np.array([CHI_COUNTS[a] for a in AA3], dtype=np.int32)
POLARITY_ARR = np.array([POLARITY_ZIMMERMAN[a] for a in AA1], dtype=np.float32)
IS_POLAR_ARR = (POLARITY_ARR >= 20.0).astype(np.int32)
CHARGE_ARR = np.array([RESIDUE_CHARGE[a] for a in AA1], dtype=np.int32)
MW_ARR = np.array([RESIDUE_MW[a] for a in AA1], dtype=np.float64)
EXT280_ARR = np.array([RESIDUE_EXT_280.get(a, 0) for a in AA1], dtype=np.float64)
# Per-residue pKa for the charge model, NaN where the side chain is not
# titratable; sign +1 for basic, -1 for acidic.
PKA_SIDECHAIN_ARR = np.array(
    [PKA_POSITIVE.get(a, PKA_NEGATIVE.get(a, np.nan)) for a in AA1], dtype=np.float64
)
PKA_SIGN_ARR = np.array(
    [1 if a in PKA_POSITIVE else (-1 if a in PKA_NEGATIVE else 0) for a in AA1],
    dtype=np.int32,
)


def sequence_to_int(seq: str) -> np.ndarray:
    """Encode a one-letter sequence to int codes 0..19 (ordering = AA1)."""
    return np.array([AA1_TO_INT[r] for r in seq], dtype=np.int32)


def int_to_sequence(codes) -> str:
    """Decode int codes 0..19 back to a one-letter sequence."""
    arr = np.asarray(codes)
    return "".join(AA1[int(c)] for c in arr.reshape(-1))
