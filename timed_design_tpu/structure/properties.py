"""Property-constrained design support (polarity / charge channels).

Re-implements the reference flow at design_utils/utils.py:60-169,774-803:
design constraints are expressed as a per-residue property map (polarity
0/1 or charge -1/0/1); the input structure's residue identities are rewritten
(0 -> ALA, 1 -> LYS, -1 -> ASP) before voxelizing with a codec that carries an
extra property channel, so the CNN sees the constraint in the input frames.
"""
from __future__ import annotations

import random
import string
import typing as t

import numpy as np

from ..constants import (
    AA1_TO_AA3,
    POLARITY_ZIMMERMAN,
    RESIDUE_CHARGE,
    STANDARD_AMINO_ACIDS,
)
from .pdb import Structure

ACCEPTED_PROPERTIES = ("polarity", "charge")
# property value -> replacement residue (reference utils.py:86)
PROPERTY_TO_RESIDUE = {0: "A", 1: "K", -1: "D"}


def convert_seq_to_property(seq: str, property: str) -> list[int]:
    """Sequence -> property list. Reference: utils.py:139-169.

    polarity: Zimmerman < 20 -> 0 (non-polar) else 1. Non-standard letters -> 0.
    charge: coarse formal charge (-1/0/1).
    """
    prop = property.lower()
    if prop not in ACCEPTED_PROPERTIES:
        raise ValueError(f"Property {property} not found among {ACCEPTED_PROPERTIES}")
    out = []
    for r in seq:
        if r in STANDARD_AMINO_ACIDS:
            if prop == "polarity":
                out.append(0 if POLARITY_ZIMMERMAN[r] < 20 else 1)
            else:
                out.append(RESIDUE_CHARGE[r])
        else:
            out.append(0)
    return out


def modify_structure_with_property(
    structure: Structure, property_map: np.ndarray, property: str
) -> Structure:
    """Rewrite residue identities so their property matches ``property_map``.

    In-place on the parsed Structure (parse a fresh copy for the original).
    Mirrors utils.py:60-110 including the roundtrip consistency assertion.
    """
    prop = property.lower()
    if prop not in ACCEPTED_PROPERTIES:
        raise ValueError(f"Property {property} not found among {ACCEPTED_PROPERTIES}")
    count = 0
    merged_sequence = ""
    from ..constants import AA3_TO_AA1

    for chain in structure.chains:
        for res in chain.residues:
            letter = AA3_TO_AA1.get(res.res_name, "X")
            if letter in STANDARD_AMINO_ACIDS:
                if prop == "polarity":
                    res_property = 0 if POLARITY_ZIMMERMAN[letter] < 20 else 1
                else:
                    res_property = RESIDUE_CHARGE[letter]
            else:
                res_property = 0
            if property_map[count] != res_property:
                new_letter = PROPERTY_TO_RESIDUE[int(property_map[count])]
                res.res_name = AA1_TO_AA3[new_letter]
                letter = new_letter
            merged_sequence += letter
            count += 1
    new_map = convert_seq_to_property(merged_sequence, property=prop)
    np.testing.assert_array_equal(
        new_map, property_map, err_msg="Property maps differ."
    )
    return structure


def create_residue_map(structure: Structure) -> tuple[list[str], str]:
    """UI residue picker labels + merged sequence. Reference: utils.py:113-136.

    Labels look like ``K6 (Chain A)``; multi-chain sequences are concatenated.
    """
    from ..constants import AA3_TO_AA1

    residue_map: list[str] = []
    merged_sequence = ""
    for chain in structure.chains:
        for res in chain.residues:
            letter = AA3_TO_AA1.get(res.res_name, "X")
            residue_map.append(f"{letter}{res.id} (Chain {chain.chain_id})")
            merged_sequence += letter
    return residue_map, merged_sequence


def create_map_alphanumeric_code(property_map: t.Sequence[int], k: int = 32) -> str:
    """Deterministic cache key for a property map. Reference: utils.py:774-803.

    Same construction as the reference (seed the stdlib RNG with the digit
    string of the map, -1 encoded as 2, leading '1') so cached designs produced
    by either implementation share keys.
    """
    seed_map = "1"
    for v in property_map:
        seed_map += "2" if v < 0 else str(int(v))
    rng = random.Random(int(seed_map))
    return "".join(rng.choices(string.ascii_letters + string.digits, k=k))
