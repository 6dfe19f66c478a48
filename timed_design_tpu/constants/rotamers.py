"""The 338-class rotamer codec.

Re-implements the reference's `get_rotamer_codec` /
`compress_rotamer_predictions_to_20` (design_utils/utils.py:410-484) as
precomputed arrays. The vocabulary enumerates, per amino acid in AA1 order,
every chi-angle bin combination `product([1,2,3], repeat=n_chi)` (e.g.
``LYS_1232``), with a single ``<RES>_0`` class for ALA/GLY. Total = 338.

The reduction guide — the start offset of each amino acid's rotamer block —
must equal ``[0, 1, 4, 13, 40, 49, 50, 59, 68, 149, 158, 185, 194, 203, 230,
311, 314, 317, 320, 329]`` (utils.py:425); a unit test asserts this.

Device-friendly views:
  * ``ROTAMER_TO_AA``      (338,) int32 — rotamer class -> amino-acid class.
  * ``ROTAMER_TO_AA_ONEHOT`` (338, 20) — the reference's `rot_to_20res` codec.
  * ``compress_rotamer_probs`` — (N, 338) -> (N, 20) as one matmul, which XLA
    maps onto the MXU instead of `np.add.reduceat`'s host loop.
"""
from __future__ import annotations

from itertools import product

import numpy as np

from .amino_acids import AA1, AA3, CHI_COUNTS

N_ROTAMER_CLASSES = 338


def _build_codec():
    flat_categories: list[str] = []
    reduction_guide: list[int] = []
    rot_to_aa: list[int] = []
    for i, res in enumerate(AA3):
        reduction_guide.append(len(flat_categories))
        n_chi = CHI_COUNTS[res]
        if n_chi > 0:
            for combo in product([1, 2, 3], repeat=n_chi):
                flat_categories.append(f"{res}_{''.join(map(str, combo))}")
                rot_to_aa.append(i)
        else:
            flat_categories.append(f"{res}_0")
            rot_to_aa.append(i)
    return flat_categories, np.array(reduction_guide, np.int32), np.array(rot_to_aa, np.int32)


ROTAMER_CATEGORIES, REDUCTION_GUIDE, ROTAMER_TO_AA = _build_codec()
assert len(ROTAMER_CATEGORIES) == N_ROTAMER_CLASSES

# (338, 20) one-hot matrix: column j collects every rotamer of amino acid j.
ROTAMER_TO_AA_ONEHOT = np.zeros((N_ROTAMER_CLASSES, len(AA1)), dtype=np.float32)
ROTAMER_TO_AA_ONEHOT[np.arange(N_ROTAMER_CLASSES), ROTAMER_TO_AA] = 1.0

# One-letter amino acid for each of the 338 rotamer classes (sample.py:49).
ROTAMER_CATEGORIES_1LETTER = [AA1[i] for i in ROTAMER_TO_AA]

# chi-bin combination per rotamer class, padded with 0 to 4 entries:
# ROTAMER_CHI_BINS[k] = (b1, b2, b3, b4) with bins in {1,2,3}, 0 = unused.
ROTAMER_CHI_BINS = np.zeros((N_ROTAMER_CLASSES, 4), dtype=np.int32)
for _k, _name in enumerate(ROTAMER_CATEGORIES):
    _suffix = _name.split("_")[1]
    if _suffix != "0":
        for _c, _b in enumerate(_suffix):
            ROTAMER_CHI_BINS[_k, _c] = int(_b)


def get_rotamer_codec(return_reduction_guide: bool = False):
    """Reference-shaped accessor (utils.py:410-465).

    Returns ``(rot_to_20res, flat_categories[, reduction_guide])`` where
    ``rot_to_20res`` maps rotamer index -> (20,) one-hot, matching the dict
    the reference builds per call; here it is a view into a precomputed array.
    """
    rot_to_20res = {k: ROTAMER_TO_AA_ONEHOT[k] for k in range(N_ROTAMER_CLASSES)}
    if return_reduction_guide:
        return rot_to_20res, list(ROTAMER_CATEGORIES), list(REDUCTION_GUIDE)
    return rot_to_20res, list(ROTAMER_CATEGORIES)


def compress_rotamer_probs(prediction_matrix: np.ndarray) -> np.ndarray:
    """(N, 338) rotamer probabilities -> (N, 20) amino-acid probabilities.

    Equivalent to the reference's `np.add.reduceat(P, reduction_guide, axis=1)`
    (utils.py:468-484), expressed as a matmul so it runs on the MXU when jitted.
    Accepts NumPy or JAX arrays.
    """
    return prediction_matrix @ ROTAMER_TO_AA_ONEHOT.astype(prediction_matrix.dtype)


def encode_chi_bins_to_rotamer(aa_index: int, chi_bins: tuple[int, ...]) -> int | None:
    """(amino acid, chi-bin combo) -> flat rotamer class, or None if invalid.

    Host-side equivalent of the reference's rotamer ground-truth encoding
    (analyse_utils.py:901-930): a residue tagged with chi bins (1..3 each)
    maps into its block at REDUCTION_GUIDE[aa] + mixed-radix offset.
    """
    n_chi = CHI_COUNTS[AA3[aa_index]]
    if n_chi == 0:
        return int(REDUCTION_GUIDE[aa_index]) if len(chi_bins) == 0 else None
    if len(chi_bins) != n_chi or any(b not in (1, 2, 3) for b in chi_bins):
        return None
    offset = 0
    for b in chi_bins:
        offset = offset * 3 + (b - 1)
    return int(REDUCTION_GUIDE[aa_index]) + offset
