"""Structure-derived analyses: packing density, B-factor, prediction entropy.

Replaces the reference's ampal/scipy versions:
  * `tag_packing_density` (analyse_utils.py:44-86) looped one atom at a time
    over an O(N^2) distance computation — here the full pairwise count is one
    vectorized (optionally jitted/device) program;
  * B-factor (AF2 pLDDT) extraction (analyse_utils.py:89-146);
  * Shannon entropy of predictions (analyse_utils.py:294-310).
"""
from __future__ import annotations

import typing as t
from pathlib import Path

import numpy as np

from ..structure.pdb import Structure, load_pdb


def atom_packing_density(
    coords: np.ndarray, radius: float = 7.0, chunk: int = 2048
) -> np.ndarray:
    """Atomic contact number: non-H atoms within ``radius`` of each atom,
    excluding itself (Weiss 2007; reference analyse_utils.py:44-86).

    Vectorized over chunks of atoms; O(N^2) arithmetic but no Python loop
    per atom.
    """
    coords = np.asarray(coords, np.float32)
    n = coords.shape[0]
    out = np.empty(n, np.int32)
    r2 = radius * radius
    for start in range(0, n, chunk):
        block = coords[start : start + chunk]  # (b, 3)
        d2 = ((block[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
        out[start : start + chunk] = (d2 < r2).sum(axis=1) - 1
    return out


def structure_packing_density(
    structure: Structure, radius: float = 7.0
) -> np.ndarray:
    """Per-atom contact numbers over the structure's standard-residue atoms
    (hydrogens are already excluded by the parser's element stream)."""
    non_h = structure.elements != "H"
    dens = np.full(len(structure.elements), -1, np.int32)
    dens[non_h] = atom_packing_density(structure.coords[non_h], radius)
    return dens


def extract_packdensity_from_structure(
    structure: Structure,
    atom_filter: str = "ca",
    radius: float = 7.0,
    reference_compat: bool = False,
) -> list[float]:
    """Per-residue packing density with the reference's filter semantics
    (analyse_utils.py:149-234): 'ca' = CA atom only, 'backbone' = aggregate
    over N/CA/C/O, 'all' = aggregate over non-H atoms.

    Aggregation (decision recorded in PARITY.md §Deviations): the reference
    accumulates via repeated (acc+b)/2 — an exponentially-weighted mean that
    overweights later atoms in file order. Default here is the plain
    arithmetic mean (the fix); pass ``reference_compat=True`` to reproduce
    the reference's numbers exactly (needed when comparing against its
    published analyses).
    """
    if atom_filter == "backbone":
        filter_set = {"N", "CA", "C", "O"}
    elif atom_filter == "ca":
        filter_set = {"CA"}
    elif atom_filter == "all":
        filter_set = None
    else:
        raise ValueError(f"Atom filter {atom_filter} not in (backbone, ca, all)")

    dens = structure_packing_density(structure, radius)
    # map flat atom stream back to residues
    out: list[float] = []
    for r_idx in range(structure.res_index.max() + 1 if len(structure.res_index) else 0):
        sel = structure.res_index == r_idx
        names = structure.atom_names[sel]
        vals = dens[sel]
        if filter_set is not None:
            keep = np.isin(names, list(filter_set))
            vals = vals[keep]
        vals = vals[vals >= 0]
        if not len(vals):
            out.append(-1.0)
        elif reference_compat:
            acc = float(vals[0])
            for v in vals[1:]:
                acc = (acc + float(v)) / 2
            out.append(acc)
        else:
            out.append(float(vals.mean()))
    return out


def extract_bfactor_from_structure(structure: Structure) -> list[list[float]]:
    """Per-chain lists of per-residue B-factors (first atom of each residue —
    AF2 writes pLDDT uniformly per residue; analyse_utils.py:89-146)."""
    out = []
    for chain in structure.chains:
        vals = [
            float(res.bfactors[0]) if len(res.bfactors) else float("nan")
            for res in chain.residues
            if res.is_standard_aa
        ]
        if vals:
            out.append(vals)
    return out


def extract_bfactor(pdb_path: Path) -> list[list[float]]:
    return extract_bfactor_from_structure(load_pdb(Path(pdb_path)))


def calculate_prediction_entropy(residue_predictions) -> np.ndarray:
    """Shannon entropy (base 2) per residue of a (n, n_classes) probability
    matrix (reference analyse_utils.py:294-310)."""
    p = np.asarray(residue_predictions, np.float64)
    p = p / np.maximum(p.sum(axis=1, keepdims=True), 1e-300)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(p > 0, -p * np.log2(p), 0.0)
    return terms.sum(axis=1)


def extract_prediction_entropy_to_dict(
    model_pred_path: Path,
    model_map_path: Path,
    rotamer_mode: bool = False,
    is_old: bool = False,
) -> dict[str, np.ndarray]:
    """Per-structure entropy from saved outputs (analyse_utils.py:237-291)."""
    from ..constants import ROTAMER_CATEGORIES
    from ..io import extract_sequences, load_datasetmap, load_prediction_matrix

    P = load_prediction_matrix(Path(model_pred_path))
    dmap = load_datasetmap(Path(model_map_path), is_old=is_old)
    decoded = extract_sequences(
        dmap, P, rotamer_categories=ROTAMER_CATEGORIES if rotamer_mode else None
    )
    return {
        pdb: calculate_prediction_entropy(prob)
        for pdb, prob in decoded.pdb_to_probability.items()
    }
