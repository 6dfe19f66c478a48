"""Structural geometry: dihedrals, chi tagging, Kabsch superposition, GDT.

Framework-native replacements for:
  * ampal `tag_sidechain_dihedrals` (reference analyse_utils.py:983) — here a
    vectorized dihedral + chi-bin computation over whole structures;
  * PyMOL `align`/`cealign` RMSD + GDT (reference scripts/analyse_af2.py:12-45)
    — here a closed-form Kabsch superposition, removing the PyMOL dependency.

Everything is NumPy-vectorized; `kabsch` also accepts JAX arrays (pure
jnp-compatible ops) so batched refold evaluation can run jitted on device.
"""
from __future__ import annotations

import numpy as np

from ..constants import AA3_TO_INT, CHI_COUNTS, SIDE_CHAIN_DIHEDRALS
from ..constants.rotamers import encode_chi_bins_to_rotamer
from .pdb import Structure


def dihedral(p0, p1, p2, p3) -> np.ndarray:
    """Dihedral angle(s) in degrees, in [0, 360).

    Accepts (..., 3) arrays; fully batched. Convention: the IUPAC
    (praxeolitic) signed dihedral about the p1-p2 axis — an alpha-helix
    phi computes to ~-60 deg == ~300 here — mapped to [0, 360) so chi-bin
    boundaries at 120/240 are trivial (bins {1,2,3} = [0,120), [120,240),
    [240,360)). The sign matters: gauche+ (+60, bin 1) and gauche-
    (-60 -> 300, bin 3) must not swap, or every tagged rotamer ground
    truth mirrors relative to the reference's ampal-derived labels.
    """
    p0, p1, p2, p3 = (np.asarray(p, dtype=np.float64) for p in (p0, p1, p2, p3))
    b0 = p0 - p1  # praxeolitic: first vector points AWAY from the axis
    b1 = p2 - p1
    b2 = p3 - p2
    b1 = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
    v = b0 - (b0 * b1).sum(-1, keepdims=True) * b1
    w = b2 - (b2 * b1).sum(-1, keepdims=True) * b1
    x = (v * w).sum(-1)
    y = (np.cross(b1, v) * w).sum(-1)
    ang = np.degrees(np.arctan2(y, x))
    return np.mod(ang, 360.0)


def chi_bin(angle_deg: np.ndarray) -> np.ndarray:
    """Map chi angles (degrees, any range) to rotamer bins {1, 2, 3}.

    Bin 1 = gauche+ region [0, 120), bin 2 = trans [120, 240),
    bin 3 = gauche- [240, 360). This is the 3-way-per-chi discretization the
    338-class codec enumerates (reference utils.py:438 product([1,2,3], ...)).
    """
    a = np.mod(np.asarray(angle_deg), 360.0)
    return (a // 120.0).astype(np.int32) + 1


def tag_chi_angles(structure: Structure) -> list[tuple[list[float], list[int]]]:
    """Per standard residue: ([chi angles in deg], [chi bins 1..3]).

    Residues with missing side-chain atoms get NaN angles / bin 0 at the
    affected positions. Role of ampal's `tag_sidechain_dihedrals`.
    """
    out = []
    for res in structure.residues:
        if not res.is_standard_aa:
            continue
        quads = SIDE_CHAIN_DIHEDRALS.get(res.res_name, [])
        angles: list[float] = []
        bins: list[int] = []
        for quad in quads:
            pts = [res.atom(a) for a in quad]
            if any(p is None for p in pts):
                angles.append(float("nan"))
                bins.append(0)
            else:
                ang = float(dihedral(*pts))
                angles.append(ang)
                bins.append(int(chi_bin(ang)))
        out.append((angles, bins))
    return out


def encode_structure_rotamers(structure: Structure) -> list[float]:
    """Per standard residue: flat rotamer class 0..337, or NaN if untaggable.

    Host-side equivalent of the reference's `extract_rotamer_encoding`
    (analyse_utils.py:901-930): residues whose chi-bin combination cannot be
    formed (missing atoms) yield NaN.
    """
    codes: list[float] = []
    std_residues = [r for r in structure.residues if r.is_standard_aa]
    tags = tag_chi_angles(structure)
    for res, (_, bins) in zip(std_residues, tags):
        aa_idx = AA3_TO_INT[res.res_name]
        if CHI_COUNTS[res.res_name] == 0:
            code = encode_chi_bins_to_rotamer(aa_idx, ())
        elif 0 in bins:
            code = None
        else:
            code = encode_chi_bins_to_rotamer(aa_idx, tuple(bins))
        codes.append(float("nan") if code is None else float(code))
    return codes


def kabsch(P, Q):
    """Optimal rotation matrix aligning P onto Q (both (N, 3), centered).

    Returns (R, rmsd). Works with NumPy or JAX arrays (uses only ops both
    support), so it can be vmapped/jitted for batched refold evaluation.
    """
    xp = np
    try:  # transparently support jnp inputs
        import jax.numpy as jnp

        if isinstance(P, jnp.ndarray) or isinstance(Q, jnp.ndarray):
            xp = jnp
    except ImportError:  # pragma: no cover
        pass
    P = xp.asarray(P, dtype=xp.float64 if xp is np else None)
    Q = xp.asarray(Q, dtype=xp.float64 if xp is np else None)
    H = P.T @ Q
    U, S, Vt = xp.linalg.svd(H)
    d = xp.sign(xp.linalg.det(Vt.T @ U.T))
    D = xp.diag(xp.asarray([1.0, 1.0, 1.0]) * xp.stack([xp.ones(()), xp.ones(()), d]))
    R = Vt.T @ D @ U.T
    P_rot = P @ R.T
    rmsd = xp.sqrt(((P_rot - Q) ** 2).sum() / P.shape[0])
    return R, rmsd


def superpose(mobile: np.ndarray, target: np.ndarray):
    """Center + Kabsch-align mobile onto target. Returns (aligned, rmsd)."""
    mobile = np.asarray(mobile, np.float64)
    target = np.asarray(target, np.float64)
    mc = mobile - mobile.mean(axis=0)
    tc = target - target.mean(axis=0)
    R, rmsd = kabsch(mc, tc)
    return mc @ R.T + target.mean(axis=0), float(rmsd)


def gdt(mobile_ca: np.ndarray, target_ca: np.ndarray,
        cutoffs: tuple[float, ...] = (1.0, 2.0, 4.0, 8.0)) -> dict[float, float]:
    """Global Distance Test after CA superposition.

    Same cutoffs as the reference's AF2 evaluation ({1,2,4,8} Å,
    scripts/analyse_af2.py:27-45). Returns {cutoff: fraction within cutoff}.
    """
    aligned, _ = superpose(mobile_ca, target_ca)
    dists = np.linalg.norm(aligned - target_ca, axis=1)
    return {c: float((dists <= c).mean()) for c in cutoffs}


def ca_rmsd(mobile_ca: np.ndarray, target_ca: np.ndarray) -> float:
    """CA RMSD after optimal superposition (PyMOL `align` replacement)."""
    _, rmsd = superpose(mobile_ca, target_ca)
    return rmsd
