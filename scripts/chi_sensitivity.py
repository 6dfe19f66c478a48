"""Chi-bin convention sensitivity study (docs/AMPAL_SPEC.md §3).

The rotamer ground-truth tagger (structure/geometry.py `tag_chi_angles` /
`encode_structure_rotamers`) replaces ampal's `tag_sidechain_dihedrals` +
the reference's `extract_rotamer_encoding` (analyse_utils.py:901-930, 983).
The {1,2,3} = [0,120)/[120,240)/[240,360) bin convention is [RECONSTRUCTED]
— ampal is not installable in this zero-egress image, so exact provenance
waits on scripts/ampal_parity.py. This study bounds what the ambiguity can
do IN-IMAGE, on real crystal-structure chis (1UBQ):

1. boundary exposure: the fraction of real chi angles within epsilon of our
   bin edges {0, 120, 240} — a misplaced edge only relabels chis near it,
   so low exposure = small blast radius for an edge-placement error;
2. convention selection by density: rotamer physics clusters chis at the
   gauche+/trans/gauche- well centers (~60/180/300 deg). Of the two
   rival 3-way discretizations — edges at {0,120,240} (ours, wells
   interior) vs edges at {60,180,300} (edges AT the wells) — the observed
   chi density picks the one whose edges carry the least mass;
3. error blast radius: per-chi bin disagreement and final 338-class
   disagreement under each rival convention (edge shift +60 deg; mirrored
   dihedral sign — the round-2 sign bug, kept as a regression sentinel).

Prints one JSON line per result; docs/AMPAL_SPEC.md §3 records the numbers
and tests/test_structure.py pins them in CI.

Usage: python scripts/chi_sensitivity.py [path/to/structure ...]
"""
from __future__ import annotations

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).parent.parent))  # repo root

import json
from pathlib import Path

import numpy as np

EDGES_OURS = np.array([0.0, 120.0, 240.0])
EDGES_SHIFT = np.array([60.0, 180.0, 300.0])


def collect_chis(paths):
    """All defined chi angles (deg, [0,360)) + per-residue (aa, bins) pairs."""
    from timed_design_tpu.structure import load_pdb
    from timed_design_tpu.structure.geometry import tag_chi_angles

    angles, residues = [], []
    for p in paths:
        s = load_pdb(p)
        for res, (angs, bins) in zip(
            [r for r in s.residues if r.is_standard_aa], tag_chi_angles(s)
        ):
            defined = [a for a in angs if np.isfinite(a)]
            angles.extend(defined)
            if defined and 0 not in bins:
                residues.append((res.res_name, tuple(defined)))
    return np.asarray(angles), residues


def edge_distance(angles: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Circular distance (deg) from each angle to its nearest edge."""
    d = np.abs(angles[:, None] - edges[None, :]) % 360.0
    return np.minimum(d, 360.0 - d).min(axis=1)


def bins_under(angles, edges_offset: float, mirror: bool = False):
    a = np.mod(-angles if mirror else angles, 360.0)
    return (np.mod(a - edges_offset, 360.0) // 120.0).astype(int) + 1


def encode(residues, edges_offset: float, mirror: bool = False):
    """338-class encodings of complete residues under a bin convention."""
    from timed_design_tpu.constants import AA3_TO_INT
    from timed_design_tpu.constants.rotamers import encode_chi_bins_to_rotamer

    out = []
    for aa, angs in residues:
        bins = tuple(int(b) for b in bins_under(np.asarray(angs), edges_offset, mirror))
        out.append(encode_chi_bins_to_rotamer(AA3_TO_INT[aa], bins))
    return np.asarray([c if c is not None else -1 for c in out])


def main(argv=None) -> list[dict]:
    args = sys.argv[1:] if argv is None else argv
    paths = [Path(a) for a in args] or [
        Path(__file__).parent.parent / "tests/testing_files/1ubq.pdb1.gz"
    ]
    angles, residues = collect_chis(paths)
    results = []

    dist_ours = edge_distance(angles, EDGES_OURS)
    dist_shift = edge_distance(angles, EDGES_SHIFT)
    row = {
        "study": "boundary_exposure",
        "n_chis": int(angles.size),
        "n_residues_encoded": len(residues),
    }
    for eps in (0.1, 0.5, 1.0, 2.0, 5.0, 10.0):
        row[f"frac_within_{eps}deg_of_our_edges"] = round(
            float((dist_ours <= eps).mean()), 4
        )
    row["median_distance_to_our_edges_deg"] = round(float(np.median(dist_ours)), 2)
    results.append(row)

    # Density-based convention selection: mass near each candidate edge set.
    results.append(
        {
            "study": "convention_selection",
            "frac_within_30deg_of_edges_0_120_240": round(
                float((dist_ours <= 30).mean()), 4
            ),
            "frac_within_30deg_of_edges_60_180_300": round(
                float((dist_shift <= 30).mean()), 4
            ),
            "verdict": "edges {0,120,240} sit in low-density regions"
            if (dist_ours <= 30).mean() < (dist_shift <= 30).mean()
            else "AMBIGUOUS — revisit spec",
        }
    )

    # Blast radius of each rival convention.
    ours_bins = bins_under(angles, 0.0)
    ours_codes = encode(residues, 0.0)
    for name, off, mirror in (("edge_shift_60", 60.0, False), ("mirrored_sign", 0.0, True)):
        b = bins_under(angles, off, mirror)
        c = encode(residues, off, mirror)
        results.append(
            {
                "study": f"rival_{name}",
                "per_chi_bin_disagreement": round(float((b != ours_bins).mean()), 4),
                "class338_disagreement": round(float((c != ours_codes).mean()), 4),
            }
        )

    for r in results:
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
