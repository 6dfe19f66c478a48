#!/usr/bin/env python
"""ampal parity harness: chi tags, rotamer encodings, sequence metrics.

Run on any machine where `ampal` is installed (it is not installable in the
build image — zero egress), e.g.:

    pip install ampal
    python scripts/ampal_parity.py tests/testing_files/1ubq.pdb1.gz

Diffs, per docs/AMPAL_SPEC.md §5:
  1. chi angles: ampal `tag_sidechain_dihedrals` (`res.tags['chi_angles']`)
     vs our `tag_chi_angles`, compared mod 360 to 0.01 deg;
  2. chi bins / rotamer tags: `res.tags['rotamers']` vs our bins, exact;
  3. 338-class encodings: the reference's key scheme
     `{mol_code}_{''.join(bins)}` (analyse_utils.py:922) over ampal tags vs
     our `encode_structure_rotamers`, exact (NaN where either is NaN);
  4. sequence metrics: ampal.analyse_protein sequence_charge /
     sequence_isoelectric_point / sequence_molecular_weight /
     sequence_molar_extinction_280 vs our batched metrics, plus a direct
     diff of whatever constant tables the install exposes.

On mismatch it prints the exact correction: which constant table or bin
edge to change in constants/amino_acids.py / structure/geometry.py — the
formulas themselves need no change. Exit code 0 = full parity.
"""
from __future__ import annotations

import gzip
import math
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TOL_ANGLE = 0.01  # deg
TOL_METRIC = 1e-6  # relative, for MW/ext; charge/pI compared to 1e-3 abs


def load_ampal(path: Path):
    import ampal

    if path.suffix == ".gz":
        with gzip.open(path, "rb") as fh:
            assembly = ampal.load_pdb(fh.read().decode(), path=False)
    else:
        assembly = ampal.load_pdb(str(path))
    if isinstance(assembly, ampal.AmpalContainer):
        assembly = assembly[0]
    polys = (
        [m for m in assembly if isinstance(m, ampal.Polypeptide)]
        if isinstance(assembly, ampal.Assembly)
        else [assembly]
    )
    for p in polys:
        p.tag_sidechain_dihedrals()
    return polys


def ampal_residue_rows(polys):
    """[(chain_id, res_seq, icode, mol_code, chis, rotamer_bins)] per residue."""
    rows = []
    for poly in polys:
        for res in poly:
            chis = res.tags.get("chi_angles")
            rots = res.tags.get("rotamers")
            rows.append(
                (
                    str(poly.id),
                    int(res.id),
                    str(getattr(res, "insertion_code", "") or "").strip(),
                    res.mol_code,
                    list(chis) if isinstance(chis, (list, tuple)) else None,
                    list(rots) if isinstance(rots, (list, tuple)) else None,
                )
            )
    return rows


def our_residue_rows(path: Path):
    from timed_design_tpu.structure import load_pdb
    from timed_design_tpu.structure.geometry import (
        encode_structure_rotamers,
        tag_chi_angles,
    )

    s = load_pdb(path)
    std = [r for r in s.residues if r.is_standard_aa]
    tags = tag_chi_angles(s)
    codes = encode_structure_rotamers(s)
    return [
        (r.chain_id, r.res_seq, r.icode.strip(), r.res_name, angs, bins, code)
        for r, (angs, bins), code in zip(std, tags, codes)
    ]


def circ_delta(a: float, b: float) -> float:
    d = abs((a % 360.0) - (b % 360.0)) % 360.0
    return min(d, 360.0 - d)


def diff_structure(path: Path) -> int:
    from timed_design_tpu.constants import AA3_TO_INT
    from timed_design_tpu.constants.rotamers import encode_chi_bins_to_rotamer

    theirs = {
        (c, i, ic): (mol, chis, rots)
        for c, i, ic, mol, chis, rots in ampal_residue_rows(load_ampal(path))
    }
    failures = 0
    n_angle = n_bin = n_code = 0
    for c, i, ic, mol, angs, bins, code in our_residue_rows(path):
        key = (c, i, ic)
        if key not in theirs:
            print(f"  [warn] {key} {mol}: residue absent from ampal parse")
            continue
        t_mol, t_chis, t_rots = theirs[key]
        if t_mol != mol:
            print(f"  MISMATCH residue identity {key}: ampal={t_mol} ours={mol}")
            failures += 1
            continue
        t_chis = t_chis or []
        ours_def = [a for a in angs if math.isfinite(a)]
        t_def = [a for a in t_chis if a is not None]
        for k, (ta, oa) in enumerate(zip(t_def, ours_def)):
            n_angle += 1
            if circ_delta(float(ta), float(oa)) > TOL_ANGLE:
                print(
                    f"  MISMATCH chi{k+1} {key} {mol}: ampal={ta:.3f} ours={oa:.3f}"
                    " -> check SIDE_CHAIN_DIHEDRALS quadruple / dihedral sign"
                )
                failures += 1
        if t_rots:
            our_bins = [b for b in bins if b != 0]
            for k, (tb, ob) in enumerate(zip(t_rots, our_bins)):
                n_bin += 1
                if int(tb) != int(ob):
                    print(
                        f"  MISMATCH bin chi{k+1} {key} {mol}: ampal={tb} ours={ob}"
                        " -> adjust chi_bin edges (structure/geometry.py)"
                    )
                    failures += 1
            # Reference key scheme -> flat 338 class (analyse_utils.py:918-928)
            n_code += 1
            t_code = encode_chi_bins_to_rotamer(
                AA3_TO_INT[mol], tuple(int(b) for b in t_rots)
            )
            ours_code = None if math.isnan(code) else int(code)
            if t_code != ours_code:
                print(
                    f"  MISMATCH 338-class {key} {mol}: ampal={t_code} ours={ours_code}"
                )
                failures += 1
    print(
        f"  compared {n_angle} chi angles, {n_bin} bins, {n_code} encodings: "
        f"{failures} mismatches"
    )
    return failures


def diff_metrics(path: Path) -> int:
    from ampal.analyse_protein import (
        sequence_charge,
        sequence_isoelectric_point,
        sequence_molar_extinction_280,
        sequence_molecular_weight,
    )

    from timed_design_tpu.sample.metrics import sequence_metrics
    from timed_design_tpu.structure import load_pdb

    failures = 0
    seqs = [ch.sequence for ch in load_pdb(path).chains if ch.sequence]
    seqs += ["ACDEFGHIKLMNPQRSTVWY", "KKKKKK", "DDDDDD", "W", "GGGG"]
    for seq in seqs:
        ours = sequence_metrics(seq)  # (charge, pI, mw, ext280)
        theirs = (
            sequence_charge(seq),
            sequence_isoelectric_point(seq),
            sequence_molecular_weight(seq),
            sequence_molar_extinction_280(seq),
        )
        names = ("charge", "pI", "MW", "ext280")
        tols = (1e-3, 1e-2, TOL_METRIC * theirs[2], 0.5)
        for name, o, t, tol in zip(names, ours, theirs, tols):
            if abs(float(o) - float(t)) > tol:
                hint = (
                    "swap PKA_POSITIVE/PKA_NEGATIVE to ampal's pKa table"
                    if name in ("charge", "pI")
                    else f"swap RESIDUE_{'MW' if name == 'MW' else 'EXT_280'}"
                )
                print(
                    f"  MISMATCH {name}({seq[:12]}…): ampal={t:.4f} ours={float(o):.4f}"
                    f" -> {hint} (constants/amino_acids.py)"
                )
                failures += 1
    # Direct table diff where the install exposes its constants.
    try:
        from ampal import amino_acids as aa_mod

        for attr in dir(aa_mod):
            if "pka" in attr.lower() or "pk_a" in attr.lower():
                print(f"  ampal constant table {attr} = {getattr(aa_mod, attr)}")
    except Exception:
        pass
    print(f"  metrics over {len(seqs)} sequences: {failures} mismatches")
    return failures


def main() -> int:
    paths = [Path(a) for a in sys.argv[1:]] or [
        REPO / "tests/testing_files/1ubq.pdb1.gz"
    ]
    try:
        import ampal  # noqa: F401
    except ImportError:
        print(
            "ampal is not installed — run this harness on a machine with\n"
            "`pip install ampal` (see docs/AMPAL_SPEC.md §5)."
        )
        return 2
    total = 0
    for p in paths:
        print(f"== {p}")
        total += diff_structure(p)
        total += diff_metrics(p)
    print(f"TOTAL mismatches: {total}")
    return 0 if total == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
