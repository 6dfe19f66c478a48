#!/usr/bin/env python
"""Voxelizer parity harness vs real aposteriori output.

Run on any machine where `aposteriori` is installed (it is not installable
in the build image — zero egress), e.g.:

    pip install aposteriori==2.4.0
    python scripts/voxel_parity.py tests/testing_files/1ubq.pdb1.gz

For each mode (gaussian / boolean) it:
  1. runs aposteriori's `make_frame_dataset` on the input with the
     reference's settings (21 A edge, 21 voxels, CNOCBCA codec, -cb True,
     backbone filter — reference README.md:96, ui.py:73-86);
  2. voxelizes the same structure with this framework under each candidate
     Gaussian spreading convention (docs/VOXELIZER_SPEC.md §4);
  3. aligns frames by (chain, residue_id) and prints max-abs / mean-abs
     error per convention plus the worst discrepancies.

Success = one convention < 1e-5 max-abs. Then: mark that convention
[VALIDATED] in docs/VOXELIZER_SPEC.md, make it the default in
voxel/voxelize.py if it is not already, and regenerate
tests/testing_files/golden_1ubq_frames.npz.
"""
from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def aposteriori_frames(pdb_path: Path, gaussian: bool, workdir: Path):
    """Run the real aposteriori make_frame_dataset; return {(chain, rid): frame}."""
    import h5py
    from aposteriori.data_prep.create_frame_data_set import (  # type: ignore
        Codec,
        make_frame_dataset,
    )

    out = make_frame_dataset(
        structure_files=[str(pdb_path)],
        output_folder=str(workdir),
        name=f"apo_{'g' if gaussian else 'b'}",
        frame_edge_length=21.0,
        voxels_per_side=21,
        codec=Codec.CNOCACB(),
        encode_cb=True,
        voxels_as_gaussian=gaussian,
        verbosity=0,
        require_confirmation=False,
    )
    frames = {}
    with h5py.File(out, "r") as f:
        atom_encoder = list(f.attrs["atom_encoder"])
        pdb = next(iter(f.keys()))
        for chain in f[pdb]:
            for rid in f[pdb][chain]:
                frames[(chain, str(rid))] = np.asarray(
                    f[pdb][chain][rid][()], np.float32
                )
    return frames, atom_encoder


def our_frames(pdb_path: Path, gaussian: bool, spread: str):
    from timed_design_tpu.structure import load_pdb
    from timed_design_tpu.voxel import Codec, structure_to_frame_atoms
    from timed_design_tpu.voxel.voxelize import voxelize_frame_atoms

    codec = Codec.CNOCACB()
    s = load_pdb(pdb_path)
    fa = structure_to_frame_atoms(s, codec)
    arr = np.asarray(
        voxelize_frame_atoms(fa, codec, gaussian=gaussian, spread=spread)
    )
    return {
        (c, str(r)): arr[i]
        for i, (c, r) in enumerate(zip(fa.chain_ids, fa.residue_ids))
    }, list(codec.channels)


def compare(ref: dict, ours: dict, label: str) -> float:
    keys = sorted(set(ref) & set(ours))
    missing = set(ref) ^ set(ours)
    if missing:
        print(f"  [{label}] WARNING: {len(missing)} frames only on one side: "
              f"{sorted(missing)[:5]} ...")
    if not keys:
        print(f"  [{label}] NO comparable frames")
        return float("inf")
    errs = np.array([np.abs(ref[k] - ours[k]).max() for k in keys])
    means = np.array([np.abs(ref[k] - ours[k]).mean() for k in keys])
    worst = keys[int(errs.argmax())]
    print(
        f"  [{label}] frames={len(keys)} max_abs={errs.max():.3e} "
        f"mean_abs={means.mean():.3e} worst_frame={worst}"
    )
    return float(errs.max())


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pdb", type=Path, nargs="?",
                    default=REPO / "tests/testing_files/1ubq.pdb1.gz")
    args = ap.parse_args()

    try:
        import aposteriori  # noqa: F401
    except ImportError:
        print("aposteriori is not installed — install it and re-run:\n"
              "    pip install aposteriori==2.4.0\n"
              "(This harness exists to close docs/VOXELIZER_SPEC.md §4.)")
        return 2

    best = {}
    with tempfile.TemporaryDirectory() as td:
        for gaussian in (True, False):
            mode = "gaussian" if gaussian else "boolean"
            print(f"mode={mode}")
            ref, enc = aposteriori_frames(args.pdb, gaussian, Path(td))
            print(f"  aposteriori atom_encoder={enc}")
            spreads = ("integral", "pdf") if gaussian else ("integral",)
            for spread in spreads:
                ours, _ = our_frames(args.pdb, gaussian, spread)
                err = compare(ref, ours, f"{mode}/{spread}")
                best[(mode, spread)] = err

    # PASS requires BOTH modes to have a matching convention — and the
    # gaussian winner is picked among gaussian candidates only. Gating on
    # any() would let a matching boolean mode (which involves none of the
    # §4 gaussian-spreading ambiguity this harness exists to resolve) mask
    # a gaussian failure and record the question as closed.
    gauss = {k: v for k, v in best.items() if k[0] == "gaussian"}
    boolean = {k: v for k, v in best.items() if k[0] == "boolean"}
    gauss_ok = any(v < 1e-5 for v in gauss.values())
    bool_ok = any(v < 1e-5 for v in boolean.values())
    ok = gauss_ok and bool_ok
    print("\nRESULT:", "PASS" if ok else "FAIL",
          {f"{m}/{s}": f"{v:.3e}" for (m, s), v in best.items()})
    if not gauss_ok:
        print("gaussian parity FAILED for both candidate conventions — "
              "docs/VOXELIZER_SPEC.md §4 stays [RECONSTRUCTED].")
    if gauss_ok:
        winner = min(gauss, key=gauss.get)
        print(f"Matching gaussian convention: {winner} — update "
              f"docs/VOXELIZER_SPEC.md §4 to [VALIDATED] and regenerate "
              f"the golden file.")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
