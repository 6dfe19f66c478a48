"""`voxelize` CLI — PDB files -> aposteriori-schema HDF5 frame dataset.

The in-framework replacement for the external `make-frame-dataset` command
(reference README.md:84-96): same flag vocabulary, voxelization runs as one
XLA program per structure on the accelerator.
"""
from __future__ import annotations

import argparse
from pathlib import Path

from ..utils.config import VoxelizeConfig


def _strict_bool(flag: str, value: str) -> bool:
    """Parse the aposteriori-style 'True'/'False' flag values STRICTLY.

    A permissive `value in ("true","1","yes")` maps every typo ('Ture',
    'on', 'True ') to False — silently flipping the dataset encoding that
    every downstream model depends on."""
    v = value.strip().lower()
    if v in ("true", "1", "yes"):
        return True
    if v in ("false", "0", "no"):
        return False
    raise SystemExit(f"{flag}: expected True/False, got {value!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Voxelize PDB structures into frames")
    p.add_argument("structures", type=str, help="PDB file or directory")
    p.add_argument("-e", "--extension", type=str, default=".pdb",
                   help="PDB file extension when a directory is given")
    p.add_argument("-n", "--name", type=str, default="dataset")
    p.add_argument("-o", "--output", type=str, default=".")
    p.add_argument("--voxels-per-side", type=int, default=21)
    p.add_argument("--frame-edge-length", type=float, default=21.0)
    p.add_argument("-ae", "--atom-encoder", type=str, default="CNOCACB")
    p.add_argument("-g", "--voxels-as-gaussian", type=str, default="True")
    p.add_argument("-cb", "--encode-cb", type=str, default="True")
    p.add_argument("--voxelise_all_states", action="store_true",
                   help="Keep every NMR state (consensus flow)")
    p.add_argument("--layout", type=str, default="tree",
                   choices=["tree", "flat"],
                   help="'tree' = aposteriori-schema groups (interoperable); "
                        "'flat' = row-chunked fast layout (~40x faster "
                        "batch loading)")
    p.add_argument("--frame-dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="flat layout only: bfloat16 halves file size and "
                        "loader/H2D bytes; identical to the engine's bf16 "
                        "wire cast")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    src = Path(args.structures)
    paths = (
        sorted(src.glob(f"**/*{args.extension}")) if src.is_dir() else [src]
    )
    if not paths:
        raise SystemExit(f"No structures matching *{args.extension} under {src}")
    cfg = VoxelizeConfig(
        structure_paths=paths,
        output_path=Path(args.output) / f"{args.name}.hdf5",
        codec=args.atom_encoder,
        voxels_per_side=args.voxels_per_side,
        frame_edge_length=args.frame_edge_length,
        gaussian=_strict_bool("--voxels-as-gaussian", args.voxels_as_gaussian),
        encode_cb=_strict_bool("--encode-cb", args.encode_cb),
        voxelise_all_states=args.voxelise_all_states,
    )
    from ..voxel import make_frame_dataset

    out = make_frame_dataset(
        cfg.structure_paths,
        cfg.output_path,
        codec=cfg.codec,
        voxels_per_side=cfg.voxels_per_side,
        frame_edge_length=cfg.frame_edge_length,
        gaussian=cfg.gaussian,
        encode_cb=cfg.encode_cb,
        voxelise_all_states=cfg.voxelise_all_states,
        layout=args.layout,
        frame_dtype=args.frame_dtype,
    )
    print(f"Wrote {out} from {len(paths)} structure(s)")


if __name__ == "__main__":
    main()
