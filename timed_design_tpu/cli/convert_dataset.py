"""`convert-dataset` CLI — migrate aposteriori tree datasets to the flat
fast layout (one-time; ~40x faster batch loading afterwards)."""
from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Convert an aposteriori-schema HDF5 frame dataset to "
                    "the flat fast layout (row-chunked /frames; "
                    "docs/VOXELIZER_SPEC.md §5 attrs preserved)"
    )
    p.add_argument("src", type=str, help="tree-layout .hdf5 dataset")
    p.add_argument("dst", type=str, nargs="?", default=None,
                   help="output path (default: <src>_flat.hdf5)")
    p.add_argument("--chunk-rows", type=int, default=512,
                   help="kept for compatibility; flat output is written "
                        "contiguous (mmap-served by the loader)")
    p.add_argument("--frame-dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"),
                   help="bfloat16 halves file size and loader/H2D bytes; "
                        "numerically identical to the engine's bf16 wire "
                        "cast (the production inference path)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    src = Path(args.src)
    dst = Path(args.dst) if args.dst else src.with_name(src.stem + "_flat.hdf5")
    from ..io import convert_to_flat

    out = convert_to_flat(src, dst, chunk_rows=args.chunk_rows,
                          frame_dtype=args.frame_dtype)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
