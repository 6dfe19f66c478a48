"""`report` CLI — build the static HTML design report from saved artifacts.

`td-predict --report` renders the report during the run; this entry point
rebuilds it later from the run's saved probability CSV + datasetmap (the
reference round-trips the same pair into sample.py/analyse flows,
sample.py:32-36), so no model or device is needed — reviewing an old
benchmark run is one command on any machine.
"""
from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Render a self-contained HTML report from saved predictions"
    )
    p.add_argument("--path_to_pred_matrix", type=str, required=True,
                   help="{model}.csv or {model}_rot.csv from td-predict")
    p.add_argument("--path_to_datasetmap", type=str, default="datasetmap.txt")
    p.add_argument("--path_to_output", type=str, default=".")
    p.add_argument("--predict_rotamers", action="store_true",
                   help="Matrix is 338-class (auto-detected from width; "
                        "flag kept for sample-CLI symmetry)")
    p.add_argument("--is_structure_nmr", action="store_true",
                   help="Decode an NMR multi-state consensus section")
    p.add_argument("--support_old_datasetmap", action="store_true",
                   help="Datasetmap is the per-residue (old) format")
    p.add_argument("--model_name", type=str, default=None,
                   help="Report title/filename stem (default: matrix stem)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..constants import ROTAMER_CATEGORIES
    from ..io import extract_sequences, load_datasetmap, load_prediction_matrix
    from ..report import write_design_report

    matrix_path = Path(args.path_to_pred_matrix)
    P = load_prediction_matrix(matrix_path)
    if args.predict_rotamers and P.shape[1] != 338:
        # forcing 338 categories onto 20-class argmax indices would decode
        # every sequence into {A,C,D,E} garbage with no error
        raise SystemExit(
            f"--predict_rotamers given but {matrix_path.name} has "
            f"{P.shape[1]} columns (a rotamer matrix has 338)"
        )
    rotamer = P.shape[1] == 338
    dmap = load_datasetmap(
        Path(args.path_to_datasetmap), is_old=args.support_old_datasetmap
    )
    decoded = extract_sequences(
        dmap, P,
        rotamer_categories=ROTAMER_CATEGORIES if rotamer else None,
        is_consensus=args.is_structure_nmr,
    )
    name = args.model_name or matrix_path.stem.removesuffix("_rot")
    out = write_design_report(
        decoded.pdb_to_sequence,
        decoded.pdb_to_real_sequence,
        decoded.pdb_to_probability,
        Path(args.path_to_output),
        model_name=name,
        pdb_to_consensus=decoded.pdb_to_consensus,
    )
    print(f"Design report written to {out}")


if __name__ == "__main__":
    main()
