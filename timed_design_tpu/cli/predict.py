"""`predict` CLI — design sequences from a frame dataset.

Flag surface mirrors the reference's predict.py:250-298 so existing
invocations port directly; adds --voxelize to go straight from PDB files
(no pre-built aposteriori dataset needed).
"""
from __future__ import annotations

import argparse
from pathlib import Path

from ..utils.config import PredictConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Predict sequences with the TPU model zoo")
    p.add_argument("--batch_size", type=int, default=512,
                   help="Frames per compiled device step (default: 512)")
    p.add_argument("--path_to_dataset", type=str, required=True,
                   help="Path to .hdf5 frame dataset, or a PDB file/dir with --voxelize")
    p.add_argument("--path_to_datasetmap", type=str, default="datasetmap.txt")
    p.add_argument("--path_to_model", type=str, nargs="+", required=True,
                   help="Model .h5 path(s) or registry name(s): TIMED, ProDCoNN, ...")
    p.add_argument("--path_to_blacklist", type=str, default=None)
    p.add_argument("--path_to_output", type=str, default=".")
    p.add_argument("--predict_rotamers", action="store_true",
                   help="338-rotamer head instead of 20 residues")
    p.add_argument("--is_structure_nmr", action="store_true",
                   help="Build a consensus over NMR states")
    p.add_argument("--start_batch", type=int, default=0,
                   help="Resume from this batch index")
    p.add_argument("--voxelize", action="store_true",
                   help="Input is PDB file(s): voxelize on device first")
    p.add_argument("--codec", type=str, default="CNOCACB")
    p.add_argument("--output_analysis", action="store_true",
                   help="Emit probability heatmaps, mean/var plots and "
                        "sequence logos per structure")
    p.add_argument("--report", action="store_true",
                   help="Write a self-contained {model}_report.html per "
                        "model (sequences, metrics, heatmap, entropy, logo "
                        "— the UI's output section as one static artifact)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="Conv compute dtype; bfloat16 runs ~1.7x faster on "
                        "the MXU (float32 default for strict CSV parity)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="Write a jax.profiler trace of the run to DIR "
                        "(open with TensorBoard / xprof)")
    p.add_argument("--ensemble", action="store_true",
                   help="Also average the models' probability matrices and "
                        "emit the full artifact set as 'ensemble' "
                        "(csv/fasta/SRB; needs >=2 models with the same "
                        "head). Costs no extra device time: every model "
                        "already runs on the same device-resident batches.")
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8", "int8-fake", "w8"],
                   help="run convs quantized (models/quantize.py): int8 = "
                        "real integer convs; int8-fake = int8 numerics at "
                        "float speed; w8 = weight-only. Measured SLOWER "
                        "than bf16 on v5e XLA (BASELINE.md) — "
                        "characterization option, not a production default")
    p.add_argument("--allow-random-weights", action="store_true",
                   dest="allow_random_weights",
                   help="Permit bare registry names with no weights "
                        "(randomly initialized — benchmarking only). "
                        "Without this flag, a model given as a registry "
                        "name must carry weights via .h5 or Name@ckpt.npz.")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    out = Path(args.path_to_output)
    out.mkdir(parents=True, exist_ok=True)

    dataset_path = Path(args.path_to_dataset)
    if args.voxelize:
        from ..voxel import make_frame_dataset

        pdbs = (
            sorted(dataset_path.glob("**/*.pdb*"))
            if dataset_path.is_dir()
            else [dataset_path]
        )
        dataset_path = out / "dataset.hdf5"
        print(f"Voxelizing {len(pdbs)} structure(s) -> {dataset_path}")
        # NMR consensus needs EVERY state voxelized as <pdb>_<i> groups —
        # without this the "consensus" silently equals the state-0 prediction
        make_frame_dataset(pdbs, dataset_path, codec=args.codec,
                           voxelise_all_states=args.is_structure_nmr)

    cfg = PredictConfig(
        path_to_dataset=dataset_path,
        path_to_model=args.path_to_model,
        path_to_datasetmap=Path(args.path_to_datasetmap),
        path_to_output=out,
        path_to_blacklist=Path(args.path_to_blacklist) if args.path_to_blacklist else None,
        batch_size=args.batch_size,
        start_batch=args.start_batch,
        predict_rotamers=args.predict_rotamers,
        is_structure_nmr=args.is_structure_nmr,
    ).validate()

    from ..engine import load_dataset_and_predict

    compute_dtype = None
    if args.compute_dtype != "float32":
        import jax.numpy as jnp

        compute_dtype = getattr(jnp, args.compute_dtype)

    import contextlib

    profile_cm = contextlib.nullcontext()
    if args.profile:
        import jax

        profile_cm = jax.profiler.trace(args.profile)
    with profile_cm:
        result = load_dataset_and_predict(
            cfg.path_to_model,
            cfg.path_to_dataset,
            batch_size=cfg.batch_size,
            start_batch=cfg.start_batch,
            dataset_map_path=cfg.path_to_datasetmap,
            blacklist=cfg.path_to_blacklist,
            predict_rotamers=cfg.predict_rotamers,
            is_consensus=cfg.is_structure_nmr,
            path_to_output=cfg.path_to_output,
            compute_dtype=compute_dtype,
            allow_random_weights=args.allow_random_weights,
            ensemble=args.ensemble,
            quantize=args.quantize,
        )
    if args.profile:
        print(f"Profiler trace written to {args.profile}")
    print(f"Predicted {sum(len(s) for s in result.pdb_to_sequence.values())} residues "
          f"across {len(result.pdb_to_sequence)} chains.")
    for phase, secs in result.timings.items():
        print(f"  {phase}: {secs:.2f}s")

    if args.report:
        from ..report import write_design_report

        # the result bundle holds the LAST model's maps (engine loop) — name
        # the report after it ("TIMED" from models/TIMED.h5 or TIMED@ckpt);
        # with --ensemble the bundle is the ensemble's
        name = (
            "ensemble" if args.ensemble
            else Path(str(args.path_to_model[-1])).stem.split("@")[0]
        )
        path = write_design_report(
            result.pdb_to_sequence,
            result.pdb_to_real_sequence,
            result.pdb_to_probability,
            out,
            model_name=name,
            pdb_to_consensus=result.pdb_to_consensus,
        )
        print(f"Design report written to {path}")
    if args.output_analysis:
        # Per-structure graphs (reference predict.py:283-286 --output_analysis)
        from ..analyse import (
            create_sequence_logo,
            plot_mean_var_probs,
            plot_sequence_heatmap,
        )

        for pdb, probs in result.pdb_to_probability.items():
            import numpy as np

            probs = np.asarray(probs)
            if probs.shape[1] == 338:
                # the heatmap's y-axis is the 20 amino acids; collapse
                # rotamer probabilities first (the logo does this itself)
                from ..constants import compress_rotamer_probs

                heat = np.asarray(compress_rotamer_probs(probs))
            else:
                heat = probs
            plot_sequence_heatmap(heat, f"{pdb} probabilities", out)
            plot_mean_var_probs(probs, f"{pdb}", out)
            fig = create_sequence_logo(probs)
            fig.savefig(out / f"{pdb}_logo.png")
            import matplotlib.pyplot as plt

            plt.close(fig)  # a benchmark set leaks one live figure per chain
        print(f"Analysis graphs written to {out}")


if __name__ == "__main__":
    main()
