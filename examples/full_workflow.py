#!/usr/bin/env python
"""End-to-end workflow walkthrough on the 1ubq fixture.

Runs the whole capability surface in one script (CPU or TPU):
  1. voxelize a backbone into an aposteriori-schema HDF5 dataset
  2. design sequences with a zoo model (full artifact set)
  3. Monte-Carlo sample at a temperature sweep
  4. evaluate: sequence recovery metrics, crystal-rotamer tagging,
     prediction entropy, refold-style RMSD/GDT (self-refold here)
  5. train a small model for a few steps and re-predict from the checkpoint

Usage: python examples/full_workflow.py [WORKDIR]
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
UBQ = REPO / "tests" / "testing_files" / "1ubq.pdb1.gz"
sys.path.insert(0, str(REPO))  # run without installing


def main() -> None:
    if "--cpu" in sys.argv:  # force CPU even when a TPU platform is pinned
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    work.mkdir(parents=True, exist_ok=True)
    print(f"workdir: {work}")

    # 1. voxelize -------------------------------------------------------
    from timed_design_tpu.voxel import make_frame_dataset

    dataset = make_frame_dataset([UBQ], work / "data.hdf5", codec="CNOCACB")
    print(f"[1] voxelized -> {dataset}")
    # optional: the flat fast layout (~40x faster batch loading; also
    # available for existing aposteriori datasets via td-convert-dataset)
    from timed_design_tpu.io import convert_to_flat

    flat = convert_to_flat(dataset, work / "data_flat.hdf5")
    print(f"    flat fast layout -> {flat}")

    # 2. design ---------------------------------------------------------
    from timed_design_tpu.engine import load_dataset_and_predict

    result = load_dataset_and_predict(
        ["TIMED_rotamer_not_so_deep"], dataset, batch_size=128, allow_random_weights=True,
        path_to_output=work, dataset_map_path=work / "datasetmap.txt",
        predict_rotamers=True,
    )
    seq = result.pdb_to_sequence["1ubqA"]
    print(f"[2] designed: {seq}")
    print(f"    native:   {result.pdb_to_real_sequence['1ubqA']}")

    # 3. sample ---------------------------------------------------------
    from timed_design_tpu.analyse import run_temperature_sweep

    import os

    # resolve BEFORE chdir: a relative WORKDIR argument would otherwise
    # double up (work/work/...) in every later step
    work = work.resolve()
    os.chdir(work)
    sweep = run_temperature_sweep(
        work / "TIMED_rotamer_not_so_deep_rot.csv",
        work / "TIMED_rotamer_not_so_deep.txt",
        sample_n=20, temperatures=(0.1, 1.0), predict_rotamers=True,
        save_as="fasta",
    )
    print(f"[3] sampled at T=0.1 and T=1.0 -> {sweep[0.1][0]}")

    # 4. evaluate -------------------------------------------------------
    from timed_design_tpu.analyse import (
        analyse_refold,
        calculate_metrics,
        calculate_prediction_entropy,
        tag_structures_with_rotamers,
    )

    m = calculate_metrics(result.pdb_to_sequence, result.pdb_to_real_sequence)
    print(f"[4] recovery top-1 {m['accuracy_1']:.3f}  top-3 {m['accuracy_3']:.3f}")
    tags, _ = tag_structures_with_rotamers({"1ubq": UBQ})
    print(f"    tagged {np.isfinite(tags['1ubqA']).sum()}/76 crystal rotamers")
    ent = calculate_prediction_entropy(result.pdb_to_probability["1ubqA"])
    print(f"    mean prediction entropy {ent.mean():.2f} bits")
    refold = analyse_refold(UBQ, UBQ, "self")
    print(f"    self-refold RMSD {refold.rmsd:.3f} GDT4 {refold.gdt[4.0]:.2f}")

    # 5. train + re-predict --------------------------------------------
    import optax

    from timed_design_tpu.io import FrameBatchLoader, create_flat_dataset_map
    from timed_design_tpu.models import timed
    from timed_design_tpu.train import fit, save_checkpoint
    from timed_design_tpu.engine import predict_structure

    from timed_design_tpu.train import load_checkpoint_params

    dmap, _ = create_flat_dataset_map(dataset)
    loader = list(FrameBatchLoader(dataset, dmap, batch_size=38))
    module = timed(filters=(8, 16))
    state = fit(module, loader, n_classes=20, epochs=2, log_every=2)
    ckpt = work / "trained.npz"
    save_checkpoint(state, ckpt)
    # reload the checkpoint and predict with it (CLI equivalent:
    # --path_to_model TIMED@trained.npz when trained via cli/train.py)
    restored = load_checkpoint_params(ckpt)
    probs, _ = predict_structure(UBQ, (module, restored), codec="CNOCACB",
                                 batch_size=128)
    print(f"[5] trained {int(state.step)} steps; re-predicted {probs.shape}")

    # 6. persistent serving session --------------------------------------
    from timed_design_tpu.engine import DesignSession
    import time

    sess = DesignSession(
        "TIMED_rotamer_not_so_deep", batch_size=128,
        allow_random_weights=True,
    )
    sess.design(UBQ)  # compile
    t0 = time.perf_counter()
    seq2 = sess.design_sequence(UBQ)
    print(f"[6] warm serving design: {time.perf_counter() - t0:.3f}s "
          f"(frames stay on device)")
    print("workflow complete.")


if __name__ == "__main__":
    main()
