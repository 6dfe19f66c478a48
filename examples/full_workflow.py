#!/usr/bin/env python
"""End-to-end workflow walkthrough on the 1ubq fixture.

Runs the whole capability surface in one script (CPU or TPU) — the
reference's real-world flow end-to-end (SURVEY §3.5):
  1. voxelize a backbone into an aposteriori-schema HDF5 dataset
  2. design sequences with a zoo model (full artifact set)
  3. Monte-Carlo sample at a temperature sweep
  4. evaluate: sequence recovery metrics, crystal-rotamer tagging,
     prediction entropy, refold-style RMSD/GDT (self-refold here)
  5. train a small model for a few steps and re-predict from the checkpoint
  6. warm persistent serving session
  7. 3-way rotamer analysis via the analyse_rotamers CLI with a stand-in
     SCWRL binary (wt / scwrl-pred / scwrl-real + scwrl_scores.csv)
  8. AF2 evaluation pipeline on synthetic refold outputs: partition the
     sampled fasta into job folders, emit SLURM scripts, rename/score the
     "refolds" (RMSD/GDT/pLDDT), combined property table
  9. plots: metric-vs-temperature sweep, prediction-pattern plots, SCWRL
     score comparison

The asserted artifact tree at the end is the integration proof that every
component composes; tests/test_full_workflow.py runs this script in CI.

Usage: python examples/full_workflow.py [WORKDIR] [--cpu]
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

    # 7. rotamer 3-way analysis (analyse_rotamers CLI + stand-in SCWRL) --
    import gzip
    import stat

    from timed_design_tpu.cli.analyse_rotamers import main as rot_main

    # the real SCWRL4 is licensed and absent; this stand-in honors the
    # -i/-o/-s contract and the "Total minimal energy" stdout line the
    # adapter parses (reference scwrl_utils.py:16-49)
    fake_scwrl = work / "Scwrl4"
    fake_scwrl.write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "args = dict(zip(sys.argv[1::2], sys.argv[2::2]))\n"
        "pdb = open(args['-i']).read()\n"
        "seq = open(args['-s']).read().split()[0].strip()\n"
        "open(args['-o'], 'w').write(pdb)\n"
        "print('Total minimal energy of the graph =', -17.25 - len(seq) * 0.5)\n"
    )
    fake_scwrl.chmod(fake_scwrl.stat().st_mode | stat.S_IEXEC)
    pdb_mirror = work / "pdbs"
    pdb_mirror.mkdir(exist_ok=True)
    (pdb_mirror / "1ubq.pdb1.gz").write_bytes(UBQ.read_bytes())
    rotout = work / "rotamer_analysis"
    rot_main([
        "--path_to_pred_matrix", str(work / "TIMED_rotamer_not_so_deep_rot.csv"),
        # the per-residue map carries the native sequences the scwrl-real
        # analysis repacks (the SRB per-model map has none)
        "--path_to_datasetmap", str(work / "datasetmap.txt"),
        "--support_old_datasetmap",
        "--path_to_pdb", str(pdb_mirror),
        "--path_to_output", str(rotout),
        "--path_to_scwrl", str(fake_scwrl),
    ])
    print(f"[7] rotamer 3-way analysis -> {rotout}")

    # 8. AF2 evaluation pipeline on synthetic refolds --------------------
    import json

    from timed_design_tpu.analyse import (
        analyse_af2_folder,
        combined_property_table,
        make_af2_slurm_script,
        partition_fastas,
        read_fasta,
    )
    from timed_design_tpu.structure import load_pdb

    sampled_fasta = next(p for p in sweep[0.1] if str(p).endswith(".fasta"))
    af2_dir = work / "af2"
    folders = partition_fastas(sampled_fasta, af2_dir, per_folder=8)
    scripts = [make_af2_slurm_script(f, af2_dir) for f in folders]
    # synthesize "AF2 outputs": each design refolds to the native backbone
    # (in production these come back from the SLURM jobs)
    ubq_text = gzip.decompress(UBQ.read_bytes()).decode()
    for name in read_fasta(sampled_fasta):
        outdir = af2_dir / "out"
        outdir.mkdir(exist_ok=True)
        (outdir / f"{name}_rank_001.pdb").write_text(ubq_text)
    refolds = analyse_af2_folder(UBQ, af2_dir / "out")
    table = combined_property_table(
        result.pdb_to_probability["1ubqA"], load_pdb(UBQ), refolds
    )
    (work / "af2_properties.json").write_text(json.dumps(table, indent=1))
    print(f"[8] AF2 pipeline: {len(folders)} job folder(s), "
          f"{len(scripts)} SLURM script(s), {len(refolds)} refolds scored, "
          f"mean RMSD {np.nanmean([r.rmsd for r in refolds]):.3f}")

    # 9. plots -----------------------------------------------------------
    import csv as _csv

    from timed_design_tpu.analyse import (
        SweepPoint,
        plot_metric_vs_temperature,
        plot_patterns,
        plot_scwrl_scores,
    )

    points = []
    for temp, paths in sweep.items():
        mcsv = next(p for p in paths if str(p).endswith("_metrics.csv"))
        rows = list(_csv.DictReader(open(mcsv)))
        points.append(SweepPoint(temp, np.array(
            [float(r["isoelectric_point"]) for r in rows])))
    plots_dir = work / "plots"
    plots_dir.mkdir(exist_ok=True)
    p1 = plot_metric_vs_temperature(points, "isoelectric point", plots_dir)
    p2 = plot_patterns(
        {"1ubq": result.pdb_to_probability["1ubqA"]},
        "TIMED_rotamer_not_so_deep", plots_dir,
        prediction_csv=work / "TIMED_rotamer_not_so_deep.csv",
    )
    p3 = plot_scwrl_scores({"TIMED_rotamer_not_so_deep": rotout}, plots_dir)
    print(f"[9] plots: {p1.name}, {[p.name for p in p2]}, {p3.name}")

    # ---- asserted artifact tree (the integration contract) -------------
    expected = [
        work / "data.hdf5",
        work / "data_flat.hdf5",
        work / "datasetmap.txt",
        work / "encoded_labels.csv",
        work / "TIMED_rotamer_not_so_deep.csv",
        work / "TIMED_rotamer_not_so_deep_rot.csv",
        work / "TIMED_rotamer_not_so_deep.fasta",
        work / "dataset.fasta",
        work / "trained.npz",
        rotout / "results_wt.txt",
        rotout / "results_scwrl_pred.txt",
        rotout / "results_scwrl_real.txt",
        rotout / "scwrl_scores.csv",
        af2_dir / "job_0",
        work / "af2_properties.json",
        plots_dir / "isoelectric_point_vs_temperature.png",
        plots_dir / "scwrl_scores_comparison.png",
        p1, p3, *p2, *scripts, sampled_fasta,
    ]
    missing = [str(p) for p in expected if not Path(p).exists()]
    assert not missing, f"missing artifacts: {missing}"
    print(f"workflow complete: {len(expected)} artifacts verified under {work}")


if __name__ == "__main__":
    main()
