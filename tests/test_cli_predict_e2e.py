"""predict CLI end-to-end through a subprocess: PDB -> voxelize -> .h5 model
-> artifact set. The last untested seam (argparse main -> engine) exercised
exactly as a reference user would invoke it."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REPO = Path(__file__).resolve().parents[1]


def test_predict_cli_subprocess(tmp_path, ubq_pdb_gz):
    keras = tf.keras
    m = keras.Sequential()
    m.add(keras.layers.Input(shape=(21, 21, 21, 5)))
    m.add(keras.layers.Conv3D(8, 3, padding="same", activation="elu"))
    m.add(keras.layers.Conv3D(20, 1, padding="same"))
    m.add(keras.layers.GlobalAveragePooling3D())
    m.add(keras.layers.Softmax())
    h5 = tmp_path / "TIMED_tiny.h5"
    m.save(h5)

    proc = subprocess.run(
        [sys.executable, "-m", "timed_design_tpu.cli.predict",
         "--path_to_dataset", str(ubq_pdb_gz),
         "--voxelize", "--codec", "CNOCACB",
         "--path_to_model", str(h5),
         "--path_to_output", str(tmp_path),
         "--path_to_datasetmap", str(tmp_path / "datasetmap.txt"),
         "--batch_size", "128"],
        capture_output=True, text=True, cwd=REPO,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
             "HOME": "/root"},
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Predicted 76 residues" in proc.stdout
    probs = np.loadtxt(tmp_path / "TIMED_tiny.csv", delimiter=",")
    assert probs.shape == (76, 20)
    fasta = (tmp_path / "TIMED_tiny.fasta").read_text()
    assert fasta.startswith(">1ubqA\n") and len(fasta.splitlines()[1]) == 76
    assert (tmp_path / "dataset.fasta").exists()


@pytest.mark.slow
def test_predict_cli_rotamer_output_analysis(tmp_path, ubq_pdb_gz):
    """--output_analysis in rotamer mode: the heatmap must come from the
    20-class compressed matrix (338 rows under 20 AA labels were
    misleading), alongside the logo and mean/var plots."""
    from timed_design_tpu.cli.predict import main

    main([
        "--path_to_dataset", str(ubq_pdb_gz),
        "--voxelize", "--codec", "CNOCACB",
        "--path_to_model", "TIMED_rotamer_not_so_deep",
        "--predict_rotamers", "--allow-random-weights",
        "--path_to_output", str(tmp_path),
        "--path_to_datasetmap", str(tmp_path / "datasetmap.txt"),
        "--batch_size", "128", "--output_analysis", "--report",
    ])
    pngs = sorted(p.name for p in tmp_path.glob("*.png"))
    assert any("heatmap" in n for n in pngs), pngs
    assert any("logo" in n for n in pngs), pngs
    assert any("mean_var" in n for n in pngs), pngs
    report = tmp_path / "TIMED_rotamer_not_so_deep_report.html"
    assert report.exists() and "338-rotamer head" in report.read_text()
