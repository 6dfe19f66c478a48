"""Direct tests for the AF2 pipeline helpers and the plotting layer.

Covers the parts of analyse/af2.py and analyse/plots.py that only ran behind
flags until now: SLURM script emission (reference af2_script_maker.py),
output renaming (move_af2_pdb.py), whole-folder refold evaluation
(analyse_af2_one_folder.py), the combined property table
(analyse_all_properties.py), and the matplotlib plot surface
(analyse_utils.py:313-348, 501-601; design_utils/analyse.py:7-41).
"""
import gzip

import numpy as np
import pytest

from timed_design_tpu.analyse.af2 import (
    analyse_af2_folder,
    combined_property_table,
    make_af2_slurm_script,
    rename_af2_outputs,
)


def _translate_pdb(text: str, shift: float) -> str:
    out = []
    for line in text.splitlines():
        if line.startswith(("ATOM", "HETATM")):
            x = float(line[30:38]) + shift
            line = line[:30] + f"{x:8.3f}" + line[38:]
        out.append(line)
    return "\n".join(out) + "\n"


def _truncate_pdb(text: str, keep_residues: int) -> str:
    out = []
    for line in text.splitlines():
        if line.startswith("ATOM") and int(line[22:26]) > keep_residues:
            continue
        out.append(line)
    return "\n".join(out) + "\n"


@pytest.fixture(scope="module")
def ubq_text(ubq_pdb_gz):
    return gzip.decompress(ubq_pdb_gz.read_bytes()).decode()


@pytest.fixture()
def af2_dir(tmp_path, ubq_text):
    """Fake AF2 output tree: a perfect (translated) refold, a truncated one,
    and a pdb without the rank suffix that must be ignored."""
    d = tmp_path / "af2_out"
    (d / "job_0").mkdir(parents=True)
    (d / "job_0" / "designA_rank_001_model_1.pdb").write_text(
        _translate_pdb(ubq_text, 25.0)
    )
    (d / "job_0" / "designB_rank_001_model_1.pdb").write_text(
        _truncate_pdb(ubq_text, 50)
    )
    (d / "job_0" / "not_ranked.pdb").write_text(ubq_text)
    return d


def test_make_af2_slurm_script(tmp_path):
    job = tmp_path / "job_3"
    job.mkdir()
    out = make_af2_slurm_script(
        job, tmp_path, partition="ampere", gpus=1, cpus=32, hours=36
    )
    assert out.name == "run_af2_job_3.sh"
    body = out.read_text()
    assert body.startswith("#!/bin/bash")
    # the reference's run_af.sh resource shape (scripts/run_af.sh:2-7)
    assert "#SBATCH --partition=ampere" in body
    assert "#SBATCH --gres=gpu:1" in body
    assert "#SBATCH --cpus-per-task=32" in body
    assert "#SBATCH --time=36:00:00" in body
    assert f"colabfold_batch {job}" in body


def test_rename_af2_outputs(af2_dir):
    designs = rename_af2_outputs(af2_dir)
    assert sorted(designs) == ["designA", "designB"]
    assert designs["designA"].name == "designA_rank_001_model_1.pdb"
    # non-suffixed pdbs are not design outputs
    assert all("not_ranked" not in p.name for p in designs.values())


def test_analyse_af2_folder(af2_dir, tmp_path, ubq_text):
    ref = tmp_path / "1ubq.pdb"
    ref.write_text(ubq_text)
    results = analyse_af2_folder(ref, af2_dir)
    assert [r.design for r in results] == ["designA", "designB"]
    perfect, truncated = results
    # pure translation superposes exactly
    assert perfect.rmsd == pytest.approx(0.0, abs=1e-4)
    assert all(v == pytest.approx(1.0) for v in perfect.gdt.values())
    assert np.isfinite(perfect.mean_plddt)
    # length mismatch degrades to NaN (reference analyse_af2_one_folder.py:56-62)
    assert np.isnan(truncated.rmsd)
    assert all(np.isnan(v) for v in truncated.gdt.values())
    assert np.isfinite(truncated.mean_plddt)  # pLDDT needs no alignment


def test_combined_property_table(af2_dir, tmp_path, ubq_text):
    from timed_design_tpu.structure import load_pdb

    ref = tmp_path / "1ubq.pdb"
    ref.write_text(ubq_text)
    refolds = analyse_af2_folder(ref, af2_dir)
    probs = np.random.default_rng(0).dirichlet(np.ones(20), size=76)
    table = combined_property_table(probs, load_pdb(ref), refolds)
    assert 0.0 < table["mean_entropy"] <= np.log2(20) + 1e-9
    assert table["mean_packing_density"] > 0
    assert [d["design"] for d in table["designs"]] == ["designA", "designB"]
    row = table["designs"][0]
    assert set(row) == {"design", "rmsd", "gdt_1", "gdt_2", "gdt_4", "gdt_8",
                        "mean_plddt"}
    assert row["rmsd"] == pytest.approx(0.0, abs=1e-4)


def test_plot_cm_writes_png(tmp_path):
    cm = np.random.default_rng(0).random((20, 20))
    cm /= cm.sum()
    from timed_design_tpu.analyse import plot_cm

    out = plot_cm(cm, [f"r{i}" for i in range(20)], [f"c{i}" for i in range(20)],
                  "test cm plot", tmp_path, display_colorbar=True)
    assert out.name == "test_cm_plot.png"
    assert out.stat().st_size > 1000


def test_plot_mean_var_and_heatmap(tmp_path):
    P = np.random.default_rng(1).dirichlet(np.ones(20), size=40)
    from timed_design_tpu.analyse import plot_mean_var_probs, plot_sequence_heatmap

    p1 = plot_mean_var_probs(P, "modelX", tmp_path)
    p2 = plot_sequence_heatmap(P, "modelX", tmp_path)
    assert p1.exists() and p1.stat().st_size > 1000
    assert p2.exists() and p2.stat().st_size > 1000


def test_create_sequence_logo_20_and_338():
    from timed_design_tpu.analyse import create_sequence_logo

    rng = np.random.default_rng(2)
    fig20 = create_sequence_logo(rng.dirichlet(np.ones(20), size=8))
    assert len(fig20.axes[0].patches) > 8  # at least one glyph per position
    # 338-class input auto-compresses to 20 (analyse_utils.py:322 behavior)
    fig338 = create_sequence_logo(rng.dirichlet(np.ones(338), size=4))
    assert len(fig338.axes[0].patches) > 4
    import matplotlib.pyplot as plt

    plt.close(fig20)
    plt.close(fig338)


def test_create_rot_cm_semantics(tmp_path, monkeypatch):
    """create_rot_cm's panel set, without rendering ~58 giant PNGs: patch
    plot_cm and assert the per-residue selection/normalization semantics
    (reference analyse_utils.py:545-601)."""
    from timed_design_tpu.analyse import plots
    from timed_design_tpu.constants.rotamers import ROTAMER_CATEGORIES

    calls = []
    monkeypatch.setattr(
        plots, "plot_cm",
        lambda cm, y, x, title, out, **kw: calls.append((np.asarray(cm), list(y),
                                                         list(x), title)),
    )
    cm = np.random.default_rng(3).random((338, 338))
    plots.create_rot_cm(cm, ROTAMER_CATEGORIES, "unweighted", tmp_path)

    titles = [c[3] for c in calls]
    # 20 "vs all 338" + 20 "vs 20 res" + 18 "vs same" (ALA/GLY have 1 rotamer)
    assert sum(t.endswith("vs all 338 rot") for t in titles) == 20
    assert sum(t.endswith("vs 20 res") for t in titles) == 20
    same = [t for t in titles if " rot" in t and "all 338" not in t]
    assert len(same) == 18
    for mat, y, x, title in calls:
        if title.endswith("vs all 338 rot"):
            assert mat.shape == (len(y), 338) and len(x) == 338
            assert 0.999 < mat.sum() < 1.001  # normalized per panel
        elif title.endswith("vs 20 res"):
            assert mat.shape == (len(y), 20)
            assert 0.999 < mat.sum() < 1.001
        else:
            assert mat.shape == (len(y), len(y)) and len(y) > 1


@pytest.mark.slow
def test_run_model_benchmark(tmp_path):
    """Zoo benchmark driver (role of scripts/run_benchmark_models.sh):
    one model over the 1ubq dataset, per-model output dir + recovery metrics."""
    from pathlib import Path

    from timed_design_tpu.analyse import run_model_benchmark
    from timed_design_tpu.voxel import make_frame_dataset

    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    h5 = make_frame_dataset([src], tmp_path / "data.hdf5", codec="CNOCBCA")
    results = run_model_benchmark(
        ["TIMED"], h5, tmp_path / "bench", batch_size=128,
        allow_random_weights=True,
    )
    m = results["TIMED"]
    assert 0.0 <= m["accuracy_1"] <= 1.0
    assert m["accuracy_1"] <= m["accuracy_3"] <= 1.0
    assert "predict" in m["timings"] or m["timings"]
    assert (tmp_path / "bench" / "TIMED" / "TIMED.csv").exists()


def test_plot_patterns_driver(tmp_path):
    """plot_patterns (reference design_utils/analyse.py:34-41) emits the
    mean/var histogram from {model}.csv plus one heatmap per structure."""
    import numpy as np
    from timed_design_tpu.analyse import plot_patterns

    rng = np.random.default_rng(3)
    P = rng.dirichlet(np.ones(20), size=30)
    np.savetxt(tmp_path / "modelY.csv", P, delimiter=",")
    cons = {"1abc": rng.dirichlet(np.ones(20), size=10),
            "2xyz": rng.dirichlet(np.ones(20), size=12)}
    paths = plot_patterns(cons, "modelY", tmp_path,
                          prediction_csv=tmp_path / "modelY.csv")
    assert len(paths) == 3
    for p in paths:
        assert p.exists() and p.stat().st_size > 1000
