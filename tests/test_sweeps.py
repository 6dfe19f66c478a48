"""Sweep orchestration + plots (scripts-layer equivalents)."""
import numpy as np
import pytest

from timed_design_tpu.analyse import (
    DEFAULT_TEMPERATURES,
    SweepPoint,
    plot_metric_vs_temperature,
    plot_models_comparison,
    run_temperature_sweep,
)


def test_default_temperatures_match_reference():
    # run_sampling.sh: T in {0.1, 0.5, 1, 2, 5}
    assert DEFAULT_TEMPERATURES == (0.1, 0.5, 1.0, 2.0, 5.0)


def test_temperature_sweep(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    probs = rng.random((8, 20))
    probs /= probs.sum(1, keepdims=True)
    np.savetxt(tmp_path / "TIMED.csv", probs, delimiter=",")
    (tmp_path / "TIMED.txt").write_text(
        "ignore_uncommon False\ninclude_pdbs\n##########\n1abcA 8\n"
    )
    out = run_temperature_sweep(
        tmp_path / "TIMED.csv", tmp_path / "TIMED.txt",
        sample_n=5, temperatures=(0.1, 1.0), save_as="fasta",
    )
    assert set(out) == {0.1, 1.0}
    for paths in out.values():
        assert len(paths) == 2  # fasta + metrics csv
    # low T samples are less diverse than T=1
    def seqs(paths):
        text = open(paths[0]).read().splitlines()
        return [l for l in text if not l.startswith(">")]

    assert len(set(seqs(out[0.1]))) <= len(set(seqs(out[1.0])))


def test_sweep_plots(tmp_path):
    rng = np.random.default_rng(1)
    points = [
        SweepPoint(t, rng.normal(t, 0.2, 30)) for t in (0.1, 0.5, 1.0)
    ]
    p1 = plot_metric_vs_temperature(points, "RMSD", tmp_path)
    assert p1.exists()
    p2 = plot_models_comparison({"TIMED": points, "DenseCPD": points}, "RMSD", tmp_path)
    assert p2.exists()


def test_plot_scwrl_scores(tmp_path):
    """SCWRL score comparison across models (scripts/plot_scwrl_analysis.py
    role): boxes per model + shared WT repack, PDB-set sanity check."""
    import pytest

    from timed_design_tpu.analyse import plot_scwrl_scores

    for model, scores in (("TIMED", (-40.0, -35.0)), ("ProDCoNN", (-30.0, -25.0))):
        d = tmp_path / f"rotamer_analysis_{model}"
        d.mkdir()
        (d / "scwrl_scores.csv").write_text(
            "pdb,score_pred,score_real\n"
            f"1abcA,{scores[0]},-50.0\n"
            f"2xyzB,{scores[1]},-45.0\n"
        )
    out = plot_scwrl_scores(
        {"TIMED": tmp_path / "rotamer_analysis_TIMED",
         "ProDCoNN": tmp_path / "rotamer_analysis_ProDCoNN"},
        tmp_path,
    )
    assert out.exists() and out.stat().st_size > 0

    # PDB mismatch across models must raise (the reference's sanity assert)
    bad = tmp_path / "rotamer_analysis_bad"
    bad.mkdir()
    (bad / "scwrl_scores.csv").write_text(
        "pdb,score_pred,score_real\n9zzzZ,-1.0,-2.0\n"
    )
    with pytest.raises(ValueError, match="PDB mismatch"):
        plot_scwrl_scores(
            {"TIMED": tmp_path / "rotamer_analysis_TIMED", "bad": bad},
            tmp_path,
        )
