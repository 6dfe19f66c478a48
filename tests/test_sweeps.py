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
