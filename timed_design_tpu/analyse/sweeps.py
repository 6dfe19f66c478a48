"""Benchmark orchestration: model sweeps + temperature sweeps + plots.

Replaces the reference's scripts/ layer (SURVEY.md §3.5):
  * run_benchmark_models.sh — loop every zoo model over a benchmark dataset;
  * run_sampling.sh — MC sampling at T in {0.1, 0.5, 1, 2, 5} x N samples;
  * plot_temperature.py / plot_af2_temperature.py /
    plot_all_models_af2_temp.py / plot_scwrl_analysis.py — sweep plots.

Everything is a plain function over the framework's own engine/sampler, no
shell scripts; SLURM emission for AF2 refolding lives in analyse/af2.py.
"""
from __future__ import annotations

import dataclasses
import typing as t
from pathlib import Path

import numpy as np

DEFAULT_TEMPERATURES = (0.1, 0.5, 1.0, 2.0, 5.0)  # run_sampling.sh:1-10


def run_model_benchmark(
    models: t.Sequence[str],
    dataset_path: Path,
    output_root: Path,
    batch_size: int = 512,
    predict_rotamers: bool = False,
    allow_random_weights: bool = False,
) -> dict[str, dict]:
    """Run every model over one dataset; per-model output dirs + metrics.

    Role of scripts/run_benchmark_models.sh (batch 500 over the zoo).
    Returns {model_name: sequence-recovery metrics dict}.
    """
    from ..engine import load_dataset_and_predict
    from .metrics import calculate_metrics

    results = {}
    for model in models:
        # weights paths become their stem: joining an ABSOLUTE .h5 path
        # onto output_root would discard output_root entirely (pathlib
        # semantics) and try to mkdir over the weights file itself
        tag = Path(str(model)).stem if str(model).endswith(
            (".h5", ".hdf5")) else str(model)
        out = Path(output_root) / tag
        out.mkdir(parents=True, exist_ok=True)
        res = load_dataset_and_predict(
            [model], Path(dataset_path), batch_size=batch_size,
            path_to_output=out, predict_rotamers=predict_rotamers,
            dataset_map_path=out / "datasetmap.txt",
            allow_random_weights=allow_random_weights,
        )
        # pass probabilities for TRUE top-k (20-class heads only; rotamer
        # probabilities are 338-wide and keep the reference's one-hot form)
        probs = None if predict_rotamers else res.pdb_to_probability
        m = calculate_metrics(
            res.pdb_to_sequence, res.pdb_to_real_sequence, probs
        )
        results[str(model)] = {
            "accuracy_1": m["accuracy_1"],
            "accuracy_3": m["accuracy_3"],
            "precision": m["precision"],
            "recall": m["recall"],
            "timings": res.timings,
        }
    return results


def run_temperature_sweep(
    pred_matrix_path: Path,
    datasetmap_path: Path,
    sample_n: int = 200,
    temperatures: t.Sequence[float] = DEFAULT_TEMPERATURES,
    seed: int = 42,
    predict_rotamers: bool = False,
    save_as: str = "all",
) -> dict[float, list[str]]:
    """MC sampling at each temperature (run_sampling.sh scale: 200 x 5 temps).

    Returns {temperature: [output paths]}. Each temperature is one batched
    device program per structure — the reference needed 35 worker processes
    for the same sweep.
    """
    from ..sample import SampleConfig, main_sample

    out: dict[float, list[str]] = {}
    for temp in temperatures:
        out[temp] = main_sample(
            SampleConfig(
                path_to_pred_matrix=Path(pred_matrix_path),
                path_to_datasetmap=Path(datasetmap_path),
                predict_rotamers=predict_rotamers,
                sample_n=sample_n,
                temperature=temp,
                seed=seed,
                save_as=save_as,
            )
        )
    return out


@dataclasses.dataclass
class SweepPoint:
    temperature: float
    values: np.ndarray  # per-design metric values at this temperature


def plot_metric_vs_temperature(
    points: t.Sequence[SweepPoint],
    metric_name: str,
    output_path: Path,
    title: str = "",
):
    """Box/strip plot of a per-design metric across temperatures — the shape
    of plot_temperature.py / plot_af2_temperature.py outputs."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    points = sorted(points, key=lambda p: p.temperature)
    fig, ax = plt.subplots(figsize=(8, 5))
    data = [np.asarray(p.values)[~np.isnan(np.asarray(p.values, float))] for p in points]
    ax.boxplot(data, tick_labels=[str(p.temperature) for p in points])
    for i, vals in enumerate(data):
        x = np.full(len(vals), i + 1) + np.random.default_rng(0).uniform(
            -0.08, 0.08, len(vals)
        )
        ax.plot(x, vals, ".", alpha=0.3, markersize=3)
    ax.set_xlabel("Sampling temperature")
    ax.set_ylabel(metric_name)
    ax.set_title(title or f"{metric_name} vs temperature")
    fig.tight_layout()
    out = Path(output_path) / f"{metric_name.replace(' ', '_')}_vs_temperature.png"
    fig.savefig(out)
    plt.close(fig)
    return out


def plot_models_comparison(
    model_to_points: dict[str, t.Sequence[SweepPoint]],
    metric_name: str,
    output_path: Path,
):
    """Mean-metric-vs-temperature per model, one line per model
    (plot_all_models_af2_temp.py shape)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for model, points in model_to_points.items():
        points = sorted(points, key=lambda p: p.temperature)
        xs = [p.temperature for p in points]
        ys = [float(np.nanmean(np.asarray(p.values, float))) for p in points]
        ax.plot(xs, ys, marker="o", label=model)
    ax.set_xlabel("Sampling temperature")
    ax.set_ylabel(metric_name)
    ax.set_xscale("log")
    ax.legend()
    fig.tight_layout()
    out = Path(output_path) / f"models_{metric_name.replace(' ', '_')}_vs_temp.png"
    fig.savefig(out)
    plt.close(fig)
    return out


def plot_scwrl_scores(
    analysis_dirs: t.Mapping[str, Path],
    output_path: Path,
    filename: str = "scwrl_scores_comparison.png",
) -> Path:
    """Compare SCWRL energy-score distributions across models.

    Role of scripts/plot_scwrl_analysis.py: reads each analysis dir's
    ``scwrl_scores.csv`` (written by cli/analyse_rotamers.py), draws one
    box per model plus the shared wild-type repack scores, and asserts the
    PDB sets line up across models (the reference's sanity check).
    """
    import csv

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels, series = [], []
    real_scores: list[float] = []
    ref_pdbs: list[str] | None = None
    for model, d in analysis_dirs.items():
        rows = list(csv.DictReader(open(Path(d) / "scwrl_scores.csv")))
        pdbs = [r["pdb"] for r in rows]
        if ref_pdbs is None:
            ref_pdbs = pdbs
            real_scores = [
                float(r["score_real"]) for r in rows
                if r["score_real"] not in ("", "nan")
            ]
        elif pdbs != ref_pdbs:
            raise ValueError(f"PDB mismatch for model {model}: "
                             f"{pdbs} vs {ref_pdbs}")
        labels.append(model)
        series.append([
            float(r["score_pred"]) for r in rows
            if r["score_pred"] not in ("", "nan")
        ])
    fig, ax = plt.subplots(figsize=(2 + 1.2 * (len(labels) + 1), 5))
    ax.boxplot([real_scores] + series, tick_labels=["scwrl_real"] + labels)
    ax.set_ylabel("SCWRL total minimal energy")
    ax.set_title("Side-chain packing energy: repacked WT vs designs")
    plt.setp(ax.get_xticklabels(), rotation=30, ha="right")
    fig.tight_layout()
    out = Path(output_path) / filename
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out
