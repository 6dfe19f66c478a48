"""Rotamer evaluation: ground-truth tagging + 338-class metrics.

Re-implements the reference's rotamer analysis stack:
  * `tag_pdb_with_rot` (analyse_utils.py:995-1036): tag every structure's
    residues with their crystal rotamer class via chi-angle binning — here
    the vectorized dihedral path in structure/geometry.py, no process pool
    needed (whole structures tag in microseconds);
  * `calculate_rotamer_metrics` (analyse_utils.py:731-898): ROC-AUC
    (OVO/OVR), top-1..5, macro P/R, bias, weighted/unweighted confusion
    matrices, `results_{suffix}.txt` report — including the float16-residual
    renormalization of saved probability rows (analyse_utils.py:772-783).
"""
from __future__ import annotations

import typing as t
from pathlib import Path

import numpy as np

from ..constants import N_ROTAMER_CLASSES, ROTAMER_CATEGORIES
from ..structure.geometry import encode_structure_rotamers
from ..structure.pdb import Structure, load_pdb
from .metrics import (
    accuracy,
    classification_report,
    confusion,
    precision_recall_f1,
    prediction_bias,
    roc_auc_ovo_macro,
    roc_auc_ovr_macro,
    top_k_accuracy,
)


def resolve_structure_paths(
    codes: t.Iterable[str],
    pdb_dir: Path,
    fetcher: t.Callable[[str], Path] | None = None,
) -> dict[str, t.Optional[Path]]:
    """Map pdb codes to files in a local mirror; optionally fetch misses.

    Search order per code (the reference's layouts, analyse_utils.py:
    947-961): flat ``{code}.pdb/.pdb1/.pdb1.gz``, then the two-character
    sharded ``<code[1:3]>/{code}.pdb1.gz``. Codes still missing are handed
    to ``fetcher`` (e.g. :func:`timed_design_tpu.io.fetch.make_fetcher`)
    when one is given; a failed fetch maps the code to ``None``.
    """
    pdb_dir = Path(pdb_dir)
    out: dict[str, t.Optional[Path]] = {}
    # chain keys ('2xxxA', '2xxxB', ...) collapse to one 4-char code —
    # dedupe BEFORE the loop so a dead code is fetched (3 URLs × timeout)
    # once, not once per chain
    for code in dict.fromkeys(key[:4] for key in codes):
        found = None
        for cand in (
            pdb_dir / f"{code}.pdb",
            pdb_dir / f"{code}.pdb1",
            pdb_dir / f"{code}.pdb1.gz",
            pdb_dir / code[1:3] / f"{code}.pdb1.gz",
            pdb_dir / code[1:3] / f"{code}.pdb1",
            # fetch_pdb's third fallback lands as <shard>/{code}.pdb —
            # without this candidate every later run re-downloads it
            pdb_dir / code[1:3] / f"{code}.pdb",
        ):
            if cand.exists():
                found = cand
                break
        if found is None and fetcher is not None:
            try:
                found = fetcher(code)
            except Exception as e:  # noqa: BLE001 - per-code isolation
                print(f"Could not fetch {code}: {e}")
        out[code] = found
    return out


def tag_structures_with_rotamers(
    pdb_paths: dict[str, t.Optional[Path]],
    fetcher: t.Callable[[str], Path] | None = None,
) -> tuple[dict[str, list[float]], dict[str, Structure]]:
    """{pdb_code: path} -> ({pdb_code + chain: rotamer codes}, {code: Structure}).

    Reference-shaped outputs (analyse_utils.py:995-1036). A ``None`` path
    means "not found locally": when ``fetcher`` is given (an injectable
    ``code -> Path`` transport, io/fetch.py — the reference's aposteriori
    ``_fetch_pdb`` call at analyse_utils.py:964), the code is fetched;
    otherwise it is skipped with the reference's message
    (analyse_utils.py:955-957).
    """
    result: dict[str, list[float]] = {}
    assemblies: dict[str, Structure] = {}
    for pdb_code, path in pdb_paths.items():
        if path is None and fetcher is not None:
            try:
                path = fetcher(pdb_code[:4])
            except Exception as e:  # noqa: BLE001 - per-code isolation
                print(f"Could not fetch {pdb_code}: {e}")
        if path is None:
            print(f"Could not find {pdb_code}")
            continue
        s = load_pdb(Path(path))
        assemblies[pdb_code[:4]] = s
        for chain in s.chains:
            sub = s.select_chain(chain.chain_id)
            result[f"{pdb_code[:4]}{chain.chain_id}"] = encode_structure_rotamers(sub)
    return result, assemblies


def renormalize_float16_rows(y_pred: np.ndarray) -> np.ndarray:
    """Spread the float16 CSV rounding residual uniformly so each row sums to
    1 (reference analyse_utils.py:772-783)."""
    y_pred = np.asarray(y_pred, np.float64).copy()
    sums = y_pred.sum(axis=1)
    off = ~np.isclose(1.0, sums)
    if off.any():
        y_pred[off] += ((1.0 - sums[off]) / y_pred.shape[1])[:, None]
        assert np.allclose(1.0, y_pred.sum(axis=1))
    return y_pred


def calculate_rotamer_metrics(
    pdb_to_probability: dict[str, np.ndarray],
    pdb_to_rotamer: dict[str, t.Sequence[float]],
    rot_categories: t.Sequence[str] = ROTAMER_CATEGORIES,
    suffix: str = "",
    output_path: Path | None = None,
    plot_confusion: bool = False,
) -> dict:
    """Rotamer metric bundle + optional results file / CM plots.

    Residues whose ground-truth rotamer is NaN (untaggable) are dropped;
    length-mismatched structures are skipped with a message (reference
    analyse_utils.py:756-771).
    """
    y_pred_parts, y_true_parts = [], []
    for pdb, prob in pdb_to_probability.items():
        if pdb not in pdb_to_rotamer:
            print(f"Error with pdb code {pdb}")
            continue
        rot = np.asarray(pdb_to_rotamer[pdb], float)
        if len(prob) != len(rot):
            print(f"Error with pdb code {pdb} - Length Mismatch")
            continue
        y_pred_parts.append(np.asarray(prob))
        y_true_parts.append(rot)
    if not y_pred_parts:
        raise ValueError(
            "No structure overlaps between predictions and rotamer tags — "
            "every structure was missing or length-mismatched."
        )
    y_pred = np.concatenate(y_pred_parts).reshape(-1, N_ROTAMER_CLASSES)
    y_true = np.concatenate(y_true_parts).ravel()
    keep = ~np.isnan(y_true)
    y_pred, y_true = y_pred[keep], y_true[keep].astype(int)
    y_pred = renormalize_float16_rows(y_pred)
    y_argmax = y_pred.argmax(axis=1)

    n = len(rot_categories)
    labels = list(rot_categories)
    prec, rec = precision_recall_f1(y_true, y_argmax, n)[:2]
    metrics = {
        "auc_ovo": roc_auc_ovo_macro(y_true, y_pred),
        "auc_ovr": roc_auc_ovr_macro(y_true, y_pred),
        "report": classification_report(y_true, y_argmax, labels),
        "accuracy": accuracy(y_true, y_argmax),
        "accuracy_2": top_k_accuracy(y_true, y_pred, 2),
        "accuracy_3": top_k_accuracy(y_true, y_pred, 3),
        "accuracy_4": top_k_accuracy(y_true, y_pred, 4),
        "accuracy_5": top_k_accuracy(y_true, y_pred, 5),
        "precision": float(prec.mean()),
        "recall": float(rec.mean()),
        "bias": prediction_bias(y_true, y_argmax, labels),
    }
    unweighted_cm = confusion(y_true, y_argmax, n, normalize="all")
    # NOTE: "weighted" here means weighted BY class frequency (count/total),
    # i.e. common classes get amplified quadratically — not sklearn's
    # inverse-frequency 'balanced' convention. That is the reference's own
    # definition (analyse_utils.py:874-891) and it defines the published CM
    # panels, so it is kept verbatim.
    weights = np.bincount(y_true, minlength=n).astype(float)
    weights /= max(weights.sum(), 1e-12)
    weighted_cm = confusion(
        y_true, y_argmax, n, normalize="all", sample_weight=weights[y_true]
    )
    metrics["unweighted_cm"] = unweighted_cm
    metrics["weighted_cm"] = weighted_cm

    if output_path is not None:
        output_path = Path(output_path)
        with open(output_path / f"results_{suffix}.txt", "w") as f:
            f.write(f"Metrics AUC_OVR: {metrics['auc_ovr']}\n")
            f.write(f"Metrics AUC_OVO: {metrics['auc_ovo']}\n")
            f.write(f"Metrics Macro-Precision: {metrics['precision']}\n")
            f.write(f"Metrics Macro-Recall: {metrics['recall']}\n")
            f.write(
                f"Accuracy: {metrics['accuracy']}\n"
                + "".join(
                    f"accuracy_{k}: {metrics[f'accuracy_{k}']}\n" for k in (2, 3, 4, 5)
                )
            )
            f.write(f"Report:\n{metrics['report']}\n")
            f.write(f"Bias:\n{metrics['bias']}\n")
        if plot_confusion:
            from .plots import create_rot_cm

            create_rot_cm(unweighted_cm, labels, f"{suffix}_unweighted", output_path)
            create_rot_cm(weighted_cm, labels, f"{suffix}_weighted", output_path)
    return metrics
