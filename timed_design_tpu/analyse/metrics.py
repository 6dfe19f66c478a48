"""Classification metrics for sequence recovery analysis.

Framework-native replacement for the reference's sklearn-based
`calculate_metrics` (design_utils/analyse_utils.py:628-728): top-1..5
accuracy, macro precision/recall, per-class report, prediction bias, and the
normalized confusion matrix — implemented in vectorized NumPy (validated
against scikit-learn in tests) so the analysis layer has no sklearn
dependency.

Note: the reference passes (y_pred, y_true) positionally into sklearn
functions whose signature is (y_true, y_pred) (analyse_utils.py:657-663,
677-690) — for the symmetric metrics this is harmless, for the report it
swaps precision/recall. This implementation uses the conventional
(y_true, y_pred) order throughout.
"""
from __future__ import annotations

import typing as t

import numpy as np

from ..constants import AA1


def accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float((np.asarray(y_true) == np.asarray(y_pred)).mean())


def top_k_accuracy(y_true: np.ndarray, scores: np.ndarray, k: int) -> float:
    """Fraction of rows whose true label is among the k highest scores.

    Tie-breaking replicates sklearn's ``top_k_accuracy_score`` exactly
    (the reference's metric, analyse_utils.py:665-676): a stable ASCENDING
    argsort reversed — so equal scores rank HIGHER-index classes first.
    This only matters for tied scores (the one-hot compat path and
    float16-quantized probability rows), but there it changes the number:
    the round-3 reference-oracle run caught the opposite (low-index-first)
    tie-break diverging from the executed reference."""
    y_true = np.asarray(y_true)
    order = np.argsort(np.asarray(scores), axis=1, kind="stable")[:, ::-1]
    topk = order[:, :k]
    return float((topk == y_true[:, None]).any(axis=1).mean())


def confusion(
    y_true: np.ndarray, y_pred: np.ndarray, n_classes: int,
    normalize: str | None = "all", sample_weight: np.ndarray | None = None,
) -> np.ndarray:
    """Confusion matrix C[i, j] = (weighted) count of true i predicted j."""
    w = np.ones(len(y_true)) if sample_weight is None else np.asarray(sample_weight)
    cm = np.zeros((n_classes, n_classes))
    np.add.at(cm, (np.asarray(y_true, int), np.asarray(y_pred, int)), w)
    if normalize == "all":
        cm = cm / max(cm.sum(), 1e-12)
    elif normalize == "true":
        cm = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1e-12)
    elif normalize == "pred":
        cm = cm / np.maximum(cm.sum(axis=0, keepdims=True), 1e-12)
    return cm


def precision_recall_f1(
    y_true: np.ndarray, y_pred: np.ndarray, n_classes: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-class (precision, recall, f1, support) with zero_division=0."""
    cm = confusion(y_true, y_pred, n_classes, normalize=None)
    tp = np.diag(cm)
    pred_tot = cm.sum(axis=0)
    true_tot = cm.sum(axis=1)
    prec = np.where(pred_tot > 0, tp / np.maximum(pred_tot, 1e-12), 0.0)
    rec = np.where(true_tot > 0, tp / np.maximum(true_tot, 1e-12), 0.0)
    f1 = np.where(prec + rec > 0, 2 * prec * rec / np.maximum(prec + rec, 1e-12), 0.0)
    return prec, rec, f1, true_tot


def classification_report(
    y_true: np.ndarray, y_pred: np.ndarray, target_names: t.Sequence[str]
) -> dict:
    """sklearn-shaped report dict: per-class P/R/F1/support + averages."""
    n = len(target_names)
    prec, rec, f1, support = precision_recall_f1(y_true, y_pred, n)
    report = {
        name: {
            "precision": float(prec[i]),
            "recall": float(rec[i]),
            "f1-score": float(f1[i]),
            "support": float(support[i]),
        }
        for i, name in enumerate(target_names)
    }
    report["accuracy"] = accuracy(y_true, y_pred)
    total = support.sum()
    report["macro avg"] = {
        "precision": float(prec.mean()),
        "recall": float(rec.mean()),
        "f1-score": float(f1.mean()),
        "support": float(total),
    }
    wts = support / max(total, 1e-12)
    report["weighted avg"] = {
        "precision": float((prec * wts).sum()),
        "recall": float((rec * wts).sum()),
        "f1-score": float((f1 * wts).sum()),
        "support": float(total),
    }
    return report


def prediction_bias(
    y_true: np.ndarray, y_pred: np.ndarray, labels: t.Sequence[str]
) -> dict[str, float]:
    """Per-class (predicted fraction - true fraction)
    (reference analyse_utils.py:691-706)."""
    n = len(labels)
    total = len(y_true)
    c_true = np.bincount(np.asarray(y_true, int), minlength=n) / max(total, 1)
    c_pred = np.bincount(np.asarray(y_pred, int), minlength=n) / max(total, 1)
    return {labels[i]: float(c_pred[i] - c_true[i]) for i in range(n)}


def roc_auc_ovo_macro(y_true: np.ndarray, scores: np.ndarray) -> float:
    """Macro one-vs-one multiclass ROC AUC (reference analyse_utils.py:786).

    For each ordered class pair (i, j) present in y_true, the AUC of score_i
    discriminating class-i rows from class-j rows; pairs averaged per
    Hand & Till (2001): A(i,j) = (A_ij + A_ji) / 2, macro over pairs.
    """
    y_true = np.asarray(y_true, int)
    classes = np.unique(y_true)
    pair_aucs = []
    for a_i, a in enumerate(classes):
        for b in classes[a_i + 1 :]:
            mask = (y_true == a) | (y_true == b)
            yt = y_true[mask]
            auc_ab = _binary_auc(yt == a, scores[mask, a])
            auc_ba = _binary_auc(yt == b, scores[mask, b])
            pair_aucs.append((auc_ab + auc_ba) / 2)
    return float(np.mean(pair_aucs)) if pair_aucs else float("nan")


def roc_auc_ovr_macro(y_true: np.ndarray, scores: np.ndarray) -> float:
    """Macro one-vs-rest ROC AUC; NaN if any class is absent (the reference
    catches the equivalent sklearn failure, analyse_utils.py:793-802)."""
    y_true = np.asarray(y_true, int)
    n_classes = scores.shape[1]
    aucs = []
    for c in range(n_classes):
        pos = y_true == c
        if pos.all() or not pos.any():
            return float("nan")
        aucs.append(_binary_auc(pos, scores[:, c]))
    return float(np.mean(aucs))


def _binary_auc(pos: np.ndarray, score: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney), tie-aware."""
    pos = np.asarray(pos, bool)
    n_pos = int(pos.sum())
    n_neg = len(pos) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(score, kind="stable")
    ranks = np.empty(len(score))
    sorted_scores = score[order]
    # average ranks for ties
    ranks_sorted = np.arange(1, len(score) + 1, dtype=float)
    i = 0
    while i < len(score):
        j = i
        while j + 1 < len(score) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks_sorted[i : j + 1] = (i + j + 2) / 2
        i = j + 1
    ranks[order] = ranks_sorted
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def sequences_to_labels(
    pdb_to_sequence: dict[str, str], pdb_to_real_sequence: dict[str, str]
) -> tuple[np.ndarray, np.ndarray]:
    """Paired (y_true, y_pred) int arrays over all shared structures
    (role of encode_sequence_to_onehot, analyse_utils.py:604-625)."""
    from ..constants import AA1_TO_INT

    yt, yp = [], []
    for pdb, pred_seq in pdb_to_sequence.items():
        if pdb not in pdb_to_real_sequence:
            print(f"Error with pdb code {pdb}")
            continue
        for r_true, r_pred in zip(pdb_to_real_sequence[pdb], pred_seq):
            if r_true in AA1_TO_INT and r_pred in AA1_TO_INT:
                yt.append(AA1_TO_INT[r_true])
                yp.append(AA1_TO_INT[r_pred])
    return np.array(yt, int), np.array(yp, int)


def calculate_metrics(
    pdb_to_sequence: dict[str, str],
    pdb_to_real_sequence: dict[str, str],
    pdb_to_probability: dict[str, np.ndarray] | None = None,
) -> dict:
    """Reference-shaped metric bundle (analyse_utils.py:628-728).

    Without ``pdb_to_probability``, accuracy_2..5 are computed from one-hot
    argmax predictions exactly as the reference does (analyse_utils.py:
    665-676 feeds sequence one-hots to top_k_accuracy_score) — there the
    "top-k" ranking beyond rank 1 is sklearn's tie-break over 19 zero
    scores (stable ascending argsort reversed: HIGHEST class index first,
    i.e. biased toward alphabetically-late residues — pinned against the
    executed reference in tests/test_reference_oracle.py). Pass the
    decoded (R, 20) probability rows to get TRUE top-k accuracy instead.
    """
    y_true, y_pred = sequences_to_labels(pdb_to_sequence, pdb_to_real_sequence)
    scores = np.eye(20)[y_pred]
    if pdb_to_probability is not None:
        from ..constants import AA1_TO_INT

        # mirror sequences_to_labels' row selection exactly (shared pdbs,
        # standard letters only) so score rows align with y_true
        rows = []
        for pdb, pred_seq in pdb_to_sequence.items():
            if pdb not in pdb_to_real_sequence:
                continue
            probs = pdb_to_probability.get(pdb)
            if probs is None:
                # mirror sequences_to_labels' graceful skip semantics with a
                # descriptive error instead of a bare KeyError: a partially
                # populated probability dict would silently mis-score
                raise ValueError(
                    f"pdb_to_probability is missing an entry for {pdb!r}, "
                    f"which is present in both sequence dicts; pass "
                    f"probability rows for every scored structure or pass "
                    f"pdb_to_probability=None for one-hot scoring"
                )
            P = np.asarray(probs)
            if P.shape[0] < len(pred_seq):
                raise ValueError(
                    f"{pdb}: {P.shape[0]} probability rows do not align "
                    f"with a {len(pred_seq)}-residue sequence"
                )
            for i, (r_true, r_pred) in enumerate(
                zip(pdb_to_real_sequence[pdb], pred_seq)
            ):
                if r_true in AA1_TO_INT and r_pred in AA1_TO_INT:
                    rows.append(P[i])
        scores = np.asarray(rows)
        if scores.shape != (len(y_true), 20):
            raise ValueError(
                f"probability rows {scores.shape} do not align with the "
                f"{len(y_true)} scored residues (20 classes required)"
            )
    labels = list(AA1)
    prec, rec = precision_recall_f1(y_true, y_pred, 20)[:2]
    return {
        "report": classification_report(y_true, y_pred, labels),
        "accuracy_1": accuracy(y_true, y_pred),
        "accuracy_2": top_k_accuracy(y_true, scores, 2),
        "accuracy_3": top_k_accuracy(y_true, scores, 3),
        "accuracy_4": top_k_accuracy(y_true, scores, 4),
        "accuracy_5": top_k_accuracy(y_true, scores, 5),
        "precision": float(prec.mean()),
        "recall": float(rec.mean()),
        "count_labels": dict(zip(*np.unique(y_true, return_counts=True))),
        "count_pred": dict(zip(*np.unique(y_pred, return_counts=True))),
        "bias": prediction_bias(y_true, y_pred, labels),
        "unweighted_cm": confusion(y_true, y_pred, 20, normalize="all"),
    }
