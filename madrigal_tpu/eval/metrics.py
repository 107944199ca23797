"""Classification metrics suite.

Host-side numpy/sklearn port of the reference metrics engine
(reference: madrigal/evaluate/metrics.py:23-191): fmax, MCC, AUROC, AUPRC,
NPV, specificity, F1, recall/precision/ap@k, accuracy (+ Cohen's kappa for
multiclass), with macro / weighted / micro / per-label averaging over the
label-grouped samples.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import numpy as np
from sklearn.metrics import (
    average_precision_score,
    cohen_kappa_score,
    confusion_matrix,
    matthews_corrcoef,
    precision_recall_curve,
    roc_auc_score,
)

KEY_METRIC = "auprc"
AVERAGE = "macro"
K = 50


def fmax_score(ys, preds, beta: float = 1.0):
    precision, recall, thresholds = precision_recall_curve(ys, preds)
    num = (1 + beta ** 2) * precision * recall
    den = beta ** 2 * precision + recall
    with np.errstate(divide="ignore", invalid="ignore"):
        fbeta = np.divide(num, den, out=np.zeros_like(num), where=den != 0)
    return np.nanmax(fbeta), thresholds[np.argmax(fbeta)]


def precision_recall_at_k(y, preds, k: int):
    order = np.argsort(preds.flatten())[::-1]
    topk_y = y[order][:k]
    topk_p = preds[order][:k]
    recall_k = topk_y.sum() / max(y.sum(), 1)
    precision_k = topk_y.sum() / k
    ap_k = (
        average_precision_score(topk_y, topk_p)
        if topk_y.sum() > 0 else 0.0
    )
    if k > preds.shape[-1]:
        return np.nan, np.nan, np.nan
    return recall_k, precision_k, ap_k


def get_metrics_binary(
    preds, ys, k: Union[int, float], context: Optional[str] = None
) -> Dict[str, float]:
    if isinstance(k, float) and k < 1:
        k = int(k * ys.shape[0])
    rounded = np.round(preds)
    cm = confusion_matrix(ys, rounded, labels=[0, 1])
    tn, fp, fn, tp = cm.ravel()
    with np.errstate(divide="ignore", invalid="ignore"):
        specificity = np.divide(tn, tn + fp) if (tn + fp) else np.nan
        recall = np.divide(tp, tp + fn) if (tp + fn) else np.nan
        npv = np.divide(tn, tn + fn) if (tn + fn) else np.nan
        precision = np.divide(tp, tp + fp) if (tp + fp) else np.nan
        f1 = (
            2 * precision * recall / (precision + recall)
            if (precision + recall) else np.nan
        )
    accuracy = (tp + tn) / max(tn + fn + tp + fp, 1)

    fmax, _ = fmax_score(ys, preds)
    recall_k, precision_k, ap_k = precision_recall_at_k(ys, preds, k)
    two_class = len(np.unique(ys)) == 2
    auroc = roc_auc_score(ys, preds) if two_class else np.nan
    auprc = average_precision_score(ys, preds) if ys.sum() else np.nan
    mcc = matthews_corrcoef(ys, rounded)

    out = {
        "fmax": fmax,
        "mcc": mcc,
        "auroc": auroc,
        "auprc": auprc,
        "npv": npv,
        "specificity": specificity,
        "f1": f1,
        f"recall@{k}": recall_k,
        f"precision@{k}": precision_k,
        f"ap@{k}": ap_k,
        "accuracy": accuracy,
        "precision": precision,
        "recall": recall,
    }
    if context == "multiclass":
        out["cohen_kappa"] = cohen_kappa_score(ys, rounded)
    return out


def get_metrics(
    preds: np.ndarray,
    ys: np.ndarray,
    labels: np.ndarray,
    k: Union[int, float] = K,
    task: str = "multilabel",
    average: Optional[str] = AVERAGE,
    logger: Any = None,
    verbose: bool = False,
) -> Tuple[Dict[str, Union[float, np.ndarray]], np.ndarray]:
    """Metrics per label group, averaged (reference metrics.py:129-191)."""
    preds, ys, labels = map(np.asarray, (preds, ys, labels))
    if task == "binary":
        return get_metrics_binary(preds, ys, k), np.asarray(ys.sum())

    idx_sort = np.argsort(labels, kind="stable")
    sorted_labels = labels[idx_sort]
    vals, idx_start, counts = np.unique(
        sorted_labels, return_index=True, return_counts=True
    )
    groups = np.split(idx_sort, idx_start[1:])
    pos_samples = np.array([ys[g].sum() for g in groups])

    if average == "micro":
        metrics = get_metrics_binary(preds, ys, k)
    else:
        rows = [get_metrics_binary(preds[g], ys[g], k) for g in groups]
        names = list(rows[0].keys())
        arr = np.array([[r[n] for n in names] for r in rows])
        if average == "macro":
            import warnings

            with np.errstate(invalid="ignore"), warnings.catch_warnings():
                # all-NaN metric columns (e.g. @k with k > group size)
                # legitimately average to NaN
                warnings.simplefilter("ignore", RuntimeWarning)
                vals_avg = np.nanmean(arr, axis=0)
            metrics = dict(zip(names, vals_avg))
        elif average == "weighted":
            w = pos_samples / max(pos_samples.sum(), 1)
            metrics = dict(zip(names, np.nansum(arr * w[:, None], axis=0)))
        elif average is None:
            metrics = dict(zip(names, arr.T))
        else:
            raise ValueError(average)

    if verbose and average is not None:
        msg = ", ".join(f"{k_} = {v:.4f}" for k_, v in metrics.items())
        (logger.info if logger else print)(msg)
    return metrics, pos_samples
