"""Classification evaluation: per-label ROC/AUROC, PR curves, Youden operating
point, bootstrap confidence intervals.

Parity with reference evaluate.py: `evaluate_internal` (160-207) computes
per-pathology AUROC over predicted probabilities vs one-hot labels;
`choose_operating_point` (104-113) picks the Youden-J threshold;
`bootstrap`/`compute_cis` (272-337) resample AUROCs for 95% CIs.  Host-side
numpy/sklearn — metrics are not a TPU workload; plots are optional
(matplotlib gated) to keep headless runs clean.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from sklearn import metrics as skm


def roc_auc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    if len(np.unique(y_true)) < 2:
        return float("nan")
    return float(skm.roc_auc_score(y_true, y_score))


def choose_operating_point(fpr: np.ndarray, tpr: np.ndarray, thresholds: np.ndarray):
    """Youden J = max(tpr - fpr) (evaluate.py:104-113 semantics)."""
    j = tpr - fpr
    ix = int(np.argmax(j))
    return float(thresholds[ix]), float(fpr[ix]), float(tpr[ix])


def evaluate_classification(
    predictions: np.ndarray,            # (n, L) probabilities / scores
    labels: np.ndarray,                 # (n, L) one-hot ground truth
    label_names: Sequence[str],
    plot_dir: Optional[str] = None,
) -> pd.DataFrame:
    """Per-label AUROC dataframe; optional ROC/PR plot artifacts
    (evaluate_internal parity, evaluate.py:160-207)."""
    rows = {}
    for i, name in enumerate(label_names):
        y, s = labels[:, i], predictions[:, i]
        auc = roc_auc(y, s)
        rows[f"{name}_auc"] = [auc]
        if plot_dir is not None and np.isfinite(auc):
            _plot_roc_pr(y, s, name, plot_dir)
    df = pd.DataFrame(rows)
    mean_auc = np.nanmean([v[0] for v in rows.values()]) if rows else float("nan")
    df["mean_auc"] = mean_auc
    return df


def _plot_roc_pr(y, s, name, plot_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(plot_dir, exist_ok=True)
    fpr, tpr, thr = skm.roc_curve(y, s)
    op_thr, op_fpr, op_tpr = choose_operating_point(fpr, tpr, thr)
    fig, ax = plt.subplots(1, 2, figsize=(10, 4))
    ax[0].plot(fpr, tpr)
    ax[0].plot([0, 1], [0, 1], "k--")
    ax[0].scatter([op_fpr], [op_tpr], c="r", label=f"Youden thr={op_thr:.3f}")
    ax[0].set_title(f"ROC {name} (AUC {skm.auc(fpr, tpr):.3f})")
    ax[0].legend()
    prec, rec, _ = skm.precision_recall_curve(y, s)
    ax[1].plot(rec, prec)
    ax[1].set_title(f"PR {name}")
    fig.tight_layout()
    fig.savefig(os.path.join(plot_dir, f"{name.replace(' ', '_')}_roc_pr.png"))
    plt.close(fig)


def bootstrap_cis(
    predictions: np.ndarray,
    labels: np.ndarray,
    label_names: Sequence[str],
    n_samples: int = 1000,
    confidence: float = 0.95,
    seed: int = 0,
) -> pd.DataFrame:
    """Bootstrap AUROC confidence intervals (evaluate.py:272-337 semantics):
    resample rows with replacement, recompute per-label AUROC, report the
    (lower, mid, upper) quantiles."""
    rng = np.random.default_rng(seed)
    n = predictions.shape[0]
    boots = []
    for _ in range(n_samples):
        idx = rng.integers(0, n, size=n)
        boots.append([roc_auc(labels[idx, i], predictions[idx, i])
                      for i in range(len(label_names))])
    arr = np.asarray(boots)  # (n_samples, L)
    lo = (1 - confidence) / 2
    rows = []
    for i, name in enumerate(label_names):
        col = arr[:, i]
        col = col[np.isfinite(col)]
        if len(col) == 0:
            rows.append((name, np.nan, np.nan, np.nan))
            continue
        rows.append((name, np.quantile(col, lo), np.quantile(col, 0.5),
                     np.quantile(col, 1 - lo)))
    return pd.DataFrame(rows, columns=["label", "lower", "mid", "upper"])


def accuracy_f1_at_youden(predictions: np.ndarray, labels: np.ndarray,
                          label_names: Sequence[str]) -> pd.DataFrame:
    """Threshold each label at its Youden point, report accuracy/F1/precision/
    recall (capability superset of the reference's plotted operating point)."""
    rows = []
    for i, name in enumerate(label_names):
        y, s = labels[:, i], predictions[:, i]
        if len(np.unique(y)) < 2:
            rows.append((name, *([np.nan] * 4)))
            continue
        fpr, tpr, thr = skm.roc_curve(y, s)
        t, _, _ = choose_operating_point(fpr, tpr, thr)
        pred = (s >= t).astype(int)
        rows.append((
            name,
            skm.accuracy_score(y, pred),
            skm.f1_score(y, pred, zero_division=0),
            skm.precision_score(y, pred, zero_division=0),
            skm.recall_score(y, pred, zero_division=0),
        ))
    return pd.DataFrame(rows, columns=["label", "accuracy", "f1", "precision", "recall"])
