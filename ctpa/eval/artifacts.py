"""Evaluation artifact writers — npz/xlsx/txt/json/csv output parity.

Reference surfaces: ctclip_inference.py:324-336 (labels/predictions npz,
accessions txt, AUROC xlsx), vqa_inference.py:244-268 (JSON + CSV results),
evaluation_module.py:227-314 (per-sample tri-plane CT visualizations +
prompt/reference/prediction text files)."""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
import pandas as pd


def write_zeroshot_artifacts(
    out_dir: str,
    predictions: np.ndarray,
    labels: np.ndarray,
    accessions: Sequence[str],
    aurocs: pd.DataFrame,
    prefix: str = "",
) -> dict[str, str]:
    """npz + accessions.txt + aurocs.xlsx (ctclip_inference.py:324-336)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    p = os.path.join(out_dir, f"{prefix}labels_weights.npz")
    np.savez(p, data=labels)
    paths["labels"] = p
    p = os.path.join(out_dir, f"{prefix}predicted_weights.npz")
    np.savez(p, data=predictions)
    paths["predictions"] = p
    p = os.path.join(out_dir, f"{prefix}accessions.txt")
    with open(p, "w") as f:
        f.write("\n".join(accessions))
    paths["accessions"] = p
    p = os.path.join(out_dir, f"{prefix}aurocs.xlsx")
    try:
        with pd.ExcelWriter(p) as writer:
            aurocs.to_excel(writer, index=False)
        paths["aurocs"] = p
    except (ImportError, ModuleNotFoundError):
        p = p.replace(".xlsx", ".csv")      # xlsxwriter absent -> CSV fallback
        aurocs.to_csv(p, index=False)
        paths["aurocs"] = p
    return paths


def write_nlg_results(
    out_dir: str,
    records: list[dict],
    metrics: dict,
    name: str = "evaluation",
) -> dict[str, str]:
    """JSON (metrics + per-sample records) and CSV (records) writers
    (vqa_inference.py:244-268, evaluation_module.py:355-361)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    p = os.path.join(out_dir, f"{name}_results.json")
    with open(p, "w") as f:
        json.dump({"metrics": metrics, "samples": records}, f, indent=2)
    paths["json"] = p
    p = os.path.join(out_dir, f"{name}_results.csv")
    pd.DataFrame(records).to_csv(p, index=False)
    paths["csv"] = p
    return paths


def visualize_sample(
    out_dir: str,
    volume: np.ndarray,          # (1, D, H, W) or (D, H, W)
    prompt: str,
    reference: str,
    prediction: str,
    sample_id: str,
):
    """Tri-plane (axial/coronal/sagittal) middle-slice PNG + text files
    (evaluation_module.py:227-314)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    vol = volume[0] if volume.ndim == 4 else volume
    d, h, w = vol.shape
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].imshow(vol[d // 2], cmap="gray")
    axes[0].set_title("axial")
    axes[1].imshow(vol[:, h // 2], cmap="gray", aspect="auto")
    axes[1].set_title("coronal")
    axes[2].imshow(vol[:, :, w // 2], cmap="gray", aspect="auto")
    axes[2].set_title("sagittal")
    for ax in axes:
        ax.axis("off")
    fig.suptitle(sample_id)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"{sample_id}_triplane.png"))
    plt.close(fig)
    with open(os.path.join(out_dir, f"{sample_id}_text.txt"), "w") as f:
        f.write(f"PROMPT:\n{prompt}\n\nREFERENCE:\n{reference}\n\nPREDICTION:\n{prediction}\n")
