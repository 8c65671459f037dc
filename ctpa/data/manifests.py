"""Dataset manifests: NIfTI metadata extraction, split CSVs, VQA JSONL.

Parity targets: data_prep.py:6-51 (VolumeName/RescaleSlope/RescaleIntercept/
XYSpacing/ZSpacing metadata CSV with NaN -> (1.0, 0.0) defaults),
generate_vqa_dataset.py:13-46 (reports CSV + image dir -> JSONL), and the
XYSpacing string parsing quirks of preprocess_train.py:44-64 (values arrive as
floats, lists, or stringified lists).
"""

from __future__ import annotations

import ast
import json
import os
from typing import Iterable

import numpy as np
import pandas as pd

from ctpa.data import nifti


def parse_xy_spacing(value: object) -> float:
    """Accept float, list, or stringified list (preprocess_train.py:44-64)."""
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, (list, tuple)) and value:
        return float(value[0])
    if isinstance(value, str):
        try:
            parsed = ast.literal_eval(value)
            if isinstance(parsed, (list, tuple)) and parsed:
                return float(parsed[0])
            if isinstance(parsed, (int, float)):
                return float(parsed)
        except (ValueError, SyntaxError):
            pass
        try:
            return float(value)
        except ValueError:
            pass
    raise ValueError(f"cannot parse XYSpacing value: {value!r}")


def extract_metadata(nii_paths: Iterable[str]) -> pd.DataFrame:
    """Per-volume acquisition metadata (data_prep.py:6-40).  Missing slope/
    intercept default to (1.0, 0.0) like the reference's NaN handling."""
    rows = []
    for path in nii_paths:
        img = nifti.load(path)
        slope = img.scl_slope if img.scl_slope not in (0.0,) and np.isfinite(img.scl_slope) else 1.0
        inter = img.scl_inter if np.isfinite(img.scl_inter) else 0.0
        sp = img.spacing + (1.0, 1.0, 1.0)
        rows.append({
            "VolumeName": os.path.basename(path),
            "RescaleSlope": slope,
            "RescaleIntercept": inter,
            "XYSpacing": [sp[0], sp[1]],
            "ZSpacing": sp[2] if len(img.spacing) > 2 else 1.0,
            "NumSlices": img.shape[2] if img.data.ndim > 2 else 1,
        })
    return pd.DataFrame(rows)


def extract_metadata_dicom(series_dirs: Iterable[str]) -> pd.DataFrame:
    """Per-series acquisition metadata, same columns as `extract_metadata`
    (data_prep.py:6-40 schema) so downstream CSV consumers are ingest-
    agnostic.  VolumeName is the series directory basename."""
    from ctpa.data import dicom

    rows = []
    for d in series_dirs:
        series = dicom.load_series(d)
        dz, dy, dx = series.spacing
        rows.append({
            "VolumeName": os.path.basename(os.path.normpath(d)),
            "RescaleSlope": series.slope,
            "RescaleIntercept": series.intercept,
            "XYSpacing": [dy, dx],
            "ZSpacing": dz,
            "NumSlices": series.shape[0],
        })
    return pd.DataFrame(rows)


def write_split_metadata(df: pd.DataFrame, out_dir: str, train_frac: float = 0.8,
                         seed: int = 0) -> tuple[str, str]:
    """Shuffled train/test metadata CSVs.  (The reference intended an 80/20
    split but wrote 100% to the train CSV — data_prep.py:46; fixed here,
    SURVEY.md §7 bug list.)"""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(df))
    k = int(len(df) * train_frac)
    train = df.iloc[perm[:k]]
    test = df.iloc[perm[k:]]
    tr = os.path.join(out_dir, "train_metadata.csv")
    te = os.path.join(out_dir, "test_metadata.csv")
    train.to_csv(tr, index=False)
    test.to_csv(te, index=False)
    return tr, te


def volume_stem(name: str) -> str:
    """Normalize a volume identifier: basename without .npz/.nii/.nii.gz."""
    base = os.path.basename(str(name))
    for suffix in (".nii.gz", ".nii", ".npz", ".gz"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
    return base


def metadata_lookup(df: pd.DataFrame) -> dict[str, dict]:
    """Volume stem -> {slope, intercept, spacing(z,y,x)} resolved once at
    dataset construction (the reference re-reads the CSV per item,
    data.py:114-133 — a per-item host cost removed here).  Keys are
    extension-normalized so 'scan0.nii.gz' metadata matches 'scan0.npz'
    volumes."""
    out = {}
    for _, row in df.iterrows():
        xy = parse_xy_spacing(row["XYSpacing"])
        out[volume_stem(row["VolumeName"])] = {
            "slope": float(row["RescaleSlope"]),
            "intercept": float(row["RescaleIntercept"]),
            "spacing": (float(row["ZSpacing"]), xy, xy),
        }
    return out


def generate_vqa_manifest(
    reports_csv: str,
    image_dir: str,
    out_jsonl: str,
    id_column: str = "impression_id",
    text_column: str = "impressions",
    image_suffix: str = ".npz",
) -> int:
    """reports CSV + image dir -> JSONL {image_id, image_path, report}
    (generate_vqa_dataset.py:13-46)."""
    df = pd.read_csv(reports_csv)
    n = 0
    with open(out_jsonl, "w") as f:
        for _, row in df.iterrows():
            image_id = str(row[id_column])
            path = os.path.join(image_dir, image_id + image_suffix)
            if not os.path.exists(path):
                continue
            f.write(json.dumps({
                "image_id": image_id,
                "image_path": path,
                "report": str(row[text_column]),
            }) + "\n")
            n += 1
    return n


def read_jsonl(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
