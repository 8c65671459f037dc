"""Offline preprocessing CLI — NIfTI / DICOM -> canonical npz volumes +
metadata CSVs.

Replaces data_prep/preprocess_train.py + preprocess_test.py + data_prep.py:
walk a directory of .nii/.nii.gz scans (or DICOM series sub-directories,
a capability the reference lacks — BASELINE config 5), extract acquisition
metadata, run the canonical device-side preprocess (HU window -> resample ->
crop/pad), and write npz volumes in the reference's sharded folder layout
`{split}_{id[:2]}/{split}_{id}/{id}.npz` (preprocess_train.py:111-117).
Both ingest paths produce byte-identical canonical npz for the same
underlying volume (tested in tests/test_data.py).

TPU-native: the resample runs on-device via the fused op (batched by shape
bucket); the host only decodes bytes and writes npz.  No interactive y/n
destructive prompt and no source deletion (the reference's os.remove at
preprocess_train.py:128 is dropped deliberately).
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

import numpy as np

import jax.numpy as jnp

from ctpa.core.config import PreprocessConfig
from ctpa.data import dicom, nifti
from ctpa.data.manifests import (
    extract_metadata, extract_metadata_dicom, volume_stem, write_split_metadata,
)
from ctpa.ops.preprocess import preprocess_volume


def find_nii_files(root: str) -> list[str]:
    out = []
    for r, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith((".nii", ".nii.gz")):
                out.append(os.path.join(r, f))
    return out


def find_dicom_series(root: str) -> list[str]:
    """Directories under `root` (inclusive) that directly contain DICOM files;
    each is treated as one series/volume named by its basename."""
    out = []
    for r, _, _files in os.walk(root):
        if dicom.find_series_files(r):
            out.append(r)
    return sorted(out)


def sharded_output_path(out_dir: str, split: str, vid: str) -> str:
    sub = f"{split}_{vid[:2]}"
    subsub = f"{split}_{vid}"
    return os.path.join(out_dir, sub, subsub, f"{vid}.npz")


def process_one(path: str, out_dir: str, split: str, cfg: PreprocessConfig,
                window_first: bool = True,
                reference_orientation: bool = False) -> str:
    img = nifti.load(path)
    # ONE canonical orientation operator shared with the serving ingest
    # (data/ingest.load_scan): axis-true (z, y, x).  reference_orientation
    # reproduces the reference's (2, 0, 1) transpose (preprocess_train.py:104)
    # for bit-parity runs against reference-preprocessed npz.
    raw, sp = nifti.to_canonical(
        img, reference_orientation=reference_orientation)
    raw = raw.astype(np.float32)
    spacing = jnp.asarray(sp, jnp.float32)
    slope = img.scl_slope if img.scl_slope not in (0.0,) else 1.0
    out = preprocess_volume(
        jnp.asarray(raw), jnp.float32(slope), jnp.float32(img.scl_inter),
        spacing, cfg=cfg, window_first=window_first,
    )
    vid = volume_stem(path)
    dst = sharded_output_path(out_dir, split, vid)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez(dst, np.asarray(out[0], np.float32))
    return dst


def process_one_dicom(series_dir: str, out_dir: str, split: str,
                      cfg: PreprocessConfig, window_first: bool = True) -> str:
    """DICOM-series analog of `process_one`: load_series already yields
    (z, y, x) with (z, y, x) spacing, so the same canonical preprocess runs
    with no transpose; output is byte-identical to the NIfTI path for the
    same underlying volume."""
    series = dicom.load_series(series_dir)
    out = preprocess_volume(
        jnp.asarray(series.data.astype(np.float32)),
        jnp.float32(series.slope), jnp.float32(series.intercept),
        jnp.asarray(series.spacing, jnp.float32),
        cfg=cfg, window_first=window_first,
    )
    vid = os.path.basename(os.path.normpath(series_dir))
    dst = sharded_output_path(out_dir, split, vid)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez(dst, np.asarray(out[0], np.float32))
    return dst


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--split", default="train", choices=["train", "valid", "test"])
    p.add_argument("--train-frac", type=float, default=0.8)
    p.add_argument("--target-shape", type=int, nargs=3, default=[240, 480, 480])
    p.add_argument("--window", default="train", choices=["train", "inference"])
    p.add_argument("--reference-orientation", action="store_true",
                   help="use the reference's NIfTI transpose (2, 0, 1) — "
                        "(z, x, y), preprocess_train.py:104 — instead of the "
                        "canonical axis-true (z, y, x), for bit-parity runs "
                        "against reference-preprocessed data")
    args = p.parse_args(argv)

    cfg = (PreprocessConfig.train() if args.window == "train"
           else PreprocessConfig.inference())
    import dataclasses
    cfg = dataclasses.replace(cfg, target_shape=tuple(args.target_shape))

    files = find_nii_files(args.input_dir)
    series_dirs = find_dicom_series(args.input_dir)
    print(f"found {len(files)} NIfTI volumes, {len(series_dirs)} DICOM series",
          file=sys.stderr)
    metas = []
    if files:
        metas.append(extract_metadata(files))
    if series_dirs:
        metas.append(extract_metadata_dicom(series_dirs))
    if not metas:
        print("nothing to do", file=sys.stderr)
        return
    import pandas as pd
    write_split_metadata(pd.concat(metas, ignore_index=True), args.output_dir,
                         train_frac=args.train_frac)

    by_shape = defaultdict(list)   # shape-bucket so jit reuses executables
    for f in files:
        by_shape[nifti.load(f).shape].append(f)
    n, total = 0, len(files) + len(series_dirs)
    for shape, bucket in by_shape.items():
        for f in bucket:
            dst = process_one(f, args.output_dir, args.split, cfg,
                              reference_orientation=args.reference_orientation)
            n += 1
            if n % 25 == 0:
                print(f"{n}/{total} -> {dst}", file=sys.stderr)
    for d in series_dirs:
        dst = process_one_dicom(d, args.output_dir, args.split, cfg)
        n += 1
        if n % 25 == 0:
            print(f"{n}/{total} -> {dst}", file=sys.stderr)
    print(f"wrote {n} volumes to {args.output_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
