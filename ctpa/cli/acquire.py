"""Data/weights acquisition CLI — the executable equivalent of the reference's
`kaggle_data.ipynb` (cells 0-19: kagglehub downloads, unzip, PE-positive
filter by label CSV).

Network-dependent steps are gated on the optional `kagglehub` /
`huggingface_hub` packages: in an offline environment the `filter` and `plan`
subcommands still work (they only touch local files), while `download`
explains what to fetch (see docs/data_acquisition.md).

Usage:
    python -m ctpa.cli.acquire plan
    python -m ctpa.cli.acquire download --dataset <kaggle-ref> --out data/raw
    python -m ctpa.cli.acquire filter --scans data/raw --labels labels.csv \
        --pathology "Pulmonary Embolism" --out data/pe_positive
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

ARTIFACTS = [
    ("CTPA scans (kaggle)", "kagglehub: INSPECT-style dataset", "data/raw"),
    ("CT-CLIP_v2.pt", "kagglehub: ct-clip weights", "weights/CT-CLIP_v2.pt"),
    ("CXR-BERT", "huggingface: microsoft/BiomedVLP-CXR-BERT-specialized",
     "weights/cxr-bert"),
    ("Meditron-7B", "huggingface: epfl-llm/meditron-7b", "weights/meditron-7b"),
]


def cmd_plan(_args) -> int:
    print("Artifacts the pipelines consume (docs/data_acquisition.md):")
    for name, src, dst in ARTIFACTS:
        print(f"  {name:<14} <- {src:<55} -> {dst}")
    return 0


def cmd_download(args) -> int:
    try:
        import kagglehub  # noqa: F401
    except ImportError:
        print("kagglehub is not installed in this environment; fetch on a "
              "networked machine per docs/data_acquisition.md and copy the "
              "artifacts in.", file=sys.stderr)
        return 2
    path = kagglehub.dataset_download(args.dataset)
    # Kaggle CT datasets are nested directory trees (kaggle_data.ipynb cells
    # 3-9 unzip into per-scan subdirs); copy the whole tree, not just files.
    shutil.copytree(path, args.out, dirs_exist_ok=True)
    print(f"downloaded {args.dataset} -> {args.out}")
    return 0


def cmd_filter(args) -> int:
    """PE-positive volume filter (notebook cells 12-19): copy scans whose id
    has label 1 for the requested pathology column."""
    import pandas as pd

    labels = pd.read_csv(args.labels)
    if args.pathology not in labels.columns:
        raise SystemExit(
            f"column {args.pathology!r} not in {sorted(labels.columns)}")
    id_col = args.id_column or labels.columns[0]
    keep = set(labels.loc[labels[args.pathology] == 1, id_col].astype(str))
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(args.scans)):
        stem = fname.split(".")[0]
        if stem in keep:
            shutil.copy2(os.path.join(args.scans, fname),
                         os.path.join(args.out, fname))
            n += 1
    print(f"copied {n}/{len(keep)} positive volumes -> {args.out}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="ctpa.cli.acquire", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("plan", help="list artifacts and their destinations")
    d = sub.add_parser("download", help="kagglehub dataset download")
    d.add_argument("--dataset", required=True)
    d.add_argument("--out", required=True)
    f = sub.add_parser("filter", help="copy pathology-positive scans")
    f.add_argument("--scans", required=True)
    f.add_argument("--labels", required=True)
    f.add_argument("--pathology", default="Pulmonary Embolism")
    f.add_argument("--id-column", default=None)
    f.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    return {"plan": cmd_plan, "download": cmd_download, "filter": cmd_filter}[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
