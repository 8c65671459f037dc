"""Standalone evaluation CLI.

Replaces ctpa_report/evaluate_reports.py + the metric halves of
vqa_inference.py and evaluation_module.py: given a results JSON/CSV of
(reference, prediction) pairs — or a zero-shot predictions npz + labels —
compute the full metric suites and write artifact files."""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np
import pandas as pd

from ctpa.eval.classification import (
    accuracy_f1_at_youden, bootstrap_cis, evaluate_classification,
)
from ctpa.eval.nlg import NLGEvaluator
from ctpa.eval.zeroshot import PATHOLOGIES


def eval_nlg(args) -> int:
    if args.results.endswith(".json"):
        with open(args.results) as f:
            payload = json.load(f)
        records = payload.get("samples", payload)
    else:
        records = pd.read_csv(args.results).to_dict("records")
    refs = [str(r[args.reference_col]) for r in records]
    hyps = [str(r[args.prediction_col]) for r in records]
    metrics = NLGEvaluator().evaluate(refs, hyps)
    print(json.dumps({k: round(v, 6) for k, v in metrics.items()}, indent=2))
    return 0


def eval_classification(args) -> int:
    preds = np.load(args.predictions)["data"]
    labels = np.load(args.labels)["data"]
    names = list(PATHOLOGIES)[: preds.shape[1]]
    aurocs = evaluate_classification(preds, labels, names, plot_dir=args.plot_dir)
    cis = bootstrap_cis(preds, labels, names, n_samples=args.bootstrap)
    ops = accuracy_f1_at_youden(preds, labels, names)
    print(aurocs.to_json(), file=sys.stdout)
    if args.out_csv:
        aurocs.to_csv(args.out_csv, index=False)
        cis.to_csv(args.out_csv.replace(".csv", "_cis.csv"), index=False)
        ops.to_csv(args.out_csv.replace(".csv", "_operating.csv"), index=False)
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="task", required=True)

    n = sub.add_parser("nlg", help="BLEU/ROUGE/BERTScore over reference/prediction pairs")
    n.add_argument("--results", required=True, help="results JSON or CSV")
    n.add_argument("--reference-col", default="reference")
    n.add_argument("--prediction-col", default="prediction")

    c = sub.add_parser("classification", help="AUROC/ROC/bootstrap over zero-shot outputs")
    c.add_argument("--predictions", required=True, help="predicted_weights.npz")
    c.add_argument("--labels", required=True, help="labels_weights.npz")
    c.add_argument("--plot-dir", default=None)
    c.add_argument("--bootstrap", type=int, default=1000)
    c.add_argument("--out-csv", default=None)

    args = p.parse_args(argv)
    return eval_nlg(args) if args.task == "nlg" else eval_classification(args)


if __name__ == "__main__":
    sys.exit(main())
