"""NLG metrics: BLEU, ROUGE-1/2/L, BERTScore.

Parity with the reference's two evaluator variants (evaluation_module.py:17-224
using nltk+rouge pkg+bert_score; evaluate_reports.py:18-191 using rouge_score)
and the custom metrics of vqa_inference.py:177-242 (perfect-match %, ROUGE-1/L
precision/recall, BLEU-1/4).

The `bert_score` package is not in this environment, so BERTScore is
implemented natively: token embeddings from any encoder callable (our flax
BERT with imported CXR-BERT weights in production; any embedding fn in tests),
greedy cosine matching per the BERTScore paper.  No IDF weighting / baseline
rescaling (the reference enabled rescale_with_baseline; scores here are the
raw variant — documented difference).
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------- BLEU


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu(
    reference: Sequence[str],
    hypothesis: Sequence[str],
    max_n: int = 4,
    smooth: bool = True,
) -> float:
    """Sentence BLEU with uniform weights and +1 smoothing (equivalent to
    nltk sentence_bleu with SmoothingFunction().method1 used at
    evaluation_module.py:139-151)."""
    if len(hypothesis) == 0:
        return 0.0
    precisions = []
    for n in range(1, max_n + 1):
        hyp = _ngrams(hypothesis, n)
        ref = _ngrams(reference, n)
        overlap = sum((hyp & ref).values())
        total = max(sum(hyp.values()), 1)
        if overlap == 0 and smooth:
            precisions.append(1.0 / (2 * total))
        else:
            precisions.append(overlap / total)
    if min(precisions) == 0:
        return 0.0
    log_p = np.mean([np.log(p) for p in precisions])
    bp = 1.0 if len(hypothesis) > len(reference) else np.exp(
        1 - len(reference) / max(len(hypothesis), 1))
    return float(bp * np.exp(log_p))


# ---------------------------------------------------------------- ROUGE


def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_n(reference: Sequence[str], hypothesis: Sequence[str], n: int) -> dict:
    ref, hyp = _ngrams(reference, n), _ngrams(hypothesis, n)
    overlap = sum((ref & hyp).values())
    p = overlap / max(sum(hyp.values()), 1)
    r = overlap / max(sum(ref.values()), 1)
    f = 2 * p * r / max(p + r, 1e-12)
    return {"precision": p, "recall": r, "f1": f}


def rouge_l(reference: Sequence[str], hypothesis: Sequence[str]) -> dict:
    lcs = _lcs_len(reference, hypothesis)
    p = lcs / max(len(hypothesis), 1)
    r = lcs / max(len(reference), 1)
    f = 2 * p * r / max(p + r, 1e-12)
    return {"precision": p, "recall": r, "f1": f}


# ---------------------------------------------------------------- BERTScore


def bert_score(
    ref_emb: np.ndarray, ref_mask: np.ndarray,
    hyp_emb: np.ndarray, hyp_mask: np.ndarray,
) -> dict:
    """Greedy-matching BERTScore from token embeddings.

    ref_emb: (n_r, d); hyp_emb: (n_h, d); masks 1 = real token."""
    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)

    r = norm(ref_emb[ref_mask.astype(bool)])
    h = norm(hyp_emb[hyp_mask.astype(bool)])
    if len(r) == 0 or len(h) == 0:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    sim = h @ r.T                                  # (n_h, n_r)
    p = float(sim.max(axis=1).mean())
    rec = float(sim.max(axis=0).mean())
    f = 2 * p * rec / max(p + rec, 1e-12)
    return {"precision": p, "recall": rec, "f1": f}


# ---------------------------------------------------------------- suite


def simple_tokenize(text: str) -> list[str]:
    return text.lower().split()


class NLGEvaluator:
    """Batch metric suite (evaluation_module.py:17-224 capability).

    embed_fn: optional callable (list[str]) -> (embeddings (b, n, d),
    mask (b, n)) for BERTScore; None skips it."""

    def __init__(self, embed_fn: Optional[Callable] = None,
                 tokenize: Callable = simple_tokenize):
        self.embed_fn = embed_fn
        self.tokenize = tokenize

    def evaluate(self, references: Sequence[str], hypotheses: Sequence[str]) -> dict:
        assert len(references) == len(hypotheses)
        agg: dict[str, list[float]] = {}

        def add(k, v):
            agg.setdefault(k, []).append(v)

        for ref, hyp in zip(references, hypotheses):
            rt, ht = self.tokenize(ref), self.tokenize(hyp)
            add("bleu1", bleu(rt, ht, max_n=1))
            add("bleu4", bleu(rt, ht, max_n=4))
            r1 = rouge_n(rt, ht, 1)
            r2 = rouge_n(rt, ht, 2)
            rl = rouge_l(rt, ht)
            add("rouge1_f", r1["f1"]); add("rouge1_p", r1["precision"]); add("rouge1_r", r1["recall"])
            add("rouge2_f", r2["f1"])
            add("rougeL_f", rl["f1"]); add("rougeL_p", rl["precision"]); add("rougeL_r", rl["recall"])
            add("perfect_match", float(ref.strip().lower() == hyp.strip().lower()))

        if self.embed_fn is not None:
            re_, rm = self.embed_fn(list(references))
            he, hm = self.embed_fn(list(hypotheses))
            for i in range(len(references)):
                bs = bert_score(np.asarray(re_[i]), np.asarray(rm[i]),
                                np.asarray(he[i]), np.asarray(hm[i]))
                add("bertscore_p", bs["precision"])
                add("bertscore_r", bs["recall"])
                add("bertscore_f1", bs["f1"])

        out = {k: float(np.mean(v)) for k, v in agg.items()}
        # composite validation score (train_module.py:189-214)
        out["composite"] = (out.get("rougeL_f", 0.0) + out.get("bertscore_f1", out.get("rougeL_f", 0.0))) / 2
        return out
