"""NLG metric tests — cross-checked against nltk / rouge_score oracles."""

import numpy as np
import pytest

from ctpa.eval.nlg import NLGEvaluator, bert_score, bleu, rouge_l, rouge_n


REF = "the lungs are clear with no evidence of pulmonary embolism".split()
HYP = "the lungs are clear no pulmonary embolism seen".split()


def test_bleu_matches_nltk():
    from nltk.translate.bleu_score import SmoothingFunction, sentence_bleu

    want = sentence_bleu([REF], HYP, smoothing_function=SmoothingFunction().method1)
    got = bleu(REF, HYP, max_n=4)
    assert got == pytest.approx(want, rel=1e-6)


def test_bleu_edge_cases():
    assert bleu(REF, []) == 0.0
    assert bleu(REF, REF) == pytest.approx(1.0)
    assert 0.0 < bleu(REF, HYP, max_n=1) <= 1.0


def test_rouge_matches_rouge_score_pkg():
    from rouge_score import rouge_scorer

    scorer = rouge_scorer.RougeScorer(["rouge1", "rouge2", "rougeL"])
    want = scorer.score(" ".join(REF), " ".join(HYP))
    got1 = rouge_n(REF, HYP, 1)
    got2 = rouge_n(REF, HYP, 2)
    gotl = rouge_l(REF, HYP)
    assert got1["f1"] == pytest.approx(want["rouge1"].fmeasure, rel=1e-6)
    assert got2["f1"] == pytest.approx(want["rouge2"].fmeasure, rel=1e-6)
    assert gotl["f1"] == pytest.approx(want["rougeL"].fmeasure, rel=1e-6)


def test_bert_score_identity_and_orthogonal():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(5, 16))
    mask = np.ones(5)
    s = bert_score(emb, mask, emb, mask)
    assert s["f1"] == pytest.approx(1.0, abs=1e-6)
    # orthogonal embeddings -> low score
    a = np.eye(4, 16)
    b = np.eye(16)[4:8]
    s2 = bert_score(a, np.ones(4), b, np.ones(4))
    assert s2["f1"] < 0.1


def test_evaluator_suite():
    ev = NLGEvaluator()
    out = ev.evaluate(
        ["no acute abnormality", "pulmonary embolism present"],
        ["no acute abnormality", "no embolism"],
    )
    assert out["perfect_match"] == 0.5
    for k in ("bleu1", "bleu4", "rouge1_f", "rougeL_f", "composite"):
        assert 0.0 <= out[k] <= 1.0
    # with an embedding fn, bertscore keys appear
    def fake_embed(texts):
        rng = np.random.default_rng(0)
        n = 6
        emb = np.stack([rng.normal(size=(n, 8)) for _ in texts])
        return emb, np.ones((len(texts), n))

    out2 = NLGEvaluator(embed_fn=fake_embed).evaluate(["a b"], ["a b"])
    assert out2["bertscore_f1"] == pytest.approx(1.0, abs=1e-6)


def test_bert_score_baseline_rescaling():
    """Hand-computed fixture for rescale_with_baseline semantics
    (evaluation_module.py:53): x' = (x - b) / (1 - b), applied to P/R/F1 each
    with its own constant AFTER raw F1."""
    from ctpa.eval.nlg import rescale_with_baseline

    rng = np.random.default_rng(1)
    ref = rng.normal(size=(4, 8))
    hyp = rng.normal(size=(3, 8))
    raw = bert_score(ref, np.ones(4), hyp, np.ones(3))
    b = (0.85, 0.80, 0.825)
    got = bert_score(ref, np.ones(4), hyp, np.ones(3), baseline=b)
    for key, bk in zip(("precision", "recall", "f1"), b):
        assert got[key] == pytest.approx((raw[key] - bk) / (1 - bk), abs=1e-9)
    # identity pair rescales to exactly 1.0 regardless of baseline
    ident = bert_score(ref, np.ones(4), ref, np.ones(4), baseline=b)
    assert ident["f1"] == pytest.approx(1.0, abs=1e-6)
    # F1 is rescaled directly, NOT recomputed from rescaled P/R
    p, r = got["precision"], got["recall"]
    assert got["f1"] != pytest.approx(2 * p * r / (p + r), abs=1e-6)
    assert rescale_with_baseline(raw, b)["f1"] == pytest.approx(got["f1"])


def test_bert_score_idf_weighting():
    """Hand-computed IDF fixture: ref tokens e0 (idf 2.0) and e1 (idf 0.5),
    hyp = [e0].  Max-sims over ref = [1, 0] -> idf recall = 2/(2+0.5) = 0.8
    (vs 0.5 unweighted); precision = 1."""
    e = np.eye(2, 8)
    ref = e
    hyp = e[:1]
    raw = bert_score(ref, np.ones(2), hyp, np.ones(1))
    assert raw["recall"] == pytest.approx(0.5, abs=1e-9)
    got = bert_score(ref, np.ones(2), hyp, np.ones(1),
                     ref_idf=np.array([2.0, 0.5]), hyp_idf=np.array([1.0]))
    assert got["precision"] == pytest.approx(1.0, abs=1e-9)
    assert got["recall"] == pytest.approx(0.8, abs=1e-9)


def test_compute_idf_matches_formula():
    """idf(w) = log((N+1)/(df+1)) with default log(N+1) for unseen tokens —
    bert_score get_idf_dict semantics."""
    from ctpa.eval.nlg import compute_idf

    corpus = [["a", "b"], ["a", "c"], ["a", "b", "b"]]  # df: a=3, b=2, c=1
    idf = compute_idf(corpus)
    assert idf["a"] == pytest.approx(np.log(4 / 4))
    assert idf["b"] == pytest.approx(np.log(4 / 3))
    assert idf["c"] == pytest.approx(np.log(4 / 2))
    assert idf["__default__"] == pytest.approx(np.log(4))


def test_evaluator_idf_and_baseline_end_to_end():
    """Evaluator threads ids -> corpus IDF -> weighted scores; identical
    ref/hyp stays exactly 1.0 under both options."""
    def embed_with_ids(texts):
        vocab = {}
        ids = []
        for t in texts:
            ids.append([vocab.setdefault(w, len(vocab) + 1) for w in t.split()])
        n = max(len(i) for i in ids)
        idmat = np.zeros((len(texts), n), int)
        mask = np.zeros((len(texts), n))
        emb = np.zeros((len(texts), n, 16))
        for r, row in enumerate(ids):
            for c, tid in enumerate(row):
                idmat[r, c] = tid
                mask[r, c] = 1
                emb[r, c] = np.eye(16)[tid % 16]
        return emb, mask, idmat

    ev = NLGEvaluator(embed_fn=embed_with_ids, use_idf=True,
                      bertscore_baseline=(0.5, 0.5, 0.5))
    out = ev.evaluate(["a b c", "d e"], ["a b c", "d e"])
    assert out["bertscore_f1"] == pytest.approx(1.0, abs=1e-6)
    out2 = ev.evaluate(["a b c"], ["a z z"])
    assert out2["bertscore_f1"] < 1.0


def test_bertscore_baseline_roundtrip(tmp_path, rng):
    """compute_bertscore_baseline -> save -> load -> NLGEvaluator: identical
    pairs rescale to ~1.0, random pairs to ~0.0 (the property the constants
    exist for); artifact round-trips through JSON (VERDICT r2 task 10b)."""
    from ctpa.eval.nlg import (NLGEvaluator, compute_bertscore_baseline,
                               load_bertscore_baseline,
                               save_bertscore_baseline)

    d = 16
    vocab_emb = {w: rng.normal(size=d) for w in "a b c d e f g h i j".split()}

    def embed(texts):
        n = max(len(t.split()) for t in texts)
        emb = np.zeros((len(texts), n, d)); mask = np.zeros((len(texts), n))
        for i, t in enumerate(texts):
            for j, w in enumerate(t.split()):
                emb[i, j] = vocab_emb[w]; mask[i, j] = 1
        return emb, mask

    corpus = ["a b c", "d e f", "g h i", "b d g", "c e j", "a f h"]
    baseline = compute_bertscore_baseline(embed, corpus)
    assert 0.0 < baseline["f1"] < 1.0 and baseline["n_pairs"] == len(corpus)

    path = str(tmp_path / "baseline.json")
    save_bertscore_baseline(path, baseline)
    triple = load_bertscore_baseline(path)
    assert triple == (baseline["precision"], baseline["recall"], baseline["f1"])

    ev = NLGEvaluator(embed_fn=embed, bertscore_baseline=triple)
    same = ev.evaluate(["a b c"], ["a b c"])
    assert same["bertscore_f1"] > 0.99
    rnd = ev.evaluate(corpus[:3], ["b d g", "c e j", "a f h"])
    assert abs(rnd["bertscore_f1"]) < 0.6   # near the baseline floor
