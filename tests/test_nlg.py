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
