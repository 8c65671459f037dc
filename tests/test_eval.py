"""Zero-shot scoring + classification metric tests."""

import numpy as np
import jax.numpy as jnp

from ctpa.eval.classification import (
    accuracy_f1_at_youden,
    bootstrap_cis,
    choose_operating_point,
    evaluate_classification,
)
from ctpa.eval.zeroshot import PATHOLOGIES, prompt_pairs, score_prompt_pairs


def test_prompt_pairs_parity():
    pp = prompt_pairs(["Cardiomegaly"])
    assert pp == ["Cardiomegaly is present.", "Cardiomegaly is not present."]
    assert len(prompt_pairs()) == 2 * len(PATHOLOGIES)
    assert "Pulmonary Embolism is present." in prompt_pairs()


def test_pathology_list_reference_verbatim():
    """Byte-identical to ctclip_inference.py:286-290 — 18 entries, reference
    order, 'Pulmonary Embolism' at index 11.  Artifact column order (npz label
    matrices, aurocs.xlsx) depends on this."""
    assert PATHOLOGIES == (
        "Medical material", "Arterial wall calcification", "Cardiomegaly",
        "Pericardial effusion", "Coronary artery wall calcification",
        "Hiatal hernia", "Lymphadenopathy", "Emphysema", "Atelectasis",
        "Lung nodule", "Lung opacity", "Pulmonary Embolism",
        "Pleural effusion", "Mosaic attenuation pattern",
        "Peribronchial thickening", "Consolidation", "Bronchiectasis",
        "Interlobular septal thickening",
    )
    assert len(PATHOLOGIES) == 18
    assert PATHOLOGIES.index("Pulmonary Embolism") == 11


def test_score_prompt_pairs_softmax():
    d = 8
    img = jnp.asarray(np.eye(1, d, dtype=np.float32))          # e0
    pos = np.eye(1, d, dtype=np.float32)[0]                     # aligned
    neg = -pos
    prompts = jnp.asarray(np.stack([pos, neg]))                 # P=1 pair
    p = score_prompt_pairs(img, prompts, jnp.float32(10.0))
    assert p.shape == (1, 1)
    assert float(p[0, 0]) > 0.99                                # 'present' wins
    # swapped pair: 'present' loses
    p2 = score_prompt_pairs(img, jnp.asarray(np.stack([neg, pos])), jnp.float32(10.0))
    assert float(p2[0, 0]) < 0.01


def test_evaluate_classification_perfect_and_random():
    rng = np.random.default_rng(0)
    n = 200
    labels = rng.integers(0, 2, size=(n, 2)).astype(float)
    perfect = labels[:, :1]
    rand = rng.uniform(size=(n, 1))
    preds = np.concatenate([perfect, rand], axis=1)
    df = evaluate_classification(preds, labels, ["a", "b"])
    assert df["a_auc"][0] == 1.0
    assert 0.35 < df["b_auc"][0] < 0.65


def test_bootstrap_cis_contains_point_estimate():
    rng = np.random.default_rng(0)
    n = 300
    labels = rng.integers(0, 2, size=(n, 1)).astype(float)
    scores = labels[:, 0] * 0.6 + rng.uniform(size=n) * 0.4
    df = bootstrap_cis(scores[:, None], labels, ["x"], n_samples=200)
    row = df.iloc[0]
    assert row["lower"] <= row["mid"] <= row["upper"]
    assert row["upper"] - row["lower"] < 0.3


def test_youden_point():
    fpr = np.array([0.0, 0.1, 0.5, 1.0])
    tpr = np.array([0.0, 0.8, 0.9, 1.0])
    thr = np.array([np.inf, 0.7, 0.4, 0.0])
    t, f, tp = choose_operating_point(fpr, tpr, thr)
    assert t == 0.7 and f == 0.1 and tp == 0.8


def test_accuracy_f1():
    labels = np.array([[1], [1], [0], [0]], dtype=float)
    preds = np.array([[0.9], [0.8], [0.2], [0.1]])
    df = accuracy_f1_at_youden(preds, labels, ["x"])
    assert df.iloc[0]["accuracy"] == 1.0
    assert df.iloc[0]["f1"] == 1.0
