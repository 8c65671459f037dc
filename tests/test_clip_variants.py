"""CLIP loss-variant capability tests: DCL, CLOOB extra projections, FILIP,
MLM + visual-SSL weighting in the train step."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctpa.core.config import BertConfig, CTCLIPConfig, CTViTConfig, OptimizerConfig
from ctpa.models.ctclip import CTCLIP, infonce_loss
from ctpa.ops.vq import vq_init
from ctpa.train.clip_trainer import make_clip_train_step
from ctpa.train.optim import get_optimizer
from ctpa.train.train_state import CLIPTrainState

VIT = CTViTConfig.tiny()
BERT = BertConfig.tiny()


def _batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": jnp.asarray(rng.integers(1, BERT.vocab_size, size=(b, 8)), jnp.int32),
        "attention_mask": jnp.ones((b, 8), jnp.int32),
        "video": jnp.asarray(
            rng.normal(size=(b, 1, VIT.temporal_size, VIT.image_size, VIT.image_size)),
            jnp.float32),
    }


def _run(cfg, **step_kw):
    model = CTCLIP(cfg, VIT, BERT)
    vq = vq_init(jax.random.key(0), VIT.codebook_size, VIT.dim)
    b = _batch()
    params = model.init(jax.random.key(0), b["input_ids"], b["attention_mask"],
                        b["video"], vq, method=CTCLIP.init_all)
    tx = get_optimizer(OptimizerConfig(lr=1e-3), params)
    state = CLIPTrainState.create(params, tx, vq)
    step = jax.jit(make_clip_train_step(model, tx, **step_kw), donate_argnums=())
    state, m = step(state, b)
    return model, params, {k: float(v) for k, v in m.items()}


@pytest.mark.slow
def test_decoupled_contrastive_learning():
    cfg = dataclasses.replace(CTCLIPConfig.tiny(VIT, BERT),
                              decoupled_contrastive_learning=True)
    _, _, m = _run(cfg)
    assert np.isfinite(m["loss"])
    # DCL removes the positive from the denominator -> loss can go negative,
    # but must differ from standard InfoNCE on the same logits
    sim = jnp.asarray([[5.0, 1.0], [0.5, 4.0]])
    assert float(infonce_loss(sim)) != float(infonce_loss(sim, decoupled=True))


@pytest.mark.slow
def test_extra_latent_projection_cloob():
    cfg = dataclasses.replace(CTCLIPConfig.tiny(VIT, BERT),
                              extra_latent_projection=True)
    model, params, m = _run(cfg)
    assert np.isfinite(m["loss"])
    assert "to_text_latent_extra" in params["params"]
    assert "to_visual_latent_extra" in params["params"]


@pytest.mark.slow
def test_filip_all_token_embeds():
    s = VIT.image_size // VIT.patch_size
    cfg = dataclasses.replace(
        CTCLIPConfig.tiny(VIT, BERT),
        use_all_token_embeds=True, dim_image=VIT.dim)
    _, _, m = _run(cfg)
    assert np.isfinite(m["loss"])


@pytest.mark.slow
def test_mlm_and_visual_ssl_weighting():
    cfg = dataclasses.replace(CTCLIPConfig.tiny(VIT, BERT), use_mlm=True,
                              text_ssl_loss_weight=0.5, image_ssl_loss_weight=0.5)
    _, _, m = _run(cfg, use_mlm=True, use_visual_ssl=True, mask_token_id=7)
    assert np.isfinite(m["loss"])
    assert "mlm_loss" in m and m["mlm_loss"] > 0
    assert "visual_ssl_loss" in m and np.isfinite(m["visual_ssl_loss"])


def test_multiview_loss():
    cfg = CTCLIPConfig.tiny(VIT, BERT)
    model = CTCLIP(cfg, VIT, BERT)
    vq = vq_init(jax.random.key(0), VIT.codebook_size, VIT.dim)
    b = _batch()
    params = model.init(jax.random.key(0), b["input_ids"], b["attention_mask"],
                        b["video"], vq)
    aug = _batch(seed=9)
    loss = model.apply(
        params, b["input_ids"], b["attention_mask"], b["video"],
        aug["input_ids"], aug["attention_mask"], aug["video"], vq,
        method=CTCLIP.multiview_loss)
    assert np.isfinite(float(loss))
    # without views: pure primary loss
    loss0 = model.apply(params, b["input_ids"], b["attention_mask"], b["video"],
                        vq_state=vq, method=CTCLIP.multiview_loss)
    assert np.isfinite(float(loss0))
    assert float(loss) != float(loss0)


def test_pretrained_factory_and_lenient_overlay():
    from ctpa.data.hf_import import overlay_base
    from ctpa.models.pretrained import build_ctclip

    cfg = CTCLIPConfig.tiny(VIT, BERT)
    pm = build_ctclip(vit_cfg=VIT, bert_cfg=BERT, clip_cfg=cfg)
    b = _batch()
    out = pm.model.apply(pm.params, b["input_ids"], b["attention_mask"],
                         b["video"], pm.vq_state)
    assert np.isfinite(float(out.loss))

    # strict=False overlay: unknown keys and shape mismatches are skipped
    bad = {"nonexistent": {"kernel": np.zeros((3, 3))},
           "temperature": np.zeros((5,))}
    merged = overlay_base(pm.params["params"], bad, allow_missing=True)
    assert merged["temperature"].shape == ()


@pytest.mark.slow
def test_downsample_image_embeds():
    s = VIT.image_size // VIT.patch_size        # 4 in tiny config
    ds = s // 2
    cfg = dataclasses.replace(
        CTCLIPConfig.tiny(VIT, BERT),
        downsample_image_embeds=True,
        dim_image=ds * ds * 32,                  # post-downsample flatten dim
        dim_latent=32)
    _, params, m = _run(cfg)
    assert np.isfinite(m["loss"])
    assert "downsample_pointwise" in params["params"]
