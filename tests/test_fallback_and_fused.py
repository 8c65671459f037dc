"""Fallback transformers, PatchDropout, fused flash attention mode, codebook
decode."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctpa.core.config import CTViTConfig
from ctpa.models.ctvit import CTViT
from ctpa.models.fallback_transformers import (
    PatchDropout, TextTransformer, VisionTransformer2D,
)
from ctpa.ops.vq import vq_init

VIT = CTViTConfig.tiny()


def test_text_transformer_cls_and_causal():
    ids = jnp.asarray([[5, 6, 7, 0], [8, 9, 10, 11]])
    mask = (ids != 0).astype(jnp.int32)
    m = TextTransformer(dim=32, depth=2, heads=4, dim_head=8, vocab_size=64, max_len=16)
    p = m.init(jax.random.key(0), ids, mask)
    hidden, pooled = m.apply(p, ids, mask)
    assert hidden.shape == (2, 5, 32)        # CLS prepended
    assert pooled.shape == (2, 32)

    mc = TextTransformer(dim=32, depth=2, heads=4, dim_head=8, vocab_size=64,
                         max_len=16, causal=True)
    pc = mc.init(jax.random.key(0), ids, mask)
    hidden, pooled = mc.apply(pc, ids, mask)
    assert hidden.shape == (2, 4, 32)        # no CLS in causal mode
    # EOS pooling: pooled of row 0 = hidden at last real token (index 2)
    np.testing.assert_allclose(np.asarray(pooled[0]), np.asarray(hidden[0, 2]),
                               atol=1e-6)


def test_vision_transformer_2d_and_patch_dropout():
    imgs = jax.random.normal(jax.random.key(0), (2, 3, 64, 64))
    m = VisionTransformer2D(dim=32, depth=1, heads=4, dim_head=8,
                            image_size=64, patch_size=16, patch_dropout=0.5)
    p = m.init(jax.random.key(0), imgs)
    hidden, pooled = m.apply(p, imgs)
    assert hidden.shape == (2, 16, 32) and pooled.shape == (2, 32)
    # training mode with dropout keeps half the tokens
    hidden_tr, _ = m.apply(p, imgs, False, jax.random.key(1))
    assert hidden_tr.shape == (2, 8, 32)

    # PatchDropout determinism + keep-count
    x = jax.random.normal(jax.random.key(2), (2, 10, 4))
    pd = PatchDropout(0.3)
    pp = pd.init(jax.random.key(0), x)
    out = pd.apply(pp, x, jax.random.key(3), False)
    assert out.shape == (2, 7, 4)
    assert pd.apply(pp, x).shape == x.shape  # eval = identity


def test_fused_flash_encoder_runs_and_matches_memory_layout():
    cfg = dataclasses.replace(VIT, fused_attention=True, fused_depth=1)
    model = CTViT(cfg)
    vq = vq_init(jax.random.key(0), cfg.codebook_size, cfg.dim)
    video = jax.random.normal(
        jax.random.key(1), (1, 1, cfg.temporal_size, cfg.image_size, cfg.image_size))
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        params = model.init(jax.random.key(0), video, vq)
        tokens, vq_out = model.apply(params, video, vq)
    t, h, w = model.grid
    assert tokens.shape == (1, t, h, w, cfg.dim)
    assert np.isfinite(np.asarray(tokens.astype(jnp.float32))).all()
    assert vq_out is not None


def test_decode_from_codebook_indices():
    cfg = dataclasses.replace(VIT, use_decoder=True)
    model = CTViT(cfg)
    vq = vq_init(jax.random.key(0), cfg.codebook_size, cfg.dim)
    video = jnp.zeros((1, 1, cfg.temporal_size, cfg.image_size, cfg.image_size))
    params = model.init(jax.random.key(0), video, vq, method=CTViT.reconstruct)
    t, h, w = model.grid
    idx = jax.random.randint(jax.random.key(1), (1, t * h * w), 0, cfg.codebook_size)
    recon = model.apply(params, idx, vq, method=CTViT.decode_from_codebook_indices)
    assert recon.shape == video.shape


def test_flash_axial_matches_xla_axial():
    """flash_axial routes the spatial fold through the pallas flat-softmax
    cosine path (CPB bias included) — must match the XLA axial encode."""
    model_x = CTViT(VIT)
    model_f = CTViT(dataclasses.replace(VIT, flash_axial=True))
    vq = vq_init(jax.random.key(0), VIT.codebook_size, VIT.dim)
    video = jax.random.normal(
        jax.random.key(1), (1, 1, VIT.temporal_size, VIT.image_size, VIT.image_size))
    from jax.experimental.pallas import tpu as pltpu

    params = model_x.init(jax.random.key(0), video, vq)
    want, _ = model_x.apply(params, video, vq)
    with pltpu.force_tpu_interpret_mode():
        got, _ = model_f.apply(params, video, vq)
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)), rtol=2e-3, atol=2e-3)
