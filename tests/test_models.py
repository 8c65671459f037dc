"""Unit tests for the CTViT / BERT / CTCLIP stack on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctpa.core.config import BertConfig, CTCLIPConfig, CTViTConfig
from ctpa.models.bert import BertEncoder
from ctpa.models.ctclip import CTCLIP, infonce_loss
from ctpa.models.ctvit import CTViT
from ctpa.ops.vq import VQState, ema_update, vq_encode, vq_init


VIT = CTViTConfig.tiny()
BERT = BertConfig.tiny()
CLIP = CTCLIPConfig.tiny(VIT, BERT)


def make_video(b=2):
    rng = np.random.default_rng(1)
    c = VIT
    return jnp.asarray(
        rng.normal(size=(b, c.channels, c.temporal_size, c.image_size, c.image_size)),
        dtype=jnp.float32,
    )


def test_ctvit_shapes_and_vq():
    model = CTViT(VIT)
    vq_state = vq_init(jax.random.key(0), VIT.codebook_size, VIT.dim)
    video = make_video(2)
    params = model.init(jax.random.key(0), video, vq_state)
    tokens, vq_out = model.apply(params, video, vq_state)
    t, h, w = VIT.temporal_tokens, VIT.image_size // VIT.patch_size, VIT.image_size // VIT.patch_size
    assert tokens.shape == (2, t, h, w, VIT.dim)
    assert vq_out.indices.shape == (2, t * h * w)
    assert vq_out.indices.max() < VIT.codebook_size
    assert np.isfinite(float(vq_out.commit_loss))
    # straight-through: quantized values are codebook rows (l2-normalised)
    norms = np.linalg.norm(np.asarray(tokens).reshape(-1, VIT.dim), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_vq_ema_moves_codebook():
    key = jax.random.key(0)
    state = vq_init(key, 16, 8)
    x = jax.random.normal(jax.random.key(1), (64, 8))
    out = vq_encode(state, x)
    new = ema_update(state, out.counts, out.sums, decay=0.5)
    assert not np.allclose(np.asarray(new.codebook), np.asarray(state.codebook))
    # codebook rows stay unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(new.codebook), axis=-1), 1.0, atol=1e-5
    )


def test_vq_mask_excludes_tokens():
    state = vq_init(jax.random.key(0), 8, 4)
    x = jax.random.normal(jax.random.key(1), (2, 6, 4))
    mask = jnp.asarray([[True] * 6, [True, True, False, False, False, False]])
    out = vq_encode(state, x, mask=mask)
    assert float(out.counts.sum()) == 8.0  # 6 + 2 real tokens


def test_bert_encoder_masking():
    model = BertEncoder(BERT)
    ids = jnp.asarray([[5, 6, 7, 0, 0], [8, 9, 10, 11, 12]])
    mask = (ids != 0).astype(jnp.int32)
    params = model.init(jax.random.key(0), ids, mask)
    hidden, cls = model.apply(params, ids, mask)
    assert hidden.shape == (2, 5, BERT.hidden_size)
    assert cls.shape == (2, BERT.hidden_size)
    # padding must not influence CLS: change pad token content, CLS unchanged
    ids2 = ids.at[0, 3].set(99)
    _, cls2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(cls[0]), np.asarray(cls2[0]), atol=1e-5)


def test_infonce_perfect_alignment_is_low():
    lat = jnp.eye(4, 8)
    sim_good = (lat @ lat.T) * 20.0
    sim_bad = jnp.ones((4, 4)) * 20.0
    assert float(infonce_loss(sim_good)) < 0.05
    assert float(infonce_loss(sim_bad)) > 1.0


def test_ctclip_forward_loss_and_zeroshot():
    model = CTCLIP(CLIP, VIT, BERT)
    vq_state = vq_init(jax.random.key(0), VIT.codebook_size, VIT.dim)
    video = make_video(2)
    ids = jnp.asarray([[5, 6, 7, 0], [9, 10, 11, 12]])
    mask = (ids != 0).astype(jnp.int32)
    params = model.init(jax.random.key(0), ids, mask, video, vq_state)
    out = model.apply(params, ids, mask, video, vq_state, return_loss=True)
    assert out.loss.shape == ()
    assert np.isfinite(float(out.loss))
    assert out.sim.shape == (2, 2)
    assert out.text_latents.shape == (2, CLIP.dim_latent)
    # zero-shot scoring path: 2 prompts vs 1 image via broadcast
    out2 = model.apply(params, ids, mask, video[:1], vq_state, return_loss=False)
    assert out2.sim.shape == (2,)


@pytest.mark.slow
def test_ctclip_grads_flow():
    model = CTCLIP(CLIP, VIT, BERT)
    vq_state = vq_init(jax.random.key(0), VIT.codebook_size, VIT.dim)
    video = make_video(2)
    ids = jnp.asarray([[5, 6, 7, 0], [9, 10, 11, 12]])
    mask = (ids != 0).astype(jnp.int32)
    params = model.init(jax.random.key(0), ids, mask, video, vq_state)

    def loss_fn(p):
        return model.apply(p, ids, mask, video, vq_state).loss

    grads = jax.grad(loss_fn)(params)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
    # temperature is learnable
    assert float(jnp.abs(grads["params"]["temperature"])) >= 0


def test_ctvit_decoder_roundtrip_shape():
    import dataclasses
    cfg = dataclasses.replace(VIT, use_decoder=True)
    model = CTViT(cfg)
    vq_state = vq_init(jax.random.key(0), cfg.codebook_size, cfg.dim)
    video = make_video(1)
    params = model.init(jax.random.key(0), video, vq_state, method=CTViT.reconstruct)
    recon, vq_out = model.apply(params, video, vq_state, method=CTViT.reconstruct)
    assert recon.shape == video.shape
    assert vq_out is not None


@pytest.mark.slow
def test_ctclip_remat_matches_plain():
    """remat=True must be a pure memory/performance knob — identical outputs."""
    model = CTCLIP(CLIP, VIT, BERT)
    model_r = CTCLIP(CLIP, VIT, BERT, remat=True)
    vq_state = vq_init(jax.random.key(0), VIT.codebook_size, VIT.dim)
    video = make_video(1)
    ids = jnp.asarray([[5, 6, 7, 8]])
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.key(0), ids, mask, video, vq_state)
    out = model.apply(params, ids, mask, video, vq_state)
    out_r = model_r.apply(params, ids, mask, video, vq_state)
    np.testing.assert_allclose(float(out.loss), float(out_r.loss), rtol=1e-5)
    g = jax.grad(lambda p: model_r.apply(p, ids, mask, video, vq_state).loss)(params)
    assert np.isfinite(float(optax_global_norm(g)))


def optax_global_norm(tree):
    import optax

    return optax.global_norm(tree)


def test_kv_from_normed_compat_flag_changes_activations():
    """Default (False) keeps the reference's K/V-from-un-normalized quirk;
    kv_from_normed=True is the compat mode for pre-round-3 ctpa checkpoints
    (models/attention.py CosineAttention) — it must actually change the
    self-attention output, and only the flag may differ."""
    from ctpa.models.attention import CosineAttention

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 16)) * 3.0,
                    jnp.float32)
    ref = CosineAttention(dim=16, heads=2, dim_head=8)
    params = ref.init(jax.random.PRNGKey(0), x)
    y_ref = ref.apply(params, x)
    y_compat = CosineAttention(dim=16, heads=2, dim_head=8,
                               kv_from_normed=True).apply(params, x)
    assert y_ref.shape == y_compat.shape
    assert not np.allclose(np.asarray(y_ref), np.asarray(y_compat), atol=1e-4)
