"""MLM / visual SSL / VQGAN trainer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ctpa.core.config import BertConfig, CTViTConfig
from ctpa.models.bert import BertEncoder, BertMLMHead
from ctpa.models.ctvit import CTViT
from ctpa.models.discriminator import Discriminator, PerceptualNet, perceptual_loss
from ctpa.models.mlm import mask_tokens, mlm_loss
from ctpa.models.visual_ssl import (
    augment_volume, nt_xent_loss, simclr_ssl_loss, simsiam_loss,
)
from ctpa.ops.vq import vq_init
from ctpa.train.vqgan_trainer import VQGANState, make_vqgan_train_step

BERT = BertConfig.tiny()
VIT = CTViTConfig.tiny()


def test_mask_tokens_properties():
    ids = jnp.asarray([[5, 6, 7, 8, 0, 0], [9, 10, 11, 12, 13, 14]])
    masked, selected = mask_tokens(jax.random.key(0), ids, mask_prob=0.5,
                                   mask_token_id=103)
    # pads never selected
    assert not bool(selected[0, 4]) and not bool(selected[0, 5])
    # at least one selection per row
    assert bool(selected.any(axis=-1).all())
    # masked positions either [MASK] or original (keep-prob)
    changed = masked != ids
    assert bool(jnp.all(masked[changed] == 103))


def test_mlm_loss_finite_and_targets_matter():
    model = BertEncoder(BERT)
    head = BertMLMHead(BERT)
    ids = jnp.asarray([[5, 6, 7, 8], [9, 10, 11, 12]])
    mask = jnp.ones_like(ids)
    p1 = model.init(jax.random.key(0), ids, mask)
    hidden, _ = model.apply(p1, ids, mask)
    p2 = head.init(jax.random.key(1), hidden)

    def apply_fn(masked_ids, attention_mask):
        h, _ = model.apply(p1, masked_ids, attention_mask)
        return head.apply(p2, h)

    loss = mlm_loss(jax.random.key(2), apply_fn, ids, mask)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_nt_xent_identical_views_low_loss():
    rng = jax.random.key(0)
    z = jax.random.normal(rng, (8, 16))
    noise = 0.001 * jax.random.normal(jax.random.key(1), (8, 16))
    low = nt_xent_loss(z, z + noise, temperature=0.1)
    high = nt_xent_loss(z, jax.random.normal(jax.random.key(2), (8, 16)))
    assert float(low) < float(high)


def test_simsiam_loss_range():
    p = jax.random.normal(jax.random.key(0), (4, 8))
    z = jax.random.normal(jax.random.key(1), (4, 8))
    l = simsiam_loss(p, z, p, z)
    assert -1.0 <= float(l) <= 1.0
    # aligned: loss ~ -1
    assert float(simsiam_loss(z, z, z, z)) == pytest.approx(-1.0, abs=1e-5)


def test_augment_preserves_shape_and_simclr_runs():
    video = jax.random.normal(jax.random.key(0), (2, 1, 8, 16, 16))
    aug = augment_volume(jax.random.key(1), video)
    assert aug.shape == video.shape

    def encode(v):
        return v.mean(axis=(2, 3, 4))

    loss = simclr_ssl_loss(jax.random.key(2), encode, video)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_vqgan_train_step_runs_and_descends():
    import dataclasses
    cfg = dataclasses.replace(VIT, use_decoder=True)
    model = CTViT(cfg)
    disc = Discriminator(base_dim=8, num_layers=2)
    perc = PerceptualNet(stages=(8, 16))
    vq_state = vq_init(jax.random.key(0), cfg.codebook_size, cfg.dim)
    video = jax.random.normal(jax.random.key(1),
                              (1, 1, cfg.temporal_size, cfg.image_size, cfg.image_size))
    gen_params = model.init(jax.random.key(2), video, vq_state, method=CTViT.reconstruct)
    mid = jnp.zeros((1, cfg.image_size, cfg.image_size, 1))
    disc_params = disc.init(jax.random.key(3), mid)
    perc_params = perc.init(jax.random.key(4), jnp.repeat(mid, 3, axis=-1))
    gen_tx = optax.adam(1e-3)
    disc_tx = optax.adam(1e-3)
    state = VQGANState(
        gen_params=gen_params, disc_params=disc_params, perc_params=perc_params,
        gen_opt=gen_tx.init(gen_params), disc_opt=disc_tx.init(disc_params),
        vq_state=vq_state, step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_vqgan_train_step(model, disc, perc, gen_tx, disc_tx,
                                         apply_r1_every=2))
    recons = []
    for _ in range(3):
        state, m = step(state, video)
        recons.append(float(m["recon"]))
        for k, v in m.items():
            assert np.isfinite(float(v)), k
    assert recons[-1] < recons[0]          # reconstruction improves
    assert int(state.step) == 3


def test_perceptual_loss_zero_for_identical():
    perc = PerceptualNet(stages=(8,))
    x = jax.random.normal(jax.random.key(0), (1, 16, 16, 1))
    params = perc.init(jax.random.key(1), jnp.repeat(x, 3, axis=-1))
    assert float(perceptual_loss(params, perc, x, x)) == 0.0
    assert float(perceptual_loss(params, perc, x, x * 2)) > 0.0
