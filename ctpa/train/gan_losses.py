"""GAN losses for the CTViT generative path.

Parity with reference ctvit.py:59-103: hinge and BCE discriminator/generator
losses, R1 gradient penalty, plus the adaptive generator-loss weight
(ctvit.py:521-526: ratio of reconstruction-loss grad norm to GAN-loss grad
norm at the last decoder layer)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def hinge_d_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    return (jnp.mean(nn_relu(1.0 - real_logits)) + jnp.mean(nn_relu(1.0 + fake_logits)))


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def hinge_g_loss(fake_logits: jax.Array) -> jax.Array:
    return -jnp.mean(fake_logits)


def bce_d_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    return jnp.mean(jax.nn.softplus(-real_logits)) + jnp.mean(jax.nn.softplus(fake_logits))


def bce_g_loss(fake_logits: jax.Array) -> jax.Array:
    return jnp.mean(jax.nn.softplus(-fake_logits))


def r1_gradient_penalty(
    disc_fn: Callable[[jax.Array], jax.Array], real: jax.Array,
    weight: float = 10.0,
) -> jax.Array:
    """R1 penalty: weight * E[||∇_x D(x)||^2] on real inputs (ctvit.py:87-103)."""

    def score(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(score)(real)
    return weight * jnp.mean(jnp.sum(jnp.square(grads.reshape(real.shape[0], -1)), axis=-1))


def adaptive_gan_weight(
    recon_grad_norm: jax.Array, gan_grad_norm: jax.Array,
    clamp: float = 1e4, eps: float = 1e-4,
) -> jax.Array:
    """lambda = ||∇ recon|| / ||∇ gan|| clamped (ctvit.py:521-526)."""
    w = recon_grad_norm / jnp.maximum(gan_grad_norm, eps)
    return jnp.clip(w, 0.0, clamp)


def pick_middle_frames(video: jax.Array) -> jax.Array:
    """(b, c, t, h, w) -> (b, h, w, c) middle axial slice, the discriminator's
    2D view of a 3D volume (ctvit.py:470-476)."""
    mid = video.shape[2] // 2
    return jnp.transpose(video[:, :, mid], (0, 2, 3, 1))
