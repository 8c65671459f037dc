"""Visual self-supervised learning: SimSiam and SimCLR (NT-Xent) objectives.

Parity with reference visual_ssl.py:141-299, redesigned functionally: instead
of forward-hook feature interception (`NetWrapper`), the caller passes an
`encode_fn(params, view) -> features`; augmentations are jit-safe jax image
ops (the reference used 2D torchvision transforms on slices)."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctpa.ops.attention_ops import l2norm


class ProjectorMLP(nn.Module):
    """SimSiam/SimCLR projection head (visual_ssl.py:116-138 MLP)."""

    hidden: int = 512
    out: int = 256
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layers - 1):
            x = nn.Dense(self.hidden)(x)
            x = nn.BatchNorm(use_running_average=True)(x)
            x = nn.relu(x)
        return nn.Dense(self.out)(x)


class PredictorMLP(nn.Module):
    hidden: int = 512
    out: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        return nn.Dense(self.out)(x)


def simsiam_loss(p1, z2, p2, z1) -> jax.Array:
    """Negative cosine with stop-gradient on targets (visual_ssl.py:141-199)."""

    def d(p, z):
        return -jnp.sum(l2norm(p) * l2norm(jax.lax.stop_gradient(z)), axis=-1).mean()

    return d(p1, z2) / 2 + d(p2, z1) / 2


def nt_xent_loss(z1: jax.Array, z2: jax.Array, temperature: float = 0.1) -> jax.Array:
    """SimCLR NT-Xent over 2b views (visual_ssl.py:202-299 loss)."""
    b = z1.shape[0]
    z = l2norm(jnp.concatenate([z1, z2], axis=0))
    sim = z @ z.T / temperature
    neg_inf = jnp.finfo(sim.dtype).min
    sim = jnp.where(jnp.eye(2 * b, dtype=bool), neg_inf, sim)
    targets = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    return -jnp.take_along_axis(
        jax.nn.log_softmax(sim, axis=-1), targets[:, None], axis=-1
    ).mean()


def augment_volume(rng: jax.Array, video: jax.Array,
                   noise_std: float = 0.05) -> jax.Array:
    """Jit-safe 3D augmentation: random flips over spatial axes, intensity
    jitter, gaussian noise (functional analog of the reference's torchvision
    stack, visual_ssl.py:214-233)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    flip_h = jax.random.bernoulli(k1)
    flip_w = jax.random.bernoulli(k2)
    video = jnp.where(flip_h, jnp.flip(video, axis=-2), video)
    video = jnp.where(flip_w, jnp.flip(video, axis=-1), video)
    scale = 1.0 + 0.1 * jax.random.uniform(k3, (), minval=-1.0, maxval=1.0)
    noise = noise_std * jax.random.normal(k4, video.shape, video.dtype)
    return video * scale + noise


def simclr_ssl_loss(
    rng: jax.Array,
    encode_fn: Callable[[jax.Array], jax.Array],
    video: jax.Array,
    temperature: float = 0.1,
) -> jax.Array:
    """Two augmented views -> encoder -> NT-Xent."""
    k1, k2 = jax.random.split(rng)
    z1 = encode_fn(augment_volume(k1, video))
    z2 = encode_fn(augment_volume(k2, video))
    return nt_xent_loss(z1, z2, temperature)
