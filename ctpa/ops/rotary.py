"""Rotary position embeddings (llama-style interleaved-half convention)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_frequencies(head_dim: int, max_len: int, theta: float = 10000.0):
    """(max_len, head_dim//2) cos/sin tables."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2).astype(jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, positions: jax.Array) -> jax.Array:
    """x: (b, n, h, d); positions: (b, n) absolute token positions.

    Rotate-half convention matching HF llama (so imported weights decode
    identically): x1, x2 = split(x, 2, -1); out = [x1*cos - x2*sin, x2*cos + x1*sin].
    """
    c = cos[positions][:, :, None, :]     # (b, n, 1, d/2)
    s = sin[positions][:, :, None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1).astype(x.dtype)
