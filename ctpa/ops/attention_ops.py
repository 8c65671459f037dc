"""Attention-adjacent primitive ops for the CTViT tower.

Functional parity targets (reference ct_clip/attention.py, SURVEY.md §2.1):
  * QK-l2norm "cosine" attention with learned per-head q/k scales and a learned
    null key/value (attention.py:88-181).
  * ContinuousPositionBias — 2-layer MLP over signed log distance on the 2D
    token grid (attention.py:229-276).
  * ALiBi bias for causal temporal attention (attention.py:185-227).
  * PEG — depthwise 3x3x3 Conv3d positional encoding (attention.py:56-84).

TPU-first notes: attention is expressed as batched dense matmuls (MXU) with the
bias added pre-softmax so XLA fuses scale+bias+softmax into the attention
chain.  The null-KV trick appends one extra key/value column rather than
re-padding masks, keeping all shapes static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange


def l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)


def cosine_attention(
    q: jax.Array,               # (b, h, n, d)
    k: jax.Array,               # (b, h, m, d)
    v: jax.Array,               # (b, h, m, d)
    *,
    q_scale: jax.Array,         # (d,) learned scale, shared across heads
    k_scale: jax.Array,         # (d,)
    null_kv: jax.Array | None = None,   # (2, h, num_null, d) learned null k/v
    scale: float = 8.0,
    bias: jax.Array | None = None,      # (h or 1, n, m) additive pre-softmax
    mask: jax.Array | None = None,      # (b, m) True = keep
    causal: bool = False,
) -> jax.Array:
    """QK-l2-normalised attention with learned scales and optional null KV.

    Exact reference semantics (attention.py:140-181): null k/v (if any) are
    concatenated BEFORE the l2norm, q/k are l2-normalised over head-dim then
    multiplied by a learned (dim_head,) scale shared across heads, similarity
    is scaled by a fixed temperature (default 8), bias/mask are padded with
    zeros/True over the null columns, and causal mode adds ALiBi plus the
    upper-triangular mask.
    """
    b, h, n, d = q.shape
    n_null = 0
    if null_kv is not None:
        n_null = null_kv.shape[2]
        nk = jnp.broadcast_to(null_kv[0][None], (b, h, n_null, d)).astype(k.dtype)
        nv = jnp.broadcast_to(null_kv[1][None], (b, h, n_null, d)).astype(v.dtype)
        k = jnp.concatenate([nk, k], axis=2)
        v = jnp.concatenate([nv, v], axis=2)
    m = k.shape[2]

    q = l2norm(q) * q_scale
    k = l2norm(k) * k_scale

    sim = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale

    if bias is not None:
        if n_null:
            pad = jnp.zeros(bias.shape[:-1] + (n_null,), bias.dtype)
            bias = jnp.concatenate([pad, bias], axis=-1)
        sim = sim + (bias[None] if bias.ndim == 3 else bias)

    neg = jnp.finfo(sim.dtype).min
    if mask is not None:
        keep = mask.astype(bool)
        if n_null:
            keep = jnp.concatenate([jnp.ones((b, n_null), bool), keep], axis=1)
        sim = jnp.where(keep[:, None, None, :], sim, neg)
    if causal:
        sim = sim + _causal_alibi(h, n, m, n_null)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, m - n_null), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, m - n_null), 1)
        cm = col <= (row + (m - n_null) - n)
        if n_null:
            cm = jnp.concatenate([jnp.ones((n, n_null), bool), cm], axis=1)
        sim = jnp.where(cm[None, None], sim, neg)

    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def _causal_alibi(heads: int, n: int, m: int, n_null: int) -> jnp.ndarray:
    """ALiBi bias over the real-key columns, zero over null columns
    (attention.py:168-172: rel_pos_bias added before the causal mask)."""
    real = alibi_bias(heads, n, m - n_null)
    if n_null:
        pad = jnp.zeros((heads, n, n_null), real.dtype)
        real = jnp.concatenate([pad, real], axis=-1)
    return real[None]


def alibi_slopes(heads: int) -> jnp.ndarray:
    """ALiBi per-head slopes (attention.py:196-209 semantics)."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(heads).is_integer():
        s = pow2_slopes(heads)
    else:
        closest = 2 ** int(math.floor(math.log2(heads)))
        s = pow2_slopes(closest)
        s += pow2_slopes(2 * closest)[0::2][: heads - closest]
    return jnp.asarray(s, dtype=jnp.float32)


def alibi_bias(heads: int, n: int, m: int | None = None) -> jnp.ndarray:
    """(heads, n, m) causal ALiBi bias: -slope * relative distance."""
    m = n if m is None else m
    i = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    dist = -jnp.abs(j - i).astype(jnp.float32)
    return dist[None] * alibi_slopes(heads)[:, None, None]


def continuous_position_bias_grid(height: int, width: int) -> jnp.ndarray:
    """(n, n, 2) signed-log relative-position features for the spatial token
    grid (attention.py:252-270): rel = sign(delta) * log(1 + |delta|)."""
    gy = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0).reshape(-1)
    gx = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1).reshape(-1)
    pos = jnp.stack([gy, gx], axis=-1).astype(jnp.float32)   # (n, 2)
    rel = pos[:, None, :] - pos[None, :, :]                  # (n, n, 2)
    return jnp.sign(rel) * jnp.log1p(jnp.abs(rel))


def peg_conv3d(
    x: jax.Array,               # (b, t, h, w, c) tokens on the 3D grid
    kernel: jax.Array,          # (3, 3, 3, 1, c) depthwise kernel
    causal: bool = True,
) -> jax.Array:
    """Positional Encoding Generator: depthwise 3x3x3 conv over the token grid,
    added residually by the caller (attention.py:56-84).  ``causal=True`` pads
    the temporal axis on the left only (peg_causal=True at ctvit.py:182-183).

    TPU note: grouped conv with feature_group_count == channels lowers
    pathologically on TPU (XLA splits it per-channel, exploding compile time
    at c=512).  A 3x3x3 depthwise conv is just 27 shifted elementwise
    multiply-adds, which XLA fuses into a handful of VPU loops — so that is
    how it is written."""
    pad_t = (2, 0) if causal else (1, 1)
    xp = jnp.pad(
        x, ((0, 0), pad_t, (1, 1), (1, 1), (0, 0))
    ).astype(kernel.dtype)
    t, h, w = x.shape[1], x.shape[2], x.shape[3]
    out = None
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                term = (
                    jax.lax.dynamic_slice_in_dim(
                        jax.lax.dynamic_slice_in_dim(
                            jax.lax.dynamic_slice_in_dim(xp, dt, t, axis=1),
                            dh, h, axis=2),
                        dw, w, axis=3)
                    * kernel[dt, dh, dw, 0]
                )
                out = term if out is None else out + term
    return out


def split_heads(x: jax.Array, heads: int) -> jax.Array:
    return rearrange(x, "b n (h d) -> b h n d", h=heads)


def merge_heads(x: jax.Array) -> jax.Array:
    return rearrange(x, "b h n d -> b n (h d)")
