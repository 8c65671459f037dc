"""Pallas fused patchify + LayerNorm + projection kernel.

The CTViT patch embed (b c (t pt) (h p1) (w p2) -> b t h w d with LN-Linear)
costs ~14 ms/volume at shipped scale when expressed as a 6D transpose: the
inner contiguous runs are only p2 elements (20 * 2B = 40 bytes), so HBM
bandwidth utilisation collapses.  This kernel never materialises the patch
layout in HBM: each grid step DMAs one (pt, p1, W) slab into VMEM, re-tiles it
locally to (w_patches, patch_dim), computes the per-patch LayerNorm statistics
in fp32, folds the LN scale, and feeds the MXU with a
(w_patches, patch_dim) x (patch_dim, dim) matmul.  The LN bias term is a
constant vector (kernel^T @ bias) added by the caller.

Interface matches PatchEmbed3D's math exactly (tested against the reference
LN-Linear composition)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, g_ref, k_ref, v2_ref, o_ref, *, pt: int, p1: int, p2: int,
            eps: float):
    """x_ref: (pt*p1, w, p2) slab view; g_ref: (pt*p1, p2) LN scale;
    k_ref: (pt*p1, p2, dim) projection; v2_ref: (1, dim) = sum_ap g*K.

    LayerNorm is folded algebraically so no (w, patch_dim) layout is ever
    formed (Mosaic cannot reshape the lane dim):
      out[w] = rsig[w] * sum_ap (x ∘ g) K  -  (mu[w] * rsig[w]) * v2
    The contraction runs as ONE dot_general with two contracting dims
    ((a, p2) x (a, p2)) straight onto the MXU."""
    x = x_ref[:].astype(jnp.float32)
    x = x.reshape(pt * p1, x.shape[-2], p2)              # (a, w, p2): leading
    pd = pt * p1 * p2                                    # merge only, lane dim intact
    mu = jnp.sum(x, axis=(0, 2)) / pd                    # (w,)
    m2 = jnp.sum(jnp.square(x), axis=(0, 2)) / pd
    rsig = jax.lax.rsqrt(m2 - jnp.square(mu) + eps)      # (w,)
    scaled = x * g_ref[:].astype(jnp.float32)[:, None, :]
    # batched matmul over a then reduce (Mosaic supports single contracting
    # dim only): (a, w, p2) x (a, p2, d) -> (a, w, d) -> sum_a -> (w, d)
    per = jax.lax.dot_general(
        scaled.astype(k_ref.dtype), k_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc = jnp.sum(per, axis=0)                           # (w, dim)
    out = rsig[:, None] * acc - (mu * rsig)[:, None] * v2_ref[0].astype(jnp.float32)[None, :]
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pt", "p1", "p2", "eps", "out_dtype"))
def patchify_project(
    volume: jax.Array,          # (T, H, W) single volume
    g: jax.Array,               # (patch_dim,) LN scale
    kernel: jax.Array,          # (patch_dim, dim) projection
    pt: int, p1: int, p2: int,
    eps: float = 1e-5,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """-> (t, h, w, dim) patch embeddings (pre-bias, pre-out-LN)."""
    T, H, W = volume.shape
    t, h, w = T // pt, H // p1, W // p2
    dim = kernel.shape[1]
    a = pt * p1
    # free views (no data movement): slab (t, pt, h, p1, w, p2) -> blocks are
    # (a, w, p2) per (t, h); kernel laid out (a, p2, dim) to match the
    # reference Dense feature order (c pt p1 p2)
    xv = volume.reshape(t, pt, h, p1, w, p2)
    gk = g.reshape(a, p2)
    kv = kernel.reshape(a, p2, dim).astype(out_dtype)
    v2 = jnp.einsum("ap,apd->d", gk, kernel.reshape(a, p2, dim),
                    preferred_element_type=jnp.float32)[None, :]
    kern = functools.partial(_kernel, pt=pt, p1=p1, p2=p2, eps=eps)

    def xmap(i, j):
        return (i, 0, j, 0, 0, 0)

    out = pl.pallas_call(
        kern,
        grid=(t, h),
        in_specs=[
            pl.BlockSpec((None, pt, None, p1, w, p2), xmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, w, dim), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, h, w, dim), out_dtype),
    )(xv, gk, kv, v2)
    return out
