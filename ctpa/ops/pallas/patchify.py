"""Pallas fused patchify + LayerNorm + projection kernel.

The CTViT patch embed (b c (t pt) (h p1) (w p2) -> b t h w d with LN-Linear)
costs ~14 ms/volume at shipped scale when expressed as a 6D transpose: the
inner contiguous runs are only p2 elements (20 * 2B = 40 bytes), so HBM
bandwidth utilisation collapses.  This kernel never materialises the patch
layout in HBM: each grid step DMAs a (pt, hb, p1, W) multi-row slab into
VMEM, re-tiles it locally to (w_patches, patch_dim) per h-row, computes the
per-patch LayerNorm statistics in fp32, folds the LN scale, and feeds the
MXU with (w_patches, patch_dim) x (patch_dim, dim) matmuls.  The LN bias
term is a constant vector (kernel^T @ bias) added by the caller.

Round-2 note: the first version used grid (t, h) = 576 steps of one h-row
each; per-step sequencer overhead (~11 us) dominated at 6.4 ms/volume.
Processing hb h-rows per step (grid (t, h/hb)) amortises the overhead —
same math, ~8x fewer sequencer steps.  Slabs stay in the INPUT dtype: a bf16
cast would quantize the LayerNorm statistics (tested exact vs the XLA
LN-Linear composition).

Interface matches PatchEmbed3D's math exactly (tested against the reference
LN-Linear composition)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, g_ref, k_ref, v2_ref, o_ref, *, pt: int, p1: int, p2: int,
            hb: int, eps: float, impl: str = "chunked"):
    """x_ref: (pt, hb, p1, w, p2) slab; g_ref: (pt*p1, p2) LN scale;
    k_ref: (pt*p1, p2, dim) projection; v2_ref: (1, dim) = sum_ap g*K.

    LayerNorm is folded algebraically so no (w, patch_dim) layout is ever
    formed (Mosaic cannot reshape the lane dim):
      out[w] = rsig[w] * sum_ap (x ∘ g) K  -  (mu[w] * rsig[w]) * v2

    impl selects the contraction formulation (same math):
      * 'dot2'    — ONE dot_general contracting BOTH a = pt*p1 and p2
                    ((w, a*p2=4000) x (4000, dim) as far as the MXU is
                    concerned): smallest IR, no fp32 (a, w, dim) intermediate.
      * 'batched' — batched dot over a then sum: (a, w, dim) fp32
                    intermediate (~10 MB at shipped scale).
      * 'chunked' — round-2 formulation: python-unrolled a-chunks of 25 to
                    bound the intermediate (~1.2 MB); 8x the dot ops in IR.
    """
    g = g_ref[:].astype(jnp.float32)[:, None, :]         # (a, 1, p2)
    kv = k_ref[:]
    v2 = v2_ref[0].astype(jnp.float32)[None, :]
    pd = pt * p1 * p2
    w_ = x_ref.shape[-2]

    # fori_loop (not unrolled): per-row temporaries stay single-instance
    def body(j, carry):
        x = x_ref[:, pl.ds(j, 1)][:, 0]                  # (pt, p1, w, p2)
        x = x.astype(jnp.float32).reshape(pt * p1, w_, p2)  # (a, w, p2)
        mu = jnp.sum(x, axis=(0, 2)) / pd                # lane dim intact
        m2 = jnp.sum(jnp.square(x), axis=(0, 2)) / pd
        rsig = jax.lax.rsqrt(m2 - jnp.square(mu) + eps)  # (w,)
        scaled = x * g
        if impl == "dot2":
            acc = jax.lax.dot_general(
                scaled.astype(kv.dtype), kv,
                dimension_numbers=(((0, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # (w, dim)
        elif impl == "batched":
            per = jax.lax.dot_general(
                scaled.astype(kv.dtype), kv,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc = jnp.sum(per, axis=0)                   # (w, dim)
        else:  # 'chunked'
            CH = 25
            a_total = pt * p1
            acc = None
            for c0 in range(0, a_total, CH):
                per = jax.lax.dot_general(
                    scaled[c0:c0 + CH].astype(kv.dtype), kv[c0:c0 + CH],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                part = jnp.sum(per, axis=0)
                acc = part if acc is None else acc + part
        out = rsig[:, None] * acc - (mu * rsig)[:, None] * v2
        o_ref[pl.ds(j, 1)] = out[None].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, hb, body, 0)


def _pick_hb(h: int, pt: int, p1: int, w: int, p2: int,
             itemsize: int) -> int:
    """Largest divisor of h fitting VMEM: the slab's p2-minor lane dim pads
    to 128, so the double-buffered input block costs
    2 * hb * pt*p1*w*128*itemsize bytes; leave ~7 MB for the fp32 row copy,
    the scaled operand and the chunked dot intermediate.  bf16 volumes (the
    full-scale model path) fit 2-4 rows per step; fp32 stays at 1."""
    padded_row = pt * p1 * w * 128 * itemsize
    cap = max(1, ((16 << 20) - (7 << 20)) // max(2 * padded_row, 1))
    best = 1
    for c in range(1, h + 1):
        if h % c == 0 and c <= cap:
            best = c
    return best


@functools.partial(jax.jit, static_argnames=("pt", "p1", "p2", "eps",
                                             "out_dtype", "impl"))
def patchify_project(
    volume: jax.Array,          # (T, H, W) single volume
    g: jax.Array,               # (patch_dim,) LN scale
    kernel: jax.Array,          # (patch_dim, dim) projection
    pt: int, p1: int, p2: int,
    eps: float = 1e-5,
    out_dtype=jnp.bfloat16,
    impl: str = "chunked",
) -> jax.Array:
    """-> (t, h, w, dim) patch embeddings (pre-bias, pre-out-LN)."""
    T, H, W = volume.shape
    t, h, w = T // pt, H // p1, W // p2
    dim = kernel.shape[1]
    a = pt * p1
    hb = _pick_hb(h, pt, p1, w, p2, volume.dtype.itemsize)
    # free views (no data movement): slab (t, pt, h, p1, w, p2) -> blocks are
    # (pt, hb, p1, w, p2) per (t, h-block); kernel laid out (a, p2, dim) to
    # match the reference Dense feature order (c pt p1 p2)
    xv = volume.reshape(t, pt, h, p1, w, p2)
    gk = g.reshape(a, p2)
    kv = kernel.reshape(a, p2, dim).astype(out_dtype)
    v2 = jnp.einsum("ap,apd->d", gk, kernel.reshape(a, p2, dim),
                    preferred_element_type=jnp.float32)[None, :]
    kern = functools.partial(_kernel, pt=pt, p1=p1, p2=p2, hb=hb, eps=eps,
                             impl=impl)

    def xmap(i, j):
        return (i, 0, j, 0, 0, 0)

    out = pl.pallas_call(
        kern,
        grid=(t, h // hb),
        in_specs=[
            pl.BlockSpec((None, pt, hb, p1, w, p2), xmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, hb, w, dim), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, h, w, dim), out_dtype),
    )(xv, gk, kv, v2)
    return out
