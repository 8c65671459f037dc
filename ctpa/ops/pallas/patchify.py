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


def _rows_kernel(x_ref, kg_ref, v2_ref, o_ref, st_ref, *,
                 pt: int, p1: int, p2: int, hb: int, eps: float):
    """'rows' formulation: the LN scale g is folded into the projection
    weights HOST-side (kg = g*K, so out = rsig*(x . kg) - (mu*rsig)*v2) —
    the dots read the RAW bf16 slab, no scaled staging pass, no per-element
    VPU multiply.  Each dot covers ALL hb h-rows (M = hb*w rows per issue,
    vs w=24 in 'chunked'), batched over p1 per pt slice: 10 dot ops of
    batch 20 instead of 8 of batch 25, with 4x the rows per issue."""
    a = pt * p1
    pd = a * p2
    w_ = x_ref.shape[-2]
    v2 = v2_ref[0].astype(jnp.float32)[None, :]           # (1, dim)

    def stats(j, carry):
        x = x_ref[:, pl.ds(j, 1)][:, 0]                   # (pt, p1, w, p2)
        x = x.astype(jnp.float32).reshape(a, w_, p2)
        mu = jnp.sum(x, axis=(0, 2)) / pd                 # (w,)
        m2 = jnp.sum(jnp.square(x), axis=(0, 2)) / pd
        rsig = jax.lax.rsqrt(m2 - jnp.square(mu) + eps)
        st_ref[0, pl.ds(j, 1)] = rsig[None]
        st_ref[1, pl.ds(j, 1)] = (mu * rsig)[None]
        return carry

    jax.lax.fori_loop(0, hb, stats, 0)

    # Mosaic requires matching (leading) batch dims on both operands, so the
    # slab is transposed once per step to put the p1 batch first (a pure
    # sublane shuffle — the p2 lane dim stays minor); kg arrives host-side
    # pre-transposed as (p1, pt, p2, dim).
    xt = jnp.transpose(x_ref[:], (2, 0, 1, 3, 4))         # (p1, pt, hb, w, p2)
    acc = None
    for i in range(pt):
        per = jax.lax.dot_general(
            xt[:, i],                                     # (p1, hb, w, p2)
            kg_ref[:, i],                                 # (p1, p2, dim)
            dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                 # (p1, hb, w, dim)
        part = jnp.sum(per, axis=0)                       # (hb, w, dim)
        acc = part if acc is None else acc + part
    rsig = st_ref[0][:, :, None]                          # (hb, w, 1)
    musig = st_ref[1][:, :, None]
    o_ref[:] = (rsig * acc - musig * v2[None]).astype(o_ref.dtype)


def _kernel(x_ref, g_ref, k_ref, v2_ref, o_ref, *, pt: int, p1: int, p2: int,
            hb: int, eps: float, impl: str = "chunked"):
    """x_ref: (pt, hb, p1, w, p2) slab — or (1, hb, pt, p1, w, p2) for
    impl='linear' (contiguous-HBM layout); g_ref: (pt*p1, p2) LN scale;
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
      * 'rows'    — round-3: ONE chunked dot pass for ALL hb h-rows of the
                    slab (M = hb*w rows instead of w=24), after staging the
                    LN-scaled slab in a bf16 scratch.  Same dot-issue count
                    as 'chunked' but each issue carries hb x the rows —
                    at w=24 the per-dot M occupancy rises from 24/128 to
                    (hb*24)/128, amortizing the MXU issue overhead that
                    dominates this kernel (each batch element of a batched
                    dot is its own MXU macro-op at K=20).
      * 'linear'  — round-3 DMA-floor attack (the measured binder is the
                    strided slab gather, 47 GB/s effective): the volume is
                    pre-transposed by XLA to (t, h, pt, p1, w, p2) — a
                    pt<->h block swap moving 38 KB contiguous runs at
                    near-bandwidth — so each grid step's slab is ONE
                    contiguous HBM region.  Kernel math is 'chunked' on the
                    reordered slab.
    """
    g = g_ref[:].astype(jnp.float32)[:, None, :]         # (a, 1, p2)
    kv = k_ref[:]
    v2 = v2_ref[0].astype(jnp.float32)[None, :]
    pd = pt * p1 * p2
    w_ = x_ref.shape[-2]

    # fori_loop (not unrolled): per-row temporaries stay single-instance
    def body(j, carry):
        if impl == "linear":
            x = x_ref[0, pl.ds(j, 1)][0]                 # (pt, p1, w, p2)
        else:
            x = x_ref[:, pl.ds(j, 1)][:, 0]              # (pt, p1, w, p2)
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
             itemsize: int, budget: int = (16 << 20) - (7 << 20)) -> int:
    """Largest divisor of h fitting VMEM: the slab's p2-minor lane dim pads
    to 128, so the double-buffered input block costs
    2 * hb * pt*p1*w*128*itemsize bytes; leave ~7 MB for the fp32 row copy,
    the scaled operand and the chunked dot intermediate.  bf16 volumes (the
    full-scale model path) fit 2-4 rows per step; fp32 stays at 1.  'rows'
    passes a larger budget (no scaled staging, smaller dot intermediate)."""
    padded_row = pt * p1 * w * 128 * itemsize
    cap = max(1, budget // max(2 * padded_row, 1))
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
    # free views (no data movement): slab (t, pt, h, p1, w, p2) -> blocks are
    # (pt, hb, p1, w, p2) per (t, h-block); kernel laid out (a, p2, dim) to
    # match the reference Dense feature order (c pt p1 p2)
    xv = volume.reshape(t, pt, h, p1, w, p2)
    gk = g.reshape(a, p2)
    v2 = jnp.einsum("ap,apd->d", gk, kernel.reshape(a, p2, dim),
                    preferred_element_type=jnp.float32)[None, :]

    def xmap(i, j):
        return (i, 0, j, 0, 0, 0)

    if impl == "rows":
        # g folded into the weights host-side; raw slab feeds the MXU
        hb = _pick_hb(h, pt, p1, w, p2, volume.dtype.itemsize,
                      budget=(16 << 20) - (6 << 20))
        kg = (gk[:, :, None] * kernel.reshape(a, p2, dim)).astype(
            out_dtype).reshape(pt, p1, p2, dim).transpose(1, 0, 2, 3)
        kern = functools.partial(_rows_kernel, pt=pt, p1=p1, p2=p2, hb=hb,
                                 eps=eps)
        return pl.pallas_call(
            kern,
            grid=(t, h // hb),
            in_specs=[
                pl.BlockSpec((None, pt, hb, p1, w, p2), xmap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, hb, w, dim),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, h, w, dim), out_dtype),
            scratch_shapes=[pltpu.VMEM((2, hb, w), jnp.float32)],
        )(xv, kg, v2)

    hb = _pick_hb(h, pt, p1, w, p2, volume.dtype.itemsize)
    kv = kernel.reshape(a, p2, dim).astype(out_dtype)
    kern = functools.partial(_kernel, pt=pt, p1=p1, p2=p2, hb=hb, eps=eps,
                             impl=impl)

    if impl == "linear":
        # pt<->h block transpose: XLA moves (p1*w*p2)-element contiguous runs
        # (38 KB at shipped scale) at near-bandwidth; every kernel slab is
        # then ONE contiguous HBM region instead of pt*hb*p1 strided rows.
        xt = jnp.transpose(xv, (0, 2, 1, 3, 4, 5))    # (t, h, pt, p1, w, p2)
        return pl.pallas_call(
            kern,
            grid=(t, h // hb),
            in_specs=[
                pl.BlockSpec((1, hb, pt, p1, w, p2),
                             lambda i, j: (i, j, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, hb, w, dim),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, h, w, dim), out_dtype),
        )(xt, gk, kv, v2)

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
