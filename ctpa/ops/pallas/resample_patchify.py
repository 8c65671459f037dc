"""Fused resample-stage-3 + HU-window + pad + LayerNorm + patch projection.

The round-2/3 patchify kernel (`ops/pallas/patchify.py`) is pinned at a
2.3 ms/volume DMA floor: the patch gather reads the resampled volume in
(..., p2=20)-minor granules, so HBM moves at ~47 GB/s effective (strided
descriptors, docs/benchmarks.md roofline).  The producer-side fix
(ROUND3_NOTES "the roofline conclusion stands"): never materialize the
(D, H, W) volume at all.  The trilinear resample is three separable
interp-matrix contractions (ops/preprocess.py); this kernel CONSUMES the
stage-1/2 intermediate x2 = (D, H, ws) — whose (t, h-block) slabs are
CONTIGUOUS HBM rows — and performs, per h-row, entirely in VMEM:

  1. stage-3 resample:  yT (W= w*p2, a= pt*p1) = wwp (W, ws) . x_row (a, ws)
     — ONE MXU dot; the patch layout is born transposed (patch-position W
     on sublanes, patch-feature a on lanes) and never touches HBM;
  2. HU window (clip/shift/scale) + crop-pad masking (vd & vh & vw ->
     pad_value) on the (W, a) tile;
  3. per-patch LayerNorm statistics via 0/1 GROUPING dots (gt (w, W)):
     mu/m2 come off the MXU instead of 6.4x-lane-padded VPU passes;
  4. the LN-scale-folded projection as p2-batched (w, a) x (a, dim) dots
     (feature order (p2, pt, p1) — LayerNorm is permutation-invariant over
     features, so the projection weights are permuted host-side to match;
     out = rsig * (y . gK) - mu*rsig * v2, the patchify 'rows' identity).

Output tokens are PRE-BIAS, like patchify_project: the caller adds
(norm_in_bias @ kernel + proj_bias) and the out-LayerNorm.

Parity: reference ct_clip/ctvit.py:169-174 (patch embed) composed with the
reference resample (preprocess_train.py:31-42 / data.py:129-190) — tested
against the unfused preprocess_volume + PatchEmbed3D composition.

dtype policy: the stage-3 dot runs in x2.dtype.  bf16 x2 matches the
shipped path's numerics class: the unfused pipeline casts the resampled
volume to bf16 before patch-embed anyway (models/ctvit.py PatchEmbed3D),
so rounding HU values to bf16 before stage-3 instead of after it changes
results by the same ~2^-8 relative magnitude.  Pass f32 x2 for the strict
f32 path (4x MXU cost on stage-3 only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x2_ref, ww_ref, vda_ref, vwp_ref, gt_ref, kg_ref, v2_ref, o_ref,
            *, pt: int, p1: int, p2: int, w: int, hb: int, eps: float,
            window: tuple | None, pad_value: float, dot_dtype):
    """One (t-block, h-block) grid step.

    x2_ref (pt, hb*p1, ws); ww_ref (W, ws); vda_ref (1, hb, a) bool;
    vwp_ref (W, 1) bool; gt_ref (w, W) f32 grouping; kg_ref (p2, a, dim)
    g-folded projection in (p2, pt, p1) feature order; v2_ref (1, dim) f32;
    o_ref (1, hb, w, dim).
    """
    a = pt * p1
    ws = x2_ref.shape[-1]
    pd = a * p2
    v2 = v2_ref[0].astype(jnp.float32)[None, :]            # (1, dim)
    ww = ww_ref[:]
    gt = gt_ref[:]

    def body(j, carry):
        xr = x2_ref[:, pl.ds(j * p1, p1), :]               # (pt, p1, ws)
        xr = xr.reshape(a, ws)
        y = jax.lax.dot_general(ww, xr, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (W, a)
        if window is not None:
            lo, hi, shift, scale = window
            y = (jnp.clip(y, lo, hi) + shift) / scale
        va = vda_ref[0, pl.ds(j, 1)]                       # (1, a) bool
        y = jnp.where(vwp_ref[:] & va, y, pad_value)
        # per-patch LN statistics via grouping dots (w rows, a lanes)
        s1 = jax.lax.dot_general(gt, y, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(gt, y * y, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        mu = jnp.sum(s1, axis=-1, keepdims=True) / pd      # (w, 1)
        m2 = jnp.sum(s2, axis=-1, keepdims=True) / pd
        rsig = jax.lax.rsqrt(m2 - mu * mu + eps)
        # projection: p2-batched dots on the (w, p2, a) sublane-split view
        y3 = y.reshape(w, p2, a).astype(dot_dtype)
        acc = None
        for q in range(p2):
            part = jax.lax.dot_general(y3[:, q, :], kg_ref[q],
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part      # (w, dim)
        out = rsig * acc - (mu * rsig) * v2
        o_ref[0, pl.ds(j, 1)] = out[None].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, hb, body, 0)


def _pick_hb(h: int, pt: int, p1: int, ws: int, itemsize: int,
             fixed_bytes: int, budget: int = 12 << 20) -> int:
    """Largest divisor of h whose double-buffered x2 block + fixed-resident
    operands fit the VMEM budget."""
    per_row = pt * p1 * ws * itemsize
    best = 1
    for c in range(1, h + 1):
        if h % c == 0 and 2 * c * per_row + fixed_bytes <= budget:
            best = c
    return best


@functools.partial(jax.jit, static_argnames=(
    "pt", "p1", "p2", "eps", "window", "pad_value", "out_dtype", "interpret"))
def resample3_patchify_project(
    x2: jax.Array,          # (D, H, ws) stage-1/2 resampled volume
    wwp: jax.Array,         # (W, ws) stage-3 interp matrix (crop/pad folded)
    vd: jax.Array,          # (D,) bool valid rows (depth)
    vh: jax.Array,          # (H,) bool valid rows (height)
    vw: jax.Array,          # (W,) bool valid rows (width)
    g: jax.Array,           # (patch_dim,) LN scale, feature order (pt, p1, p2)
    kernel: jax.Array,      # (patch_dim, dim) projection, same feature order
    pt: int, p1: int, p2: int,
    eps: float = 1e-5,
    window: tuple | None = None,     # (hu_lo, hu_hi, shift, scale) or None
    pad_value: float = -1.0,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """-> (t, h, w, dim) patch embeddings (pre-bias, pre-out-LN)."""
    D, H, ws = x2.shape
    W = wwp.shape[0]
    t, h, w = D // pt, H // p1, W // p2
    a = pt * p1
    dim = kernel.shape[1]

    # g-folded projection in (p2, (pt, p1)) feature order + the LN-mean
    # correction vector (sum of g-folded rows) — patchify 'rows' identity
    k3 = g.reshape(a, p2)[:, :, None] * kernel.reshape(a, p2, dim)
    kg = jnp.transpose(k3, (1, 0, 2)).astype(x2.dtype)     # (p2, a, dim)
    v2 = jnp.sum(k3, axis=(0, 1), dtype=jnp.float32)[None, :]
    gt = (jnp.arange(W)[None, :] // p2
          == jnp.arange(w)[:, None]).astype(jnp.float32)   # (w, W)
    vda = (vd.reshape(t, pt, 1, 1) & vh.reshape(1, 1, h, p1)
           ).transpose(0, 2, 1, 3).reshape(t, h, a)
    vwp = vw.reshape(W, 1)

    fixed = (W * ws * wwp.dtype.itemsize          # wwp
             + p2 * a * dim * kg.dtype.itemsize   # kg
             + w * W * 4                           # gt
             + 4 * W * max(256, a) * 4)            # y/y2/s f32 temps (padded)
    hb = _pick_hb(h, pt, p1, ws, x2.dtype.itemsize, fixed)

    dot_dtype = jnp.float32 if x2.dtype == jnp.float32 else jnp.bfloat16
    kern = functools.partial(
        _kernel, pt=pt, p1=p1, p2=p2, w=w, hb=hb, eps=eps,
        window=window, pad_value=float(pad_value), dot_dtype=dot_dtype)

    return pl.pallas_call(
        kern,
        grid=(t, h // hb),
        in_specs=[
            pl.BlockSpec((pt, hb * p1, ws), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, a), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, w, dim), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, h, w, dim), out_dtype),
        interpret=interpret,
    )(x2, wwp, vda, vwp, gt, kg, v2)
