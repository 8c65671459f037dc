"""Fused single-token decode attention over the stacked KV cache.

Reference decode re-runs the full prefix per token with torch MHA
(model_components.py:232-269); the XLA path here already uses a KV cache,
but its dense einsum formulation has three costs this kernel removes:

  * the cache slice is converted for the dot (a second pass over the K/V
    bytes — at 7B b32 the cache read IS the attention cost);
  * int8 KV (LLMConfig.kv_quant) needs the scale folds fused, not a
    dequantized copy;
  * QK, mask, softmax and PV are four XLA ops with (b, h, n, m)
    intermediates in HBM.

One pallas launch per layer reads each K/V byte exactly once (int8 or
float), computes per-head QK -> masked softmax -> PV entirely in VMEM, and
writes the (b, h, hd) output.  Grid is (batch, kv-head blocks); GQA
repeats kv heads in-kernel, never materializing the repeated cache.

Hard-won lowering/performance notes (all measured on chip at 7B b32):

  * The cache MUST be passed in its NATIVE head-major (L, b, kvh, m, hd)
    shape with a 5-D BlockSpec.  A host-side `reshape` of the stacked
    cache (e.g. merging kvh*hd) forces XLA to relayout-copy the ENTIRE
    cache as a program operand — per layer, per step, because each layer's
    write invalidates CSE.  Measured: ~4.5 ms/layer of pure copy at 7B b32
    int8 (the first on-chip run was 12x slower than the XLA einsum path
    purely from this).  In-kernel, a head is a STATIC index on the kvh
    dim — Mosaic only rejects *dynamic* unaligned slices.
  * Per-head (1, m)/(m, hd) dots are fine: an A/B of per-head dots vs
    block-diagonal 8-head groups (one (rows, gb*hd) x (m, gb*hd) dot)
    moved the step time by <7% — MXU macro-op issue latency is NOT the
    binder at this geometry; the cache DMA is.
  * With the head-major cache the int8 K/V scale row for a head is a
    direct static slice of the (kb, m) scale block (the token-major layout
    needed a one-hot contraction to select the head's scale column).
  * q/out ride a (b, h, 1, hd) view so the block's last two dims (1, hd)
    equal the array dims (Mosaic requires the last two block dims be
    (sublane, 128)-divisible or full); the kv-head block split keeps the
    scale block's second-to-last dim (kb) a multiple of the f32 sublane.

STATUS: ships OFF by default (LLMConfig.flash_decode=False).  With the
head-major cache layout the XLA einsum path reads the cache copy-free and
on-chip A/Bs showed the kernel's serial grid walk LOSES to XLA's fused
convert+dot pipeline at every geometry tried (docs/benchmarks.md,
"Fused decode-attention kernel: negative result").  Kept as a correct,
tested capability for future Mosaic revisions.

Round-3 session-2 rework + WHY the gap cannot close (measured, chip,
standalone 32-layer chained attention, int8 KV):

  geometry          per-head kernel   head-grouped kernel (this file)
  b16 m608 h32         14.2 ms/step      10.35 ms/step
  b32 m128 h32         13.3 ms/step       8.68 ms/step

Fitting both geometries: per-grid-step fixed cost ~3.5 us plus ~45 ns per
MXU TILE-PASS.  Decode attention is M=1 matmul: every (1,128)x(128,128)
tile-pass costs the systolic fill latency regardless of having one valid
row, so the floor at b16xm608xh32 is b*h*(2*m/128) = 5120 tile-passes/layer
~ 7.4 ms/step — and the in-program XLA einsum path already runs ~8.3
ms/step (90% of that floor).  Neither bytes (int8 KV) nor dtype (int8 MXU
dots) move this; only M>1 queries per step do, which is exactly what
speculative decoding provides (CTReportGenerator.generate_speculative).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, valid_ref, ks_ref, vs_ref, o_ref, *,
            rep: int, kb: int, hd: int, scale: float, quant: bool,
            dot_dtype):
    """One (batch row, kv-head block) step.  Shapes inside the kernel:
    q_ref (1, rep*kb, 1, hd); k_ref/v_ref (1, 1, kb, m, hd) — the cache's
    native head-major layout; valid_ref (1, 1, m); ks_ref/vs_ref (1, 1, kb, m)
    (quant only).

    Heads are processed in GROUPS of g<=8: one batched MXU dot for QK
    ((g, rep, m)), one full-tile vectorized softmax over (g*rep, m) — g*rep
    sublanes busy instead of 1 — and one batched dot for PV.  The round-3
    per-head formulation (32 unrolled convert->dot->scalar-softmax->dot
    chains per grid step) measured 14.2 ms/step at b16xm608x32L int8; this
    one measures 10.35 ms/step (docs/ROUND3_NOTES.md, decode-attention
    rework).  Softmax reductions run on 2-D (g*rep, m) shapes — Mosaic
    rejects last-axis multi_reduction on 3-D (g, rep, m) vectors."""
    m = k_ref.shape[3]
    valid2 = valid_ref[0, 0, :].reshape(1, m)
    g = min(8, kb)

    for j0 in range(0, kb, g):
        kg = k_ref[0, 0, j0:j0 + g].astype(dot_dtype)          # (g, m, hd)
        vg = v_ref[0, 0, j0:j0 + g].astype(dot_dtype)
        qg = q_ref[0, j0 * rep:(j0 + g) * rep, 0, :]            # (g*rep, hd)
        qg = qg.reshape(g, rep, hd).astype(dot_dtype)
        s = jax.lax.dot_general(qg, kg, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)  # (g,rep,m)
        if quant:
            ksg = ks_ref[0, 0, j0:j0 + g].astype(jnp.float32)   # (g, m)
            s = s * ksg[:, None, :]
        s2 = s.reshape(g * rep, m) * scale
        s2 = jnp.where(valid2, s2, -1e30)
        mx = jnp.max(s2, axis=-1, keepdims=True)
        e = jnp.exp(s2 - mx)
        e = jnp.where(valid2, e, 0.0)
        den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        a = (e / den).reshape(g, rep, m)
        if quant:
            vsg = vs_ref[0, 0, j0:j0 + g].astype(jnp.float32)
            a = a * vsg[:, None, :]
        o = jax.lax.dot_general(a.astype(dot_dtype), vg,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)  # (g,rep,hd)
        o_ref[0, j0 * rep:(j0 + g) * rep] = (
            o.reshape(g * rep, 1, hd).astype(o_ref.dtype))


@functools.partial(jax.jit,
                   static_argnames=("layer_idx", "scale", "interpret"))
def decode_attention(
    q: jax.Array,                 # (b, h, hd)
    ck: jax.Array,                # (L, b, kvh, m, hd) int8 | bf16 | f32
    cv: jax.Array,
    valid: jax.Array,             # (b, m) bool — slots holding real tokens
    layer_idx: int,
    k_scale: jax.Array | None = None,   # (L, b, kvh, m) f32 (int8 cache)
    v_scale: jax.Array | None = None,
    scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Single-token cached attention for layer `layer_idx`; returns
    (b, h, hd) in q.dtype.  Reads only this layer's cache planes (the
    BlockSpec index pins the layer), so passing the full stacked cache
    costs nothing extra — and never reshapes it (see module docstring)."""
    b, h, hd = q.shape
    L, _, kvh, m, _ = ck.shape
    assert h % kvh == 0, (h, kvh)
    rep = h // kvh
    quant = k_scale is not None

    # kv-head block: whole kvh if the K+V blocks PLUS their in-kernel
    # dot-dtype converts fit VMEM double-buffered, else split (kvh is a
    # power of two for every llama geometry).  A split block's (kb, m)
    # scale block needs kb to be a multiple of the f32 sublane (8) — or
    # full.  The convert temporaries live per 8-head GROUP (see _kernel),
    # so they cost 2 * min(8, kb) * m * hd * dot_itemsize.
    #
    # dot dtype: bf16 dots (2-4x MXU rate, exact for int8 cache VALUES)
    # only when the model itself runs bf16 (q arrives bf16); an f32 model
    # keeps f32 dots so the kernel matches the dense einsum path exactly.
    dot_dtype = (jnp.float32
                 if (q.dtype == jnp.float32 or ck.dtype == jnp.float32)
                 else jnp.bfloat16)
    dot_itemsize = jnp.dtype(dot_dtype).itemsize
    bytes_per_head = m * hd * ck.dtype.itemsize
    kb = kvh
    while kb > 1 and (4 * kb * bytes_per_head
                      + 2 * min(8, kb) * m * hd * dot_itemsize
                      ) > 12 * 1024 * 1024:
        kb //= 2
    if kb < kvh and kb % 8:
        kb = min(kvh, 8)
    grid = (b, kvh // kb)

    q4 = q.reshape(b, h, 1, hd)

    specs = [
        pl.BlockSpec((1, rep * kb, 1, hd), lambda bi, ki: (bi, ki, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kb, m, hd),
                     lambda bi, ki: (layer_idx, bi, ki, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kb, m, hd),
                     lambda bi, ki: (layer_idx, bi, ki, 0, 0),
                     memory_space=pltpu.VMEM),
        # (b, 1, m) so the block's last two dims (1, m) are full array dims
        pl.BlockSpec((1, 1, m), lambda bi, ki: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q4, ck, cv, valid.reshape(b, 1, m)]
    if quant:
        specs += [
            pl.BlockSpec((1, 1, kb, m),
                         lambda bi, ki: (layer_idx, bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kb, m),
                         lambda bi, ki: (layer_idx, bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
    else:
        # tiny stand-ins keep the kernel signature fixed (never read)
        specs += [pl.BlockSpec((1, 1), lambda bi, ki: (0, 0),
                               memory_space=pltpu.VMEM)] * 2
        args += [jnp.zeros((1, 1), jnp.float32)] * 2

    out = pl.pallas_call(
        functools.partial(_kernel, rep=rep, kb=kb, hd=hd,
                          scale=float(scale), quant=quant,
                          dot_dtype=dot_dtype),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((1, rep * kb, 1, hd),
                               lambda bi, ki: (bi, ki, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, hd)
