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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, valid_ref, ks_ref, vs_ref, o_ref, *,
            rep: int, kb: int, hd: int, scale: float, quant: bool):
    """One (batch row, kv-head block) step.  Shapes inside the kernel:
    q_ref (1, rep*kb, 1, hd); k_ref/v_ref (1, 1, kb, m, hd) — the cache's
    native head-major layout; valid_ref (1, 1, m); ks_ref/vs_ref (1, 1, kb, m)
    (quant only).

    Per head: one f32 MXU dot for QK (1, m), lane-wise masked softmax, one
    f32 MXU dot for PV (1, hd).  All slices static.  Temporaries are
    (1, m)/(m, hd) per head and die at the next iteration — the unroll
    count is kb*rep <= 32."""
    m = k_ref.shape[3]
    valid = valid_ref[0, 0, :].reshape(1, m)

    for jj in range(kb):
        kj = k_ref[0, 0, jj, :, :].astype(jnp.float32)  # (m, hd)
        vj = v_ref[0, 0, jj, :, :].astype(jnp.float32)
        if quant:
            ksj = ks_ref[0, 0, jj, :].astype(jnp.float32).reshape(1, m)
            vsj = vs_ref[0, 0, jj, :].astype(jnp.float32).reshape(1, m)
        for r in range(rep):
            h_idx = jj * rep + r
            qj = q_ref[0, h_idx, 0, :].reshape(1, hd).astype(jnp.float32)
            s = jax.lax.dot_general(                    # (1, m)
                qj, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if quant:
                s = s * ksj
            s = s * scale
            s = jnp.where(valid, s, -1e30)
            mx = jnp.max(s)
            e = jnp.exp(s - mx)
            e = jnp.where(valid, e, 0.0)
            den = jnp.maximum(jnp.sum(e), 1e-30)
            a = e / den                                 # (1, m)
            if quant:
                a = a * vsj
            o = jax.lax.dot_general(                    # (1, hd)
                a, vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, h_idx] = o.astype(o_ref.dtype)


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

    # kv-head block: whole kvh if the K+V blocks fit VMEM double-buffered,
    # else split (kvh is a power of two for every llama geometry).  A split
    # block's (kb, m) scale block needs kb to be a multiple of the f32
    # sublane (8) — or full.
    bytes_per_head = m * hd * ck.dtype.itemsize
    kb = kvh
    while kb > 1 and 4 * kb * bytes_per_head > 10 * 1024 * 1024:
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
                          scale=float(scale), quant=quant),
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
