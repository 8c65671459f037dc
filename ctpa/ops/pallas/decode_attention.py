"""Fused single-token decode attention over the stacked KV cache.

Reference decode re-runs the full prefix per token with torch MHA
(model_components.py:232-269); the XLA path here already uses a KV cache,
but its dense einsum formulation has three costs this kernel removes:

  * the cache slice is converted/laid out for the dot (a second pass over
    the K/V bytes — at 7B b32 the cache read IS the attention cost);
  * int8 KV (LLMConfig.kv_quant) needs the scale folds fused, not a
    dequantized copy;
  * QK, mask, softmax and PV are four XLA ops with (b, h, n, m)
    intermediates in HBM.

One pallas launch per layer reads each K/V byte exactly once (int8 or
float), computes per-head QK -> masked softmax -> PV entirely in VMEM, and
writes the (b, h, hd) output.  Grid is (batch, kv-head blocks); GQA
repeats kv heads in-kernel (index j // rep), never materializing the
repeated cache.  All arithmetic is f32 in VMEM; the only HBM traffic is
the compulsory cache read plus O(b·h·hd) in/out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, valid_ref, ks_ref, vs_ref, o_ref, *,
            rep: int, kb: int, scale: float, quant: bool):
    """One (batch row, kv-head block) step: loop q heads with a fori so
    only one head's (m, hd) temporaries are live at a time (an unrolled
    python loop keeps every iteration's temporaries live -> VMEM OOM)."""
    m = k_ref.shape[2]

    valid = valid_ref[0, :].reshape(m, 1)                    # (m, 1) bool

    def head(j, _):
        jj = j // rep                                        # kv head in block
        qj = q_ref[0, pl.ds(j, 1), :].astype(jnp.float32)    # (1, hd)
        kj = k_ref[0, 0, :, pl.ds(jj, 1), :].reshape(m, -1)  # (m, hd)
        s = jnp.sum(kj.astype(jnp.float32) * qj, axis=-1,
                    keepdims=True)                           # (m, 1)
        if quant:
            s = s * ks_ref[0, 0, :, pl.ds(jj, 1)].astype(jnp.float32)
        s = s * scale
        s = jnp.where(valid, s, -1e30)
        mx = jnp.max(s)
        e = jnp.exp(s - mx)
        e = jnp.where(valid, e, 0.0)
        den = jnp.maximum(jnp.sum(e), 1e-30)
        a = e / den                                          # (m, 1)
        if quant:
            a = a * vs_ref[0, 0, :, pl.ds(jj, 1)].astype(jnp.float32)
        vj = v_ref[0, 0, :, pl.ds(jj, 1), :].reshape(m, -1)  # (m, hd)
        o = jnp.sum(a * vj.astype(jnp.float32), axis=0, keepdims=True)
        o_ref[0, pl.ds(j, 1), :] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rep * kb, head, 0)


@functools.partial(jax.jit,
                   static_argnames=("layer_idx", "scale", "interpret"))
def decode_attention(
    q: jax.Array,                 # (b, h, hd)
    ck: jax.Array,                # (L, b, m, kvh, hd) int8 | bf16 | f32
    cv: jax.Array,
    valid: jax.Array,             # (b, m) bool — slots holding real tokens
    layer_idx: int,
    k_scale: jax.Array | None = None,   # (L, b, m, kvh) f32 (int8 cache)
    v_scale: jax.Array | None = None,
    scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Single-token cached attention for layer `layer_idx`; returns
    (b, h, hd) in q.dtype.  Reads only this layer's cache planes (the
    BlockSpec index pins the layer), so passing the full stacked cache
    costs nothing extra."""
    b, h, hd = q.shape
    L, _, m, kvh, _ = ck.shape
    assert h % kvh == 0, (h, kvh)
    rep = h // kvh
    quant = k_scale is not None

    # kv-head block: whole kvh if the K+V blocks fit VMEM double-buffered,
    # else split (kvh is a power of two for every llama geometry)
    bytes_per_head = m * hd * ck.dtype.itemsize
    kb = kvh
    while kb > 1 and 2 * kb * bytes_per_head > 6 * 1024 * 1024:
        kb //= 2
    grid = (b, kvh // kb)

    specs = [
        pl.BlockSpec((1, rep * kb, hd), lambda bi, ki: (bi, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m, kb, hd),
                     lambda bi, ki: (layer_idx, bi, 0, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m, kb, hd),
                     lambda bi, ki: (layer_idx, bi, 0, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m), lambda bi, ki: (bi, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, ck, cv, valid]
    if quant:
        specs += [
            pl.BlockSpec((1, 1, m, kb),
                         lambda bi, ki: (layer_idx, bi, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m, kb),
                         lambda bi, ki: (layer_idx, bi, 0, ki),
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
    else:
        # tiny stand-ins keep the kernel signature fixed (never read)
        specs += [pl.BlockSpec((1, 1), lambda bi, ki: (0, 0),
                               memory_space=pltpu.VMEM)] * 2
        args += [jnp.zeros((1, 1), jnp.float32)] * 2

    return pl.pallas_call(
        functools.partial(_kernel, rep=rep, kb=kb, scale=float(scale),
                          quant=quant),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((1, rep * kb, hd), lambda bi, ki: (bi, ki, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*args)
