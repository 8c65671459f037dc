"""Pallas TPU flash attention — blockwise online-softmax attention.

Purpose in this framework (SURVEY.md §5.7): the reference's only long-context
strategy is axial factorization (576-token spatial / 24-token temporal blocks,
ctvit.py:306-331).  This kernel adds the TPU-native alternative: exact
attention over the FUSED 13,824-token volumetric sequence (and LLM prefill at
long context) in O(n) memory, tiled for the MXU with the softmax running
statistics kept in VMEM scratch.

Design (per pallas_guide.md):
  * grid = (batch*heads, q_blocks); the kv loop is a fori_loop inside the
    kernel so HBM->VMEM streaming of K/V tiles overlaps compute.
  * q tile (Bq, d) stays resident; each kv step computes s = q k^T on the MXU,
    applies the optional additive bias and causal mask, updates (m, l, acc)
    online, all in fp32 scratch; final out = acc / l cast back to in dtype.
  * block sizes default to (128, 128) lanes-aligned tiles; d padded to 128.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, kv_len: int,
                 block_k: int, scale: float, causal: bool, q_block: int,
                 has_bias: bool):
    # q_ref: (Bq, d); k_ref/v_ref: (kv_len, d); bias_ref: (Bq, kv_len) or None
    qi = pl.program_id(1)
    q = q_ref[:].astype(jnp.float32) * scale
    bq, d = q.shape
    num_kv = kv_len // block_k

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                    # (Bq, block_k)
        if has_bias:
            s = s + bias_ref[:, pl.ds(ki * block_k, block_k)].astype(jnp.float32)
        if causal:
            q_pos = qi * q_block + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0)
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    if causal:
        # kv blocks beyond this q block's diagonal contribute nothing
        last = jnp.minimum(num_kv, (qi + 1) * q_block // block_k + 1)
    else:
        last = num_kv
    m, l, acc = jax.lax.fori_loop(0, last, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, pad)
    return jnp.pad(x, pads)


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "scale"))
def flash_attention(
    q: jax.Array,                    # (b, h, n, d)
    k: jax.Array,                    # (b, h, m, d)
    v: jax.Array,                    # (b, h, m, d)
    bias: Optional[jax.Array] = None,  # (h, n, m) or (1, n, m) additive
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    scale: Optional[float] = None,
) -> jax.Array:
    b, h, n, d = q.shape
    m = k.shape[2]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    d_pad = max(128, ((d + 127) // 128) * 128)
    n_pad = ((n + block_q - 1) // block_q) * block_q
    m_pad = ((m + block_k - 1) // block_k) * block_k

    qf = _pad_to(_pad_to(q, n_pad, 2), d_pad, 3).reshape(b * h, n_pad, d_pad)
    kf = _pad_to(_pad_to(k, m_pad, 2), d_pad, 3).reshape(b * h, m_pad, d_pad)
    vf = _pad_to(_pad_to(v, m_pad, 2), d_pad, 3).reshape(b * h, m_pad, d_pad)

    has_bias = bias is not None
    if has_bias:
        if bias.ndim == 3:
            bias = jnp.broadcast_to(bias[None], (b, *bias.shape[-3:])) \
                if bias.shape[0] in (1, h) else bias[None]
        bias = jnp.broadcast_to(bias, (b, h, n, m)).reshape(b * h, n, m)
        # pad kv axis with NEG_INF so padded keys never win the softmax,
        # q-axis padding value is irrelevant (those rows are dropped)
        bias = jnp.pad(bias, ((0, 0), (0, n_pad - n), (0, m_pad - m)),
                       constant_values=(0.0,))
        if m_pad > m:
            neg = jnp.full((b * h, n_pad, m_pad - m), NEG_INF, bias.dtype)
            bias = jnp.concatenate([bias[..., :m], neg], axis=-1)
    elif m_pad > m:
        # no user bias but padded keys exist: synthesize a mask-bias
        has_bias = True
        bias = jnp.concatenate([
            jnp.zeros((b * h, n_pad, m), jnp.float32),
            jnp.full((b * h, n_pad, m_pad - m), NEG_INF, jnp.float32),
        ], axis=-1)

    kernel = functools.partial(
        _attn_kernel, kv_len=m_pad, block_k=block_k, scale=scale,
        causal=causal, q_block=block_q, has_bias=has_bias)

    in_specs = [
        pl.BlockSpec((None, block_q, d_pad), lambda g, i: (g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, m_pad, d_pad), lambda g, i: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, m_pad, d_pad), lambda g, i: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf]
    if has_bias:
        in_specs.append(pl.BlockSpec((None, block_q, m_pad),
                                     lambda g, i: (g, i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias)
    else:
        kernel = functools.partial(_attn_kernel, kv_len=m_pad, block_k=block_k,
                                   scale=scale, causal=causal, q_block=block_q,
                                   has_bias=False)

    def kernel_entry(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
            kernel(q_ref, k_ref, v_ref, b_ref, o_ref)
        else:
            q_ref, k_ref, v_ref, o_ref = refs
            kernel(q_ref, k_ref, v_ref, None, o_ref)

    out = pl.pallas_call(
        kernel_entry,
        grid=(b * h, n_pad // block_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, block_q, d_pad), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
    )(*operands)
    return out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]
