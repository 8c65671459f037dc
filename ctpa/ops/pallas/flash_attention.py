"""Pallas TPU flash attention — blockwise online-softmax attention.

Purpose in this framework (SURVEY.md §5.7): the reference's only long-context
strategy is axial factorization (576-token spatial / 24-token temporal blocks,
ctvit.py:306-331).  This kernel adds the TPU-native alternative: exact
attention over the FUSED 13,824-token volumetric sequence (and LLM prefill at
long context) in O(n) memory, tiled for the MXU.

Design (per pallas_guide.md; round-2 rewrite):
  * grid = (batch*heads, q_blocks, kv_blocks) with kv innermost.  Making the
    kv walk a GRID dimension (instead of a fori_loop over a VMEM-resident
    K/V) lets the Pallas pipeline double-buffer the (block_k, d) K/V tile
    DMAs from HBM against compute — K/V never needs whole-sequence VMEM
    residency, so sequence length is HBM-bound, not VMEM-bound.
  * Softmax running statistics (m, l) and the output accumulator live in
    fp32 VMEM scratch carried across the kv grid steps; out is written on the
    last kv step.
  * Matmuls run in the INPUT dtype (bf16 on the hot path) with fp32
    accumulation (`preferred_element_type`) — the round-1 kernel upcast
    q/k/v to fp32 which runs the MXU at a fraction of its bf16 rate.
  * Additive bias is kept at its natural (heads, n, m) shape and indexed per
    grid step (head = g % heads); kv padding is masked IN KERNEL from the
    static true length — no materialized (b*h, n_pad, m_pad) bias tensor
    (round 1 built one: 764 MB for the fused sequence).

Differentiation: `flash_attention` carries a custom VJP.
  * No-bias path (the LLM `flash_prefill` training/prefill geometry): the
    backward is two more Pallas kernels in the standard flash-bwd form —
    probabilities are recomputed per tile from the saved per-row logsumexp
    (never materializing the (n, m) matrix), dK/dV accumulate over the q
    grid, dQ accumulates over the kv grid, delta = rowsum(dO*O) is computed
    in-tile from the saved output.
  * Bias path (CTViT fused attention with the learned CPB bias): the bias
    gradient is inherently dense — every (q, k) cell carries independent
    gradient — so the backward recomputes attention densely in XLA and also
    returns d(bias).  This matches what a dense-attention backward would
    allocate anyway; for TRAINING the full 13,824-token fused sequence the
    axial path remains the practical choice (the fused+bias forward is an
    inference capability, docs/benchmarks.md).

dim_head=32 geometry (round-3 analysis): the contraction pads 32 -> 128
lanes, but on a fixed-depth 128x128 systolic array that padding wastes FLOPs,
not TIME — a (n,32)x(32,m) tile costs the same cycles as (n,128)x(128,m), and
"head packing" 4 heads into the 128 lanes cannot help because a dense packed
contraction sums across heads (block-diagonal packing restores correctness
but also restores the padded FLOP count).  What actually dominates at d=32 is
the O(n^2) VPU softmax work: the online-softmax bookkeeping costs ~4
elementwise passes per (block_q, block_k) tile (scale, running max, exp,
row-sum).  Three round-3 optimizations cut that to ONE pass on the CTViT
cosine-attention path:
  * power-of-two `scale` is folded into q outside the kernel (exact — a pow2
    multiply is lossless in floating point; non-pow2 scales keep the
    in-kernel fp32 multiply for precision);
  * when d < d_pad, a 1.0 in spare lane d of V makes the PV matmul accumulate
    rowsum(p) in the accumulator's lane d — the softmax DENOMINATOR rides the
    MXU for free and the l scratch + VPU row-sum disappear;
  * `logit_bound`: cosine attention has provably bounded logits
    (|s| <= scale * max|q_scale| * max|k_scale|, models/attention.py), and
    exp(s - B) for any upper bound B is exactly softmax-stable, so the
    running max / rescale are skipped entirely ("flat softmax").  B is
    embedded via the spare lane (q_d = 1, k_d = -B/scale), so the kernel's
    only n^2 VPU op is the exp itself.  A uniformly shifted softmax is
    mathematically identical, and the bf16 rounding of B shifts every logit
    EQUALLY, so the path is exact up to normal bf16 matmul noise.
See docs/benchmarks.md for measured numbers.
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


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, kvm_ref, qo_ref, o_ref,
                 lse_ref, m_scr, l_scr, acc_scr, *, scale: float,
                 causal: bool, block_q: int, block_k: int, kv_true_len: int,
                 kv_pad_len: int, has_bias: bool, has_kv_mask: bool,
                 has_q_offset: bool, return_lse: bool, flat: bool,
                 denom_lane: int):
    """One (q-block, kv-block) step.  Scratch (m, l, acc) persists across the
    kv grid dimension (innermost); initialized at kv step 0, flushed to o_ref
    on the last kv step.  qo_ref (SMEM scalar) shifts causal q positions by a
    DYNAMIC global offset — the context-parallel case where this call's
    queries are shard [off, off+n) of a longer sequence.

    denom_lane >= 0: V carries a 1.0 in that spare lane, so the PV matmul
    accumulates rowsum(p) in acc's lane `denom_lane` — no l scratch, no VPU
    row-sum.  flat=True (requires denom_lane): logits arrive pre-shifted
    below 0 via the caller's `logit_bound` lane, so the running max / alpha
    rescale are skipped entirely (see module docstring)."""
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        if not flat:
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            if denom_lane < 0:
                l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal: skip kv blocks strictly above this q block's diagonal band
    # (dynamic when the q offset is dynamic — pl.when takes a traced bool)
    if not causal:
        run = True
    elif has_q_offset:
        run = kj * block_k <= qo_ref[0, 0] + qi * block_q + block_q - 1
    else:
        run = kj * block_k <= qi * block_q + block_q - 1

    def _masks():
        """Validity of each (q, k) cell of this tile, or None if all-valid."""
        valid = None
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            if has_q_offset:
                q_pos = q_pos + qo_ref[0, 0]
            k_pos = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            valid = k_pos <= q_pos
        if kv_pad_len > kv_true_len:
            # static padding of the key axis: mask the tail block's pad cols
            k_pos = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            pv = k_pos < kv_true_len
            valid = pv if valid is None else (valid & pv)
        if has_kv_mask:
            # per-sequence key validity (right-padded prompts): (1, block_k)
            # 0/1 row broadcast over the q tile
            kv = kvm_ref[:] > 0.5
            valid = kv if valid is None else (valid & kv)
        return valid

    @pl.when(run)
    def _step():
        q = q_ref[:]                                   # (block_q, d) in dtype
        k = k_ref[:]                                   # (block_k, d)
        v = v_ref[:]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                               # (block_q, block_k) f32
        if scale != 1.0:
            s = s * scale
        if has_bias:
            s = s + bias_ref[:].astype(jnp.float32)
        valid = _masks()

        if flat:
            # pre-shifted logits: exp is the only n^2 VPU op on this path
            p = jnp.exp(s)
            if valid is not None:
                p = jnp.where(valid, p, 0.0)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (block_q, d) f32
            acc_scr[:] = acc_scr[:] + pv
            return

        if valid is not None:
            s = jnp.where(valid, s, NEG_INF)
        m_prev = m_scr[:, :1]                           # (block_q, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                          # (block_q, block_k) f32
        alpha = jnp.exp(m_prev - m_new)                 # (block_q, 1)
        if denom_lane < 0:
            l_prev = l_scr[:, :1]
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # PV on the MXU in the input dtype (standard flash-attn practice);
        # with denom_lane the same matmul also advances the l statistic
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (block_q, d) f32
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        if denom_lane < 0:
            l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kj == num_kv - 1)
    def _flush():
        if denom_lane >= 0:
            # one-hot + rowsum instead of an unaligned width-1 lane slice
            # (slicing lane d mid-register forces Mosaic relayouts of acc)
            lane = jax.lax.broadcasted_iota(jnp.int32, acc_scr.shape, 1)
            l = jnp.sum(jnp.where(lane == denom_lane, acc_scr[:], 0.0),
                        axis=-1, keepdims=True)
        else:
            l = l_scr[:, :1]
        l_safe = jnp.maximum(l, 1e-30)
        o_ref[:] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        if return_lse:
            # per-row logsumexp, lane-replicated (the bwd kernels read col 0);
            # on the flat path this is RELATIVE to the caller's bound — the
            # backward reuses the same augmented operands, so it cancels
            lse = jnp.log(l_safe)
            if not flat:
                lse = m_scr[:, :1] + lse
            lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, pad)
    return jnp.pad(x, pads)


def _pad_d_with_lane(x, d_pad, lane_value):
    """Pad the last (head) dim to d_pad with lane d = `lane_value` and zeros
    beyond — ONE concatenation pass (an .at[d].set after jnp.pad would copy
    the tensor twice)."""
    b, h, n, d = x.shape
    if d_pad <= d:
        return x
    lane = jnp.broadcast_to(jnp.asarray(lane_value, x.dtype), (b, h, n, 1))
    parts = [x, lane]
    if d_pad > d + 1:
        parts.append(jnp.zeros((b, h, n, d_pad - d - 1), x.dtype))
    return jnp.concatenate(parts, axis=-1)


def _rup(x, mult):
    return ((x + mult - 1) // mult) * mult


def _pick_block(size: int, cap: int) -> int:
    """Largest MXU-friendly tile <= cap that wastes the least padding over
    `size` (measured on chip: 768/1728 tiles run the 13,824-token fused
    sequence at 5.5 ms vs 15 ms with 256/512 — per-step overhead dominates
    small tiles)."""
    cands = {c for c in (1728, 1536, 1024, 768, 512, 384, 256, 128) if c <= cap}
    small = _rup(size, 128)
    if small <= cap:
        cands.add(small)
    # cost model: padded work x (1 + overhead/tile); OVH=200 fits the measured
    # 256->768 tile scaling on the fused sequence
    OVH = 200.0
    best, best_cost = 128, float("inf")
    for c in sorted(cands, reverse=True):
        cost = _rup(size, c) * (1.0 + OVH / c)
        if cost < best_cost:
            best, best_cost = c, cost
    return best


def _is_pow2(x: float) -> bool:
    return x > 0 and math.frexp(x)[0] == 0.5


def _fold_scale(q, scale):
    """Fold a power-of-two scale into q (exact in floating point); return the
    (possibly scaled) q and the scale the kernel must still apply."""
    if scale != 1.0 and _is_pow2(abs(scale)):
        return q * jnp.asarray(scale, q.dtype), 1.0
    return q, scale


def _flash_call(q, k, v, bias, kv_mask, q_offset, logit_bound, *, causal,
                block_q, block_k, scale, return_lse):
    """The forward pallas_call.  Returns out, or (out, lse) with lse shaped
    (b*h, n) fp32 when return_lse.  lse is relative to `logit_bound` when
    that is given (the backward reuses the same augmentation, so the shift
    cancels)."""
    b, h, n, d = q.shape
    m = k.shape[2]

    rup = _rup
    d_pad = max(128, rup(d, 128))
    q, kern_scale = _fold_scale(q, scale)
    denom_lane = d if d < d_pad else -1
    flat = logit_bound is not None and denom_lane >= 0
    # auto-pick tiles: big for long sequences, shrunk to the (128-aligned)
    # sizes for short axial folds; with a bias operand the (block_q, block_k)
    # fp32 bias+score tiles both live in VMEM, so cap them tighter
    if block_q is None:
        block_q = _pick_block(n, cap=512 if bias is not None else 1024)
    else:
        block_q = min(block_q, rup(n, 128))
    if block_k is None:
        block_k = _pick_block(m, cap=1024 if bias is not None else 1728)
    else:
        block_k = min(block_k, rup(m, 128))
    n_pad = rup(n, block_q)
    m_pad = rup(m, block_k)

    if denom_lane >= 0:
        # spare-lane denominator: PV accumulates rowsum(p) in acc lane d
        # (pad kv rows are zero-padded below and contribute p=0, so the lane
        # value only exists on real rows)
        v = _pad_d_with_lane(v, d_pad, 1.0)
    if flat:
        # embed the logit bound in the contraction: q_d*k_d = -B, making
        # every kernel logit <= ~0 so exp needs no running max
        q = _pad_d_with_lane(q, d_pad, 1.0)
        k = _pad_d_with_lane(
            k, d_pad,
            -jnp.asarray(logit_bound, jnp.float32).astype(k.dtype)
            / jnp.asarray(kern_scale, k.dtype))
    qf = _pad_to(_pad_to(q, d_pad, 3), n_pad, 2).reshape(b * h, n_pad, d_pad)
    kf = _pad_to(_pad_to(k, d_pad, 3), m_pad, 2).reshape(b * h, m_pad, d_pad)
    vf = _pad_to(_pad_to(v, d_pad, 3), m_pad, 2).reshape(b * h, m_pad, d_pad)

    grid = (b * h, n_pad // block_q, m_pad // block_k)

    in_specs = [
        pl.BlockSpec((None, block_q, d_pad), lambda g, i, j: (g, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, block_k, d_pad), lambda g, i, j: (g, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, block_k, d_pad), lambda g, i, j: (g, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf]

    has_bias = bias is not None
    if has_bias:
        # keep bias at its broadcast shape; index the right (head) slab per
        # grid step instead of materializing a (b*h, n, m) tensor
        if bias.ndim == 4:                               # (b, h, n, m)
            bias = bias.reshape(b * h, n, m)
            idx = lambda g, i, j: (g, i, j)
        elif bias.shape[0] == h and h > 1:               # (h, n, m)
            idx = lambda g, i, j: (g % h, i, j)
        else:                                            # (1, n, m)
            idx = lambda g, i, j: (0, i, j)
        bias = _pad_to(_pad_to(bias, n_pad, 1), m_pad, 2)
        in_specs.append(pl.BlockSpec((None, block_q, block_k), idx,
                                     memory_space=pltpu.VMEM))
        operands.append(bias)

    has_kv_mask = kv_mask is not None
    if has_kv_mask:
        # (b, m) -> (b, 1, m_pad) fp32 0/1; one (1, block_k) row per step,
        # shared by all heads of the batch item (g // h)
        kvm = _pad_to(kv_mask.astype(jnp.float32)[:, None, :], m_pad, 2)
        in_specs.append(pl.BlockSpec(
            (None, 1, block_k), lambda g, i, j, h=h: (g // h, 0, j),
            memory_space=pltpu.VMEM))
        operands.append(kvm)

    has_q_offset = q_offset is not None
    if has_q_offset:
        qo = jnp.asarray(q_offset, jnp.int32).reshape(1, 1)
        in_specs.append(pl.BlockSpec((1, 1), lambda g, i, j: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(qo)

    kernel = functools.partial(
        _attn_kernel, scale=kern_scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_true_len=m, kv_pad_len=m_pad, has_bias=has_bias,
        has_kv_mask=has_kv_mask, has_q_offset=has_q_offset,
        return_lse=return_lse, flat=flat, denom_lane=denom_lane)

    def kernel_entry(*refs):
        q_ref, k_ref, v_ref, rest = refs[0], refs[1], refs[2], list(refs[3:])
        b_ref = rest.pop(0) if has_bias else None
        kvm_ref = rest.pop(0) if has_kv_mask else None
        qo_ref = rest.pop(0) if has_q_offset else None
        if return_lse:
            o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
        else:
            o_ref, m_scr, l_scr, acc_scr = rest
            lse_ref = None
        kernel(q_ref, k_ref, v_ref, b_ref, kvm_ref, qo_ref, o_ref, lse_ref,
               m_scr, l_scr, acc_scr)

    out_specs = pl.BlockSpec((None, block_q, d_pad), lambda g, i, j: (g, i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype)
    if return_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((None, block_q, 128),
                                  lambda g, i, j: (g, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b * h, n_pad, 128), jnp.float32)]

    res = pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # m (row max, replicated)
            pltpu.VMEM((block_q, 128), jnp.float32),   # l (row sum, replicated)
            pltpu.VMEM((block_q, d_pad), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*operands)
    if return_lse:
        out, lse = res
        return (out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d],
                lse[:, :n, 0])
    return res.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]


# ---------------------------------------------------------------------------
# Backward kernels (no-bias path): standard flash-bwd with per-tile
# recomputation of p = exp(s - lse) and delta = rowsum(dO * O).
# ---------------------------------------------------------------------------


def _bwd_p(q, k, lse_col, *, scale, causal, qi, kj, block_q, block_k,
           kv_true_len, kv_pad_len, kvm_ref, has_kv_mask, qo_ref=None,
           bias_ref=None):
    """Recompute the (block_q, block_k) probability tile from saved lse.
    Masked cells are zeroed directly (no NEG_INF round trip)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if bias_ref is not None:
        s = s + bias_ref[:].astype(jnp.float32)
    p = jnp.exp(s - lse_col)
    valid = None
    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        if qo_ref is not None:
            q_pos = q_pos + qo_ref[0, 0]
        k_pos = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        valid = k_pos <= q_pos
    if kv_pad_len > kv_true_len:
        k_pos = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        pv = k_pos < kv_true_len
        valid = pv if valid is None else (valid & pv)
    if has_kv_mask:
        kv = kvm_ref[:] > 0.5
        valid = kv if valid is None else (valid & kv)
    if valid is not None:
        p = jnp.where(valid, p, 0.0)
    return p


def _dkv_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, kvm_ref,
                qo_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale, causal,
                block_q, block_k, kv_true_len, kv_pad_len, has_kv_mask,
                bias_ref=None):
    """grid (b*h, kv_blocks, q_blocks) — q innermost; dk/dv accumulate over
    the q walk for one kv tile."""
    ki = pl.program_id(1)
    qj = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(qj == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # causal: q blocks entirely above this kv tile's diagonal contribute 0
    if not causal:
        run = True
    elif qo_ref is not None:
        run = ki * block_k <= qo_ref[0, 0] + qj * block_q + block_q - 1
    else:
        run = ki * block_k <= qj * block_q + block_q - 1

    @pl.when(run)
    def _step():
        q = q_ref[:]
        do = do_ref[:]
        k = k_ref[:]
        v = v_ref[:]
        p = _bwd_p(q, k, lse_ref[:, :1], scale=scale, causal=causal, qi=qj,
                   kj=ki, block_q=block_q, block_k=block_k,
                   kv_true_len=kv_true_len, kv_pad_len=kv_pad_len,
                   kvm_ref=kvm_ref, has_kv_mask=has_kv_mask, qo_ref=qo_ref,
                   bias_ref=bias_ref)
        # dV += P^T dO            (contract the q axis)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dP = dO V^T ; delta = rowsum(dO * O) recomputed in-tile
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o_ref[:].astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        # dK += dS^T Q
        dk_scr[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(qj == num_q - 1)
    def _flush():
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype)


def _dq_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, kvm_ref,
               qo_ref, dq_ref, dq_scr, *, scale, causal, block_q, block_k,
               kv_true_len, kv_pad_len, has_kv_mask, bias_ref=None):
    """grid (b*h, q_blocks, kv_blocks) — kv innermost; dq accumulates over
    the kv walk for one q tile."""
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    if not causal:
        run = True
    elif qo_ref is not None:
        run = kj * block_k <= qo_ref[0, 0] + qi * block_q + block_q - 1
    else:
        run = kj * block_k <= qi * block_q + block_q - 1

    @pl.when(run)
    def _step():
        q = q_ref[:]
        do = do_ref[:]
        k = k_ref[:]
        v = v_ref[:]
        p = _bwd_p(q, k, lse_ref[:, :1], scale=scale, causal=causal, qi=qi,
                   kj=kj, block_q=block_q, block_k=block_k,
                   kv_true_len=kv_true_len, kv_pad_len=kv_pad_len,
                   kvm_ref=kvm_ref, has_kv_mask=has_kv_mask, qo_ref=qo_ref,
                   bias_ref=bias_ref)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o_ref[:].astype(jnp.float32),
                        axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        # dQ += dS K
        dq_scr[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kj == num_kv - 1)
    def _flush():
        dq_ref[:] = dq_scr[:].astype(dq_ref.dtype)


def _db_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, kvm_ref,
               qo_ref, bias_ref, db_ref, db_scr, *, scale, causal, block_q,
               block_k, kv_true_len, kv_pad_len, has_kv_mask):
    """grid (h_bias, q_blocks, kv_blocks, inner) — inner (the broadcast
    batch walk) innermost; d(bias) accumulates ds = p * (dp - delta) over it
    for one (head, q, kv) tile.  The bias gradient per cell is ds WITHOUT
    the attention scale (bias adds to the POST-scale logits), summed over
    every batch item that broadcast the bias slab — which is why it gets
    its own pass: the dq/dkv walks revisit a given bias tile at
    non-consecutive grid steps, where Pallas flushes output blocks."""
    ii = pl.program_id(3)
    num_inner = pl.num_programs(3)
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(ii == 0)
    def _init():
        db_scr[:] = jnp.zeros_like(db_scr)

    if not causal:
        run = True
    elif qo_ref is not None:
        run = kj * block_k <= qo_ref[0, 0] + qi * block_q + block_q - 1
    else:
        run = kj * block_k <= qi * block_q + block_q - 1

    @pl.when(run)
    def _step():
        q = q_ref[:]
        do = do_ref[:]
        p = _bwd_p(q, k_ref[:], lse_ref[:, :1], scale=scale, causal=causal,
                   qi=qi, kj=kj, block_q=block_q, block_k=block_k,
                   kv_true_len=kv_true_len, kv_pad_len=kv_pad_len,
                   kvm_ref=kvm_ref, has_kv_mask=has_kv_mask, qo_ref=qo_ref,
                   bias_ref=bias_ref)
        dp = jax.lax.dot_general(
            do, v_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o_ref[:].astype(jnp.float32),
                        axis=-1, keepdims=True)
        db_scr[:] += p * (dp - delta)

    @pl.when(ii == num_inner - 1)
    def _flush():
        db_ref[:] = db_scr[:].astype(db_ref.dtype)


def _flash_bwd(q, k, v, bias, kv_mask, q_offset, logit_bound, out, lse, do,
               *, causal, scale):
    """Pallas backward: returns (dq, dk, dv, dbias-or-None).  Reuses the
    forward's scale-fold and logit-bound augmentation so the saved
    (bound-relative) lse recovers the exact probabilities.  `bias` may be
    None or a broadcast (h, n, m) / (1, n, m) slab (the CPB case): dq/dkv
    read it per tile, and a third kernel accumulates d(bias) over the
    batch items that broadcast each slab."""
    b, h, n, d = q.shape
    m = k.shape[2]
    rup = _rup
    d_pad = max(128, rup(d, 128))
    q, kern_scale = _fold_scale(q, scale)
    scale, post_scale = kern_scale, (scale if kern_scale == 1.0 else 1.0)
    denom_lane = d if d < d_pad else -1
    flat = logit_bound is not None and denom_lane >= 0
    # smaller caps than fwd: bwd tiles keep 4 matmul temporaries live
    block_q = _pick_block(n, cap=512)
    block_k = _pick_block(m, cap=512)
    n_pad = rup(n, block_q)
    m_pad = rup(m, block_k)

    if flat:
        # same augmentation as the forward: recomputed logits land at s - B,
        # matching the saved bound-relative lse; the spare-lane gradients are
        # sliced off below (softmax is invariant to the uniform shift, so
        # they carry no real gradient)
        q = _pad_d_with_lane(q, d_pad, 1.0)
        k = _pad_d_with_lane(
            k, d_pad,
            -jnp.asarray(logit_bound, jnp.float32).astype(k.dtype)
            / jnp.asarray(scale, k.dtype))
    qf = _pad_to(_pad_to(q, d_pad, 3), n_pad, 2).reshape(b * h, n_pad, d_pad)
    dof = _pad_to(_pad_to(do, n_pad, 2), d_pad, 3).reshape(b * h, n_pad, d_pad)
    of = _pad_to(_pad_to(out, n_pad, 2), d_pad, 3).reshape(b * h, n_pad, d_pad)
    kf = _pad_to(_pad_to(k, d_pad, 3), m_pad, 2).reshape(b * h, m_pad, d_pad)
    vf = _pad_to(_pad_to(v, m_pad, 2), d_pad, 3).reshape(b * h, m_pad, d_pad)
    # pad rows get lse=0 -> garbage p there, but their dO/O rows are zero so
    # every gradient contribution vanishes (ds = p * (0 - 0))
    lsef = jnp.broadcast_to(
        _pad_to(lse, n_pad, 1)[:, :, None], (b * h, n_pad, 128)
    ).astype(jnp.float32)

    has_kv_mask = kv_mask is not None
    kvm = None
    if has_kv_mask:
        kvm = _pad_to(kv_mask.astype(jnp.float32)[:, None, :], m_pad, 2)
    has_q_offset = q_offset is not None
    qo = (jnp.asarray(q_offset, jnp.int32).reshape(1, 1)
          if has_q_offset else None)
    qo_spec = pl.BlockSpec((1, 1), lambda g, i, j: (0, 0),
                           memory_space=pltpu.SMEM)

    has_bias = bias is not None
    if has_bias:
        h_bias = bias.shape[0]                      # h or 1
        bias_shape = bias.shape
        biasf = _pad_to(_pad_to(bias, n_pad, 1), m_pad, 2)
        # bias slab for grid step g (= b_idx * h + head): head's slab, or
        # the single shared slab
        bh_idx = ((lambda g: g % h) if h_bias == h and h > 1
                  else (lambda g: 0))

    common = dict(scale=scale, causal=causal, block_q=block_q,
                  block_k=block_k, kv_true_len=m, kv_pad_len=m_pad,
                  has_kv_mask=has_kv_mask)

    q_spec_i = pl.BlockSpec((None, block_q, d_pad), lambda g, i, j: (g, i, 0),
                            memory_space=pltpu.VMEM)
    q_spec_j = pl.BlockSpec((None, block_q, d_pad), lambda g, i, j: (g, j, 0),
                            memory_space=pltpu.VMEM)
    k_spec_i = pl.BlockSpec((None, block_k, d_pad), lambda g, i, j: (g, i, 0),
                            memory_space=pltpu.VMEM)
    k_spec_j = pl.BlockSpec((None, block_k, d_pad), lambda g, i, j: (g, j, 0),
                            memory_space=pltpu.VMEM)
    lse_spec_i = pl.BlockSpec((None, block_q, 128), lambda g, i, j: (g, i, 0),
                              memory_space=pltpu.VMEM)
    lse_spec_j = pl.BlockSpec((None, block_q, 128), lambda g, i, j: (g, j, 0),
                              memory_space=pltpu.VMEM)

    # ---- dK, dV: grid (b*h, kv_blocks, q_blocks) ---------------------------
    in_specs = [q_spec_j, q_spec_j, q_spec_j, lse_spec_j, k_spec_i, k_spec_i]
    operands = [qf, dof, of, lsef, kf, vf]
    if has_kv_mask:
        in_specs.append(pl.BlockSpec(
            (None, 1, block_k), lambda g, i, j, h=h: (g // h, 0, i),
            memory_space=pltpu.VMEM))
        operands.append(kvm)
    if has_q_offset:
        in_specs.append(qo_spec)
        operands.append(qo)
    if has_bias:
        # dkv grid is (g, kv_i, q_j): the bias tile is (q rows j, kv cols i)
        in_specs.append(pl.BlockSpec(
            (None, block_q, block_k), lambda g, i, j: (bh_idx(g), j, i),
            memory_space=pltpu.VMEM))
        operands.append(biasf)

    def dkv_entry(*refs):
        refs = list(refs)
        n_extra = 6 + has_kv_mask + has_q_offset
        b_ref = refs.pop(n_extra) if has_bias else None
        qo_ref = refs.pop(6 + has_kv_mask) if has_q_offset else None
        kvm_ref = refs.pop(6) if has_kv_mask else None
        (q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
        _dkv_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, kvm_ref,
                    qo_ref, dk_ref, dv_ref, dk_scr, dv_scr, bias_ref=b_ref,
                    **common)

    dk, dv = pl.pallas_call(
        dkv_entry,
        grid=(b * h, m_pad // block_k, n_pad // block_q),
        in_specs=in_specs,
        out_specs=[k_spec_i, k_spec_i],
        out_shape=[jax.ShapeDtypeStruct((b * h, m_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((b * h, m_pad, d_pad), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d_pad), jnp.float32),
                        pltpu.VMEM((block_k, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(*operands)

    # ---- dQ: grid (b*h, q_blocks, kv_blocks) -------------------------------
    in_specs = [q_spec_i, q_spec_i, q_spec_i, lse_spec_i, k_spec_j, k_spec_j]
    operands = [qf, dof, of, lsef, kf, vf]
    if has_kv_mask:
        in_specs.append(pl.BlockSpec(
            (None, 1, block_k), lambda g, i, j, h=h: (g // h, 0, j),
            memory_space=pltpu.VMEM))
        operands.append(kvm)
    if has_q_offset:
        in_specs.append(qo_spec)
        operands.append(qo)
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (None, block_q, block_k), lambda g, i, j: (bh_idx(g), i, j),
            memory_space=pltpu.VMEM))
        operands.append(biasf)

    def dq_entry(*refs):
        refs = list(refs)
        n_extra = 6 + has_kv_mask + has_q_offset
        b_ref = refs.pop(n_extra) if has_bias else None
        qo_ref = refs.pop(6 + has_kv_mask) if has_q_offset else None
        kvm_ref = refs.pop(6) if has_kv_mask else None
        q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, dq_ref, dq_scr = refs
        _dq_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, kvm_ref,
                   qo_ref, dq_ref, dq_scr, bias_ref=b_ref, **common)

    dq = pl.pallas_call(
        dq_entry,
        grid=(b * h, n_pad // block_q, m_pad // block_k),
        in_specs=in_specs,
        out_specs=q_spec_i,
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(*operands)

    # ---- d(bias): grid (h_bias, q_blocks, kv_blocks, inner) ----------------
    dbias = None
    if has_bias:
        inner = (b * h) // h_bias
        if h_bias == h and h > 1:
            g_of = lambda hd, ii: ii * h + hd
        else:
            g_of = lambda hd, ii: ii

        db_in_specs = [
            pl.BlockSpec((None, block_q, d_pad),
                         lambda hd, i, j, ii: (g_of(hd, ii), i, 0),
                         memory_space=pltpu.VMEM),          # q
            pl.BlockSpec((None, block_q, d_pad),
                         lambda hd, i, j, ii: (g_of(hd, ii), i, 0),
                         memory_space=pltpu.VMEM),          # do
            pl.BlockSpec((None, block_q, d_pad),
                         lambda hd, i, j, ii: (g_of(hd, ii), i, 0),
                         memory_space=pltpu.VMEM),          # o
            pl.BlockSpec((None, block_q, 128),
                         lambda hd, i, j, ii: (g_of(hd, ii), i, 0),
                         memory_space=pltpu.VMEM),          # lse
            pl.BlockSpec((None, block_k, d_pad),
                         lambda hd, i, j, ii: (g_of(hd, ii), j, 0),
                         memory_space=pltpu.VMEM),          # k
            pl.BlockSpec((None, block_k, d_pad),
                         lambda hd, i, j, ii: (g_of(hd, ii), j, 0),
                         memory_space=pltpu.VMEM),          # v
        ]
        db_operands = [qf, dof, of, lsef, kf, vf]
        if has_kv_mask:
            db_in_specs.append(pl.BlockSpec(
                (None, 1, block_k),
                lambda hd, i, j, ii: (g_of(hd, ii) // h, 0, j),
                memory_space=pltpu.VMEM))
            db_operands.append(kvm)
        if has_q_offset:
            db_in_specs.append(pl.BlockSpec(
                (1, 1), lambda hd, i, j, ii: (0, 0),
                memory_space=pltpu.SMEM))
            db_operands.append(qo)
        db_in_specs.append(pl.BlockSpec(
            (None, block_q, block_k), lambda hd, i, j, ii: (hd, i, j),
            memory_space=pltpu.VMEM))
        db_operands.append(biasf)

        def db_entry(*refs):
            refs = list(refs)
            b_ref = refs.pop(6 + has_kv_mask + has_q_offset)
            qo_ref = refs.pop(6 + has_kv_mask) if has_q_offset else None
            kvm_ref = refs.pop(6) if has_kv_mask else None
            (q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref,
             db_ref, db_scr) = refs
            _db_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, kvm_ref,
                       qo_ref, b_ref, db_ref, db_scr, **common)

        db = pl.pallas_call(
            db_entry,
            grid=(h_bias, n_pad // block_q, m_pad // block_k, inner),
            in_specs=db_in_specs,
            out_specs=pl.BlockSpec((None, block_q, block_k),
                                   lambda hd, i, j, ii: (hd, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h_bias, n_pad, m_pad),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((block_q, block_k), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
        )(*db_operands)
        dbias = db[:, :n, :m].reshape(bias_shape).astype(bias.dtype)

    dq = dq.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]
    dk = dk.reshape(b, h, m_pad, d_pad)[:, :, :m, :d]
    dv = dv.reshape(b, h, m_pad, d_pad)[:, :, :m, :d]
    if post_scale != 1.0:
        # the kernel differentiated w.r.t. the scale-folded q
        dq = dq * jnp.asarray(post_scale, dq.dtype)
    return dq, dk, dv, dbias


def _dense_bwd(q, k, v, bias, kv_mask, q_offset, do, *, causal, scale):
    """Exact dense backward for the bias path.  d(bias) is a dense (n, m)
    gradient by nature, so this allocates what dense attention would."""
    b, h, n, d = q.shape
    m = k.shape[2]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    bias_shape = bias.shape
    bb = bias if bias.ndim == 4 else bias[None]
    s = s + bb.astype(jnp.float32)
    valid = jnp.ones((1, 1, n, m), bool)
    if causal:
        q_pos = jnp.arange(n)[None, None, :, None]
        if q_offset is not None:
            q_pos = q_pos + jnp.asarray(q_offset, jnp.int32).reshape(())
        valid = valid & (jnp.arange(m)[None, None, None, :] <= q_pos)
    if kv_mask is not None:
        valid = valid & (kv_mask[:, None, None, :] > 0)
    s = jnp.where(valid, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)                     # (b, h, n, m) f32
    dof = do.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dp = jnp.einsum("bhnd,bhmd->bhnm", dof, vf)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta)                              # grad wrt s (pre-mask)
    ds = jnp.where(valid, ds, 0.0)
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32)) * scale
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, dof)
    dbias = ds
    if bias.ndim < 4:                                  # sum the batch bcast
        dbias = jnp.sum(dbias, axis=0)
        if bias.shape[0] == 1 and h > 1:               # (1, n, m)
            dbias = jnp.sum(dbias, axis=0, keepdims=True)
    dbias = dbias.reshape(bias_shape).astype(bias.dtype)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias)


@functools.lru_cache(maxsize=None)
def _make_fa(causal: bool, block_q, block_k, scale: float):
    """custom_vjp'd flash attention for one static (causal, tiles, scale)."""

    @jax.custom_vjp
    def fa(q, k, v, bias, kv_mask, q_offset, logit_bound):
        return _flash_call(q, k, v, bias, kv_mask, q_offset, logit_bound,
                           causal=causal, block_q=block_q, block_k=block_k,
                           scale=scale, return_lse=False)

    def fa_fwd(q, k, v, bias, kv_mask, q_offset, logit_bound):
        out, lse = _flash_call(q, k, v, bias, kv_mask, q_offset, logit_bound,
                               causal=causal, block_q=block_q,
                               block_k=block_k, scale=scale, return_lse=True)
        return out, (q, k, v, bias, kv_mask, q_offset, logit_bound, out, lse)

    def fa_bwd(res, do):
        q, k, v, bias, kv_mask, q_offset, logit_bound, out, lse = res
        if bias is not None and bias.ndim == 4:
            # per-item bias: d(bias) is a full (b, h, n, m) tensor anyway, so
            # the dense backward allocates nothing extra
            dq, dk, dv, dbias = _dense_bwd(q, k, v, bias, kv_mask, q_offset,
                                           do, causal=causal, scale=scale)
        else:
            # pallas backward; broadcast (h/1, n, m) bias (the CPB case) gets
            # its gradient from the _db_kernel pass — no (b*h, n, m) dense
            # probability/score tensors materialize (the XLA dense backward
            # of the 576-token axial fold costs ~255 MB of fp32 scores per
            # layer; this is the flash_axial TRAINING enabler)
            dq, dk, dv, dbias = _flash_bwd(
                q, k, v, bias, kv_mask, q_offset, logit_bound, out, lse, do,
                causal=causal, scale=scale)
        return dq, dk, dv, dbias, None, None, None

    fa.defvjp(fa_fwd, fa_bwd)
    return fa


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "scale"))
def flash_attention(
    q: jax.Array,                    # (b, h, n, d)
    k: jax.Array,                    # (b, h, m, d)
    v: jax.Array,                    # (b, h, m, d)
    bias: Optional[jax.Array] = None,  # (h, n, m) / (1, n, m) / (b, h, n, m)
    causal: bool = False,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    scale: Optional[float] = None,
    kv_mask: Optional[jax.Array] = None,   # (b, m) 1 = real key (right-pad)
    q_offset: Optional[jax.Array] = None,  # scalar: queries are the shard
                                           # [off, off+n) of a longer causal
                                           # sequence (context parallelism)
    logit_bound: Optional[jax.Array] = None,  # scalar upper bound on the
                                           # POST-scale logits incl. bias:
                                           # enables the flat-softmax fast
                                           # path when d < 128 (module
                                           # docstring).  Must genuinely
                                           # bound max(s) (cosine attention
                                           # provides one analytically) or
                                           # exp overflows.
) -> jax.Array:
    """Causal alignment: with `causal=True` and no `q_offset`, masking is
    TOP-LEFT aligned (query row i attends to keys [0, i]).  For rectangular
    inputs (n_q < n_kv, e.g. decode-style suffix queries) the usual
    bottom-right alignment requires `q_offset = n_kv - n_q`; pass it
    explicitly — it is not inferred."""
    d = q.shape[-1]
    scale = float(scale) if scale is not None else 1.0 / math.sqrt(d)
    return _make_fa(causal, block_q, block_k, scale)(q, k, v, bias, kv_mask,
                                                     q_offset, logit_bound)
