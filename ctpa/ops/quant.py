"""int8 quantization for serving: weight-only (w8) and dynamic w8a8.

Why: Meditron-7B decode on one v5e is WEIGHT-READ bound (docs/benchmarks.md:
21-23 ms/step ≈ the 12.6 GB of bf16 weights streaming from HBM each step;
batch 4→8 costs only ~10%).  Storing the big projections as int8 with
per-output-channel scales halves the bytes read per step — the standard
weight-only serving quantization (activations stay bf16; MXU compute is
bf16 after an in-register dequant, so there is no activation-quant quality
cliff).  This is a capability the reference does not have (it loads Meditron
in bf16, train_module.py:307-313) — pure serving upside.

Two dequant-matmul implementations:
  * `int8_matmul(..., impl="xla")`: `x @ (w8 -> bf16)` and scale the output
    columns.  XLA usually fuses the convert into the dot read on TPU; kept
    as the fallback and the numerics oracle.
  * `int8_matmul(..., impl="pallas")`: explicit kernel — w8 tiles are DMA'd
    from HBM as int8 (half the bytes of bf16), converted to bf16 in VMEM,
    and fed to the MXU with fp32 accumulation; per-column scales applied at
    the flush.  Guarantees the bandwidth win regardless of XLA fusion
    decisions.

w8a8 (`act_quant=True`, round 3): the weight-only kernel's binder at large
batch is NOT bandwidth but the per-element VPU dequant — converting every
int8 weight to bf16 costs ~2 VPU ops × 6.9e9 elements/step ≈ 14 ms at 7B,
nearly 2× the 8.4 ms HBM floor.  The TPU-native fix is to quantize the
ACTIVATIONS too (dynamic symmetric per-token absmax, recomputed every call)
and feed the MXU a native int8×int8→int32 contraction: zero per-weight-
element VPU work, int32 accumulation is exact, and the only dequant is the
(m, out) output tile scaled by sx(row)⊗sw(col).  Weight storage and
`quantize_tree` are UNCHANGED — w8a8 is a serving-time flag
(`LLMConfig.quant_act`), not a different checkpoint format.

Quantization: symmetric per-output-channel absmax
  w8[:, j] = round(w[:, j] / s_j),  s_j = max|w[:, j]| / 127
Per-channel (not per-tensor) keeps the worst-case relative error of llama
projections ≈ 0.4% — below bf16 rounding noise accumulated across a layer.
Activation quantization (w8a8) adds per-token absmax error ≈ 0.4% worst
case; tests/test_quant.py gates logit deviation and greedy-token agreement.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_int8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(in, out) float weights -> (w8 int8 (in, out), scale f32 (out,))."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127
                  ).astype(jnp.int8)
    return w8, scale


def dequantize_int8(w8: jax.Array, scale: jax.Array, dtype=jnp.bfloat16):
    return (w8.astype(jnp.float32) * scale).astype(dtype)


def _int4_group(d_in: int, group: int) -> int:
    """Largest group <= `group` that divides d_in (halving; every llama
    dim is highly even, so this terminates well above 2)."""
    g = min(group, d_in)
    while g > 2 and d_in % g != 0:
        g //= 2
    assert d_in % g == 0 and g % 2 == 0, (d_in, group)
    return g


def quantize_int4(w: jax.Array, group: int = 128
                  ) -> tuple[jax.Array, jax.Array]:
    """(in, out) float weights -> (packed int8 (in/2, out), group scales
    f32 (in/group, out)).  Symmetric absmax per (input-group, out-channel),
    values in [-7, 7].  Packing pairs the two HALVES of each group (byte j
    of group g holds rows g·G+j and g·G+G/2+j), so the in-kernel unpack —
    low nibbles then high nibbles, concatenated along the group axis —
    reconstructs natural row order with no permutation of the activations."""
    d_in, d_out = w.shape
    g = _int4_group(d_in, group)
    wf = w.astype(jnp.float32).reshape(d_in // g, g, d_out)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=1) / 7.0, 1e-12)  # (n_g, out)
    q = jnp.clip(jnp.round(wf / s[:, None, :]), -7, 7).astype(jnp.int32)
    lo, hi = q[:, : g // 2], q[:, g // 2 :]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.uint8)
    packed = jax.lax.bitcast_convert_type(packed, jnp.int8)
    return packed.reshape(d_in // 2, d_out), s


def _unpack_int4(packed: jax.Array, group: int):
    """(in/2, out) packed int8 -> (n_g, group, out) int8 in natural order.

    Shifts run in int32: Mosaic does not legalize `arith.shli` on int8
    vectors (found on-chip), and int32 is the native VPU lane width anyway."""
    half = group // 2
    p3 = packed.reshape(-1, half, packed.shape[-1])          # (n_g, G/2, out)
    p32 = p3.astype(jnp.int32)                               # sign-extended
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)        # signed low nibble
    hi = jnp.right_shift(p32, 4)                             # arithmetic
    q = jnp.concatenate([lo, hi], axis=1)                    # (n_g, G, out)
    return q.astype(jnp.int8)


def quantize_kv_int4(rows: jax.Array, group: int = 32,
                     scale_dtype=jnp.float32
                     ) -> tuple[jax.Array, jax.Array]:
    """KV-cache row quantization: (..., hd) float rows -> (packed int8
    (..., hd/2), group scales `scale_dtype` (..., hd/group)).

    Symmetric absmax per contiguous `group`-element block along the last
    (head_dim) axis — per-token per-kv-head per-group, the KV analog of the
    weight path's quantize_int4.  Packing pairs the two HALVES of each group
    (byte j of group g holds elements g·gs+j and g·gs+gs/2+j) so
    `unpack_kv_int4` — low nibbles then high nibbles, concatenated inside
    each group — restores natural element order with no permutation of q.
    Group (not whole-head) scales because 15 levels over a 128-wide head
    loses too much: the groups track the within-head dynamic range.

    scale_dtype=bfloat16 stores the scales at half width (80 -> 72 cache
    bytes per hd=128 K row, 1.83x vs the int8 cache's 132): the scale is
    rounded to bf16 FIRST and the nibbles quantized against the rounded
    value, so the fold identity in the attention einsums stays exact —
    only the grid spacing shifts by bf16's ~0.4% rounding."""
    hd = rows.shape[-1]
    gs = _int4_group(hd, group)
    rf = rows.astype(jnp.float32).reshape(*rows.shape[:-1], hd // gs, gs)
    s = jnp.maximum(jnp.max(jnp.abs(rf), axis=-1) / 7.0, 1e-12)  # (..., G)
    s = s.astype(scale_dtype)
    q = jnp.clip(jnp.round(rf / s[..., None].astype(jnp.float32)),
                 -7, 7).astype(jnp.int32)
    lo, hi = q[..., : gs // 2], q[..., gs // 2 :]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.uint8)
    packed = jax.lax.bitcast_convert_type(packed, jnp.int8)
    return packed.reshape(*rows.shape[:-1], hd // 2), s


def unpack_kv_int4(packed: jax.Array, group: int) -> jax.Array:
    """(..., hd/2) packed int8 -> (..., G, gs) int8, natural order inside
    each group (inverse of quantize_kv_int4's pairing).  Shifts run in
    int32 (Mosaic does not legalize int8 vector shifts; int32 is the native
    VPU lane width)."""
    hd = packed.shape[-1] * 2
    gs = _int4_group(hd, group)
    p = packed.reshape(*packed.shape[:-1], hd // gs, gs // 2)
    p32 = p.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)        # signed low nibble
    hi = jnp.right_shift(p32, 4)                             # arithmetic
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


def dequantize_int4(packed: jax.Array, scale: jax.Array, group: int = 128,
                    dtype=jnp.bfloat16):
    d_in = packed.shape[0] * 2
    g = _int4_group(d_in, group)
    q = _unpack_int4(packed, g)                              # (n_g, g, out)
    w = q.astype(jnp.float32) * scale[:, None, :]
    return w.reshape(d_in, -1).astype(dtype)


def quantize_act_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-token (per-row) activation quantization:
    (..., in) float -> (x8 int8 same shape, sx f32 (..., 1)).  Cheap — the
    activation is (m, in) with m = batch rows, and XLA fuses the absmax +
    round into the producer."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax / 127.0, 1e-12)
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return x8, sx


def _rup(x, m):
    return ((x + m - 1) // m) * m


def _q_kernel(x_ref, w_ref, s_ref, o_ref, acc_scr, *, n_in_blocks: int):
    """grid (m_blocks, out_blocks, in_blocks), in innermost.  w tile arrives
    int8 from HBM (half-bandwidth), is converted in VMEM, and runs on the MXU
    in the activation dtype with fp32 accumulation.  The m grid dimension
    keeps prefill-sized row counts out of VMEM (decode has one m block)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[:]                                    # (block_m, block_in) bf16
    w = w_ref[:].astype(x.dtype)                    # (block_in, block_out)
    acc_scr[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == n_in_blocks - 1)
    def _flush():
        o_ref[:] = (acc_scr[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _q_kernel_a8(x_ref, sx_ref, w_ref, s_ref, o_ref, acc_scr, *,
                 n_in_blocks: int):
    """w8a8 step: int8 x tile × int8 w tile on the MXU with EXACT int32
    accumulation; the only float work is the (block_m, block_out) output
    dequant at the flush (sx row scales ⊗ s column scales).  No per-weight-
    element VPU convert — the weight-only kernel's large-batch binder."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    acc_scr[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(i == n_in_blocks - 1)
    def _flush():
        o_ref[:] = (acc_scr[:].astype(jnp.float32)
                    * sx_ref[:].astype(jnp.float32)
                    * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("impl", "block_in", "block_out",
                                    "act_quant"))
def int8_matmul(
    x: jax.Array,          # (..., in) activations (bf16 on the hot path)
    w8: jax.Array,         # (in, out) int8
    scale: jax.Array,      # (out,) f32
    impl: str = "pallas",
    block_in: int = 2048,
    block_out: int = 1024,
    act_quant: bool = False,
) -> jax.Array:
    *lead, d_in = x.shape
    d_out = w8.shape[1]
    if impl == "xla":
        if act_quant:
            x8, sx = quantize_act_int8(x)
            y = jax.lax.dot_general(
                x8.astype(jnp.int32), w8.astype(jnp.int32),
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * sx
                    * scale.astype(jnp.float32)).astype(x.dtype)
        y = jax.lax.dot_general(
            x, w8.astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y * scale.astype(jnp.float32)).astype(x.dtype)

    xm = x.reshape(-1, d_in)
    m = xm.shape[0]
    # sublane granularity: bf16 wants >=16 rows, int8 >=32; prefill-sized row
    # counts are split over an m grid dimension (weights re-read per m block —
    # prefill is compute-bound so the extra reads don't bind)
    min_m = 32 if act_quant else 16
    block_m = max(min_m, min(_rup(m, min_m), 256))
    m_pad = _rup(max(m, min_m), block_m)
    in_pad = _rup(d_in, block_in)
    out_pad = _rup(d_out, block_out)
    wp = jnp.pad(w8, ((0, in_pad - d_in), (0, out_pad - d_out)))
    sp = jnp.pad(scale, (0, out_pad - d_out)).reshape(1, out_pad)
    n_in_blocks = in_pad // block_in

    if act_quant:
        x8, sx = quantize_act_int8(xm)
        xp = jnp.pad(x8, ((0, m_pad - m), (0, in_pad - d_in)))
        sxp = jnp.pad(sx, ((0, m_pad - m), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_q_kernel_a8, n_in_blocks=n_in_blocks),
            grid=(m_pad // block_m, out_pad // block_out, n_in_blocks),
            in_specs=[
                pl.BlockSpec((block_m, block_in), lambda mi, o, i: (mi, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m, 1), lambda mi, o, i: (mi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_in, block_out), lambda mi, o, i: (i, o),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_out), lambda mi, o, i: (0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, block_out),
                                   lambda mi, o, i: (mi, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, out_pad), x.dtype),
            scratch_shapes=[pltpu.VMEM((block_m, block_out), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(xp, sxp, wp, sp)
        return out[:m, :d_out].reshape(*lead, d_out)

    xp = jnp.pad(xm, ((0, m_pad - m), (0, in_pad - d_in)))
    out = pl.pallas_call(
        functools.partial(_q_kernel, n_in_blocks=n_in_blocks),
        grid=(m_pad // block_m, out_pad // block_out, n_in_blocks),
        in_specs=[
            pl.BlockSpec((block_m, block_in), lambda mi, o, i: (mi, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_in, block_out), lambda mi, o, i: (i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_out), lambda mi, o, i: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_out), lambda mi, o, i: (mi, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, out_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xp, wp, sp)
    return out[:m, :d_out].reshape(*lead, d_out)


def _q4_kernel(x_ref, w_ref, s_ref, o_ref, acc_scr, *, n_in_blocks: int,
               group: int, n_gb: int):
    """int4 weight-only step: unpack the packed byte tile (shift/shift/
    concat, ~3 VPU ops per weight element on HALF the HBM bytes of int8),
    apply the per-(group, out-channel) scales, and feed the MXU.  Decode is
    weight-read bound, so halving the bytes ~halves the stream time.

    s_ref arrives as a (1, n_gb_pad, block_out) 3D block (groups-per-in-block
    in the SUBLANE dim, zero-padded to a multiple of 8 — Mosaic requires the
    last two block dims be (8, 128)-divisible or full; a raw (n_gb, block_out)
    block fails lowering whenever n_gb < 8)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = _unpack_int4(w_ref[:], group)                    # (n_g, G, block_out)
    s = s_ref[0][:n_gb]                                  # (n_gb, block_out)
    w = (q.astype(jnp.float32) * s[:, None, :]).astype(x_ref.dtype)
    w = w.reshape(-1, w.shape[-1])                       # (block_in, block_out)
    acc_scr[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == n_in_blocks - 1)
    def _flush():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("group", "impl", "block_in", "block_out",
                                    "act_quant"))
def int4_matmul(
    x: jax.Array,          # (..., in) activations (bf16 on the hot path)
    w4: jax.Array,         # (in/2, out) packed int8 (quantize_int4 layout)
    scale: jax.Array,      # (in/group, out) f32
    group: int = 128,
    impl: str = "pallas",
    block_in: int = 2048,
    block_out: int = 512,
    act_quant: bool = False,
) -> jax.Array:
    """act_quant=True is w4a8: per-token int8 activations, per-group exact
    int8×int8→int32 MXU dots with f32 group-scale accumulation — half the
    weight HBM of w8a8 at the int8 MXU rate."""
    *lead, d_in = x.shape
    assert w4.shape[0] * 2 == d_in, (w4.shape, d_in)
    d_out = w4.shape[1]
    g = _int4_group(d_in, group)
    if impl == "xla":
        if act_quant:
            x8, sx = quantize_act_int8(x)
            q = _unpack_int4(w4, g).astype(jnp.int32)       # (n_g, G, out)
            xg = x8.reshape(-1, d_in // g, g).astype(jnp.int32)
            part = jnp.einsum("mng,ngo->nmo", xg, q)        # exact int32
            y = (part.astype(jnp.float32)
                 * scale[:, None, :].astype(jnp.float32)).sum(axis=0)
            y = y * sx.reshape(-1, 1)
            return y.astype(x.dtype).reshape(*lead, d_out)
        w = dequantize_int4(w4, scale, g, jnp.float32)
        y = jax.lax.dot_general(
            x.astype(jnp.float32), w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    xm = x.reshape(-1, d_in)
    m = xm.shape[0]
    block_m = max(16, min(_rup(m, 16), 256))
    m_pad = _rup(max(m, 16), block_m)
    block_in = min(_rup(block_in, g), _rup(d_in, g))
    in_pad = _rup(d_in, block_in)
    # Mosaic block rule: the last two block dims must be (8, 128)-divisible
    # or equal to the array dims.  A multi-block contraction needs the x lane
    # block and the packed-weight sublane block to comply; otherwise collapse
    # to one in-block (full-dim blocks are always legal).
    if in_pad != block_in and (block_in % 128 != 0 or (block_in // 2) % 8):
        block_in = in_pad
    out_pad = _rup(d_out, block_out)
    xp = jnp.pad(xm, ((0, m_pad - m), (0, in_pad - d_in)))
    wp = jnp.pad(w4, ((0, (in_pad - d_in) // 2), (0, out_pad - d_out)))
    sp = jnp.pad(scale, ((0, (in_pad - d_in) // g), (0, out_pad - d_out)))
    n_in_blocks = in_pad // block_in
    # scales as (n_in_blocks, n_gb_pad, out) so the per-step block's last two
    # dims are (8, 128)-compliant even when groups-per-block < 8
    n_gb = block_in // g
    n_gb_pad = _rup(n_gb, 8)
    sp3 = jnp.pad(sp.reshape(n_in_blocks, n_gb, out_pad),
                  ((0, 0), (0, n_gb_pad - n_gb), (0, 0)))

    if act_quant:
        x8, sx = quantize_act_int8(xp)
        out = pl.pallas_call(
            functools.partial(_q4_kernel_a8, n_in_blocks=n_in_blocks,
                              group=g, n_gb=n_gb),
            grid=(m_pad // block_m, out_pad // block_out, n_in_blocks),
            in_specs=[
                pl.BlockSpec((block_m, block_in), lambda mi, o, i: (mi, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m, 1), lambda mi, o, i: (mi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_in // 2, block_out),
                             lambda mi, o, i: (i, o),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_gb_pad, block_out),
                             lambda mi, o, i: (i, 0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, block_out),
                                   lambda mi, o, i: (mi, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, out_pad), x.dtype),
            scratch_shapes=[pltpu.VMEM((block_m, block_out), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x8, sx, wp, sp3)
        return out[:m, :d_out].reshape(*lead, d_out)

    out = pl.pallas_call(
        functools.partial(_q4_kernel, n_in_blocks=n_in_blocks, group=g,
                          n_gb=n_gb),
        grid=(m_pad // block_m, out_pad // block_out, n_in_blocks),
        in_specs=[
            pl.BlockSpec((block_m, block_in), lambda mi, o, i: (mi, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_in // 2, block_out), lambda mi, o, i: (i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_gb_pad, block_out), lambda mi, o, i: (i, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_out), lambda mi, o, i: (mi, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, out_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xp, wp, sp3)
    return out[:m, :d_out].reshape(*lead, d_out)


def _ffn_kernel(x_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
                o_ref, acc_scr, *, n_j: int):
    """Whole SwiGLU FFN in one launch: per j-block of the intermediate dim
    compute gate/up columns, apply silu*mul in VMEM, and accumulate the down
    projection — the (m, intermediate) activation never touches HBM and the
    per-layer pallas launch count drops 2 -> 1 (launch overhead is the int8
    equal-batch gap vs bf16, docs/benchmarks.md)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[:]                                        # (block_m, hidden) bf16
    g = jax.lax.dot_general(
        x, wg_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sg_ref[:].astype(jnp.float32)
    u = jax.lax.dot_general(
        x, wu_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * su_ref[:].astype(jnp.float32)
    h = (g * jax.lax.logistic(g) * u).astype(x.dtype)   # silu(g) * u
    acc_scr[:] += jax.lax.dot_general(
        h, wd_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_j - 1)
    def _flush():
        o_ref[:] = (acc_scr[:] * sd_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _ffn_kernel_a8(x_ref, sx_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref,
                   sd_ref, o_ref, acc_scr, *, n_j: int):
    """w8a8 SwiGLU FFN: gate/up run as int8×int8→int32 MXU dots (activations
    pre-quantized per token by the caller); the (block_m, block_j) hidden
    activation h = silu(g)·u is REQUANTIZED per row *per j-block* in VMEM
    (exact algebra: per-block row scales multiply the block's int32 down
    partial before the f32 accumulate), so the down projection also runs
    int8 on the MXU.  Per-element VPU work is O(m·block_j) per step instead
    of O(hidden·block_j + block_j·hidden) weight converts."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x8 = x_ref[:]                                       # (block_m, hidden) i8
    sx = sx_ref[:].astype(jnp.float32)                  # (block_m, 1)
    g = jax.lax.dot_general(
        x8, wg_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32
    ).astype(jnp.float32) * sx * sg_ref[:].astype(jnp.float32)
    u = jax.lax.dot_general(
        x8, wu_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32
    ).astype(jnp.float32) * sx * su_ref[:].astype(jnp.float32)
    h = g * jax.lax.logistic(g) * u                     # silu(g)*u, f32
    habs = jnp.max(jnp.abs(h), axis=-1, keepdims=True)  # (block_m, 1)
    sh = jnp.maximum(habs / 127.0, 1e-12)
    h8 = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)
    part = jax.lax.dot_general(
        h8, wd_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)               # (block_m, hidden) i32
    acc_scr[:] += part.astype(jnp.float32) * sh

    @pl.when(j == n_j - 1)
    def _flush():
        o_ref[:] = (acc_scr[:] * sd_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_j", "act_quant"))
def int8_ffn(
    x: jax.Array,            # (..., hidden) activations (bf16 hot path)
    wg8: jax.Array,          # (hidden, inter) int8 gate
    sg: jax.Array,           # (inter,) f32
    wu8: jax.Array,          # (hidden, inter) int8 up
    su: jax.Array,           # (inter,) f32
    wd8: jax.Array,          # (inter, hidden) int8 down
    sd: jax.Array,           # (hidden,) f32
    block_j: int = 256,
    act_quant: bool = False,
) -> jax.Array:
    """down(silu(x@gate) * (x@up)) with int8 weights, one pallas launch."""
    *lead, hidden = x.shape
    inter = wg8.shape[1]
    assert hidden <= 8192, "fused FFN keeps the full hidden contraction in VMEM"
    xm = x.reshape(-1, hidden)
    m = xm.shape[0]
    min_m = 32 if act_quant else 16
    block_m = max(min_m, min(_rup(m, min_m), 128))
    m_pad = _rup(max(m, min_m), block_m)
    j_pad = _rup(inter, block_j)
    xp = jnp.pad(xm, ((0, m_pad - m), (0, 0)))
    if j_pad != inter:
        wg8 = jnp.pad(wg8, ((0, 0), (0, j_pad - inter)))
        wu8 = jnp.pad(wu8, ((0, 0), (0, j_pad - inter)))
        wd8 = jnp.pad(wd8, ((0, j_pad - inter), (0, 0)))
        sg = jnp.pad(sg, (0, j_pad - inter))
        su = jnp.pad(su, (0, j_pad - inter))
    n_j = j_pad // block_j

    w_specs = [
        pl.BlockSpec((hidden, block_j), lambda mi, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_j), lambda mi, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, block_j), lambda mi, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_j), lambda mi, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_j, hidden), lambda mi, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda mi, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    w_args = (wg8, sg.reshape(1, -1), wu8, su.reshape(1, -1), wd8,
              sd.reshape(1, -1))

    if act_quant:
        x8, sx = quantize_act_int8(xp)
        out = pl.pallas_call(
            functools.partial(_ffn_kernel_a8, n_j=n_j),
            grid=(m_pad // block_m, n_j),
            in_specs=[
                pl.BlockSpec((block_m, hidden), lambda mi, j: (mi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m, 1), lambda mi, j: (mi, 0),
                             memory_space=pltpu.VMEM),
            ] + w_specs,
            out_specs=pl.BlockSpec((block_m, hidden), lambda mi, j: (mi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, hidden), x.dtype),
            scratch_shapes=[pltpu.VMEM((block_m, hidden), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x8, sx, *w_args)
        return out[:m].reshape(*lead, hidden)

    out = pl.pallas_call(
        functools.partial(_ffn_kernel, n_j=n_j),
        grid=(m_pad // block_m, n_j),
        in_specs=[
            pl.BlockSpec((block_m, hidden), lambda mi, j: (mi, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((block_m, hidden), lambda mi, j: (mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, hidden), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xp, *w_args)
    return out[:m].reshape(*lead, hidden)


def _ffn_kernel_q4(x_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
                   o_ref, acc_scr, *, n_j: int, group_h: int, group_i: int,
                   n_gj: int):
    """int4 SwiGLU FFN in one launch: unpack + dequantize each weight tile
    in VMEM (group scales applied before the dot, so the fusion is exact),
    silu*mul stays in VMEM, down projection accumulates per j-block.  Halves
    the FFN weight HBM of the int8 kernel — the latency-tier (small-batch)
    decode is weight-read bound.

    sd_ref arrives as a (1, n_gj_pad, hidden) 3D block — this j-block's down
    group scales with the sublane dim zero-padded to a multiple of 8 (Mosaic
    block rule; a raw (n_gj, hidden) block fails lowering when n_gj < 8)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[:]                                        # (block_m, hidden) bf16

    def dq(w_ref, s, group):
        q = _unpack_int4(w_ref[:], group)               # (n_g, G, cols) int8
        w = (q.astype(jnp.float32) * s[:, None, :]).astype(x.dtype)
        return w.reshape(-1, w.shape[-1])

    g = jax.lax.dot_general(
        x, dq(wg_ref, sg_ref[:], group_h), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    u = jax.lax.dot_general(
        x, dq(wu_ref, su_ref[:], group_h), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = (g * jax.lax.logistic(g) * u).astype(x.dtype)   # silu(g) * u
    acc_scr[:] += jax.lax.dot_general(
        h, dq(wd_ref, sd_ref[0][:n_gj], group_i), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_j - 1)
    def _flush():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


def _ffn_kernel_q4_a8(x_ref, sx_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref,
                      sd_ref, o_ref, h8_scr, acc_scr, *, n_j: int,
                      group_h: int, group_i: int, n_gh: int, n_gj: int):
    """w4a8 SwiGLU FFN: int8 activations × int4 weights in ONE launch — half
    of w8a8's FFN weight HBM at the int8 MXU rate.  Group scales vary along
    every contraction, so gate/up/down each dot one scale group at a time
    (exact int8×int8→int32 MXU dots whose int32 partials are scaled by the
    group's f32 row before accumulation — the `_q4_kernel_a8` scheme); the
    hidden activation h = silu(g)·u is requantized per row per j-block in
    VMEM (the `_ffn_kernel_a8` scheme) via an int8 scratch.  The group loops
    are UNROLLED (group counts are static) so every ref slice has a static
    start — the per-group scale rows (stride 1) aren't 8-aligned, which
    Mosaic's dynamic sublane slices want.  sd_ref is this j-block's
    (1, n_gj_pad, hidden) 3D scale block (see `_ffn_kernel_q4`)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    sx = sx_ref[:].astype(jnp.float32)               # (block_m, 1)
    half_h = group_h // 2

    def _unpack(wblk):
        # int32 shifts: Mosaic does not legalize shifts on int8 vectors
        w32 = wblk.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
        hi = jnp.right_shift(w32, 4)
        return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)

    z = jnp.zeros((x_ref.shape[0], wg_ref.shape[1]), jnp.float32)
    acc_g, acc_u = z, z
    for gi in range(n_gh):
        xg = x_ref[:, gi * group_h:(gi + 1) * group_h]   # (block_m, G_h) int8

        def dot1(w_ref, s_ref, gi=gi, xg=xg):
            q = _unpack(w_ref[gi * half_h:(gi + 1) * half_h, :])
            part = jax.lax.dot_general(
                xg, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return part.astype(jnp.float32) * s_ref[gi:gi + 1, :].astype(
                jnp.float32)

        acc_g = acc_g + dot1(wg_ref, sg_ref)
        acc_u = acc_u + dot1(wu_ref, su_ref)

    g = acc_g * sx
    u = acc_u * sx
    h = g * jax.lax.logistic(g) * u                  # silu(g)·u, f32
    habs = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    sh = jnp.maximum(habs / 127.0, 1e-12)            # (block_m, 1)
    h8_scr[:] = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)
    half_i = group_i // 2

    down = jnp.zeros_like(acc_scr)
    for gj in range(n_gj):
        q = _unpack(wd_ref[gj * half_i:(gj + 1) * half_i, :])  # (G_i, hidden)
        hg = h8_scr[:, gj * group_i:(gj + 1) * group_i]
        part = jax.lax.dot_general(
            hg, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        down = down + part.astype(jnp.float32) * sd_ref[0, gj:gj + 1, :].astype(
            jnp.float32)

    acc_scr[:] += down * sh

    @pl.when(j == n_j - 1)
    def _flush():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


def _q4_kernel_a8(x_ref, sx_ref, w_ref, s_ref, o_ref, acc_scr, *,
                  n_in_blocks: int, group: int, n_gb: int):
    """w4a8 step: int8 activations × int4 weights.  Group scales do NOT
    factor out of the contraction (they vary along it), so the kernel dots
    one scale group at a time — each an exact int8×int8→int32 MXU dot whose
    int32 partial is scaled by its group's f32 row before accumulation.
    Weight HBM is HALF of w8a8's; the dots stay on the int8 MXU path.

    The group loop is UNROLLED (n_gb is static) so every ref slice has a
    static start — Mosaic's dynamic sublane slices want 8-aligned starts,
    and the per-group scale row (stride 1) isn't.  s_ref is the 3D
    (1, n_gb_pad, block_out) layout (see `_q4_kernel`)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    half = group // 2
    acc = jnp.zeros_like(acc_scr)
    for gi in range(n_gb):
        wblk = w_ref[gi * half:(gi + 1) * half, :]       # packed (G/2, bo)
        # int32 shifts: Mosaic does not legalize shifts on int8 vectors
        w32 = wblk.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
        hi = jnp.right_shift(w32, 4)
        q = jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)
        xg = x_ref[:, gi * group:(gi + 1) * group]       # (block_m, G) int8
        part = jax.lax.dot_general(
            xg, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        sg = s_ref[0, gi:gi + 1, :].astype(jnp.float32)  # (1, bo)
        acc = acc + part.astype(jnp.float32) * sg

    acc_scr[:] += acc

    @pl.when(i == n_in_blocks - 1)
    def _flush():
        o_ref[:] = (acc_scr[:] * sx_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "impl", "block_j",
                                              "act_quant"))
def int4_ffn(
    x: jax.Array,            # (..., hidden) activations (bf16 hot path)
    wg4: jax.Array,          # (hidden/2, inter) packed int4 gate
    sg: jax.Array,           # (hidden/g_h, inter) f32 group scales
    wu4: jax.Array,          # (hidden/2, inter) packed int4 up
    su: jax.Array,           # (hidden/g_h, inter) f32
    wd4: jax.Array,          # (inter/2, hidden) packed int4 down
    sd: jax.Array,           # (inter/g_i, hidden) f32
    group: int = 128,
    impl: str = "pallas",
    block_j: int = 256,
    act_quant: bool = False,
) -> jax.Array:
    """down(silu(x@gate) * (x@up)) with int4 weights, one pallas launch
    (the int8_ffn analog for the latency tier; group scales make the fusion
    exact).  act_quant=True is the w4a8 FFN: per-token int8 activations and
    a per-row-per-j-block requantized hidden activation keep all three
    contractions on the int8 MXU path (`_ffn_kernel_q4_a8`)."""
    *lead, hidden = x.shape
    inter = sg.shape[1]
    g_h = _int4_group(hidden, group)
    g_i = _int4_group(inter, group)
    if impl == "xla":
        if act_quant:
            # composition of the w4a8 matmul (numerics oracle for the fused
            # kernel; the kernel requantizes h per j-block, this path per
            # full row — both within the activation-quant error envelope)
            g = int4_matmul(x, wg4, sg, group=g_h, impl="xla", act_quant=True)
            u = int4_matmul(x, wu4, su, group=g_h, impl="xla", act_quant=True)
            h = (jax.nn.silu(g.astype(jnp.float32))
                 * u.astype(jnp.float32)).astype(x.dtype)
            return int4_matmul(h, wd4, sd, group=g_i, impl="xla",
                               act_quant=True)
        w_g = dequantize_int4(wg4, sg, g_h, jnp.float32)
        w_u = dequantize_int4(wu4, su, g_h, jnp.float32)
        w_d = dequantize_int4(wd4, sd, g_i, jnp.float32)
        xf = x.astype(jnp.float32)
        h = jax.nn.silu(xf @ w_g) * (xf @ w_u)
        return (h @ w_d).astype(x.dtype)

    assert hidden <= 8192, "fused FFN keeps the full hidden contraction in VMEM"
    xm = x.reshape(-1, hidden)
    m = xm.shape[0]
    min_m = 32 if act_quant else 16
    block_m = max(min_m, min(_rup(m, min_m), 128))
    m_pad = _rup(max(m, min_m), block_m)
    # the j-block must cover whole scale groups of the down projection
    block_j = max(g_i, (min(block_j, _rup(inter, g_i)) // g_i) * g_i)
    j_pad = _rup(inter, block_j)
    # Mosaic block rule: lane block dims must be 128-divisible or full
    if j_pad != block_j and block_j % 128 != 0:
        block_j = j_pad
    xp = jnp.pad(xm, ((0, m_pad - m), (0, 0)))
    if j_pad != inter:
        wg4 = jnp.pad(wg4, ((0, 0), (0, j_pad - inter)))
        wu4 = jnp.pad(wu4, ((0, 0), (0, j_pad - inter)))
        sg = jnp.pad(sg, ((0, 0), (0, j_pad - inter)))
        su = jnp.pad(su, ((0, 0), (0, j_pad - inter)))
        # padded groups have zero scales -> dequantize to exact zeros
        wd4 = jnp.pad(wd4, ((0, (j_pad - inter) // 2), (0, 0)))
        sd = jnp.pad(sd, ((0, (j_pad - inter) // g_i), (0, 0)))
    n_j = j_pad // block_j
    # down scales as (n_j, n_gj_pad, hidden): per-step 3D block whose last two
    # dims are (8, 128)-compliant even when groups-per-j-block < 8
    n_gj = block_j // g_i
    n_gj_pad = _rup(n_gj, 8)
    sd3 = jnp.pad(sd.reshape(n_j, n_gj, hidden),
                  ((0, 0), (0, n_gj_pad - n_gj), (0, 0)))

    w_specs = [
        pl.BlockSpec((hidden // 2, block_j), lambda mi, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden // g_h, block_j), lambda mi, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden // 2, block_j), lambda mi, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden // g_h, block_j), lambda mi, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_j // 2, hidden), lambda mi, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_gj_pad, hidden), lambda mi, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    w_args = (wg4, sg, wu4, su, wd4, sd3)

    if act_quant:
        x8, sx = quantize_act_int8(xp)
        out = pl.pallas_call(
            functools.partial(_ffn_kernel_q4_a8, n_j=n_j, group_h=g_h,
                              group_i=g_i, n_gh=hidden // g_h,
                              n_gj=n_gj),
            grid=(m_pad // block_m, n_j),
            in_specs=[
                pl.BlockSpec((block_m, hidden), lambda mi, j: (mi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m, 1), lambda mi, j: (mi, 0),
                             memory_space=pltpu.VMEM),
            ] + w_specs,
            out_specs=pl.BlockSpec((block_m, hidden), lambda mi, j: (mi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, hidden), x.dtype),
            scratch_shapes=[pltpu.VMEM((block_m, block_j), jnp.int8),
                            pltpu.VMEM((block_m, hidden), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x8, sx, *w_args)
        return out[:m].reshape(*lead, hidden)

    out = pl.pallas_call(
        functools.partial(_ffn_kernel_q4, n_j=n_j, group_h=g_h, group_i=g_i,
                          n_gj=n_gj),
        grid=(m_pad // block_m, n_j),
        in_specs=[
            pl.BlockSpec((block_m, hidden), lambda mi, j: (mi, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((block_m, hidden), lambda mi, j: (mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, hidden), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xp, *w_args)
    return out[:m].reshape(*lead, hidden)


def quantize_tree(params, *, targets: tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_proj", "up_proj", "down_proj", "lm_head"),
        fuse: bool = True,
        ffn_kernel: bool = False,
        lora=None,
        bits: int = 8,
        group: int = 128):
    """Convert an LLM param tree for int8 serving: every `kernel` leaf under
    a targeted projection becomes {kernel_q: int8, scale: f32}.  The tree
    then matches what `Int8Dense` (models/llm.py) expects.

    bits=4 instead produces the `Int4Dense` layout {kernel_q: packed int8
    (in/2, out), scale_g: f32 (in/group, out)} (quantize_int4) — half the
    serving HBM of int8 for the latency tier.

    If the tree carries trained LoRA adapters (lora_a/lora_b leaves), pass
    the `LoRAConfig` used in training: the deltas are merged into the base
    kernels (W + alpha/rank A@B, models/lora.merge_lora_scaled) BEFORE
    quantization and the adapter leaves are dropped from the output.
    Quantizing a LoRA tree WITHOUT the config raises — silently quantizing
    only the frozen base would serve the un-fine-tuned model.

    fuse=True additionally merges q/k/v -> qkv_proj and gate/up ->
    gateup_proj along the output axis (the layout `LLMConfig.quant_fused`
    models expect): per-output-channel scales make the fusion numerically
    EXACT, and it cuts the pallas launches per decode step from 7 to 4 per
    layer — launch overhead is the gap to bf16 at batch 8
    (docs/benchmarks.md).

    ffn_kernel=True keeps gate/up/down as SEPARATE quantized leaves — the
    layout `LLMConfig.quant_ffn_kernel` models expect, where the whole FFN
    runs as one `int8_ffn` / `int4_ffn` pallas launch (gateup concat would
    be wasted there)."""
    assert bits in (8, 4), bits

    def _q(kernel):
        if bits == 4:
            w4, s = quantize_int4(kernel, group=group)
            return {"kernel_q": w4, "scale_g": s}
        w8, s = quantize_int8(kernel)
        return {"kernel_q": w8, "scale": s}

    leaf_keys = [
        tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]
    has_lora = any(k[-1] in ("lora_a", "lora_b") for k in leaf_keys)
    if has_lora:
        if lora is None:
            raise ValueError(
                "param tree contains LoRA adapters (lora_a/lora_b); pass the "
                "training LoRAConfig so the deltas are merged before "
                "quantization (quantize_tree(..., lora=cfg))")
        from ctpa.models.lora import merge_lora_scaled

        params = merge_lora_scaled(params, lora.alpha, lora.rank)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: dict = {}
    pending: dict = {}   # parent-path tuple -> {proj_name: kernel}

    def assign(d, keys, val):
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = val

    FUSE_GROUPS = {
        "qkv_proj": ("q_proj", "k_proj", "v_proj"),
    }
    if not ffn_kernel:
        FUSE_GROUPS["gateup_proj"] = ("gate_proj", "up_proj")
    fused_members = {m for g in FUSE_GROUPS.values() for m in g} if fuse else set()

    for kp, leaf in flat:
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in kp]
        if has_lora and keys[-1] in ("lora_a", "lora_b"):
            continue                     # merged above; Int8Dense has no slot
        if keys[-1] == "kernel" and any(t in keys for t in targets):
            # LoRADense nests its frozen projection as <proj>/base/kernel;
            # Int8Dense replaces the whole LoRADense, so collapse that level
            base = keys[:-1]
            if base and base[-1] == "base":
                base = base[:-1]
            proj = base[-1]
            if proj in fused_members:
                pending.setdefault(tuple(base[:-1]), {})[proj] = leaf
                continue
            for pname, pval in _q(leaf).items():
                assign(out, base + [pname], pval)
        else:
            assign(out, keys, leaf)

    for parent, kernels in pending.items():
        consumed = set()
        for fused_name, members in FUSE_GROUPS.items():
            if not any(m in kernels for m in members):
                continue
            if not all(m in kernels for m in members):
                missing = [m for m in members if m not in kernels]
                raise ValueError(
                    f"fuse group {fused_name} incomplete under "
                    f"{'/'.join(map(str, parent))}: missing {missing} "
                    f"(pass fuse=False or include all group members in "
                    f"targets)")
            w = jnp.concatenate([kernels[m] for m in members], axis=1)
            for pname, pval in _q(w).items():
                assign(out, list(parent) + [fused_name, pname], pval)
            consumed.update(members)
        leftover = set(kernels) - consumed
        if leftover:
            raise AssertionError(f"unconsumed fused members {leftover}")
    return out
