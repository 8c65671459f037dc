"""Decoder-only LLM (llama-2 / Meditron-7B geometry) with a KV-cached,
fully-jitted decode path.

Replaces the reference's HF `AutoModelForCausalLM` dependency
(vqa_meditron.py:425-426, train_module.py:307-313) with a flax implementation
whose parameter tree maps 1:1 to HF llama weights (see ctpa/data/hf_import.py)
and whose decode loop is the single largest performance win over the
reference: model_components.py:232-261 re-runs the FULL prefix every step
(O(n² · L)); here decode is a `lax.while_loop` over a static-shape KV cache —
one token per step, O(n · L), everything on-device.

TPU-native notes:
  * GQA-capable attention (num_kv_heads <= num_heads) as batched MXU matmuls.
  * KV cache is a pytree of head-major (b, kv_heads, max_len, head_dim)
    buffers (stacked over layers) updated with `lax.dynamic_update_slice` —
    static shapes, in-place under XLA, and the decode dot reads each layer's
    slice copy-free (see KVCache docstring for the measured layout effect).
  * Sharding: attention/MLP projections annotated with logical axes so pjit
    can TP-shard them over the 'model' mesh axis (nn.with_partitioning).
  * LoRA overlays on q/k/v/o via LoRADense (ctpa/models/lora.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctpa.core.config import LLMConfig, LoRAConfig
from ctpa.models.lora import LoRADense
from ctpa.ops.rotary import apply_rope, rope_frequencies


class Int8Dense(nn.Module):
    """Weight-only int8 projection for serving (ops/quant.py): params are
    {kernel_q: int8 (in, out), scale: f32 (out,)} as produced by
    `quant.quantize_tree`.  Activations stay in `dtype`; the matmul reads
    int8 weights from HBM (half the bytes of bf16 — decode is weight-read
    bound) and dequantizes in-register."""

    features: int
    impl: str = "pallas"          # "pallas" | "xla" (ops/quant.int8_matmul)
    dtype: jnp.dtype = jnp.bfloat16
    act_quant: bool = False       # w8a8: int8×int8→int32 MXU contraction

    @nn.compact
    def __call__(self, x):
        from ctpa.ops.quant import int8_matmul

        w8 = self.param("kernel_q", nn.initializers.zeros,
                        (x.shape[-1], self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        return int8_matmul(x.astype(self.dtype), w8, scale, impl=self.impl,
                           act_quant=self.act_quant)


class Int4Dense(nn.Module):
    """Weight-only int4 projection for serving (ops/quant.py): params are
    {kernel_q: packed int8 (in/2, out), scale_g: f32 (in/group, out)} as
    produced by `quant.quantize_tree(bits=4)`.  Half the HBM bytes of int8
    — decode is weight-read bound, so this is the latency-serving tier
    (int4 noise ~10x int8's; gate quality with the e2e greedy tests)."""

    features: int
    impl: str = "pallas"          # "pallas" | "xla" (ops/quant.int4_matmul)
    dtype: jnp.dtype = jnp.bfloat16
    group: int = 128
    act_quant: bool = False       # w4a8: per-group int8×int8→int32 MXU dots

    @nn.compact
    def __call__(self, x):
        from ctpa.ops.quant import _int4_group, int4_matmul

        d_in = x.shape[-1]
        g = _int4_group(d_in, self.group)
        w4 = self.param("kernel_q", nn.initializers.zeros,
                        (d_in // 2, self.features), jnp.int8)
        s = self.param("scale_g", nn.initializers.ones,
                       (d_in // g, self.features), jnp.float32)
        return int4_matmul(x.astype(self.dtype), w4, s, group=g,
                           impl=self.impl, act_quant=self.act_quant)


def _quant_dense(cfg, features, dtype, name):
    """The serving projection for cfg.weight_quant ('int8' or 'int4')."""
    if cfg.weight_quant == "int4":
        return Int4Dense(features, impl=cfg.quant_impl, dtype=dtype,
                         group=getattr(cfg, "quant_group", 128),
                         act_quant=getattr(cfg, "quant_act", False), name=name)
    return Int8Dense(features, impl=cfg.quant_impl, dtype=dtype,
                     act_quant=getattr(cfg, "quant_act", False), name=name)


class _Int8Weights(nn.Module):
    """Bare {kernel_q, scale} holder matching quantize_tree's unfused layout
    (used by the fused int8 FFN kernel, which consumes the raw leaves)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return (self.param("kernel_q", nn.initializers.zeros, self.shape,
                           jnp.int8),
                self.param("scale", nn.initializers.ones, (self.shape[1],),
                           jnp.float32))


class _Int4Weights(nn.Module):
    """Bare {kernel_q, scale_g} holder matching quantize_tree(bits=4)'s
    unfused layout (consumed by the fused int4 FFN kernel)."""

    shape: tuple
    group: int = 128

    @nn.compact
    def __call__(self):
        from ctpa.ops.quant import _int4_group

        g = _int4_group(self.shape[0], self.group)
        return (self.param("kernel_q", nn.initializers.zeros,
                           (self.shape[0] // 2, self.shape[1]), jnp.int8),
                self.param("scale_g", nn.initializers.ones,
                           (self.shape[0] // g, self.shape[1]), jnp.float32))


def _proj(cfg: LLMConfig, features: int, name: str, dtype,
          lora: Optional[LoRAConfig] = None, lora_name: Optional[str] = None):
    """Projection factory: int8/int4-quantized for serving when
    cfg.weight_quant is set (LoRA overlays are a training feature and are
    rejected in that mode), LoRADense otherwise."""
    if getattr(cfg, "weight_quant", None) in ("int8", "int4"):
        if lora is not None and lora_name in (lora.target_projections or ()):
            raise ValueError("LoRA overlays are not supported with "
                             "quantized weights (merge adapters first)")
        return _quant_dense(cfg, features, dtype, name)
    if lora_name is not None:
        return LoRADense(features, dtype=dtype, name=name,
                         **_lora_args(lora, lora_name))
    return nn.Dense(features, use_bias=False, dtype=dtype, name=name)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * w).astype(x.dtype)


class KVCache(NamedTuple):
    """Static-shape KV cache, stored HEAD-MAJOR: (L, b, kv_heads, max_len,
    head_dim).

    Why head-major: decode attention contracts q (b, h, d) against each
    layer's K/V over (m, d) pairs per head, i.e. the dot wants the slice
    laid out (b, h, m, d).  When the cache crosses a program boundary with
    a pinned layout (serving insert/decode programs, pallas BlockSpecs), a
    token-major cache (b, m, h, d) forces a relayout copy of every layer's
    slice EVERY step — measured 29.2 vs 8.3 ms/step of pure attention at
    7B-geometry b16 × m608 int8 when the cache is a program ARGUMENT
    (docs/ROUND3_NOTES.md, layout experiment).  Inside a single generate()
    program XLA may pick an equivalent physical layout for the carry
    either way (end-to-end A/B was layout-neutral there); head-major makes
    the good layout the canonical one so kernels and cross-program serving
    never depend on the compiler's choice.

    `write_offset` (b,) is each sequence's next free SLOT (prefill fills
    [off, off+n), each decode step one slot); per-sequence offsets make
    continuous batching possible (lanes at different depths).  `true_len`
    (b,) counts REAL tokens per sequence and drives RoPE positions; with
    right-padded prompts the pad writes land in slots marked invalid and are
    never attended.

    Quantized caches (cfg.kv_quant): int8 stores int8 rows with
    per-(kv-head, token) absmax scales (L, b, kvh, m); int4 stores
    nibble-packed rows (head_dim/2 bytes) with per-(kv-head, token,
    head_dim-group) scales (L, b, kvh, m, hd/group) — ops/quant.
    quantize_kv_int4.  Every slot-axis operation below (align, insert,
    rollback) treats scales by their m axis (3), which both ranks share."""

    k: jax.Array            # (layers, b, kv_heads, max_len, head_dim[/2])
    v: jax.Array
    write_offset: jax.Array  # (b,) int32 next free slot per sequence
    true_len: jax.Array      # (b,) real-token count per sequence
    valid: jax.Array         # (b, max_len) slot holds a real token's kv
    # quantized KV scales (see class docstring); None for fp caches
    k_scale: Optional[jax.Array] = None   # (L, b, kvh, max_len[, groups]) f32
    v_scale: Optional[jax.Array] = None

    @classmethod
    def create(cls, cfg: LLMConfig, batch: int, max_len: Optional[int] = None,
               dtype=jnp.bfloat16):
        max_len = max_len or cfg.max_seq_len
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        if getattr(cfg, "kv_quant", None) == "int8":
            return cls(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                write_offset=jnp.zeros((batch,), jnp.int32),
                true_len=jnp.zeros((batch,), jnp.int32),
                valid=jnp.zeros((batch, max_len), bool),
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        if getattr(cfg, "kv_quant", None) == "int4":
            from ctpa.ops.quant import _int4_group

            gs = _int4_group(cfg.head_dim, getattr(cfg, "kv_quant_group", 32))
            sdt = jnp.dtype(getattr(cfg, "kv_scale_dtype", "float32"))
            pshape = shape[:-1] + (cfg.head_dim // 2,)
            sshape = shape[:-1] + (cfg.head_dim // gs,)
            return cls(
                k=jnp.zeros(pshape, jnp.int8), v=jnp.zeros(pshape, jnp.int8),
                write_offset=jnp.zeros((batch,), jnp.int32),
                true_len=jnp.zeros((batch,), jnp.int32),
                valid=jnp.zeros((batch, max_len), bool),
                k_scale=jnp.zeros(sshape, sdt),
                v_scale=jnp.zeros(sshape, sdt),
            )
        return cls(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            write_offset=jnp.zeros((batch,), jnp.int32),
            true_len=jnp.zeros((batch,), jnp.int32),
            valid=jnp.zeros((batch, max_len), bool),
        )


def align_lane_to_clock(lane: KVCache, clock: jax.Array) -> KVCache:
    """Rotate a freshly-prefilled single-lane cache (slots [0, n)) so its
    last written token lands at slot (clock - 1) mod m, and stamp its
    write_offset with the unwrapped global clock.

    This is the ring-buffer alignment that lets EVERY serving lane share one
    decode write slot: after alignment all lanes' write_offsets are the same
    scalar clock, so decode steps use the shared_kv_offset fast path (one
    batch-wide dynamic_update_slice, ~6 ms/step cheaper than the per-lane
    scatter at 7B b32 — docs/ROUND3_NOTES.md).  Correctness relies on the
    n == 1 validity-only attention mask (slot order stops being token order
    after a wrap) and on the lane's live window n + max_new + chunk slack
    fitting in m (asserted by ContinuousBatcher.submit)."""
    m = lane.k.shape[3]
    n = lane.write_offset[0]
    shift = (clock - n) % m
    slot_perm = (jnp.arange(m) - shift) % m      # new[s] = old[(s - shift) % m]
    return KVCache(
        k=jnp.take(lane.k, slot_perm, axis=3),
        v=jnp.take(lane.v, slot_perm, axis=3),
        write_offset=jnp.full_like(lane.write_offset, clock),
        true_len=lane.true_len,
        valid=jnp.take(lane.valid, slot_perm, axis=1),
        k_scale=(None if lane.k_scale is None
                 else jnp.take(lane.k_scale, slot_perm, axis=3)),
        v_scale=(None if lane.v_scale is None
                 else jnp.take(lane.v_scale, slot_perm, axis=3)),
    )


def insert_lane(big: KVCache, lane: KVCache, idx: jax.Array) -> KVCache:
    """Write a 1-lane cache into lane `idx` of a batched cache (serving:
    prefill runs at batch 1, decode runs over all lanes)."""
    import jax.lax as lax

    return KVCache(
        k=lax.dynamic_update_slice_in_dim(big.k, lane.k, idx, axis=1),
        v=lax.dynamic_update_slice_in_dim(big.v, lane.v, idx, axis=1),
        write_offset=lax.dynamic_update_slice_in_dim(
            big.write_offset, lane.write_offset, idx, axis=0),
        true_len=lax.dynamic_update_slice_in_dim(
            big.true_len, lane.true_len, idx, axis=0),
        valid=lax.dynamic_update_slice_in_dim(big.valid, lane.valid, idx, axis=0),
        k_scale=(None if big.k_scale is None else lax.dynamic_update_slice_in_dim(
            big.k_scale, lane.k_scale, idx, axis=1)),
        v_scale=(None if big.v_scale is None else lax.dynamic_update_slice_in_dim(
            big.v_scale, lane.v_scale, idx, axis=1)),
    )


def insert_lanes(big: KVCache, lane: KVCache, idxs: jax.Array) -> KVCache:
    """Write ONE aligned 1-lane cache into MULTIPLE lanes of a batched cache
    in a single scatter (batched shared-prefix admission: every request of
    the serving pipeline shares the same prefilled prompt KV, so admission
    of a whole burst is one program instead of one insert per request).
    Duplicate indices in `idxs` are safe — all writes carry identical
    content, so scatter write-order doesn't matter (the caller pads the
    index vector to a fixed length by repeating the last real lane, keeping
    the program shape static)."""
    q = idxs.shape[0]

    def bc(x, lane_axis):
        shape = list(x.shape)
        shape[lane_axis] = q
        return jnp.broadcast_to(x, shape)

    return KVCache(
        k=big.k.at[:, idxs].set(bc(lane.k, 1)),
        v=big.v.at[:, idxs].set(bc(lane.v, 1)),
        write_offset=big.write_offset.at[idxs].set(bc(lane.write_offset, 0)),
        true_len=big.true_len.at[idxs].set(bc(lane.true_len, 0)),
        valid=big.valid.at[idxs].set(bc(lane.valid, 0)),
        k_scale=(None if big.k_scale is None
                 else big.k_scale.at[:, idxs].set(bc(lane.k_scale, 1))),
        v_scale=(None if big.v_scale is None
                 else big.v_scale.at[:, idxs].set(bc(lane.v_scale, 1))),
    )


def _lora_args(lora: Optional[LoRAConfig], name: str) -> dict:
    if lora is not None and name in lora.target_projections:
        return {"rank": lora.rank, "alpha": lora.alpha}
    return {"rank": 0}


class LlamaAttention(nn.Module):
    cfg: LLMConfig
    lora: Optional[LoRAConfig] = None
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x, positions, kv_write_index, cache_k=None, cache_v=None,
                 attn_mask=None, key_mask=None):
        """x: (b, n, d). If cache_k/v given — the FULL stacked cache buffers,
        head-major (num_layers, b, kvh, max_len, hd) — new k/v rows are
        written at slot kv_write_index of layer self.layer_idx and attention
        runs over this layer's slice; returns (out, new_cache_k, new_cache_v).

        self.use_flash routes the no-cache (training / long-prefill)
        attention through the pallas flash kernel with causal + key_mask
        (b, n) semantics instead of the dense attn_mask path."""
        c = self.cfg
        h, kvh, hd = c.num_heads, c.num_kv_heads, c.head_dim
        b, n, _ = x.shape

        if getattr(c, "weight_quant", None) in ("int8", "int4") and c.quant_fused:
            # fused qkv projection (quantize_tree(fuse=True) layout): one
            # quantized kernel launch instead of three; exact because scales
            # are per-output-channel (int8) / per-(group, out) (int4)
            if self.lora is not None and any(
                    t in (self.lora.target_projections or ())
                    for t in ("q_proj", "k_proj", "v_proj")):
                raise ValueError("LoRA overlays are not supported with "
                                 "quantized weights (merge adapters first)")
            qkv = _quant_dense(c, h * hd + 2 * kvh * hd, self.dtype,
                               "qkv_proj")(x)
            q, k, v = (qkv[..., : h * hd],
                       qkv[..., h * hd : h * hd + kvh * hd],
                       qkv[..., h * hd + kvh * hd :])
        else:
            q = _proj(c, h * hd, "q_proj", self.dtype, self.lora, "q_proj")(x)
            k = _proj(c, kvh * hd, "k_proj", self.dtype, self.lora, "k_proj")(x)
            v = _proj(c, kvh * hd, "v_proj", self.dtype, self.lora, "v_proj")(x)
        q = q.reshape(b, n, h, hd)
        k = k.reshape(b, n, kvh, hd)
        v = v.reshape(b, n, kvh, hd)

        cos, sin = rope_frequencies(hd, c.max_seq_len, c.rope_theta)
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)

        k_sc = v_sc = None
        if cache_k is not None:
            # cache_k/cache_v arrive as (buffer, scale_or_None) pairs.  The
            # buffers are the FULL stacked caches, HEAD-MAJOR
            # (L, b, kvh, m, hd) — the layout the decode dot wants, so
            # pinned-layout consumers (serving programs, pallas kernels)
            # read each layer's slice copy-free (docs/ROUND3_NOTES.md,
            # layout experiment).  This layer
            # writes only its new (b, n) rows — never a whole layer slice —
            # so the while-loop carry stays in place and the per-step write
            # traffic is O(b·n·kvh·hd), not O(b·m·kvh·hd).
            # kv_write_index comes in two forms with very different TPU cost:
            #   * scalar — ALL lanes write at the same slot (generate(): right
            #     -padded prompts prefill at 0 and advance in lockstep; ring
            #     serving).  One dynamic_update_slice; ~6 ms/step cheaper
            #     than the scatter at 7B b32 (docs/ROUND3_NOTES.md).
            #   * (b,) array — per-lane offsets (non-ring decode, e.g. the
            #     TP parity tests).  vmap(DUS) -> XLA scatter over the layer
            #     slice, written back at a static index.
            ck, ksc = cache_k
            cv, vsc = cache_v
            quant = ksc is not None
            # new rows in cache layout: k/v (b, kvh, n, hd), scales (b, kvh, n)
            k_hm = k.transpose(0, 2, 1, 3)
            v_hm = v.transpose(0, 2, 1, 3)

            def write(cache, new):
                # the slot axis is second-to-last for k/v (L, b, kvh, m, hd)
                # and last for scales (L, b, kvh, m).  Offsets wrap modulo
                # the cache length: write_offset may be an unwrapped global
                # clock (ring-buffer serving) and DUS would otherwise CLAMP
                # an out-of-range index to m - n, silently corrupting the
                # newest rows
                slot_ax = 3                      # both (L,b,kvh,m,hd) and (L,b,kvh,m)
                off = kv_write_index % cache.shape[slot_ax]
                if kv_write_index.ndim == 0:
                    idx = [self.layer_idx, 0, 0, off] + [0] * (cache.ndim - 4)
                    return jax.lax.dynamic_update_slice(cache, new[None],
                                                        tuple(idx))
                def per_seq(cb, nb, o):
                    # cb (kvh, m, ...) / nb (kvh, n, ...): slot axis 1
                    return jax.lax.dynamic_update_slice_in_dim(cb, nb, o, axis=1)
                sl = jax.vmap(per_seq)(cache[self.layer_idx], new, off)
                return cache.at[self.layer_idx].set(sl)

            kvq = getattr(c, "kv_quant", None)
            if quant and kvq == "int4":
                # nibble-packed rows + per-(kv-head, token, head_dim-group)
                # scales; the group scales fold EXACTLY into the grouped
                # attention einsums below (ops/quant.quantize_kv_int4)
                from ctpa.ops.quant import quantize_kv_int4

                gq = getattr(c, "kv_quant_group", 32)
                sdt = jnp.dtype(getattr(c, "kv_scale_dtype", "float32"))
                k4, k_rows_sc = quantize_kv_int4(k_hm, gq, scale_dtype=sdt)
                v4, v_rows_sc = quantize_kv_int4(v_hm, gq, scale_dtype=sdt)
                ck, cv = write(ck, k4), write(cv, v4)
                ksc, vsc = write(ksc, k_rows_sc), write(vsc, v_rows_sc)
            elif quant:
                # symmetric absmax per (kv-head, token) over head_dim; the
                # scales fold EXACTLY into the attention einsums below, so
                # the cache read halves without a dequantized copy
                def quant_rows(rows):
                    a = jnp.max(jnp.abs(rows.astype(jnp.float32)), axis=-1)
                    sc = jnp.maximum(a / 127.0, 1e-12)
                    r8 = jnp.clip(jnp.round(rows.astype(jnp.float32)
                                            / sc[..., None]), -127, 127
                                  ).astype(jnp.int8)
                    return r8, sc
                k8, k_rows_sc = quant_rows(k_hm)
                v8, v_rows_sc = quant_rows(v_hm)
                ck, cv = write(ck, k8), write(cv, v8)
                ksc, vsc = write(ksc, k_rows_sc), write(vsc, v_rows_sc)
            else:
                ck = write(ck, k_hm.astype(ck.dtype))
                cv = write(cv, v_hm.astype(cv.dtype))
            cache_k, cache_v = (ck, ksc), (cv, vsc)

            if (n == 1 and key_mask is not None
                    and getattr(c, "flash_decode", False)):
                # fused single-token attention: one pallas launch reads this
                # layer's cache planes exactly once (int8 scales + GQA
                # repeat handled in-kernel; ops/pallas/decode_attention.py)
                if kvq == "int4":
                    raise ValueError("flash_decode does not support "
                                     "kv_quant='int4' (the kernel folds "
                                     "scalar per-row scales, not head_dim "
                                     "groups); use kv_quant='int8' or None")
                from ctpa.ops.pallas.decode_attention import decode_attention

                out = decode_attention(
                    q[:, 0], ck, cv, key_mask, self.layer_idx,
                    k_scale=ksc, v_scale=vsc,
                    scale=float(1.0 / hd ** 0.5),
                ).reshape(b, 1, h * hd).astype(x.dtype)
                out = _proj(c, c.hidden_size, "o_proj", self.dtype, self.lora,
                            "o_proj")(out)
                return out, cache_k, cache_v

            if quant and kvq == "int4":
                # grouped int4 attention.  The group scales vary ALONG the
                # contraction axes (head_dim for QK, slots for PV), so they
                # cannot factor out of single big dots; instead QK runs as
                # per-group partial dots with the K scales contracted in a
                # second (tiny) einsum, and the V scales fold into the
                # attention weights per group before the PV dots.  Exact:
                # sum_d q_d k_d = sum_G s_G * sum_{d in G} q_d k8_d.
                from ctpa.ops.quant import _int4_group, unpack_kv_int4

                gq = _int4_group(hd, getattr(c, "kv_quant_group", 32))
                ng = hd // gq
                k8 = unpack_kv_int4(ck[self.layer_idx], gq)  # (b,kvh,m,G,gs)
                v8 = unpack_kv_int4(cv[self.layer_idx], gq)
                # scales may be stored bf16 (kv_scale_dtype); the fold math
                # runs f32 — the convert fuses into the reads
                k_sg = ksc[self.layer_idx].astype(jnp.float32)  # (b,kvh,m,G)
                v_sg = vsc[self.layer_idx].astype(jnp.float32)
                qg4 = q.reshape(b, n, kvh, h // kvh, ng, gq)
                simg = jnp.einsum("bngrGd,bgmGd->bgrnmG", qg4,
                                  k8.astype(self.dtype),
                                  preferred_element_type=jnp.float32)
                sim = jnp.einsum("bgrnmG,bgmG->bgrnm", simg,
                                 k_sg) / jnp.sqrt(hd)
                if attn_mask is not None:
                    sim = jnp.where(attn_mask[:, :, None], sim,
                                    jnp.finfo(jnp.float32).min)
                attn = jax.nn.softmax(sim, axis=-1)
                attng = (attn[..., None]
                         * v_sg[:, :, None, None, :, :]).astype(self.dtype)
                out = jnp.einsum("bgrnmG,bgmGd->bngrGd", attng,
                                 v8.astype(self.dtype)).reshape(b, n, h * hd)
                out = _proj(c, c.hidden_size, "o_proj", self.dtype, self.lora,
                            "o_proj")(out)
                return out, cache_k, cache_v

            if quant and getattr(c, "kv_int8_dots", False):
                # int8 attention dots: the int8 cache slices are the DOT
                # OPERANDS (int8 x int8 -> int32 on the MXU), so no bf16
                # dequantized K/V copy ever materializes.  q rows quantize
                # per (b, n, head) absmax; for PV the per-slot v scales fold
                # into the f32 attention weights BEFORE their row
                # quantization, so the int dot's row scale recovers the
                # exact fold.
                k8 = ck[self.layer_idx]                       # (b,kvh,m,hd) i8
                v8 = cv[self.layer_idx]
                k_sc8 = ksc[self.layer_idx]                   # (b, kvh, m)
                v_sc8 = vsc[self.layer_idx]
                rep8 = h // kvh
                qg8 = q.reshape(b, n, kvh, rep8, hd).astype(jnp.float32)
                q_sc = jnp.maximum(
                    jnp.max(jnp.abs(qg8), axis=-1) / 127.0, 1e-12)
                qq = jnp.clip(jnp.round(qg8 / q_sc[..., None]), -127, 127
                              ).astype(jnp.int8)
                sim = jnp.einsum("bngrd,bgmd->bgrnm", qq, k8,
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32)
                sim = (sim * q_sc.transpose(0, 2, 3, 1)[:, :, :, :, None]
                       * k_sc8[:, :, None, None, :]) / jnp.sqrt(hd)
                if attn_mask is not None:
                    sim = jnp.where(attn_mask[:, :, None], sim,
                                    jnp.finfo(jnp.float32).min)
                attn = jax.nn.softmax(sim, axis=-1)
                attn = attn * v_sc8[:, :, None, None, :]      # fold v scales
                a_sc = jnp.maximum(
                    jnp.max(attn, axis=-1) / 127.0, 1e-30)    # attn >= 0
                a8 = jnp.clip(jnp.round(attn / a_sc[..., None]), 0, 127
                              ).astype(jnp.int8)
                out = jnp.einsum("bgrnm,bgmd->bngrd", a8, v8,
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32)
                out = (out * a_sc.transpose(0, 3, 1, 2)[..., None]
                       ).reshape(b, n, h * hd).astype(x.dtype)
                out = _proj(c, c.hidden_size, "o_proj", self.dtype,
                            self.lora, "o_proj")(out)
                return out, cache_k, cache_v

            if quant:
                k_sc, v_sc = ksc[self.layer_idx], vsc[self.layer_idx]  # (b,kvh,m)
            k_full = ck[self.layer_idx].astype(self.dtype)   # (b, kvh, m, hd)
            v_full = cv[self.layer_idx].astype(self.dtype)
        else:
            # head-major to match the cached layout (the dots below want
            # (b, h, m, d) operands either way)
            k_full = k.transpose(0, 2, 1, 3)
            v_full = v.transpose(0, 2, 1, 3)

        rep = h // kvh
        if self.use_flash and cache_k is None:
            from ctpa.ops.pallas.flash_attention import flash_attention

            # the flash kernel wants equal q/kv head counts; repeat is cheap
            # here (fresh per-block K/V, no cache slice behind it)
            if rep > 1:
                k_full = jnp.repeat(k_full, rep, axis=1)
                v_full = jnp.repeat(v_full, rep, axis=1)
            out = flash_attention(
                q.transpose(0, 2, 1, 3), k_full, v_full,
                causal=True, kv_mask=key_mask,
                scale=float(1.0 / hd ** 0.5),
            ).transpose(0, 2, 1, 3).reshape(b, n, h * hd).astype(x.dtype)
        else:
            # grouped-query attention: q heads are folded to (kv-head, rep)
            # so both dots contract against the UN-repeated K/V.  For GQA
            # geometries (rep > 1, e.g. llama-3-style kv_heads=8) this keeps
            # the per-layer K/V operand at cache size instead of
            # materializing rep× copies per layer per step; at Meditron-7B
            # (llama-2 geometry) kv_heads == heads so rep == 1 and this path
            # is identical to the plain einsum.  q head g*rep + r attends kv
            # head g — the same pairing as jnp.repeat(kv, rep, axis=1).
            qg = q.reshape(b, n, kvh, rep, hd)
            sim = jnp.einsum("bngrd,bgmd->bgrnm", qg, k_full,
                             preferred_element_type=jnp.float32) / jnp.sqrt(hd)
            if k_sc is not None:
                sim = sim * k_sc[:, :, None, None, :]
            neg = jnp.finfo(jnp.float32).min
            if attn_mask is not None:
                # insert a singleton axis after the mask's own singleton head
                # axis so it broadcasts over (g, r); covers both mask shapes
                # ((b, 1, n, m) full, (b, 1, 1, m) from the n==1 cached-
                # decode producer — n broadcasts too)
                sim = jnp.where(attn_mask[:, :, None], sim, neg)
            attn = jax.nn.softmax(sim, axis=-1)
            if v_sc is not None:
                attn = attn * v_sc[:, :, None, None, :]
            attn = attn.astype(v_full.dtype)
            out = jnp.einsum("bgrnm,bgmd->bngrd", attn,
                             v_full).reshape(b, n, h * hd)
        out = _proj(c, c.hidden_size, "o_proj", self.dtype, self.lora,
                    "o_proj")(out)
        return out, cache_k, cache_v


class LlamaMLP(nn.Module):
    cfg: LLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        if (getattr(c, "weight_quant", None) == "int8"
                and getattr(c, "quant_ffn_kernel", False)):
            h, i = c.hidden_size, c.intermediate_size
            if c.quant_impl == "xla":
                # same ffn_kernel param layout, unfused XLA math — keeps the
                # layout CPU-runnable (script smokes, debugging); the fused
                # kernel itself is pallas-only
                aq = getattr(c, "quant_act", False)
                gate = Int8Dense(i, impl="xla", dtype=self.dtype,
                                 act_quant=aq, name="gate_proj")(x)
                up = Int8Dense(i, impl="xla", dtype=self.dtype,
                               act_quant=aq, name="up_proj")(x)
                return Int8Dense(h, impl="xla", dtype=self.dtype,
                                 act_quant=aq, name="down_proj")(
                                     nn.silu(gate) * up)
            # one pallas launch for the whole SwiGLU FFN (ops/quant.int8_ffn)
            from ctpa.ops.quant import int8_ffn

            wg, sg = _Int8Weights((h, i), name="gate_proj")()
            wu, su = _Int8Weights((h, i), name="up_proj")()
            wd, sd = _Int8Weights((i, h), name="down_proj")()
            return int8_ffn(x.astype(self.dtype), wg, sg, wu, su, wd, sd,
                            act_quant=getattr(c, "quant_act", False))
        if (getattr(c, "weight_quant", None) == "int4"
                and getattr(c, "quant_ffn_kernel", False)):
            # one pallas launch for the whole SwiGLU FFN at half the int8
            # weight HBM (ops/quant.int4_ffn) — the latency-tier decode is
            # weight-read bound; quant_act=True additionally runs all three
            # contractions as int8 MXU dots (w4a8)
            from ctpa.ops.quant import int4_ffn

            h, i = c.hidden_size, c.intermediate_size
            gq = getattr(c, "quant_group", 128)
            wg, sg = _Int4Weights((h, i), gq, name="gate_proj")()
            wu, su = _Int4Weights((h, i), gq, name="up_proj")()
            wd, sd = _Int4Weights((i, h), gq, name="down_proj")()
            return int4_ffn(x.astype(self.dtype), wg, sg, wu, su, wd, sd,
                            group=gq, impl=c.quant_impl,
                            act_quant=getattr(c, "quant_act", False))
        if getattr(c, "weight_quant", None) in ("int8", "int4") and c.quant_fused:
            gu = _quant_dense(c, 2 * c.intermediate_size, self.dtype,
                              "gateup_proj")(x)
            gate = gu[..., : c.intermediate_size]
            up = gu[..., c.intermediate_size :]
        else:
            gate = _proj(c, c.intermediate_size, "gate_proj", self.dtype)(x)
            up = _proj(c, c.intermediate_size, "up_proj", self.dtype)(x)
        return _proj(c, c.hidden_size, "down_proj", self.dtype)(
            nn.silu(gate) * up
        )


class LlamaBlock(nn.Module):
    cfg: LLMConfig
    lora: Optional[LoRAConfig] = None
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x, positions, kv_write_index, cache_k=None, cache_v=None,
                 attn_mask=None, key_mask=None):
        h = RMSNorm(self.cfg.rms_norm_eps, dtype=self.dtype, name="input_layernorm")(x)
        attn_out, ck, cv = LlamaAttention(self.cfg, self.lora, dtype=self.dtype,
                                          use_flash=self.use_flash,
                                          layer_idx=self.layer_idx,
                                          name="self_attn")(
            h, positions, kv_write_index, cache_k, cache_v, attn_mask,
            key_mask)
        x = x + attn_out
        h = RMSNorm(self.cfg.rms_norm_eps, dtype=self.dtype, name="post_attention_layernorm")(x)
        return x + LlamaMLP(self.cfg, dtype=self.dtype, name="mlp")(h), ck, cv


class LlamaModel(nn.Module):
    """Trunk: embeddings + blocks + final norm.  Two modes:
      * full-sequence (training / prefill): cache=None or cache given
      * incremental decode: n == 1 with cache
    Returns (hidden_states, new_cache)."""

    cfg: LLMConfig
    lora: Optional[LoRAConfig] = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,               # (b, n)
        attention_mask: Optional[jax.Array] = None,   # (b, n) 1 = real
        cache: Optional[KVCache] = None,
        positions: Optional[jax.Array] = None,         # (b, n)
        inputs_embeds: Optional[jax.Array] = None,
        shared_kv_offset: bool = False,
    ):
        """`shared_kv_offset=True` promises every sequence's
        `cache.write_offset` is IDENTICAL (lockstep decode: right-padded
        prompts prefilled together, as in CTReportGenerator.generate).  The
        cache write then uses one batch-wide dynamic_update_slice instead of
        a per-lane scatter — ~6 ms/step cheaper at 7B batch 32.  Offsets
        that differ across lanes under this flag would silently corrupt the
        cache; continuous batching (per-lane lengths) must keep it False."""
        c = self.cfg
        b, n = input_ids.shape[:2] if inputs_embeds is None else inputs_embeds.shape[:2]
        if inputs_embeds is None:
            x = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                         name="embed_tokens")(input_ids)
        else:
            x = inputs_embeds.astype(self.dtype)

        if positions is None:
            if cache is not None:
                # pads get positions past the real length; they are never
                # attended as keys and their query outputs are discarded.
                positions = cache.true_len[:, None] + jnp.arange(n)[None, :]
            else:
                positions = jnp.broadcast_to(jnp.arange(n)[None, :], (b, n))

        # attention mask: (b, 1, n, m)
        if cache is not None:
            m = cache.k.shape[3]
            written_real = (
                attention_mask.astype(bool) if attention_mask is not None
                else jnp.ones((b, n), bool)
            )
            # slots this block writes: per-sequence write_offset + [0, n),
            # modulo the cache length — write_offset may be an unwrapped
            # global clock (ring-buffer serving, pipelines/streaming.py)
            write_slots = (cache.write_offset[:, None]
                           + jnp.arange(n)[None, :]) % m                        # (b, n)
            slot = jnp.arange(m)[None, None, :]                                 # (1, 1, m)
            newly = jnp.any(
                (slot == write_slots[:, :, None]) & written_real[:, :, None], axis=1
            )                                                                   # (b, m)
            valid_now = cache.valid | newly
            if n == 1:
                # single-token decode on an append-only cache: every valid
                # slot was written at or before this step, so causality IS
                # validity.  No slot-order comparison — which also makes the
                # mask correct after a ring-buffer wrap, where slot order no
                # longer equals token order.
                mask = valid_now[:, None, None, :]
                # the fused decode kernel wants the raw (b, m) validity
                key_mask = valid_now if getattr(c, "flash_decode", False) else None
            else:
                # multi-token prefill runs on a fresh lane cache (no wrap):
                # slot order is token order, causality is slot <= q's slot.
                key_slot = jnp.arange(m)[None, None, None, :]
                q_slot = write_slots[:, None, :, None]
                mask = (key_slot <= q_slot) & valid_now[:, None, None, :]
                key_mask = None
        elif c.flash_prefill and n >= c.flash_min_len:
            # no-cache long forward -> pallas flash kernel (causal + key
            # padding handled in kernel; no (b, 1, n, n) mask materialized)
            use_flash = True
            mask = None
            key_mask = attention_mask
        else:
            m = n
            q_pos = jnp.arange(n)[None, None, :, None]
            key_pos = jnp.arange(n)[None, None, None, :]
            mask = key_pos <= q_pos
            if attention_mask is not None:
                mask = mask & (attention_mask[:, None, None, :] > 0)
            key_mask = None
        if cache is not None or mask is not None:
            use_flash = False

        if cache is not None:
            write_idx = (cache.write_offset[0] if shared_kv_offset
                         else cache.write_offset)
        else:
            write_idx = jnp.zeros((b,), jnp.int32)
        # the full stacked cache buffers thread through the layer loop as
        # (buffer, scale_or_None) pairs; each layer writes only its own new
        # rows (static layer index), so there is no per-step slice+restack
        # of the 2·L·b·m·kvh·hd cache
        ck_all = (cache.k, cache.k_scale) if cache is not None else None
        cv_all = (cache.v, cache.v_scale) if cache is not None else None
        block_cls = nn.remat(LlamaBlock, static_argnums=()) if self.remat else LlamaBlock
        for i in range(c.num_layers):
            x, ck_all, cv_all = block_cls(c, self.lora, dtype=self.dtype,
                                          use_flash=use_flash, layer_idx=i,
                                          name=f"layers_{i}")(
                x, positions, write_idx, ck_all, cv_all, mask, key_mask)

        x = RMSNorm(c.rms_norm_eps, dtype=self.dtype, name="norm")(x)
        new_cache = None
        if cache is not None:
            new_cache = KVCache(
                k=ck_all[0], v=cv_all[0],
                k_scale=ck_all[1], v_scale=cv_all[1],
                write_offset=cache.write_offset + n,
                true_len=cache.true_len + written_real.sum(axis=-1).astype(jnp.int32),
                valid=valid_now,
            )
        return x, new_cache


class LlamaForCausalLM(nn.Module):
    cfg: LLMConfig
    lora: Optional[LoRAConfig] = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.model = LlamaModel(self.cfg, self.lora, dtype=self.dtype,
                                remat=self.remat, name="model")
        if not self.cfg.tie_embeddings:
            self.lm_head = _proj(self.cfg, self.cfg.vocab_size, "lm_head",
                                 self.dtype)

    def apply_lm_head(self, hidden):
        if self.cfg.tie_embeddings:
            raise NotImplementedError("tied embeddings not needed for Meditron/llama-2")
        return self.lm_head(hidden)

    def __call__(self, input_ids, attention_mask=None, cache=None, positions=None,
                 inputs_embeds=None, shared_kv_offset=False):
        hidden, new_cache = self.model(input_ids, attention_mask, cache, positions,
                                       inputs_embeds, shared_kv_offset)
        return self.apply_lm_head(hidden), hidden, new_cache
