"""Context (sequence) parallelism — exact attention over a sharded sequence.

SURVEY.md §5.7: the reference has NO sequence-length scaling machinery; its
long axis is the fused 13,824-token volumetric sequence (ctvit.py:169-174),
handled only by axial factorization.  This module is the TPU-native
extension the survey calls for: shard the sequence over a mesh axis so each
device holds n/p query tokens, all-gather K/V over ICI, and run exact
(flash) attention on the local query block.

Design notes:
  * All-gather-KV (DeepSpeed-SP / "Ulysses-lite" style) rather than ring
    attention: at CTViT scale the full K/V is 13,824 x 512 x 2 x 2 B = 28 MB
    per layer — trivially resident, and one `all_gather` over ICI is both
    simpler and faster than p ppermute hops unless K/V itself exceeds HBM.
    Activation memory for attention drops from O(n) to O(n/p) q-side, and
    the O(n^2) score work is split p ways.
  * Differentiable end-to-end: `jax.lax.all_gather` transposes to
    `psum_scatter` (producing the correct summed dK/dV shards) and the local
    attention is the custom-VJP flash kernel (ops/pallas/flash_attention).
  * Causal attention works through the flash kernel's dynamic `q_offset`:
    each shard's queries are rows [idx*n/p, (idx+1)*n/p) of the global
    sequence, so the kernel shifts its causal comparison by the shard offset
    (read from SMEM; the diagonal-band grid skip stays active).  This is the
    LLM-training sequence-parallel path; the fused volumetric sequence uses
    the non-causal path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
# jax.shard_map (>=0.8) renames check_rep -> check_vma; keep the
# experimental import until the pinned jax drops it
from jax.experimental.shard_map import shard_map


def _dense_attention(q, k, v, bias, kv_mask, scale, causal=False,
                     q_offset=None):
    # KEEP IN SYNC with the mask semantics in ops/pallas/flash_attention.py
    # (_attn_kernel / _bwd_p / _dense_bwd): q_offset shift, kv_mask > 0
    # threshold, -1e30 fill.  This is the XLA oracle those kernels are
    # tested against.
    n, m = q.shape[2], k.shape[2]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        bb = bias if bias.ndim == 4 else bias[None]
        s = s + bb.astype(jnp.float32)
    if causal:
        q_pos = jnp.arange(n)[None, None, :, None]
        if q_offset is not None:
            q_pos = q_pos + jnp.asarray(q_offset, jnp.int32).reshape(())
        s = jnp.where(jnp.arange(m)[None, None, None, :] <= q_pos, s, -1e30)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :] > 0, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def context_parallel_attention(
    q: jax.Array,                      # (b, h, n, d)
    k: jax.Array,                      # (b, h, n, d)
    v: jax.Array,                      # (b, h, n, d)
    mesh: Mesh,
    axis: str,
    bias: Optional[jax.Array] = None,  # (h, n, n) / (1, n, n) additive (CPB)
    kv_mask: Optional[jax.Array] = None,   # (b, n) 1 = real key
    scale: Optional[float] = None,
    impl: str = "flash",               # "flash" (pallas) | "dense" (XLA)
    causal: bool = False,
    logit_bound: Optional[jax.Array] = None,  # scalar post-scale logit bound
                                       # (flash flat-softmax fast path)
) -> jax.Array:
    """Exact attention with the sequence dim sharded over ``axis``.
    Inputs may be global (replicated) arrays or already sharded with the
    matching specs; output is sequence-sharded the same way.  causal=True
    shifts each shard's causal mask by its global query offset (LLM
    sequence parallelism)."""
    n = q.shape[2]
    p_size = mesh.shape[axis]
    if n % p_size != 0:
        raise ValueError(f"sequence {n} not divisible by axis '{axis}' size "
                         f"{p_size}")
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    scale = float(scale)

    seq_spec = P(None, None, axis, None)
    in_specs = [seq_spec, seq_spec, seq_spec]
    args = [q, k, v]
    has_bias = bias is not None
    if has_bias:
        # bias rows follow the q shard; the key axis stays full
        in_specs.append(P(None, axis, None) if bias.ndim == 3
                        else P(None, None, axis, None))
        args.append(bias)
    has_kvm = kv_mask is not None
    if has_kvm:
        in_specs.append(P())           # key validity spans the full sequence
        args.append(kv_mask)
    has_bound = logit_bound is not None
    if has_bound:
        in_specs.append(P())           # replicated scalar
        args.append(jnp.asarray(logit_bound, jnp.float32))

    n_local = n // p_size

    def inner(*local):
        local = list(local)
        q_blk, k_blk, v_blk = local[:3]
        bias_blk = local[3] if has_bias else None
        kvm = local[3 + has_bias] if has_kvm else None
        bound = local[3 + has_bias + has_kvm] if has_bound else None
        k_full = jax.lax.all_gather(k_blk, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_blk, axis, axis=2, tiled=True)
        q_off = (jax.lax.axis_index(axis) * n_local).astype(jnp.int32) \
            if causal else None
        if impl == "flash":
            from ctpa.ops.pallas.flash_attention import flash_attention

            return flash_attention(q_blk, k_full, v_full, bias=bias_blk,
                                   scale=scale, kv_mask=kvm, causal=causal,
                                   q_offset=q_off, logit_bound=bound)
        return _dense_attention(q_blk, k_full, v_full, bias_blk, kvm, scale,
                                causal=causal, q_offset=q_off)

    fn = shard_map(inner, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=seq_spec, check_rep=False)
    return fn(*args)


def sequence_sharding(mesh: Mesh, axis: str):
    """NamedSharding for (b, h, n, d) activations with n over ``axis`` —
    place q/k/v with this before calling context_parallel_attention to avoid
    a resharding all-to-all on entry."""
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, P(None, None, axis, None))
