"""Cosine-similarity vector quantization with EMA codebook updates.

TPU-native replacement for the `vector_quantize_pytorch` dependency the
reference leans on (ctvit.py:187: VectorQuantize(dim=512, codebook_size=8192,
use_cosine_sim=True)).  Design notes:

  * Codebook state (embeddings, EMA cluster sizes) is explicit — a pytree the
    caller threads through training steps, as JAX requires; no hidden buffers.
  * Nearest-code search is one big (n, d) x (d, K) matmul on the MXU (cosine
    similarity of l2-normalised vectors), argmax over K.
  * Straight-through estimator: quantized = x + stop_gradient(q - x).
  * EMA updates follow the standard VQ-VAE-2 recipe with Laplace smoothing;
    under data parallelism the caller psums `counts`/`sums` over the data axis
    before `ema_update` so all replicas hold identical codebooks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ctpa.ops.attention_ops import l2norm


class VQState(NamedTuple):
    codebook: jax.Array       # (K, d) l2-normalised code embeddings
    cluster_size: jax.Array   # (K,) EMA of assignment counts
    embed_avg: jax.Array      # (K, d) EMA of assigned-vector sums


class VQOutput(NamedTuple):
    quantized: jax.Array      # same shape as input, straight-through
    indices: jax.Array        # (..., ) int32 code ids
    commit_loss: jax.Array    # scalar commitment loss
    counts: jax.Array         # (K,) this-batch assignment counts (for EMA)
    sums: jax.Array           # (K, d) this-batch assigned-vector sums (for EMA)


def vq_init(key: jax.Array, codebook_size: int, dim: int) -> VQState:
    codes = l2norm(jax.random.normal(key, (codebook_size, dim)))
    return VQState(
        codebook=codes,
        cluster_size=jnp.zeros((codebook_size,), jnp.float32),
        # explicit copy: aliasing the codebook buffer breaks donation
        embed_avg=jnp.array(codes, jnp.float32, copy=True),
    )


def vq_encode(state: VQState, x: jax.Array, mask: jax.Array | None = None) -> VQOutput:
    """Quantize x (..., d) against the codebook.

    mask (..., ) optional bool: True = real token. Masked-out tokens still get
    indices but contribute nothing to counts/sums or the commit loss (parity
    with the reference's variable-length token mask, ctvit.py:421-433).
    """
    shape = x.shape
    d = shape[-1]
    flat = x.reshape(-1, d).astype(jnp.float32)
    nf = l2norm(flat)
    cb = l2norm(state.codebook.astype(jnp.float32))
    sim = jnp.dot(nf, cb.T, preferred_element_type=jnp.float32)   # (n, K)
    idx = jnp.argmax(sim, axis=-1)
    # gather + segment-sum instead of one-hot matmuls: the one-hot forms cost
    # 2 extra (n, K) x (K, d) products (~230 GFLOP/volume at shipped scale)
    quant = jnp.take(cb, idx, axis=0)                             # (n, d)

    if mask is not None:
        m = mask.reshape(-1).astype(jnp.float32)
    else:
        m = jnp.ones((flat.shape[0],), jnp.float32)

    diff = jnp.sum(jnp.square(nf - jax.lax.stop_gradient(quant)), axis=-1)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    commit = jnp.sum(diff * m) / denom

    K = cb.shape[0]
    counts = jax.ops.segment_sum(m, idx, num_segments=K)
    sums = jax.ops.segment_sum(nf * m[:, None], idx, num_segments=K)

    # straight-through in the caller's dtype/geometry
    quant_st = flat + jax.lax.stop_gradient(quant - flat)
    return VQOutput(
        quantized=quant_st.reshape(shape).astype(x.dtype),
        indices=idx.reshape(shape[:-1]).astype(jnp.int32),
        commit_loss=commit,
        counts=counts,
        sums=sums,
    )


def ema_update(
    state: VQState,
    counts: jax.Array,
    sums: jax.Array,
    decay: float = 0.99,
    eps: float = 1e-5,
) -> VQState:
    """EMA codebook update (apply after psum of counts/sums across replicas)."""
    cluster = state.cluster_size * decay + counts * (1.0 - decay)
    embed_avg = state.embed_avg * decay + sums * (1.0 - decay)
    n = jnp.sum(cluster)
    smoothed = (cluster + eps) / (n + cluster.shape[0] * eps) * n
    codebook = l2norm(embed_avg / smoothed[:, None])
    # keep dead codes where they were rather than collapsing to NaN
    dead = cluster < eps
    codebook = jnp.where(dead[:, None], state.codebook, codebook)
    return VQState(codebook=codebook, cluster_size=cluster, embed_avg=embed_avg)


def vq_lookup(state: VQState, indices: jax.Array) -> jax.Array:
    """Decode code ids back to embeddings (for the generative path)."""
    return jnp.take(l2norm(state.codebook), indices, axis=0)
