"""Token sampling under jit: temperature, top-k, and top-p (nucleus).

The reference samples with bare `torch.multinomial(softmax(logits/T))`
(model_components.py:252) or HF `model.generate` defaults
(vqa_inference.py:131-138); this is the framework's single sampling op,
shared by `CTReportGenerator.generate` and the serving batcher so every
decode path draws identically for identical (logits, key, knobs).

`filter_logits` exposes the filtered (temperature-scaled, top-k/top-p
masked) logits separately so speculative decoding's rejection sampling
(report_generator.generate_speculative) accepts/resamples against EXACTLY
the distribution plain decode draws from — distribution-exactness of the
speculative path reduces to this shared function.

All filtering is static-shape and branch-free (jnp.where masks, no
data-dependent control flow), so it compiles into the decode step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def filter_logits(
    logits: jax.Array,               # (..., vocab)
    *,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jax.Array:
    """Temperature-scale then mask logits to the sampling support.

    top_k keeps the k highest logits (value-thresholded, so exact ties at
    the k-th value all survive — HF TopKLogitsWarper semantics); top_p keeps
    the smallest set of tokens whose cumulative probability reaches top_p,
    rank-based so logit ties at the nucleus boundary do NOT leak extra
    tokens in.  The argmax always survives both filters, for any top_p
    (including degenerate values <= 0).  Filters compose: top_k first, then
    top_p over the survivors, matching HF's processor order.

    softmax(filter_logits(x)) is the exact distribution `sample_logits`
    draws from (masked-out tokens at -inf)."""
    logits = logits.astype(jnp.float32) / max(temperature, 1e-6)
    if top_k is not None and 0 < top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        order = jnp.argsort(-logits, axis=-1)           # descending, stable
        sort = jnp.take_along_axis(logits, order, axis=-1)
        probs = jax.nn.softmax(sort, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose cumulative mass BEFORE them is < top_p — the
        # smallest prefix reaching top_p; position 0 (the argmax) always
        # survives so the filter can never empty the support
        keep_sorted = (cum - probs) < top_p
        keep_sorted = keep_sorted.at[..., :1].set(True)
        n_keep = keep_sorted.sum(axis=-1, keepdims=True)
        # token's descending rank = its position in `order`
        ranks = jnp.argsort(order, axis=-1)
        logits = jnp.where(ranks < n_keep, logits, -jnp.inf)
    return logits


def sample_logits(
    logits: jax.Array,               # (..., vocab)
    key: jax.Array,
    *,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    greedy: bool = False,
) -> jax.Array:
    """Draw one token id per row.  greedy=True ignores every other knob.
    See `filter_logits` for the filtering semantics."""
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        key, filter_logits(logits, temperature=temperature, top_k=top_k,
                           top_p=top_p),
        axis=-1).astype(jnp.int32)
