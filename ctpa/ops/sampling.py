"""Token sampling under jit: temperature, top-k, and top-p (nucleus).

The reference samples with bare `torch.multinomial(softmax(logits/T))`
(model_components.py:252) or HF `model.generate` defaults
(vqa_inference.py:131-138); this is the framework's single sampling op,
shared by `CTReportGenerator.generate` and the serving batcher so every
decode path draws identically for identical (logits, key, knobs).

All filtering is static-shape and branch-free (jnp.where masks, no
data-dependent control flow), so it compiles into the decode step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


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

    top_k keeps the k highest logits; top_p keeps the smallest set of
    tokens whose cumulative probability reaches top_p (the argmax always
    survives both filters).  Filters compose: top_k is applied first, then
    top_p renormalizes over the survivors, matching HF's processor order."""
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / max(temperature, 1e-6)
    if top_k is not None and 0 < top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        sort = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sort, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose cumulative mass BEFORE them is < top_p — the
        # smallest prefix reaching top_p, never empty
        keep = (cum - probs) < top_p
        thresh = jnp.min(jnp.where(keep, sort, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < thresh, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
