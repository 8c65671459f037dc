"""Masked-language-modeling SSL head over the text tower.

Parity with reference mlm.py:18-109: select `mask_prob` of non-pad tokens
(at least one per row), replace `replace_prob` of the selected with [MASK],
compute CE over the selected positions only.  Expressed as pure functions of
an rng key — no Python-side randomness, jit-safe."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def mask_tokens(
    rng: jax.Array,
    input_ids: jax.Array,          # (b, n)
    mask_prob: float = 0.15,
    replace_prob: float = 0.90,
    mask_token_id: int = 103,
    pad_token_id: int = 0,
):
    """Returns (masked_ids, selected) where selected marks loss positions.

    Guarantee: at least one selected token per row (mlm.py:18-32's
    prob_mask_like + min-subset behavior)."""
    k1, k2 = jax.random.split(rng)
    real = input_ids != pad_token_id
    scores = jax.random.uniform(k1, input_ids.shape)
    scores = jnp.where(real, scores, jnp.inf)
    selected = (scores < mask_prob) & real
    # force at least one selection per row: the min-score real token
    min_idx = jnp.argmin(scores, axis=-1)
    force = jax.nn.one_hot(min_idx, input_ids.shape[-1], dtype=bool) & real
    any_sel = selected.any(axis=-1, keepdims=True)
    selected = jnp.where(any_sel, selected, force)
    do_replace = (jax.random.uniform(k2, input_ids.shape) < replace_prob) & selected
    masked = jnp.where(do_replace, mask_token_id, input_ids)
    return masked, selected


def mlm_loss(
    rng: jax.Array,
    apply_fn: Callable,            # (masked_ids, attention_mask) -> (b, n, vocab) logits
    input_ids: jax.Array,
    attention_mask: jax.Array,
    mask_prob: float = 0.15,
    replace_prob: float = 0.90,
    mask_token_id: int = 103,
    pad_token_id: int = 0,
) -> jax.Array:
    """CE over masked positions (mlm.py:76-109)."""
    masked, selected = mask_tokens(
        rng, input_ids, mask_prob, replace_prob, mask_token_id, pad_token_id)
    logits = apply_fn(masked, attention_mask)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, input_ids[..., None], axis=-1)[..., 0]
    sel = selected.astype(jnp.float32)
    return jnp.sum(nll * sel) / jnp.maximum(jnp.sum(sel), 1.0)
