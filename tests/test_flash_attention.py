"""Pallas flash attention vs dense reference (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from ctpa.ops.pallas.flash_attention import flash_attention


def dense_attention(q, k, v, bias=None, causal=False, scale=None):
    import math

    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
    if bias is not None:
        s = s + bias[None]
    if causal:
        n, m = s.shape[-2:]
        mask = jnp.tril(jnp.ones((n, m), bool), k=m - n)
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32)).astype(q.dtype)


def run_flash(*args, **kw):
    with pltpu.force_tpu_interpret_mode():
        return flash_attention(*args, **kw)


@pytest.mark.parametrize("n,m,d", [(128, 128, 64), (256, 384, 32)])
def test_flash_matches_dense(rng, n, m, d):
    b, h = 1, 2
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    want = dense_attention(q, k, v)
    got = run_flash(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_flash_causal(rng):
    b, h, n, d = 1, 1, 256, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    want = dense_attention(q, k, v, causal=True)
    got = run_flash(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_flash_with_bias_and_ragged_kv(rng):
    """Non-multiple kv length exercises the pad-masking path; bias exercises
    the CPB-style additive path."""
    b, h, n, m, d = 1, 2, 130, 200, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, n, m)), jnp.float32)
    want = dense_attention(q, k, v, bias=bias)
    got = run_flash(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_pallas_patchify_matches_xla_path(rng):
    import dataclasses
    from ctpa.core.config import CTViTConfig
    from ctpa.models.ctvit import CTViT

    VIT = CTViTConfig.tiny()
    model_x = CTViT(VIT)
    model_p = CTViT(dataclasses.replace(VIT, pallas_patchify=True))
    video = jnp.asarray(
        rng.normal(size=(2, 1, VIT.temporal_size, VIT.image_size, VIT.image_size)),
        jnp.float32)
    params = model_x.init(jax.random.key(0), video, None)
    want = model_x.apply(params, video, method=lambda m, v: m.patch_embed(v))
    with pltpu.force_tpu_interpret_mode():
        got = model_p.apply(params, video, method=lambda m, v: m.patch_embed(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


def test_flash_kv_mask_matches_dense(rng):
    """Right-padded key masking (the LLM prefill path)."""
    b, h, n, d = 2, 2, 256, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    lens = jnp.asarray([200, 131])
    kv_mask = (jnp.arange(n)[None, :] < lens[:, None])

    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / np.sqrt(d)
    causal = jnp.tril(jnp.ones((n, n), bool))
    mask = causal[None, None] & kv_mask[:, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bhnm,bhmd->bhnd", p, v)

    got = run_flash(q, k, v, causal=True, kv_mask=kv_mask)
    # only real-query rows are comparable (pad queries are dropped by loss)
    wm = np.asarray(kv_mask)
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, wm[bi]], np.asarray(want)[bi, :, wm[bi]],
            rtol=2e-3, atol=2e-3)
