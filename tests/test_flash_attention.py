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


# ---------------------------------------------------------------------------
# Gradients (custom VJP): pallas bwd kernels (no bias) and dense bwd (bias)
# ---------------------------------------------------------------------------


def _loss_pair(fn_flash, fn_dense, args_flash, args_dense, wrt):
    def mk(fn, args):
        def loss(*diff):
            a = list(args)
            for slot, val in zip(wrt, diff):
                a[slot] = val
            out = fn(*a)
            # position-weighted sum -> non-uniform cotangent
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
            return jnp.sum(out.astype(jnp.float32) * w * 1e-3)
        return loss
    diff_f = [args_flash[i] for i in wrt]
    diff_d = [args_dense[i] for i in wrt]
    gf = jax.grad(mk(fn_flash, args_flash), argnums=tuple(range(len(wrt))))(*diff_f)
    gd = jax.grad(mk(fn_dense, args_dense), argnums=tuple(range(len(wrt))))(*diff_d)
    return gf, gd


def test_flash_grad_matches_dense_causal_kvmask(rng):
    """The LLM flash_prefill training geometry: causal + right-pad kv_mask.
    dq/dk/dv from the pallas bwd kernels vs autodiff through dense."""
    b, h, n, d = 2, 2, 256, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    lens = jnp.asarray([256, 131])
    kv_mask = (jnp.arange(n)[None, :] < lens[:, None])

    def dense(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / np.sqrt(d)
        mask = jnp.tril(jnp.ones((n, n), bool))[None, None] & kv_mask[:, None, None, :]
        p = jax.nn.softmax(jnp.where(mask, s, -1e30), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", p, v)
        # zero pad-query rows (their grads are dropped by any real loss)
        return out * kv_mask[:, None, :, None]

    def flash(q, k, v):
        out = flash_attention(q, k, v, causal=True, kv_mask=kv_mask)
        return out * kv_mask[:, None, :, None]

    with pltpu.force_tpu_interpret_mode():
        (gq, gk, gv), (wq, wk, wv) = _loss_pair(
            flash, dense, (q, k, v), (q, k, v), wrt=(0, 1, 2))
    for g, w, name in ((gq, wq, "dq"), (gk, wk, "dk"), (gv, wv, "dv")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_flash_grad_matches_dense_noncausal(rng):
    b, h, n, m, d = 1, 2, 130, 200, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        (gq, gk, gv), (wq, wk, wv) = _loss_pair(
            lambda q, k, v: flash_attention(q, k, v),
            lambda q, k, v: dense_attention(q, k, v),
            (q, k, v), (q, k, v), wrt=(0, 1, 2))
    for g, w, name in ((gq, wq, "dq"), (gk, wk, "dk"), (gv, wv, "dv")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_flash_grad_with_bias_includes_dbias(rng):
    """Bias (CPB) path: dense backward, including the bias gradient."""
    b, h, n, m, d = 1, 2, 128, 128, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, n, m)), jnp.float32) * 0.1

    with pltpu.force_tpu_interpret_mode():
        (gq, gk, gv, gb), (wq, wk, wv, wb) = _loss_pair(
            lambda q, k, v, bb: flash_attention(q, k, v, bias=bb),
            lambda q, k, v, bb: dense_attention(q, k, v, bias=bb),
            (q, k, v, bias), (q, k, v, bias), wrt=(0, 1, 2, 3))
    for g, w, name in ((gq, wq, "dq"), (gk, wk, "dk"), (gv, wv, "dv"),
                       (gb, wb, "dbias")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


@pytest.mark.slow
def test_llm_flash_prefill_grad(rng):
    """End-to-end: jax.grad through the LLM with flash_prefill=True."""
    import dataclasses

    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import LlamaForCausalLM

    cfg = dataclasses.replace(LLMConfig.tiny(), flash_prefill=True,
                              flash_min_len=16)
    model = LlamaForCausalLM(cfg)
    b, n = 2, 48
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(b, n)), jnp.int32)
    lens = np.asarray([48, 31])
    mask = jnp.asarray(np.arange(n)[None, :] < lens[:, None], jnp.int32)

    def loss(p):
        logits, _, _ = model.apply(p, ids, mask)
        lm = mask[:, :, None].astype(jnp.float32)
        return jnp.sum((logits.astype(jnp.float32) * lm) ** 2) / mask.sum()

    with pltpu.force_tpu_interpret_mode():
        params = model.init(jax.random.key(0), ids, mask)
        g = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(norms)), norms
    assert max(norms) > 0.0


def test_flash_q_offset_matches_dense(rng):
    """Dynamic q_offset (context-parallel causal shard): queries are rows
    [off, off+n) of a longer sequence attending all m keys causally."""
    b, h, n, m, d = 1, 2, 128, 384, 32
    off = 128                                    # shard 1 of 3
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)

    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / np.sqrt(d)
    mask = (jnp.arange(m)[None, :] <= (jnp.arange(n)[:, None] + off))
    p = jax.nn.softmax(jnp.where(mask[None, None], s, -1e30), axis=-1)
    want = jnp.einsum("bhnm,bhmd->bhnd", p, v)

    got = run_flash(q, k, v, causal=True, q_offset=jnp.int32(off))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_q_offset_grads_match_dense(rng):
    b, h, n, m, d = 1, 1, 128, 256, 32
    off = 64
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)

    def dense(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / np.sqrt(d)
        mask = (jnp.arange(m)[None, :] <= (jnp.arange(n)[:, None] + off))
        p = jax.nn.softmax(jnp.where(mask[None, None], s, -1e30), axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    def flash(q, k, v):
        return flash_attention(q, k, v, causal=True, q_offset=jnp.int32(off))

    with pltpu.force_tpu_interpret_mode():
        (gq, gk, gv), (wq, wk, wv) = _loss_pair(
            flash, dense, (q, k, v), (q, k, v), wrt=(0, 1, 2))
    for g, w, name in ((gq, wq, "dq"), (gk, wk, "dk"), (gv, wv, "dv")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


# ---------------------------------------------------------------------------
# Flat-softmax fast path (logit_bound): cosine-attention-style bounded logits
# skip the running max entirely — round-3 fast path (module docstring).
# ---------------------------------------------------------------------------


def _cosine_qk(rng, shape, scale=8.0):
    """l2-normalized q/k so `scale` is a true logit bound (models/attention)."""
    x = rng.normal(size=shape)
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.asarray(x, jnp.float32)


@pytest.mark.parametrize("n,m", [(256, 256), (130, 200)])
def test_flash_logit_bound_matches_dense(rng, n, m):
    """Bounded (flat) path vs dense, incl. the ragged-kv pad masking."""
    b, h, d, scale = 1, 2, 32, 8.0
    q = _cosine_qk(rng, (b, h, n, d))
    k = _cosine_qk(rng, (b, h, m, d))
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    want = dense_attention(q, k, v, scale=scale)
    got = run_flash(q, k, v, scale=scale, logit_bound=jnp.float32(scale))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_logit_bound_causal_kvmask(rng):
    b, h, n, d, scale = 2, 2, 256, 32, 8.0
    q = _cosine_qk(rng, (b, h, n, d))
    k = _cosine_qk(rng, (b, h, n, d))
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    kvm = jnp.asarray(
        np.arange(n)[None, :] < np.array([[n], [n - 70]]), jnp.int32)

    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
    mask = jnp.tril(jnp.ones((n, n), bool))[None, None] \
        & (kvm[:, None, None, :] > 0)
    p = jax.nn.softmax(jnp.where(mask, s, -1e30), axis=-1)
    want = jnp.einsum("bhnm,bhmd->bhnd", p, v)

    got = run_flash(q, k, v, causal=True, scale=scale, kv_mask=kvm,
                    logit_bound=jnp.float32(scale))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_logit_bound_grads_match_dense(rng):
    """Flat-path pallas backward (augmented operands + bound-relative lse)."""
    b, h, n, m, d, scale = 1, 2, 128, 256, 32, 8.0
    q = _cosine_qk(rng, (b, h, n, d))
    k = _cosine_qk(rng, (b, h, m, d))
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)

    def flash(q, k, v):
        return flash_attention(q, k, v, scale=scale,
                               logit_bound=jnp.float32(scale))

    def dense(q, k, v):
        return dense_attention(q, k, v, scale=scale)

    with pltpu.force_tpu_interpret_mode():
        (gq, gk, gv), (wq, wk, wv) = _loss_pair(
            flash, dense, (q, k, v), (q, k, v), wrt=(0, 1, 2))
    for g, w, name in ((gq, wq, "dq"), (gk, wk, "dk"), (gv, wv, "dv")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_flash_loose_bound_still_exact(rng):
    """Softmax is invariant to the uniform bound shift — a LOOSE bound (the
    analytic worst case is rarely attained) must not change the result."""
    b, h, n, d, scale = 1, 1, 128, 32, 8.0
    q = _cosine_qk(rng, (b, h, n, d))
    k = _cosine_qk(rng, (b, h, n, d))
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    tight = run_flash(q, k, v, scale=scale, logit_bound=jnp.float32(scale))
    loose = run_flash(q, k, v, scale=scale,
                      logit_bound=jnp.float32(scale + 30.0))
    np.testing.assert_allclose(np.asarray(loose), np.asarray(tight),
                               rtol=2e-4, atol=2e-4)


def test_patchify_rows_matches_chunked(rng):
    """'rows' formulation (g folded into weights, hb-fused dots) is exact vs
    the round-2 'chunked' kernel and the XLA composition."""
    from ctpa.ops.pallas.patchify import patchify_project

    T, H, W = 20, 80, 80
    pt, p1, p2, dim = 10, 20, 20, 64
    vol = jnp.asarray(rng.normal(size=(T, H, W)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(pt * p1 * p2,)), jnp.float32)
    K = jnp.asarray(rng.normal(size=(pt * p1 * p2, dim)) * 0.02, jnp.float32)

    x = vol.reshape(T // pt, pt, H // p1, p1, W // p2, p2).transpose(
        0, 2, 4, 1, 3, 5).reshape(T // pt, H // p1, W // p2, -1)
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (((x - mu) * jax.lax.rsqrt(var + 1e-5)) * g) @ K

    with pltpu.force_tpu_interpret_mode():
        got = patchify_project(vol, g, K, pt, p1, p2,
                               out_dtype=jnp.float32, impl="rows")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_patchify_linear_matches_reference(rng):
    """'linear' formulation (pt<->h pre-transpose so every slab is one
    contiguous HBM region) is exact vs the XLA composition."""
    from ctpa.ops.pallas.patchify import patchify_project

    T, H, W = 20, 80, 80
    pt, p1, p2, dim = 10, 20, 20, 64
    vol = jnp.asarray(rng.normal(size=(T, H, W)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(pt * p1 * p2,)), jnp.float32)
    K = jnp.asarray(rng.normal(size=(pt * p1 * p2, dim)) * 0.02, jnp.float32)

    x = vol.reshape(T // pt, pt, H // p1, p1, W // p2, p2).transpose(
        0, 2, 4, 1, 3, 5).reshape(T // pt, H // p1, W // p2, -1)
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (((x - mu) * jax.lax.rsqrt(var + 1e-5)) * g) @ K

    with pltpu.force_tpu_interpret_mode():
        got = patchify_project(vol, g, K, pt, p1, p2,
                               out_dtype=jnp.float32, impl="linear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_flash_bias_grad_accumulates_over_batch(rng):
    """(h, n, m) CPB bias broadcast over b > 1: d(bias) must SUM over the
    batch items — the _db_kernel inner-walk accumulation.  Unpadded-n/m-
    unfriendly sizes exercise the pad-row masking inside the db pass."""
    b, h, n, m, d = 3, 2, 160, 130, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, n, m)), jnp.float32) * 0.1

    with pltpu.force_tpu_interpret_mode():
        (gq, gk, gv, gb), (wq, wk, wv, wb) = _loss_pair(
            lambda q, k, v, bb: flash_attention(q, k, v, bias=bb),
            lambda q, k, v, bb: dense_attention(q, k, v, bias=bb),
            (q, k, v, bias), (q, k, v, bias), wrt=(0, 1, 2, 3))
    for g, w, name in ((gq, wq, "dq"), (gk, wk, "dk"), (gv, wv, "dv"),
                       (gb, wb, "dbias")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_flash_bias_grad_single_slab_sums_heads(rng):
    """(1, n, m) bias with h > 1: d(bias) sums over batch AND heads (the
    h_bias == 1 inner walk covers all b*h grid items)."""
    b, h, n, m, d = 2, 3, 128, 128, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(1, n, m)), jnp.float32) * 0.1

    with pltpu.force_tpu_interpret_mode():
        (gq, gb), (wq, wb) = _loss_pair(
            lambda q, bb: flash_attention(q, k, v, bias=bb),
            lambda q, bb: dense_attention(q, k, v, bias=bb),
            (q, bias), (q, bias), wrt=(0, 1))
    np.testing.assert_allclose(np.asarray(gq), np.asarray(wq),
                               rtol=2e-3, atol=2e-3, err_msg="dq")
    np.testing.assert_allclose(np.asarray(gb), np.asarray(wb),
                               rtol=2e-3, atol=2e-3, err_msg="dbias")


def test_flash_bias_logit_bound_grads_match_dense(rng):
    """The flash_axial TRAINING combination: CPB bias + cosine logit_bound
    (flat softmax) at the axial-fold geometry (576 tokens, d=32, b-fold).
    Gradients through the augmented-operand flat path must match dense."""
    b, h, n, d = 2, 2, 576, 32
    # bounded logits like the cosine path: unit-ish rows + bounded bias
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    bias = jnp.tanh(jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32))
    scale, bound = 8.0, 8.0 + 1.0          # |cos|<=1 scaled + |bias|<=1

    with pltpu.force_tpu_interpret_mode():
        (gq, gk, gv, gb), (wq, wk, wv, wb) = _loss_pair(
            lambda q, k, v, bb: flash_attention(
                q, k, v, bias=bb, scale=scale,
                logit_bound=jnp.float32(bound)),
            lambda q, k, v, bb: dense_attention(q, k, v, bias=bb,
                                                scale=scale),
            (q, k, v, bias), (q, k, v, bias), wrt=(0, 1, 2, 3))
    for g, w, name in ((gq, wq, "dq"), (gk, wk, "dk"), (gv, wv, "dv"),
                       (gb, wb, "dbias")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=3e-3, atol=3e-3, err_msg=name)
