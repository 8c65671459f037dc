"""Context-parallel attention on the 8-device virtual mesh (SURVEY §5.7:
sequence parallelism is new TPU-native capability; reference has none)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctpa.core.config import MeshConfig
from ctpa.core.mesh import DATA_AXIS, create_mesh
from ctpa.parallel.context import context_parallel_attention


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshConfig(data_parallel=8, model_parallel=1))


def _ref(q, k, v, bias=None, kv_mask=None):
    d = q.shape[-1]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / np.sqrt(d)
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :] > 0, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32)).astype(q.dtype)


def test_cp_matches_single_device(mesh, rng):
    b, h, n, d = 2, 2, 256, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    want = _ref(q, k, v)
    got = context_parallel_attention(q, k, v, mesh, DATA_AXIS, impl="dense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cp_with_bias_and_kv_mask(mesh, rng):
    """CPB-style (h, n, n) bias rows follow the q shard; key mask is global."""
    b, h, n, d = 1, 2, 512, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32) * 0.1
    kv_mask = (jnp.arange(n)[None, :] < 400) & jnp.ones((b, 1), bool)
    want = _ref(q, k, v, bias=bias, kv_mask=kv_mask)
    got = context_parallel_attention(q, k, v, mesh, DATA_AXIS, bias=bias,
                                     kv_mask=kv_mask, impl="dense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cp_gradients_match(mesh, rng):
    """dK/dV flow back through the all_gather transpose (psum_scatter)."""
    b, h, n, d = 1, 2, 256, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)

    def loss_cp(q, k, v):
        o = context_parallel_attention(q, k, v, mesh, DATA_AXIS, impl="dense")
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v) * w)

    got = jax.grad(loss_cp, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_cp_flash_impl_interpreted(rng):
    """The flash kernel composes with shard_map (interpret mode on CPU).
    Tiny shapes and a 2-way mesh: interpret-mode emulation inside shard_map
    re-runs the kernel per shard, so full-size geometry here is minutes."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:2]).reshape(2, 1)
    mesh2 = Mesh(devs, (DATA_AXIS, "model"))
    b, h, n, d = 1, 1, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    want = _ref(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = context_parallel_attention(q, k, v, mesh2, DATA_AXIS,
                                         impl="flash")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_cp_rejects_indivisible(mesh, rng):
    q = jnp.zeros((1, 1, 100, 32))
    with pytest.raises(ValueError):
        context_parallel_attention(q, q, q, mesh, DATA_AXIS, impl="dense")


def test_ctvit_fused_encoder_cp_matches_unsharded(rng):
    """CTViT(cp_mesh=...) shards the fused-encoder sequence; output must
    match the unsharded fused path (interpret mode on CPU, 2-way mesh)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    from ctpa.core.config import CTViTConfig
    from ctpa.models.ctvit import CTViT

    cfg = dataclasses.replace(CTViTConfig.tiny(), fused_attention=True,
                              fused_depth=1)
    video = jnp.asarray(rng.normal(size=(1, 1, cfg.temporal_size,
                                         cfg.image_size, cfg.image_size)),
                        jnp.float32)
    base = CTViT(cfg)
    devs = np.asarray(jax.devices()[:2]).reshape(2, 1)
    mesh2 = Mesh(devs, (DATA_AXIS, "model"))
    cp = CTViT(cfg, cp_mesh=mesh2, cp_axis=DATA_AXIS)

    def encode(m, v):
        return m.encode_tokens(m.patch_embed(v))

    with pltpu.force_tpu_interpret_mode():
        # Every program here is JITTED and drained before the next starts.
        # Un-jitted, the eager apply dispatches ops one at a time from the
        # main thread WHILE the interpret-mode pallas call's io_callbacks
        # (loads/stores on the runtime callback thread, themselves eager
        # dispatches) are still in flight — the two eager dispatchers
        # deadlock (stack captured 2026-08-21: callback thread in
        # interpret `store`, main thread in the post-attention LayerNorm's
        # eager `square`; the suite hung here on 2 of 3 runs that day).
        # Under jit the callbacks run inside one program execution and the
        # main thread only waits; block_until_ready + effects_barrier stop
        # trailing callbacks from racing the NEXT program's dispatch.
        params = jax.jit(
            lambda k, v: base.init(k, v, method=lambda m, vv: encode(m, vv))
        )(jax.random.key(0), video)
        jax.block_until_ready(params)
        jax.effects_barrier()
        want = jax.jit(
            lambda p, v: base.apply(p, v, method=lambda m, vv: encode(m, vv))
        )(params, video)
        jax.block_until_ready(want)
        jax.effects_barrier()
        got = jax.jit(
            lambda p, v: cp.apply(p, v, method=lambda m, vv: encode(m, vv))
        )(params, video)
        jax.block_until_ready(got)
        jax.effects_barrier()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_cp_causal_matches_single_device(mesh, rng):
    """Causal sequence parallelism: per-shard q_offset reproduces the global
    causal mask (the LLM-training SP path)."""
    b, h, n, d = 1, 2, 256, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)

    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) / np.sqrt(d)
    causal = jnp.tril(jnp.ones((n, n), bool))
    p = jax.nn.softmax(jnp.where(causal[None, None], s, -1e30), axis=-1)
    want = jnp.einsum("bhnm,bhmd->bhnd", p, v)

    got = context_parallel_attention(q, k, v, mesh, DATA_AXIS, impl="dense",
                                     causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cp_causal_flash_interpreted(rng):
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:2]).reshape(2, 1)
    mesh2 = Mesh(devs, (DATA_AXIS, "model"))
    b, h, n, d = 1, 1, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    want = context_parallel_attention(q, k, v, mesh2, DATA_AXIS, impl="dense",
                                      causal=True)
    with pltpu.force_tpu_interpret_mode():
        got = context_parallel_attention(q, k, v, mesh2, DATA_AXIS,
                                         impl="flash", causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
