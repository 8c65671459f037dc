"""Tensor-parallel LLM on the 8-device virtual mesh (SURVEY §2.4: TP is new
capability; round-1 only exercised the CLIP tower's TP rules).

Checks that Megatron-style sharding of the llama projections (LLM_RULES)
produces the same logits as the replicated model, for both the full forward
(training shape) and the KV-cached decode step, on a dp=2 x tp=4 mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ctpa.core.config import LLMConfig, MeshConfig
from ctpa.core.mesh import DATA_AXIS, create_mesh
from ctpa.models.llm import KVCache, LlamaForCausalLM
from ctpa.parallel.sharding import llm_param_shardings


def _setup(mesh):
    cfg = LLMConfig.tiny()   # hidden 64, heads 4, kv 2, ffn 128 — all % 4 == 0
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(0)
    b, n = 4, 16
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(b, n)), jnp.int32)
    mask = jnp.ones((b, n), jnp.int32)
    params = model.init(jax.random.key(0), ids, mask)
    return cfg, model, params, ids, mask


def test_tp_forward_matches_replicated():
    mesh = create_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    cfg, model, params, ids, mask = _setup(mesh)

    want, _, _ = jax.jit(lambda p, i, m: model.apply(p, i, m))(params, ids, mask)

    shardings = llm_param_shardings(params, mesh)
    # at least the attention/MLP kernels must actually be TP-sharded —
    # otherwise this test silently degrades to replicated-vs-replicated
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, shardings,
                     is_leaf=lambda x: isinstance(x, NamedSharding)))
    assert any(spec != P() for spec in specs)

    p_sh = jax.device_put(params, shardings)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    fwd = jax.jit(lambda p, i, m: model.apply(p, i, m),
                  in_shardings=(shardings, data_sh, data_sh))
    got, _, _ = fwd(p_sh, jax.device_put(ids, data_sh),
                    jax.device_put(mask, data_sh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_tp_cached_decode_matches_replicated():
    mesh = create_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    cfg, model, params, ids, mask = _setup(mesh)
    b = ids.shape[0]

    def prefill_step(p, ids, mask, cache):
        logits, _, cache = model.apply(p, ids, mask, cache=cache)
        tok = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1).astype(jnp.int32)
        logits2, _, cache = model.apply(p, tok[:, None], None, cache=cache)
        return logits2[:, 0]

    cache = KVCache.create(cfg, b, max_len=32, dtype=jnp.float32)
    want = jax.jit(prefill_step)(params, ids, mask, cache)

    shardings = llm_param_shardings(params, mesh)
    p_sh = jax.device_put(params, shardings)
    got = jax.jit(prefill_step)(p_sh, ids, mask, cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
