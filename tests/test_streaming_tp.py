"""Tensor-parallel serving: the ContinuousBatcher over a (data, model) mesh
must reproduce the single-device batcher's greedy tokens exactly, with the
params Megatron-sharded and the KV cache sharded over its kv-head axis.

The reference has no model parallelism anywhere (SURVEY.md §2.4); TP serving
is the path to models that exceed one chip's HBM.  Runs on the 8-device
virtual CPU mesh (tests/conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ctpa.core.config import CTViTConfig, LLMConfig, MeshConfig, ReportGenConfig
from ctpa.core.mesh import MODEL_AXIS, create_mesh
from ctpa.models.llm import KVCache
from ctpa.models.report_generator import CTReportGenerator
from ctpa.parallel.sharding import kv_cache_shardings
from ctpa.pipelines.streaming import ContinuousBatcher, Request

LLM = LLMConfig.tiny()   # kv_heads=2 — divides the tp=2 axis below
VIT = CTViTConfig.tiny()


@pytest.fixture(scope="module")
def rg():
    gen_cfg = ReportGenConfig(vision_dim=32)
    model = CTReportGenerator(LLM, VIT, gen_cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.normal(size=(1, 1, VIT.temporal_size, VIT.image_size, VIT.image_size)),
        jnp.float32)
    ids = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(1, 6)), jnp.int32)
    mask = jnp.ones((1, 6), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask)
    return model, params, video


def _run_batcher(model, params, vision, prompts, mesh=None):
    batcher = ContinuousBatcher(model, params, num_lanes=2, max_len=32,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32, steps_per_sync=2,
                                mesh=mesh)
    for i, p in enumerate(prompts):
        batcher.submit(Request(request_id=i, input_ids=p,
                               attention_mask=np.ones(len(p), np.int32),
                               vision=vision, max_new_tokens=8))
    results = batcher.run_until_done()
    return batcher, {i: list(results[i].tokens) for i in range(len(prompts))}


def test_kv_cache_shardings_shard_heads():
    mesh = create_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    cache = jax.eval_shape(lambda: KVCache.create(LLM, 2, 32, dtype=jnp.float32))
    sh = kv_cache_shardings(cache, mesh)
    assert sh.k.spec == P(None, None, MODEL_AXIS, None, None)
    assert sh.write_offset.spec == P()
    # non-divisible kv_heads falls back to replication
    mesh8 = create_mesh(MeshConfig(data_parallel=1, model_parallel=8))
    sh8 = kv_cache_shardings(cache, mesh8)
    assert sh8.k.spec == P()


def test_tp_batcher_matches_single_device(rg):
    model, params, video = rg
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, LLM.vocab_size, size=(6,)).astype(np.int32)
               for _ in range(3)]   # 3 requests / 2 lanes forces lane reuse
    vision = model.apply(params, video, method=CTReportGenerator.extract_vision)[0]

    _, want = _run_batcher(model, params, vision, prompts, mesh=None)

    mesh = create_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    tp_batcher, got = _run_batcher(model, params, vision, prompts, mesh=mesh)

    # the TP run must actually be sharded, not a silent replicated fallback
    k_sharding = tp_batcher.cache.k.sharding
    assert isinstance(k_sharding, NamedSharding)
    assert k_sharding.spec == P(None, None, MODEL_AXIS, None, None)
    param_specs = {s.spec for s in jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding, tp_batcher.params))}
    assert any(spec != P() for spec in param_specs)

    assert got == want
    assert all(len(t) == 8 for t in got.values())


def test_tp_batcher_int8_kv_matches_single_device(rg):
    """kv_quant='int8' under TP: the per-(token, kv-head) scale tensors are
    sharded over the model axis alongside the int8 rows; tokens must still
    match the single-device int8-KV batcher exactly (quantization is
    deterministic)."""
    import dataclasses

    model, params, video = rg
    cfg_q = dataclasses.replace(LLM, kv_quant="int8")
    model_q = CTReportGenerator(cfg_q, VIT, ReportGenConfig(vision_dim=32))
    rng = np.random.default_rng(9)
    prompts = [rng.integers(1, LLM.vocab_size, size=(6,)).astype(np.int32)
               for _ in range(3)]
    vision = model.apply(params, video, method=CTReportGenerator.extract_vision)[0]

    def run(mesh):
        b = ContinuousBatcher(model_q, params, num_lanes=2, max_len=32,
                              eos_token_id=-1, greedy=True, steps_per_sync=2,
                              mesh=mesh)
        assert b.cache.k.dtype == jnp.int8
        for i, p in enumerate(prompts):
            b.submit(Request(request_id=i, input_ids=p,
                             attention_mask=np.ones(6, np.int32),
                             vision=vision, max_new_tokens=8))
        res = b.run_until_done()
        return b, {i: list(res[i].tokens) for i in range(3)}

    _, want = run(None)
    mesh = create_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    tp, got = run(mesh)
    assert tp.cache.k_scale.sharding.spec == P(None, None, MODEL_AXIS, None)
    assert got == want


def test_tp_batcher_rejects_single_chip_pallas_kernels(rg):
    """flash_decode / pallas quant matmuls are single-chip programs; the TP
    batcher must refuse them loudly instead of letting GSPMD silently
    replicate sharded weights around a pallas_call."""
    import dataclasses

    model, params, _ = rg
    mesh = create_mesh(MeshConfig(data_parallel=4, model_parallel=2))

    fd_model = CTReportGenerator(
        dataclasses.replace(LLM, flash_decode=True), VIT,
        ReportGenConfig(vision_dim=32))
    with pytest.raises(ValueError, match="flash_decode"):
        ContinuousBatcher(fd_model, params, num_lanes=2, max_len=32, mesh=mesh)

    q_model = CTReportGenerator(
        dataclasses.replace(LLM, weight_quant="int8", quant_impl="pallas"),
        VIT, ReportGenConfig(vision_dim=32))
    with pytest.raises(ValueError, match="quant_impl"):
        ContinuousBatcher(q_model, params, num_lanes=2, max_len=32, mesh=mesh)
