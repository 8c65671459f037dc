"""Weight-only int8 serving quantization (ops/quant.py, models/llm.Int8Dense).
New capability beyond the reference (it loads Meditron in bf16,
train_module.py:307-313); decode at 7B is weight-read bound so int8 weights
halve the per-step HBM traffic."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ctpa.ops.quant import (dequantize_int8, int8_matmul, quantize_int8,
                            quantize_tree)


def test_quantize_roundtrip_error_bound(rng):
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.04, jnp.float32)
    w8, s = quantize_int8(w)
    assert w8.dtype == jnp.int8 and s.shape == (128,)
    back = dequantize_int8(w8, s, jnp.float32)
    # symmetric per-channel absmax: error <= scale/2 per element
    err = np.abs(np.asarray(back) - np.asarray(w))
    bound = np.asarray(s)[None, :] * 0.5 + 1e-8
    assert (err <= bound).all()


def test_int8_matmul_xla_matches_dequant(rng):
    x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 192)) * 0.05, jnp.float32)
    w8, s = quantize_int8(w)
    want = x @ dequantize_int8(w8, s, jnp.float32)
    got = int8_matmul(x, w8, s, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_int8_matmul_pallas_matches_xla(rng):
    x = jnp.asarray(rng.normal(size=(4, 384)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(384, 300)) * 0.05, jnp.float32)
    w8, s = quantize_int8(w)
    want = int8_matmul(x, w8, s, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = int8_matmul(x, w8, s, impl="pallas", block_in=128, block_out=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_quantize_tree_structure():
    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import LlamaForCausalLM

    cfg = LLMConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(0), ids, jnp.ones((1, 8), jnp.int32))
    qp = quantize_tree(params)   # fuse=True default
    flat = {jax.tree_util.keystr(kp): v.dtype
            for kp, v in jax.tree_util.tree_flatten_with_path(qp)[0]}
    qkeys = [k for k in flat if "kernel_q" in k]
    assert qkeys and all(flat[k] == jnp.int8 for k in qkeys)
    assert any("qkv_proj" in k for k in qkeys)       # q/k/v fused
    assert any("gateup_proj" in k for k in qkeys)    # gate/up fused
    assert not any("q_proj" in k for k in qkeys)
    assert any("lm_head" in k for k in qkeys)
    # embeddings / norms untouched
    assert any("embed" in k and "kernel_q" not in k for k in flat)

    up = quantize_tree(params, fuse=False)
    ukeys = [jax.tree_util.keystr(kp)
             for kp, _ in jax.tree_util.tree_flatten_with_path(up)[0]]
    assert any("q_proj" in k and "kernel_q" in k for k in ukeys)
    assert not any("qkv_proj" in k for k in ukeys)


def test_quantized_llm_decode_matches_fp(rng):
    """Int8Dense wired via LLMConfig.weight_quant: full-forward logits of the
    quantized model track the fp32 model (same weights, quantized), and the
    greedy next token agrees."""
    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import LlamaForCausalLM

    cfg = LLMConfig.tiny()
    b, n = 2, 16
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(b, n)), jnp.int32)
    mask = jnp.ones((b, n), jnp.int32)
    fp = LlamaForCausalLM(cfg)
    params = fp.init(jax.random.key(0), ids, mask)
    want, _, _ = fp.apply(params, ids, mask)
    w = np.asarray(want, np.float32)

    for fused in (True, False):
        cfg_q = dataclasses.replace(cfg, weight_quant="int8",
                                    quant_impl="xla", quant_fused=fused)
        qm = LlamaForCausalLM(cfg_q)
        qparams = quantize_tree(params, fuse=fused)
        got, _, _ = qm.apply(qparams, ids, mask)
        g = np.asarray(got, np.float32)
        # int8 weight error accumulates over layers: require close logits
        # and matching greedy decisions
        assert np.abs(g - w).max() / (np.abs(w).max() + 1e-9) < 0.05, fused
        assert (g.argmax(-1) == w.argmax(-1)).mean() > 0.95, fused


def test_quant_rejects_lora():
    from ctpa.core.config import LLMConfig, LoRAConfig
    from ctpa.models.llm import LlamaForCausalLM

    cfg = dataclasses.replace(LLMConfig.tiny(), weight_quant="int8",
                              quant_impl="xla")
    lora = LoRAConfig(rank=4, alpha=8.0)
    model = LlamaForCausalLM(cfg, lora=lora)
    ids = jnp.zeros((1, 4), jnp.int32)
    with pytest.raises(ValueError):
        model.init(jax.random.key(0), ids, jnp.ones((1, 4), jnp.int32))


def test_quantized_model_serves_in_batcher(rng, tmp_path):
    """End-to-end serving lifecycle: train-dtype params -> quantize_tree ->
    orbax save/restore -> ContinuousBatcher decode with the quantized model."""
    from ctpa.core.checkpoint import CheckpointManager
    from ctpa.core.config import CTViTConfig, LLMConfig, ReportGenConfig
    from ctpa.models.report_generator import CTReportGenerator
    from ctpa.pipelines.streaming import ContinuousBatcher, Request

    llm_cfg = LLMConfig.tiny()
    vit_cfg = CTViTConfig.tiny()
    gen_cfg = ReportGenConfig(vision_dim=128)
    fp_model = CTReportGenerator(llm_cfg, vit_cfg, gen_cfg)

    video = jnp.zeros((1, 1, vit_cfg.temporal_size, vit_cfg.image_size,
                       vit_cfg.image_size), jnp.float32)
    pids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
    params = fp_model.init(jax.random.key(0), video, pids, pids)
    qparams = quantize_tree(params)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, {"params": qparams})
    restored = mgr.restore()["params"]
    chk = jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: bool(jnp.all(a == b)), qparams, restored))
    assert chk

    q_cfg = dataclasses.replace(llm_cfg, weight_quant="int8",
                                quant_impl="xla")
    q_model = CTReportGenerator(q_cfg, vit_cfg, gen_cfg)
    batcher = ContinuousBatcher(q_model, restored, num_lanes=2, max_len=24,
                                eos_token_id=-1, greedy=True)
    vis = jnp.zeros((128,), jnp.float32)
    for rid in range(2):
        batcher.submit(Request(request_id=rid, input_ids=pids[0],
                               attention_mask=jnp.ones((8,), jnp.int32),
                               vision=vis, max_new_tokens=6))
    results = batcher.run_until_done()
    assert len(results) == 2
    assert all(len(r.tokens) == 6 for r in results.values())


def test_quantize_tree_merges_lora():
    """Trained LoRA deltas must survive int8 serving: quantize_tree merges
    W + alpha/rank A@B before quantizing, and refuses a LoRA tree without
    the config (silently serving the un-fine-tuned base is the failure the
    guard prevents)."""
    from ctpa.core.config import LLMConfig, LoRAConfig
    from ctpa.models.llm import LlamaForCausalLM
    from ctpa.models.lora import merge_lora_scaled

    lora = LoRAConfig(rank=4, alpha=8.0, target_projections=("q_proj", "v_proj"))
    cfg = LLMConfig.tiny()
    model = LlamaForCausalLM(cfg, lora=lora)
    rng = np.random.default_rng(0)
    b, n = 1, 8
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(b, n)), jnp.int32)
    mask = jnp.ones((b, n), jnp.int32)
    params = model.init(jax.random.key(0), ids, mask)
    # give the adapters non-trivial weight (lora_b inits to zero)
    params = jax.tree_util.tree_map_with_path(
        lambda kp, x: x + 0.05 if "lora_b" in jax.tree_util.keystr(kp) else x,
        params)

    with pytest.raises(ValueError):
        quantize_tree(params)

    qp = quantize_tree(params, lora=lora)
    keys = [jax.tree_util.keystr(kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(qp)[0]]
    assert not any("lora_" in k for k in keys)

    # the quantized model must track the MERGED model, not the base
    merged = merge_lora_scaled(params, lora.alpha, lora.rank)
    want, _, _ = model.apply(merged, ids, mask)
    cfg_q = dataclasses.replace(cfg, weight_quant="int8", quant_impl="xla")
    qm = LlamaForCausalLM(cfg_q)
    got, _, _ = qm.apply(qp, ids, mask)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    assert np.abs(g - w).max() / (np.abs(w).max() + 1e-9) < 0.05
    assert (g.argmax(-1) == w.argmax(-1)).mean() > 0.95


def test_quantize_tree_incomplete_fuse_group_raises():
    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import LlamaForCausalLM

    cfg = LLMConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.key(0), ids, jnp.ones((1, 4), jnp.int32))
    with pytest.raises(ValueError):
        quantize_tree(params, targets=("q_proj", "o_proj"))


def test_int8_ffn_kernel_matches_separate(rng):
    """Fused SwiGLU FFN pallas kernel == silu(x@g)*(x@u) @ d with dequantized
    weights (interpret mode; non-multiple intermediate exercises padding)."""
    from ctpa.ops.quant import int8_ffn

    hidden, inter, m = 128, 176, 5
    x = jnp.asarray(rng.normal(size=(m, hidden)), jnp.float32)
    wg = jnp.asarray(rng.normal(size=(hidden, inter)) * 0.05, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(hidden, inter)) * 0.05, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(inter, hidden)) * 0.05, jnp.float32)
    wg8, sg = quantize_int8(wg)
    wu8, su = quantize_int8(wu)
    wd8, sd = quantize_int8(wd)
    g = x @ dequantize_int8(wg8, sg, jnp.float32)
    u = x @ dequantize_int8(wu8, su, jnp.float32)
    want = (jax.nn.silu(g) * u) @ dequantize_int8(wd8, sd, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = int8_ffn(x, wg8, sg, wu8, su, wd8, sd, block_j=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_int8_matmul_w8a8_pallas_matches_xla(rng):
    """act_quant=True: pallas int8×int8→int32 MXU path == the xla int32
    reference (same per-token quantization, exact integer accumulation, same
    f32 dequant ordering — differences are pure float rounding)."""
    x = jnp.asarray(rng.normal(size=(5, 384)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(384, 300)) * 0.05, jnp.float32)
    w8, s = quantize_int8(w)
    want = int8_matmul(x, w8, s, impl="xla", act_quant=True)
    with pltpu.force_tpu_interpret_mode():
        got = int8_matmul(x, w8, s, impl="pallas", block_in=128,
                          block_out=128, act_quant=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_int8_matmul_w8a8_close_to_float(rng):
    """Activation quantization adds ≤~1% per-token error on top of the
    weight quant error; the w8a8 output must track the float matmul."""
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 192)) * 0.05, jnp.float32)
    w8, s = quantize_int8(w)
    want = np.asarray(x @ w)
    got = np.asarray(int8_matmul(x, w8, s, impl="xla", act_quant=True))
    assert np.abs(got - want).max() / (np.abs(want).max() + 1e-9) < 0.02


def test_int8_ffn_w8a8_matches_separate(rng):
    """w8a8 fused FFN: per-j-block requantized hidden activations still track
    the float SwiGLU with dequantized weights (interpret mode)."""
    from ctpa.ops.quant import int8_ffn

    hidden, inter, m = 128, 176, 5
    x = jnp.asarray(rng.normal(size=(m, hidden)), jnp.float32)
    wg = jnp.asarray(rng.normal(size=(hidden, inter)) * 0.05, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(hidden, inter)) * 0.05, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(inter, hidden)) * 0.05, jnp.float32)
    wg8, sg = quantize_int8(wg)
    wu8, su = quantize_int8(wu)
    wd8, sd = quantize_int8(wd)
    g = x @ dequantize_int8(wg8, sg, jnp.float32)
    u = x @ dequantize_int8(wu8, su, jnp.float32)
    want = np.asarray((jax.nn.silu(g) * u) @ dequantize_int8(wd8, sd,
                                                             jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(int8_ffn(x, wg8, sg, wu8, su, wd8, sd, block_j=64,
                                  act_quant=True))
    assert np.abs(got - want).max() / (np.abs(want).max() + 1e-9) < 0.03


def test_quantize_int4_roundtrip_error_bound(rng):
    from ctpa.ops.quant import dequantize_int4, quantize_int4

    w = jnp.asarray(rng.normal(size=(256, 96)) * 0.04, jnp.float32)
    w4, s = quantize_int4(w, group=128)
    assert w4.dtype == jnp.int8 and w4.shape == (128, 96)
    assert s.shape == (2, 96)
    back = np.asarray(dequantize_int4(w4, s, 128, jnp.float32))
    err = np.abs(back - np.asarray(w))
    bound = np.repeat(np.asarray(s), 128, axis=0) * 0.5 + 1e-8
    assert (err <= bound).all()


def test_int4_matmul_pallas_matches_xla(rng):
    from ctpa.ops.quant import int4_matmul, quantize_int4

    x = jnp.asarray(rng.normal(size=(5, 384)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(384, 200)) * 0.05, jnp.float32)
    w4, s = quantize_int4(w, group=128)
    want = int4_matmul(x, w4, s, group=128, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = int4_matmul(x, w4, s, group=128, impl="pallas",
                          block_in=128, block_out=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
    # and the xla path tracks the float matmul within the 4-bit envelope:
    # per-element err <= s/2 ~ absmax/14, accumulated over 384 random-sign
    # inputs => max deviation ~4 sigma ~ 12% of the max output here (int4
    # noise is ~10x int8's; end-to-end quality is gated by the greedy-token
    # agreement in the llm-level test, not this synthetic worst case)
    ref = np.asarray(x @ w)
    g = np.asarray(want)
    assert np.abs(g - ref).max() / (np.abs(ref).max() + 1e-9) < 0.15


def test_int4_small_input_group_clamps(rng):
    """d_in < group: the group clamps to d_in (tiny-config geometry)."""
    from ctpa.ops.quant import int4_matmul, quantize_int4

    x = jnp.asarray(rng.normal(size=(3, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 48)) * 0.05, jnp.float32)
    w4, s = quantize_int4(w, group=128)
    assert s.shape == (1, 48)
    got = np.asarray(int4_matmul(x, w4, s, impl="xla"))
    ref = np.asarray(x @ w)
    assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 0.2


def test_quantized_llm_int4_matches_dequantized_fp(rng):
    """weight_quant='int4' end-to-end: the int4 model must match an fp
    model running the DEQUANTIZED weights almost exactly — that isolates
    implementation correctness (packing, group scales, fused layouts)
    from quantization noise, which on an UNTRAINED tiny net flips ~half
    the argmaxes (int4 noise/signal ~13% per matmul; real trained 7B
    weights at group 128 are the supported quality regime and need real
    checkpoints to gate — see docs)."""
    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import LlamaForCausalLM
    from ctpa.ops.quant import dequantize_int4, quantize_int4

    cfg = LLMConfig.tiny()
    b, n = 2, 10
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(b, n)), jnp.int32)
    mask = jnp.ones((b, n), jnp.int32)
    fp = LlamaForCausalLM(cfg)
    params = fp.init(jax.random.key(0), ids, mask)

    targets = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
               "up_proj", "down_proj", "lm_head")

    def roundtrip(kp, leaf):
        keys = [getattr(p, "key", str(p)) for p in kp]
        if keys[-1] == "kernel" and any(t in keys for t in targets):
            from ctpa.ops.quant import _int4_group
            g = _int4_group(leaf.shape[0], 128)
            return dequantize_int4(*quantize_int4(leaf, g), group=g,
                                   dtype=jnp.float32)
        return leaf

    deq_params = jax.tree_util.tree_map_with_path(roundtrip, params)
    want, _, _ = fp.apply(deq_params, ids, mask)
    w = np.asarray(want, np.float32)

    cfg_q = dataclasses.replace(cfg, weight_quant="int4", quant_impl="xla",
                                quant_fused=False)
    qm = LlamaForCausalLM(cfg_q)
    qparams = quantize_tree(params, fuse=False, bits=4)
    keys = [jax.tree_util.keystr(kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(qparams)[0]]
    assert any("scale_g" in k for k in keys)
    got, _, _ = qm.apply(qparams, ids, mask)
    g = np.asarray(got, np.float32)
    np.testing.assert_allclose(g, w, rtol=2e-3, atol=2e-3)

    # fused qkv/gateup layout must agree with the unfused one
    cfg_f = dataclasses.replace(cfg_q, quant_fused=True)
    got_f, _, _ = LlamaForCausalLM(cfg_f).apply(
        quantize_tree(params, fuse=True, bits=4), ids, mask)
    np.testing.assert_allclose(np.asarray(got_f, np.float32), g,
                               rtol=2e-3, atol=2e-3)


def test_quantized_llm_w8a8_matches_fp(rng):
    """LLMConfig.quant_act=True end-to-end: per-token activation quant on
    top of int8 weights still tracks fp32 logits and greedy decisions, for
    both the plain projections and the fused FFN kernel."""
    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import LlamaForCausalLM

    cfg = LLMConfig.tiny()
    b, n = 4, 16
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(b, n)), jnp.int32)
    mask = jnp.ones((b, n), jnp.int32)
    fp = LlamaForCausalLM(cfg)
    params = fp.init(jax.random.key(0), ids, mask)
    want, _, _ = fp.apply(params, ids, mask)
    w = np.asarray(want, np.float32)

    for ffn_kernel in (False, True):
        cfg_q = dataclasses.replace(cfg, weight_quant="int8",
                                    quant_impl="xla", quant_act=True,
                                    quant_ffn_kernel=ffn_kernel)
        qm = LlamaForCausalLM(cfg_q)
        qparams = quantize_tree(params, ffn_kernel=ffn_kernel)
        if ffn_kernel:
            with pltpu.force_tpu_interpret_mode():
                got, _, _ = qm.apply(qparams, ids, mask)
        else:
            got, _, _ = qm.apply(qparams, ids, mask)
        g = np.asarray(got, np.float32)
        assert np.abs(g - w).max() / (np.abs(w).max() + 1e-9) < 0.06, ffn_kernel
        # activation quant adds per-token noise on top of weight quant; on
        # the 64-position tiny geometry allow a couple of near-tie flips
        assert (g.argmax(-1) == w.argmax(-1)).mean() > 0.92, ffn_kernel


def test_quantized_llm_with_ffn_kernel_matches_fp(rng):
    """quant_ffn_kernel=True end-to-end: quantize_tree(ffn_kernel=True)
    layout grafts onto the model and logits track fp32 (interpret mode)."""
    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import LlamaForCausalLM

    cfg = LLMConfig.tiny()
    b, n = 2, 8
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(b, n)), jnp.int32)
    mask = jnp.ones((b, n), jnp.int32)
    fp = LlamaForCausalLM(cfg)
    params = fp.init(jax.random.key(0), ids, mask)
    want, _, _ = fp.apply(params, ids, mask)
    w = np.asarray(want, np.float32)

    cfg_q = dataclasses.replace(cfg, weight_quant="int8", quant_impl="xla",
                                quant_ffn_kernel=True)
    qm = LlamaForCausalLM(cfg_q)
    qparams = quantize_tree(params, ffn_kernel=True)
    # layout check: gate/up/down separate, no gateup concat
    keys = [jax.tree_util.keystr(kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(qparams)[0]]
    assert any("gate_proj" in k and "kernel_q" in k for k in keys)
    assert not any("gateup_proj" in k for k in keys)
    with pltpu.force_tpu_interpret_mode():
        got, _, _ = qm.apply(qparams, ids, mask)
    g = np.asarray(got, np.float32)
    assert np.abs(g - w).max() / (np.abs(w).max() + 1e-9) < 0.05
    assert (g.argmax(-1) == w.argmax(-1)).mean() > 0.95


def test_int4_ffn_xla_matches_matmul_composition(rng):
    from ctpa.ops.quant import int4_ffn, int4_matmul, quantize_int4

    hidden, inter, m = 64, 384, 8
    x = jnp.asarray(rng.normal(size=(m, hidden)), jnp.float32)
    wg, sg = quantize_int4(jnp.asarray(rng.normal(size=(hidden, inter)) * 0.1))
    wu, su = quantize_int4(jnp.asarray(rng.normal(size=(hidden, inter)) * 0.1))
    wd, sd = quantize_int4(jnp.asarray(rng.normal(size=(inter, hidden)) * 0.1))

    got = int4_ffn(x, wg, sg, wu, su, wd, sd, impl="xla")
    g = int4_matmul(x, wg, sg, group=64, impl="xla").astype(jnp.float32)
    u = int4_matmul(x, wu, su, group=64, impl="xla").astype(jnp.float32)
    want = int4_matmul(jax.nn.silu(g) * u, wd, sd, group=128, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_int4_ffn_pallas_matches_xla(rng):
    """Fused int4 FFN kernel (interpret mode): different scale-group sizes
    for the hidden (64) and intermediate (128) contractions, intermediate
    not a multiple of the j-block (384 -> padded 512)."""
    from jax.experimental.pallas import tpu as pltpu

    from ctpa.ops.quant import int4_ffn, quantize_int4

    hidden, inter, m = 64, 384, 4
    x = jnp.asarray(rng.normal(size=(m, hidden)), jnp.float32)
    wg, sg = quantize_int4(jnp.asarray(rng.normal(size=(hidden, inter)) * 0.1))
    wu, su = quantize_int4(jnp.asarray(rng.normal(size=(hidden, inter)) * 0.1))
    wd, sd = quantize_int4(jnp.asarray(rng.normal(size=(inter, hidden)) * 0.1))

    want = int4_ffn(x, wg, sg, wu, su, wd, sd, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = int4_ffn(x, wg, sg, wu, su, wd, sd, impl="pallas", block_j=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_quantize_tree_int4_ffn_layout_serves(rng):
    """quantize_tree(bits=4, ffn_kernel=True) keeps separate gate/up/down
    {kernel_q, scale_g} leaves AND the int4 ffn-kernel model accepts the
    tree: tiny cached decode matches the unfused int4 model exactly (same
    quantized weights, xla backend)."""
    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import KVCache, LlamaForCausalLM

    cfg = LLMConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.key(0), ids, mask)

    qtree = quantize_tree(params, bits=4, ffn_kernel=True)
    layers = qtree["params"]["model"]
    layer0 = next(k for k in layers if k.startswith("layer"))
    mlp0 = layers[layer0]["mlp"]
    assert set(mlp0.keys()) == {"gate_proj", "up_proj", "down_proj"}
    assert set(mlp0["gate_proj"].keys()) == {"kernel_q", "scale_g"}

    def decode(cfg_q, tree):
        m = LlamaForCausalLM(cfg_q)
        cache = KVCache.create(cfg_q, 1, max_len=16, dtype=jnp.float32)
        logits, _, cache = m.apply(tree, ids, mask, cache=cache)
        tok = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1)
        logits2, _, _ = m.apply(tree, tok[:, None].astype(jnp.int32), None,
                                cache=cache)
        return np.asarray(logits2[:, 0])

    cfg_f = dataclasses.replace(cfg, weight_quant="int4",
                                quant_ffn_kernel=True, quant_impl="xla")
    cfg_u = dataclasses.replace(cfg, weight_quant="int4", quant_impl="xla")
    got = decode(cfg_f, qtree)
    want = decode(cfg_u, quantize_tree(params, bits=4))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_int4_matmul_w4a8_pallas_matches_xla(rng):
    """w4a8: per-group int8x int8->int32 MXU dots with f32 group-scale
    accumulation; pallas (interpret) must match the exact XLA einsum
    reference, including multi-in-block accumulation and ragged out dims."""
    from ctpa.ops.quant import int4_matmul, quantize_int4

    d_in, d_out, m = 512, 384, 8
    x = jnp.asarray(rng.normal(size=(m, d_in)), jnp.float32)
    w4, s = quantize_int4(jnp.asarray(rng.normal(size=(d_in, d_out)) * 0.1))

    want = int4_matmul(x, w4, s, impl="xla", act_quant=True)
    with pltpu.force_tpu_interpret_mode():
        got = int4_matmul(x, w4, s, impl="pallas", act_quant=True,
                          block_in=256, block_out=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_int4_ffn_w4a8_pallas_matches_float(rng):
    """w4a8 fused FFN kernel (interpret mode): per-group int8 MXU dots for
    gate/up/down with a per-row-per-j-block requantized hidden activation
    still track the float SwiGLU with dequantized weights.  Shapes exercise
    n_gh=2 hidden groups, a padded final j-block (384 -> 512), and n_gj=2
    down groups per block."""
    from ctpa.ops.quant import dequantize_int4, int4_ffn, quantize_int4

    hidden, inter, m = 256, 384, 5
    x = jnp.asarray(rng.normal(size=(m, hidden)), jnp.float32)
    wg, sg = quantize_int4(jnp.asarray(rng.normal(size=(hidden, inter)) * 0.1))
    wu, su = quantize_int4(jnp.asarray(rng.normal(size=(hidden, inter)) * 0.1))
    wd, sd = quantize_int4(jnp.asarray(rng.normal(size=(inter, hidden)) * 0.1))

    g = x @ dequantize_int4(wg, sg, 128, jnp.float32)
    u = x @ dequantize_int4(wu, su, 128, jnp.float32)
    want = np.asarray((jax.nn.silu(g) * u)
                      @ dequantize_int4(wd, sd, 128, jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(int4_ffn(x, wg, sg, wu, su, wd, sd, impl="pallas",
                                  block_j=256, act_quant=True))
    assert np.abs(got - want).max() / (np.abs(want).max() + 1e-9) < 0.03
    # and the xla w4a8 composition agrees (only the h-requant granularity
    # differs: per full row there vs per j-block in the kernel)
    xla = np.asarray(int4_ffn(x, wg, sg, wu, su, wd, sd, impl="xla",
                              act_quant=True))
    assert np.abs(got - xla).max() / (np.abs(xla).max() + 1e-9) < 0.03


def test_int4_ffn_kernel_layout_serves_w4a8(rng):
    """The int4 ffn-kernel layout serves with quant_act=True: tiny decode
    (xla impl) stays within activation-quant noise of the unfused w4a8
    model — same quantized weights."""
    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import LlamaForCausalLM

    cfg = LLMConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.key(0), ids, mask)

    def logits(cfg_q, tree):
        m = LlamaForCausalLM(cfg_q)
        out, _, _ = m.apply(tree, ids, mask)
        return np.asarray(out[:, -1].astype(jnp.float32))

    fused = logits(
        dataclasses.replace(cfg, weight_quant="int4", quant_ffn_kernel=True,
                            quant_impl="xla", quant_act=True),
        quantize_tree(params, bits=4, ffn_kernel=True))
    unfused = logits(
        dataclasses.replace(cfg, weight_quant="int4", quant_impl="xla",
                            quant_act=True),
        quantize_tree(params, bits=4))
    rel = np.abs(fused - unfused).max() / (np.abs(unfused).max() + 1e-9)
    assert rel < 0.05, rel


def test_int4_w4a8_decode_matches_weight_only_closely(rng):
    """End-to-end: a w4a8 tiny decode (xla impl) stays within activation-
    quantization noise of the weight-only int4 decode — same quantized
    weights, int8 activations add <1% relative error at tiny scale."""
    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import LlamaForCausalLM

    cfg = LLMConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.key(0), ids, mask)
    qtree = quantize_tree(params, bits=4)

    def logits(cfg_q):
        m = LlamaForCausalLM(cfg_q)
        out, _, _ = m.apply(qtree, ids, mask)
        return np.asarray(out[:, -1].astype(jnp.float32))

    base = logits(dataclasses.replace(cfg, weight_quant="int4",
                                      quant_impl="xla"))
    a8 = logits(dataclasses.replace(cfg, weight_quant="int4",
                                    quant_impl="xla", quant_act=True))
    rel = np.abs(a8 - base).max() / (np.abs(base).max() + 1e-9)
    assert rel < 0.05, rel
