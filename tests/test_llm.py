"""LLM + report generator tests: KV-cache exactness, LoRA identity/merge,
masked loss, jitted generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctpa.core.config import CTViTConfig, LLMConfig, LoRAConfig, ReportGenConfig
from ctpa.models.llm import KVCache, LlamaForCausalLM
from ctpa.models.lora import lora_trainable_mask, merge_lora_scaled
from ctpa.models.report_generator import CTReportGenerator, VisionFeatureExtractor

LLM = LLMConfig.tiny()
VIT = CTViTConfig.tiny()


def make_llm(lora=None):
    model = LlamaForCausalLM(LLM, lora=lora)
    ids = jnp.asarray([[1, 2, 3, 4]])
    params = model.init(jax.random.key(0), ids)
    return model, params


@pytest.mark.slow
def test_kv_cache_matches_full_forward():
    """Incremental cached decode must produce the same logits as a full
    uncached forward — the core correctness property of the KV cache."""
    model, params = make_llm()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(2, 7)), jnp.int32)

    full_logits, _, _ = model.apply(params, ids)

    cache = KVCache.create(LLM, 2, max_len=7, dtype=jnp.float32)
    # prefill first 3 tokens, then decode one-by-one
    _, _, cache = model.apply(params, ids[:, :3], None, cache)
    step_logits = []
    for i in range(3, 7):
        lg, _, cache = model.apply(params, ids[:, i : i + 1], None, cache)
        step_logits.append(lg[:, 0])
    inc = jnp.stack(step_logits, axis=1)            # (2, 4, vocab)
    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(full_logits[:, 3:]), rtol=2e-4, atol=2e-4
    )


def test_kv_cache_right_padded_prompts():
    """Right-padded prefill: pad slots must not influence later decode.
    Compare a padded-batch decode against the same sequence unpadded."""
    model, params = make_llm()
    seq = jnp.asarray([[5, 6, 7]], jnp.int32)

    # unpadded path
    cache_a = KVCache.create(LLM, 1, max_len=8, dtype=jnp.float32)
    _, _, cache_a = model.apply(params, seq, jnp.ones((1, 3), jnp.int32), cache_a)
    la, _, _ = model.apply(params, jnp.asarray([[9]], jnp.int32), None, cache_a)

    # padded path: same 3 tokens + 2 pads in the prefill window
    padded = jnp.asarray([[5, 6, 7, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    cache_b = KVCache.create(LLM, 1, max_len=8, dtype=jnp.float32)
    _, _, cache_b = model.apply(params, padded, mask, cache_b)
    assert int(cache_b.true_len[0]) == 3
    lb, _, _ = model.apply(params, jnp.asarray([[9]], jnp.int32), None, cache_b)

    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-4)


def test_shared_kv_offset_matches_per_lane():
    """shared_kv_offset=True (single batch-wide DUS cache write) must be
    bit-identical to the per-lane scatter path when offsets are uniform —
    the lockstep-decode fast path used by CTReportGenerator.generate."""
    model, params = make_llm()
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(3, 6)), jnp.int32)
    mask = jnp.ones((3, 6), jnp.int32)

    outs = []
    for shared in (False, True):
        cache = KVCache.create(LLM, 3, max_len=10, dtype=jnp.float32)
        lg, _, cache = model.apply(params, ids, mask, cache,
                                   shared_kv_offset=shared)
        step = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        seq = [lg]
        for _ in range(3):
            lg1, _, cache = model.apply(params, step[:, None], None, cache,
                                        shared_kv_offset=shared)
            seq.append(lg1)
            step = jnp.argmax(lg1[:, 0], axis=-1).astype(jnp.int32)
        outs.append([np.asarray(x) for x in seq])
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


def test_kv_int8_cache_tracks_fp():
    """kv_quant='int8': cached decode with a quantized KV cache must track
    the full-precision cached decode (per-row absmax scales fold exactly
    into the attention einsums; error is bounded by the 0.4% row quant)."""
    import dataclasses

    cfg_q = dataclasses.replace(LLM, kv_quant="int8")
    model, params = make_llm()
    model_q = LlamaForCausalLM(cfg_q)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)

    outs = {}
    for name, mdl, c in (("fp", model, LLM), ("q", model_q, cfg_q)):
        cache = KVCache.create(c, 2, max_len=10, dtype=jnp.float32)
        assert (cache.k_scale is not None) == (name == "q")
        lg, _, cache = mdl.apply(params, ids, mask, cache)
        step = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        seq = [np.asarray(lg[:, -1])]
        for _ in range(4):
            lg1, _, cache = mdl.apply(params, step[:, None], None, cache)
            seq.append(np.asarray(lg1[:, 0]))
            step = jnp.argmax(lg1[:, 0], axis=-1).astype(jnp.int32)
        outs[name] = seq
    for a, b in zip(outs["fp"], outs["q"]):
        assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.05
        assert (a.argmax(-1) == b.argmax(-1)).mean() >= 0.5


def test_flash_decode_matches_dense():
    """cfg.flash_decode=True routes single-token cached attention through
    the fused pallas kernel (interpret mode here); logits must match the
    dense einsum path closely for both fp and int8 KV caches."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(2, 5)), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    model, params = make_llm()

    for kv_quant in (None, "int8"):
        base = dataclasses.replace(LLM, kv_quant=kv_quant)
        flash = dataclasses.replace(base, flash_decode=True)
        outs = {}
        for name, c in (("dense", base), ("kernel", flash)):
            mdl = LlamaForCausalLM(c)
            cache = KVCache.create(c, 2, max_len=9, dtype=jnp.float32)
            with pltpu.force_tpu_interpret_mode():
                lg, _, cache = mdl.apply(params, ids, mask, cache)
                step = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
                seq = []
                for _ in range(3):
                    lg1, _, cache = mdl.apply(params, step[:, None], None, cache)
                    seq.append(np.asarray(lg1[:, 0]))
                    step = jnp.argmax(lg1[:, 0], axis=-1).astype(jnp.int32)
            outs[name] = seq
        for a, b in zip(outs["dense"], outs["kernel"]):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_lora_starts_as_identity():
    lora = LoRAConfig(rank=4, alpha=8.0, target_projections=("q_proj", "v_proj"))
    model_base, params_base = make_llm()
    model_lora = LlamaForCausalLM(LLM, lora=lora)
    ids = jnp.asarray([[1, 2, 3, 4]])
    params_lora = model_lora.init(jax.random.key(0), ids)

    # graft base weights into the lora tree (lora_b starts at zero -> identity);
    # rank-0 LoRADense also nests its Dense under 'base', so trees align.
    def walk(lp, bp):
        if isinstance(lp, dict):
            if "base" in lp and "lora_a" in lp:
                return {**lp, "base": bp["base"]}
            return {k: walk(v, bp[k]) for k, v in lp.items()}
        return bp

    grafted = walk(params_lora["params"], params_base["params"])
    lg, _, _ = model_lora.apply({"params": grafted}, ids)
    bg, _, _ = model_base.apply(params_base, ids)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(bg), rtol=1e-5, atol=1e-5)

    # trainable mask hits only lora params
    mask = lora_trainable_mask({"params": grafted})
    leaves_true = [
        p for p, v in jax.tree_util.tree_leaves_with_path(mask) if v
    ]
    assert len(leaves_true) > 0
    assert all("lora" in jax.tree_util.keystr(p) for p in leaves_true)


def test_lora_merge_equivalence():
    lora = LoRAConfig(rank=4, alpha=8.0, target_projections=("q_proj",))
    model = LlamaForCausalLM(LLM, lora=lora)
    ids = jnp.asarray([[1, 2, 3, 4]])
    params = model.init(jax.random.key(0), ids)
    # randomize lora_b so the overlay is non-trivial
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jax.random.normal(jax.random.key(1), v.shape) * 0.1
        if "lora_b" in jax.tree_util.keystr(p) else v,
        params,
    )
    want, _, _ = model.apply(params, ids)
    merged = merge_lora_scaled(params, alpha=8.0, rank=4)
    got, _, _ = model.apply(merged, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def _make_rg():
    gen_cfg = ReportGenConfig(vision_dim=32, max_new_tokens=8, max_prompt_len=8)
    model = CTReportGenerator(LLM, VIT, gen_cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.normal(size=(2, 1, VIT.temporal_size, VIT.image_size, VIT.image_size)),
        jnp.float32,
    )
    ids = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask)
    return model, params, video, ids, mask


def test_report_generator_loss_and_grads():
    model, params, video, ids, mask = _make_rg()
    loss = model.apply(params, video, ids, mask, method=CTReportGenerator.loss)
    assert np.isfinite(float(loss))
    # label_mask restricts loss: zero mask -> zero-ish denominator guard
    lm = jnp.zeros_like(mask)
    loss0 = model.apply(params, video, ids, mask, lm, method=CTReportGenerator.loss)
    assert float(loss0) == 0.0


def test_generate_jitted_stops_and_shapes():
    model, params, video, ids, mask = _make_rg()

    @jax.jit
    def gen(p, v, i, m):
        return model.apply(
            p, v, i, m, 8, eos_token_id=2, temperature=0.7,
            rng=jax.random.key(0), method=CTReportGenerator.generate,
        )

    res = gen(params, video, ids, mask)
    assert res.tokens.shape == (2, 8)
    assert res.lengths.shape == (2,)
    toks = np.asarray(res.tokens)
    # after an EOS, everything must be pad
    for row in toks:
        if 2 in row:
            e = list(row).index(2)
            assert all(t == 0 for t in row[e + 1 :])


def test_generate_greedy_deterministic():
    model, params, video, ids, mask = _make_rg()
    r1 = model.apply(params, video, ids, mask, 6, eos_token_id=2, greedy=True,
                     method=CTReportGenerator.generate)
    r2 = model.apply(params, video, ids, mask, 6, eos_token_id=2, greedy=True,
                     method=CTReportGenerator.generate)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


def test_vision_feature_extractor_shape():
    vfe = VisionFeatureExtractor(VIT, out_dim=32)
    video = jnp.zeros((2, 1, VIT.temporal_size, VIT.image_size, VIT.image_size))
    params = vfe.init(jax.random.key(0), video)
    out = vfe.apply(params, video)
    assert out.shape == (2, 32)


def test_quantize_kv_int4_roundtrip_exact_on_grid():
    """Values already on the int4 grid survive pack->unpack->dequant
    bit-exactly (the pairing of group halves is order-preserving)."""
    from ctpa.ops.quant import _int4_group, quantize_kv_int4, unpack_kv_int4

    rng = np.random.default_rng(0)
    hd, group = 64, 32
    gs = _int4_group(hd, group)
    scales = rng.uniform(0.5, 2.0, size=(3, 2, 5, hd // gs)).astype(np.float32)
    grid = rng.integers(-7, 8, size=(3, 2, 5, hd)).astype(np.float32)
    rows = grid * np.repeat(scales, gs, axis=-1)
    # force each group's absmax onto +-7 so the quant scale equals `scales`
    rows[..., ::gs] = 7.0 * scales[..., :]
    grid[..., ::gs] = 7.0

    packed, s = quantize_kv_int4(jnp.asarray(rows), group)
    assert packed.shape == rows.shape[:-1] + (hd // 2,)
    assert s.shape == scales.shape
    np.testing.assert_allclose(np.asarray(s), scales, rtol=1e-6)
    q = np.asarray(unpack_kv_int4(packed, group))        # (..., G, gs)
    np.testing.assert_array_equal(q.reshape(grid.shape), grid)


@pytest.mark.parametrize("scale_dtype", [jnp.float32, jnp.bfloat16])
def test_kv_int4_attention_folds_are_algebraically_exact(scale_dtype):
    """The grouped int4 attention folds (models/llm.py int4 branch) are
    algebraic identities: the per-group partial QK dots contracted with K
    scales equal the dot against the dequantized cache, and the V-scale
    fold into the attention weights equals the PV dot against the
    dequantized cache.  Only the row quantization itself loses precision
    (gated loosely in the e2e test below).  Holds for bf16-stored scales
    too (kv_scale_dtype): the identity is in terms of the STORED scale."""
    from ctpa.ops.quant import _int4_group, quantize_kv_int4, unpack_kv_int4

    rng = np.random.default_rng(0)
    b, kvh, m, hd, n, rep, group = 2, 2, 5, 16, 3, 2, 8
    gs = _int4_group(hd, group)
    G = hd // gs
    rows = jnp.asarray(rng.normal(size=(b, kvh, m, hd)), jnp.float32)
    packed, s = quantize_kv_int4(rows, group, scale_dtype=scale_dtype)
    assert s.dtype == scale_dtype
    s = s.astype(jnp.float32)        # the fold path upcasts stored scales
    q8 = unpack_kv_int4(packed, group)                   # (b,kvh,m,G,gs)
    deq = (np.asarray(q8, np.float32)
           * np.asarray(s)[..., None]).reshape(b, kvh, m, hd)

    q = jnp.asarray(rng.normal(size=(b, n, kvh, rep, hd)), jnp.float32)
    simg = jnp.einsum("bngrGd,bgmGd->bgrnmG", q.reshape(b, n, kvh, rep, G, gs),
                      q8.astype(jnp.float32))
    sim_fold = jnp.einsum("bgrnmG,bgmG->bgrnm", simg, s)
    sim_ref = jnp.einsum("bngrd,bgmd->bgrnm", q, jnp.asarray(deq))
    np.testing.assert_allclose(np.asarray(sim_fold), np.asarray(sim_ref),
                               rtol=1e-5, atol=1e-5)

    attn = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(b, kvh, rep, n, m)), jnp.float32), -1)
    attng = attn[..., None] * s[:, :, None, None, :, :]
    out_fold = jnp.einsum("bgrnmG,bgmGd->bngrGd", attng,
                          q8.astype(jnp.float32)).reshape(b, n, -1)
    out_ref = jnp.einsum("bgrnm,bgmd->bngrd", attn,
                         jnp.asarray(deq)).reshape(b, n, -1)
    np.testing.assert_allclose(np.asarray(out_fold), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("scale_dtype", ["float32", "bfloat16"])
def test_kv_int4_quality_budget(scale_dtype):
    """QUANTIFIED int4-KV quality budget (the price of the 1.65x/1.83x lane
    capacity), test_quant-style: at trained-like weight statistics (kernels
    ~ N(0, 0.02), norms ~ 1 — llama-2 checkpoint layer stds are ~0.01-0.03;
    flax random-init weights made the old gate meaninglessly loose), decode
    16 steps teacher-forced on the fp trajectory (isolates cache noise from
    trajectory divergence) and bound the peak-logit deviation and greedy
    agreement vs the fp cache.

    Measured round 5 (b=4, prompt 8, 16 steps, group 8 at head_dim 16 —
    the same absmax-group geometry ratio as the 7B group-32/head_dim-128
    default): int8 KV dev 0.44% / agreement 100%; int4 KV dev 4.9% /
    agreement 97.1% for BOTH f32 and bf16 stored scales (the bf16 grid
    rounding is invisible at this scale because nibbles are quantized
    against the ROUNDED scale, ops/quant.quantize_kv_int4).  Bounds carry
    ~2x margin.  docs/benchmarks.md "int4-KV quality budget" row records
    the numbers."""
    import dataclasses

    model, params = make_llm()
    rng = np.random.default_rng(7)

    def trained_like(_path, x):
        if x.ndim >= 2:
            return jnp.asarray(rng.normal(0, 0.02, x.shape), x.dtype)
        return jnp.asarray(1.0 + rng.normal(0, 0.02, x.shape), x.dtype)

    params = jax.tree_util.tree_map_with_path(trained_like, params)
    b, P, T = 4, 8, 16
    prompt = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(b, P)),
                         jnp.int32)
    mask = jnp.ones((b, P), jnp.int32)

    def decode(cfg, teacher=None):
        mdl = LlamaForCausalLM(cfg)
        cache = KVCache.create(cfg, b, max_len=P + T + 1, dtype=jnp.float32)
        lg, _, cache = mdl.apply(params, prompt, mask, cache)
        seq = [np.asarray(lg[:, -1], np.float32)]
        for t in range(T):
            ref = teacher[t] if teacher is not None else seq[-1]
            step = jnp.asarray(ref.argmax(-1), jnp.int32)
            lg, _, cache = mdl.apply(params, step[:, None], None, cache)
            seq.append(np.asarray(lg[:, 0], np.float32))
        return seq

    fp = decode(LLM)

    def budget(cfg):
        qs = decode(cfg, teacher=fp)
        devs = [np.abs(a - q).max() / (np.abs(a).max() + 1e-9)
                for a, q in zip(fp, qs)]
        agree = [(a.argmax(-1) == q.argmax(-1)).mean()
                 for a, q in zip(fp, qs)]
        assert all(np.isfinite(q).all() for q in qs)
        return max(devs), float(np.mean(agree))

    dev8, agree8 = budget(dataclasses.replace(LLM, kv_quant="int8"))
    assert dev8 < 0.02 and agree8 >= 0.99, (dev8, agree8)

    cfg4 = dataclasses.replace(LLM, kv_quant="int4", kv_quant_group=8,
                               kv_scale_dtype=scale_dtype)
    assert KVCache.create(cfg4, 1, 4, jnp.float32).k_scale.dtype == \
        jnp.dtype(scale_dtype)
    dev4, agree4 = budget(cfg4)
    assert dev4 < 0.10 and agree4 >= 0.92, (dev4, agree4)


def test_kv_int4_with_flash_decode_rejected():
    import dataclasses

    cfg = dataclasses.replace(LLM, kv_quant="int4", flash_decode=True)
    model, params = make_llm()
    mdl = LlamaForCausalLM(cfg)
    cache = KVCache.create(cfg, 1, max_len=8, dtype=jnp.float32)
    ids = jnp.asarray([[1, 2, 3]])
    _, _, cache = mdl.apply(params, ids, jnp.ones_like(ids), cache)
    with pytest.raises(ValueError, match="int4"):
        mdl.apply(params, jnp.asarray([[4]]), None, cache)


def test_kv_int8_dots_tracks_dequant_path():
    """kv_int8_dots: native int8 attention contractions must track the
    dequantizing int8-KV path closely — the only extra noise is the dynamic
    per-row quantization of q and of the v-scale-folded attention weights
    (~0.4% each), on top of the shared int8 cache rows."""
    import dataclasses

    cfg_q = dataclasses.replace(LLM, kv_quant="int8")
    cfg_d = dataclasses.replace(LLM, kv_quant="int8", kv_int8_dots=True)
    _, params = make_llm()
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)

    outs = {}
    for name, c in (("deq", cfg_q), ("dots", cfg_d)):
        mdl = LlamaForCausalLM(c)
        cache = KVCache.create(c, 2, max_len=10, dtype=jnp.float32)
        lg, _, cache = mdl.apply(params, ids, mask, cache)
        seq = [np.asarray(lg[:, -1])]
        step = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        for _ in range(3):
            lg1, _, cache = mdl.apply(params, step[:, None], None, cache)
            seq.append(np.asarray(lg1[:, 0]))
            # follow the dequant path's argmaxes in both runs so the
            # comparison isolates the dot-quantization noise
            if name == "deq":
                step = jnp.argmax(lg1[:, 0], axis=-1).astype(jnp.int32)
            else:
                step = jnp.asarray(outs["deq"][len(seq) - 1].argmax(-1),
                                   jnp.int32)
        outs[name] = seq
    for a, b_ in zip(outs["deq"], outs["dots"]):
        assert np.abs(a - b_).max() / (np.abs(a).max() + 1e-9) < 0.05
        assert (a.argmax(-1) == b_.argmax(-1)).mean() >= 0.5
