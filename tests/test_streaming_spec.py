"""Speculative continuous batching (ContinuousBatcher(spec_lookup=K)):
greedy-exact serving parity with single-request generate(greedy=True),
through lane reuse, shared-prefix admission, budget clamps and EOS.

Reference decode loop being accelerated: model_components.py:193-269 (the
full-prefix-per-token loop); the speculative verify amortizes the M=1
decode-attention MXU floor documented in ops/pallas/decode_attention.py."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctpa.core.config import CTViTConfig, LLMConfig, ReportGenConfig
from ctpa.models.report_generator import CTReportGenerator
from ctpa.pipelines.streaming import ContinuousBatcher, Request

LLM = LLMConfig.tiny()
VIT = CTViTConfig.tiny()


@pytest.fixture(scope="module")
def rg():
    gen_cfg = ReportGenConfig(vision_dim=32)
    model = CTReportGenerator(LLM, VIT, gen_cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.normal(size=(1, 1, VIT.temporal_size, VIT.image_size,
                         VIT.image_size)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(1, 6)), jnp.int32)
    mask = jnp.ones((1, 6), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask)
    return model, params, video


def _single_greedy(model, params, video, prompt, mask, max_new, eos):
    res = model.apply(params, video, jnp.asarray(prompt[None]),
                      jnp.asarray(mask[None], jnp.int32), max_new,
                      eos_token_id=eos, greedy=True,
                      method=CTReportGenerator.generate)
    toks = np.asarray(res.tokens[0])[: int(res.lengths[0])]
    return toks


@pytest.mark.parametrize("steps_per_sync", [1, 2])
def test_spec_batcher_matches_single_generate(rg, steps_per_sync):
    model, params, video = rg
    rng = np.random.default_rng(1)
    # distinct real prompt lengths exercise per-lane padded-slot handling
    prompts, masks = [], []
    for real in (6, 4, 6):
        p = rng.integers(3, LLM.vocab_size, size=(6,)).astype(np.int32)
        m = np.asarray([1] * real + [0] * (6 - real), np.int32)
        prompts.append(p * m)
        masks.append(m)
    vision = model.apply(params, video,
                         method=CTReportGenerator.extract_vision)[0]

    singles = [
        np.asarray(model.apply(params, video, jnp.asarray(p[None]),
                               jnp.asarray(m[None], jnp.int32), 8,
                               eos_token_id=-1, greedy=True,
                               method=CTReportGenerator.generate).tokens[0])
        for p, m in zip(prompts, masks)]

    batcher = ContinuousBatcher(model, params, num_lanes=2, max_len=32,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32, spec_lookup=3,
                                steps_per_sync=steps_per_sync)
    for i, (p, m) in enumerate(zip(prompts, masks)):
        batcher.submit(Request(request_id=i, input_ids=p, attention_mask=m,
                               vision=vision, max_new_tokens=8))
    results = batcher.run_until_done()
    assert all(results[i].finished for i in range(3))
    for i in range(3):
        got = np.asarray(results[i].tokens)
        assert len(got) == 8
        np.testing.assert_array_equal(got, singles[i][: len(got)])


def test_spec_batcher_shared_prefix_matches_plain_batcher(rg):
    """spec_lookup + set_shared_prefix must reproduce the plain greedy
    batcher token-for-token across distinct visions."""
    model, params, _ = rg
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, LLM.vocab_size, size=(6,)).astype(np.int32)
    mask = np.ones(6, np.int32)
    visions = []
    for _ in range(4):
        v = np.asarray(rng.normal(size=(1, 1, VIT.temporal_size,
                                        VIT.image_size, VIT.image_size)),
                       np.float32)
        visions.append(model.apply(params, jnp.asarray(v),
                                   method=CTReportGenerator.extract_vision)[0])

    def run(spec):
        batcher = ContinuousBatcher(
            model, params, num_lanes=2, max_len=32, eos_token_id=-1,
            greedy=True, cache_dtype=jnp.float32,
            spec_lookup=4 if spec else None, steps_per_sync=2)
        batcher.set_shared_prefix(prompt, mask)
        for i, vis in enumerate(visions):
            batcher.submit(Request(request_id=i, vision=vis,
                                   max_new_tokens=8))
        results = batcher.run_until_done()
        return [np.asarray(results[i].tokens) for i in range(len(visions))]

    plain, spec = run(False), run(True)
    for b, s in zip(plain, spec):
        np.testing.assert_array_equal(s, b)
    assert any(not np.array_equal(spec[0], t) for t in spec[1:])


def test_spec_batcher_full_acceptance_takes_few_chunks(rg):
    """Zeroed lm_head -> constant argmax -> the repeat-fallback draft is
    always accepted: 24 tokens must arrive in ~max_new/(K+1) verifies, i.e.
    far fewer chunks than the plain one-token-per-step batcher needs."""
    model, params, video = rg
    flat = dict(params)
    flat["params"] = jax.tree_util.tree_map(lambda x: x, params["params"])
    head = np.zeros(np.asarray(
        params["params"]["llm"]["lm_head"]["kernel"]).shape, np.float32)
    flat["params"]["llm"]["lm_head"]["kernel"] = jnp.asarray(head)
    vision = model.apply(flat, video,
                         method=CTReportGenerator.extract_vision)[0]
    prompt = np.arange(1, 7, dtype=np.int32)
    batcher = ContinuousBatcher(model, flat, num_lanes=1, max_len=64,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32, spec_lookup=4,
                                steps_per_sync=1)
    batcher.submit(Request(request_id=0, input_ids=prompt,
                           attention_mask=np.ones(6, np.int32),
                           vision=vision, max_new_tokens=24))
    chunks = 0
    while batcher.has_work and chunks < 30:
        batcher.step()
        chunks += 1
    res = batcher.results[0]
    assert res.finished
    assert len(res.tokens) == 24
    assert np.all(np.asarray(res.tokens) == 0)
    # 23 post-first tokens at up to K+1=5 per verify, 1 verify per chunk
    assert chunks <= 8


def test_spec_batcher_eos_and_budget_edges(rg):
    model, params, video = rg
    vision = model.apply(params, video,
                         method=CTReportGenerator.extract_vision)[0]
    prompt = np.arange(1, 7, dtype=np.int32)
    mask = np.ones(6, np.int32)

    # max_new_tokens=1: exactly the first token, no speculation needed
    batcher = ContinuousBatcher(model, params, num_lanes=1, max_len=32,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32, spec_lookup=3)
    batcher.submit(Request(request_id=0, input_ids=prompt,
                           attention_mask=mask, vision=vision,
                           max_new_tokens=1))
    results = batcher.run_until_done()
    single = _single_greedy(model, params, video, prompt, mask, 1, -1)
    assert results[0].finished
    np.testing.assert_array_equal(np.asarray(results[0].tokens), single)

    # eos == the model's first greedy token: finishes with zero emitted
    # tokens (EOS is consumed, not appended)
    eos = int(single[0])
    batcher = ContinuousBatcher(model, params, num_lanes=1, max_len=32,
                                eos_token_id=eos, greedy=True,
                                cache_dtype=jnp.float32, spec_lookup=3)
    batcher.submit(Request(request_id=0, input_ids=prompt,
                           attention_mask=mask, vision=vision,
                           max_new_tokens=8))
    results = batcher.run_until_done()
    assert results[0].finished
    assert results[0].tokens == []


def test_spec_batcher_sampling_near_zero_temperature_matches_greedy(rg):
    """Sampled speculative serving (rejection-sampling acceptance) at
    temperature -> 0 must reproduce the greedy spec batcher token-exactly:
    acceptance probability collapses to 1 on argmax drafts and the residual
    resample onto the argmax."""
    model, params, video = rg
    vision = model.apply(params, video,
                         method=CTReportGenerator.extract_vision)[0]
    rng = np.random.default_rng(5)
    prompt = rng.integers(1, LLM.vocab_size, size=(6,)).astype(np.int32)
    mask = np.ones(6, np.int32)

    outs = {}
    for greedy in (True, False):
        batcher = ContinuousBatcher(
            model, params, num_lanes=2, max_len=64, eos_token_id=-1,
            greedy=greedy, temperature=1e-4, cache_dtype=jnp.float32,
            spec_lookup=3, steps_per_sync=2)
        for r in range(3):
            batcher.submit(Request(request_id=r, input_ids=prompt,
                                   attention_mask=mask, vision=vision,
                                   max_new_tokens=10))
        res = batcher.run_until_done()
        outs[greedy] = [res[r].tokens for r in range(3)]
    assert outs[True] == outs[False]


def test_spec_batcher_sampling_smoke_finishes(rg):
    """Sampled spec serving at the reference's production temperature 0.7
    (model_components.py:249-252): every request finishes within budget and
    the emissions are valid token ids."""
    model, params, video = rg
    vision = model.apply(params, video,
                         method=CTReportGenerator.extract_vision)[0]
    rng = np.random.default_rng(6)
    prompt = rng.integers(1, LLM.vocab_size, size=(5,)).astype(np.int32)
    batcher = ContinuousBatcher(
        model, params, num_lanes=2, max_len=64, eos_token_id=-1,
        greedy=False, temperature=0.7, top_p=0.9, cache_dtype=jnp.float32,
        spec_lookup=3, steps_per_sync=2, rng=jax.random.key(3))
    for r in range(3):
        batcher.submit(Request(request_id=r, input_ids=prompt,
                               attention_mask=np.ones(5, np.int32),
                               vision=vision, max_new_tokens=8))
    res = batcher.run_until_done()
    for r in range(3):
        assert res[r].finished
        assert len(res[r].tokens) == 8
        assert all(0 <= t < LLM.vocab_size for t in res[r].tokens)


def test_spec_batcher_window_check(rg):
    model, params, video = rg
    vision = model.apply(params, video,
                         method=CTReportGenerator.extract_vision)[0]
    batcher = ContinuousBatcher(model, params, num_lanes=1, max_len=16,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32, spec_lookup=4)
    with pytest.raises(ValueError, match="draft window"):
        batcher.submit(Request(request_id=0,
                               input_ids=np.arange(1, 7, dtype=np.int32),
                               attention_mask=np.ones(6, np.int32),
                               vision=vision, max_new_tokens=8))


def test_generate_report_cli_spec_serve(rg, tmp_path):
    """CLI drive: --spec-serve must reproduce the plain --greedy batcher's
    predictions exactly (same checkpoint, same dataset)."""
    import json
    import os

    from ctpa.cli.generate_report import main as gen_main
    from ctpa.core.checkpoint import CheckpointManager
    from ctpa.core.config import ReportGenConfig as RGC

    # gen_main --tiny builds CTReportGenerator(tiny, tiny, ReportGenConfig())
    model = CTReportGenerator(LLM, VIT, RGC())
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(
        size=(1, 1, VIT.temporal_size, VIT.image_size, VIT.image_size)),
        jnp.float32)
    ids = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(1, 6)), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, jnp.ones_like(ids))
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(1, {"params": params, "step": 1})
    mgr.wait()

    items = []
    for i in range(3):
        vol_path = str(tmp_path / f"vol{i}.npz")
        np.savez(vol_path, arr_0=rng.normal(
            size=(VIT.temporal_size, VIT.image_size, VIT.image_size)
        ).astype(np.float32))
        items.append({"image_path": vol_path, "report": f"clean lungs {i}"})
    jsonl = str(tmp_path / "data.jsonl")
    with open(jsonl, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")

    def run(extra, out):
        rc = gen_main(["--jsonl", jsonl, "--checkpoint-dir", ckpt_dir,
                       "--tiny", "--max-new-tokens", "6", "--num-lanes", "2",
                       "--lora-rank", "0",
                       "--out-dir", str(tmp_path / out)] + extra)
        assert rc == 0
        res = json.load(open(os.path.join(str(tmp_path / out),
                                          "evaluation_results.json")))
        return [s["prediction"] for s in res["samples"]]

    plain = run(["--greedy"], "out_plain")
    # --spec-serve no longer implies --greedy (sampling mode uses
    # rejection-sampling acceptance); exact token parity is a greedy claim
    spec = run(["--spec-serve", "3", "--greedy"], "out_spec")
    assert plain == spec


@pytest.mark.parametrize("kv_quant", ["int8", "int4"])
def test_spec_batcher_quantized_kv(rg, kv_quant):
    """spec serving composes with the quantized KV caches (int8 per-row and
    int4 group scales both roll back with the rejected rows)."""
    llm_cfg = dataclasses.replace(LLM, kv_quant=kv_quant)
    gen_cfg = ReportGenConfig(vision_dim=32)
    model = CTReportGenerator(llm_cfg, VIT, gen_cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.normal(size=(1, 1, VIT.temporal_size, VIT.image_size,
                         VIT.image_size)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, LLM.vocab_size, size=(1, 6)), jnp.int32)
    mask1 = jnp.ones((1, 6), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask1)

    prompt = np.asarray(ids[0])
    mask = np.ones(6, np.int32)
    vision = model.apply(params, video,
                         method=CTReportGenerator.extract_vision)[0]
    single = _single_greedy(model, params, video, prompt, mask, 8, -1)
    batcher = ContinuousBatcher(model, params, num_lanes=2, max_len=32,
                                eos_token_id=-1, greedy=True, spec_lookup=3,
                                steps_per_sync=2)
    for i in range(2):
        batcher.submit(Request(request_id=i, input_ids=prompt,
                               attention_mask=mask, vision=vision,
                               max_new_tokens=8))
    results = batcher.run_until_done()
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(results[i].tokens), single)


def test_auto_policy_picks_tier_by_occupancy(rg):
    """spec_policy='auto' (VERDICT r4 #5): a single queued request serves on
    the SPECULATIVE tier, a saturating burst on the PLAIN ring tier, the
    mode switches only at idle boundaries, and BOTH tiers stay greedy-exact
    vs single-request generate — so the policy changes cost, never
    output."""
    model, params, video = rg
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, LLM.vocab_size, size=(6,)).astype(np.int32)
    mask = np.ones(6, np.int32)
    vision = model.apply(params, video,
                         method=CTReportGenerator.extract_vision)[0]
    single = _single_greedy(model, params, video, prompt, mask, 6, -1)

    batcher = ContinuousBatcher(model, params, num_lanes=4, max_len=40,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32, steps_per_sync=2,
                                spec_lookup=3, spec_policy="auto",
                                spec_auto_threshold=1,
                                # pure-occupancy assertions: disable the
                                # acceptance-adaptive lever (random-weight
                                # fixtures accept ~nothing, which would
                                # demote wave 3 — tested separately in
                                # test_auto_policy_acceptance_demotion)
                                spec_accept_floor=None)
    # wave 1: one request <= threshold -> spec tier
    batcher.submit(Request(request_id=0, input_ids=prompt,
                           attention_mask=mask, vision=vision,
                           max_new_tokens=6))
    batcher.step()
    assert batcher._mode == "spec"
    batcher.run_until_done()

    # wave 2: saturating burst > threshold -> plain tier (cache bookkeeping
    # reset restores the shared-clock invariant)
    for i in range(1, 5):
        batcher.submit(Request(request_id=i, input_ids=prompt,
                               attention_mask=mask, vision=vision,
                               max_new_tokens=6))
    batcher.step()
    assert batcher._mode == "plain"
    batcher.run_until_done()

    # wave 3: back to a single request -> spec again (switch is two-way)
    batcher.submit(Request(request_id=5, input_ids=prompt,
                           attention_mask=mask, vision=vision,
                           max_new_tokens=6))
    batcher.step()
    assert batcher._mode == "spec"
    results = batcher.run_until_done()

    for i in range(6):
        assert results[i].finished
        np.testing.assert_array_equal(np.asarray(results[i].tokens), single)


def test_auto_policy_acceptance_demotion(rg):
    """The acceptance-adaptive lever (r5): a wave that qualifies for the
    spec tier by occupancy is DEMOTED to plain while the acceptance EWMA
    sits below the floor, re-probes speculatively every
    spec_reprobe_every-th demoted wave, and wins the tier back when the
    EWMA clears the floor — with token output identical throughout (both
    tiers are greedy-exact)."""
    model, params, video = rg
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, LLM.vocab_size, size=(6,)).astype(np.int32)
    mask = np.ones(6, np.int32)
    vision = model.apply(params, video,
                         method=CTReportGenerator.extract_vision)[0]
    single = _single_greedy(model, params, video, prompt, mask, 6, -1)

    batcher = ContinuousBatcher(model, params, num_lanes=4, max_len=40,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32, steps_per_sync=2,
                                spec_lookup=3, spec_policy="auto",
                                spec_auto_threshold=1,
                                # floor above the achievable max (K+1 = 4):
                                # demotion is deterministic regardless of
                                # what the random-weight model's drafts
                                # happen to accept
                                spec_accept_floor=5.0, spec_reprobe_every=3)

    def wave(rid):
        batcher.submit(Request(request_id=rid, input_ids=prompt,
                               attention_mask=mask, vision=vision,
                               max_new_tokens=6))
        batcher.step()
        mode = batcher._mode
        batcher.run_until_done()
        return mode

    # wave 1: no EWMA yet -> optimistic spec probe
    assert wave(0) == "spec"
    # the probe recorded an EWMA (necessarily below the unreachable floor)
    assert batcher._spec_accept_ewma is not None
    assert batcher._spec_accept_ewma < batcher.spec_accept_floor
    # waves 2-3: demoted to plain despite trickle occupancy
    assert wave(1) == "plain"
    assert wave(2) == "plain"
    # wave 4: third demotion candidate is the re-probe -> spec again
    assert wave(3) == "spec"
    # force the EWMA above the floor: occupancy rules alone apply again
    batcher._spec_accept_ewma = 10.0
    assert wave(4) == "spec"

    results = batcher.results
    for i in range(5):
        assert results[i].finished
        np.testing.assert_array_equal(np.asarray(results[i].tokens), single)
