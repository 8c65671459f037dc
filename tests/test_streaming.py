"""Continuous-batching serving tests: equivalence with single-request decode,
lane reuse, streaming pipeline end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctpa.core.config import CTViTConfig, LLMConfig, ReportGenConfig
from ctpa.models.report_generator import CTReportGenerator
from ctpa.pipelines.streaming import ContinuousBatcher, Request, StreamingReportPipeline

LLM = LLMConfig.tiny()
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


def test_continuous_batching_matches_single_generate(rg):
    model, params, video = rg
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, LLM.vocab_size, size=(6,)).astype(np.int32)
               for _ in range(3)]
    vision = model.apply(params, video, method=CTReportGenerator.extract_vision)[0]

    # single-request greedy decodes (the oracle)
    singles = []
    for p in prompts:
        res = model.apply(params, video, jnp.asarray(p[None]),
                          jnp.ones((1, 6), jnp.int32), 8, eos_token_id=-1,
                          greedy=True, method=CTReportGenerator.generate)
        singles.append(np.asarray(res.tokens[0]))

    # continuous batcher with 2 lanes over 3 requests (forces lane reuse)
    batcher = ContinuousBatcher(model, params, num_lanes=2, max_len=32,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        batcher.submit(Request(request_id=i, input_ids=p,
                               attention_mask=np.ones(6, np.int32),
                               vision=vision, max_new_tokens=8))
    results = batcher.run_until_done()
    assert all(results[i].finished for i in range(3))
    for i in range(3):
        got = np.asarray(results[i].tokens)
        np.testing.assert_array_equal(got, singles[i][: len(got)])
        assert len(got) == 8


@pytest.mark.slow
def test_ring_wrap_matches_single_generate(rg):
    """The ring clock must wrap the cache several times without corrupting
    live lanes: 12 requests through 2 lanes of a 20-slot cache (per-request
    window 6+8+1 = 15) push the clock past 2x max_len; every request must
    still reproduce its single-request greedy decode."""
    model, params, video = rg
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, LLM.vocab_size, size=(6,)).astype(np.int32)
               for _ in range(12)]
    vision = model.apply(params, video, method=CTReportGenerator.extract_vision)[0]

    singles = []
    for p in prompts:
        res = model.apply(params, video, jnp.asarray(p[None]),
                          jnp.ones((1, 6), jnp.int32), 8, eos_token_id=-1,
                          greedy=True, method=CTReportGenerator.generate)
        singles.append(np.asarray(res.tokens[0]))

    batcher = ContinuousBatcher(model, params, num_lanes=2, max_len=20,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32, steps_per_sync=1)
    for i, p in enumerate(prompts):
        batcher.submit(Request(request_id=i, input_ids=p,
                               attention_mask=np.ones(6, np.int32),
                               vision=vision, max_new_tokens=8))
    results = batcher.run_until_done()
    assert batcher.clock > 2 * batcher.max_len          # the ring really wrapped
    for i in range(len(prompts)):
        got = np.asarray(results[i].tokens)
        np.testing.assert_array_equal(got, singles[i][: len(got)])
        assert len(got) == 8


def test_shared_prefix_matches_per_request_prefill(rg):
    """Shared-prefix admission is EXACT: with one prompt across requests the
    prefix KV + last hidden are vision-independent (_fused_logits is the only
    vision entry point), so set_shared_prefix + input_ids=None must reproduce
    the per-request-prefill batcher token-for-token — including through lane
    reuse and a ring wrap (5 requests x window 15 through 2 lanes of 20)."""
    model, params, video = rg
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, LLM.vocab_size, size=(6,)).astype(np.int32)
    mask = np.ones(6, np.int32)
    # distinct vision features → distinct decodes from the SAME prefix
    visions = []
    for s in range(5):
        v = np.asarray(rng.normal(size=(1, 1, VIT.temporal_size,
                                        VIT.image_size, VIT.image_size)),
                       np.float32)
        visions.append(model.apply(params, jnp.asarray(v),
                                   method=CTReportGenerator.extract_vision)[0])

    def run(shared: bool):
        batcher = ContinuousBatcher(model, params, num_lanes=2, max_len=20,
                                    eos_token_id=-1, greedy=True,
                                    cache_dtype=jnp.float32)
        if shared:
            batcher.set_shared_prefix(prompt, mask)
        for i, vis in enumerate(visions):
            batcher.submit(Request(
                request_id=i,
                input_ids=None if shared else prompt,
                attention_mask=None if shared else mask,
                vision=vis, max_new_tokens=8))
        results = batcher.run_until_done()
        assert batcher.clock > batcher.max_len      # ring wrapped
        return [np.asarray(results[i].tokens) for i in range(len(visions))]

    base, shared = run(False), run(True)
    for b, s in zip(base, shared):
        np.testing.assert_array_equal(s, b)
    # different visions must actually produce different reports (the prefix
    # cache isn't accidentally making lanes identical)
    assert any(not np.array_equal(shared[0], t) for t in shared[1:])


def test_shared_prefix_requires_registration(rg):
    model, params, _ = rg
    batcher = ContinuousBatcher(model, params, num_lanes=1, max_len=20,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32)
    with pytest.raises(ValueError, match="shared prefix"):
        batcher.submit(Request(request_id=0, vision=np.zeros(32, np.float32),
                               max_new_tokens=4))


@pytest.mark.parametrize("kv_quant", ["int8", "int4"])
def test_batcher_quantized_kv_matches_single_generate(rg, kv_quant):
    """Quantized KV through the ring batcher: quantization is deterministic
    and the ring roll is lossless on quantized rows (int8 and packed int4
    alike), so batched decode must still reproduce the (equally-quantized)
    single-request generate exactly."""
    import dataclasses

    model, params, video = rg
    cfg_q = dataclasses.replace(LLM, kv_quant=kv_quant)
    gen_cfg = ReportGenConfig(vision_dim=32)
    model_q = CTReportGenerator(cfg_q, VIT, gen_cfg)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, LLM.vocab_size, size=(6,)).astype(np.int32)
               for _ in range(3)]
    vision = model.apply(params, video, method=CTReportGenerator.extract_vision)[0]

    singles = []
    for p in prompts:
        res = model_q.apply(params, video, jnp.asarray(p[None]),
                            jnp.ones((1, 6), jnp.int32), 8, eos_token_id=-1,
                            greedy=True, method=CTReportGenerator.generate)
        singles.append(np.asarray(res.tokens[0]))

    batcher = ContinuousBatcher(model_q, params, num_lanes=2, max_len=32,
                                eos_token_id=-1, greedy=True)
    assert batcher.cache.k.dtype == jnp.int8
    for i, p in enumerate(prompts):
        batcher.submit(Request(request_id=i, input_ids=p,
                               attention_mask=np.ones(6, np.int32),
                               vision=vision, max_new_tokens=8))
    results = batcher.run_until_done()
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(results[i].tokens), singles[i])


def test_ring_window_overflow_rejected(rg):
    model, params, video = rg
    vision = model.apply(params, video, method=CTReportGenerator.extract_vision)[0]
    batcher = ContinuousBatcher(model, params, num_lanes=1, max_len=16,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32, steps_per_sync=4)
    with pytest.raises(ValueError):
        batcher.submit(Request(0, np.ones(6, np.int32), np.ones(6, np.int32),
                               vision, max_new_tokens=8))   # 6+8+4 > 16


def test_batcher_eos_frees_lane(rg):
    model, params, video = rg
    vision = model.apply(params, video, method=CTReportGenerator.extract_vision)[0]
    # run one request greedily to learn its first token, then use THAT as EOS
    b0 = ContinuousBatcher(model, params, num_lanes=1, max_len=32,
                           eos_token_id=-1, greedy=True, cache_dtype=jnp.float32)
    p = np.asarray([3, 4, 5], np.int32)
    b0.submit(Request(0, p, np.ones(3, np.int32), vision, max_new_tokens=4))
    res0 = b0.run_until_done()
    first_tok = res0[0].tokens[0]

    # using the greedy first token as EOS: request 0 must finish at prefill
    # with zero tokens, freeing the lane for request 1 (different prompt so it
    # decodes past its own first token only if it differs; budget still ends it)
    b1 = ContinuousBatcher(model, params, num_lanes=1, max_len=32,
                           eos_token_id=first_tok, greedy=True,
                           cache_dtype=jnp.float32)
    b1.submit(Request(0, p, np.ones(3, np.int32), vision, max_new_tokens=6))
    b1.submit(Request(1, np.asarray([7, 8, 9], np.int32),
                      np.ones(3, np.int32), vision, max_new_tokens=2))
    res = b1.run_until_done()
    assert res[0].finished and len(res[0].tokens) == 0   # EOS at prefill
    assert res[1].finished                               # lane was reused


def test_streaming_pipeline_end_to_end(rg):
    model, params, video = rg
    from ctpa.data.tokenizer import SimpleWordTokenizer

    tok = SimpleWordTokenizer(vocab_size=LLM.vocab_size, max_length=8)

    def encode_fn(vol, slope, inter, spacing):
        return model.apply(params, vol[None],
                           method=CTReportGenerator.extract_vision)[0]

    batcher = ContinuousBatcher(model, params, num_lanes=2, max_len=32,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32)
    pipe = StreamingReportPipeline(encode_fn, batcher, tok,
                                   prompt="generate report", max_new_tokens=5,
                                   prompt_len=8)

    def scans():
        for _ in range(3):
            yield {"volume": np.asarray(video[0]), "slope": 1.0,
                   "intercept": 0.0, "spacing": (1.0, 1.0, 1.0)}

    results = pipe.run(scans())
    assert len(results) == 3
    assert all(r.finished and len(r.tokens) == 5 for r in results.values())


def test_pipeline_burst_admits_before_stepping(rg):
    """Admission-priority scheduling: a materialized burst (list source)
    admits EVERY request before the first decode chunk, so no chunk runs
    underfilled (the old step-after-every-submit policy paid one host-synced
    full-cost chunk per arrival with only the already-admitted lanes live)."""
    model, params, video = rg
    from ctpa.data.tokenizer import SimpleWordTokenizer

    tok = SimpleWordTokenizer(vocab_size=LLM.vocab_size, max_length=8)

    def encode_fn(vol, slope, inter, spacing):
        return model.apply(params, vol[None],
                           method=CTReportGenerator.extract_vision)[0]

    batcher = ContinuousBatcher(model, params, num_lanes=4, max_len=32,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32, steps_per_sync=4)
    pipe = StreamingReportPipeline(encode_fn, batcher, tok,
                                   prompt="generate report", max_new_tokens=5,
                                   prompt_len=8)
    live_at_step = []
    orig_step = batcher.step

    def counting_step():
        # admission now happens INSIDE step() (deferred batched admission);
        # fill here first — idempotent — so the count sees what the chunk
        # will actually run with
        batcher._fill_lanes()
        live_at_step.append(int(batcher.active.sum()))
        return orig_step()

    batcher.step = counting_step
    scans = [{"volume": np.asarray(video[0]), "slope": 1.0,
              "intercept": 0.0, "spacing": (1.0, 1.0, 1.0)}
             for _ in range(4)]
    results = pipe.run(scans)
    assert len(results) == 4
    assert all(r.finished and len(r.tokens) == 5 for r in results.values())
    assert live_at_step[0] == 4          # all 4 lanes live at the FIRST chunk
    # budget 5 + device-sampled first token = 6 rows = 2 chunks of 4+1 rows
    assert len(live_at_step) <= 2


def test_multi_step_scheduling_matches_single_step(rg):
    """steps_per_sync=4 must produce identical greedy tokens to K=1."""
    model, params, video = rg
    vision = model.apply(params, video, method=CTReportGenerator.extract_vision)[0]
    p = np.asarray([3, 4, 5], np.int32)

    outs = {}
    for k in (1, 4):
        b = ContinuousBatcher(model, params, num_lanes=2, max_len=64,
                              eos_token_id=-1, greedy=True,
                              cache_dtype=jnp.float32, steps_per_sync=k)
        for i in range(3):
            b.submit(Request(i, p, np.ones(3, np.int32), vision,
                             max_new_tokens=10))
        res = b.run_until_done()
        outs[k] = {i: list(res[i].tokens) for i in range(3)}
        assert all(res[i].finished for i in range(3))
    assert outs[1] == outs[4]


def test_streaming_pipeline_dicom_ingest_end_to_end(rg, tmp_path):
    """BASELINE config 5 with its named ingest format: synthetic Explicit-VR
    DICOM series directories -> threaded decode (data/ingest.scan_stream) ->
    device preprocess contract ({volume, slope, intercept, spacing}) ->
    continuous-batched decoding.  The per-series rescale tags must reach the
    encode_fn (the HU rescale runs on device)."""
    from ctpa.data.dicom import save_series
    from ctpa.data.tokenizer import SimpleWordTokenizer

    model, params, video = rg
    rng = np.random.default_rng(7)
    dirs, seen = [], []
    for i in range(3):
        d = str(tmp_path / f"series_{i}")
        vol = rng.integers(0, 3000, size=(VIT.temporal_size, VIT.image_size,
                                          VIT.image_size)).astype(np.int16)
        save_series(d, vol, spacing=(2.0, 0.7, 0.7), slope=1.0,
                    intercept=-1024.0, shuffle=(i == 1))
        dirs.append(d)

    tok = SimpleWordTokenizer(vocab_size=LLM.vocab_size, max_length=8)

    def encode_fn(vol, slope, inter, spacing):
        # record what ingest handed over; rescale like the device op would
        seen.append((np.asarray(vol).dtype, float(slope), float(inter),
                     tuple(np.asarray(spacing).tolist())))
        hu = vol.astype(jnp.float32) * slope + inter
        return model.apply(params, hu[None, None],
                           method=CTReportGenerator.extract_vision)[0]

    batcher = ContinuousBatcher(model, params, num_lanes=2, max_len=32,
                                eos_token_id=-1, greedy=True,
                                cache_dtype=jnp.float32)
    pipe = StreamingReportPipeline(encode_fn, batcher, tok,
                                   prompt="generate report", max_new_tokens=5,
                                   prompt_len=8)
    results = pipe.run_paths(dirs, num_threads=2)
    assert len(results) == 3
    assert all(r.finished and len(r.tokens) == 5 for r in results.values())
    for dtype, slope, inter, spacing in seen:
        assert dtype == np.int16
        assert (slope, inter) == (1.0, -1024.0)
        np.testing.assert_allclose(spacing, (2.0, 0.7, 0.7), rtol=1e-5)


def test_load_scan_formats(tmp_path):
    """data/ingest.load_scan: one contract across npz / npy / NIfTI /
    DICOM-series sources; kwargs override missing metadata."""
    from ctpa.data import nifti
    from ctpa.data.dicom import save_series
    from ctpa.data.ingest import load_scan

    rng = np.random.default_rng(0)
    vol = rng.integers(-100, 3000, size=(4, 6, 6)).astype(np.int16)

    d = str(tmp_path / "series")
    save_series(d, vol, spacing=(1.5, 0.8, 0.8), slope=2.0, intercept=-10.0)
    s = load_scan(d)
    np.testing.assert_array_equal(s["volume"], vol)
    assert (s["slope"], s["intercept"]) == (2.0, -10.0)
    np.testing.assert_allclose(s["spacing"], (1.5, 0.8, 0.8), rtol=1e-5)

    npz = str(tmp_path / "v.npz")
    np.savez(npz, arr_0=vol, spacing=np.asarray([2.0, 1.0, 1.0]),
             slope=np.asarray(3.0), intercept=np.asarray(-5.0))
    s = load_scan(npz)
    np.testing.assert_array_equal(s["volume"], vol)
    assert (s["slope"], s["intercept"]) == (3.0, -5.0)
    assert s["spacing"] == (2.0, 1.0, 1.0)

    npy = str(tmp_path / "v.npy")
    np.save(npy, vol)
    s = load_scan(npy, slope=1.5, spacing=(9.0, 1.0, 1.0))
    assert s["slope"] == 1.5 and s["spacing"] == (9.0, 1.0, 1.0)

    nii = str(tmp_path / "v.nii")
    # nifti stores (x, y, z); write the transpose so load_scan's (z, y, x)
    # round-trips to `vol`
    nifti.save(nii, np.transpose(vol, (2, 1, 0)).astype(np.float32),
               spacing=(0.7, 0.7, 1.5), scl_slope=1.0, scl_inter=-1024.0)
    s = load_scan(nii)
    np.testing.assert_array_equal(s["volume"].astype(np.int16), vol)
    assert s["intercept"] == -1024.0
    np.testing.assert_allclose(s["spacing"], (1.5, 0.7, 0.7), rtol=1e-5)

    with pytest.raises(ValueError, match="unrecognized"):
        load_scan(str(tmp_path / "v.txt"))
