"""End-to-end BASELINE config-5 streaming benchmark (VERDICT round-1 item #7).

Measures the FULL serving pipeline on one chip — no stage extrapolations:

    npz files on disk
      -> native C++ loader (ctpa/data/native/ct_loader.cc, thread pool)
      -> int16 HU upload to HBM (half the bytes of fp32 over the link; CT
         data is natively int16, the HU rescale runs on device)
      -> fused device preprocess (HU window + trilinear resample + crop/pad)
      -> CTViT patch-embed vision feature (reference config-5 extractor,
         model_components.py:41-71)
      -> continuous-batched KV-cached report decoding (ContinuousBatcher)

Reports volumes/sec end-to-end, generated tokens/sec, and an estimated TPU
duty cycle (device-busy time from post-hoc per-program calibration divided by
pipeline wall time).  The reference analog is ct_scan_inference.py: one scan
loaded with nibabel on the host, one full-prefix-per-token decode, no
batching, no overlap.

Sizes: --size tiny (CPU smoke / CI), --size 7b (true Meditron geometry,
bf16 weights materialized on device).  Honest-timing rules per bench.py."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

import numpy as np

from ctpa.core.compilation_cache import enable_compilation_cache

enable_compilation_cache()

RAW_SHAPE = (160, 512, 512)
SPACING = (2.0, 0.75, 0.75)
SLOPE, INTERCEPT = 1.0, -1024.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_dataset(data_dir: str, n: int, shape, seed: int = 0) -> list[str]:
    """Synthetic CT series as int16 npz files (the storage dtype of real CT;
    the native loader converts on decode).  The directory is keyed by shape
    so --size tiny and --size 7b runs never reuse each other's volumes."""
    data_dir = f"{data_dir}_{'x'.join(map(str, shape))}"
    os.makedirs(data_dir, exist_ok=True)
    paths = []
    rng = np.random.default_rng(seed)
    for i in range(n):
        p = os.path.join(data_dir, f"scan_{i:03d}.npz")
        if not os.path.exists(p):
            vol = rng.integers(-24, 3000, size=shape).astype(np.int16)
            np.savez(p, arr_0=vol)
        paths.append(p)
    return paths


def make_dataset_dicom(data_dir: str, n: int, shape, seed: int = 0
                       ) -> list[str]:
    """Synthetic Explicit-VR-LE DICOM series directories (one slice file per
    z, rescale tags slope/intercept, geometric spacing) — BASELINE config
    5's named ingest format, decoded by data/ingest.load_scan."""
    from ctpa.data.dicom import save_series

    data_dir = f"{data_dir}_dcm_{'x'.join(map(str, shape))}"
    rng = np.random.default_rng(seed)
    dirs = []
    for i in range(n):
        d = os.path.join(data_dir, f"series_{i:03d}")
        if not (os.path.isdir(d) and os.listdir(d)):
            # stored values; the device HU rescale applies slope/intercept
            vol = rng.integers(1000, 4000, size=shape).astype(np.int16)
            save_series(d, vol, spacing=SPACING, slope=SLOPE,
                        intercept=INTERCEPT)
        dirs.append(d)
    return dirs


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the axon TPU plugin registers even when JAX_PLATFORMS=cpu; forcing
        # via jax.config is the honored path (verify skill, conftest.py)
        jax.config.update("jax_platforms", "cpu")

    from ctpa.core.config import (CTViTConfig, LLMConfig, PreprocessConfig,
                                  ReportGenConfig)
    from ctpa.core.initutils import device_params
    from ctpa.data.native_loader import NativeLoader, available
    from ctpa.models.report_generator import CTReportGenerator
    from ctpa.ops.preprocess import preprocess_volume
    from ctpa.pipelines.streaming import ContinuousBatcher, Request

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=["tiny", "7b"], default="7b")
    ap.add_argument("--volumes", type=int, default=6)
    ap.add_argument("--lanes", type=int, default=4)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=16)
    ap.add_argument("--data-dir", default="/tmp/ctpa_stream_bench")
    # decode steps per host sync: on the relay every sync is a ~40-70 ms
    # roundtrip that also preempts the bulk volume upload (single tunnel),
    # so serving over the relay wants large chunks; on local PCIe 8 is fine
    ap.add_argument("--steps-per-sync", type=int, default=8)
    ap.add_argument("--quant", choices=["none", "int8", "int4"], default="none",
                    help="weight-only quantized LLM (ops/quant.py): int8 "
                         "halves weight HBM reads per decode step; int4 "
                         "halves them again (group-128 scales)")
    ap.add_argument("--ffn-kernel", action="store_true",
                    help="with --quant int8: single-launch fused pallas FFN")
    ap.add_argument("--act-quant", action="store_true",
                    help="with --quant int8: w8a8 — per-token int8 "
                         "activations, native int8 MXU dots")
    ap.add_argument("--kv-quant", choices=["none", "int8", "int4"],
                    default="none",
                    help="quantized KV cache: int8 halves the per-step KV "
                         "read and doubles lane capacity; int4 (group "
                         "scales) ~3.3x")
    ap.add_argument("--kv-dots", action="store_true",
                    help="with --kv-quant int8: native int8 MXU attention "
                         "dots reading the cache directly (no bf16 "
                         "dequantized K/V copies; LLMConfig.kv_int8_dots)")
    ap.add_argument("--kv-scale-bf16", action="store_true",
                    help="with --kv-quant int4: bf16 group scales "
                         "(LLMConfig.kv_scale_dtype) — 1.83x cache bytes "
                         "vs int8")
    ap.add_argument("--flash-decode", action="store_true",
                    help="fused single-token decode attention pallas kernel")
    ap.add_argument("--no-shared-prefix", action="store_true",
                    help="disable shared-prefix admission (prefill the "
                         "prompt per request instead of once)")
    ap.add_argument("--spec-lookup", type=int, default=0,
                    help="speculative serving: prompt-lookup verify chunks "
                         "with K drafted tokens per lane per step (greedy "
                         "verification unless --spec-sample; amortizes the "
                         "M=1 decode-attention MXU floor over K+1 positions)")
    ap.add_argument("--spec-ngram", type=int, default=2)
    ap.add_argument("--spec-policy", choices=["manual", "auto"],
                    default="manual",
                    help="with --spec-lookup: 'auto' picks the chunk "
                         "discipline per wave from occupancy — spec verify "
                         "chunks when at most --spec-auto-threshold "
                         "requests wait (latency tier), plain ring "
                         "batching at saturation (throughput tier)")
    ap.add_argument("--spec-auto-threshold", type=int, default=None)
    ap.add_argument("--spec-accept-floor", default="auto",
                    help="acceptance-adaptive demotion floor for "
                         "--spec-policy auto: 'auto' (0.6*(K+1)), 'none' "
                         "(pure occupancy policy), or a float — waves whose "
                         "acceptance EWMA (tokens/verify) is below the "
                         "floor serve plain even at trickle occupancy")
    ap.add_argument("--spec-sample", action="store_true",
                    help="with --spec-lookup: rejection-sampling acceptance "
                         "at temperature 0.7 (distribution-exact vs plain "
                         "sampling) instead of greedy verification")
    ap.add_argument("--ingest-format", choices=["npz", "dicom"],
                    default="npz",
                    help="scan source format: npz via the native C++ "
                         "loader, or Explicit-VR DICOM series directories "
                         "via data/ingest (Python thread pool) — BASELINE "
                         "config 5's named ingest")
    ap.add_argument("--device-resident", action="store_true",
                    help="stage all raw volumes in HBM BEFORE the clock "
                         "starts: measures the pipeline's true "
                         "encode/decode overlap ceiling on this chip, "
                         "separated from host decode + tunnel upload "
                         "(the transport-bound number the default run "
                         "reports)")
    args = ap.parse_args()
    if args.quant == "none" and args.act_quant:
        ap.error("--act-quant requires quantized weights (--quant int8 -> "
                 "w8a8, --quant int4 -> w4a8)")
    if args.quant == "none" and args.ffn_kernel:
        ap.error("--ffn-kernel requires --quant int8 or int4 (fused "
                 "quantized FFN kernels)")

    if args.ingest_format == "npz" and not available():
        log("native loader unavailable (no g++/zlib)")
        sys.exit(1)

    log("devices:", jax.devices())
    import dataclasses
    # cache slack past prompt+budget: a chunk of ring overshoot (plain) or
    # the K+1 in-flight verify rows (speculative serving); auto policy may
    # serve either discipline, so it needs the larger of the two
    if args.spec_lookup and args.spec_policy == "auto":
        slack = max(args.spec_lookup + 1, args.steps_per_sync)
    elif args.spec_lookup:
        slack = args.spec_lookup + 1
    else:
        slack = args.steps_per_sync
    if args.size == "7b":
        llm_cfg = LLMConfig(max_seq_len=args.prompt_len + args.new_tokens + slack)
        vit_cfg = dataclasses.replace(CTViTConfig(), pallas_patchify=True,
                                      flash_axial=True)
        pre_cfg = PreprocessConfig.train()
        raw_shape = RAW_SHAPE
    else:
        llm_cfg = LLMConfig.tiny()
        vit_cfg = CTViTConfig.tiny()
        pre_cfg = PreprocessConfig(
            target_shape=(vit_cfg.temporal_size, vit_cfg.image_size,
                          vit_cfg.image_size))
        raw_shape = (40, 80, 80)

    if args.quant == "int8":
        llm_cfg = dataclasses.replace(llm_cfg, weight_quant="int8",
                                      quant_ffn_kernel=args.ffn_kernel,
                                      quant_act=args.act_quant)
    elif args.quant == "int4":
        llm_cfg = dataclasses.replace(llm_cfg, weight_quant="int4",
                                      quant_ffn_kernel=args.ffn_kernel,
                                      quant_act=args.act_quant)
    if args.kv_quant != "none":
        llm_cfg = dataclasses.replace(llm_cfg, kv_quant=args.kv_quant)
    if args.kv_dots:
        if args.kv_quant != "int8":
            raise SystemExit("--kv-dots requires --kv-quant int8")
        llm_cfg = dataclasses.replace(llm_cfg, kv_int8_dots=True)
    if args.kv_scale_bf16:
        if args.kv_quant != "int4":
            raise SystemExit("--kv-scale-bf16 requires --kv-quant int4")
        llm_cfg = dataclasses.replace(llm_cfg, kv_scale_dtype="bfloat16")
    if args.flash_decode:
        llm_cfg = dataclasses.replace(llm_cfg, flash_decode=True)
    if args.size == "tiny" and jax.default_backend() == "cpu":
        # tiny is the CPU script-path smoke: pallas kernels can't lower on
        # the CPU backend, so route quantized math through XLA and drop the
        # pallas-only decode-attention kernel
        if llm_cfg.flash_decode:
            log("tiny CPU smoke: flash_decode disabled (pallas-only)")
        llm_cfg = dataclasses.replace(llm_cfg, quant_impl="xla",
                                      flash_decode=False)
    gen_cfg = ReportGenConfig(vision_dim=512 if args.size == "7b" else 128)
    model = CTReportGenerator(llm_cfg, vit_cfg, gen_cfg, dtype=jnp.bfloat16)

    if args.ingest_format == "dicom":
        t0 = time.time()
        paths = make_dataset_dicom(args.data_dir, args.volumes, raw_shape)
        log(f"dicom dataset ready: {time.time()-t0:.1f}s")
    else:
        paths = make_dataset(args.data_dir, args.volumes, raw_shape)

    # ---- params on device (bf16 storage, as the reference loads Meditron) --
    dummy_video = jnp.zeros((1, 1) + pre_cfg.target_shape, jnp.float32)
    dummy_ids = jnp.zeros((1, args.prompt_len), jnp.int32)
    shapes = jax.eval_shape(
        lambda k: model.init(k, dummy_video, dummy_ids, dummy_ids),
        jax.random.key(0))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
    log(f"params: {n_params/1e9:.2f}B")
    t0 = time.time()
    formats = None
    if args.size == "7b":
        # materialize weights directly in the decode program's negotiated
        # layouts (12.6 GB tree: default layouts cost ~3.4 GB of in-program
        # copies -> OOM; see streaming.negotiate_param_formats docstring)
        from ctpa.pipelines.streaming import negotiate_param_formats

        shapes = jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(
                l.shape,
                jnp.bfloat16 if jnp.issubdtype(l.dtype, jnp.floating) else l.dtype),
            shapes)
        formats = negotiate_param_formats(
            model, shapes, num_lanes=args.lanes,
            max_len=args.prompt_len + args.new_tokens + slack,
            steps_per_sync=args.steps_per_sync,
            greedy=bool(args.spec_lookup) and not args.spec_sample,
            # auto policy serves saturated bursts on the PLAIN discipline —
            # negotiate layouts for its hot program, not the spec chunk
            spec_lookup=(args.spec_lookup or None
                         ) if args.spec_policy == "manual" else None,
            spec_ngram=args.spec_ngram)
        log(f"layout negotiation (AOT): {time.time()-t0:.1f}s")
        t0 = time.time()
    params = device_params(shapes, force_dtype=jnp.bfloat16, formats=formats)
    jax.block_until_ready(params)
    log(f"param materialization: {time.time()-t0:.1f}s")

    # ---- one jitted program: int16 raw -> preprocess -> vision feature -----
    @jax.jit
    def encode(params, raw_i16, slope, intercept, spacing):
        video = preprocess_volume(raw_i16.astype(jnp.float32), slope, intercept,
                                  spacing, cfg=pre_cfg)
        return model.apply(params, video[None].astype(jnp.bfloat16),
                           method=CTReportGenerator.extract_vision)[0]

    batcher = ContinuousBatcher(
        model, params, num_lanes=args.lanes,
        max_len=args.prompt_len + args.new_tokens + slack,
        eos_token_id=2, temperature=0.7, steps_per_sync=args.steps_per_sync,
        greedy=bool(args.spec_lookup) and not args.spec_sample,
        spec_lookup=args.spec_lookup or None, spec_ngram=args.spec_ngram,
        spec_policy=args.spec_policy,
        spec_auto_threshold=args.spec_auto_threshold,
        spec_accept_floor=(None if args.spec_accept_floor == "none"
                           else "auto" if args.spec_accept_floor == "auto"
                           else float(args.spec_accept_floor)),
        cache_dtype=jnp.bfloat16)

    # unified host decode: C++ thread-pool loader for npz, Python thread
    # pool around data/ingest.load_scan for DICOM series (slope/intercept/
    # spacing come from the series' own rescale tags there)
    if args.ingest_format == "dicom":
        from ctpa.data.ingest import load_scan

        loader = None

        def host_load(p):
            s = load_scan(p)
            return (np.ascontiguousarray(s["volume"].astype(np.int16)),
                    float(s["slope"]), float(s["intercept"]),
                    tuple(float(x) for x in s["spacing"]))
    else:
        loader = NativeLoader(num_threads=4)

        def host_load(p):
            vol, _meta = loader.load(p)
            return vol.astype(np.int16), SLOPE, INTERCEPT, SPACING

    rng = np.random.default_rng(1)
    prompt_ids = rng.integers(3, llm_cfg.vocab_size, size=(args.prompt_len,)
                              ).astype(np.int32)
    prompt_mask = np.ones((args.prompt_len,), np.int32)
    # serving uses ONE fixed prompt per scan (reference data_utils.py:40), so
    # by default its KV is prefilled once and admissions reuse it (exact —
    # vision enters only at the fused-logits head); --no-shared-prefix
    # restores per-request prefill for A/B
    if not args.no_shared_prefix:
        batcher.set_shared_prefix(prompt_ids, prompt_mask)
        prompt_ids = prompt_mask = None

    # ---- warm up every compiled program off the clock ----------------------
    t0 = time.time()
    vol0, sl0, ic0, sp0 = host_load(paths[0])
    raw0 = jax.device_put(vol0)
    v0 = encode(params, raw0, jnp.float32(sl0), jnp.float32(ic0),
                jnp.asarray(sp0, jnp.float32))
    batcher.submit(Request(request_id=-1, input_ids=prompt_ids,
                           attention_mask=prompt_mask, vision=v0,
                           max_new_tokens=8))
    batcher.run_until_done()
    # second wave, ALWAYS: the first wave ran admission/chunk on the freshly
    # created cache buffer; after run_until_done the cache's layout
    # provenance is the decode chunk's donated OUTPUT, and a program first
    # seeing that provenance re-lowers and remote-recompiles INSIDE the
    # measured wall (r5c measured: the plain devres ceiling leg's 2 chunks
    # cost 2.8 s vs the multi-wave-warmed auto leg's 0.7 s for the same
    # workload/programs).  One more wave pins every steady-state layout.
    batcher.submit(Request(request_id=-3, input_ids=prompt_ids,
                           attention_mask=prompt_mask, vision=v0,
                           max_new_tokens=8))
    batcher.run_until_done()
    if args.spec_policy == "auto":
        # warmup must cover BOTH tiers regardless of the acceptance floor
        # (the adaptive lever would demote the second spec wave on this
        # random-token workload and leave the spec chunk un-warmed on the
        # donated-cache provenance); the floor is restored for the measured
        # run, which keeps the warmup waves' EWMA as policy history — a
        # production server carries its own history the same way
        _saved_floor = batcher.spec_accept_floor
        batcher.spec_accept_floor = None
        # the single-request warmup above compiled only the SPEC tier's
        # programs (1 <= threshold); warm the PLAIN tier too with a
        # saturating burst, or its chunk/admission programs compile inside
        # the measured wall (r5: 128 s p-max on the first auto-burst leg).
        # Then run ONE MORE spec wave: the cache buffer's layout provenance
        # differs after it has been donated through the plain chunk +
        # bookkeeping reset, and a spec chunk first seeing that layout
        # re-lowers and REMOTE-recompiles (~95 s measured in-wall on the
        # r5b auto-burst leg).  Warming each tier on both provenances keeps
        # every transition's executable out of the measured wall.
        for i in range(batcher.spec_auto_threshold + 1):
            batcher.submit(Request(request_id=-2 - i, input_ids=prompt_ids,
                                   attention_mask=prompt_mask, vision=v0,
                                   max_new_tokens=8))
        batcher.run_until_done()
        batcher.submit(Request(request_id=-100, input_ids=prompt_ids,
                               attention_mask=prompt_mask, vision=v0,
                               max_new_tokens=8))
        batcher.run_until_done()
        for i in range(batcher.spec_auto_threshold + 1):
            batcher.submit(Request(request_id=-200 - i, input_ids=prompt_ids,
                                   attention_mask=prompt_mask, vision=v0,
                                   max_new_tokens=8))
        batcher.run_until_done()
        batcher.spec_accept_floor = _saved_floor
        if batcher.spec_accept_floor is not None:
            log(f"spec acceptance EWMA after warmup: "
                f"{batcher._spec_accept_ewma:.2f} tokens/verify "
                f"(demotion floor {batcher.spec_accept_floor:.2f})")
    batcher.results.clear()
    log(f"warmup (compile prefill+decode+encode): {time.time()-t0:.1f}s")

    # ---- the measured pipeline --------------------------------------------
    # ingest thread: C++ decode -> int16 upload -> encode dispatch; the MAIN
    # thread decodes continuously, so host->device transfer (the relay
    # bottleneck: ~1.4 s per 84 MB volume) overlaps token generation
    import queue as _queue
    import threading

    # --device-resident: decode + upload every volume BEFORE the clock so
    # the measured pipeline is pure device work (encode/decode overlap
    # ceiling); the default path measures the full transport-bound reality
    staged = None
    if args.device_resident:
        staged = []
        for p in paths:
            vol, sl, ic, sp = host_load(p)
            staged.append((jax.device_put(vol), sl, ic, sp))
        jax.block_until_ready([s[0] for s in staged])
        log(f"device-resident: {len(staged)} raw volumes staged in HBM "
            "(off the clock)")

    t_start = time.time()
    if staged is None:
        if args.ingest_format == "dicom":
            from concurrent.futures import ThreadPoolExecutor

            dcm_pool = ThreadPoolExecutor(max_workers=4)
            futs = [dcm_pool.submit(host_load, p) for p in paths]

            def fetch_scan(rid):
                return futs[rid].result()
        else:
            tickets = [loader.submit(p) for p in paths]  # C++ decode-ahead

            def fetch_scan(rid):
                vol, _meta = loader.fetch(tickets[rid])
                return vol.astype(np.int16), SLOPE, INTERCEPT, SPACING
    ready: _queue.Queue = _queue.Queue()
    tl = {"fetch": 0.0, "put": 0.0, "enc": 0.0, "step": 0.0, "n_steps": 0,
          "submit": 0.0, "idle": 0.0}

    def ingest():
        for rid in range(len(paths)):
            t0 = time.time()
            if staged is not None:
                raw, sl, ic, sp = staged[rid]
                t1 = t2 = time.time()
            else:
                vol, sl, ic, sp = fetch_scan(rid)     # blocks on host decode
                t1 = time.time()
                raw = jax.device_put(vol)             # half-width HU upload
                jax.block_until_ready(raw)
                t2 = time.time()
            vis = encode(params, raw, jnp.float32(sl), jnp.float32(ic),
                         jnp.asarray(sp, jnp.float32))
            t3 = time.time()
            tl["fetch"] += t1 - t0
            tl["put"] += t2 - t1
            tl["enc"] += t3 - t2
            ready.put((rid, vis))
        ready.put(None)

    th = threading.Thread(target=ingest, daemon=True)
    th.start()
    n_encodes, ingest_done = 0, False
    while not (ingest_done and not batcher.active.any() and not batcher.queue):
        # admission priority: drain EVERY ready encode before the next chunk.
        # (one-admission-per-chunk left a 16-volume burst stepping ~16
        # underfilled chunks before full admission — measured r4: 17 chunks
        # for a workload whose full-lane optimum is ⌈tokens/steps_per_sync⌉)
        drained = 0
        try:
            while True:
                item = ready.get_nowait()
                if item is None:
                    ingest_done = True
                    break
                rid, vis = item
                n_encodes += 1
                drained += 1
                t0 = time.time()
                batcher.submit(Request(request_id=rid, input_ids=prompt_ids,
                                       attention_mask=prompt_mask, vision=vis,
                                       max_new_tokens=args.new_tokens))
                tl["submit"] += time.time() - t0
        except _queue.Empty:
            pass
        if drained and not ingest_done:
            # admission window: submits are now ~free (deferred batched
            # admission), so without this beat the first chunk races ahead
            # of the ingest thread's remaining encode dispatches and runs
            # underfilled — r4c's 0.7 s of per-submit dispatches was
            # accidentally the burst coalescer.  3 ms per admission wave
            # bounds the added latency; a full burst coalesces into one
            # admission program + optimal chunks.
            t0 = time.time()
            time.sleep(0.01)
            tl["idle"] += time.time() - t0
            continue
        if batcher.has_work:
            t0 = time.time()
            batcher.step()        # admits every queued request, then chunks
            tl["step"] += time.time() - t0
            tl["n_steps"] += 1
        elif not ingest_done:
            t0 = time.time()
            time.sleep(0.002)
            tl["idle"] += time.time() - t0
    th.join()
    results = batcher.results
    wall = time.time() - t_start
    # capture BEFORE calibration: its single-request waves re-run the auto
    # policy and would overwrite the measured run's discipline/EWMA
    last_wave_mode = batcher._mode
    accept_ewma = batcher._spec_accept_ewma
    log(f"timeline: fetch {tl['fetch']:.1f}s, upload {tl['put']:.1f}s, "
        f"encode-dispatch {tl['enc']:.1f}s (ingest thread); "
        f"{tl['n_steps']} decode chunks totalling {tl['step']:.1f}s, "
        f"submits {tl['submit']:.1f}s, idle-waits {tl['idle']:.1f}s "
        f"(main thread)")

    total_tokens = sum(len(r.tokens) for r in results.values() if r.request_id >= 0)
    lat = sorted(r.latency_s for r in results.values() if r.request_id >= 0)
    vols_per_sec = args.volumes / wall
    toks_per_sec = total_tokens / wall

    # ---- duty-cycle estimate: calibrate per-program device time ------------
    rts = []
    for _ in range(10):
        t0 = time.time()
        _ = np.asarray(v0[:1])
        rts.append(time.time() - t0)
    roundtrip = float(np.median(rts))

    enc_t = []
    for i in range(3):
        t0 = time.time()
        o = encode(params, raw0 + np.int16(i + 1), jnp.float32(sl0),
                   jnp.float32(ic0), jnp.asarray(sp0, jnp.float32))
        _ = np.asarray(o[:1])
        enc_t.append(time.time() - t0 - roundtrip)
    enc_dev = max(float(np.median(enc_t)), 0.0)

    dec_t = []
    # re-measure one decode chunk with the batcher's own compiled program
    batcher.results.clear()
    for i in range(3):
        batcher.submit(Request(request_id=1000 + i, input_ids=prompt_ids,
                               attention_mask=prompt_mask, vision=v0,
                               max_new_tokens=batcher.steps_per_sync))
        t0 = time.time()
        batcher.step()
        dec_t.append(time.time() - t0 - roundtrip)
        batcher.run_until_done()
    dec_dev = max(float(np.median(dec_t)), 0.0)
    n_chunks = int(np.ceil(args.volumes * args.new_tokens /
                           (args.lanes * batcher.steps_per_sync)))
    device_busy = n_encodes * enc_dev + n_chunks * dec_dev
    duty = min(device_busy / wall, 1.0)

    log(f"pipeline wall: {wall:.2f}s for {args.volumes} volumes, "
        f"{total_tokens} tokens")
    log(f"volumes/sec e2e: {vols_per_sec:.3f}; tokens/sec: {toks_per_sec:.1f}")
    log(f"latency p50: {lat[len(lat)//2]:.2f}s  p max: {lat[-1]:.2f}s")
    log(f"calibration: encode {enc_dev*1000:.1f} ms/vol, decode chunk "
        f"{dec_dev*1000:.1f} ms/{batcher.steps_per_sync} steps, "
        f"duty cycle ~{duty*100:.0f}%")

    print(json.dumps({
        "metric": "config5_stream_volumes_per_sec",
        "value": round(vols_per_sec, 3),
        "unit": "volumes/sec",
        "tokens_per_sec": round(toks_per_sec, 1),
        "duty_cycle": round(duty, 2),
        "volumes": args.volumes,
        "size": args.size,
        "ingest_format": args.ingest_format,
        "device_resident": bool(args.device_resident),
        **({"last_wave_mode": last_wave_mode,
            "spec_accept_ewma": (None if accept_ewma is None
                                 else round(accept_ewma, 2))}
           if args.spec_policy == "auto" else {}),
    }))


if __name__ == "__main__":
    main()
