"""Secondary benchmark: report-generation decode tokens/sec (BASELINE.json
north star: >=2x the reference decode, parity NLG).  bench.py (the driver
metric) covers preproc+encode; this script measures the KV-cached decode path
on one chip and compares against the reference's decode shape (full-prefix
re-forward per token, model_components.py:232-261).

Two geometries:
  * ``--size 1b``  — 0.96B-param proxy (fast; round-1 number).
  * ``--size 7b``  — TRUE Meditron-7B geometry (32 layers, hidden 4096,
    32 heads, intermediate 11008, vocab 32000, bf16 — vqa_meditron.py:425-426).
    Weights are 13.5 GB in bf16, so params are materialized ON DEVICE with
    jitted random generators (a host upload over the ~60 MB/s relay tunnel
    would take ~4 minutes and prove nothing).

Honest-timing rules for the axon relay (see bench.py): per-sample forced
fetch, perturbed inputs, roundtrip subtracted."""

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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the axon TPU plugin registers even when JAX_PLATFORMS=cpu; forcing
        # via jax.config is the honored path (verify skill, conftest.py)
        jax.config.update("jax_platforms", "cpu")

    from ctpa.core.config import CTViTConfig, LLMConfig, ReportGenConfig
    from ctpa.core.initutils import device_params
    from ctpa.models.report_generator import CTReportGenerator

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=["tiny", "1b", "7b"], default="7b",
                    help="tiny = CPU-smokeable script-path check, not a benchmark")
    ap.add_argument("--batch", type=int, default=0,
                    help="override decode batch (0 = per-size default)")
    ap.add_argument("--quant", choices=["none", "int8", "int4"], default="none",
                    help="weight-only serving quantization (ops/quant.py); "
                         "int4 = packed nibbles + group-128 scales, half "
                         "the HBM of int8 (latency tier)")
    ap.add_argument("--ffn-kernel", action="store_true",
                    help="with --quant int8: single-launch fused gate/up/"
                         "silu-mul/down pallas FFN (LLMConfig.quant_ffn_kernel)")
    ap.add_argument("--act-quant", action="store_true",
                    help="with --quant int8: w8a8 — dynamic per-token int8 "
                         "activations, native int8 MXU dots (LLMConfig.quant_act)")
    ap.add_argument("--kv-quant", choices=["none", "int8", "int4"],
                    default="none",
                    help="quantized KV cache (LLMConfig.kv_quant): int8 "
                         "halves the per-step KV read and the cache "
                         "footprint; int4 (group scales) ~3.3x")
    ap.add_argument("--kv-dots", action="store_true",
                    help="with --kv-quant int8: native int8 MXU attention "
                         "dots reading the cache directly (no bf16 "
                         "dequantized K/V copies; LLMConfig.kv_int8_dots)")
    ap.add_argument("--kv-scale-bf16", action="store_true",
                    help="with --kv-quant int4: store the group scales "
                         "bf16 (80 -> 72 B per hd=128 K row, 1.83x vs "
                         "int8; LLMConfig.kv_scale_dtype)")
    ap.add_argument("--flash-decode", action="store_true",
                    help="fused single-token decode attention pallas kernel "
                         "(LLMConfig.flash_decode)")
    ap.add_argument("--prompt-len", type=int, default=0,
                    help="override prompt length (0 = per-size default). "
                         "The KV cache holds prompt+new slots, so this sets "
                         "the attention context: --prompt-len 512 with 96 "
                         "new tokens reproduces the reference's 512-token "
                         "serving prompts (608-slot cache)")
    ap.add_argument("--spec-lookup", type=int, default=0, metavar="K",
                    help="greedy prompt-lookup speculative decoding with K "
                         "draft tokens per verify (generate_speculative). "
                         "Random-init weights give ~0 acceptance, so this "
                         "measures the overhead floor; --spec-repetitive "
                         "measures the full-acceptance ceiling")
    ap.add_argument("--spec-repetitive", action="store_true",
                    help="with --spec-lookup: zero the lm_head so argmax is "
                         "constant — every draft accepts (ceiling measurement)")
    ap.add_argument("--spec-sample", action="store_true",
                    help="with --spec-lookup: rejection-sampling acceptance "
                         "at temperature 0.7 (distribution-exact vs plain "
                         "sampling) instead of greedy verification")
    args = ap.parse_args()
    if args.quant == "none" and args.act_quant:
        ap.error("--act-quant requires quantized weights (--quant int8 -> "
                 "w8a8, --quant int4 -> w4a8)")
    if args.quant == "none" and args.ffn_kernel:
        ap.error("--ffn-kernel requires --quant int8 or int4 (fused "
                 "quantized FFN kernels)")

    log("devices:", jax.devices())
    if args.size == "7b":
        # epfl-llm/meditron-7b == llama-2-7b geometry (vqa_meditron.py:425-426)
        llm_cfg = LLMConfig(
            vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
            num_kv_heads=32, intermediate_size=11008, max_seq_len=128,
        )
        # 12.6 GiB of weights leave ~3 GiB for program buffers on a 15.75 GiB
        # v5e — the decode while_loop holds 2-3 transient KV-cache copies, so
        # the cache is kept short (128 slots: 0.5 GiB k+v at batch 4)
        B, PROMPT, NEW = 4, 32, 96
        REF_RUNS, RUNS = 2, 3
        if args.batch:
            B = args.batch
    elif args.size == "1b":
        llm_cfg = LLMConfig(
            vocab_size=32000, hidden_size=2048, num_layers=16, num_heads=16,
            num_kv_heads=16, intermediate_size=5632, max_seq_len=1024,
        )
        B, PROMPT, NEW = 8, 64, 256
        REF_RUNS, RUNS = 4, 3
    else:
        llm_cfg = LLMConfig.tiny()
        B, PROMPT, NEW = 2, 8, 16
        REF_RUNS, RUNS = 1, 1
    if args.batch:
        B = args.batch
    if args.prompt_len:
        PROMPT = args.prompt_len
        if PROMPT + NEW > llm_cfg.max_seq_len:
            import dataclasses as _dc
            llm_cfg = _dc.replace(llm_cfg, max_seq_len=PROMPT + NEW)

    import dataclasses

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
    vit_cfg = CTViTConfig.tiny()
    gen_cfg = ReportGenConfig(vision_dim=128)
    model = CTReportGenerator(llm_cfg, vit_cfg, gen_cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(B, 1, vit_cfg.temporal_size,
                                         vit_cfg.image_size, vit_cfg.image_size)),
                        jnp.float32)
    ids = jnp.asarray(rng.integers(1, llm_cfg.vocab_size, size=(B, PROMPT)), jnp.int32)
    mask = jnp.ones((B, PROMPT), jnp.int32)

    shapes = jax.eval_shape(lambda k: model.init(k, video, ids, mask), jax.random.key(0))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
    n_bytes = sum(int(np.prod(x.shape)) * (1 if x.dtype == jnp.int8 else 2)
                  for x in jax.tree.leaves(shapes))
    log(f"params: {n_params/1e9:.2f}B ({n_bytes/1e9:.1f} GB on device, "
        f"quant={args.quant})")

    if args.spec_lookup:
        # greedy verification by default; --spec-sample switches to
        # rejection-sampling acceptance at temperature 0.7 (the key is
        # unused in greedy mode but kept so the AOT plumbing is shared)
        gen_fn = lambda p, v, i, m, key: model.apply(
            p, v, i, m, NEW, eos_token_id=-1, draft_len=args.spec_lookup,
            greedy=not args.spec_sample, temperature=0.7, rng=key,
            method=CTReportGenerator.generate_speculative)
    else:
        gen_fn = lambda p, v, i, m, key: model.apply(
            p, v, i, m, NEW, eos_token_id=-1, temperature=0.7, rng=key,
            method=CTReportGenerator.generate)

    if args.size == "7b":
        # At 7B the weight tree barely fits HBM, so the program may not copy
        # it: compile FIRST with AUTO parameter layouts, then materialize the
        # weights directly in the layouts the executable negotiated (dot
        # kernels want major_to_minor=(0,1) weights; feeding default-layout
        # params makes XLA clone every attention matrix — 3.4 GB of copies,
        # observed OOM).
        from jax.experimental.layout import Format, Layout

        shapes_b = jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(
                l.shape,
                jnp.bfloat16 if jnp.issubdtype(l.dtype, jnp.floating) else l.dtype),
            shapes)
        auto = jax.tree.map(lambda _: Format(Layout.AUTO), shapes_b)
        key_s = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
        t0 = time.time()
        gen = jax.jit(gen_fn, in_shardings=(auto, None, None, None, None)).lower(
            shapes_b,
            jax.ShapeDtypeStruct(video.shape, video.dtype),
            jax.ShapeDtypeStruct(ids.shape, ids.dtype),
            jax.ShapeDtypeStruct(mask.shape, mask.dtype),
            key_s,
        ).compile()
        log(f"AOT compile (decode): {time.time()-t0:.1f}s")
        param_formats = gen.input_formats[0][0]
        t0 = time.time()
        params = device_params(shapes_b, formats=param_formats)
        jax.block_until_ready(params)
        log(f"device-side param materialization: {time.time()-t0:.1f}s")
    else:
        t0 = time.time()
        params = device_params(shapes)
        jax.block_until_ready(params)
        log(f"device-side param materialization: {time.time()-t0:.1f}s")
        gen = jax.jit(gen_fn)

    if args.spec_repetitive:
        # full-acceptance ceiling: zero the lm_head so argmax is constant and
        # the repeat-pending-token fallback draft is always right
        head = params["params"]["llm"]["lm_head"]
        zkey = "kernel" if "kernel" in head else (
            "scale" if "scale" in head else "scale_g")
        head[zkey] = head[zkey] * 0
        jax.block_until_ready(head[zkey])

    t0 = time.time()
    r = gen(params, video, ids, mask, jax.random.key(0))
    _ = np.asarray(r.tokens[:1, :1])
    log(f"first call: {time.time()-t0:.1f}s")

    t0 = time.time()
    for _ in range(5):
        _ = np.asarray(r.tokens[:1, :1])
    roundtrip = (time.time() - t0) / 5
    log(f"relay roundtrip: {roundtrip*1000:.1f} ms")

    times = []
    for k in range(RUNS):
        t0 = time.time()
        r = gen(params, video, ids, mask, jax.random.key(k + 1))
        _ = np.asarray(r.tokens[:1, :1])
        times.append(time.time() - t0 - roundtrip)
    per = float(np.median(times))
    tput = B * NEW / per
    p50_tok = per / NEW * 1000
    log(f"KV-cached decode: {per*1000:.0f} ms for {B}x{NEW} tokens "
        f"({tput:.0f} tok/s, p50 {p50_tok:.1f} ms/step for batch {B})")
    spec_steps = None
    if args.spec_lookup:
        spec_steps = int(np.asarray(r.steps))
        log(f"speculative: {spec_steps} verify forwards for {NEW} tokens/"
            f"lane ({(NEW - 1) / max(spec_steps, 1):.2f} emitted/verify, "
            f"draft_len={args.spec_lookup})")

    # reference decode shape: one full-prefix forward per generated token
    fwd_fn = lambda p, v, i, m: model.apply(p, v, i, m)
    if args.size == "7b":
        # commit the already-materialized layouts so no weight copies appear
        fwd = jax.jit(fwd_fn, in_shardings=(param_formats, None, None, None))
    else:
        fwd = jax.jit(fwd_fn)
    full_ids = jnp.concatenate([ids, jnp.zeros((B, NEW), jnp.int32)], axis=1)
    full_mask = jnp.ones((B, PROMPT + NEW), jnp.int32)
    lg = fwd(params, video, full_ids, full_mask)
    _ = np.asarray(lg[:1, :1, :1].astype(jnp.float32))
    ref_times = []
    for k in range(REF_RUNS):
        t0 = time.time()
        lg = fwd(params, video, full_ids + k, full_mask)
        _ = np.asarray(lg[:1, :1, :1].astype(jnp.float32))
        ref_times.append(time.time() - t0 - roundtrip)
    per_fwd = float(np.median(ref_times))
    ref_tput = B / per_fwd          # B tokens per full forward
    log(f"reference shape: {per_fwd*1000:.0f} ms per full-prefix forward "
        f"({ref_tput:.1f} tok/s)")

    payload = {
        "metric": f"report_decode_tokens_per_sec_{args.size}",
        "value": round(tput, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(tput / ref_tput, 1),
    }
    if spec_steps is not None:
        payload["spec_verify_steps"] = spec_steps
        payload["spec_emitted_per_verify"] = round(
            (NEW - 1) / max(spec_steps, 1), 2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
