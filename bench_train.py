"""Meditron-7B LoRA fine-tune step benchmark on one chip (BASELINE configs
3-4 training path).

Measures the partitioned-gradient training step (train/report_trainer.py:
`make_partitioned_report_step`) at true Meditron geometry.  Three things make
7B training fit a single 16 GB v5e — none of which the reference has
(train_module.py:307-383 is torch+peft with full-tree grads on GPU):

1. gradients exist only for the trainable LoRA/head leaves (a full-tree
   gradient is another 13.5 GB);
2. the frozen vision trunk runs in its own program
   (`CTReportGenerator.loss_from_vision`), keeping the 440 MB video and
   trunk activations out of the step;
3. the step is AOT-compiled with AUTO parameter layouts and the weights are
   materialized directly in the negotiated layouts (default layouts make XLA
   clone the attention matrices in-program -> runtime OOM).

Prints one JSON line like bench.py / bench_decode.py.  Honest-timing rules:
per-step times are wall-of-step-call with a device fetch, relay roundtrip
NOT subtracted (steps are ~300 ms, roundtrip ~35 ms — reported as-is with
the roundtrip noted)."""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

from ctpa.core.compilation_cache import enable_compilation_cache

enable_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ctpa.core.config import (CTViTConfig, LLMConfig, LoRAConfig,
                                  ReportGenConfig)
    from ctpa.core.initutils import device_params
    from ctpa.models.report_generator import CTReportGenerator
    from ctpa.train.report_trainer import make_partitioned_report_step
    from ctpa.train.train_state import SimpleTrainState

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=["tiny", "7b"], default="7b")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--no-flash", action="store_true",
                    help="disable the pallas flash_prefill route")
    args = ap.parse_args()

    log("devices:", jax.devices())
    B, N = args.batch, args.seq_len
    if args.size == "7b":
        llm_cfg = LLMConfig(
            vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
            num_kv_heads=32, intermediate_size=11008, max_seq_len=N,
            flash_prefill=not args.no_flash, flash_min_len=256,
        )
        vit_cfg = dataclasses.replace(CTViTConfig(), pallas_patchify=True)
        vdim, vshape = 512, (B, 1, 240, 480, 480)
        dtype = jnp.bfloat16
    else:
        llm_cfg = LLMConfig.tiny()
        vit_cfg = CTViTConfig.tiny()
        vdim = 128
        vshape = (B, 1, vit_cfg.temporal_size, vit_cfg.image_size,
                  vit_cfg.image_size)
        dtype = jnp.float32
        N = min(N, llm_cfg.max_seq_len)

    lora = LoRAConfig(rank=16, alpha=32.0)   # train_module.py:330-337 config
    gen_cfg = ReportGenConfig(vision_dim=vdim, lora=lora)
    model = CTReportGenerator(llm_cfg, vit_cfg, gen_cfg, lora=lora,
                              dtype=dtype, remat=(args.size == "7b"))

    video = jnp.zeros(vshape, dtype)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, llm_cfg.vocab_size, size=(B, N)), jnp.int32)
    mask = jnp.ones((B, N), jnp.int32)

    t0 = time.time()
    shapes = jax.eval_shape(lambda k: model.init(k, video, ids, mask),
                            jax.random.key(0))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
    log(f"params: {n_params/1e9:.2f}B; eval_shape {time.time()-t0:.1f}s")

    if args.size == "7b":
        shapes = jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(
                l.shape,
                jnp.bfloat16 if jnp.issubdtype(l.dtype, jnp.floating) else l.dtype),
            shapes)
    step_fn, opt0_init = make_partitioned_report_step(
        model, shapes, gen_cfg, total_steps=100)
    opt0_s = jax.eval_shape(lambda: opt0_init)

    from jax.experimental.layout import Format, Layout

    state_s = SimpleTrainState(params=shapes, opt_state=opt0_s,
                               step=jax.ShapeDtypeStruct((), jnp.int32))
    batch_s = {"vision": jax.ShapeDtypeStruct((B, vdim), jnp.float32),
               "input_ids": jax.ShapeDtypeStruct((B, N), jnp.int32),
               "attention_mask": jax.ShapeDtypeStruct((B, N), jnp.int32)}
    auto_state = jax.tree.map(lambda _: Format(Layout.AUTO), state_s)
    t0 = time.time()
    step = jax.jit(step_fn, in_shardings=(auto_state, None),
                   out_shardings=(auto_state, None),
                   donate_argnums=(0,)).lower(state_s, batch_s).compile()
    log(f"AOT compile (train step): {time.time()-t0:.1f}s")
    state_fmt = step.input_formats[0][0]

    t0 = time.time()
    params = device_params(shapes, formats=state_fmt.params)
    jax.block_until_ready(params)
    log(f"param materialization: {time.time()-t0:.1f}s")

    opt0 = jax.tree.map(
        lambda l, f: jax.jit(lambda: jnp.zeros(l.shape, l.dtype),
                             out_shardings=f)() if hasattr(l, "shape") else l,
        opt0_s, state_fmt.opt_state)
    state = SimpleTrainState(params=params, opt_state=opt0,
                             step=jnp.zeros((), jnp.int32))

    extract = jax.jit(lambda p, v: model.apply(
        p, v, method=CTReportGenerator.extract_vision))
    t0 = time.time()
    vision = extract(params, video).astype(jnp.float32)
    jax.block_until_ready(vision)
    log(f"vision extract (compile+run): {time.time()-t0:.1f}s shape={vision.shape}")
    batch = {"vision": vision, "input_ids": ids, "attention_mask": mask}

    t0 = time.time()
    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    log(f"first step: {time.time()-t0:.1f}s; "
        f"loss={float(m['loss']):.4f} grad_norm={float(m['grad_norm']):.4f}")
    assert np.isfinite(float(m["loss"]))

    ts = []
    for i in range(3):
        # keep perturbed ids in [1, vocab_size-1]: `% vocab + 1` could yield
        # id == vocab_size (one past the table; XLA clamps the gather silently)
        batch2 = {**batch, "input_ids": (ids + i) % (llm_cfg.vocab_size - 1) + 1}
        t0 = time.time()
        state, m = step(state, batch2)
        _ = float(m["loss"])
        ts.append(time.time() - t0)
    per = float(np.median(ts))
    tps = B * N / per
    log(f"LoRA train step: {per*1000:.0f} ms ({tps:.0f} tokens/sec fwd+bwd, "
        f"batch {B} x {N} tokens)")

    print(json.dumps({
        "metric": "report_train_tokens_per_sec",
        "value": round(tps, 1),
        "unit": "tokens/sec",
        "step_ms": round(per * 1000, 1),
        "size": args.size,
        "batch": B,
        "seq_len": N,
        "flash_prefill": bool(llm_cfg.flash_prefill),
    }))


if __name__ == "__main__":
    main()
