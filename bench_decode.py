"""Secondary benchmark: report-generation decode tokens/sec (BASELINE.json
north star: >=2x the reference decode, parity NLG).  bench.py (the driver
metric) covers preproc+encode; this script measures the KV-cached decode path
at ~1B-param scale on one chip and compares against the reference's decode
shape (full-prefix re-forward per token, model_components.py:232-261).

Honest-timing rules for the axon relay (see bench.py): per-sample forced
fetch, perturbed inputs, roundtrip subtracted."""

from __future__ import annotations

import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ctpa.core.config import CTViTConfig, LLMConfig, ReportGenConfig
    from ctpa.models.report_generator import CTReportGenerator

    log("devices:", jax.devices())
    llm_cfg = LLMConfig(
        vocab_size=32000, hidden_size=2048, num_layers=16, num_heads=16,
        num_kv_heads=16, intermediate_size=5632, max_seq_len=1024,
    )
    vit_cfg = CTViTConfig.tiny()
    gen_cfg = ReportGenConfig(vision_dim=128)
    model = CTReportGenerator(llm_cfg, vit_cfg, gen_cfg, dtype=jnp.bfloat16)

    B, PROMPT, NEW = 8, 64, 256
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(B, 1, vit_cfg.temporal_size,
                                         vit_cfg.image_size, vit_cfg.image_size)),
                        jnp.float32)
    ids = jnp.asarray(rng.integers(1, llm_cfg.vocab_size, size=(B, PROMPT)), jnp.int32)
    mask = jnp.ones((B, PROMPT), jnp.int32)

    shapes = jax.eval_shape(lambda k: model.init(k, video, ids, mask), jax.random.key(0))
    hr = np.random.default_rng(0)
    params = jax.device_put(jax.tree.map(
        lambda x: jnp.asarray(hr.normal(0, 0.02, size=x.shape).astype(np.float32),
                              dtype=x.dtype), shapes))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
    log(f"params: {n_params/1e9:.2f}B")

    gen = jax.jit(lambda p, v, i, m, key: model.apply(
        p, v, i, m, NEW, eos_token_id=-1, temperature=0.7, rng=key,
        method=CTReportGenerator.generate))

    t0 = time.time()
    r = gen(params, video, ids, mask, jax.random.key(0))
    _ = np.asarray(r.tokens[:1, :1])
    log(f"compile+first: {time.time()-t0:.1f}s")

    t0 = time.time()
    for _ in range(5):
        _ = np.asarray(r.tokens[:1, :1])
    roundtrip = (time.time() - t0) / 5
    log(f"relay roundtrip: {roundtrip*1000:.1f} ms")

    RUNS = 3
    t0 = time.time()
    for k in range(RUNS):
        r = gen(params, video, ids, mask, jax.random.key(k + 1))
        _ = np.asarray(r.tokens[:1, :1])
    per = (time.time() - t0) / RUNS - roundtrip
    tput = B * NEW / per
    log(f"KV-cached decode: {per*1000:.0f} ms for {B}x{NEW} tokens")

    # reference decode shape: one full-prefix forward per generated token
    fwd = jax.jit(lambda p, v, i, m: model.apply(p, v, i, m))
    full_ids = jnp.concatenate([ids, jnp.zeros((B, NEW), jnp.int32)], axis=1)
    full_mask = jnp.ones((B, PROMPT + NEW), jnp.int32)
    lg = fwd(params, video, full_ids, full_mask)
    _ = np.asarray(lg[:1, :1, :1].astype(jnp.float32))
    t0 = time.time()
    for k in range(4):
        lg = fwd(params, video, full_ids + k, full_mask)
        _ = np.asarray(lg[:1, :1, :1].astype(jnp.float32))
    per_fwd = (time.time() - t0) / 4 - roundtrip
    ref_tput = B / per_fwd          # B tokens per full forward
    log(f"reference shape: {per_fwd*1000:.0f} ms per full-prefix forward")

    print(json.dumps({
        "metric": "report_decode_tokens_per_sec",
        "value": round(tput, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(tput / ref_tput, 1),
    }))


if __name__ == "__main__":
    main()
