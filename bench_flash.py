"""Microbenchmark: pallas flash attention vs XLA dense attention on the real
chip, at the two geometries that matter here (VERDICT round-1 item #5):

  * fused : the full 13,824-token volumetric sequence, heads=8, dim_head=32
            (CTViT fused_attention mode; round-1 kernel measured ~300 ms)
  * axial : the spatial fold geometry, batch 24 slabs x 576 tokens
            (the XLA path this kernel was measured losing to: 26.9 vs 14.2 ms
            whole-encode; here we time just the attention core)
  * llm   : prefill-like geometry, 4 x 32 heads x 2048 tokens x dim 128
            (where flash attention should shine: no n^2 HBM materialization)

Honest relay timing per bench.py: chained perturbation, forced fetch,
roundtrip subtracted."""

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


def time_fn(fn, args, iters=7):
    import jax

    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    first = np.asarray(jax.tree.leaves(out)[0][:1]).ravel()[:1]

    rts = []
    for _ in range(10):
        t0 = time.time()
        _ = np.asarray(jax.tree.leaves(out)[0][:1])
        rts.append(time.time() - t0)
    roundtrip = float(np.median(rts))

    samples = []
    for i in range(iters):
        import jax.numpy as jnp
        a0 = args[0] + jnp.asarray(1e-3 * (i + 1), args[0].dtype)
        t0 = time.time()
        o = fn(a0, *args[1:])
        _ = np.asarray(jax.tree.leaves(o)[0][:1])
        samples.append(time.time() - t0 - roundtrip)
    return max(float(np.median(samples)), 1e-5)


def main():
    import jax
    import jax.numpy as jnp

    from ctpa.ops.pallas.flash_attention import flash_attention

    log("devices:", jax.devices())

    def xla_attn(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(q.shape[-1])
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    xla_j = jax.jit(xla_attn)
    flash_j = jax.jit(lambda q, k, v: flash_attention(q, k, v))

    results = {}
    cases = {
        # (b, h, n, d)
        "fused": (1, 8, 13824, 32),
        "axial": (24, 8, 576, 32),
        "llm":   (4, 32, 2048, 128),
    }
    rng = np.random.default_rng(0)
    for name, (b, h, n, d) in cases.items():
        q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
        tf = time_fn(flash_j, (q, k, v))
        log(f"{name}: flash {tf*1000:.2f} ms")
        if name == "fused":
            # XLA dense at 13,824 tokens materializes an (8, n, n) fp32 score
            # tensor (6.1 GB): measured anyway for the record, if it fits
            try:
                tx = time_fn(xla_j, (q, k, v), iters=3)
            except Exception as e:
                log("  xla dense failed:", type(e).__name__)
                tx = float("nan")
        else:
            tx = time_fn(xla_j, (q, k, v))
        log(f"{name}: xla  {tx*1000:.2f} ms")
        results[name] = {"flash_ms": round(tf * 1000, 2),
                         "xla_ms": round(tx * 1000, 2) if np.isfinite(tx) else None}

    print(json.dumps({"metric": "flash_attention_microbench", "cases": results}))


if __name__ == "__main__":
    main()
