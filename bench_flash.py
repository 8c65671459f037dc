"""Microbenchmark: pallas flash attention vs XLA dense attention on the real
chip, at the geometries that matter here (VERDICT round-1 item #5):

  * fused : the full 13,824-token volumetric sequence, heads=8, dim_head=32
            (CTViT fused_attention mode)
  * axial : the spatial fold geometry, batch 24 slabs x 576 tokens
  * llm   : prefill-like geometry, 4 x 32 heads x 2048 tokens x dim 128

Relay-honest micro timing: the op is chained REPS times INSIDE one compiled
program (output feeds the next call's q), so one execution + one fetch
amortizes dispatch/scheduling; the roundtrip is subtracted from the whole
run.  (Per-call timing of <50 ms ops on the axon relay measures only the
~35-70 ms fetch latency — see .claude/skills/verify/SKILL.md.)"""

from __future__ import annotations

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
    import functools

    import jax
    import jax.numpy as jnp

    from ctpa.ops.pallas.flash_attention import flash_attention

    log("devices:", jax.devices())

    def xla_attn(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(q.shape[-1])
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v)

    def chained(fn, reps):
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                return fn(c, k, v), None
            out, _ = jax.lax.scan(body, q, None, length=reps)
            return out
        return run

    def measure(fn, q, k, v, reps, iters=3):
        run = chained(fn, reps)
        out = run(q, k, v)
        _ = np.asarray(out[:1, :1, :1, :1].astype(jnp.float32))  # compile+warm
        rts = []
        for _ in range(8):
            t0 = time.time()
            _ = np.asarray(out[:1, :1, :1, :1].astype(jnp.float32))
            rts.append(time.time() - t0)
        roundtrip = float(np.median(rts))
        samples = []
        for i in range(iters):
            qi = q + jnp.asarray(0.25 * (i + 1), q.dtype)   # bf16-visible delta
            t0 = time.time()
            o = run(qi, k, v)
            _ = np.asarray(o[:1, :1, :1, :1].astype(jnp.float32))
            samples.append((time.time() - t0 - roundtrip) / reps)
        return max(float(np.median(samples)), 1e-6)

    results = {}
    cases = {
        # name: (b, h, n, d, reps); "+flat" = the production cosine-attention
        # config (logit_bound flat-softmax path, models/attention.py)
        "fused": (1, 8, 13824, 32, 3),
        "fused+flat": (1, 8, 13824, 32, 3),
        "axial": (24, 8, 576, 32, 40),
        "axial+flat": (24, 8, 576, 32, 40),
        "llm":   (4, 32, 2048, 128, 20),
    }
    rng = np.random.default_rng(0)
    for name, (b, h, n, d, reps) in cases.items():
        if name.endswith("+flat"):
            # l2-normalized q/k so scale=8 is a true logit bound (cosine path)
            qh = rng.normal(size=(b, h, n, d))
            kh = rng.normal(size=(b, h, n, d))
            q = jnp.asarray(qh / np.linalg.norm(qh, axis=-1, keepdims=True),
                            jnp.bfloat16)
            k = jnp.asarray(kh / np.linalg.norm(kh, axis=-1, keepdims=True),
                            jnp.bfloat16)
            flash_fn = lambda q, k, v: flash_attention(
                q, k, v, scale=8.0, logit_bound=jnp.float32(8.0))
        else:
            q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
            k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
            flash_fn = lambda q, k, v: flash_attention(q, k, v)
        v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
        tf = measure(flash_fn, q, k, v, reps)
        log(f"{name}: flash {tf*1000:.3f} ms")
        if name.endswith("+flat"):
            results[name] = {"flash_ms": round(tf * 1000, 3)}
            continue
        try:
            tx = measure(xla_attn, q, k, v, max(reps // 4, 2) if name == "fused" else reps)
        except Exception as e:
            log("  xla dense failed:", type(e).__name__)
            tx = float("nan")
        log(f"{name}: xla  {tx*1000:.3f} ms")
        results[name] = {"flash_ms": round(tf * 1000, 3),
                         "xla_ms": round(tx * 1000, 3) if np.isfinite(tx) else None}

    print(json.dumps({"metric": "flash_attention_microbench", "cases": results}))


if __name__ == "__main__":
    main()
