"""On-chip A/B of patchify_project impl variants at shipped scale
(240x480x480 bf16, patch 10x20x20 -> dim 512), chained-dependency protocol
(the axon relay serves repeat (program, args) from cache and
block_until_ready measures dispatch only — chain each call's output into
the next call's input and fetch once; see docs in the verify skill)."""
import os, sys, time
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"
sys.path.insert(0, "/root/repo")
from ctpa.core.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import functools
import numpy as np
import jax, jax.numpy as jnp
from ctpa.ops.pallas.patchify import patchify_project

def log(*a): print(*a, flush=True)
log("devices:", jax.devices())

T, H, W = 240, 480, 480
pt, p1, p2, dim = 10, 20, 20, 512
rng = np.random.default_rng(0)
vol = jax.device_put(jnp.asarray(
    rng.normal(size=(T, H, W)).astype(np.float32), jnp.bfloat16))
g = jax.device_put(jnp.asarray(rng.normal(size=(pt * p1 * p2,)), jnp.float32))
K = jax.device_put(jnp.asarray(
    rng.normal(size=(pt * p1 * p2, dim)) * 0.02, jnp.float32))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30
impls = sys.argv[2].split(",") if len(sys.argv) > 2 else ["chunked", "linear"]

for impl in impls:
    @jax.jit
    def chain(v):
        out = patchify_project(v, g, K, pt, p1, p2, impl=impl)
        # dependency: fold a scalar of the output back into the next input
        return v + out[0, 0, 0, 0].astype(v.dtype) * jnp.asarray(1e-12, v.dtype)

    v = vol
    v = chain(v)
    _ = np.asarray(v[0, 0, :1])          # force first (compile) round trip
    t0 = time.time()
    for _ in range(N):
        v = chain(v)
    _ = np.asarray(v[0, 0, :1])
    dt = (time.time() - t0) / N
    log(f"patchify impl={impl}: {dt*1000:.2f} ms/volume (chained x{N})")
log("AB DONE")
