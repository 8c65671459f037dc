"""Does executable serialization work over the axon relay, and does a cached
load skip the remote compile?  Run TWICE: the first invocation compiles and
serializes, the second should load from disk with no remote compile.

If the load path works, core/aot_cache.load_or_compile becomes the
cold-start story the persistent compilation cache cannot be on this backend
(the compile runs remotely at first execution — docs/ROUND3_NOTES.md)."""
import glob
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ctpa.core.aot_cache import _default_dir, load_or_compile

print("devices:", jax.devices(), file=sys.stderr)

def f(w1, w2, w3, x):
    h = jnp.tanh(x @ w1)
    h = jnp.tanh(h @ w2)
    return (h @ w3).sum()

rng = np.random.default_rng(0)
args = [jnp.asarray(rng.normal(size=(4096, 4096)) * 0.02, jnp.bfloat16)
        for _ in range(3)]
args.append(jnp.asarray(rng.normal(size=(128, 4096)), jnp.bfloat16))

entries_before = glob.glob(os.path.join(_default_dir(), "probe-*"))
t0 = time.time()
c = load_or_compile("probe", f, *args)
t1 = time.time()
val = float(np.asarray(c(*args)))          # fetch forces remote completion
t2 = time.time()
entries_after = glob.glob(os.path.join(_default_dir(), "probe-*"))
mode = "loaded-from-cache" if entries_before else (
    "compiled+serialized" if entries_after else "compiled (serialize FAILED)")
print(f'{{"probe": "aot_cache", "mode": "{mode}", '
      f'"compile_or_load_s": {t1 - t0:.2f}, "first_exec_s": {t2 - t1:.2f}, '
      f'"value": {val:.4e}}}')
