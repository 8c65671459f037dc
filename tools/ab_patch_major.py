"""On-chip A/B: patch-major producer layout for the patch embed.

The round-3 roofline work (docs/benchmarks.md) showed the pallas patchify
kernel is DMA-descriptor-bound at 2.3 ms/volume because the (..., p2=20)
minor-dim granule forces strided descriptors, and that a same-program
relayout ('linear' impl) loses.  The remaining idea: make the PRODUCER
(the resample, itself three MXU matmuls) emit patch-major tokens, so the
patch embed becomes reshape + one dense (13824, 4000) x (4000, 512) dot
with 4000->4096 lane padding (1.02x) instead of 20->128 (6.4x).

Timed at the FUSED-program level (resample + windowing + patch embed
through the projection), chained-dependency protocol (verify skill):

  A  resample -> pallas patchify (production: pallas_patchify=True)
  B  resample -> 6D transpose to patch-major -> LN -> dot (XLA)
  C  resample emits split patch axes via 6D interp einsums -> LN -> dot
  D  (reference) pm transpose + dot alone, no resample
"""
import os, sys, time

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"
sys.path.insert(0, "/root/repo")
from ctpa.core.compilation_cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np
import jax, jax.numpy as jnp

from ctpa.core.config import PreprocessConfig
from ctpa.ops.preprocess import hu_window, _interp_matrix
from ctpa.ops.pallas.patchify import patchify_project


def log(*a):
    print(*a, flush=True)


log("devices:", jax.devices())

RAW = (160, 512, 512)
SPACING = (2.0, 0.75, 0.75)
cfg = PreprocessConfig.train()
TD, TH, TW = cfg.target_shape
pt, p1, p2, dim = 10, 20, 20, 512
T, Hp, Wp = TD // pt, TH // p1, TW // p2
pd = pt * p1 * p2

rng = np.random.default_rng(0)
raw = jax.device_put(jnp.asarray(
    rng.normal(size=RAW).astype(np.float32) * 200.0))
spacing = jax.device_put(jnp.asarray(SPACING, jnp.float32))
g = jax.device_put(jnp.asarray(rng.normal(size=(pd,)), jnp.float32))
K = jax.device_put(jnp.asarray(rng.normal(size=(pd, dim)) * 0.02, jnp.float32))

cdt = jnp.bfloat16


def resample(x):
    d, h, w = x.shape
    nd = (d * (spacing[0] / cfg.target_spacing[0])).astype(jnp.int32)
    nh = (h * (spacing[1] / cfg.target_spacing[1])).astype(jnp.int32)
    nw = (w * (spacing[2] / cfg.target_spacing[2])).astype(jnp.int32)
    wd, vd = _interp_matrix(d, nd, TD)
    wh, vh = _interp_matrix(h, nh, TH)
    ww, vw = _interp_matrix(w, nw, TW)
    y = jnp.einsum("Dd,dhw->Dhw", wd, x, preferred_element_type=jnp.float32)
    y = jnp.einsum("Hh,Dhw->DHw", wh, y, preferred_element_type=jnp.float32)
    y = jnp.einsum("Ww,DHw->DHW", ww, y, preferred_element_type=jnp.float32)
    y = hu_window(y, cfg)
    valid = vd[:, None, None] & vh[None, :, None] & vw[None, None, :]
    return jnp.where(valid, y, cfg.pad_value)


def resample_pm6(x):
    """Same resample, but the three interp matrices carry split patch axes so
    the LAST einsum emits (T, Hp, Wp, pt, p1, p2) directly."""
    d, h, w = x.shape
    nd = (d * (spacing[0] / cfg.target_spacing[0])).astype(jnp.int32)
    nh = (h * (spacing[1] / cfg.target_spacing[1])).astype(jnp.int32)
    nw = (w * (spacing[2] / cfg.target_spacing[2])).astype(jnp.int32)
    wd, vd = _interp_matrix(d, nd, TD)
    wh, vh = _interp_matrix(h, nh, TH)
    ww, vw = _interp_matrix(w, nw, TW)
    wd6 = wd.reshape(T, pt, d)
    wh6 = wh.reshape(Hp, p1, h)
    ww6 = ww.reshape(Wp, p2, w)
    y = jnp.einsum("Tad,dhw->Tahw", wd6, x, preferred_element_type=jnp.float32)
    y = jnp.einsum("Hbh,Tahw->TaHbw", wh6, y, preferred_element_type=jnp.float32)
    y = jnp.einsum("Wcw,TaHbw->THWabc", ww6, y,
                   preferred_element_type=jnp.float32)
    y = hu_window(y, cfg)
    valid = (vd.reshape(T, pt)[:, None, None, :, None, None]
             & vh.reshape(Hp, p1)[None, :, None, None, :, None]
             & vw.reshape(Wp, p2)[None, None, :, None, None, :])
    return jnp.where(valid, y, cfg.pad_value)       # (T, Hp, Wp, pt, p1, p2)


def ln_dot(tokens_pm):
    """tokens_pm (T, Hp, Wp, pd) fp32 -> LN(scale folded) -> bf16 dot."""
    mean = tokens_pm.mean(axis=-1, keepdims=True)
    var = tokens_pm.var(axis=-1, keepdims=True)
    xhat = (tokens_pm - mean) * jax.lax.rsqrt(var + 1e-5)
    return (xhat * g).astype(cdt) @ K.astype(cdt)


def variant_a(x):
    vol = resample(x).astype(cdt)
    return patchify_project(vol, g, K, pt, p1, p2)


def variant_b(x):
    vol = resample(x)
    pm = vol.reshape(T, pt, Hp, p1, Wp, p2).transpose(0, 2, 4, 1, 3, 5)
    return ln_dot(pm.reshape(T, Hp, Wp, pd))


def variant_c(x):
    pm = resample_pm6(x)
    return ln_dot(pm.reshape(T, Hp, Wp, pd))


vol_only = jax.jit(lambda x: resample(x).astype(cdt))


def variant_d(vol):
    pm = (vol.astype(jnp.float32)
          .reshape(T, pt, Hp, p1, Wp, p2).transpose(0, 2, 4, 1, 3, 5))
    return ln_dot(pm.reshape(T, Hp, Wp, pd))


N = int(sys.argv[1]) if len(sys.argv) > 1 else 30
which = sys.argv[2].split(",") if len(sys.argv) > 2 else ["a", "b", "c", "d"]
fns = {"a": variant_a, "b": variant_b, "c": variant_c, "d": variant_d}

vol0 = vol_only(raw)
_ = np.asarray(vol0[0, 0, :1])

for name in which:
    fn = fns[name]
    inp = vol0 if name == "d" else raw

    @jax.jit
    def chain(v, fn=fn):
        out = fn(v)
        return v + out[0, 0, 0, 0].astype(v.dtype) * jnp.asarray(1e-12, v.dtype)

    v = inp
    v = chain(v)
    _ = np.asarray(v[0, 0, :1])          # compile + first
    t0 = time.time()
    for _ in range(N):
        v = chain(v)
    _ = np.asarray(v[0, 0, :1])
    dt = (time.time() - t0) / N
    log(f"variant {name}: {dt*1000:.2f} ms (chained x{N})")
log("AB DONE")
