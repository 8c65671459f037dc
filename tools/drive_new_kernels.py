"""Mosaic lowering smoke for round-3 kernels on the real chip, tiny shapes:
int4_matmul, decode_attention (fp + int8-kv), and an end-to-end tiny
generate with ring batcher config knobs (kv_quant + flash_decode)."""
import os, sys, time
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"
sys.path.insert(0, "/root/repo")
from ctpa.core.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import dataclasses
import numpy as np
import jax, jax.numpy as jnp

def log(*a): print(*a, file=sys.stderr, flush=True)
log("devices:", jax.devices())

rng = np.random.default_rng(0)

# --- int4 matmul lowering + numerics vs xla
from ctpa.ops.quant import int4_matmul, quantize_int4
x = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(512, 384)) * 0.05, jnp.float32)
w4, s = quantize_int4(w, 128)
got = np.asarray(int4_matmul(x, w4, s, block_in=256, block_out=128).astype(jnp.float32))
want = np.asarray(int4_matmul(x, w4, s, impl="xla").astype(jnp.float32))
rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
log(f"int4_matmul pallas-vs-xla rel: {rel:.2e}")
assert rel < 2e-2, rel

# --- int4 fused FFN lowering + numerics vs xla
from ctpa.ops.quant import int4_ffn
hid, itr = 512, 768
xf = jnp.asarray(rng.normal(size=(8, hid)).astype(np.float32), jnp.bfloat16)
wg, sg = quantize_int4(jnp.asarray(rng.normal(size=(hid, itr)) * 0.05, jnp.float32))
wu, su = quantize_int4(jnp.asarray(rng.normal(size=(hid, itr)) * 0.05, jnp.float32))
wd, sd = quantize_int4(jnp.asarray(rng.normal(size=(itr, hid)) * 0.05, jnp.float32))
gotf = np.asarray(int4_ffn(xf, wg, sg, wu, su, wd, sd).astype(jnp.float32))
wantf = np.asarray(int4_ffn(xf, wg, sg, wu, su, wd, sd, impl="xla").astype(jnp.float32))
relf = np.abs(gotf - wantf).max() / (np.abs(wantf).max() + 1e-9)
log(f"int4_ffn pallas-vs-xla rel: {relf:.2e}")
assert relf < 3e-2, relf

# --- w4a8 fused FFN lowering + numerics vs xla
gotaf = np.asarray(int4_ffn(xf, wg, sg, wu, su, wd, sd,
                            act_quant=True).astype(jnp.float32))
wantaf = np.asarray(int4_ffn(xf, wg, sg, wu, su, wd, sd, impl="xla",
                             act_quant=True).astype(jnp.float32))
relaf = np.abs(gotaf - wantaf).max() / (np.abs(wantaf).max() + 1e-9)
log(f"int4_ffn w4a8 pallas-vs-xla rel: {relaf:.2e}")
assert relaf < 3e-2, relaf

# --- w4a8 matmul lowering + numerics vs xla
gota = np.asarray(int4_matmul(x, w4, s, block_in=256, block_out=128,
                              act_quant=True).astype(jnp.float32))
wanta = np.asarray(int4_matmul(x, w4, s, impl="xla",
                               act_quant=True).astype(jnp.float32))
rela = np.abs(gota - wanta).max() / (np.abs(wanta).max() + 1e-9)
log(f"int4 w4a8 pallas-vs-xla rel: {rela:.2e}")
assert rela < 2e-2, rela

# --- decode_attention lowering + numerics (fp and int8-kv)
from ctpa.ops.pallas.decode_attention import decode_attention
L, b, m, kvh, hd, h = 2, 4, 64, 8, 128, 8
q = jnp.asarray(rng.normal(size=(b, h, hd)).astype(np.float32), jnp.bfloat16)
valid = jnp.asarray(rng.random((b, m)) > 0.3).at[:, 0].set(True)

ck = jnp.asarray(rng.normal(size=(L, b, kvh, m, hd)).astype(np.float32), jnp.bfloat16)
cv = jnp.asarray(rng.normal(size=(L, b, kvh, m, hd)).astype(np.float32), jnp.bfloat16)
o1 = decode_attention(q, ck, cv, valid, 1, scale=0.088)
# xla reference
kf = np.asarray(ck[1], np.float32); vf = np.asarray(cv[1], np.float32)
sim = np.einsum("bhd,bhmd->bhm", np.asarray(q, np.float32), kf) * 0.088
sim = np.where(np.asarray(valid)[:, None, :], sim, -1e30)
e = np.exp(sim - sim.max(-1, keepdims=True)); e = np.where(np.asarray(valid)[:, None, :], e, 0)
a = e / np.maximum(e.sum(-1, keepdims=True), 1e-30)
ref = np.einsum("bhm,bhmd->bhd", a, vf)
rel = np.abs(np.asarray(o1, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
log(f"decode_attention fp rel: {rel:.2e}")
assert rel < 2e-2, rel

ck8 = jnp.asarray(rng.integers(-127, 128, size=(L, b, kvh, m, hd)), jnp.int8)
cv8 = jnp.asarray(rng.integers(-127, 128, size=(L, b, kvh, m, hd)), jnp.int8)
ks = jnp.asarray(rng.random((L, b, kvh, m)).astype(np.float32) * 0.01 + 1e-3)
vs = jnp.asarray(rng.random((L, b, kvh, m)).astype(np.float32) * 0.01 + 1e-3)
o2 = decode_attention(q, ck8, cv8, valid, 0, k_scale=ks, v_scale=vs, scale=0.088)
kf = np.asarray(ck8[0], np.float32) * np.asarray(ks[0])[..., None]
vf = np.asarray(cv8[0], np.float32) * np.asarray(vs[0])[..., None]
sim = np.einsum("bhd,bhmd->bhm", np.asarray(q, np.float32), kf) * 0.088
sim = np.where(np.asarray(valid)[:, None, :], sim, -1e30)
e = np.exp(sim - sim.max(-1, keepdims=True)); e = np.where(np.asarray(valid)[:, None, :], e, 0)
a = e / np.maximum(e.sum(-1, keepdims=True), 1e-30)
ref = np.einsum("bhm,bhmd->bhd", a, vf)
rel = np.abs(np.asarray(o2, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
log(f"decode_attention int8-kv rel: {rel:.2e}")
assert rel < 2e-2, rel

# --- tiny end-to-end generate on chip with kv_quant + flash_decode
from ctpa.core.config import CTViTConfig, LLMConfig, ReportGenConfig
from ctpa.models.report_generator import CTReportGenerator
llm_cfg = dataclasses.replace(LLMConfig.tiny(), kv_quant="int8",
                              flash_decode=True)
vit_cfg = CTViTConfig.tiny()
model = CTReportGenerator(llm_cfg, vit_cfg, ReportGenConfig(vision_dim=128),
                          dtype=jnp.bfloat16)
video = jnp.zeros((2, 1, vit_cfg.temporal_size, vit_cfg.image_size,
                   vit_cfg.image_size), jnp.float32)
ids = jnp.asarray(rng.integers(1, llm_cfg.vocab_size, size=(2, 8)), jnp.int32)
mask = jnp.ones((2, 8), jnp.int32)
params = jax.jit(lambda k: model.init(k, video, ids, mask))(jax.random.key(0))
t0 = time.time()
res = jax.jit(lambda p, v, i, m: model.apply(
    p, v, i, m, 12, eos_token_id=-1, greedy=True,
    method=CTReportGenerator.generate))(params, video, ids, mask)
toks = np.asarray(res.tokens)
log(f"tiny generate (kv int8 + flash_decode) on chip: tokens {toks.shape} "
    f"({time.time()-t0:.0f}s) sample {toks[0][:6]}")
assert toks.shape == (2, 12)
log("ALL KERNELS OK ON CHIP")
