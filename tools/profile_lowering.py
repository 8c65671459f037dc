"""Profile where `jax.jit(pipeline).lower()` spends its ~140 s (measured on
chip, round 4 — the dominant LOCAL component of every cold start; remote
compile is the rest).  Reconstructs bench.py's encode pipeline with
abstract (ShapeDtypeStruct) inputs — lowering never touches data, so no
device upload is needed — and cProfiles .lower(), printing the top
cumulative entries plus a by-module rollup.

Run on the axon box (the TPU lowering target must be registered):
    python tools/profile_lowering.py [--no-pallas]
--no-pallas lowers the same pipeline with pallas_patchify/flash_axial off,
isolating the Mosaic share (2.5 s total without them, round-4 probe).
"""

from __future__ import annotations

import argparse
import cProfile
import io
import pstats
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from ctpa.core.config import CTViTConfig, PreprocessConfig
    from ctpa.models.ctvit import CTViT
    from ctpa.ops.attention_ops import l2norm
    from ctpa.ops.preprocess import preprocess_volume
    from ctpa.ops.vq import vq_init

    print("devices:", jax.devices(), file=sys.stderr)
    vit_cfg = dataclasses.replace(
        CTViTConfig(),
        pallas_patchify=not args.no_pallas,
        flash_axial=not args.no_pallas,
    )
    pre_cfg = PreprocessConfig.train()
    model = CTViT(vit_cfg, dtype=jnp.bfloat16)
    vq_state = vq_init(jax.random.key(0), vit_cfg.codebook_size, vit_cfg.dim)
    spacing = jnp.asarray((2.0, 0.75, 0.75), jnp.float32)

    video_shape = jax.ShapeDtypeStruct((1, 1) + pre_cfg.target_shape, jnp.bfloat16)
    params_shape = jax.eval_shape(
        lambda k, v: model.init(k, v, None), jax.random.key(0), video_shape)
    raw_shape = jax.ShapeDtypeStruct((160, 512, 512), jnp.float32)
    w_shape = jax.ShapeDtypeStruct((24 * 24 * vit_cfg.dim, 512), jnp.bfloat16)

    def pipeline_fn(params, w_latent, vq_state, raw):
        video = preprocess_volume(raw, jnp.float32(1.0), jnp.float32(-1024.0),
                                  spacing, cfg=pre_cfg)
        tokens, _ = model.apply(params, video[None].astype(jnp.bfloat16), vq_state)
        pooled = tokens.mean(axis=1).reshape(tokens.shape[0], -1)
        return l2norm(pooled @ w_latent)[0]

    jitted = jax.jit(pipeline_fn)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    lowered = jitted.lower(params_shape, w_shape, vq_state, raw_shape)
    prof.disable()
    dt = time.time() - t0
    print(f"lower(): {dt:.1f}s  (pallas={'off' if args.no_pallas else 'on'})",
          file=sys.stderr)
    _ = lowered  # keep alive

    s = io.StringIO()
    st = pstats.Stats(prof, stream=s)
    st.sort_stats("cumulative").print_stats(args.top)
    print(s.getvalue())

    # by-module rollup of total time
    mod_tot: dict = {}
    for (fn_file, _line, _name), (cc, nc, tt, ct, callers) in prof.stats.items():
        parts = fn_file.replace("\\", "/").split("/")
        key = fn_file
        for anchor in ("site-packages", "dist-packages"):
            if anchor in parts:
                i = parts.index(anchor)
                key = "/".join(parts[i + 1:i + 3])
                break
        else:
            if "ctpa" in parts:
                key = "ctpa/" + parts[-1]
        mod_tot[key] = mod_tot.get(key, 0.0) + tt
    print("== tottime by module ==")
    for k, v in sorted(mod_tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v:9.2f}s  {k}")


if __name__ == "__main__":
    main()
