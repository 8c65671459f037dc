"""Parameter-tree materialization helpers.

`device_params` builds a random parameter pytree DIRECTLY on the accelerator:
one tiny jitted generator per distinct (shape, dtype), one dispatch per leaf.
This matters in two places:

  * benches/serving bring-up at 7B scale — a host-side init would both spike
    host RAM and push ~14 GB through the host->device link (the axon relay
    tunnel moves ~60 MB/s: minutes of wall clock for numbers that prove
    nothing);
  * flax stores params in fp32 regardless of compute dtype, so `force_dtype`
    exists to hold large LLM trees in bf16 — exactly how the reference loads
    Meditron-7B (train_module.py:307-313, `torch_dtype=torch.bfloat16`).
"""

from __future__ import annotations

import functools


def device_params(shapes, scale: float = 0.02, force_dtype=None, formats=None):
    """Materialize a pytree of `jax.ShapeDtypeStruct`s (from `jax.eval_shape`
    over `model.init`) as on-device N(0, scale) arrays.

    force_dtype: override FLOAT leaf dtypes (int leaves keep theirs).
    formats: optional matching pytree of `jax.experimental.layout.Format`
    (e.g. a compiled executable's negotiated `input_formats`) — each leaf is
    generated DIRECTLY into that layout, so a multi-GB tree never needs
    in-program layout-conversion copies (at 7B those copies alone are ~3.4 GB
    and blow HBM)."""
    import jax
    import jax.numpy as jnp

    import zlib

    cache = {}

    def gen(shape, dtype, fmt):
        # cache key by the format's string form: Format instances are distinct
        # per leaf but layouts repeat per (shape, dtype)
        key = (shape, str(dtype), str(fmt))
        if key not in cache:
            # Salt the program text with the requested format (a fold_in
            # constant embeds in the HLO) so two same-(shape, dtype) leaves
            # with DIFFERENT negotiated layouts never share an HLO module.
            # Root cause (round 4, on chip): a compiled-program cache that
            # keys on the HLO without the exit-layout directive serves the
            # first-compiled layout's executable for both — observed as
            # out_shardings=(1,0) returning a (0,1) array for the exact
            # (shape, dtype) another leaf had already generated as (0,1),
            # while fresh-process single-leaf probes honored every request.
            # Values are N(0, scale) randoms either way; the salt only
            # decorrelates leaves, which is fine for bench/serving bring-up.
            salt = zlib.crc32(str(fmt).encode()) & 0x7FFFFFFF
            if jnp.issubdtype(dtype, jnp.floating) or jnp.issubdtype(dtype, jnp.complexfloating):
                f = lambda k: jax.random.normal(
                    jax.random.fold_in(k, salt), shape, dtype
                ) * jnp.asarray(scale, dtype)
            else:                       # int/bool leaves (counters, masks)
                f = lambda k: jnp.zeros(shape, dtype) + (
                    jnp.asarray(salt, jnp.int32) * 0).astype(dtype)
            cache[key] = jax.jit(f, out_shardings=fmt) if fmt is not None else jax.jit(f)
        return cache[key]

    import sys

    leaves, treedef = jax.tree.flatten(shapes)
    if formats is not None:
        fmt_leaves = jax.tree.leaves(formats)
        if len(fmt_leaves) != len(leaves):
            raise ValueError(
                f"formats tree has {len(fmt_leaves)} leaves but shapes has "
                f"{len(leaves)} — misaligned zip would scatter layouts "
                "across the wrong leaves")
    else:
        fmt_leaves = [None] * len(leaves)
    out = []
    for i, (leaf, fmt) in enumerate(zip(leaves, fmt_leaves)):
        dt = leaf.dtype
        if force_dtype is not None and jnp.issubdtype(dt, jnp.floating):
            dt = force_dtype
        arr = gen(tuple(leaf.shape), dt, fmt)(jax.random.key(i))
        # Some PJRT backends (the axon relay among them) ignore requested
        # OUTPUT layouts, so a leaf whose negotiated layout is non-default
        # comes back default and the AOT executable rejects it at call time.
        # Detect and fix with an explicit on-device relayout copy (transient
        # cost: one leaf, not the whole tree).
        if fmt is not None:
            want = getattr(fmt, "layout", None)
            have = getattr(getattr(arr, "format", None), "layout", None)
            if want is not None and have is not None and want != have:
                arr = jax.device_put(arr, fmt)
                have2 = getattr(getattr(arr, "format", None), "layout", None)
                if have2 != want:
                    raise RuntimeError(
                        f"device_params: leaf {i} {leaf.shape}/{dt} could "
                        f"not be materialized in the negotiated layout: "
                        f"want {want}, generator gave {have}, device_put "
                        f"retry gave {have2}.  The AOT executable would "
                        f"reject this tree at call time.  If a persistent "
                        f"compilation cache is enabled, a stale entry keyed "
                        f"without exit layouts can cause this — clear it "
                        f"and retry.")
            elif want is not None and have is None:
                print(f"device_params: leaf {i} {leaf.shape}/{dt}: array "
                      f"format unavailable (want {want}) — cannot verify",
                      file=sys.stderr)
        out.append(arr)
    return jax.tree.unflatten(treedef, out)
