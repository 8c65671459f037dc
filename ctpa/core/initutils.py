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

    cache = {}

    def gen(shape, dtype, fmt):
        # cache key by the format's string form: Format instances are distinct
        # per leaf but layouts repeat per (shape, dtype)
        key = (shape, str(dtype), str(fmt))
        if key not in cache:
            if jnp.issubdtype(dtype, jnp.floating) or jnp.issubdtype(dtype, jnp.complexfloating):
                f = lambda k: jax.random.normal(k, shape, dtype) * jnp.asarray(scale, dtype)
            else:                       # int/bool leaves (counters, masks)
                f = lambda k: jnp.zeros(shape, dtype)
            cache[key] = jax.jit(f, out_shardings=fmt) if fmt is not None else jax.jit(f)
        return cache[key]

    leaves, treedef = jax.tree.flatten(shapes)
    fmt_leaves = jax.tree.leaves(formats) if formats is not None else [None] * len(leaves)
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
        out.append(arr)
    return jax.tree.unflatten(treedef, out)
