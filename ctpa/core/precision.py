"""Precision policy: fp32 params, bf16 activations/compute, fp32 loss.

TPU-native replacement for the reference's `accelerator.autocast()`
(CTCLIPTrainer.py:342) and ad-hoc bf16 weight loads (train_module.py:307-313).
On TPU the MXU natively consumes bf16; keeping params in fp32 and casting at
the boundary gives autocast semantics with deterministic optimizer state.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.output_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


def policy(name: str = "bf16") -> Policy:
    if name in ("bf16", "bfloat16", "mixed"):
        return Policy()
    if name in ("fp32", "float32", "full"):
        return Policy(compute_dtype=jnp.float32)
    raise ValueError(f"unknown precision policy {name!r}")
