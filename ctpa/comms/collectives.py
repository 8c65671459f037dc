"""Collective helpers over the framework mesh axes.

The reference's entire communication layer is implicit DDP gradient all-reduce
via HF Accelerate (SURVEY.md §5.8).  Here collectives are explicit XLA ops that
compile into the program: `all_gather` of contrastive latents over the data
axis (the capability the reference was missing — its InfoNCE used local-batch
negatives only, ct_clip.py:845-878), `psum` for metric reduction, and host-side
process gating for writes.
"""

from __future__ import annotations


import jax

from ctpa.core.mesh import DATA_AXIS


def axis_present(axis: str) -> bool:
    """True if `axis` is bound in the current trace (inside shard_map/pjit with
    a mesh whose axis is mapped)."""
    try:
        jax.lax.axis_index(axis)
        return True
    except NameError:
        return False


def all_gather_batch(x: jax.Array, axis: str = DATA_AXIS, tiled: bool = True) -> jax.Array:
    """Gather local batch shards along the leading dim over `axis`.

    Used to build the global negative pool for the contrastive loss.  Rides ICI
    when `axis` maps to an intra-slice mesh dimension."""
    return jax.lax.all_gather(x, axis, axis=0, tiled=tiled)


def psum(x, axis: str = DATA_AXIS):
    return jax.lax.psum(x, axis)


def pmean(x, axis: str = DATA_AXIS):
    return jax.lax.pmean(x, axis)


def axis_index(axis: str = DATA_AXIS) -> jax.Array:
    return jax.lax.axis_index(axis)
