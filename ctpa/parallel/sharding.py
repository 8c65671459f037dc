"""Parameter sharding rules — tensor parallelism over the 'model' mesh axis.

The reference has no TP (SURVEY.md §2.4); this is new capability.  Rules are
path-pattern -> PartitionSpec maps consumed by `jax.jit` in_shardings: XLA
GSPMD then inserts the all-gathers/reduce-scatters, which ride ICI.

Megatron-style layout:
  * attention q/k/v and MLP up/gate: column-parallel (shard output dim)
  * attention out and MLP down:      row-parallel   (shard input dim)
  * the 294912->512 visual latent projection (150M params in the shipped
    config — SURVEY.md §7 hard part 5): shard the huge INPUT dim.
  * embeddings / norms / biases / scalars: replicated.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ctpa.core.mesh import MODEL_AXIS

# (path regex, PartitionSpec for 'kernel'-like 2D leaves)
_COLUMN = P(None, MODEL_AXIS)   # shard output features
_ROW = P(MODEL_AXIS, None)      # shard input features

CTCLIP_RULES: list[tuple[str, P]] = [
    (r"to_visual_latent/kernel", _ROW),
    (r"to_text_latent/kernel", _COLUMN),
    # BERT
    (r"attention_self/(query|key|value)/kernel", _COLUMN),
    (r"attention_output_dense/kernel", _ROW),
    (r"intermediate_dense/kernel", _COLUMN),
    (r"layer_\d+/output_dense/kernel", _COLUMN),
    # CTViT cosine attention + GEGLU FF
    (r"attn/to_(q|k|v)/kernel", _COLUMN),
    (r"attn/to_out/kernel", _ROW),
    (r"ff/Dense_0/kernel", _COLUMN),
    (r"ff/Dense_1/kernel", _ROW),
]

LLM_RULES: list[tuple[str, P]] = [
    (r"self_attn/(q_proj|k_proj|v_proj)/base/kernel", _COLUMN),
    (r"self_attn/o_proj/base/kernel", _ROW),
    (r"mlp/(gate_proj|up_proj)/kernel", _COLUMN),
    (r"mlp/down_proj/kernel", _ROW),
    (r"lm_head/kernel", _COLUMN),
]


def spec_for_path(path: str, rules: list[tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()


def _divisible(shape, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        if dim % mesh.shape[axis] != 0:
            return False
    return True


def param_shardings(
    params: Any, mesh: Mesh, rules: list[tuple[str, P]]
) -> Any:
    """Pytree of NamedSharding matching `params`.  Falls back to replication
    when a rule's axis does not divide the dim (tiny test configs)."""

    def assign(path, leaf):
        key = jax.tree_util.keystr(path, simple=True, separator="/")
        spec = spec_for_path(key, rules)
        if np.ndim(leaf) < 2 or not _divisible(np.shape(leaf), spec, mesh):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def clip_param_shardings(params: Any, mesh: Mesh) -> Any:
    return param_shardings(params, mesh, CTCLIP_RULES)


def llm_param_shardings(params: Any, mesh: Mesh) -> Any:
    return param_shardings(params, mesh, LLM_RULES + CTCLIP_RULES)


def kv_cache_shardings(cache: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a `ctpa.models.llm.KVCache` under tensor
    parallelism: the kv-head axis (axis 2 of the head-major k/v/scales,
    (L, b, kvh, m[, hd])) is sharded over the 'model' axis so each TP shard
    holds only its own heads' cache — with column-parallel k/v projections
    the per-head KV is computed shard-local, so cache reads/writes never
    cross ICI.  Falls back to replication when kv_heads does not divide the
    axis (tiny test configs, heavy GQA).

    `cache` may be a concrete KVCache or an eval_shape of one."""
    tp = mesh.shape[MODEL_AXIS]

    def head_sharded(x):
        if x is None:
            return None
        if x.ndim >= 4 and x.shape[2] % tp == 0:
            spec = [None] * x.ndim
            spec[2] = MODEL_AXIS
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    rep = NamedSharding(mesh, P())
    return type(cache)(
        k=head_sharded(cache.k), v=head_sharded(cache.v),
        write_offset=rep, true_len=rep, valid=rep,
        k_scale=head_sharded(cache.k_scale),
        v_scale=head_sharded(cache.v_scale),
    )
