"""LoRA — low-rank adaptation as a first-class framework primitive.

Replaces the reference's `peft.get_peft_model` usage (vqa_meditron.py:432-437
r=8 α=16 on q,v; train_module.py:330-336 r=16 α=32 on q,v,k,o;
vqa.py:359-366 BERT q,k,v).  Here LoRA is a linen module wrapping any Dense
projection: out = W x + (alpha/rank) * (x A) B, with A ~ N(0, 1/r), B = 0 so
the overlay starts as identity.  Trainable-parameter masking for the optimizer
is path-based (`lora_trainable_mask`) — the frozen base weights stay in the
same pytree, so checkpointing and weight import are uniform.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class LoRADense(nn.Module):
    """Dense layer with optional LoRA overlay.  rank=0 -> plain Dense."""

    features: int
    rank: int = 0
    alpha: float = 1.0
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="base")(x)
        if self.rank > 0:
            a = self.param("lora_a", nn.initializers.normal(1.0 / self.rank),
                           (x.shape[-1], self.rank), jnp.float32)
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.rank, self.features), jnp.float32)
            scale = self.alpha / self.rank
            y = y + (x @ a.astype(x.dtype)) @ b.astype(x.dtype) * scale
        return y


def lora_trainable_mask(params: Any, extra_trainable: tuple[str, ...] = ()) -> Any:
    """True for LoRA params (lora_a/lora_b) and any path containing one of
    `extra_trainable` (e.g. 'cross_attention'); False for frozen base weights.
    Feed to optax.masked so frozen params get zero updates."""

    def label(path, _):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        # matches both the LoRADense layout (.../lora_a) and the BERT in-place
        # layout (.../query_lora_a) — see BertSelfAttention
        if any(str(n).endswith(("lora_a", "lora_b")) for n in names):
            return True
        return any(any(t in str(n) for n in names) for t in extra_trainable)

    return jax.tree_util.tree_map_with_path(label, params)


def merge_lora_scaled(params: Any, alpha: float, rank: int) -> Any:
    """Return params with kernels = W + (alpha/rank) A@B and zeroed LoRA (so
    the module graph is unchanged but the overlay is a no-op)."""
    scale = alpha / rank

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if "lora_a" in tree and "lora_b" in tree and "base" in tree:
            merged = dict(tree["base"])
            merged["kernel"] = tree["base"]["kernel"] + scale * (tree["lora_a"] @ tree["lora_b"])
            return {
                "base": merged,
                "lora_a": jnp.zeros_like(tree["lora_a"]),
                "lora_b": jnp.zeros_like(tree["lora_b"]),
            }
        return {k: walk(v) for k, v in tree.items()}

    return walk(params)
