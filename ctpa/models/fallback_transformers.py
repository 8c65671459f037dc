"""In-framework text/vision transformers — the reference CTCLIP's built-in
fallback towers (ct_clip.py:107-385), used when no external BERT/CTViT is
passed.  The shipped config always passes both externals, so these are
API-parity capability (SURVEY.md §2.1 'dead-but-API code'), kept small and
idiomatic: rotary text transformer with optional causal EOS pooling, 2D ViT
with PatchDropout."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from ctpa.ops.rotary import apply_rope, rope_frequencies


class PatchDropout(nn.Module):
    """Keep a random subset of tokens during training (ct_clip.py:129-146).
    Deterministic (eval) mode is identity."""

    prob: float = 0.5

    @nn.compact
    def __call__(self, x, rng: Optional[jax.Array] = None, deterministic: bool = True):
        if deterministic or self.prob <= 0.0:
            return x
        b, n, d = x.shape
        keep = max(1, int(n * (1.0 - self.prob)))
        rng = rng if rng is not None else self.make_rng("dropout")
        # per-batch independent random subset (ct_clip.py:140-144)
        def pick(key):
            return jax.random.permutation(key, n)[:keep]
        idx = jax.vmap(pick)(jax.random.split(rng, b))          # (b, keep)
        return jnp.take_along_axis(x, idx[..., None], axis=1)


class _Block(nn.Module):
    dim: int
    heads: int
    dim_head: int
    ff_mult: int = 4
    causal: bool = False
    use_rotary: bool = True

    @nn.compact
    def __call__(self, x, mask=None, positions=None):
        b, n, d = x.shape
        h, hd = self.heads, self.dim_head
        inner = h * hd
        y = nn.LayerNorm(name="attn_norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(y).reshape(b, n, h, hd)
        k = nn.Dense(inner, use_bias=False, name="to_k")(y).reshape(b, n, h, hd)
        v = nn.Dense(inner, use_bias=False, name="to_v")(y).reshape(b, n, h, hd)
        if self.use_rotary:
            cos, sin = rope_frequencies(hd, 4096)
            pos = positions if positions is not None else jnp.broadcast_to(
                jnp.arange(n)[None], (b, n))
            q = apply_rope(q, cos, sin, pos)
            k = apply_rope(k, cos, sin, pos)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                         preferred_element_type=jnp.float32) / jnp.sqrt(hd)
        neg = jnp.finfo(jnp.float32).min
        if mask is not None:
            sim = jnp.where(mask[:, None, None, :] > 0, sim, neg)
        if self.causal:
            i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            sim = jnp.where((j <= i)[None, None], sim, neg)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        x = x + nn.Dense(d, use_bias=False, name="to_out")(out)
        y = nn.LayerNorm(name="ff_norm")(x)
        y = nn.Dense(d * self.ff_mult, name="ff_in")(y)
        y = nn.gelu(y, approximate=False)   # torch F.gelu exact form
        return x + nn.Dense(d, name="ff_out")(y)


class TextTransformer(nn.Module):
    """Fallback text tower (ct_clip.py:204-285): token+abs-pos embeddings,
    rotary attention blocks, CLS prepend or causal EOS pooling."""

    dim: int = 512
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    vocab_size: int = 30522
    max_len: int = 512
    causal: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        b, n = input_ids.shape
        x = nn.Embed(self.vocab_size, self.dim, name="token_emb")(input_ids)
        pos = nn.Embed(self.max_len, self.dim, name="pos_emb")(jnp.arange(n))[None]
        x = x + pos
        if not self.causal:
            cls = self.param("cls_token", nn.initializers.normal(0.02), (self.dim,))
            x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
            if attention_mask is not None:
                attention_mask = jnp.concatenate(
                    [jnp.ones((b, 1), attention_mask.dtype), attention_mask], axis=1)
        for i in range(self.depth):
            x = _Block(self.dim, self.heads, self.dim_head, causal=self.causal,
                       name=f"block_{i}")(x, attention_mask)
        x = nn.LayerNorm(name="norm_out")(x)
        if self.causal:
            # EOS pooling: last real token (ct_clip.py:690-705)
            if attention_mask is None:
                pooled = x[:, -1]
            else:
                last = jnp.maximum(attention_mask.sum(-1) - 1, 0)
                pooled = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
        else:
            pooled = x[:, 0]
        return x, pooled


class VisionTransformer2D(nn.Module):
    """Fallback 2D ViT (ct_clip.py:288-385): patch embed, PatchDropout during
    training, attention blocks, mean pooling."""

    dim: int = 512
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    image_size: int = 256
    patch_size: int = 32
    channels: int = 3
    patch_dropout: float = 0.5

    @nn.compact
    def __call__(self, images, deterministic: bool = True,
                 rng: Optional[jax.Array] = None):
        p = self.patch_size
        x = rearrange(images, "b c (h p1) (w p2) -> b (h w) (c p1 p2)", p1=p, p2=p)
        x = nn.LayerNorm(name="patch_norm_in")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(name="patch_norm_out")(x)
        x = PatchDropout(self.patch_dropout, name="patch_dropout")(
            x, rng=rng, deterministic=deterministic)
        for i in range(self.depth):
            x = _Block(self.dim, self.heads, self.dim_head, use_rotary=False,
                       name=f"block_{i}")(x)
        x = nn.LayerNorm(name="norm_out")(x)
        return x, x.mean(axis=1)
