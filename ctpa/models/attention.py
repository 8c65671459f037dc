"""Transformer blocks for the CTViT tower (flax.linen).

Functional parity with the reference attention lib (ct_clip/attention.py):
bias-free LayerNorm, GEGLU feed-forward, PEG depthwise-conv positional
encoding, QK-l2norm cosine attention with learned scales + null KV, optional
ContinuousPositionBias / ALiBi biases, pre-norm residual wiring
(attention.py:280-333).  Architecture is re-expressed in idiomatic JAX: pure
modules, static shapes, `jax.checkpoint`-able blocks.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctpa.ops.attention_ops import (
    continuous_position_bias_grid,
    cosine_attention,
    l2norm,
    merge_heads,
    peg_conv3d,
    split_heads,
)


class LayerNorm(nn.Module):
    """Gamma-only LayerNorm (no bias, no beta) — attention.py:31-39."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        g = self.param("gamma", nn.initializers.ones, (dim,), jnp.float32)
        y = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype)(x)
        return y * g.astype(y.dtype)


class GEGLU(nn.Module):
    """x * gelu(gate) feed-forward gate — attention.py:42-47."""

    @nn.compact
    def __call__(self, x):
        x, gate = jnp.split(x, 2, axis=-1)
        # torch F.gelu defaults to the exact erf form (attention.py:44)
        return x * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.dim * self.mult * 2 / 3)   # attention.py:45 GEGLU sizing
        # the reference FF uses torch nn.LayerNorm (scale+bias), unlike the
        # gamma-only LayerNorm used around attention (attention.py:46-47)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="proj_in")(x)
        x = GEGLU()(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="proj_out")(x)


class PEG(nn.Module):
    """Depthwise 3D conv positional encoding, residual (attention.py:56-84).

    PEG convolves over the FULL (t, h, w) token grid, reconstructing it from
    whichever axial fold the caller is in (spatial: (b*t, h*w, d); temporal:
    (b*h*w, t, d)).  DELIBERATE DIVERGENCE from the reference: attention.py's
    PEG reshapes the temporal fold (b*h*w, t, d) directly to (b, t, h, w, d),
    which scrambles the grid (row-major mismatch); here the temporal fold is
    correctly transposed back so the conv sees the true 3D neighborhood.
    """

    dim: int
    causal: bool = True
    # reproduce the reference's temporal-fold scramble for imported
    # checkpoints (see CTViTConfig.peg_reference_layout)
    reference_layout: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, shape3d: tuple[int, int, int], fold: str = "full"):
        t, h, w = shape3d
        B, n, d = x.shape
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02), (3, 3, 3, 1, self.dim), jnp.float32
        )
        conv_bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        if fold == "spatial":       # (b*t, h*w, d)
            b = B // t
            grid = x.reshape(b, t, h, w, d)
        elif fold == "temporal":    # (b*h*w, t, d)
            b = B // (h * w)
            if self.reference_layout:
                # reference scramble: flat (b*h*w, t) elements reinterpreted
                # row-major as (b, t, h, w) — attention.py:69 x.reshape(*shape)
                grid = x.reshape(b, t, h, w, d)
            else:
                grid = x.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)
        else:                       # (b, t*h*w, d)
            b = B
            grid = x.reshape(b, t, h, w, d)
        out = grid + peg_conv3d(grid, kernel.astype(self.dtype), causal=self.causal) \
            + conv_bias.astype(self.dtype)
        if fold == "spatial":
            return out.reshape(B, n, d)
        if fold == "temporal":
            if self.reference_layout:
                return out.reshape(B, n, d)
            return out.transpose(0, 2, 3, 1, 4).reshape(B, n, d)
        return out.reshape(B, n, d)


class CosineAttention(nn.Module):
    """Multi-head attention with QK l2-norm, learned (dim_head,) q/k scales
    shared across heads, and optional learned null key/values — exact
    reference geometry (attention.py:88-181: num_null_kv defaults to 0 for the
    CTViT self-attention; the fused to_kv projection is kept fused so
    checkpoint import is a plain split)."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    scale: float = 8.0
    causal: bool = False
    num_null_kv: int = 0
    norm_context: bool = True
    # True projects self-attention K/V from the LayerNormed input instead of
    # the reference's un-normalized quirk (see __call__) — the compat switch
    # for ctpa checkpoints trained before the parity fix (round 3), mirroring
    # CTViTConfig.peg_reference_layout's role for imported torch weights.
    kv_from_normed: bool = False
    dropout: float = 0.0
    use_flash: bool = False   # pallas flash kernel for long fused sequences
    # context parallelism: shard the fused sequence over cp_axis of cp_mesh
    # (parallel/context.py) — only meaningful with use_flash on long folds
    cp_mesh: Optional[object] = None
    cp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        context: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        bias: Optional[jax.Array] = None,
    ):
        inner = self.heads * self.dim_head
        # Reference quirk (attention.py:136-143): `kv_input = default(context,
        # x)` is taken BEFORE `x = self.norm(x)`, so self-attention K/V are
        # projected from the UN-normalized input while Q sees the pre-norm.
        # Preserved exactly — imported reference checkpoints depend on it
        # (oracle-verified in tests/test_reference_oracle.py).
        raw = x
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        if context is not None:
            kv_in = (LayerNorm(dtype=self.dtype, name="context_norm")(context)
                     if self.norm_context else context)
        else:
            kv_in = x if self.kv_from_normed else raw

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = (split_heads(t, self.heads) for t in (q, k, v))

        q_scale = self.param("q_scale", nn.initializers.ones, (self.dim_head,), jnp.float32)
        k_scale = self.param("k_scale", nn.initializers.ones, (self.dim_head,), jnp.float32)
        null_kv = None
        if self.num_null_kv > 0:
            null_kv = self.param(
                "null_kv", nn.initializers.normal(1.0),
                (2, self.heads, self.num_null_kv, self.dim_head), jnp.float32,
            ).astype(self.dtype)

        if self.use_flash and mask is None and null_kv is None:
            # O(n)-memory exact attention for the fused volumetric sequence:
            # l2norm+scale happen here, the kernel sees plain q/k with a fixed
            # softmax temperature (optionally with an additive bias).
            from ctpa.ops.pallas.flash_attention import flash_attention

            qn = (l2norm(q) * q_scale).astype(self.dtype)
            kn = (l2norm(k) * k_scale).astype(self.dtype)
            # cosine attention has analytically bounded logits:
            # |s| <= scale * ||l2norm(q) o qs|| * ||l2norm(k) o ks||
            #     <= scale * max|qs| * max|ks|  (+ max bias) — this unlocks
            # the kernel's flat-softmax fast path (one VPU pass per tile)
            bound = (self.scale * jnp.max(jnp.abs(q_scale))
                     * jnp.max(jnp.abs(k_scale))).astype(jnp.float32)
            if bias is not None:
                bound = bound + jnp.max(bias).astype(jnp.float32)
            if self.cp_mesh is not None and not self.causal:
                from ctpa.parallel.context import context_parallel_attention

                out = context_parallel_attention(
                    qn, kn, v, self.cp_mesh, self.cp_axis, bias=bias,
                    scale=self.scale, impl="flash", logit_bound=bound)
            else:
                out = flash_attention(qn, kn, v, bias=bias, causal=self.causal,
                                      scale=self.scale, logit_bound=bound)
        else:
            out = cosine_attention(
                q, k, v,
                q_scale=q_scale.astype(jnp.float32),
                k_scale=k_scale.astype(jnp.float32),
                null_kv=null_kv,
                scale=self.scale,
                bias=bias,
                mask=mask,
                causal=self.causal,
            )
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(merge_heads(out))


class ContinuousPositionBias(nn.Module):
    """MLP over signed-log relative positions of the 2D token grid
    (attention.py:229-276); produces an (heads, n, n) additive bias."""

    dim: int = 512
    heads: int = 8
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, height: int, width: int):
        rel = continuous_position_bias_grid(height, width).astype(self.dtype)
        h = rel
        for i in range(self.num_layers):
            h = nn.Dense(self.dim, dtype=self.dtype, name=f"mlp_{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.1)   # attention.py:19-20
        h = nn.Dense(self.heads, dtype=self.dtype, name="to_heads")(h)
        return jnp.transpose(h, (2, 0, 1))   # (heads, n, n)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    ff_mult: int = 4
    causal: bool = False
    cross_attend: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    use_flash: bool = False
    kv_from_normed: bool = False
    cp_mesh: object = None
    cp_axis: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, bias=None, deterministic=True):
        x = x + CosineAttention(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            causal=self.causal, dropout=self.attn_dropout, dtype=self.dtype,
            use_flash=self.use_flash, kv_from_normed=self.kv_from_normed,
            cp_mesh=self.cp_mesh,
            cp_axis=self.cp_axis, name="attn",
        )(x, mask=mask, bias=bias)
        if self.cross_attend:
            # cross-attention carries 2 null kv pairs (attention.py:305)
            x = x + CosineAttention(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                num_null_kv=2, dropout=self.attn_dropout, dtype=self.dtype,
                name="cross_attn",
            )(x, context=context)
        x = x + FeedForward(
            dim=self.dim, mult=self.ff_mult, dropout=self.ff_dropout,
            dtype=self.dtype, name="ff",
        )(x, deterministic=deterministic)
        return x


class Transformer(nn.Module):
    """Pre-norm transformer stack with optional PEG after the first block and a
    final LayerNorm (attention.py:280-333).  ``peg_shape_from_call``: the 3D
    grid shape is passed at call time so the same stack serves spatial
    (b*t, h*w, d) and temporal (b*h*w, t, d) folds."""

    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 32
    ff_mult: int = 4
    causal: bool = False
    cross_attend: bool = False
    peg: bool = False
    peg_causal: bool = True
    peg_reference_layout: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    remat: bool = False
    use_flash: bool = False
    kv_from_normed: bool = False
    cp_mesh: object = None
    cp_axis: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, shape3d=None, fold="full", context=None, mask=None, bias=None, deterministic=True):
        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(5,))
        for i in range(self.depth):
            if self.peg:
                # reference applies PEG in EVERY layer (attention.py:302-324)
                x = PEG(dim=self.dim, causal=self.peg_causal,
                        reference_layout=self.peg_reference_layout,
                        dtype=self.dtype, name=f"peg_{i}")(x, shape3d, fold)
            x = block_cls(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                ff_mult=self.ff_mult, causal=self.causal,
                cross_attend=self.cross_attend, attn_dropout=self.attn_dropout,
                ff_dropout=self.ff_dropout, use_flash=self.use_flash,
                kv_from_normed=self.kv_from_normed,
                cp_mesh=self.cp_mesh, cp_axis=self.cp_axis,
                dtype=self.dtype, name=f"block_{i}",
            )(x, context, mask, bias, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)
