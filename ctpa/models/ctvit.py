"""CTViT — factorized spatial/temporal 3D vision transformer with a
vector-quantized bottleneck, TPU-native.

Capability parity with reference ctvit.py:117-546 (shipped config
pretrained_model.py:17-27): 3D patch embed (LN-Linear-LN), spatial transformer
over per-slab token grids with ContinuousPositionBias, causal-PEG, temporal
transformer over per-column token sequences, cosine VQ-8192 bottleneck, and the
generative decoder (`to_pixels`) for reconstruction capability.  The GAN/VGG
discriminator losses of the reference's unused generative path are provided in
`ctpa/train/gan_losses.py`.

TPU-first design notes:
  * The (b, 24, 24, 24, 512) token lattice is processed as two batched dense
    attention folds — (b*t, 576, d) spatial and (b*h*w, 24, d) temporal — i.e.
    axial attention, the de-facto long-context strategy of the reference
    (SURVEY.md §5.7), expressed as large MXU matmul batches.
  * VQ codebook state is explicit (`VQState`) and threaded functionally; EMA
    updates happen in the trainer after a psum over the data axis.
  * All shapes static; `jax.checkpoint` optionally wraps blocks (remat).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from ctpa.core.config import CTViTConfig
from ctpa.models.attention import ContinuousPositionBias, Transformer
from ctpa.ops.vq import VQOutput, VQState, vq_encode


class PatchEmbed3D(nn.Module):
    """b c (t pt) (h p1) (w p2) -> b t h w d with LN-Linear-LN (ctvit.py:168-174).

    TPU note: materializing the patch rearrangement is a 6D transpose of the
    full volume (~14 ms/volume at shipped scale, HBM-bandwidth hostile).  The
    same math is computed transpose-free: per-patch LayerNorm statistics via
    strided reductions on a free reshape view, the LN scale folded into the
    volume elementwise, and the patch projection as a strided VALID conv that
    the MXU consumes directly.  Parameters are identical to the naive path
    (norm_in over patch_dim, proj Dense, norm_out), so checkpoints interop.
    """

    cfg: CTViTConfig
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5   # torch nn.LayerNorm default (reference ctvit.py:170)

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        c = self.cfg.channels
        pt, p = self.cfg.temporal_patch_size, self.cfg.patch_size
        pd, dim = self.cfg.patch_dim, self.cfg.dim
        b = video.shape[0]
        t, h, w = (self.cfg.temporal_size // pt, self.cfg.image_size // p,
                   self.cfg.image_size // p)

        g_in = self.param("norm_in_scale", nn.initializers.ones, (pd,), jnp.float32)
        b_in = self.param("norm_in_bias", nn.initializers.zeros, (pd,), jnp.float32)
        kernel = self.param(
            "proj_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (pd, dim), jnp.float32)
        proj_bias = self.param("proj_bias", nn.initializers.zeros, (dim,), jnp.float32)

        if self.cfg.pallas_patchify and c == 1:
            # fused pallas kernel: per-slab DMA + LN-folded MXU projection,
            # never materialises the patch layout in HBM (~2x XLA here)
            from ctpa.ops.pallas.patchify import patchify_project

            # slabs travel in the COMPUTE dtype (matching the XLA path's
            # pre-transpose cast below): bf16 halves the DMA bytes AND fits
            # 3 h-rows per grid step instead of 1 (patchify._pick_hb)
            y = jax.vmap(
                lambda v: patchify_project(
                    v, g_in, kernel, pt, p, p, eps=self.eps,
                    out_dtype=self.dtype)
            )(video[:, 0].astype(self.dtype))
            y = y + ((b_in @ kernel) + proj_bias).astype(y.dtype)
            return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                                name="norm_out")(y)

        # cast to compute dtype BEFORE the big 6D patchify transpose so the
        # HBM traffic halves (the transpose, not the matmul, dominates here;
        # a strided-conv formulation was tried and lowers ~3x slower on TPU
        # because of the large 10x20x20 kernel)
        x = rearrange(
            video.astype(self.dtype),
            "b c (t pt) (h p1) (w p2) -> b t h w (c pt p1 p2)",
            pt=pt, p1=p, p2=p,
        )
        # LayerNorm over patch features with the affine folded into the
        # projection: y = P(a * xhat) + (P b + bias)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)
        xhat = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        y = (xhat * g_in.astype(self.dtype)) @ kernel.astype(self.dtype)
        y = y + ((b_in @ kernel) + proj_bias).astype(y.dtype)
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm_out")(y)


class CTViT(nn.Module):
    """Encoder (+ optional decoder) over 3D CT volumes.

    __call__(video, vq_state) -> (tokens, VQOutput | None)
      video: (b, c, T, H, W); tokens: (b, t, h, w, d) quantized encodings
      (the `return_encoded_tokens=True` path of ctvit.py:407-437, the only one
      the CLIP stack exercises).
    """

    cfg: CTViTConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # context parallelism for the fused full-sequence encoder: shard the
    # t*h*w token axis over cp_axis of cp_mesh (parallel/context.py)
    cp_mesh: object = None
    cp_axis: str = None

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed3D(cfg=c, dtype=self.dtype)
        self.spatial_pos_bias = ContinuousPositionBias(
            dim=c.dim, heads=c.heads, dtype=self.dtype, name="spatial_rel_pos_bias"
        )
        tkw = dict(
            dim=c.dim, heads=c.heads, dim_head=c.dim_head, ff_mult=c.ff_mult,
            attn_dropout=c.attn_dropout, ff_dropout=c.ff_dropout,
            peg=True, peg_causal=True,
            peg_reference_layout=c.peg_reference_layout,
            kv_from_normed=c.attn_kv_from_normed,
            dtype=self.dtype, remat=self.remat,
        )
        # the 576-token spatial fold benefits from the flash kernel's flat
        # cosine path (flash_axial); the 24-token temporal fold stays XLA
        # (flash pads 24 -> 128 rows, a 5x waste at that size)
        self.enc_spatial = Transformer(depth=c.spatial_depth,
                                       use_flash=c.flash_axial,
                                       name="enc_spatial_transformer", **tkw)
        self.enc_temporal = Transformer(depth=c.temporal_depth, name="enc_temporal_transformer", **tkw)
        if c.fused_attention:
            self.enc_fused = Transformer(depth=c.fused_depth, use_flash=True,
                                         cp_mesh=self.cp_mesh,
                                         cp_axis=self.cp_axis,
                                         name="enc_fused_transformer", **tkw)
        if c.use_decoder:
            # reference decode() reuses the encoder transformers (ctvit.py:333-360)
            # but a real generative head wants its own stacks; we keep separate
            # dec transformers for trainable capacity plus the pixel projection.
            self.dec_spatial = Transformer(depth=c.spatial_depth, name="dec_spatial_transformer", **tkw)
            self.dec_temporal = Transformer(depth=c.temporal_depth, name="dec_temporal_transformer", **tkw)
            self.to_pixels = nn.Dense(c.patch_dim, dtype=self.dtype, name="to_pixels")

    @property
    def grid(self) -> tuple[int, int, int]:
        c = self.cfg
        return (c.temporal_tokens, c.image_size // c.patch_size, c.image_size // c.patch_size)

    def encode_tokens(self, tokens: jax.Array) -> jax.Array:
        """Axial encode: spatial fold then temporal fold (ctvit.py:306-331).
        With cfg.fused_attention, exact full-sequence attention over all
        t*h*w tokens runs instead (pallas flash kernel, O(n) memory)."""
        b, t, h, w, d = tokens.shape
        if self.cfg.fused_attention:
            x = rearrange(tokens, "b t h w d -> b (t h w) d")
            x = self.enc_fused(x, shape3d=(t, h, w), fold="full")
            return rearrange(x, "b (t h w) d -> b t h w d", t=t, h=h, w=w)
        bias = self.spatial_pos_bias(h, w)                      # (heads, hw, hw)
        x = rearrange(tokens, "b t h w d -> (b t) (h w) d")
        x = self.enc_spatial(x, shape3d=(t, h, w), fold="spatial", bias=bias)
        x = rearrange(x, "(b t) (h w) d -> (b h w) t d", b=b, h=h, w=w)
        x = self.enc_temporal(x, shape3d=(t, h, w), fold="temporal")
        return rearrange(x, "(b h w) t d -> b t h w d", b=b, h=h, w=w)

    def decode_tokens(self, tokens: jax.Array) -> jax.Array:
        """Generative decode back to voxels (capability parity, ctvit.py:333-375)."""
        assert self.cfg.use_decoder, "construct with use_decoder=True"
        b, t, h, w, d = tokens.shape
        x = rearrange(tokens, "b t h w d -> (b h w) t d")
        x = self.dec_temporal(x, shape3d=(t, h, w), fold="temporal")
        x = rearrange(x, "(b h w) t d -> (b t) (h w) d", b=b, h=h, w=w)
        bias = self.spatial_pos_bias(h, w)
        x = self.dec_spatial(x, shape3d=(t, h, w), fold="spatial", bias=bias)
        x = rearrange(x, "(b t) (h w) d -> b t h w d", b=b, h=h, w=w)
        pix = self.to_pixels(x)
        c, pt, p = self.cfg.channels, self.cfg.temporal_patch_size, self.cfg.patch_size
        return rearrange(
            pix, "b t h w (c pt p1 p2) -> b c (t pt) (h p1) (w p2)", c=c, pt=pt, p1=p, p2=p
        )

    def decode_from_codebook_indices(self, indices: jax.Array, vq_state: VQState):
        """Code ids (b, t*h*w) -> reconstructed voxels (ctvit.py:298-301)."""
        from ctpa.ops.vq import vq_lookup

        b = indices.shape[0]
        t, h, w = self.grid
        codes = vq_lookup(vq_state, indices).reshape(b, t, h, w, self.cfg.dim)
        return self.decode_tokens(codes.astype(self.dtype))

    def reconstruct(
        self,
        video: jax.Array,
        vq_state: Optional[VQState] = None,
        frame_mask: Optional[jax.Array] = None,
    ):
        """Full generative pass: encode -> VQ -> decode (reference
        ctvit.py:438-546 forward without the GAN branches).  Returns
        (recon_video, VQOutput).  Use this as the init target when training the
        generative path so decoder params are created."""
        tokens, vq_out = self(video, vq_state, frame_mask)
        return self.decode_tokens(tokens), vq_out

    def token_mask(self, frame_mask: jax.Array) -> jax.Array:
        """(b, T) frame validity -> (b, t*h*w) token mask: a temporal patch is
        valid if ANY of its frames is (ctvit.py:226-233 without the first-frame
        split, which the shipped path disables)."""
        b = frame_mask.shape[0]
        t, h, w = self.grid
        fm = rearrange(frame_mask, "b (t pt) -> b t pt", pt=self.cfg.temporal_patch_size)
        tok = jnp.any(fm, axis=-1)
        return jnp.repeat(tok, h * w, axis=-1).reshape(b, t * h * w)

    def __call__(
        self,
        video: jax.Array,
        vq_state: Optional[VQState] = None,
        frame_mask: Optional[jax.Array] = None,
    ):
        tokens = self.patch_embed(video)
        tokens = self.encode_tokens(tokens)
        if vq_state is None or not self.cfg.use_vq:
            return tokens, None
        b, t, h, w, d = tokens.shape
        flat = tokens.reshape(b, t * h * w, d)
        mask = self.token_mask(frame_mask) if frame_mask is not None else None
        out: VQOutput = vq_encode(vq_state, flat, mask=mask)
        quant = out.quantized.reshape(b, t, h, w, d)
        return quant, out
