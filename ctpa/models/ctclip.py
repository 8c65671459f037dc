"""CTCLIP — dual-encoder contrastive model over CT volumes and radiology reports.

Capability parity with reference ct_clip.py:407-901 (shipped config
pretrained_model.py:31-42): CXR-BERT text tower (CLS pooling -> Linear 768->512
-> l2norm, ct_clip.py:685-686/762-765), CTViT vision tower (encoded tokens ->
temporal mean-pool -> flatten 24*24*512 -> Linear 294912->512 -> l2norm,
ct_clip.py:715-740/767), learnable exp temperature (ct_clip.py:568,796),
bidirectional InfoNCE with optional decoupled-contrastive-learning masking
(ct_clip.py:858-878), FILIP all-token similarity (829-843), and CLOOB-style
extra latent projections (577-581, 781-784).

TPU-native contrastive loss: the loss is written over the batch the step sees.
Under `pjit` with the batch sharded on the mesh 'data' axis, XLA inserts the
latent all-gather for the (m, n) similarity matrix automatically — negatives
span the GLOBAL batch and the collective rides ICI.  (The reference's DDP loss
used local negatives only — SURVEY.md §2.4 lists this as the missing
capability.)  `contrastive_loss_sharded` additionally provides an explicit
shard_map formulation for manual-collective setups.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from ctpa.core.config import BertConfig, CTCLIPConfig, CTViTConfig
from ctpa.models.bert import BertEncoder
from ctpa.models.ctvit import CTViT
from ctpa.ops.attention_ops import l2norm
from ctpa.ops.vq import VQState


class CLIPOutput(NamedTuple):
    loss: jax.Array | None
    sim: jax.Array | None           # similarity logits (temp-scaled)
    text_latents: jax.Array
    image_latents: jax.Array
    vq_commit_loss: jax.Array | None
    vq_counts: jax.Array | None
    vq_sums: jax.Array | None


def matrix_diag(t: jax.Array) -> jax.Array:
    """Diagonal over the last two dims (ct_clip.py:52-60)."""
    i = jnp.arange(min(t.shape[-2], t.shape[-1]))
    return t[..., i, i]


def infonce_directional(sim: jax.Array, axis: int, decoupled: bool = False) -> jax.Array:
    """One direction of InfoNCE: positives on the diagonal, denominator over
    `axis` (1 = text->image over images, 0 = image->text over texts)."""
    m, n = sim.shape
    assert m == n, "contrastive batch must be square"
    pos = matrix_diag(sim)
    if decoupled:
        neg_inf = jnp.finfo(sim.dtype).min
        eye = jnp.eye(m, dtype=bool)
        denom = jax.nn.logsumexp(jnp.where(eye, neg_inf, sim), axis=axis)
    else:
        denom = jax.nn.logsumexp(sim, axis=axis)
    return (denom - pos).mean()


def infonce_loss(
    sim: jax.Array,
    decoupled: bool = False,
    sim_image_to_text: jax.Array | None = None,
) -> jax.Array:
    """Bidirectional InfoNCE over a temp-scaled (m, n) similarity matrix with
    positives on the diagonal (ct_clip.py:845-878).  `decoupled` removes the
    positive from the denominator (DCL, ct_clip.py:865-867).  When the
    CLOOB-style extra latent projection is active the image->text direction
    scores a SEPARATE similarity matrix (ct_clip.py:781-784, 858-878)."""
    t2i = infonce_directional(sim, axis=1, decoupled=decoupled)
    i2t = infonce_directional(
        sim if sim_image_to_text is None else sim_image_to_text,
        axis=0, decoupled=decoupled)
    return (t2i + i2t) / 2


def filip_similarity(
    text_tokens: jax.Array,     # (m, tt, d) l2-normalised token latents
    image_tokens: jax.Array,    # (n, ti, d)
    text_mask: jax.Array,       # (m, tt) True = real token
) -> jax.Array:
    """FILIP fine-grained similarity (ct_clip.py:829-843): per text token take
    the max over image tokens, then masked-mean over text tokens; and
    symmetrically for the image side; averaged."""
    sim = jnp.einsum("mtd,nid->mnti", text_tokens, image_tokens,
                     preferred_element_type=jnp.float32)
    mask = text_mask[:, None, :, None]
    neg = jnp.finfo(sim.dtype).min
    t2i = jnp.max(jnp.where(mask, sim, neg), axis=-1)          # (m, n, tt)
    t2i = jnp.sum(t2i * text_mask[:, None, :], axis=-1) / jnp.maximum(
        jnp.sum(text_mask, axis=-1)[:, None], 1.0)
    i2t = jnp.max(jnp.where(mask, sim, neg), axis=-2)          # (m, n, ti)
    i2t = i2t.mean(axis=-1)
    return (t2i + i2t) / 2


class CTCLIP(nn.Module):
    cfg: CTCLIPConfig
    vit_cfg: CTViTConfig
    bert_cfg: BertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        c = self.cfg
        self.text_transformer = BertEncoder(self.bert_cfg, dtype=self.dtype,
                                            remat=self.remat, name="text_transformer")
        self.visual_transformer = CTViT(self.vit_cfg, dtype=self.dtype,
                                        remat=self.remat, name="visual_transformer")
        self.to_text_latent = nn.Dense(c.dim_latent, use_bias=False,
                                       dtype=self.dtype, name="to_text_latent")
        self.to_visual_latent = nn.Dense(c.dim_latent, use_bias=False,
                                         dtype=self.dtype, name="to_visual_latent")
        if c.extra_latent_projection:
            self.to_text_latent_extra = nn.Dense(c.dim_latent, use_bias=False,
                                                 dtype=self.dtype, name="to_text_latent_extra")
            self.to_visual_latent_extra = nn.Dense(c.dim_latent, use_bias=False,
                                                   dtype=self.dtype, name="to_visual_latent_extra")
        if c.downsample_image_embeds:
            self.downsample_depthwise = self.param(
                "downsample_depthwise", nn.initializers.normal(0.02),
                (4, 4, self.vit_cfg.dim), jnp.float32)
            self.downsample_pointwise = nn.Dense(
                c.dim_latent, dtype=self.dtype, name="downsample_pointwise")
        # learnable log-temperature, exp'd at use (ct_clip.py:568, 796)
        self.temperature = self.param("temperature", nn.initializers.constant(1.0), ())
        if c.use_mlm:
            from ctpa.models.bert import BertMLMHead

            self.mlm_head = BertMLMHead(self.bert_cfg, dtype=self.dtype, name="mlm_head")

    def multiview_loss(
        self,
        input_ids, attention_mask, video,
        aug_input_ids=None, aug_attention_mask=None, aug_video=None,
        vq_state: Optional[VQState] = None,
    ) -> jax.Array:
        """Contrastive loss with augmented views (ct_clip.py:649-675):
        primary InfoNCE weighted by (1 - w), plus w * mean of the
        (aug_text, image) and (text, aug_image) view losses."""
        temp = jnp.exp(self.temperature)
        w = self.cfg.multiview_loss_weight

        def latents(ids, am, vid):
            t = self.encode_text(ids, am)
            i, _ = self.encode_image(vid, vq_state)
            return t, i

        text_lat, img_lat = latents(input_ids, attention_mask, video)

        def nce(t, i):
            sim = jnp.einsum("md,nd->mn", t, i,
                             preferred_element_type=jnp.float32) * temp
            return infonce_loss(sim, decoupled=self.cfg.decoupled_contrastive_learning)

        loss = nce(text_lat, img_lat)
        views = []
        if aug_input_ids is not None:
            aug_t = self.encode_text(aug_input_ids, aug_attention_mask)
            views.append(nce(aug_t, img_lat))
        if aug_video is not None:
            aug_i, _ = self.encode_image(aug_video, vq_state)
            views.append(nce(text_lat, aug_i))
        if not views:
            return loss
        aug_loss = sum(views) / len(views)
        return (1.0 - w) * loss + w * aug_loss

    def init_all(self, input_ids, attention_mask, video, vq_state=None):
        """Init target that touches every optional head (use as
        ``model.init(key, ..., method=CTCLIP.init_all)`` when use_mlm is on —
        plain __call__ never traces the MLM head, so its params would be
        missing)."""
        out = self(input_ids, attention_mask, video, vq_state)
        if self.cfg.use_mlm:
            _ = self.mlm_logits(input_ids, attention_mask)
        return out

    def mlm_logits(self, input_ids, attention_mask):
        """Masked-LM logits over the text tower (MLM SSL capability,
        reference mlm.py via ct_clip.py:515-522)."""
        hidden, _ = self.text_transformer(input_ids, attention_mask)
        return self.mlm_head(hidden)

    def visual_ssl_embed(self, video):
        """Pooled visual embedding for SimCLR-style SSL views
        (ct_clip.py:526-545 capability)."""
        tokens, _ = self.visual_transformer(video, None)
        return l2norm(self.to_visual_latent(self.pool_image_tokens(tokens)))

    # ----- encoders ---------------------------------------------------------

    def encode_text_hidden(self, input_ids, attention_mask):
        hidden, cls = self.text_transformer(input_ids, attention_mask)
        return hidden, cls

    def encode_text(self, input_ids, attention_mask) -> jax.Array:
        """(b, dim_latent) l2-normalised text latent (CLS pooling)."""
        _, cls = self.encode_text_hidden(input_ids, attention_mask)
        return l2norm(self.to_text_latent(cls))

    def encode_image_tokens(self, video, vq_state: Optional[VQState] = None):
        return self.visual_transformer(video, vq_state)

    def pool_image_tokens(self, tokens: jax.Array) -> jax.Array:
        """Temporal mean-pool then flatten (ct_clip.py:715-740): (b,t,h,w,d) ->
        (b, h*w*d).  The flatten feeds the dim_image -> dim_latent projection —
        a 294912x512 (150M-param) matmul in the shipped config; shard it over
        the 'model' axis for TP (SURVEY.md §7 hard part 5).

        With cfg.downsample_image_embeds, a stride-2 depthwise conv + 1x1 conv
        shrink the token grid first (ct_clip.py:553-562; depthwise conv written
        as the shift-and-add form — see ops/attention_ops.peg_conv3d note)."""
        pooled = tokens.mean(axis=1)                   # (b, h, w, d)
        if self.cfg.downsample_image_embeds:
            x = pooled[:, None]                        # (b, 1, h, w, d) fake t
            dw = self.downsample_depthwise
            # stride-2 4x4 depthwise over (h, w): grouped conv lowers badly on
            # TPU, express as 16 shifted strided adds
            b, _, h, w, d = x.shape
            xp = jnp.pad(x[:, 0], ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = None
            for i in range(4):
                for j in range(4):
                    term = xp[:, i : i + h - 1 : 2, j : j + w - 1 : 2, :] * dw[i, j]
                    acc = term if acc is None else acc + term
            x = self.downsample_pointwise(acc)         # 1x1 conv == Dense
            return rearrange(x, "b h w d -> b (h w d)")
        return rearrange(pooled, "b h w d -> b (h w d)")

    def encode_image(self, video, vq_state: Optional[VQState] = None):
        tokens, vq_out = self.encode_image_tokens(video, vq_state)
        latent = l2norm(self.to_visual_latent(self.pool_image_tokens(tokens)))
        return latent, vq_out

    # ----- forward ----------------------------------------------------------

    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        video: jax.Array,
        vq_state: Optional[VQState] = None,
        return_loss: bool = True,
    ) -> CLIPOutput:
        temp = jnp.exp(self.temperature)

        text_hidden, text_cls = self.encode_text_hidden(input_ids, attention_mask)
        tokens, vq_out = self.encode_image_tokens(video, vq_state)

        if self.cfg.use_all_token_embeds:
            # FILIP: latents per token
            text_lat = l2norm(self.to_text_latent(text_hidden))
            img_tokens = rearrange(tokens, "b t h w d -> b (t h w) d")
            # in FILIP mode dim_image == token dim and the projection applies
            # per token (reference sets dim_image accordingly, ct_clip.py:473)
            img_lat = l2norm(self.to_visual_latent(img_tokens))
            sim = filip_similarity(text_lat, img_lat, attention_mask > 0) * temp
        else:
            text_lat = l2norm(self.to_text_latent(text_cls))
            img_lat = l2norm(self.to_visual_latent(self.pool_image_tokens(tokens)))
            sim = jnp.einsum("md,nd->mn", text_lat, img_lat,
                             preferred_element_type=jnp.float32) * temp
        sim_i2t = None
        if self.cfg.extra_latent_projection and not self.cfg.use_all_token_embeds:
            # CLOOB: the image->text direction uses separate projections
            # (ct_clip.py:577-581, 781-784)
            text_extra = l2norm(self.to_text_latent_extra(text_cls))
            img_extra = l2norm(self.to_visual_latent_extra(self.pool_image_tokens(tokens)))
            sim_i2t = jnp.einsum("md,nd->mn", text_extra, img_extra,
                                 preferred_element_type=jnp.float32) * temp

        if not return_loss:
            # elementwise text-image score (zero-shot path, ct_clip.py:805-807);
            # broadcasting covers the 2-prompts-vs-1-image case.
            score = jnp.einsum("bd,bd->b", text_lat,
                               jnp.broadcast_to(img_lat, text_lat.shape),
                               preferred_element_type=jnp.float32) * temp
            return CLIPOutput(None, score, text_lat, img_lat,
                              None if vq_out is None else vq_out.commit_loss,
                              None if vq_out is None else vq_out.counts,
                              None if vq_out is None else vq_out.sums)

        loss = infonce_loss(sim, decoupled=self.cfg.decoupled_contrastive_learning,
                            sim_image_to_text=sim_i2t)
        return CLIPOutput(loss, sim, text_lat, img_lat,
                          None if vq_out is None else vq_out.commit_loss,
                          None if vq_out is None else vq_out.counts,
                          None if vq_out is None else vq_out.sums)


def contrastive_loss_sharded(text_lat: jax.Array, img_lat: jax.Array,
                             temp: jax.Array, axis: str = "data",
                             decoupled: bool = False) -> jax.Array:
    """Explicit-collective InfoNCE for shard_map formulations: all-gather both
    latent shards over `axis`, compute the global similarity, return the global
    mean loss (identical on every shard)."""
    gt = jax.lax.all_gather(text_lat, axis, axis=0, tiled=True)
    gi = jax.lax.all_gather(img_lat, axis, axis=0, tiled=True)
    sim = jnp.einsum("md,nd->mn", gt, gi, preferred_element_type=jnp.float32) * temp
    return infonce_loss(sim, decoupled=decoupled)
